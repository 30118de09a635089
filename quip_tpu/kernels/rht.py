"""Pallas TPU kernel: fused randomized-Hadamard/Kronecker (RHT) apply.

Why this exists: batch-1 decode is op-LAUNCH-latency bound outside the
packed matmuls. The XLA form of one RHT application (core/incoherence.py
apply_rht) is ~5 ops (sign multiply, reshape, two small factor dots,
reshape), and a packed linear uses two of them (V on the input, U on the
output) plus a scaleWH divide — ~11 small-op launches per linear, ~44 per
decoder layer. The round-2 step decomposition (scripts/bench_step.py,
docs/PERF.md) measured ~70 us/layer of such glue against ~89 us of actual
kernel time. This kernel collapses one full RHT application (elementwise
vector fold + both Kronecker factor dots) into ONE Pallas launch.

Math (core/incoherence.py:279-306): T = (L (X) R) . diag(s) along the last
axis of x:
  forward:    y = L @ reshape_{a,b}(x * v) @ R^T          (v = s, or
              s/scaleWH — the divide folds into the same vector)
  transpose:  y = (L^T @ reshape_{a,b}(x) @ R) * s

Mosaic layout rules shape the implementation: reshapes may merge/split
MAJOR dims only (the lane dim must be preserved), so the (B, n) -> (B, a,
b) split happens OUTSIDE the kernel (an XLA reshape, free), the R factor
contracts the minor axis via one merged (TB*a, b) 2-D dot, and the L
factor multiplies each batch row FROM THE LEFT (TB static tiny 2-D dots —
in-kernel instructions, not launches). No transposes anywhere.

Batch gating: at large B one batched XLA einsum beats TB unrolled dots, so
qlinear only routes B <= 32 (decode/serving) through this kernel.

No reference counterpart: the reference's inference path never applies
rotations at runtime (it stores unrotated qfn-a grids, quant.py:222-233).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel3(transpose, x_ref, vec_ref, l_ref, r_ref, o_ref):
    """x_ref (TB, a, b); vec_ref (a, b); l_ref (a, a); r_ref (b, b)."""
    x = x_ref[:]
    TB, a, b = x.shape
    dt = x.dtype
    if not transpose:
        x = x * vec_ref[:][None, :, :].astype(dt)

    # R factor: contract the minor axis with ONE merged 2-D dot
    R = r_ref[:].astype(dt)
    Rop = R.T if not transpose else R
    xm = x.reshape(TB * a, b)                      # major-dim merge: legal
    xm = jax.lax.dot(xm, Rop, preferred_element_type=jnp.float32)
    x = xm.reshape(TB, a, b).astype(dt)

    # L factor: per-batch-row left-multiply (static unroll; these are
    # in-kernel MXU instructions, not op launches)
    L = l_ref[:].astype(dt)
    Lop = L if not transpose else L.T
    vec_post = vec_ref[:].astype(dt) if transpose else None
    for t in range(TB):
        y = jax.lax.dot(Lop, x[t], preferred_element_type=jnp.float32)
        y = y.astype(dt)
        if transpose:
            y = y * vec_post
        o_ref[t] = y.astype(o_ref.dtype)


def _kernel2(transpose, x_ref, vec_ref, l_ref, o_ref):
    """right-factor-free (n == a): plain minor-axis dot."""
    x = x_ref[:]
    dt = x.dtype
    L = l_ref[:].astype(dt)
    if not transpose:
        x = x * vec_ref[:].astype(dt)              # vec (1, n) broadcasts
        y = jax.lax.dot(x, L.T, preferred_element_type=jnp.float32)
    else:
        y = jax.lax.dot(x, L, preferred_element_type=jnp.float32)
        y = y.astype(dt) * vec_ref[:].astype(dt)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("transpose", "tile_b",
                                             "interpret"))
def rht_apply_fused(x: jax.Array, vec: jax.Array, left: jax.Array,
                    right: Optional[jax.Array], *, transpose: bool = False,
                    tile_b: Optional[int] = None,
                    interpret: bool = False) -> jax.Array:
    """One fused RHT application along the last axis of x (B, n).

    vec: the elementwise fold — forward: signs (optionally already divided
    by scaleWH); transpose: signs (applied after the dots). left (a, a);
    right (b, b) or None (n = a). Semantics identical to
    core/incoherence.apply_rht (tests/test_rht_kernel.py), accumulation in
    f32 (>= the XLA path's precision).
    """
    B, n = x.shape
    a = left.shape[0]
    b = n // a
    assert a * b == n, (a, b, n)
    if tile_b is None:
        tile_b = min(B, 8)
        while B % tile_b:
            tile_b -= 1
    assert B % tile_b == 0

    if right is None:
        return pl.pallas_call(
            functools.partial(_kernel2, transpose),
            grid=(B // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a, a), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n), x.dtype),
            interpret=interpret,
        )(x, vec.reshape(1, n), left)

    y3 = pl.pallas_call(
        functools.partial(_kernel3, transpose),
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, a, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, a, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, a, b), x.dtype),
        interpret=interpret,
    )(x.reshape(B, a, b), vec.reshape(a, b), left, right)
    return y3.reshape(B, n)
