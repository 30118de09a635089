"""Pallas TPU kernel: fused unpack -> dequant -> matmul for packed weights.

The TPU-native replacement for the reference's external quant_cuda extension
(vecquant3matmul / vecquant4matmul, /root/reference/quant.py:229,
zeroShot/models/quant.py:207) — and strictly more capable: the CUDA path was
single-token-only (quant.py:222-233); this kernel handles arbitrary batch.

Why it's fast on TPU: weight-only-quantized decode is HBM-bandwidth bound.
Reading 2-bit packed weights moves 8x fewer bytes than bf16; unpack (VPU
shift/mask) and the small matmul (MXU) hide under the DMA. The slab-major
pack layout (pack/format.py) makes unpack `codes_per_word` shift+mask ops
producing contiguous column slabs — no cross-lane interleave.

Grid: (m_tiles,); each program DMAs one (TM, d*bits/32) packed tile +
the full activation block (B, d), emits (B, TM).

Dequant algebra is folded *around* the integer matmul where possible:
  qfn-b:  y = x @ Ŵᵀ,  Ŵ = (2/maxq · q - 1) · s
        = s · (2/maxq · (x @ qᵀ) - Σ_d x)
so the kernel multiplies bf16 codes directly and applies one scalar fixup —
no dense dequantized weight tile is ever materialized.
  qfn-a:  Ŵ = scale_r (q - zero_r)
        = scale_r · (x @ qᵀ) - scale_r zero_r · Σ_d x.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _unpack_tile(words, bits: int, compute_dtype):
    """(TM, nw) int32 slab-major words -> (TM, nw*cpw) codes in compute
    dtype. Mirrors pack/format.py:_unpack_plane."""
    cpw = 32 // bits
    w = words.astype(jnp.uint32)
    mask = jnp.uint32(2**bits - 1)
    # Mosaic has no direct uint32->bf16 cast; go via int32 -> f32
    slabs = [((w >> (bits * b)) & mask).astype(jnp.int32)
             for b in range(cpw)]
    q = jnp.concatenate(slabs, axis=1)
    return q.astype(jnp.float32).astype(compute_dtype)


def _dequant_matmul_kernel_qfnb(bits, maxq, x_ref, w_ref, scale_ref, o_ref):
    """One m-tile of y = x @ Ŵᵀ for the qfn-b grid."""
    x = x_ref[:]                                    # (B, d)
    q = _unpack_tile(w_ref[:], bits, x.dtype)       # (TM, d)
    acc = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                               # (B, TM)
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # (B, 1)
    s = scale_ref[0, 0].astype(jnp.float32)
    o_ref[:] = (s * ((2.0 / maxq) * acc - xsum)).astype(o_ref.dtype)


def _dequant_matmul_kernel_qfna(bits, x_ref, w_ref, scale_ref, zero_ref,
                                o_ref):
    """One m-tile of y = x @ Ŵᵀ for the qfn-a grid (per-row scale/zero)."""
    x = x_ref[:]
    q = _unpack_tile(w_ref[:], bits, x.dtype)
    acc = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    scale = scale_ref[:].astype(jnp.float32)                  # (1, TM)
    zero = zero_ref[:].astype(jnp.float32)
    o_ref[:] = (scale * acc - scale * zero * xsum).astype(o_ref.dtype)


def _dequant_matmul_kernel_3bit_qfnb(maxq, x_ref, lo_ref, hi_ref, scale_ref,
                                     o_ref):
    x = x_ref[:]
    lo = _unpack_tile(lo_ref[:], 2, x.dtype)
    hi = _unpack_tile(hi_ref[:], 1, x.dtype)
    q = lo + 4.0 * hi
    acc = jax.lax.dot_general(
        x, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    s = scale_ref[0, 0].astype(jnp.float32)
    o_ref[:] = (s * ((2.0 / maxq) * acc - xsum)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "qfn", "tile_m", "interpret", "out_dtype"),
)
def dequant_matmul(
    x: jax.Array,                    # (B, d)
    planes: Tuple[jax.Array, ...],   # packed planes, (m, d*bits_plane/32)
    scale: jax.Array,                # qfn-b: (1,1) scalar; qfn-a: (m,)
    zero: Optional[jax.Array],       # qfn-a: (m,); qfn-b: None
    *,
    bits: int,
    qfn: str = "b",
    tile_m: int = 256,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """y = x @ dequant(packed).T — the fused inference hot path."""
    B, d = x.shape
    m = planes[0].shape[0]
    maxq = float(2**bits - 1)
    out_dtype = out_dtype or x.dtype
    tile_m = min(tile_m, m)
    assert m % tile_m == 0, f"m={m} must be divisible by tile_m={tile_m}"
    grid = (m // tile_m,)

    x_spec = pl.BlockSpec((B, d), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((B, tile_m), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    if bits == 3:
        assert qfn == "b", "3-bit kernel currently supports qfn-b"
        lo, hi = planes
        kernel = functools.partial(_dequant_matmul_kernel_3bit_qfnb, maxq)
        in_specs = [
            x_spec,
            pl.BlockSpec((tile_m, lo.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, hi.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args = (x, lo, hi, jnp.asarray(scale, jnp.float32).reshape(1, 1))
    elif qfn == "b":
        (words,) = planes
        kernel = functools.partial(_dequant_matmul_kernel_qfnb, bits, maxq)
        in_specs = [
            x_spec,
            pl.BlockSpec((tile_m, words.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        args = (x, words, jnp.asarray(scale, jnp.float32).reshape(1, 1))
    else:  # qfn 'a'
        (words,) = planes
        kernel = functools.partial(_dequant_matmul_kernel_qfna, bits)
        in_specs = [
            x_spec,
            pl.BlockSpec((tile_m, words.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        args = (x, words, scale.reshape(1, m), zero.reshape(1, m))

    flops = 2 * B * d * m
    bytes_accessed = (x.size * x.dtype.itemsize
                      + sum(p.size * 4 for p in planes)
                      + B * m * jnp.dtype(out_dtype).itemsize)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, m), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(*args)


def dequant_matmul_ref(
    x: jax.Array,
    planes: Tuple[jax.Array, ...],
    scale: jax.Array,
    zero: Optional[jax.Array],
    *,
    bits: int,
    qfn: str = "b",
) -> jax.Array:
    """Pure-jnp reference (and CPU fallback) with identical semantics."""
    from quip_tpu.pack.format import unpack_codes

    d = x.shape[-1]
    codes = unpack_codes(planes, bits, d).astype(jnp.float32)
    maxq = float(2**bits - 1)
    if qfn == "b":
        W = ((codes / maxq) * 2 - 1) * jnp.asarray(scale, jnp.float32)
    else:
        W = (scale.reshape(-1, 1)
             * (codes - zero.reshape(-1, 1))).astype(jnp.float32)
    return (x.astype(jnp.float32) @ W.T).astype(x.dtype)
