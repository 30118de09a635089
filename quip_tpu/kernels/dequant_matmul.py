"""Pallas TPU kernel: fused unpack -> dequant -> matmul for packed weights.

The TPU-native replacement for the reference's external quant_cuda extension
(vecquant3matmul / vecquant4matmul, /root/reference/quant.py:229,
zeroShot/models/quant.py:207) — and strictly more capable: the CUDA path was
single-token-only (quant.py:222-233); this kernel handles arbitrary batch.

Why it's fast on TPU: weight-only-quantized decode is HBM-bandwidth bound.
Reading 2-bit packed weights moves 8x fewer bytes than bf16; the unpack must
then be cheap enough on the VPU not to become the new ceiling. The
halfword-spread transposed plane layout (pack/format.py) makes it ~1.5 VPU
ops/element with no int->float converts:

    field k of every word, both 16-bit halves at once:
        t = ((w >> bits*k) & mask16) | 0x4300_4300
    bit-patterns each half into bf16(128 + code) (0x4300 == bf16 128.0, the
    code lands in the low mantissa bits). `pltpu.bitcast(t, bfloat16)` splits
    each int32 row into two bf16 rows IN fan-in order, so concatenating the
    k-slabs yields the full (d, TM) operand directly. The +128 offset is
    linear, so it folds into the Σx fixup the dequant affine already needs:
        x @ (128 + q)ᵀ = 128·Σx + x @ qᵀ.

Dequant algebra is likewise folded *around* the integer matmul — no dense
dequantized W tile is ever materialized:
    qfn-b:  y = x @ Ŵᵀ,  Ŵ = (2/maxq · q - 1) · s
          = s · (2/maxq · (x @ qᵀ) - Σ_d x)
    qfn-a:  Ŵ = scale_r (q - zero_r)
          = scale_r · (x @ qᵀ) - scale_r zero_r · Σ_d x.
Multi-plane widths (3 = 2+1, 8 = 4+4, pack/format.py:PLANE_SPLITS) run one
dot per plane and combine x @ qᵀ = Σ_p weight_p · (x @ q_pᵀ); the extra dot
is free at decode batch sizes (the kernel is bandwidth-bound, and planes
together still move bits/16 of the bf16 bytes).

Grid: (B_tiles, m_tiles); each program DMAs one (nw, TM) packed tile per
plane + one (TB, d) activation tile, emits (TB, TM). Unpacked slabs are
dotted one at a time against their contiguous x chunks (never concatenated
into a dense (d, TM) operand), which keeps the VMEM working set to the
packed tile + one slab and lets default_tile_m pick tiles 2-10x larger —
measured 490 -> 590-640 GB/s effective on 7B decode shapes and 384 -> 640
on the 32000-row lm_head (scripts/bench_kernel.py).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quip_tpu.pack.format import PLANE_SPLITS

_BF16_128 = 0x43004300  # bf16 128.0 in both 16-bit halves


def _plane_codes_dot(x_bf, w_ref, field_bits, xsum_bf):
    """x @ q_pᵀ for one packed plane, via the bf16 mantissa-patterning
    unpack and ONE DOT PER FIELD SLAB. Slab k (both 16-bit halves of bit
    field k) covers the contiguous fan-in columns k·2nw..(k+1)·2nw-1, so it
    dots directly against the matching x chunk; the concatenated (d, TM)
    operand is never materialized. Concatenating first (the 1st version of
    this kernel) cost a VMEM write+read pass over 16x the packed bytes and
    capped the kernel at 0.55-0.65 of DMA roofline; per-slab dots measure
    490 -> 590-640 GB/s effective on the large decode shapes and unlock
    bigger m-tiles (docs/PERF.md, scripts/bench_kernel.py).

    The offset fixup MUST use the sum of the bf16-cast x the dot actually
    consumes: the MXU multiplies bf16 operands, so cancelling 128·Σx with a
    higher-precision Σx of a float32 input would leave the x-rounding error
    amplified 128x (a ~1e-3 relative output error, observed)."""
    w = pltpu.bitcast(w_ref[:], jnp.uint32)          # (nw, TM)
    nw = w.shape[0]
    fph = 16 // field_bits
    mask = jnp.uint32(((1 << field_bits) - 1) * 0x00010001)
    exp = jnp.uint32(_BF16_128)
    acc = None
    for k in range(fph):
        slab = pltpu.bitcast(((w >> (field_bits * k)) & mask) | exp,
                             jnp.bfloat16)            # (2*nw, TM)
        xk = x_bf[:, k * 2 * nw:(k + 1) * 2 * nw]     # (TB, 2*nw)
        part = jax.lax.dot_general(
            xk, slab,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc - 128.0 * xsum_bf


def _kernel(plane_fields, plane_weights, qfn, maxq, nplanes,
            x_ref, *refs):
    w_refs = refs[:nplanes]
    o_ref = refs[-1]
    # Uniform kernel semantics: y = bf16(x) @ Ŵᵀ with f32 accumulation —
    # the MXU consumes bf16 operands either way, and every Σx term must be
    # taken over the SAME bf16 values the dot sees (see _plane_codes_dot).
    x_bf = x_ref[:].astype(jnp.bfloat16)              # (TB, d)
    xsum = jnp.sum(x_bf.astype(jnp.float32), axis=1, keepdims=True)
    ycodes = None
    for w_ref, fb, pw in zip(w_refs, plane_fields, plane_weights):
        acc = _plane_codes_dot(x_bf, w_ref, fb, xsum)
        acc = acc if pw == 1 else pw * acc
        ycodes = acc if ycodes is None else ycodes + acc
    if qfn == "b":
        s_ref = refs[nplanes]
        s = s_ref[0, 0].astype(jnp.float32)
        o_ref[:] = (s * ((2.0 / maxq) * ycodes - xsum)).astype(o_ref.dtype)
    else:
        scale = refs[nplanes][:].astype(jnp.float32)      # (1, TM)
        zero = refs[nplanes + 1][:].astype(jnp.float32)   # (1, TM)
        o_ref[:] = (scale * ycodes - scale * zero * xsum).astype(o_ref.dtype)


def default_tile_m(m: int, d: int, bits: int = 2, tile_b: int = 8) -> int:
    """m-tile choice for the per-slab-dot kernel, tuned on-chip
    (scripts/bench_kernel.py, docs/PERF.md): bigger tiles amortize grid /
    DMA-pipeline overhead, so take the LARGEST divisor of m that

      (a) is lane-aligned (multiple of 128),
      (b) leaves >= 4 grid steps (t <= m/4 — fewer steps starve the
          DMA/compute pipeline: m=4096 measured 1024 > 2048),
      (c) keeps the packed tile under ~6 MB so Mosaic can double-buffer it
          in VMEM (this cap reproduces the measured 3200-beats-6400 choice
          at m=32000 and allows the winning 5504 at m=22016),
      (d) fits the WHOLE scoped-VMEM working set — double-buffered packed
          tile + activation tile + output tile — under ~14 MB of the 16 MB
          budget. At decode (tile_b=8) this never binds; at prefill
          (tile_b=128, d=4096, m=22016) the old rule's 5504 tile overflowed
          by 0.3 MB ("Scoped allocation ... exceeded scoped vmem limit",
          observed on v5e when the B=512 forward first compiled).

    Falls back to the small-shape heuristic (any divisor of m under the
    VMEM budget; Mosaic pads odd tiles) so e.g. m=160 still lowers."""
    def packed_ok(t):
        packed = d * t * bits / 8
        working = 2 * packed + 4 * tile_b * d + 4 * t * tile_b
        return packed <= 6e6 and working <= 14e6

    # Preferred band (tile sweep 2026-08-20, scripts/bench_tiles.py): packed
    # tiles ~1-4 MB with 4-16 grid steps run 640-665 GB/s; ~5.6 MB tiles
    # (22016's only mid-size divisor, 5504) drop to ~530-590. Prefer the
    # band when the shape offers it; fall back to the old <=6 MB rule
    # otherwise (22016 itself has no band divisor — 512 measured worse at
    # 43 steps; pack-time m-padding to 22528 is what makes the band
    # reachable, pack/format.py::padded_m).
    best = 0
    for t in range(128, m // 4 + 1, 128):
        if m % t == 0 and packed_ok(t) \
                and d * t * bits / 8 <= 4e6 and m // t <= 16:
            best = t
    if best:
        return best
    best = 0
    for t in range(128, m // 4 + 1, 128):
        if m % t == 0 and packed_ok(t):
            best = t
    if best:
        return best
    budget = lambda t: d * t * 3 <= 13e6
    for t in (512, 256, 128):
        if m % t == 0 and budget(t):
            return t
    if budget(m):
        return m
    return max(t for t in range(1, m + 1) if m % t == 0 and budget(t))


def _default_tile_b(B: int) -> int:
    # 128 keeps the (TB, d) activation tile + the unpacked (d, TM) operand
    # inside VMEM even at d=11008 (long-prompt prefill buckets)
    t = min(B, 128)
    while B % t:
        t //= 2
    return max(t, 1)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "qfn", "tile_m", "tile_b", "interpret",
                     "out_dtype", "code_bits"),
)
def _dequant_matmul_local(
    x: jax.Array,                    # (B, d)
    planes: Tuple[jax.Array, ...],   # halfword-spread planes, (nw_p, m)
    scale: jax.Array,                # qfn-b: (1,1) scalar; qfn-a: (m,)
    zero: Optional[jax.Array],       # qfn-a: (m,); qfn-b: None
    *,
    bits: int,
    qfn: str = "b",
    tile_m: Optional[int] = None,
    tile_b: Optional[int] = None,
    interpret: bool = False,
    out_dtype=None,
    code_bits: Optional[int] = None,
) -> jax.Array:
    """y = x @ dequant(packed).T — the fused inference hot path (one
    device's shard; see dequant_matmul for the SPMD-aware entry).

    ``code_bits``: true code width when it differs from the PLANE field
    width — the 3-in-4 serving transcode (pack/format.py::widen_3bit)
    stores 3-bit codes in 4-bit fields, so the qfn-b grid midpoint stays
    maxq = 2**code_bits - 1 = 7."""
    B, d = x.shape
    m = planes[0].shape[-1]
    maxq = float(2**(code_bits or bits) - 1)
    out_dtype = out_dtype or x.dtype
    splits = PLANE_SPLITS[bits]
    assert len(planes) == len(splits), (len(planes), bits)
    tb_resolved = tile_b if tile_b is not None else _default_tile_b(B)
    tile_m = tile_m if tile_m is not None else default_tile_m(
        m, d, bits, tile_b=tb_resolved)
    tile_m = min(tile_m, m)
    tile_b = tb_resolved
    assert m % tile_m == 0, f"m={m} must be divisible by tile_m={tile_m}"
    assert B % tile_b == 0, f"B={B} must be divisible by tile_b={tile_b}"
    grid = (B // tile_b, m // tile_m)

    in_specs = [pl.BlockSpec((tile_b, d), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM)]
    for p in planes:
        nw = p.shape[0]
        in_specs.append(
            pl.BlockSpec((nw, tile_m), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM))
    if qfn == "b":
        in_specs.append(pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                     memory_space=pltpu.SMEM))
        extra = (jnp.asarray(scale, jnp.float32).reshape(1, 1),)
    else:
        in_specs.append(pl.BlockSpec((1, tile_m), lambda b, i: (0, i),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, tile_m), lambda b, i: (0, i),
                                     memory_space=pltpu.VMEM))
        extra = (scale.reshape(1, m), zero.reshape(1, m))

    out_spec = pl.BlockSpec((tile_b, tile_m), lambda b, i: (b, i),
                            memory_space=pltpu.VMEM)

    flops = 2 * B * d * m * len(splits)
    bytes_accessed = (x.size * x.dtype.itemsize
                      + sum(p.size * 4 for p in planes)
                      + B * m * jnp.dtype(out_dtype).itemsize)

    kernel = functools.partial(
        _kernel,
        tuple(fb for fb, _ in splits),
        tuple(pw for _, pw in splits),
        qfn, maxq, len(planes))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, m), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(x, *planes, *extra)


# ---------------------------------------------------------------------------
# SPMD-aware entry: custom partitioning rules for the Pallas kernel
# ---------------------------------------------------------------------------
#
# pallas_call is OPAQUE to the SPMD partitioner: without rules, GSPMD
# all-gathers every operand and runs the full kernel replicated on every
# device — measured by cli/commreport.py as ~217 MB of plane all-gathers
# PER LAYER per decode step on a tp=4 mesh (the round-1 "tp sharding" was
# placement, not compute distribution). The rules below declare the
# column-parallel contract:
#
#   x (b, d), plane_p (w_p, m), scales (i, m) -> y (b, m)
#
#   * m (out features) and b (batch) may shard freely — each device runs
#     the SAME kernel on its (nw, m/T) plane shard (tile_m recomputed for
#     the local m);
#   * d and the packed word axes REQUIRE replication: the halfword-spread
#     layout interleaves fan-in columns across word rows (word row j of
#     field k covers column k*2nw + 2j + h), so a contiguous word-row
#     shard does NOT correspond to a contiguous x slice — row-parallel
#     sharding of this format is impossible by construction (same reason
#     d-tiling inside the kernel is, docs/PERF.md). Row-parallel layers
#     (wo/wd) therefore also run column-parallel; at decode the extra
#     activation all-gather is KBs/layer vs the GBs of plane gathers this
#     removes.
#
# Under jax's shardy partitioner the einsum-like `sharding_rule` string
# carries the same contract (need_replication_factors for d/w); the
# infer/propagate callbacks cover the legacy GSPMD path.


@functools.lru_cache(maxsize=None)
def _dm_partitioned(nplanes: int, bits: int, qfn: str, out_dtype_name: str,
                    tile_b: Optional[int], interpret: bool = False,
                    code_bits: Optional[int] = None):
    from jax.experimental.custom_partitioning import custom_partitioning

    out_dtype = jnp.dtype(out_dtype_name)

    def _impl(x, *ops):
        planes = ops[:nplanes]
        if qfn == "b":
            scale, zero = ops[nplanes], None
        else:
            scale, zero = ops[nplanes], ops[nplanes + 1]
        return _dequant_matmul_local(
            x, planes, scale, zero, bits=bits, qfn=qfn, tile_m=None,
            tile_b=tile_b, interpret=interpret, out_dtype=out_dtype,
            code_bits=code_bits)

    fn = custom_partitioning(_impl)

    lhs = ["b d"] + [f"w{p} m" for p in range(nplanes)]
    repl = ["d"] + [f"w{p}" for p in range(nplanes)]
    if qfn == "b":
        lhs.append("i j")
        repl += ["i", "j"]
    else:
        lhs += ["i m", "k m"]
        repl += ["i", "k"]
    rule = ", ".join(lhs) + " -> b m"

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        plane_spec = arg_shapes[1].sharding.spec
        x_spec = arg_shapes[0].sharding.spec
        b_axis = x_spec[0] if len(x_spec) else None
        m_axis = plane_spec[-1] if len(plane_spec) else None
        return NamedSharding(mesh, P(b_axis, m_axis))

    def partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        result_sharding = result_shape.sharding
        arg_shardings = tuple(a.sharding for a in arg_shapes)
        # every non-(b|m) dim replicated (the need_replication contract);
        # shardy enforces this before we get here, GSPMD via the specs we
        # return (the partitioner inserts the reshards)
        m_axis = result_sharding.spec[-1] if len(result_sharding.spec) \
            else None
        b_axis = result_sharding.spec[0] if len(result_sharding.spec) \
            else None
        fixed = [NamedSharding(mesh, P(b_axis, None))]
        for p in range(nplanes):
            fixed.append(NamedSharding(mesh, P(None, m_axis)))
        if qfn == "b":
            fixed.append(NamedSharding(mesh, P(None, None)))
        else:
            fixed.append(NamedSharding(mesh, P(None, m_axis)))
            fixed.append(NamedSharding(mesh, P(None, m_axis)))

        def lower_fn(x, *ops):
            return _impl(x, *ops)

        return mesh, lower_fn, result_sharding, tuple(fixed)

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(repl),
    )
    return fn


def dequant_matmul(
    x: jax.Array,
    planes: Tuple[jax.Array, ...],
    scale: jax.Array,
    zero: Optional[jax.Array],
    *,
    bits: int,
    qfn: str = "b",
    tile_m: Optional[int] = None,
    tile_b: Optional[int] = None,
    interpret: bool = False,
    out_dtype=None,
    partitioned: Optional[bool] = None,
    code_bits: Optional[int] = None,
) -> jax.Array:
    """y = x @ dequant(packed).T — SPMD-aware fused inference entry.

    Single-device semantics identical to the raw kernel; under a mesh the
    custom-partitioning rules shard the kernel over the out-features axis
    (see the block comment above). ``tile_m`` pins a tile only on the
    non-partitioned path (the partitioned path recomputes it per shard).
    ``partitioned`` default: on unless interpreting (tests/commreport pass
    partitioned=True with interpret=True to exercise the SPMD rules on the
    CPU virtual mesh).
    """
    out_dtype = out_dtype or x.dtype
    if partitioned is None:
        partitioned = not interpret
    if not partitioned or tile_m is not None:
        return _dequant_matmul_local(
            x, planes, scale, zero, bits=bits, qfn=qfn, tile_m=tile_m,
            tile_b=tile_b, interpret=interpret, out_dtype=out_dtype,
            code_bits=code_bits)
    m = planes[0].shape[-1]
    fn = _dm_partitioned(len(planes), bits, qfn, jnp.dtype(out_dtype).name,
                         tile_b, interpret, code_bits)
    if qfn == "b":
        extra = (jnp.asarray(scale, jnp.float32).reshape(1, 1),)
    else:
        extra = (scale.reshape(1, m), zero.reshape(1, m))
    return fn(x, *planes, *extra)


def dequant_matmul_ref(
    x: jax.Array,
    planes: Tuple[jax.Array, ...],
    scale: jax.Array,
    zero: Optional[jax.Array],
    *,
    bits: int,
    qfn: str = "b",
    code_bits: Optional[int] = None,
) -> jax.Array:
    """Pure-jnp reference (and CPU fallback) with identical semantics."""
    from quip_tpu.pack.format import unpack_codes

    d = x.shape[-1]
    codes = unpack_codes(planes, bits, d).astype(jnp.float32)
    maxq = float(2**(code_bits or bits) - 1)
    if qfn == "b":
        W = ((codes / maxq) * 2 - 1) * jnp.asarray(scale, jnp.float32)
    else:
        W = (scale.reshape(-1, 1)
             * (codes - zero.reshape(-1, 1))).astype(jnp.float32)
    return (x.astype(jnp.float32) @ W.T).astype(x.dtype)
