"""Packed-matmul kernel variant microbench (real chip).

Hypothesis under test: the production kernel's `jnp.concatenate` of unpack
slabs materializes the whole (d, TM) bf16 operand in VMEM (one extra
write+read pass over 16x the packed bytes) — plausibly the reason it runs at
0.55-0.65 of DMA roofline while byte-spread W2A8 (fewer VPU ops) didn't help
(docs/PERF.md round-2 roadmap item 1). Variant "slabdot" dots each slab
against its contiguous x chunk instead (x-chunk k is x[:, k*2nw:(k+1)*2nw]),
never forming the concatenated operand; that also cuts the VMEM budget ~2.5x,
so larger tile_m (fewer grid steps / bigger DMA chunks) becomes legal.

Methodology (docs/PERF.md): N dependent iterations inside one jitted
`lax.fori_loop` with a DYNAMIC trip count; time two values of N; slope =
(t2-t1)/(n2-n1); median of 3. One final host read syncs the chain.

Run me ALONE on the chip (CLAUDE.md: never two TPU processes).
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from quip_tpu.pack.format import PLANE_SPLITS, pack_codes  # noqa: E402
from quip_tpu.utils import enable_compile_cache  # noqa: E402

_BF16_128 = 0x43004300


def _slabdot_kernel(plane_fields, plane_weights, qfn, maxq, nplanes,
                    x_ref, *refs):
    w_refs = refs[:nplanes]
    o_ref = refs[-1]
    x_bf = x_ref[:].astype(jnp.bfloat16)
    xsum = jnp.sum(x_bf.astype(jnp.float32), axis=1, keepdims=True)
    ycodes = None
    for w_ref, fb, pw in zip(w_refs, plane_fields, plane_weights):
        w = pltpu.bitcast(w_ref[:], jnp.uint32)          # (nw, TM)
        nw = w.shape[0]
        fph = 16 // fb
        mask = jnp.uint32(((1 << fb) - 1) * 0x00010001)
        exp = jnp.uint32(_BF16_128)
        acc = None
        for k in range(fph):
            slab = pltpu.bitcast(((w >> (fb * k)) & mask) | exp,
                                 jnp.bfloat16)           # (2nw, TM)
            xk = x_bf[:, k * 2 * nw:(k + 1) * 2 * nw]    # (TB, 2nw)
            part = jax.lax.dot_general(
                xk, slab, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        acc = acc - 128.0 * xsum
        acc = acc if pw == 1 else pw * acc
        ycodes = acc if ycodes is None else ycodes + acc
    s_ref = refs[nplanes]
    s = s_ref[0, 0].astype(jnp.float32)
    o_ref[:] = (s * ((2.0 / maxq) * ycodes - xsum)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "tile_m",))
def slabdot_matmul(x, planes, scale, *, bits, tile_m):
    B, d = x.shape
    m = planes[0].shape[-1]
    maxq = float(2**bits - 1)
    splits = PLANE_SPLITS[bits]
    grid = (1, m // tile_m)
    in_specs = [pl.BlockSpec((B, d), lambda b, i: (b, 0),
                             memory_space=pltpu.VMEM)]
    for p in planes:
        nw = p.shape[0]
        in_specs.append(pl.BlockSpec((nw, tile_m), lambda b, i: (0, i),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                                 memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((B, tile_m), lambda b, i: (b, i),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _slabdot_kernel, tuple(fb for fb, _ in splits),
        tuple(pw for _, pw in splits), "b", maxq, len(planes))
    flops = 2 * B * d * m * len(splits)
    bytes_accessed = (x.size * 2 + sum(p.size * 4 for p in planes) + B * m * 2)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
    )(x, *planes, jnp.asarray(scale, jnp.float32).reshape(1, 1))


def chain(fn, d, m, x0, n):
    """n dependent iterations, dynamic trip count, one program."""
    def body(_, x):
        y = fn(x)                                # (B, m) f32-ish
        if m >= d:
            fb = y[:, :d]
        else:
            fb = jnp.pad(y, ((0, 0), (0, d - m)))
        return x + 1e-24 * fb.astype(x.dtype)
    return lax.fori_loop(0, n, body, x0)


def slope_time(fn, x0, d, m, n1=200, n2=1800, reps=5):
    run = jax.jit(functools.partial(chain, fn, d, m))
    # warm both trip counts (same program: dynamic n)
    float(jnp.sum(run(x0, jnp.int32(4))[0, 0]))
    slopes = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(run(x0, jnp.int32(n1))[0, 0]))
        t1 = time.time() - t0
        t0 = time.time()
        float(jnp.sum(run(x0, jnp.int32(n2))[0, 0]))
        t2 = time.time() - t0
        slopes.append((t2 - t1) / (n2 - n1))
    return sorted(slopes)[len(slopes) // 2]


def main():
    enable_compile_cache()
    from quip_tpu.kernels.dequant_matmul import dequant_matmul

    bits = 2
    B = 1
    rng = np.random.default_rng(0)
    # 7B decode shapes: wo, qkv-fused, gate-up-fused, down, lm_head
    shapes = [(4096, 4096), (12288, 4096), (22016, 4096), (4096, 11008),
              (32000, 4096)]
    tile_candidates = (512, 640, 1024, 1280, 2048, 3200, 5504)
    for m, d in shapes:
        codes = jnp.asarray(rng.integers(0, 4, size=(m, d)), jnp.int32)
        planes = pack_codes(codes, bits)
        planes = tuple(jax.device_put(p) for p in planes)
        scale = jnp.float32(0.02)
        x0 = jnp.asarray(rng.standard_normal((B, d)), jnp.bfloat16)
        pbytes = sum(p.size * 4 for p in planes)

        variants = {}
        variants["concat/dflt"] = lambda x: dequant_matmul(
            x, planes, scale, None, bits=bits, qfn="b")

        for tm in tile_candidates:
            if m % tm or tm % 128:
                continue
            variants[f"slabdot/{tm}"] = functools.partial(
                slabdot_matmul, planes=planes, scale=scale,
                bits=bits, tile_m=tm)

        # numerics sanity: variants agree with production kernel
        yref = np.asarray(dequant_matmul(
            x0, planes, scale, None, bits=bits, qfn="b"), np.float32)
        for name, fn in list(variants.items()):
            for attempt in range(3):
                try:
                    y = np.asarray(fn(x0), np.float32)
                    break
                except Exception as e:
                    if attempt == 2:
                        print(f"(m={m:5d}, d={d:5d}) {name:12s} "
                              f"COMPILE-FAIL {e!r}"[:140], flush=True)
                        del variants[name]
                        y = None
            if y is None:
                continue
            err = np.max(np.abs(y - yref)) / (np.max(np.abs(yref)) + 1e-9)
            assert err < 2e-2, (name, err)

        # A/B/A: re-measure the first variant at the end to expose drift
        order = list(variants.items())
        order.append((order[0][0] + "#2", order[0][1]))
        for name, fn in order:
            for attempt in range(3):     # remote compile helper can flake
                try:
                    t = slope_time(fn, x0, d, m)
                    break
                except Exception as e:
                    if attempt == 2:
                        print(f"(m={m:5d}, d={d:5d}) {name:12s} FAILED {e!r}"
                              [:120], flush=True)
                        t = None
            if t is None:
                continue
            bw = pbytes / t / 1e9
            flag = "  SUSPECT(>roofline)" if bw > 850 else ""
            print(f"(m={m:5d}, d={d:5d}) {name:14s} "
                  f"{t*1e6:7.1f} us  {bw:6.1f} GB/s{flag}", flush=True)


if __name__ == "__main__":
    main()
