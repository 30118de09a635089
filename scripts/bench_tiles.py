"""Tile sweep for the production packed kernel on the two shapes that lag
roofline (docs/PERF.md gen-3 table): gate-up (22016, 4096) at 526 GB/s and
down (4096, 11008) at 562, vs 638-665 for the other decode shapes.

Hypotheses:
  (a) the 5.6 MB packed tile at m=22016 (tile 5504) degrades DMA pipelining
      (the ~3 MB tiles all run 638-665) — but 22016 = 43*512 has no mid-size
      lane-aligned divisors, so also test an m-PADDED pack (22528 = 176*128,
      tile 2816, +2.3%% traffic) whose wall-clock can still win;
  (b) (4096, 11008) may prefer a different step count than the rule's 1024.

Run ALONE on the chip (CLAUDE.md). Output: microseconds + effective GB/s
(bytes = true packed bytes of the UNPADDED shape, so padded variants are
penalized for their extra traffic — wall-clock comparable).
"""
from __future__ import annotations

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quip_tpu.kernels.dequant_matmul import dequant_matmul  # noqa: E402
from quip_tpu.pack.format import pack_codes  # noqa: E402
from bench_kernel import slope_time  # noqa: E402


def _candidate_tiles(m: int, d: int, bits: int, max_n: int = 6):
    """Lane-aligned divisors of m with 2..32 grid steps and a packed tile
    under ~7 MB, thinned to ~max_n spread across the size range."""
    cands = [t for t in range(128, m // 2 + 1, 128)
             if m % t == 0 and 2 <= m // t <= 32
             and d * t * bits / 8 <= 7e6]
    if len(cands) > max_n:
        idx = np.linspace(0, len(cands) - 1, max_n).round().astype(int)
        cands = [cands[i] for i in sorted(set(idx))]
    return tuple(cands)


def main(argv=None):
    import argparse

    from quip_tpu.pack.format import padded_m

    p = argparse.ArgumentParser("bench_tiles")
    p.add_argument("--bits", type=int, default=2)
    args = p.parse_args(argv)

    bits = args.bits
    B = 1
    rng = np.random.default_rng(0)
    if bits == 2:
        # (true_m, padded_m, d, tiles to try on padded_m)
        cases = [
            (22016, 22016, 4096, (512, 5504)),        # rule picks 5504 today
            (22016, 22528, 4096, (1408, 2816, 5632)),  # padded: 16/8/4 steps
            (4096, 4096, 11008, (256, 512, 1024, 2048)),
            (12288, 12288, 4096, (1536, 2048, 3072)),
            (32000, 32000, 4096, (1600, 3200, 6400)),
        ]
    else:
        # generic sweep (the 4-bit rows lag their DMA-bound ceiling —
        # docs/PERF.md round-4 roadmap item 3): true shape + the
        # padded_m pack actually served at this width
        shapes = [(22016, 4096), (4096, 11008), (12288, 4096),
                  (32000, 4096), (4096, 4096)]
        cases = []
        for tm, d in shapes:
            mp = padded_m(tm, d, bits)
            cases.append((tm, mp, d, _candidate_tiles(mp, d, bits)))
            if mp != tm:
                cases.append((tm, tm, d, _candidate_tiles(tm, d, bits)))
    for true_m, m, d, tiles in cases:
        codes = jnp.asarray(rng.integers(0, 2**bits, size=(m, d)),
                            jnp.int32)
        planes = tuple(jax.device_put(p) for p in pack_codes(codes, bits))
        scale = jnp.float32(0.02)
        x0 = jnp.asarray(rng.standard_normal((B, d)), jnp.bfloat16)
        true_bytes = true_m * d * bits / 8

        variants = [("dflt", None)] + [(str(t), t) for t in tiles]
        order = variants + [(variants[0][0] + "#2", variants[0][1])]
        for name, tm in order:
            fn = functools.partial(dequant_matmul, planes=planes,
                                   scale=scale, zero=None, bits=bits,
                                   qfn="b", tile_m=tm)
            fn2 = lambda x: fn(x)  # noqa: E731
            for attempt in range(3):
                try:
                    t = slope_time(fn2, x0, d, m)
                    break
                except Exception as e:
                    if attempt == 2:
                        print(f"(m={m:5d}, d={d:5d}) tile={name:8s} "
                              f"FAILED {e!r}"[:130], flush=True)
                        t = None
            if t is None:
                continue
            bw = true_bytes / t / 1e9
            flag = "  SUSPECT(>roofline)" if bw > 850 else ""
            print(f"(m={m:5d} true={true_m:5d}, d={d:5d}) tile={name:8s} "
                  f"{t*1e6:7.1f} us  {bw:6.1f} GB/s{flag}", flush=True)


if __name__ == "__main__":
    main()
