"""Round-3 chip session B — clean re-measure of the noisy r3a windows.

1. Interleaved proj-mode A/B (rht / rht_uf / rht_sf, two rounds): the r3a
   A/B/A had 6.8% drift (first rht leg landed right after the 4-bit bench
   teardown). Interleaving + medians separates mode effect from window
   noise.
2. int8-KV 2048-steady, warmed: the r3a int8 leg read 82.6 — the known
   fresh-compile artifact (docs/PERF.md round-2 batch E saw 85 -> 168.6
   warm). Warm-up run first, then measure, with a bf16 leg in the same
   window.

Run ALONE: nohup env PYTHONUNBUFFERED=1 timeout 10000 \
    python scripts/tpu_session_r3b.py > /tmp/r3b_session.log 2>&1 &
"""
import gc
import os
import sys
import time
import traceback
from dataclasses import replace

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def phase(name, fn):
    print(f"\n===== PHASE {name} start {time.strftime('%H:%M:%S')} =====",
          flush=True)
    t0 = time.time()
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"===== PHASE {name} FAILED =====", flush=True)
    print(f"===== PHASE {name} done in {time.time()-t0:.0f}s =====",
          flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from quip_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import bench as bench_mod
    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config

    cfg7 = replace(get_config("llama-2-7b"), dtype="bfloat16")

    def proj_ab():
        res = {"rht": [], "rht_uf": [], "rht_sf": []}
        order = ["rht", "rht_uf", "rht_sf", "rht_sf", "rht_uf", "rht"]
        for i, mode in enumerate(order):
            os.environ["QUIP_BENCH_PROJ"] = mode
            packed = _packed_llama(cfg7, bits=2, seed=0, head_bits=2)
            tps = bench_mod.bench_decode(packed, cfg7, steps=96)
            res[mode].append(tps)
            print(f"  [{i}] proj={mode}: {tps:.1f} tok/s", flush=True)
            del packed
            gc.collect()
        os.environ.pop("QUIP_BENCH_PROJ", None)
        import statistics
        for mode, xs in res.items():
            print(f"  {mode}: runs {['%.1f' % x for x in xs]} "
                  f"median {statistics.median(xs):.1f}", flush=True)

    phase("A-proj-mode-interleaved-AB", proj_ab)

    def steady_warm():
        from bench_steady import steady
        packed = _packed_llama(cfg7, bits=2, seed=0, head_bits=2)
        t = steady(packed, cfg7, kv_quant=True, steps=16)   # warm compile
        print(f"  int8 warmup leg (discard): {t:.1f}", flush=True)
        for kvq in (True, False, True):
            tps = steady(packed, cfg7, kv_quant=kvq)
            print(f"  7B 2048-steady kv_quant={kvq}: {tps:.1f} tok/s",
                  flush=True)
        del packed
        gc.collect()

    phase("B-steady-int8-warm", steady_warm)


if __name__ == "__main__":
    main()
