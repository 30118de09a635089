"""Round-3 chip session — ONE process, run ALONE on the chip, output to a
FILE with PYTHONUNBUFFERED=1 (CLAUDE.md measurement rules; TPU cold start
through the relay can take 15-20 min before the first program runs).

    nohup env PYTHONUNBUFFERED=1 timeout 14000 \
        python scripts/tpu_session_r3.py > /tmp/r3_session.log 2>&1 &

Phases (bench FIRST — it is the round's deliverable and must be measured
in a clean window):
  A. bench.py main() — the restructured early-emit headline (also warms
     the persistent compile cache for the driver's end-of-round run).
  B. rht_sf sign-fold A/B/A: 2-bit decode with standard 'rht' rotations
     vs the sign-folded pure-Kronecker format (round-3 roadmap item 1;
     est. +2%).
  C. 13B batch-32: scan-fallback leg (the unrolled form OOM'd in round 2;
     Engine now auto-falls-back — measure the scan number, and confirm
     the unrolled attempt still exceeds the budget heuristic).
  D. 7B 2048-ctx steady sanity (round-2: 165.4 bf16 / 168.6 int8).
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

    # ---- A: the headline, exactly as the driver runs it ----
    phase("A-bench-headline", bench_mod.main)

    cfg7 = replace(get_config("llama-2-7b"), dtype="bfloat16")

    # ---- B: sign-fold A/B/A (same-run, same process) ----
    def signfold_ab():
        res = {}
        for tag, mode in (("rht-1", "rht"), ("rht_sf", "rht_sf"),
                          ("rht-2", "rht")):
            os.environ["QUIP_BENCH_PROJ"] = mode
            packed = _packed_llama(cfg7, bits=2, seed=0, head_bits=2)
            tps = bench_mod.bench_decode(packed, cfg7, steps=96)
            res[tag] = tps
            print(f"  2-bit b1 proj={mode} [{tag}]: {tps:.1f} tok/s",
                  flush=True)
            del packed
            gc.collect()
        os.environ.pop("QUIP_BENCH_PROJ", None)
        drift = abs(res["rht-1"] - res["rht-2"]) / res["rht-1"]
        gain = res["rht_sf"] / ((res["rht-1"] + res["rht-2"]) / 2) - 1
        print(f"  A/B/A drift {drift*100:.1f}%  sign-fold gain "
              f"{gain*100:+.1f}%", flush=True)

    phase("B-signfold-ABA", signfold_ab)

    # ---- C: 13B b32 — scan fallback ----
    def b13_scan():
        cfg = replace(get_config("llama-2-13b"), dtype="bfloat16")
        packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        # heuristic check (the numbers the Engine would compute)
        import jax.numpy as jnp
        from quip_tpu.models import paged as PG
        caches = PG.init_paged(32, 256 + 32, cfg, dtype=jnp.bfloat16,
                               hot=32, page=64)

        def nbytes(tree):
            return sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves(tree) if hasattr(x, "size"))

        est = nbytes(packed) + 2 * nbytes(caches)
        print(f"  13B b32 est working set {est/2**30:.1f} GiB "
              f"(budget 13.5 -> {'scan' if est > 13.5 * 2**30 else 'unroll'})",
              flush=True)
        del caches
        gc.collect()
        tps = bench_mod.bench_decode(packed, cfg, steps=96, batch=32,
                                     max_seq=256, unroll=False)
        print(f"  13B b32 cap256 SCAN form: {tps:.1f} tok/s "
              f"(round-1 scan reference: 1156)", flush=True)
        tps1 = bench_mod.bench_decode(packed, cfg, steps=96, batch=1,
                                      max_seq=160, unroll=True)
        print(f"  13B b1 unrolled: {tps1:.1f} tok/s (r2: 158.9)", flush=True)
        del packed
        gc.collect()

    phase("C-13b-scan-fallback", b13_scan)

    # ---- D: 7B steady sanity ----
    def steady7():
        from bench_steady import steady
        packed = _packed_llama(cfg7, bits=2, seed=0, head_bits=2)
        for kvq in (False, True):
            tps = steady(packed, cfg7, kv_quant=kvq)
            print(f"  7B 2048-steady kv_quant={kvq}: {tps:.1f} tok/s "
                  f"(r2: 162.8 / 168.6)", flush=True)
        del packed
        gc.collect()

    phase("D-7b-steady", steady7)


if __name__ == "__main__":
    main()
