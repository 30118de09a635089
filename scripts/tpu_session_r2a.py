"""One-process TPU batch for this session (CLAUDE.md: batch ALL chip work
into a single process; startup through the relay can take 15-20 min).

Phases, in order (bench-sensitive first):
  1. bench.py main            — headline + dense-baseline cache + 2/3/4-bit
  2. scripts/bench_tiles.py   — kernel tile sweep on the lagging shapes
  3. scripts/bench_prefill.py — flash prefill parity + 2k/4k/8k timings

Write output to a FILE with PYTHONUNBUFFERED=1 (CLAUDE.md).
"""
import sys
import time
import traceback

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

    import bench
    phase("headline-bench", bench.main)

    import bench_tiles
    phase("tile-sweep", bench_tiles.main)

    import bench_prefill
    phase("flash-prefill", bench_prefill.main)


if __name__ == "__main__":
    main()
