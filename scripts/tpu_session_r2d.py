"""Chip batch 4 (one process, run ALONE): headline with the 3-in-4
transcode active + the engine served-throughput phase batch 3 lost.
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
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from quip_tpu.utils import enable_compile_cache
    enable_compile_cache()

    import bench
    phase("headline-bench", bench.main)

    def served():
        from __graft_entry__ import _packed_llama
        from quip_tpu.models import get_config
        from quip_tpu.serve.engine import Engine
        from bench_spec import e2e

        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
        packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        eng = Engine(packed, cfg, max_batch=8, max_seq=192,
                     cache_dtype=jnp.bfloat16, paged=True, hot=32, page=64)
        e2e(eng, n_req=8)                       # warm compiles
        tps, dt = e2e(eng, n_req=24)
        print(f"engine paged+chunked b8: {tps:.1f} tok/s served "
              f"({dt:.1f}s)", flush=True)

    phase("engine-served", served)


if __name__ == "__main__":
    main()
