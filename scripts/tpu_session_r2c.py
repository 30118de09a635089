"""Chip batch 3 (one process, run ALONE): refresh the serving-tier numbers
that predate the unrolled decode step + padded tiles (README/PERF round-1
rows: b8 936 / b32 1841-1905 tok/s, cap-2048 152.5, engine 443-476 served,
spec greedy step 11.5 ms).
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

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from bench import bench_decode

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built packed 7B in {time.time()-t0:.0f}s", flush=True)

    def batched():
        for b, cap in ((1, 160), (8, 256), (32, 256), (1, 2048)):
            tps = bench_decode(packed, cfg, steps=96, batch=b, max_seq=cap)
            print(f"b={b} cap={cap}: {tps:.1f} tok/s", flush=True)

    phase("batched-decode", batched)

    def served():
        from quip_tpu.serve.engine import Engine
        from bench_spec import e2e

        eng = Engine(packed, cfg, max_batch=8, max_seq=192,
                     cache_dtype=jnp.bfloat16, paged=True, hot=32, page=64)
        e2e(eng, n_req=8)                       # warm compiles
        tps, dt = e2e(eng, n_req=24)
        print(f"engine paged+chunked b8: {tps:.1f} tok/s served "
              f"({dt:.1f}s)", flush=True)

    phase("engine-served", served)

    def spec_steps():
        from quip_tpu.serve.speculative import make_self_draft
        from bench_spec import step_costs

        dparams, dcfg = make_self_draft(packed, cfg, 4)
        step_costs(packed, cfg, dparams, dcfg, 32, 64)

    phase("spec-steps", spec_steps)


if __name__ == "__main__":
    main()
