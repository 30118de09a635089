"""Round-3 chip session C — Engine-path regression check.

The Engine step jits were refactored this round (paged_*_any dispatch for
the unroll/scan dual form + mesh placement hooks). CPU tests pin token
equality; this session confirms the CHIP throughput did not regress on
the serving tier (r2 references: plain paged+chunked e2e 476.2 @ b8
max_seq 192; batched decode 1314.7 b8 / 1945.0 b32; spec greedy step
6.96 ms).

Run ALONE: nohup env PYTHONUNBUFFERED=1 timeout 10000 \
    python scripts/tpu_session_r3c.py > /tmp/r3c_session.log 2>&1 &
"""
import gc
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

    print("backend:", jax.default_backend(), flush=True)
    from quip_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import bench as bench_mod
    from bench_spec import e2e
    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from quip_tpu.serve.engine import Engine
    from quip_tpu.serve.speculative import make_self_draft

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)

    def batched():
        for b, cap in ((8, 256), (32, 256)):
            tps = bench_mod.bench_decode(packed, cfg, steps=96, batch=b,
                                         max_seq=cap)
            print(f"  7B 2-bit b={b}: {tps:.1f} tok/s "
                  f"(r2: {'1314.7' if b == 8 else '1945.0'})", flush=True)

    phase("A-batched-decode", batched)

    def served():
        common = dict(max_batch=8, max_seq=192, paged=True, hot=32,
                      page=64)
        eng = Engine(packed, cfg, **common)
        tps, dt = e2e(eng)
        print(f"  plain paged+chunked e2e: {tps:.1f} tok/s served "
              f"({dt:.1f}s; r2 same config: 476.2)", flush=True)
        del eng
        gc.collect()
        draft = make_self_draft(packed, cfg, 4)
        eng = Engine(packed, cfg, draft=draft, spec_k=4, **common)
        tps, dt = e2e(eng)
        print(f"  spec self-draft K=4 e2e: {tps:.1f} tok/s served "
              f"({dt:.1f}s; r2: 155.0 — random weights, ~chance accept)",
              flush=True)
        del eng
        gc.collect()

    phase("B-engine-served", served)


if __name__ == "__main__":
    main()
