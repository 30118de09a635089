"""Chip batch 5 (one process, run ALONE): 13B refresh + long-context
steady-state with int8 KV on the unrolled engine (round-1 rows: 13B 84.7
b1 / 887-1156 b32; 2048-steady 112-119).

Steady-state method: prefill ~1900 tokens into the paged cache via
paged_prefill, then time 96 decode steps (so page loops stream real
context, not an empty cache).
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


def steady(params, cfg, *, ctx=1900, cap=2048, steps=96, kv_quant=False,
           hot=32, page=64):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from quip_tpu.models import paged as PG

    caches = PG.init_paged(1, cap, cfg, dtype=jnp.bfloat16,
                           quantized=kv_quant, hot=hot, page=page)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 1000, (1, ctx)),
                       jnp.int32)
    plen = jnp.asarray([ctx], jnp.int32)
    logits, caches = jax.jit(
        lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg),
        donate_argnums=3)(params, toks, plen, caches)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

    misc_layers = PG.split_blocks(params)

    @jax.jit
    def ustep(misc, layers, tok, caches):
        lg, hot_s = PG.paged_decode_step_unrolled(misc, layers, tok, caches,
                                                  cfg, page=page)
        return jnp.argmax(lg, -1)[:, None].astype(jnp.int32), hot_s

    pflush = jax.jit(PG.flush_hot, donate_argnums=0)
    n = 0

    def step(tok, caches):
        nonlocal n
        tok, hot_s = ustep(*misc_layers, tok, caches)
        caches = PG.advance(caches, hot_s)
        n += 1
        if n >= hot:
            caches = pflush(caches)
            n = 0
        return tok, caches

    for _ in range(4):
        tok, caches = step(tok, caches)
    int(tok[0, 0])
    t0 = time.time()
    for _ in range(steps):
        tok, caches = step(tok, caches)
    int(tok[0, 0])
    return steps / (time.time() - t0)


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from quip_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from bench import bench_decode

    cfg7 = replace(get_config("llama-2-7b"), dtype="bfloat16")
    packed7 = _packed_llama(cfg7, bits=2, seed=0, head_bits=2)

    def longctx():
        for kvq in (False, True):
            tps = steady(packed7, cfg7, kv_quant=kvq)
            print(f"7B 2048-steady kv_quant={kvq}: {tps:.1f} tok/s",
                  flush=True)

    phase("7b-long-context-steady", longctx)
    del packed7
    gc.collect()

    def b13():
        cfg = replace(get_config("llama-2-13b"), dtype="bfloat16")
        packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        for b, cap in ((1, 160), (32, 256)):
            tps = bench_decode(packed, cfg, steps=96, batch=b, max_seq=cap)
            print(f"13B b={b} cap={cap}: {tps:.1f} tok/s", flush=True)
        del packed
        gc.collect()

    phase("13b-decode", b13)


if __name__ == "__main__":
    main()
