"""Reusable long-context steady-state decode probe (refactored out of the
round-2 one-shot session scripts; findings in docs/PERF.md).

Method: prefill ~ctx tokens into the paged cache, then time `steps` decode
steps on the unrolled engine — so page loops stream real context, not an
empty cache. Run ALONE on the chip (CLAUDE.md measurement rules).

    python scripts/bench_steady.py [--model llama-2-7b] [--ctx 1900]
        [--cap 2048] [--kv_quant] [--bits 2]
"""
import sys
import time
from dataclasses import replace

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def steady(params, cfg, *, ctx=1900, cap=2048, steps=96, kv_quant=False,
           hot=32, page=64):
    """tok/s decoding at batch 1 with `ctx` tokens already in the cache."""
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
    int(tok[0, 0])                 # hard sync (relay: block_until_ready
    t0 = time.time()               # does not await execution)
    for _ in range(steps):
        tok, caches = step(tok, caches)
    int(tok[0, 0])
    return steps / (time.time() - t0)


def main(argv=None):
    import argparse

    import jax

    p = argparse.ArgumentParser("bench_steady")
    p.add_argument("--model", default="llama-2-7b")
    p.add_argument("--bits", type=int, default=2)
    p.add_argument("--ctx", type=int, default=1900)
    p.add_argument("--cap", type=int, default=2048)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--kv_quant", action="store_true")
    args = p.parse_args(argv)

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from quip_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)
    cfg = replace(get_config(args.model), dtype="bfloat16")
    packed = _packed_llama(cfg, bits=args.bits, seed=0, head_bits=args.bits)
    tps = steady(packed, cfg, ctx=args.ctx, cap=args.cap, steps=args.steps,
                 kv_quant=args.kv_quant)
    print(f"{args.model} {args.bits}-bit steady ctx={args.ctx} "
          f"cap={args.cap} kv_quant={args.kv_quant}: {tps:.1f} tok/s",
          flush=True)


if __name__ == "__main__":
    main()
