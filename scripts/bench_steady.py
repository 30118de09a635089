"""Reusable long-context steady-state decode probe (refactored out of the
round-2 one-shot session scripts; findings in docs/PERF.md).

Method: prefill ~ctx tokens into the paged cache, then time `steps` decode
steps on the unrolled engine — so page loops stream real context, not an
empty cache. Run ALONE on the chip (CLAUDE.md measurement rules).

    python scripts/bench_steady.py [--model llama-2-7b] [--ctx 1900]
        [--cap 2048] [--kv_quant] [--bits 2]
"""
import sys
from dataclasses import replace

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def steady(params, cfg, *, ctx=1900, cap=2048, steps=96, kv_quant=False,
           hot=32, page=64):
    """tok/s decoding at batch 1 with `ctx` tokens already in the cache.

    Prefills real context into a paged cache, then delegates the timed
    decode loop to bench.bench_decode(caches=...) — ONE copy of the
    measurement-critical step/flush cadence lives in bench.py."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import bench_decode
    from quip_tpu.models import paged as PG

    # bench_decode runs `warmup` (default 4) untimed steps before `steps`
    # timed ones; overflowing the arena would CLAMP the flush writes and
    # silently corrupt the measurement rather than erroring (ADVICE r3)
    warmup = 4
    if ctx + steps + warmup > cap:
        raise ValueError(
            f"ctx({ctx}) + steps({steps}) + warmup({warmup}) exceeds "
            f"cap({cap}) — raise --cap or lower --ctx/--steps")
    caches = PG.init_paged(1, cap, cfg, dtype=jnp.bfloat16,
                           quantized=kv_quant, hot=hot, page=page)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 1000, (1, ctx)),
                       jnp.int32)
    plen = jnp.asarray([ctx], jnp.int32)
    _, caches = jax.jit(
        lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg),
        donate_argnums=3)(params, toks, plen, caches)
    return bench_decode(params, cfg, steps=steps, max_seq=cap,
                        kv_quant=kv_quant, hot=hot, page=page,
                        caches=caches)


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
