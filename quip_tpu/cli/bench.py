"""Token-by-token decode benchmark CLI.

Parity with the reference `benchmark()` harness (llama.py:418-471,
opt.py:431-482 — commented out of its CLIs): median per-token latency over a
prompt replay, optional perplexity cross-check, plus throughput at a given
batch size and mesh (the serving-relevant numbers the reference never had).

Throughput chains all decode steps with ONE host sync at the end — on
relayed TPU backends a per-token host read costs ~25 ms (docs/PERF.md), so
`median_s_per_token_synced` (which includes that sync, matching the
reference's per-token `torch.cuda.synchronize` semantics) is reported
separately.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from quip_tpu.cli import common


def main(argv=None):
    from quip_tpu.models import model as M

    p = argparse.ArgumentParser("quip_tpu.bench")
    common.add_model_args(p)
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--tokens", type=int, default=128,
                   help="number of decode steps to time")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_seq", type=int, default=256)
    p.add_argument("--kv_quant", action="store_true",
                   help="int8-quantized KV cache")
    p.add_argument("--paged", action="store_true",
                   help="paged two-level KV cache (models/paged.py): decode "
                        "cost scales with used context, not --max_seq")
    p.add_argument("--hot", type=int, default=32,
                   help="paged mode: hot-ring size (flush period)")
    p.add_argument("--page", type=int, default=256,
                   help="paged mode: frozen-arena read-page size")
    p.add_argument("--prefix", type=int, default=0,
                   help="pre-position the cache at this length before "
                        "timing (steady-state decode at a given context; "
                        "content is zeros — cost-identical)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh ways (batch must divide)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh ways — run at 1, 2, 4, ... "
                        "to measure multi-chip scaling efficiency")
    p.add_argument("--check", action="store_true",
                   help="also report nll of the benchmarked continuation "
                        "(llama.py:447, 464-467)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    n_lat = min(args.tokens, 16)
    if args.prefix + 4 + args.tokens + n_lat > args.max_seq - 1:
        p.error(f"--prefix {args.prefix} + --tokens {args.tokens} (+4 "
                f"warmup, +{n_lat} latency probes) exceeds the KV cache "
                f"(--max_seq {args.max_seq}); raise --max_seq")

    params, cfg = common.load_model(args)
    if args.load:
        from quip_tpu.pack.model import load_checkpoint
        params, meta = load_checkpoint(args.load)
        print(f"loaded {meta}")

    mesh = None
    if args.dp * args.tp > 1:
        from jax.sharding import NamedSharding
        from quip_tpu.parallel.mesh import (cache_specs, data_spec,
                                            make_mesh, shard_params)
        if args.batch % args.dp:
            p.error(f"--batch {args.batch} must be divisible by --dp")
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        params = shard_params(params, cfg, mesh)

    if args.paged:
        from quip_tpu.models import paged as PG
        caches = PG.init_paged(args.batch, args.max_seq, cfg,
                               dtype=jnp.bfloat16, quantized=args.kv_quant,
                               hot=args.hot, page=args.page)
        if args.prefix:
            caches = caches._replace(
                base=jnp.full((args.batch,), args.prefix, jnp.int32))
    else:
        caches = M.init_caches(args.batch, args.max_seq, cfg,
                               dtype=jnp.bfloat16, quantized=args.kv_quant)
        if args.prefix:
            caches = caches._replace(
                length=jnp.full((cfg.n_layers,), args.prefix, jnp.int32))
    if mesh is not None:
        # batch over 'dp', KV heads over 'tp' — without these the decode
        # runs replicated and dp/tp scaling numbers are meaningless
        if args.paged:
            from quip_tpu.parallel.mesh import shard_paged
            caches = shard_paged(caches, mesh)
        else:
            cspec = NamedSharding(mesh, cache_specs(cfg))
            caches = type(caches)(*[
                None if x is None else jax.device_put(x, cspec)
                for x in caches[:2]
            ], caches.length, *[
                None if x is None
                else jax.device_put(
                    x, NamedSharding(mesh,
                                     jax.sharding.PartitionSpec(
                                         None, "dp", None, "tp")))
                for x in caches[3:]
            ])

    if args.paged:
        @jax.jit
        def pstep(params, tok, caches):
            logits, hot = PG.paged_decode_step(params, tok, caches, cfg,
                                               page=args.page)
            nll = -jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            return nxt, jnp.take_along_axis(nll, nxt, 1)[:, 0], hot

        pflush = jax.jit(PG.flush_hot, donate_argnums=0)
        hot_ctr = {"n": 0}

        def step(params, tok, caches):
            nxt, nll, hot = pstep(params, tok, caches)
            caches = PG.advance(caches, hot)
            hot_ctr["n"] += 1
            if hot_ctr["n"] >= args.hot:     # deterministic flush schedule
                caches = pflush(caches)
                hot_ctr["n"] = 0
            return nxt, nll, caches
    else:
        @jax.jit
        def step(params, tok, caches):
            logits, caches = M.decode_step(params, tok, caches, cfg)
            nll = -jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            return nxt, jnp.take_along_axis(nll, nxt, 1)[:, 0], caches

    tok = jnp.zeros((args.batch, 1), jnp.int32)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from quip_tpu.parallel.mesh import data_spec
        tok = jax.device_put(tok, NamedSharding(mesh, data_spec()))
    # warmup + compile
    for _ in range(4):
        tok, nll, caches = step(params, tok, caches)
    if args.paged:
        # compile the flush OUTSIDE the timed chain (donated: consumes input)
        caches = pflush(caches)
        hot_ctr["n"] = 0
    int(tok[0, 0])

    # throughput: chain all steps, sync once
    t0 = time.time()
    tok_t, caches_t = tok, caches
    nlls = []
    for _ in range(args.tokens):
        tok_t, nll_t, caches_t = step(params, tok_t, caches_t)
        nlls.append(nll_t)
    int(tok_t[0, 0])
    dt_chain = (time.time() - t0) / args.tokens

    # median latency with a per-token hard sync (reference benchmark()
    # semantics: per-step cuda.synchronize, llama.py:455-457). Continues
    # from the CHAIN's final cache state — the pre-chain snapshot shares
    # (and, in paged mode, has donated away) the frozen buffers.
    lat = []
    tok, caches = tok_t, caches_t
    for _ in range(n_lat):
        t0 = time.time()
        tok, nll, caches = step(params, tok, caches)
        _ = int(tok[0, 0])
        lat.append(time.time() - t0)

    out = {
        "tokens_per_sec": args.batch / dt_chain,
        "s_per_token_chained": dt_chain,
        "median_s_per_token_synced": (float(np.median(lat)) if lat
                                      else None),
        "batch": args.batch,
        "mesh": {"dp": args.dp, "tp": args.tp},
        "kv_quant": bool(args.kv_quant),
        "paged": bool(args.paged),
        "prefix": args.prefix,
    }
    if args.check:
        out["continuation_nll"] = float(np.mean(
            [float(np.asarray(x)[0]) for x in nlls]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
