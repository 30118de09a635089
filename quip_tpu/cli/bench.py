"""Token-by-token decode benchmark CLI.

Parity with the reference `benchmark()` harness (llama.py:418-471,
opt.py:431-482 — commented out of its CLIs): median per-token latency over a
prompt replay, optional perplexity cross-check, plus throughput at a given
batch size (the serving-relevant number the reference never had).
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
    p.add_argument("--check", action="store_true",
                   help="also report nll of the benchmarked continuation "
                        "(llama.py:447, 464-467)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    params, cfg = common.load_model(args)
    if args.load:
        from quip_tpu.pack.model import load_checkpoint
        params, meta = load_checkpoint(args.load)
        print(f"loaded {meta}")

    caches = M.init_caches(args.batch, args.max_seq, cfg,
                           dtype=jnp.bfloat16)

    @jax.jit
    def step(params, tok, caches):
        logits, caches = M.decode_step(params, tok, caches, cfg)
        nll = -jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        return nxt, jnp.take_along_axis(nll, nxt, 1)[:, 0], caches

    tok = jnp.zeros((args.batch, 1), jnp.int32)
    # warmup + compile
    for _ in range(4):
        tok, nll, caches = step(params, tok, caches)
    int(tok[0, 0])

    lat, nlls = [], []
    for i in range(args.tokens):
        t0 = time.time()
        tok, nll, caches = step(params, tok, caches)
        _ = int(tok[0, 0])    # per-token hard sync: median latency semantics
        lat.append(time.time() - t0)
        nlls.append(float(nll[0]))

    out = {
        "median_s_per_token": float(np.median(lat)),
        "tokens_per_sec": args.batch / float(np.median(lat)),
        "batch": args.batch,
    }
    if args.check:
        out["continuation_nll"] = float(np.mean(nlls))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
