"""Serving CLI: continuous-batching generation from a (packed) checkpoint.

No reference counterpart (the reference's decode loop is commented out,
llama.py:530-538); this is the new serving surface.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

from quip_tpu.cli import common


def main(argv=None):
    p = argparse.ArgumentParser("quip_tpu.serve")
    common.add_model_args(p)
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_seq", type=int, default=512)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=0,
                   help="sample from the k highest-probability tokens "
                        "(0 = full vocab)")
    p.add_argument("--top_p", type=float, default=1.0,
                   help="nucleus sampling mass (1.0 = no filter)")
    p.add_argument("--self_draft", type=int, default=0,
                   help="speculative decoding with a layer-skip self-draft: "
                        "the target's first N blocks (zero extra weights)")
    p.add_argument("--spec_draft", type=str, default=None,
                   help="speculative decoding: checkpoint dir of a draft "
                        "model (its config comes from the checkpoint meta)")
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft window length per speculative step")
    p.add_argument("--stop_token", type=int, action="append", default=None,
                   help="stop generation at this token id (repeatable; "
                        "the stop token is included in the output)")
    p.add_argument("--stop_eos", action="store_true",
                   help="stop at the tokenizer's EOS token")
    p.add_argument("--system_prompt", type=str, default=None,
                   help="shared-prefix caching: this text's KV is computed "
                        "once and attended by every request (per-request "
                        "opt-out via the HTTP API's use_prefix=false)")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve an HTTP JSON API (GET /health, "
                        "POST /generate) instead of batch prompts")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--prompt", type=str, action="append", default=None,
                   help="prompt(s); '-' reads one prompt per stdin line")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways over the device mesh")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways (serving batch sharded over "
                        "dp; combine with --tp for a dp x tp mesh)")
    p.add_argument("--kv_quant", action="store_true",
                   help="int8-quantize the KV cache (halves cache HBM "
                        "traffic: +14-17%% at batch 32, +9-12%% at 2k-8k "
                        "ctx, and 13B batch-32 serving gains +36%% because "
                        "the faster unrolled step then fits the HBM "
                        "budget — docs/PERF.md round 4; recommended for "
                        "batched and long-context serving)")
    p.add_argument("--no_paged", action="store_true",
                   help="use the flat arena KV cache instead of the paged "
                        "two-level cache (paged measured 1.8-6.8x served "
                        "throughput — docs/PERF.md)")
    p.add_argument("--hot", type=int, default=32,
                   help="paged mode: hot-ring size (flush period)")
    p.add_argument("--page", type=int, default=64,
                   help="paged mode: frozen-arena read-page size")
    p.add_argument("--warmup", action="store_true",
                   help="pre-build the serving programs before the timed "
                        "batch (HTTP mode always warms; see Engine.warmup)")
    p.add_argument("--no_chunked", action="store_true",
                   help="decode per-token instead of up to 16 tokens per "
                        "dispatch (chunked amortizes the per-step host "
                        "read 16x on relayed backends)")
    p.add_argument("--no_overlap", action="store_true",
                   help="serial chunk loop instead of the overlapped "
                        "double-buffered scheduler (Engine.pump) — A/B "
                        "switch; tokens are identical under greedy")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="overlapped-pump chunks kept in flight: 2 "
                        "(default) removes the commit-read wait; 3-4 "
                        "buy ~+2-3%% batch throughput (90%% of the "
                        "in-dispatch ceiling, r5) for ~1-2 extra chunks "
                        "of token-commit latency at saturation")
    p.add_argument("--max_chunk", type=int, default=None,
                   help="tokens per dispatch (default: 16 plain; spec "
                        "engines use S=min(8, hot//(2K)) draft+verify "
                        "iterations — give spec --hot 64 to unlock the "
                        "S=8 sweet spot)")
    p.add_argument("--admit_limit", type=int, default=None,
                   help="max prefills per scheduling boundary while decode "
                        "is ongoing (burst admission otherwise stalls the "
                        "running streams; unset = admit greedily)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    params, cfg = common.load_model(args)
    if args.load:
        from quip_tpu.pack.model import load_checkpoint
        params, meta = load_checkpoint(args.load)
        print(f"loaded {meta}", file=sys.stderr)

    mesh = None
    if args.tp > 1 or args.dp > 1:
        if args.no_paged:
            p.error("--no_paged is incompatible with --tp/--dp: mesh "
                    "serving runs the paged production step")
        # the Engine places everything itself (split weights, paged
        # caches, prefixes, spec draft — parallel/mesh.py rules)
        from quip_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=args.tp)

    from quip_tpu.eval.zeroshot.lm import ByteTokenizer, load_hf_tokenizer
    try:
        tokenizer = load_hf_tokenizer(args.model)
    except Exception:
        tokenizer = ByteTokenizer(cfg.vocab_size)

    prompts = args.prompt or ["Hello"]
    if prompts == ["-"]:
        prompts = [ln.rstrip("\n") for ln in sys.stdin if ln.strip()]

    import jax
    import jax.numpy as jnp

    from quip_tpu.serve.engine import Engine
    cache_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                   else jnp.float32)
    draft = None
    if args.self_draft and args.spec_draft:
        p.error("--self_draft and --spec_draft are mutually exclusive")
    if args.self_draft:
        from quip_tpu.serve.speculative import make_self_draft
        draft = make_self_draft(params, cfg, args.self_draft)
    elif args.spec_draft:
        from quip_tpu.models import get_config
        from quip_tpu.pack.model import load_checkpoint
        dparams, dmeta = load_checkpoint(args.spec_draft)
        draft = (dparams, get_config(dmeta["model"]))

    prefix = (tokenizer.encode(args.system_prompt)
              if args.system_prompt else None)
    eng = Engine(params, cfg, max_batch=args.max_batch,
                 max_seq=args.max_seq, kv_quant=args.kv_quant,
                 cache_dtype=cache_dtype, paged=not args.no_paged,
                 hot=args.hot, page=args.page, seed=args.seed,
                 draft=draft, spec_k=args.spec_k, shared_prefix=prefix,
                 mesh=mesh, admit_limit=args.admit_limit,
                 pipeline_depth=args.pipeline_depth)
    if args.http is not None:
        from quip_tpu.serve.server import serve_http
        # build all serving programs before accepting traffic (a cold
        # engine pays ~14 s to minutes of trace+compile on its first
        # batch through relayed backends — Engine.warmup)
        print("warming serving programs...", file=sys.stderr)
        eng.warmup(chunked=not args.no_chunked)
        httpd, loop = serve_http(eng, host=args.host, port=args.http,
                                 tokenizer=tokenizer,
                                 chunked=not args.no_chunked,
                                 overlap=not args.no_overlap,
                                 max_chunk=args.max_chunk)
        print(f"serving on http://{args.host}:{args.http} "
              f"(POST /generate, GET /health)", file=sys.stderr)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()
            loop.shutdown()
        return

    if args.warmup:
        print("warming serving programs...", file=sys.stderr)
        eng.warmup(chunked=not args.no_chunked)
    stop = list(args.stop_token or [])
    if args.stop_eos:
        eos = getattr(tokenizer, "eos_token_id", None)
        if eos is not None:
            stop.append(int(eos))
    t0 = time.time()
    reqs = eng.run([dict(prompt=tokenizer.encode(s),
                         max_new_tokens=args.max_new_tokens,
                         temperature=args.temperature, top_k=args.top_k,
                         top_p=args.top_p, stop=stop or None)
                    for s in prompts],
                   chunked=not args.no_chunked,
                   overlap=not args.no_overlap,
                   max_chunk=args.max_chunk)
    dt = time.time() - t0
    total_toks = sum(len(r.generated) for r in reqs)
    for s, r in zip(prompts, reqs):
        print(json.dumps({"prompt": s,
                          "completion": tokenizer.decode(r.generated)}))
    print(f"[{total_toks} tokens in {dt:.2f}s = "
          f"{total_toks / dt:.1f} tok/s]", file=sys.stderr)


if __name__ == "__main__":
    main()
