"""Perplexity-eval CLI — parity with opt_eval/llama_eval invocation
(/root/reference/opt.py:648-656)."""
from __future__ import annotations

import argparse
import json

from quip_tpu.cli import common


def main(argv=None):
    p = argparse.ArgumentParser("quip_tpu.eval")
    common.add_model_args(p)
    common.add_data_args(p)
    p.add_argument("--load", type=str, default=None,
                   help="checkpoint dir saved by the quantize CLI")
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)

    params, cfg = common.load_model(args)
    if args.load:
        from quip_tpu.pack.model import load_checkpoint
        params, meta = load_checkpoint(args.load)
        print(f"loaded {meta}")
    (_, test_stream), seqlen = common.get_data(args, cfg)

    from quip_tpu.eval.ppl import perplexity
    ppl = perplexity(params, cfg, test_stream, seqlen, batch=args.batch)
    print(json.dumps({"dataset": args.dataset, "ppl": ppl}))


if __name__ == "__main__":
    main()
