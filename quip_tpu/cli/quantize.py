"""Quantize CLI — parity with `python opt.py <model> <dataset> ...`
(/root/reference/opt.py:485-656, llama.py:474-576).

Example:
  python -m quip_tpu.cli.quantize opt-tiny synthetic --wbits 2 --quant ldlq \
      --incoh_processing --save /tmp/ckpt --packed
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
    p = argparse.ArgumentParser("quip_tpu.quantize")
    common.add_model_args(p)
    common.add_data_args(p)
    common.add_quant_args(p)
    p.add_argument("--save", type=str, default=None,
                   help="checkpoint dir to write")
    p.add_argument("--packed", action="store_true",
                   help="save packed int codes instead of dequantized dense")
    p.add_argument("--eval", action="store_true",
                   help="run perplexity after quantizing (opt.py:648-656)")
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--proxy_only", action="store_true",
                   help="report proxy losses only, skip final eval")
    p.add_argument("--fuse", action="store_true",
                   help="fuse qkv (and gate+up) before quantizing: one "
                        "rotation + one packed matmul per group")
    p.add_argument("--host_offload", action="store_true",
                   help="keep stacked blocks in host RAM, one block on "
                        "device at a time (quantize 70B on a small slice; "
                        "the TPU analog of the reference's CPU<->GPU block "
                        "streaming, opt.py:94-181)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel calibration over a device mesh: "
                        "Hessian accumulation is an embarrassingly "
                        "parallel psum (SURVEY.md §2.6). Requires "
                        "--chunk == --nsamples so the one calibration "
                        "window spans the mesh (contiguous batch shards; "
                        "smaller windows would each land on one device)")
    p.add_argument("--trace", type=str, default=None,
                   help="write a jax.profiler trace of the quantization "
                        "run to this directory (utils/profiling.trace)")
    p.add_argument("--resume_dir", type=str, default=None,
                   help="per-layer resume directory")
    args = p.parse_args(argv)
    if args.packed and args.groupsize > 0:
        p.error("--packed requires per-row grids; --groupsize produces "
                "per-group scales with no packed representation (the "
                "reference's packed path had no groupsize either, "
                "quant.py:185-220). Drop one of the two flags.")
    if args.dp > 1:
        # checked before any model load / device transfer
        if args.nsamples % args.dp:
            p.error(f"--nsamples {args.nsamples} must be divisible by "
                    f"--dp {args.dp}")
        if args.chunk != args.nsamples:
            p.error("--dp requires --chunk == --nsamples: the driver "
                    "accumulates one chunk window at a time and batch "
                    "shards are contiguous, so only a window spanning the "
                    "whole batch actually runs data-parallel")

    # --host_offload: common.load_model builds the tree host-side (numpy
    # leaves; HF checkpoints stream tensor-by-tensor) — the device never
    # holds more than one block + activations at any point of the run.
    params, cfg = common.load_model(args)
    if args.fuse:
        from quip_tpu.models import model as M
        params = M.fuse_params(params, cfg)
    (calib, test_stream), seqlen = common.get_data(args, cfg)
    qcfg = common.quant_config_from_args(args)

    from quip_tpu.quantize.driver import quantize_model
    from quip_tpu.utils.profiling import trace
    if args.dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from quip_tpu.parallel.mesh import make_mesh, shard_params
        mesh = make_mesh(dp=args.dp, tp=1)
        params = shard_params(params, cfg, mesh)   # replicated (tp=1)
        calib = jax.device_put(
            jnp.asarray(calib), NamedSharding(mesh, P("dp", None)))
    t0 = time.time()
    with trace(args.trace):
        newp, art = quantize_model(params, cfg, jnp.asarray(calib), qcfg,
                                   jax.random.key(args.seed),
                                   chunk=args.chunk, progress=True,
                                   resume_dir=args.resume_dir,
                                   host_offload=args.host_offload,
                                   quant_head=args.quant_head)
    print(f"Total quant time: {time.time() - t0:.2f}s")
    print(f"Total proxy error: {art.total_error:.4f}")

    if args.save:
        from quip_tpu.pack.model import pack_quantized_model, save_checkpoint
        to_save = newp
        if args.packed and args.wbits < 16:
            to_save = pack_quantized_model(newp, cfg, art, args.wbits,
                                           on_host=args.host_offload)
        save_checkpoint(args.save, to_save, {
            "model": args.model, "wbits": args.wbits, "quant": args.quant,
            "packed": bool(args.packed), "seqlen": seqlen,
        })
        print(f"saved checkpoint to {args.save}")

    if args.eval and not args.proxy_only:
        from quip_tpu.eval.ppl import perplexity
        ppl = perplexity(newp, cfg, test_stream, seqlen)
        print(json.dumps({"dataset": args.dataset, "ppl": ppl}))


if __name__ == "__main__":
    main()
