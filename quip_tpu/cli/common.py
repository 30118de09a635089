"""Shared CLI plumbing: one typed config for all entry points.

Replaces the reference's per-script argparse forests (opt.py:489-589,
llama.py:479-505, zeroShot/utils.py:53-99) with a single flag surface
shared by quantize / eval / zeroshot / serve / bench.
"""
from __future__ import annotations

import argparse
from dataclasses import replace

import jax

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.quantize.config import PreprocConfig, QuantConfig


def add_model_args(p: argparse.ArgumentParser):
    p.add_argument("model", type=str,
                   help="model name/preset (e.g. facebook/opt-125m, "
                        "llama-2-7b, opt-tiny)")
    p.add_argument("--weights", type=str, default=None,
                   help="local HF checkpoint dir; 'random' for random init")
    p.add_argument("--dtype", type=str, default=None,
                   help="model dtype; default bfloat16 on TPU (a >=1.3B "
                        "float32 tree OOMs a 16 GB chip during "
                        "quantize+eval), float32 elsewhere")
    p.add_argument("--seqlen", type=int, default=None,
                   help="override model seqlen (reference README.md:14-15)")
    p.add_argument("--no_compile_cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(~/.cache/quip_tpu/xla; re-runs skip the 20-40s "
                        "per-shape compiles)")


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("dataset", type=str, nargs="?", default="c4",
                   choices=["wikitext2", "ptb", "ptb-new", "c4", "c4-new",
                            "synthetic"],
                   help="calibration dataset (datautils.py:180-190)")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)


def add_quant_args(p: argparse.ArgumentParser):
    """Mirror of the reference quantization flags (opt.py:489-589)."""
    p.add_argument("--wbits", type=int, default=16,
                   choices=[2, 3, 4, 8, 16])
    p.add_argument("--quant", type=str, default="nearest",
                   choices=["allbal", "ldlq", "ldlqRG", "ldlbal_admm",
                            "nearest", "gptq", "trueobs"])
    p.add_argument("--npasses", type=int, default=0)
    p.add_argument("--unbiased", action="store_true")
    p.add_argument("--qfn", type=str, default="a", choices=["a", "b"])
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--pre_gptqH", action="store_true")
    p.add_argument("--pre_rescale", action="store_true")
    p.add_argument("--pre_proj", action="store_true")
    p.add_argument("--pre_proj_extra", type=int, default=1,
                   choices=[0, 1, 2],
                   help="butterfly mode: 0=block 1=noblock 2=nopermute "
                        "(method.py:125-135); overridden by --proj_mode")
    p.add_argument("--proj_mode", type=str, default=None,
                   choices=["block", "noblock", "nopermute", "rht", "rht_sf", "rht_uf"],
                   help="rotation kind; 'rht' (default for "
                        "--incoh_processing) is the permutation-free "
                        "TPU-fast transform")
    p.add_argument("--incoh_processing", action="store_true",
                   help="meta-flag: pre_gptqH+pre_rescale+pre_proj+qfn=b "
                        "(opt.py:592-597)")
    p.add_argument("--lazy_batch", action="store_true",
                   help="(always on in this framework: solvers are blocked; "
                        "kept for CLI parity)")
    p.add_argument("--quant_head", action="store_true",
                   help="also quantize the (untied) lm_head — the head "
                        "matvec dominates the fixed per-decode-step cost; "
                        "no reference counterpart (+6%% decode at 7B)")


def quant_config_from_args(args) -> QuantConfig:
    if args.incoh_processing:
        kw = {}
        if args.proj_mode:
            kw["proj_mode"] = args.proj_mode
        return QuantConfig.incoherence(
            wbits=args.wbits, method=args.quant, npasses=args.npasses,
            unbiased=args.unbiased, **kw)
    mode = args.proj_mode or \
        {0: "block", 1: "noblock", 2: "nopermute"}[args.pre_proj_extra]
    return QuantConfig(
        wbits=args.wbits, method=args.quant, npasses=args.npasses,
        unbiased=args.unbiased, qfn=args.qfn, groupsize=args.groupsize,
        preproc=PreprocConfig(
            rescale=args.pre_rescale, proj=args.pre_proj,
            proj_mode=mode, gptqH=args.pre_gptqH,
            percdamp=args.percdamp),
        seed=args.seed)


def load_model(args):
    """Resolve (params, cfg) from the CLI model/weights flags.

    With --host_offload the tree is built entirely in host RAM (numpy
    leaves; HF checkpoints stream tensor-by-tensor off disk) — the device
    only ever sees one block at a time inside the quantize driver.
    """
    if not getattr(args, "no_compile_cache", False):
        from quip_tpu.utils import enable_compile_cache
        enable_compile_cache()
    on_host = bool(getattr(args, "host_offload", False))
    cfg = get_config(args.model)
    if args.seqlen:
        cfg = replace(cfg, max_seq=args.seqlen)
    if args.dtype is None:
        args.dtype = ("bfloat16" if jax.default_backend() == "tpu"
                      else "float32")
    cfg = replace(cfg, dtype=args.dtype)
    if args.weights and args.weights != "random":
        from quip_tpu.models.hf_import import load_hf_params
        params, _ = load_hf_params(args.weights, cfg, dtype=args.dtype,
                                   on_host=on_host)
    else:
        seed = args.seed if hasattr(args, "seed") else 0
        if on_host:
            # streamed per-layer host init: the whole-tree jax init's
            # f32 temporaries exceed host RAM at 30B+ (model.py
            # init_params_host docstring)
            params = M.init_params_host(cfg, seed)
        else:
            params = M.init_params(jax.random.key(seed), cfg)
    return params, cfg


def get_data(args, cfg):
    from quip_tpu.data.calib import get_loaders
    seqlen = args.seqlen or min(cfg.max_seq, 2048)
    return get_loaders(args.dataset, nsamples=args.nsamples, seed=args.seed,
                       seqlen=seqlen, model=args.model,
                       vocab_size=cfg.vocab_size), seqlen
