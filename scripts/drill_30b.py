"""One-chip scale drill: the biggest model that fits (VERDICT r4 item 5).

Runs the FULL streamed pipeline at a scale where host residency actually
matters: opt-30b (48 layers, d=7168, d_ff=28672 — the reference's own
headline large model, quantized by its CPU<->GPU streaming driver,
opt.py:94-181) random-init in HOST RAM -> host_offload sequential
quantize (2-bit LDLQ + incoherence, synthetic calib) -> pack -> packed
checkpoint on disk -> reload -> single-chip serve (b1 and b8, int8 KV),
recording wall times and tok/s at each stage.

Run ALONE on the chip (CLAUDE.md). Host RAM budget: bf16 tree ~60 GB +
quantized replacement blocks (freed progressively); the driver keeps
device residency at one block + activations.

--layers N truncates the model (pipeline-shakeout mode: same d_model /
d_ff shapes, fewer blocks); default full 48.
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("drill_30b")
_ap.add_argument("--smoke", action="store_true",
                 help="CPU: opt-125m shapes, 4 layers")
_ap.add_argument("--layers", type=int, default=0,
                 help="truncate to N blocks (0 = full)")
_ap.add_argument("--nsamples", type=int, default=8)
_ap.add_argument("--seqlen", type=int, default=2048)
_ap.add_argument("--save", default="/tmp/quip30b")
ARGS = _ap.parse_args()

if ARGS.smoke:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if ARGS.smoke:
    jax.config.update("jax_platforms", "cpu")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    from dataclasses import replace

    from quip_tpu.data.calib import get_loaders
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    name = "opt-125m" if ARGS.smoke else "opt-30b"
    cfg = get_config(name)
    if ARGS.smoke:
        cfg = replace(cfg, n_layers=4)
        seqlen, nsamples = 128, 2
    else:
        cfg = replace(cfg, dtype="bfloat16")
        seqlen, nsamples = ARGS.seqlen, ARGS.nsamples
    if ARGS.layers:
        cfg = replace(cfg, n_layers=ARGS.layers)
    print(f"model {name} n_layers={cfg.n_layers} d={cfg.d_model} "
          f"ff={cfg.d_ff} backend={jax.default_backend()}", flush=True)

    # --- host-resident random init (the 70B-path contract) ---------------
    t0 = time.time()
    params = M.init_params_host(cfg, seed=0)
    gb = sum(x.nbytes for x in jax.tree.leaves(params)) / 2**30
    print(f"[1] host init: {gb:.1f} GB in {time.time()-t0:.0f}s",
          flush=True)

    # --- calibration data ------------------------------------------------
    calib, _ = get_loaders("synthetic", nsamples=nsamples, seed=0,
                           seqlen=seqlen, model=name,
                           vocab_size=cfg.vocab_size)

    # --- host_offload sequential quantize --------------------------------
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    t0 = time.time()
    newp, art = quantize_model(params, cfg, jnp.asarray(calib), qcfg,
                               jax.random.key(1), chunk=nsamples,
                               host_offload=True, progress=True)
    tq = time.time() - t0
    nlin = len(art.errors)
    print(f"[2] quantize: {cfg.n_layers} blocks / {nlin} linears in "
          f"{tq:.0f}s ({tq/max(cfg.n_layers,1):.1f} s/block); "
          f"total proxy err {art.total_error:.4f}", flush=True)
    del params
    gc.collect()

    # --- pack + checkpoint roundtrip -------------------------------------
    t0 = time.time()
    packed = pack_quantized_model(newp, cfg, art, 2, on_host=True)
    del newp
    gc.collect()
    t_pack = time.time() - t0
    t0 = time.time()
    save_checkpoint(ARGS.save, packed, {"model": name, "wbits": 2,
                                        "packed": True})
    t_save = time.time() - t0
    del packed, art
    gc.collect()
    t0 = time.time()
    packed, meta = load_checkpoint(ARGS.save)
    t_load = time.time() - t0
    gb = sum(np.asarray(x).nbytes
             for x in jax.tree.leaves(packed)) / 2**30
    print(f"[3] pack {t_pack:.0f}s, save {t_save:.0f}s, reload "
          f"{t_load:.0f}s; packed {gb:.1f} GB ({meta})", flush=True)

    # --- serve ------------------------------------------------------------
    from bench import bench_decode
    for tag, kw in [("b1", dict(batch=1, max_seq=160)),
                    ("b8 int8", dict(batch=8, max_seq=192,
                                     kv_quant=True))]:
        try:
            t0 = time.time()
            tps = bench_decode(packed, cfg, steps=64 if not ARGS.smoke
                               else 8, **kw)
            print(f"[4] serve {tag}: {tps:.1f} tok/s "
                  f"({time.time()-t0:.0f}s incl. compile)", flush=True)
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"[4] serve {tag} FAILED (continuing)", flush=True)
    print("DRILL DONE", flush=True)


if __name__ == "__main__":
    main()
