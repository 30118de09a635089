"""Communication-volume report for parallel configs (VERDICT r1 item 4).

    python -m quip_tpu.cli.commreport --tp 4 [--dp 2] [--model llama-2-7b]

Compiles the tensor-parallel packed decode step on an N-virtual-device CPU
mesh (AOT — abstract inputs, no weights materialized), reads the GSPMD
collectives back out of the optimized HLO (parallel/comm.py), and prints
per-step comm bytes + a roofline scaling estimate. Layer scaling is
derived honestly: the step is compiled at 2 and 4 layers and the per-layer
collective volume is the slope. The pipeline (pp) section is the analytic
GPipe model (parallel/pipeline.pipeline_comm_bytes) for prefill.

The report quantifies what the virtual mesh can quantify — comm VOLUME
and op counts per step. Latency-bound effects (collective setup time on
real ICI) are called out as not modeled.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def _worker(argv):
    # env set by the parent: CPU platform + virtual devices
    import jax
    jax.config.update("jax_platforms", "cpu")

    import argparse

    ap = argparse.ArgumentParser("quip_tpu.commreport")
    ap.add_argument("--model", default="llama-2-7b")
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--pp", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bits", type=int, default=2)
    ap.add_argument("--microbatches", type=int, default=8)
    ap.add_argument("--prefill_seq", type=int, default=2048)
    ap.add_argument("--hbm_gbps", type=float, default=720.0)
    ap.add_argument("--ici_gbps", type=float, default=90.0)
    a = ap.parse_args(argv)

    from dataclasses import replace

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.parallel import comm
    from quip_tpu.parallel.mesh import (cache_specs, make_mesh,
                                        param_specs)
    from quip_tpu.parallel.pipeline import pipeline_comm_bytes

    base = get_config(a.model)
    mesh = make_mesh(dp=a.dp, tp=a.tp)
    B = a.batch * a.dp

    def step_report(n_layers):
        """Compile an UNROLLED decode step (python loop over layers, not
        lax.scan): collectives inside a scan body appear once in the HLO
        regardless of trip count, which would zero the per-layer slope.
        Unrolling makes every layer's collectives countable."""
        cfg = replace(base, n_layers=n_layers, dtype="bfloat16")
        params = jax.eval_shape(
            lambda: _packed_llama(cfg, bits=a.bits, seed=0,
                                  head_bits=a.bits))
        pspecs = param_specs(params, cfg)
        caches = jax.eval_shape(
            lambda: M.init_caches(B, 256, cfg, dtype=jnp.bfloat16))
        cspecs = jax.tree.map(lambda _: cache_specs(cfg), caches)
        cspecs = cspecs._replace(length=P())
        tok = jax.ShapeDtypeStruct((B, 1), jnp.int32)

        def fn(params, tok, caches):
            Bt = tok.shape[0]
            length = caches.length[0]
            positions = jnp.broadcast_to(length, (Bt, 1)).astype(jnp.int32)
            Lc = caches.k.shape[2]
            mask = (jnp.arange(Lc)[None, None, :]
                    <= positions[:, :, None])
            x = M.embed(params, tok, cfg, positions)
            cs = (M.rope_tables(cfg, positions)
                  if cfg.positions == "rope" else None)
            for i in range(n_layers):
                bp = jax.tree.map(lambda p, i=i: p[i], params["blocks"])
                cache_i = jax.tree.map(lambda c, i=i: c[i], caches)
                x, _, _ = M.block_apply(bp, x, cfg, positions, mask,
                                        cache_i, rope_cs=cs)
            return M.unembed(params, x, cfg)[:, -1, :]

        jitted = jax.jit(
            fn,
            in_shardings=(
                jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda s: isinstance(s, P)),
                NamedSharding(mesh, P("dp", None)),
                jax.tree.map(lambda s: NamedSharding(mesh, s), cspecs,
                             is_leaf=lambda s: isinstance(s, P)),
            ))
        return comm.comm_report(jitted, (params, tok, caches), mesh=mesh)

    r2 = step_report(2)
    r4 = step_report(4)
    per_layer = {
        "wire_bytes": (r4["total_wire_bytes"] - r2["total_wire_bytes"]) / 2,
        "collectives": (r4["n_collectives"] - r2["n_collectives"]) / 2,
    }
    L = base.n_layers
    total_wire = (r2["total_wire_bytes"]
                  + per_layer["wire_bytes"] * (L - 2))
    n_coll = r2["n_collectives"] + per_layer["collectives"] * (L - 2)

    # per-chip HBM bytes per decode step: packed weights / tp + head
    D, F, V = base.d_model, base.d_ff, base.vocab_size
    weight_bits = (D * (base.n_heads + 2 * base.kv_heads) * base.hd
                   + D * base.n_heads * base.hd + 2 * D * F + D * F) \
        * a.bits * L
    head_bits_n = D * V * a.bits
    hbm_bytes = (weight_bits + head_bits_n) / 8 / a.tp

    est = comm.scaling_estimate(
        {"total_wire_bytes": total_wire},
        compute_bytes_per_chip=int(hbm_bytes),
        hbm_gbps=a.hbm_gbps, ici_gbps=a.ici_gbps)

    out = {
        "config": {"model": a.model, "dp": a.dp, "tp": a.tp,
                   "bits": a.bits, "batch": B},
        "tp_decode": {
            "collectives_per_step": n_coll,
            "wire_bytes_per_step": total_wire,
            "per_layer": per_layer,
            "per_kind_2layer": r2["per_kind"],
            "largest": sorted(r2["collectives"],
                              key=lambda c: -c["bytes"])[:4],
            "scaling_estimate": est,
        },
        "pp_prefill_gpipe": pipeline_comm_bytes(
            base, batch=max(a.batch, a.microbatches), seq=a.prefill_seq,
            microbatches=a.microbatches, pp=a.pp),
        "not_modeled": "collective latency/setup on real ICI; overlap; "
                       "DCN hops (see make_hybrid_mesh for topology)",
    }
    print(json.dumps(out, indent=2))


def main(argv=None):
    if os.environ.get("QUIP_COMMREPORT_WORKER") == "1":
        _worker(argv if argv is not None else sys.argv[1:])
        return
    # re-exec with a CPU virtual-device environment (the ambient process
    # may be pinned to the TPU relay platform)
    argv = argv if argv is not None else sys.argv[1:]
    n = 8
    for i, v in enumerate(argv):
        if v == "--devices":
            n = int(argv[i + 1])
            argv = argv[:i] + argv[i + 2:]
            break
    env = dict(os.environ)
    env["QUIP_COMMREPORT_WORKER"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # compile the REAL kernel path (interpret-mode pallas + its SPMD
    # partitioning rules), not the jnp reference fallback — the report
    # must reflect the TPU program's collectives
    env["QUIP_KERNEL_INTERPRET"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}"
                        ).strip()
    r = subprocess.run([sys.executable, "-m", "quip_tpu.cli.commreport"]
                       + argv, env=env)
    raise SystemExit(r.returncode)


if __name__ == "__main__":
    main()
