"""Multi-PROCESS dryrun: N jax.distributed CPU processes, one hybrid mesh.

The single-process 8-virtual-device mesh (tests/conftest.py,
__graft_entry__.dryrun_multichip) validates GSPMD shardings but not the
multi-host machinery: process-spanning meshes, DCN-outermost axis order,
cross-process collectives, make_array_from_process_local_data. This script
launches real separate processes (jax.distributed.initialize over a local
coordinator) and runs the tp packed-decode and dp calibration legs on a
hybrid DCN x ICI mesh — the CPU stand-in for a v5e multi-host slice
(VERDICT r1 item 3).

Orchestrator (no args): spawns NPROCS workers, waits, propagates failure.
Worker (env QUIP_MP_ROLE=worker): joins the cluster and runs the legs.

Usage:  python scripts/dryrun_multiprocess.py [--nprocs 2] [--local 4]
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys


def _worker():
    proc_id = int(os.environ["QUIP_MP_PROC"])
    nprocs = int(os.environ["QUIP_MP_NPROCS"])
    coord = os.environ["QUIP_MP_COORD"]

    import jax
    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives (gloo is jaxlib's CPU default impl)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.parallel.mesh import (make_hybrid_mesh, shard_params)

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nprocs * n_local, (n_global, nprocs, n_local)

    # hybrid mesh: dp spans processes (the DCN stand-in) x leftover local
    # devices; tp stays within one process's devices
    tp = 2 if n_local % 2 == 0 else 1
    dp = n_global // tp
    mesh = make_hybrid_mesh(dp=dp, tp=tp)
    # DCN-outermost check: the first mesh axis must vary process index
    # slowest — every row of the dp axis maps to one process before the
    # next process appears
    procs_in_order = [d.process_index for d in mesh.devices.reshape(-1)]
    assert procs_in_order == sorted(procs_in_order), procs_in_order

    cfg = get_config("llama-tiny")
    # identical params in every process (same PRNG key -> same values)
    params = M.init_params(jax.random.key(0), cfg)
    params = shard_params(params, cfg, mesh)

    B, S = dp, 16
    # dp-sharded global batch from per-process local shards
    local_rows = B // nprocs
    local = np.full((local_rows, S), proc_id, np.int32) % cfg.vocab_size
    sharding = NamedSharding(mesh, P("dp", None))
    tokens = jax.make_array_from_process_local_data(sharding, local, (B, S))

    # ---- leg 1: dp calibration psum (Hessian accumulation) ----------
    @jax.jit
    def calib_H(params, tokens):
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        mask = M.causal_mask(B, S)
        x = M.embed(params, tokens, cfg, positions)
        layer0 = jax.tree.map(lambda p: p[0], params["blocks"])
        _, _, taps = M.block_apply(layer0, x, cfg, positions, mask,
                                   with_taps=True)
        a = taps["attn_in"].reshape(-1, cfg.d_model).astype(jnp.float32)
        return a.T @ a / B          # GSPMD: partial per shard + psum over dp

    H = calib_H(params, tokens)
    H.block_until_ready()
    Hl = np.asarray(jax.device_get(H.addressable_shards[0].data))
    assert np.isfinite(Hl).all()

    # ---- leg 2: tp decode step --------------------------------------
    caches = M.init_caches(B, 32, cfg, dtype=jnp.float32)
    tok = jnp.zeros((B, 1), jnp.int32)

    @jax.jit
    def decode(params, tok, caches):
        return M.decode_step(params, tok, caches, cfg)

    logits, caches = decode(params, tok, caches)
    logits.block_until_ready()
    lg = np.asarray(jax.device_get(logits.addressable_shards[0].data))
    assert np.isfinite(lg).all()

    # ---- leg 3: PRODUCTION ENGINE STEP across process boundaries ----
    # The exact form Engine dispatches in production (VERDICT r3 item 6):
    # unrolled pre-split per-layer trees, a widen_3bit 3-in-4 transcoded
    # packed model, paged two-level KV — decode + append + flush, with
    # the custom-partitioned Pallas-kernel path's SPMD rules driving the
    # cross-process collectives. Every process builds identical params
    # (same PRNG seed) and jax.device_put scatters the local shards.
    from quip_tpu.models import paged as PG
    from quip_tpu.pack.format import widen_3bit_tree
    from quip_tpu.parallel.mesh import shard_paged, shard_split
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _packed_llama

    p3 = widen_3bit_tree(_packed_llama(cfg, bits=3, seed=3, head_bits=3))
    split = shard_split(PG.as_split(p3), cfg, mesh)
    pkv = shard_paged(
        PG.init_paged(B, 32, cfg, dtype=jnp.float32, hot=8, page=8), mesh)
    tok_s = jax.device_put(tok, NamedSharding(mesh, P("dp", None)))

    @jax.jit
    def engine_step(misc, layers, tok, caches):
        return PG.paged_decode_step_unrolled(misc, layers, tok, caches,
                                             cfg, page=8)

    elogits, ehot = engine_step(split.misc, split.layers, tok_s, pkv)
    elogits.block_until_ready()
    el = np.asarray(jax.device_get(elogits.addressable_shards[0].data))
    assert np.isfinite(el).all()

    @jax.jit
    def engine_append(misc, layers, toks, caches):
        return PG.paged_append_step_unrolled(misc, layers, toks, caches,
                                             cfg, page=8)

    atoks = jax.device_put(jnp.zeros((B, 3), jnp.int32),
                           NamedSharding(mesh, P("dp", None)))
    alogits, ahot = engine_append(split.misc, split.layers, atoks,
                                  PG.advance(pkv, ehot))
    alogits.block_until_ready()
    flushed = jax.jit(PG.flush_hot)(PG.advance(pkv, ahot))
    flushed.k.block_until_ready()
    assert np.isfinite(np.asarray(
        jax.device_get(alogits.addressable_shards[0].data))).all()

    print(f"[proc {proc_id}] OK: {nprocs} procs x {n_local} local devices, "
          f"mesh {dict(mesh.shape)}; engine-step leg (unrolled + "
          f"widen_3bit + paged flush) crossed process collectives",
          flush=True)


def _orchestrate(nprocs: int, local: int) -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    procs = []
    for i in range(nprocs):
        env = dict(env_base)
        env.update({
            "QUIP_MP_ROLE": "worker",
            "QUIP_MP_PROC": str(i),
            "QUIP_MP_NPROCS": str(nprocs),
            "QUIP_MP_COORD": f"127.0.0.1:{port}",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": (env_base.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", "").strip()
                + f" --xla_force_host_platform_device_count={local}"
            ).strip(),
        })
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    return rc


def main() -> int:
    if os.environ.get("QUIP_MP_ROLE") == "worker":
        _worker()
        return 0
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local", type=int, default=4)
    a = ap.parse_args()
    rc = _orchestrate(a.nprocs, a.local)
    print("dryrun_multiprocess:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
