"""Micro-batched pipeline-parallel prefill (GPipe schedule) over a 'pp' mesh.

Round-1 status was "pp = layer placement, not pipelining": sharding the
stacked-layer axis under one `lax.scan` serializes stages per activation
hop. This module is the real thing: an explicit `shard_map` program where
each device owns a contiguous slice of blocks (weight-stationary), M
micro-batches stream through the stages, and boundary activations move by
`lax.ppermute` — the classic GPipe schedule with M + pp - 1 ticks and
bubble fraction (pp-1)/(M+pp-1).

Scope: full-sequence forward (prefill / calibration / eval — the
throughput-bound phase where pipelining pays). Decode stays on the tp path
(a 1-token activation hop per layer-group would be latency-bound; the
comm report in parallel/comm.py quantifies exactly that).

Replaces (TPU-native) the reference's blocking multi-GPU layer
distribution, opt.py:384-428 / llama.py:505.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quip_tpu.models import model as M
from quip_tpu.models.config import ModelConfig
from quip_tpu.pack.format import PackedLinear


def _block_specs(blocks) -> Any:
    """P('pp') on the stacked-layer axis of every block leaf."""
    def walk(t):
        if isinstance(t, PackedLinear):
            ch, aux = t.tree_flatten()
            return PackedLinear.tree_unflatten(
                aux, jax.tree.map(lambda _: P("pp"), ch))
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        if t is None:
            return None
        return P("pp")
    return walk(blocks)


def pipelined_hidden(params: Dict[str, Any], x: jax.Array,
                     cfg: ModelConfig, mesh: Mesh,
                     microbatches: int) -> jax.Array:
    """Run the block stack over `x` (B, S, D) with GPipe pipelining.

    Requires B % microbatches == 0 and cfg.n_layers % pp == 0. Returns the
    final hidden states (B, S, D) (embed/unembed run replicated outside —
    they are <2% of 7B FLOPs). Numerically identical to the lax.scan
    forward (tests/test_pipeline_pp.py).
    """
    try:
        from jax import shard_map as _sm   # jax >= 0.8 (check_vma kwarg)
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:                    # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sme
        shard_map = functools.partial(_sme, check_rep=False)

    pp = mesh.shape["pp"]
    B, S, D = x.shape
    Mn = microbatches
    assert B % Mn == 0, (B, Mn)
    assert cfg.n_layers % pp == 0, (cfg.n_layers, pp)
    Bm = B // Mn
    x_mb = x.reshape(Mn, Bm, S, D)

    positions = jnp.broadcast_to(jnp.arange(S), (Bm, S))
    mask = M.causal_mask(Bm, S)
    cs = M.rope_tables(cfg, positions) if cfg.positions == "rope" else None

    def inner(blocks_local, x_mb):
        stage = lax.axis_index("pp")

        def local_stack(h):
            def body(h, bp):
                y, _, _ = M.block_apply(bp, h, cfg, positions, mask,
                                        rope_cs=cs)
                return y, None
            h, _ = lax.scan(body, h, blocks_local)
            return h

        perm = [(i, i + 1) for i in range(pp - 1)]

        def tick(carry, t):
            cur, outbuf = carry
            # stage 0 injects microbatch t (clamped; post-drain ticks feed
            # garbage that never reaches outbuf)
            inj = x_mb[jnp.clip(t, 0, Mn - 1)]
            cur = jnp.where(stage == 0, inj, cur)
            y = local_stack(cur)
            done = t - (pp - 1)                    # microbatch finishing now
            idx = jnp.clip(done, 0, Mn - 1)
            take = (stage == pp - 1) & (done >= 0)
            upd = lax.dynamic_update_index_in_dim(outbuf, y, idx, 0)
            outbuf = jnp.where(take, upd, outbuf)
            nxt = lax.ppermute(y, "pp", perm) if perm else y
            return (nxt, outbuf), None

        cur0 = jnp.zeros((Bm, S, D), x_mb.dtype)
        out0 = jnp.zeros((Mn, Bm, S, D), x_mb.dtype)
        (_, outbuf), _ = lax.scan(tick, (cur0, out0),
                                  jnp.arange(Mn + pp - 1))
        return outbuf[None]                        # local (1, Mn, Bm, S, D)

    fn = shard_map(inner, mesh=mesh,
                   in_specs=(_block_specs(params["blocks"]), P()),
                   out_specs=P("pp"))
    out = fn(params["blocks"], x_mb)               # (pp, Mn, Bm, S, D)
    return out[-1].reshape(B, S, D)


def pipelined_forward(params: Dict[str, Any], tokens: jax.Array,
                      cfg: ModelConfig, mesh: Mesh,
                      microbatches: int = 4) -> jax.Array:
    """Full pipelined forward -> logits (B, S, V). Embed/unembed replicated;
    the block stack runs the GPipe schedule on the 'pp' mesh axis."""
    B, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    x = M.embed(params, tokens, cfg, positions)
    x = pipelined_hidden(params, x, cfg, mesh, microbatches)
    return M.unembed(params, x, cfg)


def pipeline_comm_bytes(cfg: ModelConfig, batch: int, seq: int,
                        microbatches: int, pp: int,
                        dtype_bytes: int = 2) -> Dict[str, float]:
    """Analytic per-prefill boundary traffic: each of M + pp - 1 ticks
    moves one (B/M, S, D) activation across each of pp-1 stage links."""
    Bm = batch // microbatches
    hop = Bm * seq * cfg.d_model * dtype_bytes
    ticks = microbatches + pp - 1
    return {
        "hop_bytes": float(hop),
        "ticks": ticks,
        "bubble_fraction": (pp - 1) / ticks,
        "total_wire_bytes": float(hop * ticks * max(pp - 1, 0)),
    }
