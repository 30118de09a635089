"""Windowed perplexity evaluation.

Capability parity with opt_eval / llama_eval
(/root/reference/opt.py:193-299, llama.py:174-253): split the test stream
into seqlen-token windows, forward, shifted cross-entropy,
ppl = exp(Σ nll / (nwindows · seqlen)).

TPU-first: one jitted window-loss program reused across windows (the
reference re-streams every block through the GPU per window; here the whole
model runs under one jit and XLA keeps weights resident).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from quip_tpu.models import model as M
from quip_tpu.models.config import ModelConfig


def window_nll(params: Dict[str, Any], tokens: jax.Array,
               cfg: ModelConfig) -> jax.Array:
    """Total shifted-CE nll over one (B, S) window batch — sum over
    (S-1) predicted positions per row (opt.py:287-295)."""
    logits = M.forward(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll, axis=-1)        # (B,)


def perplexity(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_stream: np.ndarray,            # 1-D token ids
    seqlen: int,
    batch: int = 1,
) -> float:
    """Reference-semantics perplexity: non-overlapping seqlen windows,
    loss normalized by nsamples * seqlen (opt.py:287-297).

    Note the reference divides by seqlen although only seqlen-1 tokens are
    predicted per window — we match that normalization exactly.
    """
    token_stream = np.asarray(token_stream).reshape(-1)
    nwin = len(token_stream) // seqlen
    assert nwin > 0, "test stream shorter than one window"
    windows = token_stream[: nwin * seqlen].reshape(nwin, seqlen)

    # params MUST be a jit argument: closing over them bakes the weights
    # into the HLO as constants (a 125M-model program is ~0.5 GB)
    loss_fn = jax.jit(lambda p, tk: window_nll(p, tk, cfg))

    total = 0.0
    i = 0
    while i < nwin:
        b = min(batch, nwin - i)
        tk = jnp.asarray(windows[i:i + b].astype(np.int32))
        if b < batch:  # pad to keep one compiled shape
            tk = jnp.pad(tk, ((0, batch - b), (0, 0)))
        nlls = np.asarray(loss_fn(params, tk))
        total += float(nlls[:b].sum())
        i += b
    return float(np.exp(total / (nwin * seqlen)))
