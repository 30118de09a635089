"""Speculative decoding over paged KV caches (greedy-exact).

A small draft model proposes K tokens per dispatch; the target model
scores the whole window in ONE multi-token paged append
(models/paged.paged_append_step) and accepts the longest prefix matching
its own greedy choices, then emits one correction token. The emitted
stream is EXACTLY the target's greedy decoding (verified by the
tests' equivalence property) — the draft only changes how many target
dispatches it takes.

TPU-native design points:
  * Draft chain + target verify + acceptance run in one jitted step —
    one dispatch per up-to-K emitted tokens.
  * Rollback of rejected tokens is free: both models' caches are paged
    (two-level, models/paged.py), so "undo" is just not advancing
    ``hot_len`` — the rejected rows sit past the cursor and are
    overwritten by the next window.
  * Per-slot acceptance counts: each batch slot advances by its own
    n+1, which the paged cache's per-slot cursors support natively.

No reference counterpart (the reference has no serving path at all —
SURVEY.md §2.6); speculative decoding follows Leviathan et al. 2211.17192
(greedy case).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quip_tpu.models import paged as PG
from quip_tpu.models.config import ModelConfig


def spec_decode_step(draft_params, target_params, tokens: jax.Array,
                     dcaches: PG.PagedKV, tcaches: PG.PagedKV,
                     cfg_d: ModelConfig, cfg_t: ModelConfig, K: int,
                     *, page: int = 64
                     ) -> Tuple[jax.Array, jax.Array, PG.Hot, PG.Hot]:
    """One speculative iteration (jittable; K static).

    tokens (B, 1): the last emitted token (not yet in either cache).
    Both caches must have >= K rows of hot-ring room (callers flush
    first). Returns (emitted (B, K) — positions >= n_emit are padding,
    n_emit (B,) in [1, K], draft Hot, target Hot); both Hots advance
    each slot's hot_len by that slot's n_emit.
    """
    B = tokens.shape[0]

    # 1) draft proposes K tokens greedily (writes its own K/V as it goes)
    def draft_body(carry, _):
        tok, hot = carry
        logits, hot = PG.paged_decode_step(
            draft_params, tok, PG.advance(dcaches, hot), cfg_d, page=page)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        return (nxt, hot), nxt[:, 0]

    d_hot0 = PG.Hot(dcaches.hot_k, dcaches.hot_v, dcaches.hot_len,
                    dcaches.hot_ks, dcaches.hot_vs)
    (_, d_hot), drafts = lax.scan(draft_body, (tokens, d_hot0), None,
                                  length=K)
    drafts = drafts.T                              # (B, K): d_1..d_K

    # 2) target scores the window [t0, d_1..d_{K-1}] in one append
    window = jnp.concatenate([tokens, drafts[:, : K - 1]], axis=1)  # (B, K)
    t_logits, t_hot = PG.paged_append_step(target_params, window, tcaches,
                                           cfg_t, page=page)
    greedy = jnp.argmax(t_logits, -1).astype(jnp.int32)      # (B, K): g_0..
    # g_i = target's next token after prefix ... t0 d_1..d_i

    # 3) accept the longest prefix d_1..d_n with d_j == g_{j-1}
    if K > 1:
        eq = drafts[:, : K - 1] == greedy[:, : K - 1]        # (B, K-1)
        # .astype: jnp.sum promotes int32 -> int64 under x64
        n = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1),
                    axis=1).astype(jnp.int32)
    else:
        n = jnp.zeros((B,), jnp.int32)
    correction = jnp.take_along_axis(greedy, n[:, None], axis=1)[:, 0]
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    emitted = jnp.where(idx < n[:, None], drafts,
                        jnp.where(idx == n[:, None], correction[:, None], 0))
    n_emit = n + 1

    # 4) advance each slot's cursor by its own n+1 accepted rows; rows
    # beyond are dead (free rollback)
    d_hot = d_hot._replace(length=dcaches.hot_len + n_emit)
    t_hot = t_hot._replace(length=tcaches.hot_len + n_emit)
    return emitted, n_emit, d_hot, t_hot


class SpecDecoder:
    """Greedy speculative generation driver (prefill + step loop +
    flush bookkeeping) for a batch of equal-role slots."""

    def __init__(self, draft_params, target_params, cfg_d: ModelConfig,
                 cfg_t: ModelConfig, *, K: int = 4, max_seq: int = 512,
                 hot: int = 32, page: int = 64, batch: int = 1,
                 cache_dtype=jnp.bfloat16, kv_quant: bool = False):
        if K >= hot:
            raise ValueError(f"K={K} must be < hot={hot}")
        self.K, self.page, self.hot = K, page, hot
        self.cfg_d, self.cfg_t = cfg_d, cfg_t
        self.draft_params, self.target_params = draft_params, target_params
        self.max_seq = max_seq
        cap = max_seq + hot
        self.dc = PG.init_paged(batch, cap, cfg_d, dtype=cache_dtype,
                                quantized=kv_quant, hot=hot, page=page)
        self.tc = PG.init_paged(batch, cap, cfg_t, dtype=cache_dtype,
                                quantized=kv_quant, hot=hot, page=page)
        self._step = jax.jit(
            lambda dp, tp, tok, dc, tc: spec_decode_step(
                dp, tp, tok, dc, tc, cfg_d, cfg_t, K, page=page))
        self._flush = jax.jit(PG.flush_hot, donate_argnums=0)
        self._prefill_d = jax.jit(
            lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg_d),
            donate_argnums=3)
        self._prefill_t = jax.jit(
            lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg_t),
            donate_argnums=3)

    def generate(self, prompts, max_new_tokens: int = 64):
        """Greedy-generate for a batch of prompts (list of token lists).
        Returns (list of generated token lists, accepted-length stats)."""
        B = self.dc.base.shape[0]
        assert len(prompts) == B, (len(prompts), B)
        plens = np.asarray([len(p) for p in prompts], np.int32)
        S = int(max(plens))
        padded = np.zeros((B, S), np.int32)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p
        _, self.dc = self._prefill_d(self.draft_params, jnp.asarray(padded),
                                     jnp.asarray(plens), self.dc)
        logits_t, self.tc = self._prefill_t(self.target_params,
                                            jnp.asarray(padded),
                                            jnp.asarray(plens), self.tc)
        tok = jnp.argmax(logits_t, -1).astype(jnp.int32)[:, None]
        out = [[int(t)] for t in np.asarray(tok[:, 0])]
        accept_hist = []
        while min(len(o) for o in out) < max_new_tokens + 1:
            hl = int(np.max(np.asarray(self.tc.hot_len)))
            if hl + self.K > self.hot:
                self.dc = self._flush(self.dc)
                self.tc = self._flush(self.tc)
            emitted, n_emit, d_hot, t_hot = self._step(
                self.draft_params, self.target_params, tok, self.dc,
                self.tc)
            self.dc = PG.advance(self.dc, d_hot)
            self.tc = PG.advance(self.tc, t_hot)
            em = np.asarray(emitted)
            ne = np.asarray(n_emit)
            accept_hist.extend(int(x) for x in ne)
            for i in range(B):
                out[i].extend(int(t) for t in em[i, : ne[i]])
            tok = jnp.asarray(em[np.arange(B), ne - 1], jnp.int32)[:, None]
            if int(np.max(np.asarray(self.tc.base)
                          + np.asarray(self.tc.hot_len))) \
                    >= self.max_seq - self.K - 1:
                break
        return ([o[:max_new_tokens + 1] for o in out],
                float(np.mean(accept_hist)) if accept_hist else 0.0)
