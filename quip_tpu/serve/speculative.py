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
                     *, page: int = 64, d_prefix: Optional[PG.Prefix] = None,
                     t_prefix: Optional[PG.Prefix] = None, prefix_on=None
                     ) -> Tuple[jax.Array, jax.Array, PG.Hot, PG.Hot]:
    """One speculative iteration (jittable; K static).

    tokens (B, 1): the last emitted token (not yet in either cache).
    Both caches must have >= K rows of hot-ring room (callers flush
    first). Returns (emitted (B, K) — positions >= n_emit are padding,
    n_emit (B,) in [1, K], draft Hot, target Hot); both Hots advance
    each slot's hot_len by that slot's n_emit.

    d_prefix/t_prefix + prefix_on (B,): shared-prefix (system prompt)
    mode — both models computed the SAME prefix token sequence once
    (models/paged.build_prefix with each model's own params), so opted-in
    slots share one pre_len offset; rollback semantics are unchanged.
    """
    B = tokens.shape[0]

    # 1) draft proposes K tokens greedily (writes its own K/V as it goes)
    def draft_body(carry, _):
        tok, hot = carry
        logits, hot = PG.paged_decode_any(
            draft_params, tok, PG.advance(dcaches, hot), cfg_d, page=page,
            prefix=d_prefix, prefix_on=prefix_on)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
        return (nxt, hot), nxt[:, 0]

    d_hot0 = PG.Hot(dcaches.hot_k, dcaches.hot_v, dcaches.hot_len,
                    dcaches.hot_ks, dcaches.hot_vs)
    (_, d_hot), drafts = lax.scan(draft_body, (tokens, d_hot0), None,
                                  length=K)
    drafts = drafts.T                              # (B, K): d_1..d_K

    # 2) target scores the window [t0, d_1..d_{K-1}] in one append
    window = jnp.concatenate([tokens, drafts[:, : K - 1]], axis=1)  # (B, K)
    t_logits, t_hot = PG.paged_append_any(target_params, window, tcaches,
                                           cfg_t, page=page,
                                           prefix=t_prefix,
                                           prefix_on=prefix_on)
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
        # unrolled step forms want pre-split per-layer trees (paged.py)
        self._dsplit = PG.as_split(draft_params)
        self._tsplit = PG.as_split(target_params)
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
                self._dsplit, self._tsplit, tok, self.dc,
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


# -- stochastic speculative decoding (rejection sampling) --------------------
#
# Full Leviathan et al. 2211.17192 algorithm: the draft SAMPLES K tokens
# from its own (temperature/top-k/top-p filtered) distribution q; the
# target scores the window once; draft token d_{j+1} is accepted with
# probability min(1, p_j(d_{j+1})/q_j(d_{j+1})) and the first rejection is
# replaced by a sample from the residual norm(max(p - q, 0)). The emitted
# stream is distributed EXACTLY as target-only sampling with the same
# filters (property-tested in tests/test_speculative.py). Greedy
# (temperature <= 0) slots degrade to exact one-hot distributions, so a
# batch can mix greedy and sampling requests in one compiled step.


def spec_dist(logits, temps, top_ks=None, top_ps=None):
    """Per-slot sampling distribution as explicit probabilities (B, V).

    temps (B,): <= 0 means exact one-hot greedy for that slot.
    top_ks (B,) int32: DYNAMIC per-slot top-k (0 = full vocab) — unlike
    engine._filtered_logits's static k, the cutoff is a per-slot gather
    from the sorted row so mixed-k batches compile once.
    top_ps (B,): nucleus mass (1.0 = no filter).
    Filtering order matches engine._sample: scale -> top-k -> top-p.
    """
    B, V = logits.shape
    temps = jnp.asarray(temps, jnp.float32).reshape(-1)
    greedy = jax.nn.one_hot(jnp.argmax(logits, -1), V, dtype=jnp.float32)
    t = jnp.maximum(temps, 1e-6)[:, None]
    x = logits.astype(jnp.float32) / t
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    if top_ks is not None:
        top_ks = jnp.asarray(top_ks, jnp.int32).reshape(-1)
        sx = jnp.sort(x, axis=-1)[:, ::-1]
        k = jnp.clip(jnp.where(top_ks <= 0, V, top_ks), 1, V)
        kth = jnp.take_along_axis(sx, (k - 1)[:, None], axis=1)[:, 0]
        x = jnp.where(x >= kth[:, None], x, neg)
    if top_ps is not None:
        top_ps = jnp.asarray(top_ps, jnp.float32).reshape(-1)
        probs = jax.nn.softmax(x, axis=-1)
        sp = jnp.sort(probs, axis=-1)[:, ::-1]
        cs = jnp.cumsum(sp, axis=-1)
        keep = (cs - sp) < top_ps[:, None]
        thr = jnp.min(jnp.where(keep, sp, jnp.inf), axis=-1)
        x = jnp.where(probs >= thr[:, None], x, neg)
    dist = jax.nn.softmax(x, axis=-1)
    return jnp.where(temps[:, None] <= 0.0, greedy, dist)


def spec_accept(key, drafts, q, p):
    """Rejection-sample a drafted window against the target.

    drafts (B, K): d_1..d_K, with d_{j+1} sampled from q_j.
    q, p (B, K, V): draft / target distributions; p_j is the target's
    distribution after prefix (..., t0, d_1..d_j) — positions line up with
    the multi-token verify append.

    Accepts the longest prefix with u_j < p_j(d_{j+1})/q_j(d_{j+1})
    (j = 0..K-2); the correction token is drawn from norm(max(p_n - q_n, 0))
    after a rejection at position n, or from p_{K-1} when every comparable
    draft was accepted. Returns (emitted (B, K), n_emit (B,) in [1, K]);
    emitted rows past n_emit are zero padding. The marginal law of the
    emitted stream equals target-only sampling (Leviathan et al., Thm 3.5).
    """
    B, K, V = q.shape
    uk, rk = jax.random.split(key)
    if K > 1:
        d = drafts[:, : K - 1]
        qd = jnp.take_along_axis(q[:, : K - 1], d[..., None], 2)[..., 0]
        pd = jnp.take_along_axis(p[:, : K - 1], d[..., None], 2)[..., 0]
        r = jnp.where(qd > 0, pd / jnp.maximum(qd, 1e-30), 0.0)
        u = jax.random.uniform(uk, (B, K - 1))
        acc = (u < r).astype(jnp.int32)
        n = jnp.sum(jnp.cumprod(acc, axis=1), axis=1).astype(jnp.int32)
    else:
        n = jnp.zeros((B,), jnp.int32)
    p_n = jnp.take_along_axis(p, n[:, None, None], 1)[:, 0]      # (B, V)
    q_n = jnp.take_along_axis(q, n[:, None, None], 1)[:, 0]
    res = jnp.maximum(p_n - q_n, 0.0)
    res = jnp.where((n == K - 1)[:, None], p_n, res)
    tot = jnp.sum(res, axis=-1, keepdims=True)
    # numerically-empty residual (p ~= q): fall back to p_n — correct in
    # the limit, since rejection there has probability ~0
    res = jnp.where(tot > 0, res / jnp.maximum(tot, 1e-30), p_n)
    corr = jax.random.categorical(
        rk, jnp.log(jnp.maximum(res, 1e-38)), axis=-1).astype(jnp.int32)
    idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    emitted = jnp.where(idx < n[:, None], drafts,
                        jnp.where(idx == n[:, None], corr[:, None], 0))
    return emitted, n + 1


def spec_sample_step(draft_params, target_params, tokens: jax.Array,
                     dcaches: PG.PagedKV, tcaches: PG.PagedKV,
                     cfg_d: ModelConfig, cfg_t: ModelConfig, K: int,
                     key, temps, top_ks=None, top_ps=None, *,
                     page: int = 64, d_prefix: Optional[PG.Prefix] = None,
                     t_prefix: Optional[PG.Prefix] = None, prefix_on=None
                     ) -> Tuple[jax.Array, jax.Array, PG.Hot, PG.Hot]:
    """One stochastic speculative iteration (jittable; K static).

    Same cache contract as spec_decode_step; additionally takes a PRNG key
    and per-slot sampling params (temps/top_ks/top_ps, each (B,) or None).
    Greedy slots (temps <= 0) behave exactly like spec_decode_step.
    """
    key, dk, ak = jax.random.split(key, 3)

    def draft_body(carry, sk):
        tok, hot = carry
        logits, hot = PG.paged_decode_any(
            draft_params, tok, PG.advance(dcaches, hot), cfg_d, page=page,
            prefix=d_prefix, prefix_on=prefix_on)
        qd = spec_dist(logits, temps, top_ks, top_ps)
        nxt = jax.random.categorical(
            sk, jnp.log(jnp.maximum(qd, 1e-38)), axis=-1)
        nxt = nxt.astype(jnp.int32)[:, None]
        return (nxt, hot), (nxt[:, 0], qd)

    d_hot0 = PG.Hot(dcaches.hot_k, dcaches.hot_v, dcaches.hot_len,
                    dcaches.hot_ks, dcaches.hot_vs)
    (_, d_hot), (drafts, qs) = lax.scan(draft_body, (tokens, d_hot0),
                                        jax.random.split(dk, K))
    drafts = drafts.T                              # (B, K)
    q = jnp.transpose(qs, (1, 0, 2))               # (B, K, V)

    window = jnp.concatenate([tokens, drafts[:, : K - 1]], axis=1)
    t_logits, t_hot = PG.paged_append_any(target_params, window, tcaches,
                                           cfg_t, page=page,
                                           prefix=t_prefix,
                                           prefix_on=prefix_on)
    p = jax.vmap(lambda lg: spec_dist(lg, temps, top_ks, top_ps),
                 in_axes=1, out_axes=1)(t_logits)  # (B, K, V)
    emitted, n_emit = spec_accept(ak, drafts, q, p)
    d_hot = d_hot._replace(length=dcaches.hot_len + n_emit)
    t_hot = t_hot._replace(length=tcaches.hot_len + n_emit)
    return emitted, n_emit, d_hot, t_hot


def make_self_draft(params, cfg: ModelConfig, n_layers: int):
    """Layer-skip self-draft: the target's own first ``n_layers`` blocks.

    Returns (draft_params, draft_cfg) sharing every array with the target
    (embeddings, head, final norm; block stack sliced along the scan axis)
    — zero extra weight memory. docs/PERF.md's sweep found shallow
    same-width drafts the right shape on this hardware: a 4-of-32-layer 7B
    self-draft verifies at ~10.5 ms/step (break-even 1.7 accepted/step).
    Acceptance quality is the early-exit approximation's; exactness of the
    emitted stream is guaranteed by verification regardless.
    """
    import dataclasses as _dc
    if not 0 < n_layers <= cfg.n_layers:
        raise ValueError(f"n_layers must be in [1, {cfg.n_layers}], "
                         f"got {n_layers}")
    draft_params = dict(params)
    draft_params["blocks"] = jax.tree_util.tree_map(
        lambda x: x[:n_layers], params["blocks"])
    return draft_params, _dc.replace(cfg, n_layers=n_layers)


def spec_decode_chunk(draft_params, target_params, tokens: jax.Array,
                      dcaches: PG.PagedKV, tcaches: PG.PagedKV,
                      cfg_d: ModelConfig, cfg_t: ModelConfig, K: int,
                      S: int, *, page: int = 64, key=None, temps=None,
                      top_ks=None, top_ps=None,
                      d_prefix: Optional[PG.Prefix] = None,
                      t_prefix: Optional[PG.Prefix] = None, prefix_on=None,
                      active: Optional[jax.Array] = None):
    """S speculative iterations in ONE dispatch (jittable; K, S static).

    Emits up to S*K tokens per slot per dispatch while paying the host
    read once — the speculative analog of the engine's chunked decode,
    which is the dominant serving lever through a relayed backend
    (docs/PERF.md: chunking amortizes a ~25 ms host read per step).
    Callers must guarantee S*K rows of hot-ring room (flush first).

    temps=None runs the greedy-exact step; otherwise the stochastic
    rejection-sampling step with per-slot temps/top_ks/top_ps (greedy
    slots still exact via one-hot distributions).

    active (B,) 0/1 (or None = all active): slots with active == 0 get
    n_emit forced to 0, so their device hot-ring cursors do NOT advance
    and their frontier row is passed through unchanged. The overlapped
    spec pump (engine._pump_spec) keeps retired slots' device cursors
    frozen this way — device cursors are authoritative there, and
    unbounded garbage advance on free slots would inflate max(base) (the
    page-loop trip count) across flushes.

    Returns (emitted (B, S, K), n_emit (B, S), draft Hot, target Hot,
    last (B, 1) device-resident next-token frontier, key_out); per
    iteration s, row positions >= n_emit[:, s] are padding. ``last`` and
    ``key_out`` let a pipelined caller dispatch chunk N+1 entirely
    on-device (no host read of chunk N): key_out chains the PRNG (split
    once per chunk when sampling; passed through when greedy).
    """
    B = tokens.shape[0]
    d_hot0 = PG.Hot(dcaches.hot_k, dcaches.hot_v, dcaches.hot_len,
                    dcaches.hot_ks, dcaches.hot_vs)
    t_hot0 = PG.Hot(tcaches.hot_k, tcaches.hot_v, tcaches.hot_len,
                    tcaches.hot_ks, tcaches.hot_vs)
    act = None if active is None else active.astype(jnp.int32)

    def body(carry, sk):
        tok, d_hot, t_hot = carry
        dc = PG.advance(dcaches, d_hot)
        tc = PG.advance(tcaches, t_hot)
        if temps is None:
            em, ne, d_hot, t_hot = spec_decode_step(
                draft_params, target_params, tok, dc, tc, cfg_d, cfg_t, K,
                page=page, d_prefix=d_prefix, t_prefix=t_prefix,
                prefix_on=prefix_on)
        else:
            em, ne, d_hot, t_hot = spec_sample_step(
                draft_params, target_params, tok, dc, tc, cfg_d, cfg_t, K,
                sk, temps, top_ks, top_ps, page=page, d_prefix=d_prefix,
                t_prefix=t_prefix, prefix_on=prefix_on)
        if act is not None:
            ne = ne * act        # frozen cursors + frontier for free slots
            d_hot = d_hot._replace(length=dc.hot_len + ne)
            t_hot = t_hot._replace(length=tc.hot_len + ne)
        nxt = jnp.take_along_axis(em, jnp.maximum(ne - 1, 0)[:, None],
                                  axis=1)
        if act is not None:
            nxt = jnp.where(act[:, None] > 0, nxt, tok)
        return (nxt, d_hot, t_hot), (em, ne)

    if temps is not None:
        key, sub = jax.random.split(key)
        xs = jax.random.split(sub, S)
    else:
        xs = jnp.zeros((S,), jnp.int32)
    (last, d_hot, t_hot), (ems, nes) = lax.scan(
        body, (tokens, d_hot0, t_hot0), xs)
    return (jnp.transpose(ems, (1, 0, 2)), nes.T, d_hot, t_hot, last, key)
