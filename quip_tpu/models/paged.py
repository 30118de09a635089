"""Paged two-level KV cache: decode cost scales with USED context.

The standard decode path (models/model.py ``KVCache``) threads the whole
cache arena through every jitted step. On runtimes without working buffer
donation (this relay — docs/PERF.md "buffer donation is a no-op") that
costs a full read+write of the *allocated* capacity per token, so a serving
engine with a large ``max_seq`` pays for capacity it is not using yet.

This module splits the cache in two:

  * a **frozen** arena ``(n_layers, B, capacity, kv_heads, hd)`` that is an
    input of the decode step but NEVER an output — no jit-boundary copy.
    Attention over it runs as an online-softmax accumulation over fixed-size
    pages inside a ``lax.fori_loop`` whose trip count is the *traced* number
    of used pages (``ceil(max(base)/page)``), so HBM reads scale with used
    context, not capacity.
  * a small **hot** ring ``(n_layers, B, hot, kv_heads, hd)`` holding the
    most recent tokens; it is the only cache state the step returns, so the
    per-step copy is O(hot), independent of capacity.

Every ``hot`` steps the driver calls :func:`flush_hot`, which appends each
slot's hot run into the frozen arena at its own ``base`` (one stacked
``dynamic_update_slice`` per array — a full-arena copy amortized over
``hot`` tokens).

``base`` and ``hot_len`` are per-slot ``(B,)`` vectors so the
continuous-batching engine (serve/engine.py) can admit/retire requests per
slot. int8 KV quantization (model.quantize_kv) composes: codes + per-(slot,
position, head) scales live in both levels and the scales fold around the
attention dots exactly like the arena path (model.KVCache docstring).

No reference counterpart: the reference's only serving artifact is a
commented-out single-token benchmark loop (/root/reference/llama.py:418-471);
its CUDA path was single-token-only (/root/reference/quant.py:222-233).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from quip_tpu.models import model as M
from quip_tpu.models.config import ModelConfig
from quip_tpu.ops.qlinear import linear_apply

_NEG = jnp.float32(-1e30)   # finite mask floor: exp(_NEG - _NEG) stays 1.0
                            # (harmless at zero weight), no -inf NaN traps


class PagedKV(NamedTuple):
    """Two-level paged KV cache (see module docstring).

    Frozen level: k/v (n_layers, B, capacity, kv_heads, hd), valid rows
    ``< base[b]`` per slot. Hot level: hot_k/hot_v (n_layers, B, hot, ...),
    valid rows ``< hot_len[b]`` holding absolute positions
    ``base[b] + j``. ks/vs (and hot_ks/hot_vs) are int8-mode scales.
    """

    k: jax.Array
    v: jax.Array
    hot_k: jax.Array
    hot_v: jax.Array
    base: jax.Array          # (B,) int32
    hot_len: jax.Array       # (B,) int32
    ks: Optional[jax.Array] = None        # (n_layers, B, capacity, kv_heads)
    vs: Optional[jax.Array] = None
    hot_ks: Optional[jax.Array] = None    # (n_layers, B, hot, kv_heads)
    hot_vs: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.k.shape[2]

    @property
    def hot_size(self) -> int:
        return self.hot_k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.ks is not None


class Hot(NamedTuple):
    """The decode step's only cache output: the updated hot ring."""

    k: jax.Array
    v: jax.Array
    length: jax.Array        # (B,) int32: hot_len after the step
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None


class Prefix(NamedTuple):
    """Shared-prefix KV (system prompt): computed ONCE, read by every slot.

    k/v (n_layers, P, kv_heads, hd) — note NO batch axis: the prefix is
    one sequence shared across slots (the dominant serving case: a common
    system prompt). Slots opt in per request; opted-in slots see their
    token positions offset by ``length`` and attend these rows first.
    Memory/prefill cost is paid once instead of per slot. ks/vs are
    int8-mode scales (n_layers, P, kv_heads).
    """

    k: jax.Array
    v: jax.Array
    length: int              # static: real prefix rows (<= P)
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None


def build_prefix(params, tokens, cfg: ModelConfig,
                 quantized: bool = False) -> Tuple[jax.Array, Prefix]:
    """Run a shared prefix once and freeze its per-layer K/V.

    tokens: (P,) or (1, P) token ids. Returns (last-position logits (V,),
    Prefix). The prefix occupies absolute positions 0..P-1; requests using
    it start at position P (handled by the decode/prefill plumbing).
    """
    tokens = jnp.asarray(tokens, jnp.int32).reshape(1, -1)
    P = tokens.shape[1]
    plen = jnp.asarray([P], jnp.int32)
    logits, ks, vs = _prompt_kv(params, tokens, plen, cfg)
    ks, vs = ks[:, 0], vs[:, 0]                  # (L, P, KV, hd)
    kw = {}
    if quantized:
        k8, ksc = M.quantize_kv(ks)
        v8, vsc = M.quantize_kv(vs)
        ks, vs = k8, v8
        kw = dict(ks=ksc, vs=vsc)
    return logits[0], Prefix(ks, vs, P, **kw)


def advance(caches: PagedKV, hot: Hot) -> PagedKV:
    """Fold a step's Hot output back into the cache container (host-side)."""
    return caches._replace(hot_k=hot.k, hot_v=hot.v, hot_len=hot.length,
                           hot_ks=hot.ks, hot_vs=hot.vs)


def init_paged(batch: int, capacity: int, cfg: ModelConfig,
               dtype=jnp.bfloat16, quantized: bool = False,
               hot: int = 32, page: Optional[int] = None) -> PagedKV:
    """Zero-initialized paged cache. ``capacity`` is the frozen arena size;
    generation must keep ``base + hot <= capacity`` (drivers stop slots at
    ``capacity - hot`` so a flush always fits). Passing ``page`` rounds
    capacity up to a page multiple — required by the decode step (page
    reads must tile the arena exactly or the tail page would misalign)."""
    if page:
        capacity = -(-capacity // page) * page
    if hot < 1 or hot > capacity:
        raise ValueError(f"hot={hot} must be in [1, capacity={capacity}]")
    L, KV, hd = cfg.n_layers, cfg.kv_heads, cfg.hd
    dt = jnp.int8 if quantized else dtype
    fshape = (L, batch, capacity, KV, hd)
    hshape = (L, batch, hot, KV, hd)
    kw = {}
    if quantized:
        kw = dict(ks=jnp.zeros(fshape[:-1], jnp.float32),
                  vs=jnp.zeros(fshape[:-1], jnp.float32),
                  hot_ks=jnp.zeros(hshape[:-1], jnp.float32),
                  hot_vs=jnp.zeros(hshape[:-1], jnp.float32))
    return PagedKV(jnp.zeros(fshape, dt), jnp.zeros(fshape, dt),
                   jnp.zeros(hshape, dt), jnp.zeros(hshape, dt),
                   jnp.zeros((batch,), jnp.int32),
                   jnp.zeros((batch,), jnp.int32), **kw)


# ---------------------------------------------------------------------------
# Online-softmax attention over (pages of frozen) + hot
# ---------------------------------------------------------------------------


def _accum(state, q2, keys, vals, kpos, valid, pos, slopes,
           ksc, vsc, scale):
    """One online-softmax block update (multi-query window).

    q2 (B, KV, rep, S, hd); keys/vals (B, T, KV, hd); kpos (B, T) absolute
    key positions; valid (B, S, T) per query position. ksc/vsc (B, T, KV)
    int8-mode scales or None. pos (B, S) absolute query positions (ALiBi).
    state = (m, lsum, acc) running max / normalizer / weighted V sum (f32),
    shapes (B, KV, rep, S) / (B, KV, rep, S) / (B, KV, rep, S, hd).
    """
    m, lsum, acc = state
    lg = jnp.einsum("bkrsd,btkd->bkrst", q2,
                    keys.astype(q2.dtype)).astype(jnp.float32) * scale
    if ksc is not None:
        lg = lg * jnp.transpose(ksc, (0, 2, 1))[:, :, None, None, :]
    if slopes is not None:      # ALiBi: bias = -slope * (query_pos - key_pos)
        dist = (pos[:, None, None, :, None].astype(jnp.float32)
                - kpos[:, None, None, None, :].astype(jnp.float32))
        lg = lg - slopes[None, :, :, None, None] * dist
    vmask = valid[:, None, None, :, :]
    lg = jnp.where(vmask, lg, _NEG)
    m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
    pe = jnp.exp(lg - m_new[..., None])
    pe = jnp.where(vmask, pe, 0.0)
    alpha = jnp.exp(m - m_new)
    lsum = lsum * alpha + jnp.sum(pe, axis=-1)
    if vsc is not None:
        # V scales fold into the weighted sum only — NOT the softmax
        # normalizer (arena path: softmax first, then probs·vs)
        pe = pe * jnp.transpose(vsc, (0, 2, 1))[:, :, None, None, :]
    acc = acc * alpha[..., None] + jnp.einsum(
        "bkrst,btkd->bkrsd", pe, vals.astype(jnp.float32))
    return m_new, lsum, acc


def _paged_attention(p, h, cfg: ModelConfig, layer: jax.Array,
                     caches: PagedKV, hot_l, pos, rope_cs, page: int,
                     prefix_l=None, pre_len=None):
    """Single-token attention against (shared prefix + frozen pages + hot).

    h (B, S, D) — the S-token append window (S=1 is plain decode); layer:
    traced layer index for frozen-page slicing; hot_l = (hot_k, hot_v,
    hot_ks, hot_vs) this layer's hot slabs (from the layer scan); pos
    (B, S) ABSOLUTE positions of the incoming tokens (causal within the
    window; includes any prefix offset). prefix_l = (pk, pv, pks, pvs)
    this layer's shared-prefix slabs ((P0, KV, hd), no batch axis) or
    None; pre_len (B,) = per-slot prefix rows attended (0 = opted out).
    Returns (out (B, S, D), new hot_l).
    """
    B, S, D = h.shape
    H, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    rep = H // KV
    hot_k_l, hot_v_l, hks_l, hvs_l = hot_l
    P = hot_k_l.shape[1]

    if "wqkv" in p:
        qkv = linear_apply(p["wqkv"], h) + p.get("bqkv", 0.0)
        nq, nkv = H * hd, KV * hd
        q = qkv[..., :nq]
        k = qkv[..., nq:nq + nkv]
        v = qkv[..., nq + nkv:]
    else:
        q = linear_apply(p["wq"], h) + p.get("bq", 0.0)
        k = linear_apply(p["wk"], h) + p.get("bk", 0.0)
        v = linear_apply(p["wv"], h) + p.get("bv", 0.0)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KV, hd)
    v = v.reshape(B, S, KV, hd)
    if cfg.positions == "rope":
        cos, sin = rope_cs
        q = M.apply_rope(q, cos, sin)
        k = M.apply_rope(k, cos, sin)

    # write the S new K/V rows into each slot's hot ring at its own hot_len
    pre0 = (pre_len.astype(jnp.int32) if pre_len is not None
            else jnp.zeros((h.shape[0],), jnp.int32))
    hlen = (pos[:, 0] - pre0 - caches.base).astype(jnp.int32)  # == hot_len
    zero = jnp.zeros((), jnp.int32)

    # Batch-adaptive ring write (B is static at trace time):
    #   B > 1: one-hot select, NOT vmap(dynamic_update_slice) — per-slot
    #     start indices lower the vmapped slice-update to a TPU scatter
    #     costing ~0.17 ms/slot/step (5.5 of 16.4 ms at b32; the fix
    #     measured 1947 -> 2967 tok/s b32, +17% b8 — docs/PERF.md r4).
    #     The einsum gathers window row j-hlen[b] for ring row j (exact:
    #     each output sums ONE value; f32 accumulate is exact for
    #     bf16/int8 payloads); divergent per-slot hlen is fine, so spec
    #     rollback and mid-ring admission keep working.
    #   B == 1: a single dynamic_update_slice — there is no batched start
    #     index, hence no scatter, and the one-hot's extra VPU pass
    #     measured -6% on the (longer) 4-bit b1 step (A/B/A'd; 2-bit b1
    #     neutral).
    if B == 1:
        zero0 = jnp.zeros((), jnp.int32)

        def hot_write(ring, new):               # (1,P,KV,hd) <- (1,S,KV,hd)
            return lax.dynamic_update_slice(
                ring, new.astype(ring.dtype), (zero0, hlen[0], zero0, zero0))

        def hot_write_s(ring, new):             # (1,P,KV) <- (1,S,KV)
            return lax.dynamic_update_slice(
                ring, new.astype(ring.dtype), (zero0, hlen[0], zero0))
    else:
        ridx = jnp.arange(P, dtype=jnp.int32)[None, :]        # (1, P)
        win = ridx - hlen[:, None]                            # (B, P)
        inwin = (win >= 0) & (win < S)
        onehot = (jax.nn.one_hot(jnp.clip(win, 0, S - 1), S,
                                 dtype=jnp.float32)
                  * inwin[..., None].astype(jnp.float32))     # (B, P, S)
        sel4 = inwin[:, :, None, None]

        # Exactness of the one-hot gather: each output sums ONE product
        # 1.0*x, so it is exact whenever the bf16 MXU pass round-trips
        # the operands — true for bf16 payloads and int8 codes (integers
        # <= 127). f32 payloads/scales would get bf16-rounded by the
        # default-precision pass (TPU f32 dots run bf16 — CLAUDE.md), so
        # f32 targets pin HIGHEST; the scale planes (always f32) ride the
        # same rule. Cost: the scale einsums are (B,P,S)x(B,S,KV) — tiny
        # next to the payload write (ADVICE r4 #1).
        def hot_write(ring, new):               # (B,P,KV,hd) <- (B,S,KV,hd)
            prec = (lax.Precision.HIGHEST
                    if ring.dtype == jnp.float32 else None)
            g = jnp.einsum("bps,bskd->bpkd", onehot,
                           new.astype(jnp.float32), precision=prec)
            return jnp.where(sel4, g.astype(ring.dtype), ring)

        def hot_write_s(ring, new):             # (B,P,KV) <- (B,S,KV)
            g = jnp.einsum("bps,bsk->bpk", onehot,
                           new.astype(jnp.float32),
                           precision=lax.Precision.HIGHEST)
            return jnp.where(inwin[:, :, None], g.astype(ring.dtype), ring)

    ks_new = vs_new = None
    if hks_l is not None:
        k8, ksc = M.quantize_kv(k)
        v8, vsc = M.quantize_kv(v)
        hot_k_l = hot_write(hot_k_l, k8)
        hot_v_l = hot_write(hot_v_l, v8)
        ks_new = hot_write_s(hks_l, ksc)
        vs_new = hot_write_s(hvs_l, vsc)
    else:
        hot_k_l = hot_write(hot_k_l, k)
        hot_v_l = hot_write(hot_v_l, v)

    q2 = q.reshape(B, S, KV, rep, hd).transpose(0, 2, 3, 1, 4)
    slopes = (M.alibi_slopes(H).reshape(KV, rep)
              if cfg.positions == "alibi" else None)
    scale = jnp.float32(1.0 / math.sqrt(hd))
    state = (jnp.full((B, KV, rep, S), _NEG, jnp.float32),
             jnp.zeros((B, KV, rep, S), jnp.float32),
             jnp.zeros((B, KV, rep, S, hd), jnp.float32))

    if prefix_l is not None:
        # shared-prefix block: one K/V slab read for the whole batch
        # (absolute positions 0..P0-1); opted-out slots mask it entirely
        pk_l, pv_l, pks_l, pvs_l = prefix_l               # (P0, KV, hd)
        P0 = pk_l.shape[0]
        kpos = jnp.broadcast_to(
            jnp.arange(P0, dtype=jnp.int32)[None, :], (B, P0))
        valid = jnp.broadcast_to(
            (kpos < pre0[:, None])[:, None, :], (B, S, P0))
        bshape = (B,) + pk_l.shape
        psc = (jnp.broadcast_to(pks_l[None], bshape[:-1])
               if pks_l is not None else None)
        pvs = (jnp.broadcast_to(pvs_l[None], bshape[:-1])
               if pvs_l is not None else None)
        state = _accum(state, q2, jnp.broadcast_to(pk_l[None], bshape),
                       jnp.broadcast_to(pv_l[None], bshape), kpos, valid,
                       pos, slopes, psc, pvs, scale)

    max_base = jnp.max(caches.base).astype(jnp.int32)

    def page_body(psize):
        def body(pidx, state):
            start = pidx * psize
            pk = lax.dynamic_slice(
                caches.k, (layer, zero, start, zero, zero),
                (1, B, psize, KV, hd))[0]
            pv = lax.dynamic_slice(
                caches.v, (layer, zero, start, zero, zero),
                (1, B, psize, KV, hd))[0]
            psc = pvs = None
            if caches.ks is not None:
                psc = lax.dynamic_slice(
                    caches.ks, (layer, zero, start, zero),
                    (1, B, psize, KV))[0]
                pvs = lax.dynamic_slice(
                    caches.vs, (layer, zero, start, zero),
                    (1, B, psize, KV))[0]
            ridx = start + jnp.arange(psize, dtype=jnp.int32)
            ridx = jnp.broadcast_to(ridx[None, :], (B, psize))
            # absolute key positions shift past any per-slot prefix
            kpos = pre0[:, None] + ridx
            # frozen rows are < base, hence before every query position
            valid = jnp.broadcast_to(
                (ridx < caches.base[:, None])[:, None, :], (B, S, psize))
            return _accum(state, q2, pk, pv, kpos, valid, pos, slopes,
                          psc, pvs, scale)
        return body

    # telescoped page loop: per-iteration overhead (~5 µs) makes many small
    # pages slow at long context (page 256->1024 measured +19% at 1900 ctx)
    # while large pages waste reads at short context (rounding up). Big
    # pages (8x) cover the bulk; small pages finish the tail, so reads
    # round up only to the small page size.
    big = 8 * page
    if big < caches.capacity:
        n_big = max_base // big                       # full big pages only
        state = lax.fori_loop(0, n_big, page_body(big), state)
        lo = n_big * (big // page)                    # continue in small pages
    else:
        lo = jnp.zeros((), jnp.int32)
    n_pages = (max_base + (page - 1)) // page
    state = lax.fori_loop(lo, n_pages, page_body(page), state)

    # hot block: query s (at hot index hlen+s) attends hot rows j <= hlen+s
    # — causal within the appended window, inclusive of its own row
    kpos = (pre0[:, None] + caches.base[:, None]
            + jnp.arange(P, dtype=jnp.int32)[None, :])
    qidx = hlen[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # (B, S)
    valid = (jnp.arange(P, dtype=jnp.int32)[None, None, :]
             <= qidx[:, :, None])                                   # (B,S,P)
    state = _accum(state, q2, hot_k_l, hot_v_l, kpos, valid, pos, slopes,
                   ks_new, vs_new, scale)

    m, lsum, acc = state
    out = acc / jnp.maximum(lsum, 1e-30)[..., None]
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, S, H * hd).astype(h.dtype)
    out = linear_apply(p["wo"], out) + p.get("bo", 0.0)
    return out, (hot_k_l, hot_v_l, ks_new, vs_new)


# ---------------------------------------------------------------------------
# Decode step / flush / prefill
# ---------------------------------------------------------------------------


def paged_append_step(params, tokens: jax.Array, caches: PagedKV,
                      cfg: ModelConfig, *, page: int = 256,
                      prefix: Optional[Prefix] = None,
                      prefix_on: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, Hot]:
    """Append S tokens per slot to the paged cache and return their logits.

    tokens (B, S). The window is causal (token s attends frozen + hot +
    window tokens <= s); K/V rows land in the hot ring at
    hot_len..hot_len+S-1, so callers need ``max(hot_len) + S <= hot size``
    (flush first). Returns (logits (B, S, V), Hot with hot_len + S).

    S = 1 is plain decode (:func:`paged_decode_step`). S > 1 serves
    chunked prefill (streaming a prompt through the hot ring: O(prompt)
    traffic instead of a full-arena write) and the speculative-decoding
    verify pass — rolling back rejected tokens is just NOT advancing
    hot_len (rows past hot_len are dead and get overwritten).

    The frozen arena is read (by telescoped pages, up to the used length)
    but never returned: the per-call cache-output copy is O(hot)
    regardless of capacity.

    prefix + prefix_on (B,) 0/1: shared-prefix mode (see Prefix) — opted-in
    slots attend the prefix rows first and have all their positions offset
    by prefix.length (their base/hot_len still count only their own rows).
    """
    if caches.capacity % page:
        raise ValueError(
            f"capacity {caches.capacity} must be a multiple of page {page} "
            f"(init_paged(..., page=...) rounds it up)")
    B, S = tokens.shape
    if prefix is not None:
        on = (jnp.ones((B,), jnp.int32) if prefix_on is None
              else prefix_on.astype(jnp.int32))
        pre_len = on * jnp.asarray(prefix.length, jnp.int32)     # (B,)
    else:
        pre_len = None
    pos0 = caches.base + caches.hot_len           # (B,) own rows
    if pre_len is not None:
        pos0 = pos0 + pre_len
    positions = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = M.embed(params, tokens, cfg, positions)
    rope_cs = (M.rope_tables(cfg, positions)
               if cfg.positions == "rope" else None)
    quantized = caches.quantized

    xs = (params["blocks"], caches.hot_k, caches.hot_v)
    if quantized:
        xs += (caches.hot_ks, caches.hot_vs)
    if prefix is not None:
        xs += (prefix.k, prefix.v)
        if prefix.ks is not None:
            xs += (prefix.ks, prefix.vs)

    def body(carry, layer_xs):
        x, l = carry
        layer_xs = list(layer_xs)
        bp, hk, hv = layer_xs[:3]
        rest = layer_xs[3:]
        hks = hvs = None
        if quantized:
            hks, hvs = rest[:2]
            rest = rest[2:]
        prefix_l = None
        if prefix is not None:
            if prefix.ks is not None:
                prefix_l = (rest[0], rest[1], rest[2], rest[3])
            else:
                prefix_l = (rest[0], rest[1], None, None)
        x, hot_l = _block_step(bp, x, l, caches, (hk, hv, hks, hvs),
                               positions, rope_cs, cfg, page, prefix_l,
                               pre_len)
        return (x, l + 1), hot_l

    (x, _), hot_ys = lax.scan(body, (x, jnp.zeros((), jnp.int32)), xs)
    logits = M.unembed(params, x, cfg)
    hk, hv, hks, hvs = hot_ys
    return logits, Hot(hk, hv, caches.hot_len + S, hks, hvs)


def _block_step(bp, x, l, caches, hot_l, positions, rope_cs, cfg, page,
                prefix_l, pre_len):
    """One decoder block against the paged cache (shared by the scan and
    unrolled step forms). Returns (x, new hot_l)."""
    h = M.norm(bp["ln1"], x, cfg) if cfg.do_layer_norm_before else x
    a, hot_l = _paged_attention(bp["attn"], h, cfg, l, caches, hot_l,
                                positions, rope_cs, page,
                                prefix_l=prefix_l, pre_len=pre_len)
    x = x + a
    if not cfg.do_layer_norm_before:
        x = M.norm(bp["ln1"], x, cfg)
    res = x
    h = M.norm(bp["ln2"], x, cfg) if cfg.do_layer_norm_before else x
    m = M.mlp(bp["mlp"], h, cfg)
    x = res + m
    if not cfg.do_layer_norm_before:
        x = M.norm(bp["ln2"], x, cfg)
    return x, hot_l


def split_blocks(params) -> Tuple[dict, tuple]:
    """Pre-split the stacked block tree into per-layer trees (ONCE, at
    load time, outside jit).

    Why: `lax.scan` over stacked weights dynamic-slices every leaf per
    iteration, and XLA MATERIALIZES those slices — a full extra HBM copy
    of each layer's packed weights per decode step (~50 MB/layer at 7B,
    measured as the dominant non-kernel cost: scan 170.0 vs unrolled
    254.0 tok/s, scripts/bench_session2.py, docs/PERF.md). Per-layer
    trees passed as separate jit arguments index statically — no copies.

    Returns (misc_params, layers): misc keeps embed/final_ln/lm_head (and
    everything else non-block); layers is a tuple of per-layer trees.
    """
    L = None
    for leaf in jax.tree.leaves(params["blocks"]):
        L = leaf.shape[0]
        break
    layers = tuple(
        jax.tree.map(lambda p, i=i: p[i], params["blocks"])
        for i in range(L))
    misc = {k: v for k, v in params.items() if k != "blocks"}
    return misc, layers


class Split(NamedTuple):
    """Pre-split param form (see split_blocks): misc (non-block leaves) +
    a tuple of per-layer block trees. A NamedTuple, so it passes through
    jit as an ordinary pytree argument; paged_*_any dispatch on it."""
    misc: dict
    layers: tuple


def as_split(params) -> Split:
    """params -> Split (idempotent). Engine/speculative call this once at
    load time so their step functions run the unrolled layer loop — the
    scan form's per-iteration weight-slice copies cost ~1.5x decode
    throughput at 7B (split_blocks docstring, docs/PERF.md round 2)."""
    if isinstance(params, Split):
        return params
    return Split(*split_blocks(params))


def paged_decode_any(params, tokens: jax.Array, caches: PagedKV,
                     cfg: ModelConfig, *, page: int = 256,
                     prefix: Optional[Prefix] = None,
                     prefix_on: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, Hot]:
    """paged_decode_step that accepts stacked params OR a Split (unrolled
    layer loop). Lets one step function serve both forms — speculative
    draft/target and engine paths pass whatever they pre-built."""
    if isinstance(params, Split):
        return paged_decode_step_unrolled(params.misc, params.layers,
                                          tokens, caches, cfg, page=page,
                                          prefix=prefix,
                                          prefix_on=prefix_on)
    return paged_decode_step(params, tokens, caches, cfg, page=page,
                             prefix=prefix, prefix_on=prefix_on)


def paged_append_any(params, tokens: jax.Array, caches: PagedKV,
                     cfg: ModelConfig, *, page: int = 256,
                     prefix: Optional[Prefix] = None,
                     prefix_on: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, Hot]:
    """paged_append_step over stacked params OR a Split (see
    paged_decode_any)."""
    if isinstance(params, Split):
        return paged_append_step_unrolled(params.misc, params.layers,
                                          tokens, caches, cfg, page=page,
                                          prefix=prefix,
                                          prefix_on=prefix_on)
    return paged_append_step(params, tokens, caches, cfg, page=page,
                             prefix=prefix, prefix_on=prefix_on)


def paged_append_step_unrolled(misc, layers, tokens: jax.Array,
                               caches: PagedKV, cfg: ModelConfig, *,
                               page: int = 256,
                               prefix: Optional[Prefix] = None,
                               prefix_on: Optional[jax.Array] = None
                               ) -> Tuple[jax.Array, Hot]:
    """paged_append_step with a python loop over pre-split layer trees
    (see split_blocks). Semantics identical to the scan form
    (tests/test_paged.py::test_unrolled_step_matches_scan); ~1.5x decode
    throughput at 7B because the per-layer weight-slice copies vanish."""
    if caches.capacity % page:
        raise ValueError(
            f"capacity {caches.capacity} must be a multiple of page {page} "
            f"(init_paged(..., page=...) rounds it up)")
    B, S = tokens.shape
    if prefix is not None:
        on = (jnp.ones((B,), jnp.int32) if prefix_on is None
              else prefix_on.astype(jnp.int32))
        pre_len = on * jnp.asarray(prefix.length, jnp.int32)
    else:
        pre_len = None
    pos0 = caches.base + caches.hot_len
    if pre_len is not None:
        pos0 = pos0 + pre_len
    positions = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = M.embed(misc, tokens, cfg, positions)
    rope_cs = (M.rope_tables(cfg, positions)
               if cfg.positions == "rope" else None)
    quantized = caches.quantized

    hot_out = {"k": [], "v": [], "ks": [], "vs": []}
    for l, bp in enumerate(layers):
        hot_l = (caches.hot_k[l], caches.hot_v[l],
                 caches.hot_ks[l] if quantized else None,
                 caches.hot_vs[l] if quantized else None)
        prefix_l = None
        if prefix is not None:
            prefix_l = (prefix.k[l], prefix.v[l],
                        prefix.ks[l] if prefix.ks is not None else None,
                        prefix.vs[l] if prefix.vs is not None else None)
        x, hot_l = _block_step(bp, x, jnp.int32(l), caches, hot_l,
                               positions, rope_cs, cfg, page, prefix_l,
                               pre_len)
        hot_out["k"].append(hot_l[0])
        hot_out["v"].append(hot_l[1])
        hot_out["ks"].append(hot_l[2])
        hot_out["vs"].append(hot_l[3])

    logits = M.unembed(misc, x, cfg)
    return logits, Hot(
        jnp.stack(hot_out["k"]), jnp.stack(hot_out["v"]),
        caches.hot_len + S,
        jnp.stack(hot_out["ks"]) if quantized else None,
        jnp.stack(hot_out["vs"]) if quantized else None)


def paged_decode_step_unrolled(misc, layers, tokens: jax.Array,
                               caches: PagedKV, cfg: ModelConfig, *,
                               page: int = 256,
                               prefix: Optional[Prefix] = None,
                               prefix_on: Optional[jax.Array] = None
                               ) -> Tuple[jax.Array, Hot]:
    """One decode token per slot, unrolled layer loop (see split_blocks)."""
    logits, hot = paged_append_step_unrolled(
        misc, layers, tokens, caches, cfg, page=page, prefix=prefix,
        prefix_on=prefix_on)
    return logits[:, -1, :], hot


def paged_decode_step(params, tokens: jax.Array, caches: PagedKV,
                      cfg: ModelConfig, *, page: int = 256,
                      prefix: Optional[Prefix] = None,
                      prefix_on: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, Hot]:
    """One decode token per slot against the paged cache.

    tokens (B, 1). Returns (logits (B, V), Hot) — see paged_append_step.
    """
    logits, hot = paged_append_step(params, tokens, caches, cfg, page=page,
                                    prefix=prefix, prefix_on=prefix_on)
    return logits[:, -1, :], hot


def paged_decode_scan(params, tokens: jax.Array, caches: PagedKV,
                      cfg: ModelConfig, n_steps: int, *, page: int = 256
                      ) -> Tuple[jax.Array, Hot]:
    """Greedy-decode ``n_steps`` tokens in ONE compiled program.

    Unlike the arena ``decode_scan`` (whose scan carries copy the whole
    cache per iteration on no-donation runtimes — docs/PERF.md), the carry
    here is only the hot ring, so chunking is cheap: it amortizes the
    per-dispatch overhead without capacity-sized copies. Requires
    ``max(hot_len) + n_steps <= hot size`` (no flush inside the chunk).

    Returns (tokens (B, n_steps) int32, final Hot).
    """

    def body(carry, _):
        tok, hot = carry
        logits, hot = paged_decode_step(params, tok, advance(caches, hot),
                                        cfg, page=page)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return (nxt, hot), nxt[:, 0]

    hot0 = Hot(caches.hot_k, caches.hot_v, caches.hot_len,
               caches.hot_ks, caches.hot_vs)
    (_, hot), toks = lax.scan(body, (tokens, hot0), None, length=n_steps)
    return toks.T, hot


def flush_hot(caches: PagedKV) -> PagedKV:
    """Append each slot's hot run into the frozen arena at its base.

    One stacked dynamic_update_slice per array (a full-arena copy, amortized
    over ``hot`` decode steps). Rows past ``hot_len`` are garbage but land in
    ``>= new base`` territory, which masks + later flushes overwrite. Slots
    must satisfy ``base + hot <= capacity`` (drivers retire slots earlier);
    otherwise XLA clamps the start index and valid rows would be corrupted.
    """
    zero = jnp.zeros((), jnp.int32)

    def upd(arr_b, hot_b, at):
        # arr_b (L, cap, KV, hd) one slot across layers; hot_b (L, P, KV, hd)
        start = (zero, at) + (zero,) * (arr_b.ndim - 2)
        return lax.dynamic_update_slice(arr_b, hot_b.astype(arr_b.dtype),
                                        start)

    vupd = jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)
    k = vupd(caches.k, caches.hot_k, caches.base)
    v = vupd(caches.v, caches.hot_v, caches.base)
    kw = {}
    if caches.quantized:
        kw = dict(ks=vupd(caches.ks, caches.hot_ks, caches.base),
                  vs=vupd(caches.vs, caches.hot_vs, caches.base))
    return caches._replace(k=k, v=v, base=caches.base + caches.hot_len,
                           hot_len=jnp.zeros_like(caches.hot_len), **kw)


def _prompt_kv(params, tokens: jax.Array, plen: jax.Array, cfg: ModelConfig):
    """Run the prompt through the model, returning per-layer post-RoPE K/V.

    tokens (B, S) padded; plen (B,) real lengths. Returns (last-position
    logits (B, V), ks, vs stacked (n_layers, B, S, KV, hd))."""
    B, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    key_pos = jnp.arange(S)[None, None, :]
    mask = ((key_pos <= positions[:, :, None])
            & (key_pos < plen[:, None, None]))
    x = M.embed(params, tokens, cfg, positions)
    rope_cs = (M.rope_tables(cfg, positions)
               if cfg.positions == "rope" else None)

    def body(x, bp):
        cache = M.KVCache(
            jnp.zeros((B, S, cfg.kv_heads, cfg.hd), x.dtype),
            jnp.zeros((B, S, cfg.kv_heads, cfg.hd), x.dtype),
            jnp.zeros((), jnp.int32))
        # plen: prefill-from-zero contract — long prompts route through
        # the blockwise flash kernel; the KV rows still land in `cache`
        y, cache, _ = M.block_apply(bp, x, cfg, positions, mask, cache,
                                    rope_cs=rope_cs, plen=plen)
        return y, (cache.k, cache.v)

    x, (ks, vs) = lax.scan(body, x, params["blocks"])
    logits = M.unembed(params, x, cfg)
    last = jnp.take_along_axis(
        logits, (plen - 1)[:, None, None].astype(jnp.int32), axis=1)
    return last[:, 0, :], ks, vs


def _store_kv(caches: PagedKV, ks, vs, starts):
    """Write stacked prompt K/V (n_layers, B', S, KV, hd) into the frozen
    arena at position 0, slot offset ``starts`` (scalar slot index)."""
    zero = jnp.zeros((), jnp.int32)
    kw = {}
    if caches.quantized:
        k8, ksc = M.quantize_kv(ks)
        v8, vsc = M.quantize_kv(vs)
        kw = dict(
            ks=lax.dynamic_update_slice(
                caches.ks, ksc, (zero, starts, zero, zero)),
            vs=lax.dynamic_update_slice(
                caches.vs, vsc, (zero, starts, zero, zero)),
        )
        ks, vs = k8, v8
    k = lax.dynamic_update_slice(
        caches.k, ks.astype(caches.k.dtype), (zero, starts, zero, zero, zero))
    v = lax.dynamic_update_slice(
        caches.v, vs.astype(caches.v.dtype), (zero, starts, zero, zero, zero))
    return caches._replace(k=k, v=v, **kw)


def paged_prefill(params, tokens: jax.Array, plen: jax.Array,
                  caches: PagedKV, cfg: ModelConfig
                  ) -> Tuple[jax.Array, PagedKV]:
    """Prefill ALL slots with (padded) prompts. tokens (B, S); plen (B,).

    Returns (last real-position logits (B, V), caches with base=plen,
    hot_len=0). One-time full-arena output — per-request cost, not
    per-token. Padded-position K/V rows land at >= base and are masked.
    """
    logits, ks, vs = _prompt_kv(params, tokens, plen, cfg)
    caches = _store_kv(caches, ks, vs, jnp.zeros((), jnp.int32))
    return logits, caches._replace(
        base=plen.astype(jnp.int32),
        hot_len=jnp.zeros_like(caches.hot_len))


def paged_prefill_slot(params, tokens: jax.Array, plen: jax.Array,
                       caches: PagedKV, slot: jax.Array, cfg: ModelConfig
                       ) -> Tuple[jax.Array, PagedKV]:
    """Prefill ONE slot (continuous-batching admission). tokens (1, S)."""
    logits, ks, vs = _prompt_kv(params, tokens, plen[None], cfg)
    caches = _store_kv(caches, ks, vs, slot.astype(jnp.int32))
    return logits[0], caches._replace(
        base=caches.base.at[slot].set(plen.astype(jnp.int32)),
        hot_len=caches.hot_len.at[slot].set(0))
