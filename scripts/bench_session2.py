"""Chip session 2: find the missing ~2 ms/step (run ALONE, log to file).

bench_glue accounted only ~0.56 ms of the ~2.6 ms between the kernel
microbench floor and the real step. Hypothesis: the layer `lax.scan`
DYNAMIC-SLICES each layer's stacked weight leaves into a temp buffer
before the (buffer-consuming) Pallas calls — a full extra HBM copy of
~50 MB/layer (~72 us/layer at roofline). An unrolled decode step with
per-layer trees as separate jit arguments (static indexing, no scan xs
slicing) tests it directly.

Variants:
  A   baseline paged scan step (headline config)
  U   unrolled paged step, pre-split per-layer param trees
  K   scan step with rotations+norms+rope stripped AND attention gutted
      (in-model kernel floor WITH scan slicing)
  UK  unrolled step with the same strips (floor WITHOUT scan slicing)

Then: flash prefill parity + 2k/4k/8k prefill timing (VERDICT item 5).
"""
from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def unrolled_paged_step(embed_tree, layers, tokens, caches, cfg, *,
                        page, gut=False):
    """paged_append_step with a python loop over per-layer trees."""
    from quip_tpu.models import model as M
    from quip_tpu.models import paged as PG
    from quip_tpu.ops.qlinear import linear_apply

    B, S = tokens.shape
    pos0 = caches.base + caches.hot_len
    positions = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    params = {"embed": embed_tree["embed"],
              "final_ln": embed_tree["final_ln"],
              "lm_head": embed_tree["lm_head"]}
    x = M.embed(params, tokens, cfg, positions)
    rope_cs = M.rope_tables(cfg, positions)

    hot_ks, hot_vs = [], []
    for l, bp in enumerate(layers):
        hot_l = (caches.hot_k[l], caches.hot_v[l], None, None)
        h = M.norm(bp["ln1"], x, cfg)
        if gut:
            qkv = linear_apply(bp["attn"]["wqkv"], h)
            H_, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
            nq, nkv = H_ * hd, KV * hd
            q = qkv[..., :nq].reshape(B, S, H_, hd)
            k = qkv[..., nq:nq + nkv].reshape(B, S, KV, hd)
            v = qkv[..., nq + nkv:].reshape(B, S, KV, hd)
            cos, sin = rope_cs
            q = M.apply_rope(q, cos, sin)
            k = M.apply_rope(k, cos, sin)
            hlen = (positions[:, 0] - caches.base).astype(jnp.int32)
            zero = jnp.zeros((), jnp.int32)

            def upd(arr_b, new_b, at):
                return lax.dynamic_update_slice(
                    arr_b, new_b.astype(arr_b.dtype), (at, zero, zero))

            hk = jax.vmap(upd)(hot_l[0], k, hlen)
            hv = jax.vmap(upd)(hot_l[1], v, hlen)
            a = linear_apply(
                bp["attn"]["wo"],
                q.reshape(B, S, H_ * hd) * jnp.bfloat16(1 / math.sqrt(hd)))
            hot_new = (hk, hv, None, None)
        else:
            from quip_tpu.models.paged import _paged_attention
            a, hot_new = _paged_attention(
                bp["attn"], h, cfg, jnp.int32(l), caches, hot_l,
                positions, rope_cs, page)
        x = x + a
        h = M.norm(bp["ln2"], x, cfg)
        x = x + M.mlp(bp["mlp"], h, cfg)
        hot_ks.append(hot_new[0])
        hot_vs.append(hot_new[1])

    logits = M.unembed(params, x, cfg)
    from quip_tpu.models.paged import Hot
    return logits[:, -1, :], Hot(jnp.stack(hot_ks), jnp.stack(hot_vs),
                                 caches.hot_len + S, None, None)


def bench_unrolled(packed, cfg, *, steps=96, max_seq=160, hot=32, page=64,
                   gut=False):
    from quip_tpu.models import paged as PG

    L = cfg.n_layers
    layers = tuple(jax.tree.map(lambda p, i=i: p[i], packed["blocks"])
                   for i in range(L))
    misc = {"embed": packed["embed"], "final_ln": packed["final_ln"],
            "lm_head": packed["lm_head"]}
    caches = PG.init_paged(1, max_seq, cfg, dtype=jnp.bfloat16, hot=hot,
                           page=page)

    @jax.jit
    def pstep(misc, layers, tok, caches):
        logits, hot_s = unrolled_paged_step(misc, layers, tok, caches, cfg,
                                            page=page, gut=gut)
        return jnp.argmax(logits, -1)[:, None].astype(jnp.int32), hot_s

    pflush = jax.jit(PG.flush_hot, donate_argnums=0)
    caches = pflush(caches)
    tok = jnp.zeros((1, 1), jnp.int32)
    n = 0
    t_compile0 = time.time()

    def run(tok, caches):
        nonlocal n
        tok, hot_s = pstep(misc, layers, tok, caches)
        caches = PG.advance(caches, hot_s)
        n += 1
        if n >= hot:
            caches = pflush(caches)
            n = 0
        return tok, caches

    for _ in range(4):
        tok, caches = run(tok, caches)
    int(tok[0, 0])
    print(f"#   (unrolled compile+warm {time.time()-t_compile0:.0f}s)",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(steps):
        tok, caches = run(tok, caches)
    int(tok[0, 0])
    return steps / (time.time() - t0)


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from bench import bench_decode
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.models import paged as PG
    from quip_tpu.core import incoherence  # noqa
    from quip_tpu.pack.format import PackedLinear

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built packed in {time.time()-t0:.0f}s", flush=True)

    a1 = bench_decode(packed, cfg, steps=96)
    print(f"A  scan baseline: {a1:.1f} tok/s", flush=True)

    u = bench_unrolled(packed, cfg)
    print(f"U  unrolled: {u:.1f} tok/s", flush=True)

    # stripped variants: rotations off
    def strip(t):
        if isinstance(t, PackedLinear):
            return PackedLinear(
                t.planes, t.scale, t.zero, t.scale_b, None, None,
                t.bias, bits=t.bits, qfn=t.qfn, proj_mode=t.proj_mode,
                out_features=t.out_features, in_features=t.in_features,
                rot=None)
        return t

    stripped = jax.tree.map(
        strip, packed,
        is_leaf=lambda t: isinstance(t, PackedLinear) or t is None)

    orig_norm = M.norm
    orig_rope = M.apply_rope
    orig_attn = PG._paged_attention

    def gutted(p, h, cfg_, layer, caches, hot_l, pos, rope_cs, page,
               prefix_l=None, pre_len=None):
        from quip_tpu.ops.qlinear import linear_apply
        B, S, D = h.shape
        H_, KV, hd = cfg_.n_heads, cfg_.kv_heads, cfg_.hd
        qkv = linear_apply(p["wqkv"], h)
        nq, nkv = H_ * hd, KV * hd
        q = qkv[..., :nq].reshape(B, S, H_, hd)
        k = qkv[..., nq:nq + nkv].reshape(B, S, KV, hd)
        hlen = (pos[:, 0] - caches.base).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)

        def upd(arr_b, new_b, at):
            return lax.dynamic_update_slice(
                arr_b, new_b.astype(arr_b.dtype), (at, zero, zero))

        hk = jax.vmap(upd)(hot_l[0], k, hlen)
        hv = jax.vmap(upd)(hot_l[1], k, hlen)
        out = linear_apply(p["wo"],
                           q.reshape(B, S, H_ * hd)
                           * jnp.bfloat16(1 / math.sqrt(hd)))
        return out, (hk, hv, None, None)

    M.norm = lambda p, x, c: x
    M.apply_rope = lambda x, c, s: x
    PG._paged_attention = gutted
    try:
        kk = bench_decode(stripped, cfg, steps=96)
        print(f"K  scan floor (strip+gut): {kk:.1f} tok/s", flush=True)
        uk = bench_unrolled(stripped, cfg, gut=True)
        print(f"UK unrolled floor (strip+gut): {uk:.1f} tok/s", flush=True)
    finally:
        M.norm = orig_norm
        M.apply_rope = orig_rope
        PG._paged_attention = orig_attn

    a2 = bench_decode(packed, cfg, steps=96)
    print(f"A' baseline re-run: {a2:.1f} tok/s (drift "
          f"{abs(a2-a1)/a1*100:.1f}%)", flush=True)

    # ---- flash prefill: parity + timing ------------------------------
    import os

    cfg2 = replace(get_config("llama-2-7b"), n_layers=2, dtype="bfloat16")
    p2 = _packed_llama(cfg2, bits=2, seed=0)
    tokens = jnp.zeros((1, 512), jnp.int32) + 7
    os.environ["QUIP_FLASH_PREFILL"] = "0"
    dense = np.asarray(jax.jit(lambda p, t: M.forward(p, t, cfg2))(
        p2, tokens), np.float32)
    os.environ["QUIP_FLASH_PREFILL"] = "1"
    flash = np.asarray(jax.jit(lambda p, t: M.forward(p, t, cfg2))(
        p2, tokens), np.float32)
    err = np.max(np.abs(flash - dense)) / (np.max(np.abs(dense)) + 1e-9)
    print(f"flash parity(512ctx, 2L): rel err {err:.2e}", flush=True)
    del p2

    cfgL = replace(get_config("llama-2-7b"), dtype="bfloat16",
                   max_seq=8192)
    pL = _packed_llama(cfgL, bits=2, seed=0, head_bits=2)

    def time_forward(S, iters=3):
        toks = jnp.zeros((1, S), jnp.int32)
        fwd = jax.jit(lambda p, t: M.forward(p, t, cfgL)[:, -1, :])
        out = fwd(pL, toks)
        float(out[0, 0])
        t0 = time.time()
        for _ in range(iters):
            out = fwd(pL, toks)
        float(out[0, 0])
        return (time.time() - t0) / iters

    for S in (2048, 4096, 8192):
        row = {}
        for flag in ("1", "0"):
            os.environ["QUIP_FLASH_PREFILL"] = flag
            key = "flash" if flag == "1" else "dense"
            try:
                row[key] = f"{time_forward(S)*1000:.0f} ms"
            except Exception as e:
                row[key] = f"FAIL({type(e).__name__})"
        print(f"prefill S={S}: flash={row['flash']} dense={row['dense']}",
              flush=True)


if __name__ == "__main__":
    main()
