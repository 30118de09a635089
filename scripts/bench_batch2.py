"""Round-4 chip session 2: SELHOT verification + KV-major layout probe.

Session 1 (scripts/bench_batch.py, docs/PERF.md round 4) attributed the
batched decode step: the vmap(dynamic_update_slice) hot write was a
per-slot scatter (~5.5 ms at b32, fixed by the shipped one-hot write),
and the frozen-page loop costs ~2x its DMA floor (6.9 ms vs ~3.6 ms at
b32 ctx150). Hypothesis for the remainder: the page slice arrives as
(B, T, KV, hd) but the attention dot contracts per-(b, k) — XLA must
relayout the page to (B, KV, T, hd) before the MXU sees it, an extra
read+write pass over every cache byte. This session:

  ab       production paths after the SELHOT ship: b1/b8/b32 empty,
           b32 steady-150, b1 steady-1900 (A/B vs session-1 numbers)
  kvmajor  frozen arena stored (L, B, KV, cap, hd) — page slices feed the
           dot with NO relayout; hot ring optionally KV-major too.
           No-flush chained harness, identical for the control leg.
  longctx  ctx {2048, 4096, 7936} x {bf16, int8} steady b1 (7936 = 31*256
           keeps the flash prefill gate happy — 8000 fell to the dense
           path and OOM'd in session 1); per-row try/except.
"""
from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("bench_batch2")
_ap.add_argument("--smoke", action="store_true")
_ap.add_argument("--sections", default="ab,kvmajor,longctx")
ARGS = _ap.parse_args()

if ARGS.smoke:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

if ARGS.smoke:
    jax.config.update("jax_platforms", "cpu")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from bench_batch import prefilled_caches  # noqa: E402


# ---------------------------------------------------------------------------
# KV-major experiment: custom attention + no-flush chain harness
# ---------------------------------------------------------------------------


def _accum_kvmajor(state, q2, keys, vals, valid, scale):
    """Online-softmax block with KV-MAJOR keys/vals (B, KV, T, hd):
    the dot's (b, k) batch dims lead in both operands — no relayout."""
    m, lsum, acc = state
    lg = jnp.einsum("bkrsd,bktd->bkrst", q2,
                    keys.astype(q2.dtype)).astype(jnp.float32) * scale
    vmask = valid[:, None, None, :, :]
    lg = jnp.where(vmask, lg, -1e30)
    m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
    pe = jnp.exp(lg - m_new[..., None])
    pe = jnp.where(vmask, pe, 0.0)
    alpha = jnp.exp(m - m_new)
    lsum = lsum * alpha + jnp.sum(pe, axis=-1)
    acc = acc * alpha[..., None] + jnp.einsum(
        "bkrst,bktd->bkrsd", pe, vals.astype(jnp.float32))
    return m_new, lsum, acc


def make_kvmajor_attention(hot_major: bool):
    """Attention against a TRANSPOSED frozen arena (L, B, KV, cap, hd).
    hot_major=True also keeps the hot ring KV-major (L, B, KV, P, hd)."""
    from quip_tpu.models import model as M
    from quip_tpu.models import paged as PG
    from quip_tpu.ops.qlinear import linear_apply

    def attn(p, h, cfg, layer, caches, hot_l, pos, rope_cs, page,
             prefix_l=None, pre_len=None):
        B, S, D = h.shape
        H, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
        rep = H // KV
        hot_k_l, hot_v_l, _, _ = hot_l
        P = hot_k_l.shape[2] if hot_major else hot_k_l.shape[1]
        cap = caches.k.shape[3]

        qkv = linear_apply(p["wqkv"], h)
        nq, nkv = H * hd, KV * hd
        q = qkv[..., :nq].reshape(B, S, H, hd)
        k = qkv[..., nq:nq + nkv].reshape(B, S, KV, hd)
        v = qkv[..., nq + nkv:].reshape(B, S, KV, hd)
        cos, sin = rope_cs
        q = M.apply_rope(q, cos, sin)
        k = M.apply_rope(k, cos, sin)

        hlen = (pos[:, 0] - caches.base).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)

        ridx = jnp.arange(P, dtype=jnp.int32)[None, :]
        win = ridx - hlen[:, None]
        inwin = (win >= 0) & (win < S)
        onehot = (jax.nn.one_hot(jnp.clip(win, 0, S - 1), S,
                                 dtype=jnp.float32)
                  * inwin[..., None].astype(jnp.float32))

        if hot_major:        # ring (B, KV, P, hd); write emits KV-major
            def hw(ring, new):
                g = jnp.einsum("bps,bskd->bkpd", onehot,
                               new.astype(jnp.float32))
                return jnp.where(inwin[:, None, :, None],
                                 g.astype(ring.dtype), ring)
        else:
            def hw(ring, new):
                g = jnp.einsum("bps,bskd->bpkd", onehot,
                               new.astype(jnp.float32))
                return jnp.where(inwin[:, :, None, None],
                                 g.astype(ring.dtype), ring)

        hot_k_l = hw(hot_k_l, k)
        hot_v_l = hw(hot_v_l, v)

        q2 = q.reshape(B, S, KV, rep, hd).transpose(0, 2, 3, 1, 4)
        scale = jnp.float32(1.0 / math.sqrt(hd))
        state = (jnp.full((B, KV, rep, S), -1e30, jnp.float32),
                 jnp.zeros((B, KV, rep, S), jnp.float32),
                 jnp.zeros((B, KV, rep, S, hd), jnp.float32))

        max_base = jnp.max(caches.base).astype(jnp.int32)

        def page_body(psize):
            def body(pidx, state):
                start = pidx * psize
                pk = lax.dynamic_slice(
                    caches.k, (layer, zero, zero, start, zero),
                    (1, B, KV, psize, hd))[0]
                pv = lax.dynamic_slice(
                    caches.v, (layer, zero, zero, start, zero),
                    (1, B, KV, psize, hd))[0]
                ridx = start + jnp.arange(psize, dtype=jnp.int32)
                ridx = jnp.broadcast_to(ridx[None, :], (B, psize))
                valid = jnp.broadcast_to(
                    (ridx < caches.base[:, None])[:, None, :],
                    (B, S, psize))
                return _accum_kvmajor(state, q2, pk, pv, valid, scale)
            return body

        big = 8 * page
        if big < cap:
            n_big = max_base // big
            state = lax.fori_loop(0, n_big, page_body(big), state)
            lo = n_big * (big // page)
        else:
            lo = jnp.zeros((), jnp.int32)
        n_pages = (max_base + (page - 1)) // page
        state = lax.fori_loop(lo, n_pages, page_body(page), state)

        # hot block
        qidx = hlen[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(P, dtype=jnp.int32)[None, None, :]
                 <= qidx[:, :, None])
        if hot_major:
            state = _accum_kvmajor(state, q2, hot_k_l, hot_v_l, valid,
                                   scale)
        else:
            kpos = (caches.base[:, None]
                    + jnp.arange(P, dtype=jnp.int32)[None, :])
            state = PG._accum(state, q2, hot_k_l, hot_v_l, kpos, valid,
                              pos, None, None, None, scale)

        m, lsum, acc = state
        out = acc / jnp.maximum(lsum, 1e-30)[..., None]
        out = out.transpose(0, 3, 1, 2, 4).reshape(B, S, H * hd)
        out = linear_apply(p["wo"], out.astype(h.dtype))
        return out, (hot_k_l, hot_v_l, None, None)

    return attn


def chain_decode(params, cfg, caches, *, steps, warmup=4, page=64,
                 attn=None, hot_major=False):
    """No-flush chained decode harness (both legs identical): requires
    steps + warmup <= hot-ring room. Returns tok/s."""
    from bench_batch import patched
    from quip_tpu.models import model as M
    from quip_tpu.models import paged as PG

    B = caches.base.shape[0]
    misc_layers = PG.split_blocks(params)

    with patched(attn=attn):
        @jax.jit
        def ustep(misc, layers, tok, caches):
            # inline unrolled decode step (no capacity-divisibility check:
            # the KV-major caches break the PagedKV.capacity property)
            S = tok.shape[1]
            pos0 = caches.base + caches.hot_len
            positions = pos0[:, None]
            x = M.embed(misc, tok, cfg, positions)
            rope_cs = (M.rope_tables(cfg, positions)
                       if cfg.positions == "rope" else None)
            hot_k, hot_v = [], []
            for li, bp in enumerate(layers):
                hot_l = (caches.hot_k[li], caches.hot_v[li], None, None)
                x, hot_l = PG._block_step(bp, x, jnp.int32(li), caches,
                                          hot_l, positions, rope_cs, cfg,
                                          page, None, None)
                hot_k.append(hot_l[0])
                hot_v.append(hot_l[1])
            logits = M.unembed(misc, x, cfg)
            hot = PG.Hot(jnp.stack(hot_k), jnp.stack(hot_v),
                         caches.hot_len + S, None, None)
            return (jnp.argmax(logits[:, -1, :], -1)[:, None]
                    .astype(jnp.int32), hot)

        tok = jnp.zeros((B, 1), jnp.int32)
        c = caches
        for _ in range(warmup):
            tok, hot = ustep(*misc_layers, tok, c)
            c = PG.advance(c, hot)
        int(tok[0, 0])
        t0 = time.time()
        tok_t, c_t = tok, c
        for _ in range(steps):
            tok_t, hot = ustep(*misc_layers, tok_t, c_t)
            c_t = PG.advance(c_t, hot)
        int(tok_t[0, 0])
        dt = (time.time() - t0) / steps
    return B / dt


def section_kvmajor(packed, cfg):
    from quip_tpu.models import paged as PG

    legs = [("b32 ctx150", 32, 256, 150),
            ("b1 ctx1900", 1, 2048, 1900)]
    if ARGS.smoke:
        legs = [("b4 ctx24", 4, 64, 24)]
    steps, warmup, hot = (56, 4, 64) if not ARGS.smoke else (4, 1, 8)
    for tag, B, cap, ctx in legs:
        caches = prefilled_caches(packed, cfg, B, cap, ctx, hot=hot)
        results = {}
        for name, attn, hm, tr in [
                ("control(std layout)", None, False, False),
                ("kvmajor frozen", make_kvmajor_attention(False), False,
                 True),
                ("kvmajor frozen+hot", make_kvmajor_attention(True), True,
                 True)]:
            c = caches
            if tr:
                c = c._replace(k=jnp.transpose(caches.k, (0, 1, 3, 2, 4)),
                               v=jnp.transpose(caches.v, (0, 1, 3, 2, 4)))
            if hm:
                c = c._replace(
                    hot_k=jnp.transpose(caches.hot_k, (0, 1, 3, 2, 4)),
                    hot_v=jnp.transpose(caches.hot_v, (0, 1, 3, 2, 4)))
            t0 = time.time()
            tps = chain_decode(packed, cfg, c, steps=steps, warmup=warmup,
                               attn=attn, hot_major=hm)
            results[name] = tps
            print(f"kvmajor[{tag}] {name:22s}: {tps:8.1f} tok/s  "
                  f"({1000.0 * B / tps:6.2f} ms/step)  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        # A/B/A drift on the control
        tps = chain_decode(packed, cfg, caches, steps=steps, warmup=warmup)
        print(f"kvmajor[{tag}] control re-run        : {tps:8.1f} tok/s  "
              f"drift {abs(tps-results['control(std layout)']) /              results['control(std layout)']*100:.1f}%", flush=True)


def section_ab(packed, cfg, steps):
    """Shipped-code production paths (bench_decode: one-hot write now)."""
    from bench import bench_decode
    rows = [("b1 empty", 1, 160, 0), ("b8 empty", 8, 256, 0),
            ("b32 empty", 32, 256, 0), ("b32 steady150", 32, 256, 150),
            ("b1 steady1900", 1, 2048, 1900)]
    if ARGS.smoke:
        rows = [("b4 empty", 4, 64, 0)]
    for tag, B, cap, ctx in rows:
        caches = None
        if ctx:
            caches = prefilled_caches(packed, cfg, B, cap, ctx)
        t0 = time.time()
        tps = bench_decode(packed, cfg, steps=steps, batch=B, max_seq=cap,
                           caches=caches)
        print(f"ab {tag:14s}: {tps:8.1f} tok/s  "
              f"({1000.0 * B / tps:6.2f} ms/step)  ({time.time()-t0:.0f}s)",
              flush=True)


def section_int8batch(packed, cfg, steps):
    """int8 KV at batch: the b32 steady step is cache-bandwidth-bound
    (page loop ~90% of roofline, kvmajor A/B null — docs/PERF.md r4), so
    halving cache bytes is the remaining lever. b32 cap-256 bf16 vs int8,
    empty and steady-150."""
    from bench import bench_decode
    for ctx in (0, 150):
        for kvq in (False, True):
            caches = (prefilled_caches(packed, cfg, 32, 256, ctx,
                                       kv_quant=kvq) if ctx else None)
            t0 = time.time()
            tps = bench_decode(packed, cfg, steps=steps, batch=32,
                               max_seq=256, kv_quant=kvq, caches=caches)
            print(f"int8batch b32 ctx={ctx:3d} "
                  f"kv={'int8' if kvq else 'bf16'}: {tps:8.1f} tok/s  "
                  f"({1000.0 * 32 / tps:6.2f} ms/step)  "
                  f"({time.time()-t0:.0f}s)", flush=True)
            del caches


def section_hotsweep(packed, cfg, steps):
    """Hot-ring size at batch, POST-scatter-fix: the r1 sweep (b32
    hot{8,16,32,64} = 1731/1876/1901/1841) was taken when the per-slot
    scatter dominated; with the one-hot write the ring's in/out traffic
    (O(B x hot) per step) is a bigger relative share, so smaller rings
    may win now."""
    from bench import bench_decode
    for ctx in (0, 150):
        for hot in (8, 16, 32, 64):
            caches = (prefilled_caches(packed, cfg, 32, 256, ctx, hot=hot)
                      if ctx else None)
            tps = bench_decode(packed, cfg, steps=steps, batch=32,
                               max_seq=256, hot=hot, caches=caches)
            print(f"hotsweep b32 ctx={ctx:3d} hot={hot:2d}: "
                  f"{tps:8.1f} tok/s", flush=True)
            del caches


def section_13b(steps, holder=None):
    """13B serving tier after the scatter-write fix: b1 unrolled, b32
    scan-fallback bf16, b32 int8+unrolled (r3 band: 158.7 / 1216 / 1127
    — the one-hot write applies to BOTH step forms). holder: the main
    7B model dict — freed first (13B b32 caches + weights need ~12 GB;
    holding the 7B alongside OOM'd this section in session 3)."""
    import gc
    if holder:
        holder.clear()
        gc.collect()
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from bench import bench_decode
    from quip_tpu.models import get_config

    cfg13 = replace(get_config("llama-2-13b"), dtype="bfloat16")
    t0 = time.time()
    p13 = _packed_llama(cfg13, bits=2, seed=0, head_bits=2)
    jax.block_until_ready(jax.tree.leaves(p13)[0])
    print(f"# built 13B packed in {time.time()-t0:.0f}s", flush=True)
    rows = [("b1 unrolled", dict(batch=1, max_seq=160, unroll=True)),
            ("b32 scan bf16", dict(batch=32, max_seq=256, unroll=False)),
            ("b32 unrolled int8", dict(batch=32, max_seq=256, unroll=True,
                                       kv_quant=True))]
    for tag, kw in rows:
        try:
            t0 = time.time()
            tps = bench_decode(p13, cfg13, steps=steps, **kw)
            print(f"13b {tag:18s}: {tps:8.1f} tok/s  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"13b {tag} FAILED (continuing)", flush=True)


def section_longctx(packed, cfg, steps):
    from bench import bench_decode
    cap = 8192 + 64
    ctxs = (2048, 4096, 7936) if not ARGS.smoke else (512,)
    for kvq in (False, True):
        for ctx in ctxs:
            try:
                assert ctx + steps + 8 <= cap
                t0 = time.time()
                caches = prefilled_caches(packed, cfg, 1, cap, ctx,
                                          kv_quant=kvq)
                tpre = time.time() - t0
                tps = bench_decode(packed, cfg, steps=steps, batch=1,
                                   max_seq=cap, kv_quant=kvq,
                                   caches=caches)
                print(f"longctx ctx={ctx:5d} "
                      f"kv={'int8' if kvq else 'bf16'}: {tps:6.1f} tok/s"
                      f"  (prefill {tpre:.1f}s)", flush=True)
                del caches
            except Exception:
                traceback.print_exc()
                print(f"longctx ctx={ctx} kvq={kvq} FAILED (continuing)",
                      flush=True)


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config

    sections = ARGS.sections.split(",")
    print(f"backend: {jax.default_backend()}  sections: {sections}",
          flush=True)
    if ARGS.smoke:
        cfg = replace(get_config("llama-tiny"), dtype="bfloat16")
        steps = 8
    else:
        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
        steps = 96

    holder = {}
    if sections != ["13b"]:
        t0 = time.time()
        holder["p"] = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        jax.block_until_ready(jax.tree.leaves(holder["p"])[0])
        print(f"# built packed in {time.time()-t0:.0f}s", flush=True)
    packed = holder.get("p")

    if ARGS.smoke:
        _smoke_check(packed, cfg)

    for name, fn in [
        ("ab", lambda: section_ab(packed, cfg, steps)),
        ("kvmajor", lambda: section_kvmajor(packed, cfg)),
        ("int8batch", lambda: section_int8batch(packed, cfg, steps)),
        ("longctx", lambda: section_longctx(packed, cfg, steps)),
        ("hotsweep", lambda: section_hotsweep(packed, cfg, steps)),
        ("13b", lambda: section_13b(steps, holder)),
    ]:
        if name not in sections:
            continue
        print(f"\n=== section {name} ===", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"=== section {name} FAILED (continuing) ===", flush=True)
    print("\nDONE", flush=True)


def _smoke_check(packed, cfg):
    """KV-major attention must agree with the production step."""
    from quip_tpu.models import paged as PG

    B = 4
    caches = PG.init_paged(B, 64, cfg, dtype=jnp.bfloat16, hot=8, page=8)
    caches = caches._replace(base=jnp.full((B,), 11, jnp.int32),
                             hot_len=jnp.full((B,), 2, jnp.int32))
    tok = jnp.asarray(np.arange(B)[:, None] + 3, jnp.int32)
    want, want_hot = jax.jit(
        lambda p, t, c: PG.paged_decode_step(p, t, c, cfg, page=8))(
            packed, tok, caches)

    from bench_batch import patched
    for hm in (False, True):
        c = caches._replace(k=jnp.transpose(caches.k, (0, 1, 3, 2, 4)),
                            v=jnp.transpose(caches.v, (0, 1, 3, 2, 4)))
        if hm:
            c = c._replace(
                hot_k=jnp.transpose(caches.hot_k, (0, 1, 3, 2, 4)),
                hot_v=jnp.transpose(caches.hot_v, (0, 1, 3, 2, 4)))
        attn = make_kvmajor_attention(hm)
        from quip_tpu.models import model as M
        misc_layers = PG.split_blocks(packed)
        with patched(attn=attn):
            def step(misc, layers, tok, cc):
                pos = (cc.base + cc.hot_len)[:, None]
                x = M.embed(misc, tok, cfg, pos)
                rcs = M.rope_tables(cfg, pos)
                for li, bp in enumerate(layers):
                    hot_l = (cc.hot_k[li], cc.hot_v[li], None, None)
                    x, hot_l = PG._block_step(bp, x, jnp.int32(li), cc,
                                              hot_l, pos, rcs, cfg, 8,
                                              None, None)
                return M.unembed(misc, x, cfg)[:, -1, :]
            got = jax.jit(step)(*misc_layers, tok, c)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        assert err < 1e-2, (hm, err)
        print(f"smoke kvmajor hot_major={hm}: match (err {err:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
