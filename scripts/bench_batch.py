"""Batched-decode phase attribution (real chip, run ALONE — CLAUDE.md).

VERDICT r3 weak #1: b32 7B 2-bit decodes at ~16.5 ms/step against a
~2.7 ms weight-stream floor — where do the other ~13 ms go?  The
b1/b8/b32 numbers (280 / 1266-1315 / 1938 tok/s) fit cost ≈ 3.2 ms +
0.39 ms·B almost exactly, so the gap is LINEAR IN BATCH.  Prime suspect:
the hot-ring write is `jax.vmap(lax.dynamic_update_slice)` with per-slot
start indices, which XLA lowers to a scatter — TPU scatters with batched
indices can serialize per index (B × L × 2 arrays of small ops).

Variants (monkeypatched attention, llama/fp-cache/no-prefix specialized):
  A        baseline (exact copy of models/paged._paged_attention behavior)
  UHOT     hot write as ONE dynamic_update_slice at the (uniform) scalar
           hlen[0] — the scatter-free ceiling, valid when slots advance in
           lockstep (true in this bench and in steady serving)
  SELHOT   hot write as a one-hot einsum + where (no scatter, no gather)
           — divergence-safe: works for per-slot hlen and S>1 windows
  NOPAGE   frozen-arena page loops skipped (attend hot ring only)
  GUT      attention gutted to qkv+rope+hot-write+wo (bench_step's D)
  NOHEAD   unembed replaced by a broadcast (isolates lm_head+argmax)
  L8       8-layer model (per-layer slope / fixed cost split)

Each at batch 32 and 8, empty-cache (headline cadence) and, for the
load-bearing ones, steady-state with 150 tokens prefilled (page loops
streaming real context).  Plus: flush cost (slope), packed-kernel
microbench at B ∈ {1, 8, 32}, and the long-context bf16-vs-int8-KV
steady sweep at ctx ∈ {2048, 4096, 8000} (VERDICT r3 item 4).

Round-4 session 2's harness (bench_batch2.py) is folded in as extra
sections — the ONE batched-attribution harness (VERDICT r4 weak #7b):
  kvmajor    frozen arena / hot ring transposed to (…, KV, T, hd) so the
             attention dot needs no relayout (measured NULL r4; kept for
             re-runs on new hardware)
  int8batch  b32 bf16 vs int8 KV, empty + steady-150
  hotsweep   hot-ring size sweep at b32 post-scatter-fix
  13b        13B serving tier (b1 unrolled / b32 scan / b32 int8)

Methodology: bench.py chained-dispatch loop (96 steps, hard host-read
sync), A/B/A drift checks; slope method for sub-dispatch costs.
"""
from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("bench_batch")
_ap.add_argument("--smoke", action="store_true",
                 help="CPU smoke: tiny model, checks variant numerics")
_ap.add_argument("--sections", default="batch,flush,kernel,longctx")
_ap.add_argument("--steps", type=int, default=96)
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


# ---------------------------------------------------------------------------
# Parameterized attention (specialized: fused wqkv + rope + fp cache,
# no prefix/alibi/int8 — exactly the bench configuration)
# ---------------------------------------------------------------------------


def make_attention(hot_write="vmap", skip_pages=False, gut=False):
    from quip_tpu.models import model as M
    from quip_tpu.models import paged as PG
    from quip_tpu.ops.qlinear import linear_apply

    def attn(p, h, cfg, layer, caches, hot_l, pos, rope_cs, page,
             prefix_l=None, pre_len=None):
        assert prefix_l is None and pre_len is None
        B, S, D = h.shape
        H, KV, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
        rep = H // KV
        hot_k_l, hot_v_l, hks_l, hvs_l = hot_l
        assert hks_l is None
        P = hot_k_l.shape[1]

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

        if hot_write == "vmap":          # production behavior (baseline)
            def upd(arr_b, new_b, at):
                return lax.dynamic_update_slice(
                    arr_b, new_b.astype(arr_b.dtype), (at, zero, zero))
            hot_k_l = jax.vmap(upd)(hot_k_l, k, hlen)
            hot_v_l = jax.vmap(upd)(hot_v_l, v, hlen)
        elif hot_write == "uniform":     # ONE slice at scalar hlen[0]
            h0 = hlen[0]
            hot_k_l = lax.dynamic_update_slice(
                hot_k_l, k.astype(hot_k_l.dtype), (zero, h0, zero, zero))
            hot_v_l = lax.dynamic_update_slice(
                hot_v_l, v.astype(hot_v_l.dtype), (zero, h0, zero, zero))
        elif hot_write == "onehot":      # scatter-free, divergence-safe
            ridx = jnp.arange(P, dtype=jnp.int32)[None, :]        # (1, P)
            j = ridx - hlen[:, None]                              # (B, P)
            W = ((j >= 0) & (j < S)).astype(hot_k_l.dtype)        # (B, P)
            sel = W[:, :, None, None] > 0
            oh = jax.nn.one_hot(jnp.clip(j, 0, S - 1), S,
                                dtype=hot_k_l.dtype) * W[..., None]
            gk = jnp.einsum("bps,bskd->bpkd", oh, k.astype(hot_k_l.dtype))
            gv = jnp.einsum("bps,bskd->bpkd", oh, v.astype(hot_v_l.dtype))
            hot_k_l = jnp.where(sel, gk, hot_k_l)
            hot_v_l = jnp.where(sel, gv, hot_v_l)
        else:
            raise ValueError(hot_write)

        if gut:
            out = q.reshape(B, S, H * hd) * jnp.asarray(
                1.0 / math.sqrt(hd), q.dtype)
            out = linear_apply(p["wo"], out)
            return out, (hot_k_l, hot_v_l, None, None)

        q2 = q.reshape(B, S, KV, rep, hd).transpose(0, 2, 3, 1, 4)
        scale = jnp.float32(1.0 / math.sqrt(hd))
        state = (jnp.full((B, KV, rep, S), PG._NEG, jnp.float32),
                 jnp.zeros((B, KV, rep, S), jnp.float32),
                 jnp.zeros((B, KV, rep, S, hd), jnp.float32))

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
                ridx = start + jnp.arange(psize, dtype=jnp.int32)
                ridx = jnp.broadcast_to(ridx[None, :], (B, psize))
                valid = jnp.broadcast_to(
                    (ridx < caches.base[:, None])[:, None, :],
                    (B, S, psize))
                return PG._accum(state, q2, pk, pv, ridx, valid, pos, None,
                                 None, None, scale)
            return body

        if not skip_pages:
            big = 8 * page
            if big < caches.capacity:
                n_big = max_base // big
                state = lax.fori_loop(0, n_big, page_body(big), state)
                lo = n_big * (big // page)
            else:
                lo = jnp.zeros((), jnp.int32)
            n_pages = (max_base + (page - 1)) // page
            state = lax.fori_loop(lo, n_pages, page_body(page), state)

        kpos = (caches.base[:, None]
                + jnp.arange(P, dtype=jnp.int32)[None, :])
        qidx = hlen[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(P, dtype=jnp.int32)[None, None, :]
                 <= qidx[:, :, None])
        state = PG._accum(state, q2, hot_k_l, hot_v_l, kpos, valid, pos,
                          None, None, None, scale)

        m, lsum, acc = state
        out = acc / jnp.maximum(lsum, 1e-30)[..., None]
        out = out.transpose(0, 3, 1, 2, 4).reshape(B, S, H * hd)
        out = out.astype(h.dtype)
        out = linear_apply(p["wo"], out) + p.get("bo", 0.0)
        return out, (hot_k_l, hot_v_l, None, None)

    return attn


class patched:
    """Context manager: swap PG._paged_attention (and opt. M.unembed)."""

    def __init__(self, attn=None, nohead=False):
        self.attn = attn
        self.nohead = nohead

    def __enter__(self):
        from quip_tpu.models import model as M
        from quip_tpu.models import paged as PG
        self.PG, self.M = PG, M
        self.orig_attn = PG._paged_attention
        self.orig_unembed = M.unembed
        if self.attn is not None:
            PG._paged_attention = self.attn
        if self.nohead:
            def fake_unembed(params, x, cfg):
                B, S, _ = x.shape
                return jnp.broadcast_to(
                    x[:, :, :1].astype(jnp.float32),
                    (B, S, cfg.vocab_size))
            M.unembed = fake_unembed
        return self

    def __exit__(self, *exc):
        self.PG._paged_attention = self.orig_attn
        self.M.unembed = self.orig_unembed
        return False


# ---------------------------------------------------------------------------
# Runners
# ---------------------------------------------------------------------------


def prefilled_caches(params, cfg, batch, cap, ctx, kv_quant=False,
                     hot=32, page=64):
    from quip_tpu.models import paged as PG
    caches = PG.init_paged(batch, cap, cfg, dtype=jnp.bfloat16,
                           quantized=kv_quant, hot=hot, page=page)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, 1000, (batch, ctx)), jnp.int32)
    plen = jnp.full((batch,), ctx, jnp.int32)
    _, caches = jax.jit(
        lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg),
        donate_argnums=3)(params, toks, plen, caches)
    jax.block_until_ready(caches.k)
    return caches


def section_batch(packed, packed8, cfg, cfg8, steps):
    """Phase attribution at batch."""
    from bench import bench_decode

    def run(tag, B, *, attn=None, nohead=False, ctx=0, params=None,
            c=None, cap=256):
        params = packed if params is None else params
        cc = c if c is not None else cfg
        t0 = time.time()
        caches = None
        if ctx:
            # steady-state: page loops stream real context
            assert ctx + steps + 8 <= cap, (ctx, steps, cap)
            caches = prefilled_caches(params, cc, B, cap, ctx)
        with patched(attn=attn, nohead=nohead):
            tps = bench_decode(params, cc, steps=steps, batch=B,
                               max_seq=cap, caches=caches)
        ms = 1000.0 * B / tps
        print(f"{tag:34s} B={B:2d}: {tps:8.1f} tok/s  {ms:7.2f} ms/step"
              f"   ({time.time()-t0:.0f}s)", flush=True)
        return tps

    A = make_attention()                      # faithful copy
    UH = make_attention(hot_write="uniform")
    SEL = make_attention(hot_write="onehot")
    NOPG = make_attention(skip_pages=True)
    GUT = make_attention(gut=True)
    SELNOPG = make_attention(hot_write="onehot", skip_pages=True)

    out = {}
    # --- b32, empty-cache (the headline batched cadence)
    out["a32"] = run("A  copy-baseline", 32, attn=A)
    out["prod32"] = run("A0 production (unpatched)", 32)
    out["uh32"] = run("UHOT uniform-slice write", 32, attn=UH)
    out["sel32"] = run("SELHOT one-hot write", 32, attn=SEL)
    out["nopg32"] = run("NOPAGE no frozen loop", 32, attn=NOPG)
    out["gut32"] = run("GUT attention gutted", 32, attn=GUT)
    out["nohead32"] = run("NOHEAD fake unembed", 32, attn=A, nohead=True)
    out["l8"] = run("L8 8-layer (slope)", 32, attn=A, params=packed8,
                    c=cfg8)
    # --- steady-state at ctx 150 (pages really stream)
    out["a32s"] = run("A  steady ctx=150", 32, attn=A, ctx=150)
    out["sel32s"] = run("SELHOT steady ctx=150", 32, attn=SEL, ctx=150)
    out["selnopg32s"] = run("SELHOT+NOPAGE steady", 32, attn=SELNOPG,
                            ctx=150)
    # --- b8
    out["a8"] = run("A  copy-baseline", 8, attn=A)
    out["uh8"] = run("UHOT uniform-slice write", 8, attn=UH)
    out["sel8"] = run("SELHOT one-hot write", 8, attn=SEL)
    out["gut8"] = run("GUT attention gutted", 8, attn=GUT)
    # --- b1 sanity (does SELHOT regress single-stream?)
    out["a1"] = run("A  copy-baseline", 1, attn=A)
    out["sel1"] = run("SELHOT one-hot write", 1, attn=SEL)
    # --- drift check
    out["a32x"] = run("A' drift re-run", 32, attn=A)

    ms32, ms8l = 32e3 / out["a32"], 32e3 / out["l8"]
    per_layer = (ms32 - ms8l) / 24
    print(f"\nb32 per-layer {per_layer*1000:.0f} us, fixed "
          f"{ms8l - 8*per_layer:.2f} ms; drift "
          f"{abs(out['a32x']-out['a32'])/out['a32']*100:.1f}%", flush=True)
    return out


def section_flush(packed, cfg, steps):
    """Flush cost at b32 cap 256 (slope over chained flushes)."""
    from quip_tpu.models import paged as PG
    caches = PG.init_paged(32, 256, cfg, dtype=jnp.bfloat16, hot=32,
                           page=64)
    caches = caches._replace(base=jnp.full((32,), 64, jnp.int32),
                             hot_len=jnp.full((32,), 32, jnp.int32))

    @jax.jit
    def nflush(c, n):
        # keep base fixed so every iteration copies the same shapes
        def body(i, c):
            f = PG.flush_hot(c)
            return f._replace(base=c.base, hot_len=c.hot_len)
        return lax.fori_loop(0, n, body, c)

    jax.block_until_ready(nflush(caches, jnp.int32(2)).k)
    ts = []
    for n1, n2 in [(4, 24)] * 3:
        t0 = time.time()
        jax.block_until_ready(nflush(caches, jnp.int32(n1)).k)
        t1 = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(nflush(caches, jnp.int32(n2)).k)
        t2 = time.time() - t0
        ts.append((t2 - t1) / (n2 - n1))
    t = sorted(ts)[1]
    gb = 2 * 2 * caches.k.size * 2 / 1e9     # r+w, k+v, bf16
    print(f"flush b32 cap256: {t*1e3:.2f} ms ({gb/t:.0f} GB/s eff, "
          f"amortized {t*1e3/32:.3f} ms/step at hot=32)", flush=True)


def section_kernel(smoke=False):
    """Packed-matmul micro at B in {1, 8, 32}: does the kernel itself
    scale with batch? (Expected: no — weight-stream-bound.)"""
    from bench_kernel import slope_time
    from quip_tpu.kernels.dequant_matmul import dequant_matmul
    from quip_tpu.pack.format import pack_codes

    rng = np.random.default_rng(0)
    shapes = [(12288, 4096), (4096, 11008)]
    if smoke:
        shapes = [(256, 256)]
    for m, d in shapes:
        codes = jnp.asarray(rng.integers(0, 4, size=(m, d)), jnp.int32)
        planes = tuple(jax.device_put(p) for p in pack_codes(codes, 2))
        pbytes = sum(p.size * 4 for p in planes)
        for B in (1, 8, 32):
            x0 = jnp.asarray(rng.standard_normal((B, d)), jnp.bfloat16)
            fn = lambda x: dequant_matmul(x, planes, jnp.float32(0.02),
                                          None, bits=2, qfn="b")
            t = slope_time(fn, x0, d, m, n1=50, n2=400, reps=3) \
                if not smoke else slope_time(fn, x0, d, m, 2, 8, 1)
            print(f"kernel ({m},{d}) B={B:2d}: {t*1e6:7.1f} us  "
                  f"{pbytes/t/1e9:6.1f} GB/s", flush=True)


def section_longctx(packed, cfg, steps):
    """Steady-state decode at long context: bf16 vs int8 KV (VERDICT #4).

    One cap (8192+) so all ctx rows share a compiled program per
    precision; cost should follow USED context (the paged design's
    pitch), and int8's cache-read savings should grow with ctx. ctx 8000
    is deliberately NOT a 256 multiple: since round 5 the flash-prefill
    wrapper pads internally (the r4 session saw 8000 fall to the dense
    path and OOM — VERDICT weak #5), so this row doubles as the on-chip
    regression check for that fix. Per-row try/except: one OOM must not
    kill the section."""
    from bench import bench_decode
    cap = 8192 + 64
    ctxs = (2048, 4096, 8000) if not ARGS.smoke else (512,)
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


# ---------------------------------------------------------------------------
# Sections folded in from the retired bench_batch2.py (round-4 session 2:
# SELHOT verification, KV-major layout probe — measured NULL, kept for
# re-runs on new hardware — int8-at-batch, hot sweep, 13B tier).
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
        ctl = results["control(std layout)"]
        print(f"kvmajor[{tag}] control re-run        : {tps:8.1f} tok/s  "
              f"drift {abs(tps - ctl) / ctl * 100:.1f}%", flush=True)


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


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config

    sections = ARGS.sections.split(",")
    print(f"backend: {jax.default_backend()}  sections: {sections}",
          flush=True)

    if ARGS.smoke:
        cfg = replace(get_config("llama-tiny"), dtype="bfloat16")
        cfg8 = replace(cfg, n_layers=2)
        steps = 8
    else:
        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
        cfg8 = replace(cfg, n_layers=8)
        steps = ARGS.steps

    # holder lets section_13b free the 7B model first (13B b32 caches +
    # weights need ~12 GB; holding the 7B alongside OOM'd in round 4)
    holder = {}
    if sections != ["13b"]:
        t0 = time.time()
        holder["p"] = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        jax.block_until_ready(jax.tree.leaves(holder["p"])[0])
        print(f"# built packed in {time.time()-t0:.0f}s", flush=True)
    packed = holder.get("p")

    if ARGS.smoke:
        _smoke_check(packed, cfg)

    packed8 = None
    if "batch" in sections:
        t0 = time.time()
        packed8 = _packed_llama(cfg8, bits=2, seed=0, head_bits=2)
        print(f"# built {cfg8.n_layers}-layer in {time.time()-t0:.0f}s",
              flush=True)

    for name, fn in [
        ("batch", lambda: section_batch(packed, packed8, cfg, cfg8, steps)),
        ("flush", lambda: section_flush(packed, cfg, steps)),
        ("kernel", lambda: section_kernel(smoke=ARGS.smoke)),
        ("longctx", lambda: section_longctx(packed, cfg, steps)),
        ("kvmajor", lambda: section_kvmajor(packed, cfg)),
        ("int8batch", lambda: section_int8batch(packed, cfg, steps)),
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
    """CPU numerics: every variant's logits match the production step
    where semantics should be identical (uniform hlen)."""
    from quip_tpu.models import paged as PG

    B = 4
    caches = PG.init_paged(B, 64, cfg, dtype=jnp.bfloat16, hot=8, page=8)
    caches = caches._replace(base=jnp.full((B,), 11, jnp.int32),
                             hot_len=jnp.full((B,), 2, jnp.int32))
    tok = jnp.asarray(np.arange(B)[:, None] + 3, jnp.int32)
    want, want_hot = jax.jit(
        lambda p, t, c: PG.paged_decode_step(p, t, c, cfg, page=8))(
            packed, tok, caches)
    for name, attn in [("copy", make_attention()),
                       ("uniform", make_attention(hot_write="uniform")),
                       ("onehot", make_attention(hot_write="onehot"))]:
        with patched(attn=attn):
            got, got_hot = jax.jit(
                lambda p, t, c: PG.paged_decode_step(p, t, c, cfg,
                                                     page=8))(
                    packed, tok, caches)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        herr = float(jnp.max(jnp.abs(
            got_hot.k.astype(jnp.float32) - want_hot.k.astype(jnp.float32))))
        assert err < 1e-3 and herr < 1e-3, (name, err, herr)
        print(f"smoke {name}: logits/hot match (err {err:.2e}/{herr:.2e})",
              flush=True)
    # divergent hlen: onehot must still match production
    caches2 = caches._replace(hot_len=jnp.asarray([0, 1, 2, 3], jnp.int32))
    want2, wh2 = jax.jit(
        lambda p, t, c: PG.paged_decode_step(p, t, c, cfg, page=8))(
            packed, tok, caches2)
    with patched(attn=make_attention(hot_write="onehot")):
        got2, gh2 = jax.jit(
            lambda p, t, c: PG.paged_decode_step(p, t, c, cfg, page=8))(
                packed, tok, caches2)
    err = float(jnp.max(jnp.abs(got2.astype(jnp.float32)
                                - want2.astype(jnp.float32))))
    herr = float(jnp.max(jnp.abs(
        gh2.k.astype(jnp.float32) - wh2.k.astype(jnp.float32))))
    assert err < 1e-3 and herr < 1e-3, ("onehot-divergent", err, herr)
    print(f"smoke onehot-divergent: match (err {err:.2e}/{herr:.2e})",
          flush=True)

    # KV-major attention must agree with the production step too
    from quip_tpu.models import model as M
    misc_layers = PG.split_blocks(packed)
    for hm in (False, True):
        c = caches._replace(k=jnp.transpose(caches.k, (0, 1, 3, 2, 4)),
                            v=jnp.transpose(caches.v, (0, 1, 3, 2, 4)))
        if hm:
            c = c._replace(
                hot_k=jnp.transpose(caches.hot_k, (0, 1, 3, 2, 4)),
                hot_v=jnp.transpose(caches.hot_v, (0, 1, 3, 2, 4)))
        with patched(attn=make_kvmajor_attention(hm)):
            def step(misc, layers, tok, cc):
                pos = (cc.base + cc.hot_len)[:, None]
                x = M.embed(misc, tok, cfg, pos)
                rcs = M.rope_tables(cfg, pos)
                for li, bp in enumerate(layers):
                    hot_l = (cc.hot_k[li], cc.hot_v[li], None, None)
                    x, _ = PG._block_step(bp, x, jnp.int32(li), cc,
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
