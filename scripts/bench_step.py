"""Decode-step decomposition bench (real chip, run ALONE — CLAUDE.md).

Where do the ~3 ms/step of non-weight-read time go at batch 1?
Hypothesis: op-launch latency in the paged attention — fori_loop page
iterations, per-layer recomputed index/mask ops, and the multi-block
online-softmax chain — dominates the 58 us/layer "cache/misc" bucket
(docs/PERF.md cost model).

Measures tok/s for:
  A  baseline           page=64 hot=32 (headline config)
  B  single-page        page=192 (capacity = one page -> 1 fori iteration)
  C  small hot ring     page=64 hot=16
  D  no-attention       _paged_attention gutted to qkv+wo matmuls only
                        (upper bound: matmuls+norms+rotations+head)
  E  8-layer model      per-layer cost = (t32 - t8) / 24

Methodology: bench.py's chained-dispatch loop (96 steps, hard host-read
sync); A re-run at the end for drift (A/B/A).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from bench import bench_decode
    from quip_tpu.models import get_config
    from quip_tpu.models import paged as PG

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built packed in {time.time()-t0:.0f}s", file=sys.stderr)

    def run(tag, **kw):
        t0 = time.time()
        tps = bench_decode(packed, cfg, steps=96, **kw)
        print(f"{tag}: {tps:.1f} tok/s   ({time.time()-t0:.0f}s)",
              flush=True)
        return tps

    a1 = run("A  baseline page=64 hot=32")
    run("B  single-page page=192", page=192)
    run("C  hot=16", hot=16)

    # D: gut the attention inner (keep qkv matmul + rope + hot write + wo)
    orig = PG._paged_attention

    def gutted(p, h, cfg_, layer, caches, hot_l, pos, rope_cs, page,
               prefix_l=None, pre_len=None):
        import math as _m
        from quip_tpu.models import model as M
        from quip_tpu.ops.qlinear import linear_apply
        B, S, D = h.shape
        H, KV, hd = cfg_.n_heads, cfg_.kv_heads, cfg_.hd
        hot_k_l, hot_v_l, hks_l, hvs_l = hot_l
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

        def upd(arr_b, new_b, at):
            return jax.lax.dynamic_update_slice(
                arr_b, new_b.astype(arr_b.dtype), (at, zero, zero))

        hot_k_l = jax.vmap(upd)(hot_k_l, k, hlen)
        hot_v_l = jax.vmap(upd)(hot_v_l, v, hlen)
        out = q.reshape(B, S, H * hd) * jnp.float32(1 / _m.sqrt(hd)).astype(
            q.dtype)
        out = linear_apply(p["wo"], out)
        return out, (hot_k_l, hot_v_l, None, None)

    PG._paged_attention = gutted
    try:
        run("D  no-attention (matmul+norm+rot+head only)")
    finally:
        PG._paged_attention = orig

    # E: 8-layer model for per-layer slope
    cfg8 = replace(cfg, n_layers=8)
    t0 = time.time()
    packed8 = _packed_llama(cfg8, bits=2, seed=0, head_bits=2)
    print(f"# built 8-layer in {time.time()-t0:.0f}s", file=sys.stderr)
    t8 = bench_decode(packed8, cfg8, steps=96)
    print(f"E  8-layer: {t8:.1f} tok/s", flush=True)
    del packed8

    a2 = run("A' baseline re-run (drift check)")
    ms32, ms8 = 1000.0 / a1, 1000.0 / t8
    print(f"per-layer: {(ms32 - ms8) / 24 * 1000:.1f} us; "
          f"fixed: {ms8 - 8 * (ms32 - ms8) / 24:.2f} ms; "
          f"drift {abs(a2 - a1) / a1 * 100:.1f}%")


if __name__ == "__main__":
    main()
