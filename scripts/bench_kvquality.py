"""int8-KV quality bound (VERDICT r4 weak #4).

--kv_quant is recommended for batched serving and >= 2k ctx on perf
evidence (+9-17%); this harness puts a QUALITY bound next to that
guidance. It measures, against an f32-cache reference on the SAME
serving write/read path (paged hot-ring appends + flushes — not the
dense eval path, which never touches the cache):

  nll    teacher-forced NLL of a self-generated continuation under
         f32 / bf16 / int8 caches: the serving analog of a ppl delta.
         Self-generated text (greedy from the model's own distribution)
         is the structured case; uniform-random tokens the adversarial
         one.
  drift  per-position logits divergence curve over a long forced
         sequence (mean/max abs diff, argmax agreement) — accumulated
         degradation over 512+ tokens, not just the one-step ~0.4%
         elementwise bound the tests pin.

CPU (default, hermetic): tiny + opt-125m-shaped random-init models.
Chip (--chip, run ALONE per CLAUDE.md): 7B 2-bit packed shapes.
Random weights bound the MECHANISM (quantization noise accumulation
through the serving path); the real-weights run on mount follows
docs/ACCEPT.md.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("bench_kvquality")
_ap.add_argument("--chip", action="store_true",
                 help="run the 7B legs on the real TPU (run ALONE)")
_ap.add_argument("--T", type=int, default=512)
ARGS = _ap.parse_args()

import os  # noqa: E402

if not ARGS.chip:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if not ARGS.chip:
    jax.config.update("jax_platforms", "cpu")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


def _modes(dtype):
    return [("f32", dict(dtype=jnp.float32, quantized=False)),
            ("bf16", dict(dtype=jnp.bfloat16, quantized=False)),
            ("int8", dict(dtype=dtype, quantized=True))]


def forced_logits(params, cfg, toks, *, dtype=jnp.float32,
                  quantized=False, hot=32, page=64, W=16):
    """Teacher-force `toks` (B, T) through the SERVING cache path:
    W-token hot-ring appends with flushes, exactly like chunked-prefill
    admission / spec verify windows. Returns logits (B, T, V) f32."""
    from quip_tpu.models import paged as PG

    B, T = toks.shape
    assert T % W == 0
    caches = PG.init_paged(B, T + hot, cfg, dtype=dtype,
                           quantized=quantized, hot=hot, page=page)
    split = PG.as_split(params)
    append = jax.jit(lambda sp, t, c: PG.paged_append_any(
        sp, t, c, cfg, page=page))
    flush = jax.jit(PG.flush_hot)
    out = []
    for pos in range(0, T, W):
        hl = int(np.asarray(caches.hot_len).max())
        if hl + W > hot:
            caches = flush(caches)
        lg, hot_s = append(split, toks[:, pos:pos + W], caches)
        caches = PG.advance(caches, hot_s)
        out.append(np.asarray(lg, np.float32))
    return np.concatenate(out, axis=1)


def greedy_reference(params, cfg, seed_toks, T, hot=32, page=64):
    """Greedy continuation of seed_toks under the f32 cache (the
    reference stream every mode is teacher-forced on)."""
    from quip_tpu.models import paged as PG

    B = seed_toks.shape[0]
    caches = PG.init_paged(B, T + len(seed_toks[0]) + hot, cfg,
                           dtype=jnp.float32, hot=hot, page=page)
    split = PG.as_split(params)
    append = jax.jit(lambda sp, t, c: PG.paged_append_any(
        sp, t, c, cfg, page=page))
    flush = jax.jit(PG.flush_hot)
    lg, hot_s = append(split, jnp.asarray(seed_toks), caches)
    caches = PG.advance(caches, hot_s)
    tok = np.asarray(jnp.argmax(lg[:, -1], -1), np.int32)[:, None]
    toks = [tok]
    for _ in range(T - 1):
        if int(np.asarray(caches.hot_len).max()) + 1 > hot:
            caches = flush(caches)
        lg, hot_s = append(split, jnp.asarray(tok), caches)
        caches = PG.advance(caches, hot_s)
        tok = np.asarray(jnp.argmax(lg[:, -1], -1), np.int32)[:, None]
        toks.append(tok)
    return np.concatenate(toks, axis=1)          # (B, T)


def nll(logits, toks):
    """Mean NLL of toks[:, 1:] under logits[:, :-1] (f32, stable)."""
    lg = logits[:, :-1].astype(np.float64)
    lg = lg - lg.max(-1, keepdims=True)
    lse = np.log(np.exp(lg).sum(-1))
    tgt = np.take_along_axis(lg, toks[:, 1:, None].astype(np.int64),
                             axis=2)[..., 0]
    return float(np.mean(lse - tgt))


def drift_report(tag, ref, got, toks):
    """Per-position-bucket divergence of `got` vs the f32 reference."""
    T = ref.shape[1]
    agree = (ref.argmax(-1) == got.argmax(-1))
    print(f"  {tag}: argmax agreement {agree.mean()*100:.2f}%  "
          f"dNLL {nll(got, toks) - nll(ref, toks):+.5f}", flush=True)
    for lo, hi in [(0, 32), (32, 128), (128, 256), (256, T)]:
        if lo >= T:
            break
        hi = min(hi, T)
        d = np.abs(got[:, lo:hi] - ref[:, lo:hi])
        scale = np.abs(ref[:, lo:hi]).mean() + 1e-9
        print(f"    pos [{lo:4d},{hi:4d}): mean|d| {d.mean():.4e}  "
              f"max|d| {d.max():.4e}  rel {d.mean()/scale*100:.3f}%  "
              f"agree {agree[:, lo:hi].mean()*100:.2f}%", flush=True)


def run_model(name, params, cfg, T, B=2):
    print(f"\n=== {name} (T={T}, B={B}) ===", flush=True)
    rng = np.random.default_rng(0)
    seed_toks = rng.integers(1, min(1000, cfg.vocab_size - 1),
                             (B, 8)).astype(np.int32)
    t0 = time.time()
    gen = greedy_reference(params, cfg, seed_toks, T)
    print(f"# greedy reference stream in {time.time()-t0:.0f}s",
          flush=True)
    datasets = [("self-gen", np.concatenate(
        [seed_toks, gen], axis=1)[:, :T - T % 16 or T])]
    rnd = rng.integers(1, min(1000, cfg.vocab_size - 1),
                       (B, T)).astype(np.int32)
    datasets.append(("random", rnd))
    for dname, toks in datasets:
        Tt = (toks.shape[1] // 16) * 16
        toks = jnp.asarray(toks[:, :Tt], jnp.int32)
        print(f" data={dname}", flush=True)
        ref = None
        for mode, kw in _modes(jnp.int8):
            t0 = time.time()
            lg = forced_logits(params, cfg, toks, **kw)
            if mode == "f32":
                ref = lg
                print(f"  f32: NLL {nll(lg, np.asarray(toks)):.5f}  "
                      f"({time.time()-t0:.0f}s)", flush=True)
            else:
                drift_report(mode, ref, lg, np.asarray(toks))


def main():
    from dataclasses import replace

    from quip_tpu.models import get_config
    from quip_tpu.models import model as M

    print(f"backend: {jax.default_backend()}", flush=True)
    if ARGS.chip:
        from __graft_entry__ import _packed_llama
        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
        t0 = time.time()
        packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        jax.block_until_ready(jax.tree.leaves(packed)[0])
        print(f"# built 7B packed in {time.time()-t0:.0f}s", flush=True)
        run_model("llama-2-7b 2-bit packed", packed, cfg, ARGS.T, B=1)
        return
    cfg_t = get_config("opt-tiny")
    run_model("opt-tiny", M.init_params(jax.random.key(0), cfg_t),
              cfg_t, min(ARGS.T, 256))
    cfg_m = replace(get_config("opt-125m"), dtype="float32")
    run_model("opt-125m (random init)",
              M.init_params(jax.random.key(1), cfg_m), cfg_m, ARGS.T, B=1)


if __name__ == "__main__":
    main()
