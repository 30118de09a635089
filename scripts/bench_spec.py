"""Chip measurement: speculative serving paths (greedy/stochastic, chunked).

Run ALONE on the TPU (CLAUDE.md: never share the relayed chip). Round-5
scope (VERDICT r4 item 1): bring spec up to the round-4 serving standard —
  1. E2E serial (overlap=False) vs OVERLAPPED PUMP (overlap=True) A/B for
     the spec engine, b1 and b8, self-draft (chance acceptance = overhead
     floor) and perfect draft (upper bound); plain engine for reference.
  2. Spec step costs RE-MEASURED post-scatter-fix (the r2 numbers — 6.96
     ms/step K=4 b1, break-even 1.95 — predate the one-hot write, which
     covers the spec verify append window at B>1): greedy + stochastic,
     b1 AND b8.

Methodology: E2E numbers are tokens-served / wall-clock including host
reads on a WARMED engine (docs/PERF.md "E2E serving"). Step costs are
chained dependent dispatches with one trailing host sync, slope of two
chain lengths, median of 3.

Sections via --sections e2e,steps (default both).
"""
import argparse
import sys
import time
import traceback
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _packed_llama          # noqa: E402
from quip_tpu.models import get_config             # noqa: E402
from quip_tpu.serve.engine import Engine           # noqa: E402
from quip_tpu.serve.speculative import make_self_draft  # noqa: E402
from quip_tpu.utils import enable_compile_cache    # noqa: E402

_ap = argparse.ArgumentParser("bench_spec")
_ap.add_argument("--sections", default="e2e,steps")
_ap.add_argument("--smoke", action="store_true")
ARGS = _ap.parse_args()

if ARGS.smoke:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


def e2e(eng, n_req=24, plen=64, new=64, overlap=True, max_chunk=16,
        **submit_kw):
    rng = np.random.default_rng(0)
    reqs = [dict(prompt=rng.integers(1, 1000, plen).tolist(),
                 max_new_tokens=new, **submit_kw) for _ in range(n_req)]
    t0 = time.time()
    done = eng.run(reqs, chunked=True, overlap=overlap,
                   max_chunk=max_chunk)
    dt = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    return toks / dt, dt


def ab_engine(tag, mk_engine, n_req, plen=None, new=None,
              max_chunk=16):
    """Serial vs pump on fresh warmed engines (cache state is
    per-engine); the timed pass repeats the warm pass's exact mix."""
    plen = plen if plen is not None else (64 if not ARGS.smoke else 8)
    new = new if new is not None else (64 if not ARGS.smoke else 12)
    rows = {}
    for mode, overlap in (("serial", False), ("pump", True)):
        try:
            eng = mk_engine()
            # warm with the FULL request mix once: the 24-request run
            # walks chunk lengths / re-admission schedules an 8-request
            # warm batch never compiles (observed: first pump pass had
            # 0.3-7 s/chunk dispatch = compiles in the timed window)
            e2e(eng, n_req=n_req, plen=plen, new=new, overlap=overlap,
                max_chunk=max_chunk)
            eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                           for k, v in eng._t_pump.items()}
            tps, dt = e2e(eng, n_req=n_req, plen=plen, new=new,
                          overlap=overlap, max_chunk=max_chunk)
            rows[mode] = tps
            st = eng.stats()
            extra = ""
            if "spec_emitted_mean" in st:
                extra = f"  acc/step {st['spec_emitted_mean']:.2f}"
            if "pump_phase_ms_per_chunk" in st and overlap:
                ph = st["pump_phase_ms_per_chunk"]
                extra += (f"  [dispatch {ph['dispatch']} commit "
                          f"{ph['commit_read']} bookkeep {ph['bookkeep']}"
                          f" admit {ph['admit']} ms/chunk,"
                          f" {st.get('pump_chunks', 0)} chunks,"
                          f" {ph.get('steps', 0)} serial-steps]")
            print(f"{tag} {mode:6s}: {tps:7.1f} tok/s ({dt:5.1f}s)"
                  f"{extra}", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"{tag} {mode} FAILED (continuing)", flush=True)
    if "serial" in rows and "pump" in rows and rows["serial"] > 0:
        print(f"{tag} pump/serial: {rows['pump']/rows['serial']:.3f}x",
              flush=True)


def section_e2e(packed, cfg):
    B, max_seq, hot, page = 8, 192, 32, 64
    common = dict(max_seq=max_seq, cache_dtype=jnp.bfloat16,
                  paged=True, hot=hot, page=page)
    if ARGS.smoke:
        common.update(max_seq=64, hot=16, page=8)
    n_req = 24 if not ARGS.smoke else 4
    dparams, dcfg = make_self_draft(packed, cfg, 4 if not ARGS.smoke
                                    else 1)

    # plain engine reference (the capture context for the spec numbers)
    ab_engine("plain b8         ", lambda: Engine(
        packed, cfg, max_batch=B, **common), n_req)
    # self-draft: chance acceptance = the overhead floor
    ab_engine("spec self4 K4 b8 ", lambda: Engine(
        packed, cfg, max_batch=B, draft=(dparams, dcfg), spec_k=4,
        **common), n_req)
    ab_engine("spec self4 K4 b1 ", lambda: Engine(
        packed, cfg, max_batch=1, draft=(dparams, dcfg), spec_k=4,
        **common), 6 if not ARGS.smoke else 2)
    # spec chunk-size ladder: S = max_chunk//K iterations per dispatch;
    # bigger chunks amortize the ~40 ms commit read over more tokens
    # (needs hot >= S*K + 2K of ring headroom)
    for mc, hot2 in ((32, 64), (64, 160)):
        ab_engine(f"spec self4 K4 b1 mc{mc}", lambda hot2=hot2: Engine(
            packed, cfg, max_batch=1, draft=(dparams, dcfg), spec_k=4,
            **{**common, "hot": hot2}), 6 if not ARGS.smoke else 2,
            max_chunk=mc)
    # perfect draft: the acceptance upper bound (draft == target)
    ab_engine("spec perfect K4 b8", lambda: Engine(
        packed, cfg, max_batch=B, draft=(packed, cfg), spec_k=4,
        **common), n_req)
    ab_engine("spec perfect K8 b1", lambda: Engine(
        packed, cfg, max_batch=1, draft=(packed, cfg), spec_k=8,
        **common), 6 if not ARGS.smoke else 2)


def section_steps(packed, cfg):
    dn = 4 if not ARGS.smoke else 1
    dparams, dcfg = make_self_draft(packed, cfg, dn)
    for B in (1, 8):
        step_costs(packed, cfg, dparams, dcfg, 32 if not ARGS.smoke
                   else 16, 64 if not ARGS.smoke else 8, B=B)


def step_costs(packed, cfg, dparams, dcfg, hot, page, B=1):
    """Stochastic vs greedy spec step cost at batch B (post-scatter-fix:
    the verify append's hot-ring write is one-hot at B>1)."""
    from quip_tpu.models import paged as PG
    from quip_tpu.serve.speculative import spec_decode_step, spec_sample_step
    K = 4
    cap = 192 if not ARGS.smoke else 64
    dc = PG.init_paged(B, cap, dcfg, dtype=jnp.bfloat16, hot=hot, page=page)
    tc = PG.init_paged(B, cap, cfg, dtype=jnp.bfloat16, hot=hot, page=page)
    prompt = jnp.asarray(np.random.default_rng(1).integers(1, 1000, (B, 16)),
                         jnp.int32)
    plen = jnp.full((B,), 16, jnp.int32)
    _, dc = jax.jit(lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, dcfg)
                    )(dparams, prompt, plen, dc)
    lg, tc = jax.jit(lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg)
                     )(packed, prompt, plen, tc)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
    temps = jnp.full((B,), 0.8, jnp.float32)
    tps_ = jnp.full((B,), 0.9, jnp.float32)

    # params passed as jit ARGS, not captured constants (a 2.2 GB captured
    # tree stalls the remote compile helper for many minutes). Pre-split
    # per-layer trees = what the Engine passes (unrolled step form).
    dsplit = PG.as_split(dparams)
    tsplit = PG.as_split(packed)
    g = jax.jit(lambda dp, tp, tok, dc, tc: spec_decode_step(
        dp, tp, tok, dc, tc, dcfg, cfg, K, page=page)[:2])
    s = jax.jit(lambda dp, tp, tok, dc, tc, key: spec_sample_step(
        dp, tp, tok, dc, tc, dcfg, cfg, K, key, temps,
        None, tps_, page=page)[:2])

    def chain(fn, n, *extra):
        # dependent chain: each step's input token comes from the previous
        # step's output (naive independent-call timing reads pipelined
        # throughput through the relay — docs/PERF.md methodology)
        t = tok
        em, ne = fn(dsplit, tsplit, t, dc, tc, *extra)
        int(ne[0])                                   # warm + sync
        t0 = time.time()
        for _ in range(n):
            em, ne = fn(dsplit, tsplit, t, dc, tc, *extra)
            t = em[:, :1]
        int(t[0, 0])                                 # end-of-chain sync
        return (time.time() - t0) / n

    for name, fn, extra in (("greedy", g, ()),
                            ("stochastic", s, (jax.random.key(0),))):
        chain(fn, 4, *extra)                 # throwaway: absorb compiles
        slopes = []
        for _ in range(3):
            t1 = chain(fn, 16, *extra)
            t2 = chain(fn, 48, *extra)
            slopes.append((48 * t2 - 16 * t1) / 32)
        slope = sorted(slopes)[1]            # median of 3
        print(f"spec step {name} K={K} B={B} (target + {dcfg.n_layers}L "
              f"self-draft): {slope*1e3:.2f} ms/step", flush=True)


def main():
    enable_compile_cache()
    if not ARGS.smoke:
        assert jax.default_backend() == "tpu", jax.default_backend()
        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    else:
        cfg = replace(get_config("llama-tiny"), dtype="bfloat16")
    print(f"# building packed {'7B' if not ARGS.smoke else 'tiny'}...",
          flush=True)
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    jax.block_until_ready(jax.tree.leaves(packed)[0])
    print(f"# built in {time.time()-t0:.0f}s", flush=True)

    sections = ARGS.sections.split(",")
    for name, fn in (("e2e", lambda: section_e2e(packed, cfg)),
                     ("steps", lambda: section_steps(packed, cfg))):
        if name not in sections:
            continue
        print(f"\n=== section {name} ===", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(f"=== section {name} FAILED (continuing) ===", flush=True)
    print("\nDONE", flush=True)


if __name__ == "__main__":
    main()
