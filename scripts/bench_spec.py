"""Chip measurement: speculative serving paths (greedy/stochastic, chunked).

Run ALONE on the TPU (CLAUDE.md: never share the relayed chip). Measures:
  1. E2E Engine serving throughput with chunked speculative decoding
     (perfect draft = upper bound; 4-layer self-draft = realistic shape),
     vs the plain paged+chunked engine on the same requests.
  2. Stochastic vs greedy spec step cost (the price of materializing the
     K draft + K target distributions at V=32000 and the nucleus sorts).

Methodology: E2E numbers are tokens-served / wall-clock including host
reads (same as docs/PERF.md "E2E serving"). Step costs are chained
dependent dispatches with one trailing host sync.
"""
import sys
import time
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


def e2e(eng, n_req=24, plen=64, new=64, **submit_kw):
    rng = np.random.default_rng(0)
    reqs = [dict(prompt=rng.integers(1, 1000, plen).tolist(),
                 max_new_tokens=new, **submit_kw) for _ in range(n_req)]
    t0 = time.time()
    done = eng.run(reqs, chunked=True)
    dt = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    return toks / dt, dt


def main():
    enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    print("# building packed 7B...", file=sys.stderr)
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built in {time.time()-t0:.0f}s", file=sys.stderr)

    B, max_seq, hot, page = 8, 192, 32, 64
    common = dict(max_batch=B, max_seq=max_seq, cache_dtype=jnp.bfloat16,
                  paged=True, hot=hot, page=page)
    only_steps = "--only-steps" in sys.argv
    if only_steps:
        dparams, dcfg = make_self_draft(packed, cfg, 4)
        return step_costs(packed, cfg, dparams, dcfg, hot, page)

    # -- 1) plain paged+chunked baseline (same request mix) ------------------
    eng = Engine(packed, cfg, **common)
    e2e(eng, n_req=8)                                  # warm compiles
    tps, dt = e2e(eng)
    print(f"plain paged+chunked: {tps:.1f} tok/s ({dt:.1f}s)")

    # -- 2) perfect-draft chunked spec (upper bound) --------------------------
    for K in (4, 8):
        eng = Engine(packed, cfg, draft=(packed, cfg), spec_k=K, **common)
        e2e(eng, n_req=8)
        tps, dt = e2e(eng)
        print(f"spec chunked perfect-draft K={K}: {tps:.1f} tok/s ({dt:.1f}s)")

    # -- 3) self-draft (4 of 32 layers) — realistic draft shape --------------
    dparams, dcfg = make_self_draft(packed, cfg, 4)
    eng = Engine(packed, cfg, draft=(dparams, dcfg), spec_k=4, **common)
    e2e(eng, n_req=8)
    tps, dt = e2e(eng)
    # acceptance on random weights is ~chance; this measures overhead floor
    print(f"spec chunked self-draft(4) K=4: {tps:.1f} tok/s ({dt:.1f}s) "
          f"[random-weight acceptance]")

    step_costs(packed, cfg, dparams, dcfg, hot, page)


def step_costs(packed, cfg, dparams, dcfg, hot, page):
    """Stochastic vs greedy spec step cost (b1)."""
    from quip_tpu.models import paged as PG
    from quip_tpu.serve.speculative import spec_decode_step, spec_sample_step
    K = 4
    dc = PG.init_paged(1, 192, dcfg, dtype=jnp.bfloat16, hot=hot, page=page)
    tc = PG.init_paged(1, 192, cfg, dtype=jnp.bfloat16, hot=hot, page=page)
    prompt = jnp.asarray(np.random.default_rng(1).integers(1, 1000, (1, 16)),
                         jnp.int32)
    plen = jnp.asarray([16], jnp.int32)
    _, dc = jax.jit(lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, dcfg)
                    )(dparams, prompt, plen, dc)
    lg, tc = jax.jit(lambda p, t, pl, c: PG.paged_prefill(p, t, pl, c, cfg)
                     )(packed, prompt, plen, tc)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
    temps = jnp.asarray([0.8], jnp.float32)
    tps_ = jnp.asarray([0.9], jnp.float32)

    # params passed as jit ARGS, not captured constants (a 2.2 GB captured
    # tree stalls the remote compile helper for many minutes). Pre-split
    # per-layer trees = what the Engine passes (unrolled step form).
    dparams = PG.as_split(dparams)
    packed = PG.as_split(packed)
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
        em, ne = fn(dparams, packed, t, dc, tc, *extra)
        int(ne[0])                                   # warm + sync
        t0 = time.time()
        for _ in range(n):
            em, ne = fn(dparams, packed, t, dc, tc, *extra)
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
        print(f"spec step {name} K={K} (7B target + 4L self-draft): "
              f"{slope*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
