"""Engine-level serving bench: overlap A/B, in-dispatch capture, arrivals.

Reusable harness (the round-3 one-shot session scripts are gone — this is
their serving probe, kept). Run ALONE on the chip; engine e2e numbers are
SECOND-batch (warm) per CLAUDE.md.

Sections:
  e2e      warm b8 engine on the 24 x (64-tok prompt + 64 new) workload:
           serial step_chunk loop vs the overlapped pump() loop
           (VERDICT r3 item 2 — target >= 85% of in-dispatch), plus a
           greedy token-equality check between the two loops ON CHIP and
           a direct in-dispatch throughput measurement of the chunk
           program.
  arrival  Poisson arrivals at --rates req/s (40 requests, 64+64): p50/
           p95 TTFT + served tok/s, admit_limit None vs 1 (VERDICT r3
           item 3); plus a burst probe: 8 requests dropped mid-decode on
           a long-running stream, reporting its worst inter-chunk token
           gap under both admission policies.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("bench_serve")
_ap.add_argument("--smoke", action="store_true")
_ap.add_argument("--sections", default="e2e,arrival")
_ap.add_argument("--rates", default="2,4,8")
ARGS = _ap.parse_args()

if ARGS.smoke:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if ARGS.smoke:
    jax.config.update("jax_platforms", "cpu")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()


def _requests(n, plen, new, seed=0):
    rng = np.random.default_rng(seed)
    return [dict(prompt=rng.integers(1, 1000, plen).tolist(),
                 max_new_tokens=new) for _ in range(n)]


def _run_timed(eng, reqs, **kw):
    t0 = time.time()
    done = eng.run([dict(r) for r in reqs], chunked=True, **kw)
    dt = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    return toks / dt, dt, done


def section_e2e(mk_engine, n_req, plen, new):
    eng = mk_engine()
    reqs = _requests(n_req, plen, new)
    # warm BOTH loops: the overlapped path has its own device programs
    # (frontier slice, admission row-set) whose first-time compiles would
    # otherwise land inside its timed window
    _run_timed(eng, reqs, overlap=False)
    _run_timed(eng, reqs, overlap=True)
    tps_serial, dt_s, done_s = _run_timed(eng, reqs, overlap=False)
    # phases must attribute the TIMED overlap pass only — the warm
    # passes' compiles otherwise pollute admit/resolve (r5 session 4
    # read 443 ms/chunk admit from exactly this)
    eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                   for k, v in eng._t_pump.items()}
    tps_overlap, dt_o, done_o = _run_timed(eng, reqs, overlap=True)
    # greedy token equality between the two loops (exactness ON CHIP —
    # also guards the donation/dataflow ordering of the pipelined loop)
    mismatch = sum(a.generated != b.generated
                   for a, b in zip(done_s, done_o))
    print(f"e2e serial : {tps_serial:7.1f} tok/s ({dt_s:.1f}s)", flush=True)
    print(f"e2e overlap: {tps_overlap:7.1f} tok/s ({dt_o:.1f}s)  "
          f"[+{(tps_overlap/tps_serial-1)*100:.0f}%]  "
          f"token mismatches: {mismatch}/{n_req}", flush=True)
    print(f"pump phases (ms/chunk): "
          f"{eng.stats().get('pump_phase_ms_per_chunk')}", flush=True)

    # in-dispatch throughput of the warm chunk program (the device-side
    # ceiling the host loop is trying to capture)
    B, T = eng.max_batch, 16
    last = jnp.zeros((B, 1), jnp.int32)
    caches = eng._sync_pkv()
    import jax.random as jr
    args = (eng.params, last, caches, *eng._prefix_args(), jr.PRNGKey(0),
            None, None)
    toks, _, _, _ = eng._decode_chunk_paged(*args, n_steps=T, top_k=0)
    np.asarray(toks)                               # compile+sync
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        toks, _, _, _ = eng._decode_chunk_paged(*args, n_steps=T, top_k=0)
        np.asarray(toks)
    dt = (time.time() - t0) / reps
    tps_disp = B * T / dt
    print(f"in-dispatch: {tps_disp:7.1f} tok/s ({dt*1e3:.1f} ms/chunk)  "
          f"capture serial {tps_serial/tps_disp*100:.0f}% / overlap "
          f"{tps_overlap/tps_disp*100:.0f}%", flush=True)

    # longer chunks amortize the per-chunk host overhead further (T=32
    # needs hot >= 33 so a chunk never crosses a flush)
    del eng
    eng32 = mk_engine(hot=64)
    for _ in range(2):
        t0 = time.time()
        uids = [eng32.submit(**r) for r in [dict(r) for r in reqs]]
        handles = {r.uid: r for r in eng32._queue}
        while eng32.pump(max_chunk=32):
            pass
        dt32 = time.time() - t0
    toks = sum(len(handles[u].generated) for u in uids)
    print(f"e2e overlap T=32 hot=64: {toks/dt32:7.1f} tok/s "
          f"({toks/dt32/tps_disp*100:.0f}% of the T=16 in-dispatch "
          f"ceiling)", flush=True)
    return eng32


def section_depth(mk_engine, n_req, plen, new):
    """pipeline_depth sweep on the warm b8 drain workload (VERDICT r4
    weak #3: with the commit+resolve reads coalesced, is the residual
    capture gap recoverable by a deeper pipeline?)."""
    for depth in (1, 2, 3, 4):
        eng = mk_engine(pipeline_depth=depth)
        reqs = _requests(n_req, plen, new)
        _run_timed(eng, reqs, overlap=True)        # warm
        eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                       for k, v in eng._t_pump.items()}
        tps, dt, _ = _run_timed(eng, reqs, overlap=True)
        ph = eng.stats().get("pump_phase_ms_per_chunk")
        print(f"depth={depth}: {tps:7.1f} tok/s ({dt:.1f}s)  {ph}",
              flush=True)
        del eng


def drive_arrivals(eng, trace, debug=False):
    """Pump the engine while injecting submissions at their trace times.
    trace: list of (t_offset_s, request_dict). Returns (handles, wall)."""
    handles = {}
    i = 0
    # timers must start clean: warmup/warm-batch compiles otherwise
    # pollute the phase attribution of the timed trace
    eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                   for k, v in eng._t_pump.items()}
    t0 = time.time()
    while True:
        now = time.time() - t0
        while i < len(trace) and trace[i][0] <= now:
            uid = eng.submit(**trace[i][1])
            handles[uid] = eng._queue[-1]      # keep past retirement
            i += 1
        _tp = time.time()
        worked = eng.pump()
        if debug and time.time() - _tp > 0.02:
            active = sum(s is not None for s in eng._slots)
            print(f"   pump@{now:6.2f}s {1e3*(time.time()-_tp):6.0f} ms "
                  f"active={active} q={len(eng._queue)} "
                  f"infl={len(eng._pending_q)} "
                  f"pend1st={len(eng._first_pending)}", flush=True)
        if not worked:
            if i < len(trace):
                time.sleep(max(0.0, min(0.02, trace[i][0] - now)))
            else:
                break
    return handles, time.time() - t0


def section_arrival(mk_engine, rates, n_req, plen, new):
    for admit_limit in (None, 1):
        eng = mk_engine(admit_limit=admit_limit)
        eng.warmup()
        # representative warm batch: builds the real prompt-length prefill
        # bucket so no compile lands inside the timed arrival trace
        _run_timed(eng, _requests(4, plen, new))
        for rate in rates:
            rng = np.random.default_rng(7)
            gaps = rng.exponential(1.0 / rate, n_req)
            times = np.cumsum(gaps)
            trace = [(float(t), r) for t, r in
                     zip(times, _requests(n_req, plen, new, seed=1))]
            import os
            handles, wall = drive_arrivals(
                eng, trace, debug=bool(os.environ.get("QUIP_ARRIVAL_DEBUG")))
            reqs = list(handles.values())
            ttft = np.asarray([r.t_first - r.t_submit for r in reqs
                               if r.t_first])
            toks = sum(len(r.generated) for r in reqs)
            print(f"arrival rate={rate:4.1f}/s admit_limit={admit_limit}: "
                  f"TTFT p50 {np.percentile(ttft, 50)*1e3:6.0f} ms  "
                  f"p95 {np.percentile(ttft, 95)*1e3:6.0f} ms  "
                  f"{toks/wall:7.1f} tok/s  ({len(reqs)}/{n_req} done, "
                  f"{wall:.1f}s)", flush=True)
            st = eng.stats()
            print(f"   phases: {st.get('pump_phase_ms_per_chunk')} "
                  f"chunks={st.get('pump_chunks')}", flush=True)
            eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                           for k, v in eng._t_pump.items()}
        del eng


def section_burst(mk_engine, plen, new):
    """Worst inter-commit token gap of a long-running stream when an
    8-request burst lands mid-decode (decode-silence probe)."""
    import os
    debug = bool(os.environ.get("QUIP_ARRIVAL_DEBUG"))
    for admit_limit in (None, 1):
        eng = mk_engine(admit_limit=admit_limit)
        eng.warmup()
        _run_timed(eng, _requests(4, plen, new))   # warm prefill bucket
        eng._t_pump = {k: (0 if isinstance(v, int) else 0.0)
                       for k, v in eng._t_pump.items()}
        long_uid = eng.submit(prompt=[1, 2, 3], max_new_tokens=320)
        longreq = next(r for r in eng._queue if r.uid == long_uid)
        seen, stamps = 0, []
        burst_at = None
        t_leg = time.time()
        while not longreq.done:
            _tp = time.time()
            eng.pump()
            if debug and time.time() - _tp > 0.3:
                active = sum(s is not None for s in eng._slots)
                print(f"   pump {1e3*(time.time()-_tp):6.0f} ms "
                      f"active={active} q={len(eng._queue)} "
                      f"infl={len(eng._pending_q)} "
                      f"pend1st={len(eng._first_pending)} "
                      f"gen={len(longreq.generated)}", flush=True)
            if len(longreq.generated) > seen:
                seen = len(longreq.generated)
                stamps.append((time.time(), seen))
            if burst_at is None and seen >= 48:
                for r in _requests(8, plen, new, seed=2):
                    eng.submit(**r)
                burst_at = time.time()
        while eng.pump():
            pass
        post = [t for t, _ in stamps if burst_at and t >= burst_at]
        gaps = np.diff([t for t, _ in stamps])
        post_gaps = np.diff(post) if len(post) > 1 else np.asarray([0.0])
        print(f"burst admit_limit={admit_limit}: max token-commit gap "
              f"{gaps.max()*1e3:6.0f} ms (post-burst "
              f"{post_gaps.max()*1e3:6.0f} ms)  [{time.time()-t_leg:.1f}s "
              f"leg]", flush=True)
        st = eng.stats()
        print(f"   phases: {st.get('pump_phase_ms_per_chunk')} "
              f"chunks={st.get('pump_chunks')}", flush=True)
        del eng


def main():
    from dataclasses import replace

    from quip_tpu.models import get_config
    from quip_tpu.serve.engine import Engine

    sections = ARGS.sections.split(",")
    print(f"backend: {jax.default_backend()}  sections: {sections}",
          flush=True)
    if ARGS.smoke:
        cfg = get_config("opt-tiny")
        from quip_tpu.models import model as M
        params = M.init_params(jax.random.key(0), cfg)
        n_req, plen, new, max_seq = 6, 8, 12, 64
    else:
        cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
        from __graft_entry__ import _packed_llama
        t0 = time.time()
        params = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        print(f"# built packed in {time.time()-t0:.0f}s", flush=True)
        n_req, plen, new, max_seq = 24, 64, 64, 192

    def mk_engine(admit_limit=None, **kw):
        base = dict(max_batch=8, max_seq=max_seq,
                    cache_dtype=jnp.bfloat16, paged=True, hot=32,
                    page=64, admit_limit=admit_limit)
        base.update(kw)
        return Engine(params, cfg, **base)

    import traceback
    rates = [float(r) for r in ARGS.rates.split(",")]
    for name, fn in [
        ("e2e", lambda: section_e2e(mk_engine, n_req, plen, new)),
        ("depth", lambda: section_depth(mk_engine, n_req, plen, new)),
        ("arrival", lambda: section_arrival(mk_engine, rates, n_req if
                                            not ARGS.smoke else 6, plen,
                                            new)),
        ("burst", lambda: section_burst(mk_engine, plen, new)),
    ]:
        if name not in sections and not (name == "burst"
                                         and "arrival" in sections):
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
