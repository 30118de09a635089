"""Overlapped (double-buffered) engine loop: exactness vs the serial loop.

Engine.pump() dispatches chunk N+1 — with its input token frontier sliced
from chunk N's device-resident output — before reading chunk N back, so
the blocking host read overlaps device execution (serve/engine.py,
VERDICT r3 item 2). Greedy output must be IDENTICAL to the serial
step/step_chunk loops: cursors advance optimistically and mispredicted
slots (stop token, budget) retire at commit with their in-flight rows
dead. These tests pin that equivalence across the tricky schedules:
stop-tokens mid-chunk, re-admission, shared prefix, capped admission,
and arrivals injected mid-flight.
"""
import numpy as np
import jax
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.engine import Engine


@pytest.fixture(scope="module")
def tiny_model():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    return cfg, params


def _gen_map(reqs, outs):
    return {tuple(r["prompt"]): o.generated for r, o in zip(reqs, outs)}


def _run_both(cfg, params, reqs, eng_kw=None, run_kw=None):
    """Same requests through the serial per-step loop and the overlapped
    pump loop (fresh engines — device cache state is per engine)."""
    eng_kw = {**dict(max_batch=2, max_seq=64, paged=True, hot=8, page=8),
              **(eng_kw or {})}
    run_kw = run_kw or {}
    serial = Engine(params, cfg, **eng_kw).run(
        [dict(r) for r in reqs], chunked=False, **run_kw)
    overlap = Engine(params, cfg, **eng_kw).run(
        [dict(r) for r in reqs], chunked=True, overlap=True, **run_kw)
    return serial, overlap


def test_overlap_matches_serial_greedy(tiny_model):
    cfg, params = tiny_model
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=19),
            dict(prompt=[4, 5], max_new_tokens=7),
            dict(prompt=[6, 7, 8, 9], max_new_tokens=23),
            dict(prompt=[10], max_new_tokens=12)]
    serial, overlap = _run_both(cfg, params, reqs)
    for s, o in zip(serial, overlap):
        assert s.generated == o.generated


def test_overlap_stop_token_mid_chunk(tiny_model):
    """A stop token that fires mid-chunk retires the slot at commit; the
    already-dispatched next chunk's rows for it must be discarded."""
    cfg, params = tiny_model
    probe = Engine(params, cfg, max_batch=1, max_seq=64, paged=True,
                   hot=8, page=8)
    [r] = probe.run([dict(prompt=[1, 2, 3], max_new_tokens=24)],
                    chunked=False)
    stop = r.generated[9]          # fires inside the second chunk
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=24, stop=[int(stop)]),
            dict(prompt=[4, 5], max_new_tokens=24)]
    serial, overlap = _run_both(cfg, params, reqs)
    for s, o in zip(serial, overlap):
        assert s.generated == o.generated
    assert overlap[0].generated[-1] == stop
    assert len(overlap[0].generated) < 24


def test_overlap_readmission(tiny_model):
    """More requests than slots: freed slots are re-admitted while a
    chunk is in flight; uid guards keep the old request's tokens out."""
    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    reqs = [dict(prompt=rng.integers(1, 50, rng.integers(1, 6)).tolist(),
                 max_new_tokens=int(rng.integers(3, 25)))
            for _ in range(9)]
    serial, overlap = _run_both(cfg, params, reqs)
    for s, o in zip(serial, overlap):
        assert s.generated == o.generated


def test_overlap_with_shared_prefix(tiny_model):
    cfg, params = tiny_model
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=13),
            dict(prompt=[7, 8], max_new_tokens=18)]
    kw = dict(eng_kw=dict(shared_prefix=[11, 12, 13, 14]))
    serial, overlap = _run_both(cfg, params, reqs, **kw)
    for s, o in zip(serial, overlap):
        assert s.generated == o.generated


def test_admit_limit_token_equality(tiny_model):
    """Capped admission changes the schedule, not the tokens."""
    cfg, params = tiny_model
    reqs = [dict(prompt=[i + 1, i + 2], max_new_tokens=11)
            for i in range(6)]
    base = Engine(params, cfg, max_batch=3, max_seq=64, paged=True,
                  hot=8, page=8).run([dict(r) for r in reqs],
                                     chunked=True, overlap=True)
    capped = Engine(params, cfg, max_batch=3, max_seq=64, paged=True,
                    hot=8, page=8, admit_limit=1).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for b, c in zip(base, capped):
        assert b.generated == c.generated


def test_pump_arrivals_mid_flight(tiny_model):
    """Requests submitted between pumps (the arrival-process driver's
    usage) complete and match the serial result."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8)
    first = [dict(prompt=[1, 2], max_new_tokens=15),
             dict(prompt=[3, 4, 5], max_new_tokens=15)]
    late = [dict(prompt=[6, 7], max_new_tokens=9),
            dict(prompt=[8], max_new_tokens=5)]
    uids = [eng.submit(**r) for r in first]
    handles = {r.uid: r for r in eng._queue}
    for _ in range(2):
        assert eng.pump()
    uids += [eng.submit(**r) for r in late]
    handles.update({r.uid: r for r in eng._queue})
    while eng.pump():
        pass
    got = [handles[u] for u in uids]
    ref = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8).run([dict(r) for r in first + late],
                                    chunked=False)
    for g, r in zip(got, ref):
        assert g.generated == r.generated


def test_overlap_sampling_completes(tiny_model):
    """Sampled requests draw different keys under a different dispatch
    schedule (valid — distributional equivalence), but must complete with
    exactly the budgeted token counts."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8, seed=5)
    outs = eng.run([dict(prompt=[1, 2], max_new_tokens=10,
                         temperature=0.8, top_p=0.9),
                    dict(prompt=[3], max_new_tokens=14, temperature=1.1)],
                   chunked=True, overlap=True)
    assert [len(o.generated) for o in outs] == [11, 15]


def test_overlap_seq_cap_retirement(tiny_model):
    """A request that hits max_seq mid-schedule retires exactly like the
    serial loop (the dispatch planner stops before cursor overflow)."""
    cfg, params = tiny_model
    reqs = [dict(prompt=list(range(1, 20)), max_new_tokens=60)]
    serial, overlap = _run_both(cfg, params, reqs,
                                eng_kw=dict(max_batch=1, max_seq=40))
    assert serial[0].generated == overlap[0].generated
    assert len(overlap[0].generated) < 60


def test_overbudget_request_clamps_and_avoids_serial_tail(tiny_model):
    """A max_new_tokens the hard seq cap can never honor is clamped at
    submit (r5: an unclamped budget rode the slot into a permanent
    remaining<2 dispatch refusal, draining the whole batch through the
    serial per-token fallback for the tail — a ~30 s cold-compile stall
    on chip, bench_serve burst probe). Clamped, the request finishes at
    exactly the seq cap, tokens identical to the serial loop, and the
    pump stays on the chunked path for all but at most the final step."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=40, paged=True,
                 hot=8, page=8)
    uid = eng.submit(prompt=[1, 2, 3], max_new_tokens=500)
    req = next(r for r in eng._queue if r.uid == uid)
    assert req.max_new_tokens == 40 - 1 - 3
    while eng.pump():
        pass
    assert req.done and len(req.generated) == req.max_new_tokens + 1
    assert eng._t_pump["steps"] <= 1          # chunk ladder walks the tail
    # equality with the serial loop on a mixed batch incl. the clamped req
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=500),
            dict(prompt=[4, 5], max_new_tokens=9)]
    serial, overlap = _run_both(cfg, params, reqs,
                                eng_kw=dict(max_seq=40))
    for s, o in zip(serial, overlap):
        assert s.generated == o.generated


def test_warmup_covers_serial_fallback(tiny_model):
    """warmup() must compile the per-token fallback path: pump() falls
    back to step() at non-pipelinable boundaries, and an unwarmed
    fallback costs a cold remote compile mid-traffic (r5 session 4)."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8)
    eng.warmup()
    # the per-token program trace exists iff run(chunked=False) ran
    st = eng.stats()
    assert st["completed"] == 6               # 4 ladder + 2 per-token
    # the commit-read coalescing packer must be warm at EVERY chunk rung:
    # it only fires when firsts are pending at dispatch (burst pattern),
    # so the ladder walk alone never compiles it — its first mid-traffic
    # firing cost an 8.8 s remote-helper round trip (r5 burst probe)
    assert eng._pack_first_j._cache_size() >= 4   # T = 2, 4, 8, 16
    assert eng._admit_tok_j._cache_size() >= 1
