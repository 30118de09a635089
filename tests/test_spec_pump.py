"""Overlapped speculative pump: exactness vs the serial spec loop.

Engine._pump_spec keeps spec chunks in flight with DEVICE-authoritative
cursors (acceptance counts make per-chunk advances data-dependent, so the
host only tracks upper bounds — serve/engine.py section comment). Greedy
emission must be IDENTICAL to (a) the serial spec chunk loop and (b) the
target model's plain greedy decoding — the spec verify construction
guarantees both regardless of schedule; these tests pin the engine's
bookkeeping (re-admission, stop tokens, flush cadence, drain/serial
interop, int8 KV, shared prefix) to that invariant.
"""
import numpy as np
import jax
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.engine import Engine


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(4), cfg)
    return cfg, params, draft


def _greedy_reference(params, cfg, prompt, n):
    """Plain greedy decoding via a non-spec engine (its exactness is
    pinned elsewhere — test_serve.py / test_engine_overlap.py)."""
    eng = Engine(params, cfg, max_batch=1, max_seq=64, paged=True,
                 hot=16, page=8)
    [r] = eng.run([dict(prompt=list(prompt), max_new_tokens=n)],
                  chunked=False)
    return r.generated[:n]


def _spec_engine(cfg, params, draft, **kw):
    base = dict(max_batch=2, max_seq=64, paged=True, hot=16, page=8,
                draft=(draft, cfg), spec_k=2)
    base.update(kw)
    return Engine(params, cfg, **base)


def test_spec_pump_matches_serial_and_greedy(tiny_pair):
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=17),
            dict(prompt=[4, 5], max_new_tokens=7),
            dict(prompt=[6, 7, 8, 9], max_new_tokens=21),
            dict(prompt=[10], max_new_tokens=11)]
    serial = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o, r in zip(serial, pump, reqs):
        assert s.generated == o.generated
        n = r["max_new_tokens"]
        assert o.generated[:n] == _greedy_reference(params, cfg,
                                                    r["prompt"], n)


def test_spec_pump_readmission(tiny_pair):
    """More requests than slots: freed slots re-admitted while spec
    chunks are in flight; uid guards + in-graph prefill cursor resets
    keep the streams exact."""
    cfg, params, draft = tiny_pair
    rng = np.random.default_rng(7)
    reqs = [dict(prompt=rng.integers(1, 50, rng.integers(1, 6)).tolist(),
                 max_new_tokens=int(rng.integers(3, 20)))
            for _ in range(7)]
    serial = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o in zip(serial, pump):
        assert s.generated == o.generated


def test_spec_pump_stop_token_mid_chunk(tiny_pair):
    cfg, params, draft = tiny_pair
    want = _greedy_reference(params, cfg, [1, 2, 3], 20)
    stop = int(want[8])
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=20, stop=[stop]),
            dict(prompt=[4, 5], max_new_tokens=20)]
    serial = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o in zip(serial, pump):
        assert s.generated == o.generated
    assert pump[0].generated[-1] == stop
    assert len(pump[0].generated) < 20


def test_spec_pump_flush_cadence(tiny_pair):
    """A small hot ring forces mid-pipeline device-cursor flushes; the
    epoch-guarded upper-bound bookkeeping must stay exact."""
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[3, 1], max_new_tokens=25),
            dict(prompt=[9], max_new_tokens=25)]
    serial = _spec_engine(cfg, params, draft, hot=8).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft, hot=8).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o in zip(serial, pump):
        assert s.generated == o.generated


def test_spec_pump_int8_kv(tiny_pair):
    """int8-quantized caches compose with the overlapped spec pump
    (token equality vs the serial spec loop on the SAME numerics)."""
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=15),
            dict(prompt=[8, 9], max_new_tokens=12)]
    serial = _spec_engine(cfg, params, draft, kv_quant=True).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft, kv_quant=True).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o in zip(serial, pump):
        assert s.generated == o.generated


def test_spec_pump_shared_prefix(tiny_pair):
    """Prefix admissions drain the pipeline first (host-authoritative
    windowed appends) but the streams still match the serial loop."""
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=11),
            dict(prompt=[7, 8], max_new_tokens=14)]
    kw = dict(shared_prefix=[11, 12, 13, 14])
    serial = _spec_engine(cfg, params, draft, **kw).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft, **kw).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    for s, o in zip(serial, pump):
        assert s.generated == o.generated


def test_spec_pump_step_interop(tiny_pair):
    """Mixing pump() and step() drains + resyncs exact cursors from the
    device; the combined stream equals the serial loop's."""
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[1, 2], max_new_tokens=15),
            dict(prompt=[3, 4, 5], max_new_tokens=15)]
    eng = _spec_engine(cfg, params, draft)
    uids = [eng.submit(**r) for r in reqs]
    handles = {r.uid: r for r in eng._queue}
    for _ in range(2):
        assert eng.pump()
    eng.step()                     # serial interop mid-stream
    while eng.pump():
        pass
    got = [handles[u] for u in uids]
    ref = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    for g, r in zip(got, ref):
        assert g.generated == r.generated


def test_spec_pump_arrivals_mid_flight(tiny_pair):
    cfg, params, draft = tiny_pair
    eng = _spec_engine(cfg, params, draft)
    first = [dict(prompt=[1, 2], max_new_tokens=13),
             dict(prompt=[3, 4, 5], max_new_tokens=13)]
    late = [dict(prompt=[6, 7], max_new_tokens=8),
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
    ref = _spec_engine(cfg, params, draft).run(
        [dict(r) for r in first + late], chunked=True, overlap=False)
    for g, r in zip(got, ref):
        assert g.generated == r.generated


def test_spec_pump_sampling_budgets(tiny_pair):
    """Sampled requests draw a different (device-chained) key stream
    than the serial loop — distributional equivalence, not token
    equality — but budgets must be exact and greedy slots stay exact."""
    cfg, params, draft = tiny_pair
    eng = _spec_engine(cfg, params, draft, seed=3)
    outs = eng.run([dict(prompt=[1, 2], max_new_tokens=10,
                         temperature=0.8, top_p=0.9),
                    dict(prompt=[7, 8], max_new_tokens=12)],
                   chunked=True, overlap=True)
    assert [len(o.generated) for o in outs] == [11, 13]
    want = _greedy_reference(params, cfg, [7, 8], 12)
    assert outs[1].generated[:12] == want


def test_spec_pump_mostly_free_slots(tiny_pair):
    """One request on a 4-slot engine: the three free slots' device
    cursors stay frozen (active mask) across flush cycles and never
    corrupt the active stream."""
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=[2, 4], max_new_tokens=30)]
    serial = _spec_engine(cfg, params, draft, max_batch=4, hot=8).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft, max_batch=4, hot=8).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    assert serial[0].generated == pump[0].generated


def test_spec_pump_seq_cap_retirement(tiny_pair):
    cfg, params, draft = tiny_pair
    reqs = [dict(prompt=list(range(1, 20)), max_new_tokens=60)]
    serial = _spec_engine(cfg, params, draft, max_batch=1,
                          max_seq=40).run(
        [dict(r) for r in reqs], chunked=True, overlap=False)
    pump = _spec_engine(cfg, params, draft, max_batch=1, max_seq=40).run(
        [dict(r) for r in reqs], chunked=True, overlap=True)
    assert serial[0].generated == pump[0].generated
    assert len(pump[0].generated) < 60
