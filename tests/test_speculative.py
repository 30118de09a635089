"""Speculative decoding (serve/speculative.py): greedy-exactness.

The defining property: for ANY draft model, the emitted stream equals the
target model's plain greedy decoding — the draft only changes how many
dispatches it takes. A perfect draft (== target) must accept K tokens per
step; an unrelated draft still produces the exact stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.speculative import SpecDecoder


def _greedy_reference(params, cfg, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = M.forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.parametrize("name", ["llama-tiny", "opt-tiny"])
def test_spec_exactness_unrelated_draft(name):
    cfg = get_config(name)
    target = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(1), cfg)   # unrelated weights
    prompt = [5, 2, 9, 1]
    n_new = 24
    dec = SpecDecoder(draft, target, cfg, cfg, K=4, max_seq=64, hot=8,
                      page=8, cache_dtype=jnp.float32)
    [out], accept = dec.generate([prompt], max_new_tokens=n_new)
    want = _greedy_reference(target, cfg, prompt, n_new)
    assert out[: len(want)] == want, (out, want, accept)
    assert 1.0 <= accept <= 4.0


def test_spec_perfect_draft_accepts_K():
    cfg = get_config("llama-tiny")
    target = M.init_params(jax.random.key(0), cfg)
    prompt = [3, 7, 7]
    n_new = 20
    dec = SpecDecoder(target, target, cfg, cfg, K=4, max_seq=64, hot=8,
                      page=8, cache_dtype=jnp.float32)
    [out], accept = dec.generate([prompt], max_new_tokens=n_new)
    want = _greedy_reference(target, cfg, prompt, n_new)
    assert out[: len(want)] == want
    assert accept == 4.0, accept       # every step emits K tokens


def test_spec_batch_and_small_draft():
    """B=2 slots, draft genuinely smaller than the target."""
    import dataclasses
    cfg_t = get_config("opt-tiny")
    cfg_d = dataclasses.replace(cfg_t, n_layers=1, d_ff=64)
    target = M.init_params(jax.random.key(0), cfg_t)
    draft = M.init_params(jax.random.key(2), cfg_d)
    prompts = [[4, 4, 1], [9, 8, 7, 6, 5]]
    n_new = 16
    dec = SpecDecoder(draft, target, cfg_d, cfg_t, K=3, max_seq=64, hot=8,
                      page=8, batch=2, cache_dtype=jnp.float32)
    outs, _ = dec.generate(prompts, max_new_tokens=n_new)
    for p, o in zip(prompts, outs):
        want = _greedy_reference(target, cfg_t, p, n_new)
        assert o[: len(want)] == want, (p, o, want)


# -- stochastic speculative decoding -----------------------------------------

def test_spec_dist_matches_engine_filtering():
    """spec_dist == softmax(engine._filtered_logits) for sampling slots,
    one-hot argmax for greedy slots; dynamic top-k == static top-k."""
    from quip_tpu.serve.engine import _filtered_logits
    from quip_tpu.serve.speculative import spec_dist
    key = jax.random.key(0)
    logits = jax.random.normal(key, (3, 16)) * 3.0
    temps = jnp.asarray([0.7, 1.3, 0.9])
    tps = jnp.asarray([0.8, 1.0, 0.5])
    got = spec_dist(logits, temps, jnp.asarray([3, 0, 5]), tps)
    for i, k in enumerate([3, 0, 5]):
        want = jax.nn.softmax(_filtered_logits(
            logits[i:i + 1], temps[i:i + 1], k, tps[i:i + 1]), -1)[0]
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-6)
    g = spec_dist(logits, jnp.zeros(3))
    assert (jnp.argmax(g, -1) == jnp.argmax(logits, -1)).all()
    assert np.allclose(np.asarray(jnp.sort(g, -1)[:, -1]), 1.0)


def test_spec_accept_first_token_marginal():
    """The law of the first emitted token is exactly the target's p_0
    (Leviathan et al.) — checked by Monte Carlo against any draft q."""
    from quip_tpu.serve.speculative import spec_accept
    V, K, B = 6, 3, 60000
    kq, kp, kd, ka = jax.random.split(jax.random.key(42), 4)
    q0 = jax.nn.softmax(jax.random.normal(kq, (V,)) * 2.0)
    p0 = jax.nn.softmax(jax.random.normal(kp, (V,)) * 2.0)
    # later positions: arbitrary valid distributions (irrelevant for the
    # first-token marginal)
    q_rest = jax.nn.softmax(jax.random.normal(kq, (K - 1, V)))
    p_rest = jax.nn.softmax(jax.random.normal(kp, (K - 1, V)))
    q = jnp.broadcast_to(jnp.concatenate([q0[None], q_rest]), (B, K, V))
    p = jnp.broadcast_to(jnp.concatenate([p0[None], p_rest]), (B, K, V))
    # drafts: d_1 ~ q_0 (the theorem's premise); later drafts from q_rest
    logq = jnp.log(jnp.concatenate([q0[None], q_rest]))      # (K, V)
    drafts = jax.vmap(
        lambda k: jax.random.categorical(k, logq, axis=-1))(
        jax.random.split(kd, B)).astype(jnp.int32)           # (B, K)
    emitted, n_emit = jax.jit(spec_accept)(ka, drafts, q, p)
    first = np.asarray(emitted[:, 0])
    emp = np.bincount(first, minlength=V) / B
    assert np.abs(emp - np.asarray(p0)).sum() < 0.02, (emp, np.asarray(p0))
    assert (np.asarray(n_emit) >= 1).all()


def test_spec_accept_greedy_onehot_is_prefix_match():
    """With one-hot p and q, rejection sampling reduces to greedy
    prefix-matching — the same semantics as spec_decode_step."""
    from quip_tpu.serve.speculative import spec_accept
    V, K = 8, 4
    def onehot(rows):
        return jax.nn.one_hot(jnp.asarray(rows), V, dtype=jnp.float32)
    # target greedy chain g_0..g_3 = [2, 5, 1, 7]; draft proposes
    # d_1..d_4 = [2, 5, 0, 7]: accept d_1, d_2; reject d_3 -> correct to 1
    q = onehot([[2, 5, 0, 7]])
    p = onehot([[2, 5, 1, 7]])
    drafts = jnp.asarray([[2, 5, 0, 7]], jnp.int32)
    emitted, n_emit = spec_accept(jax.random.key(0), drafts, q, p)
    assert int(n_emit[0]) == 3
    assert list(np.asarray(emitted[0][:3])) == [2, 5, 1]
    # perfect draft: all K-1 comparable drafts accepted + bonus from p_3
    drafts = jnp.asarray([[2, 5, 1, 0]], jnp.int32)
    q = onehot([[2, 5, 1, 0]])
    emitted, n_emit = spec_accept(jax.random.key(1), drafts, q, p)
    assert int(n_emit[0]) == K
    assert list(np.asarray(emitted[0])) == [2, 5, 1, 7]


def test_spec_sample_step_greedy_equals_decode_step():
    """temps=0 through spec_sample_step emits exactly what
    spec_decode_step does (same caches, same tokens)."""
    from quip_tpu.models import paged as PG
    from quip_tpu.serve.speculative import (spec_decode_step,
                                            spec_sample_step)
    cfg = get_config("opt-tiny")
    target = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(1), cfg)
    prompt = jnp.asarray([[5, 2, 9, 1]], jnp.int32)
    plen = jnp.asarray([4], jnp.int32)
    K = 3
    dc = PG.init_paged(1, 32, cfg, dtype=jnp.float32, hot=8, page=8)
    tc = PG.init_paged(1, 32, cfg, dtype=jnp.float32, hot=8, page=8)
    _, dc = PG.paged_prefill(draft, prompt, plen, dc, cfg)
    lg, tc = PG.paged_prefill(target, prompt, plen, tc, cfg)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
    em_g, ne_g, dh_g, th_g = spec_decode_step(draft, target, tok, dc, tc,
                                              cfg, cfg, K, page=8)
    em_s, ne_s, dh_s, th_s = spec_sample_step(
        draft, target, tok, dc, tc, cfg, cfg, K, jax.random.key(7),
        jnp.zeros((1,), jnp.float32), page=8)
    assert int(ne_g[0]) == int(ne_s[0])
    n = int(ne_g[0])
    assert list(np.asarray(em_g[0, :n])) == list(np.asarray(em_s[0, :n]))
    assert (np.asarray(dh_g.length) == np.asarray(dh_s.length)).all()
    assert (np.asarray(th_g.length) == np.asarray(th_s.length)).all()


def test_engine_speculative_sampling(tiny_engine_model=None):
    """Spec engine accepts sampling requests: reproducible across seeds,
    and a greedy slot sharing the batch stays exactly greedy."""
    from quip_tpu.serve.engine import Engine
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(3), cfg)
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=8, temperature=0.9,
                 top_p=0.9),
            dict(prompt=[7, 8], max_new_tokens=8)]         # greedy slot

    def run(seed):
        eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                     hot=8, page=8, draft=(draft, cfg), spec_k=3,
                     seed=seed)
        return [r.generated for r in eng.run(reqs)]

    a, b, c = run(11), run(11), run(12)
    assert a == b
    assert a[0] != c[0] or a[1] == c[1]   # sampling varies with seed
    want = _greedy_reference(params, cfg, [7, 8], 8)
    assert a[1][:8] == want and c[1][:8] == want


def test_make_self_draft():
    """Layer-skip self-draft: shares arrays, halves depth, and the spec
    engine with it still emits the exact greedy stream."""
    from quip_tpu.serve.engine import Engine
    from quip_tpu.serve.speculative import make_self_draft
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    dparams, dcfg = make_self_draft(params, cfg, 1)
    assert dcfg.n_layers == 1
    # sliced leaves are views over the target stack — no copies of the
    # non-block weights
    assert dparams["embed"] is params["embed"]
    with pytest.raises(ValueError):
        make_self_draft(params, cfg, cfg.n_layers + 1)
    eng = Engine(params, cfg, max_batch=1, max_seq=64, paged=True, hot=8,
                 page=8, draft=(dparams, dcfg), spec_k=3)
    [req] = eng.run([dict(prompt=[4, 2, 0], max_new_tokens=10)])
    want = _greedy_reference(params, cfg, [4, 2, 0], 10)
    assert req.generated[:10] == want


# -- chunked speculative decoding --------------------------------------------

def test_spec_decode_chunk_equals_sequential_steps():
    """One S-iteration chunk emits exactly what S sequential
    spec_decode_step calls emit (greedy, same caches)."""
    from quip_tpu.models import paged as PG
    from quip_tpu.serve.speculative import (spec_decode_chunk,
                                            spec_decode_step)
    cfg = get_config("opt-tiny")
    target = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(1), cfg)
    prompt = jnp.asarray([[5, 2, 9, 1]], jnp.int32)
    plen = jnp.asarray([4], jnp.int32)
    K, S = 2, 3
    dc = PG.init_paged(1, 64, cfg, dtype=jnp.float32, hot=16, page=8)
    tc = PG.init_paged(1, 64, cfg, dtype=jnp.float32, hot=16, page=8)
    _, dc = PG.paged_prefill(draft, prompt, plen, dc, cfg)
    lg, tc = PG.paged_prefill(target, prompt, plen, tc, cfg)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]

    ems, nes, dh, th, last, _ = spec_decode_chunk(draft, target, tok, dc,
                                                  tc, cfg, cfg, K, S,
                                                  page=8)
    chunk_stream = []
    for s in range(S):
        n = int(nes[0, s])
        chunk_stream += list(np.asarray(ems[0, s, :n]))

    seq_stream = []
    t = tok
    dcs, tcs = dc, tc
    for _ in range(S):
        em, ne, d_hot, t_hot = spec_decode_step(draft, target, t, dcs, tcs,
                                                cfg, cfg, K, page=8)
        n = int(ne[0])
        seq_stream += list(np.asarray(em[0, :n]))
        t = em[:, n - 1:n]
        dcs = PG.advance(dcs, d_hot)
        tcs = PG.advance(tcs, t_hot)
    assert chunk_stream == seq_stream, (chunk_stream, seq_stream)
    assert int(dh.length[0]) == int(dcs.hot_len[0])
    assert int(th.length[0]) == int(tcs.hot_len[0])
    # the device-resident frontier equals the last emitted token
    assert int(last[0, 0]) == chunk_stream[-1]


def test_engine_spec_chunked_greedy_parity():
    """Chunked spec engine (run(chunked=True)) emits the exact greedy
    stream across a request mix larger than the slot table."""
    from quip_tpu.serve.engine import Engine
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(4), cfg)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10], [11, 12]]
    budgets = [9, 4, 13, 3, 6]
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=16, page=8, draft=(draft, cfg), spec_k=2)
    got = eng.run([dict(prompt=p, max_new_tokens=n)
                   for p, n in zip(prompts, budgets)], chunked=True)
    for p, r, n in zip(prompts, got, budgets):
        want = _greedy_reference(params, cfg, p, n)
        assert r.generated[:n] == want, (p, r.generated, want)


def test_engine_spec_chunked_sampling():
    """Chunked stochastic spec: reproducible by seed; greedy slot exact."""
    from quip_tpu.serve.engine import Engine
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(4), cfg)
    reqs = [dict(prompt=[1, 2, 3], max_new_tokens=10, temperature=0.8,
                 top_p=0.95),
            dict(prompt=[7, 8], max_new_tokens=10)]

    def run(seed):
        eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                     hot=16, page=8, draft=(draft, cfg), spec_k=2,
                     seed=seed)
        return [r.generated for r in eng.run(reqs, chunked=True)]

    a, b = run(5), run(5)
    assert a == b
    want = _greedy_reference(params, cfg, [7, 8], 10)
    assert a[1][:10] == want
