"""Paged two-level KV cache (models/paged.py): parity vs the arena path.

The paged decode must reproduce the standard ``decode_step`` arena path
(greedy tokens exactly, logits to fp tolerance) across model families
(RoPE / learned+offset / ALiBi), GQA, int8 KV quantization, flush
boundaries, and per-slot prefill with unequal prompt lengths.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.models import paged as P


def _params(cfg, seed=0):
    return M.init_params(jax.random.key(seed), cfg)


def _arena_chain(params, cfg, start_tokens, steps, max_len, quantized):
    """Greedy decode via the standard arena path. Returns (tokens, logits)."""
    B = start_tokens.shape[0]
    caches = M.init_caches(B, max_len, cfg, dtype=jnp.float32,
                           quantized=quantized)
    step = jax.jit(lambda p, t, c: M.decode_step(p, t, c, cfg))
    tok = jnp.asarray(start_tokens)[:, None]
    toks, logs = [], []
    for _ in range(steps):
        logits, caches = step(params, tok, caches)
        tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        toks.append(np.asarray(tok[:, 0]))
        logs.append(np.asarray(logits, np.float32))
    return np.stack(toks, 1), np.stack(logs, 1)


def _paged_chain(params, cfg, start_tokens, steps, capacity, hot, page,
                 quantized):
    """Greedy decode via the paged path, flushing whenever hot fills."""
    B = start_tokens.shape[0]
    caches = P.init_paged(B, capacity, cfg, dtype=jnp.float32,
                          quantized=quantized, hot=hot)
    step = jax.jit(lambda p, t, c: P.paged_decode_step(p, t, c, cfg,
                                                       page=page))
    flush = jax.jit(P.flush_hot)
    tok = jnp.asarray(start_tokens)[:, None]
    toks, logs = [], []
    for i in range(steps):
        logits, hot_state = step(params, tok, caches)
        caches = P.advance(caches, hot_state)
        if int(np.max(np.asarray(caches.hot_len))) >= hot:
            caches = flush(caches)
        tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        toks.append(np.asarray(tok[:, 0]))
        logs.append(np.asarray(logits, np.float32))
    return np.stack(toks, 1), np.stack(logs, 1)


@pytest.mark.parametrize("name", ["llama-tiny", "opt-tiny", "bloom-tiny"])
def test_paged_matches_arena(name):
    cfg = get_config(name)
    params = _params(cfg)
    start = np.array([3, 7], np.int32)
    steps = 24                         # crosses 3 flush boundaries (hot=8)
    t_ref, l_ref = _arena_chain(params, cfg, start, steps, 32, False)
    t_pg, l_pg = _paged_chain(params, cfg, start, steps, 32, 8, 16, False)
    np.testing.assert_array_equal(t_pg, t_ref)
    np.testing.assert_allclose(l_pg, l_ref, rtol=2e-4, atol=2e-4)


def test_paged_gqa():
    cfg = dataclasses.replace(get_config("llama-tiny"), n_kv_heads=2)
    params = _params(cfg)
    start = np.array([5], np.int32)
    t_ref, l_ref = _arena_chain(params, cfg, start, 20, 32, False)
    t_pg, l_pg = _paged_chain(params, cfg, start, 20, 32, 8, 8, False)
    np.testing.assert_array_equal(t_pg, t_ref)
    np.testing.assert_allclose(l_pg, l_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", ["llama-tiny", "bloom-tiny"])
def test_paged_int8_kv(name):
    """int8 codes are written identically in both paths (same quantize_kv at
    write time); only softmax association order differs."""
    cfg = get_config(name)
    params = _params(cfg)
    start = np.array([11, 2], np.int32)
    t_ref, l_ref = _arena_chain(params, cfg, start, 20, 32, True)
    t_pg, l_pg = _paged_chain(params, cfg, start, 20, 32, 8, 16, True)
    np.testing.assert_array_equal(t_pg, t_ref)
    np.testing.assert_allclose(l_pg, l_ref, rtol=1e-3, atol=1e-3)


def test_paged_prefill_teacher_forced():
    """paged_prefill + decode must match the full forward pass, per row,
    with unequal prompt lengths in one padded batch."""
    cfg = get_config("llama-tiny")
    params = _params(cfg)
    rng = np.random.default_rng(0)
    plens = [5, 9]
    S = 9
    prompts = [rng.integers(1, cfg.vocab_size, (p,)).astype(np.int32)
               for p in plens]
    padded = np.zeros((2, S), np.int32)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p

    caches = P.init_paged(2, 32, cfg, dtype=jnp.float32, hot=4)
    prefill = jax.jit(lambda pr, t, pl, c: P.paged_prefill(pr, t, pl, c, cfg))
    logits, caches = prefill(params, jnp.asarray(padded),
                             jnp.asarray(plens, jnp.int32), caches)
    step = jax.jit(lambda p, t, c: P.paged_decode_step(p, t, c, cfg, page=8))
    flush = jax.jit(P.flush_hot)

    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg))
    seqs = [list(p) for p in prompts]
    for _ in range(6):
        # teacher: per-row full forward at each row's own length
        want = []
        for i in range(2):
            row = jnp.asarray(np.asarray(seqs[i], np.int32))[None]
            want.append(np.asarray(fwd(params, row)[0, -1], np.float32))
        got = np.asarray(logits, np.float32)
        np.testing.assert_allclose(got, np.stack(want), rtol=5e-4, atol=5e-4)
        tok = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
        for i in range(2):
            seqs[i].append(int(tok[i]))
        logits, hot_state = step(params, tok[:, None], caches)
        caches = P.advance(caches, hot_state)
        if int(np.max(np.asarray(caches.hot_len))) >= 4:
            caches = flush(caches)


def test_paged_prefill_slot_admission():
    """Slot-wise prefill (continuous-batching admission) must not disturb
    other slots' cache state."""
    cfg = get_config("opt-tiny")
    params = _params(cfg)
    rng = np.random.default_rng(1)
    caches = P.init_paged(2, 32, cfg, dtype=jnp.float32, hot=4)

    p0 = rng.integers(1, cfg.vocab_size, (6,)).astype(np.int32)
    logits0, caches = P.paged_prefill_slot(
        params, jnp.asarray(p0)[None], jnp.asarray(6, jnp.int32), caches,
        jnp.asarray(0, jnp.int32), cfg)
    # decode 5 tokens on slot 0 only (slot 1 inactive, length 0)
    step = jax.jit(lambda p, t, c: P.paged_decode_step(p, t, c, cfg, page=8))
    flush = jax.jit(P.flush_hot)
    seq0 = list(p0)
    tok = np.zeros((2, 1), np.int32)
    tok[0, 0] = int(jnp.argmax(logits0))
    seq0.append(int(tok[0, 0]))
    for _ in range(5):
        logits, hot_state = step(params, jnp.asarray(tok), caches)
        caches = P.advance(caches, hot_state)
        if int(np.max(np.asarray(caches.hot_len))) >= 4:
            caches = flush(caches)
        tok[0, 0] = int(jnp.argmax(logits[0]))
        seq0.append(int(tok[0, 0]))
    # admit a request into slot 1 mid-flight; slot 0 state must be intact
    p1 = rng.integers(1, cfg.vocab_size, (3,)).astype(np.int32)
    logits1, caches = P.paged_prefill_slot(
        params, jnp.asarray(p1)[None], jnp.asarray(3, jnp.int32), caches,
        jnp.asarray(1, jnp.int32), cfg)
    tok[1, 0] = int(jnp.argmax(logits1))
    seq1 = list(p1) + [int(tok[1, 0])]
    for _ in range(4):
        logits, hot_state = step(params, jnp.asarray(tok), caches)
        caches = P.advance(caches, hot_state)
        if int(np.max(np.asarray(caches.hot_len))) >= 4:
            caches = flush(caches)
        tok[0, 0] = int(jnp.argmax(logits[0]))
        tok[1, 0] = int(jnp.argmax(logits[1]))
        seq0.append(tok[0, 0])
        seq1.append(tok[1, 0])
    # reference: teacher-forced full forward per sequence
    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg))
    for seq in (seq0, seq1):
        arr = jnp.asarray(np.asarray(seq, np.int32))[None]
        ref = np.asarray(jnp.argmax(fwd(params, arr)[0], -1))
        # every generated token must equal the teacher-forced greedy token
        # at its position (positions len(prompt)-1 .. end-1)
        plen = 6 if seq is seq0 else 3
        gen = np.asarray(seq[plen:], np.int64)
        np.testing.assert_array_equal(gen, ref[plen - 1: len(seq) - 1])


def test_paged_telescoped_big_pages():
    """Config where the 8x big-page loop actually runs (base > 8*page):
    parity vs the arena path across the big/small page boundary."""
    cfg = get_config("llama-tiny")
    params = _params(cfg)
    start = np.array([3, 7], np.int32)
    steps = 44                       # base reaches 40 > big=4*8=32... 8*4=32
    t_ref, l_ref = _arena_chain(params, cfg, start, steps, 64, False)
    t_pg, l_pg = _paged_chain(params, cfg, start, steps, 64, 4, 4, False)
    np.testing.assert_array_equal(t_pg, t_ref)
    np.testing.assert_allclose(l_pg, l_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", ["llama-tiny", "opt-tiny", "bloom-tiny"])
def test_paged_append_teacher_forced(name):
    """Feeding a fixed token sequence through paged_append_step in mixed
    window sizes must match the full forward pass at every position
    (causal-within-window + frozen/hot boundary + flushes)."""
    cfg = get_config(name)
    params = _params(cfg)
    rng = np.random.default_rng(3)
    seq = rng.integers(1, cfg.vocab_size, (2, 21)).astype(np.int32)

    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg))
    want = np.asarray(fwd(params, jnp.asarray(seq)), np.float32)

    caches = P.init_paged(2, 64, cfg, dtype=jnp.float32, hot=8)
    flush = jax.jit(P.flush_hot)
    got = []
    i = 0
    for S in (3, 1, 4, 2, 5, 1, 3, 2):      # mixed window sizes, sum 21
        window = jnp.asarray(seq[:, i:i + S])
        logits, hot_state = jax.jit(
            lambda p, t, c: P.paged_append_step(p, t, c, cfg, page=8)
        )(params, window, caches)
        caches = P.advance(caches, hot_state)
        if int(np.max(np.asarray(caches.hot_len))) > 8 - 5:
            caches = flush(caches)
        got.append(np.asarray(logits, np.float32))
        i += S
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_paged_append_gqa_int8():
    """S>1 window with GQA grouping and int8 KV."""
    cfg = dataclasses.replace(get_config("llama-tiny"), n_kv_heads=2)
    params = _params(cfg)
    rng = np.random.default_rng(4)
    seq = rng.integers(1, cfg.vocab_size, (1, 12)).astype(np.int32)
    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg))
    want = np.asarray(fwd(params, jnp.asarray(seq)), np.float32)

    caches = P.init_paged(1, 32, cfg, dtype=jnp.float32, hot=8,
                          quantized=True)
    flush = jax.jit(P.flush_hot)
    step = jax.jit(lambda p, t, c: P.paged_append_step(p, t, c, cfg, page=8))
    got = []
    i = 0
    for S in (4, 4, 4):
        logits, hot_state = step(params, jnp.asarray(seq[:, i:i + S]),
                                 caches)
        caches = P.advance(caches, hot_state)
        caches = flush(caches)
        got.append(np.asarray(logits, np.float32))
        i += S
    got = np.concatenate(got, axis=1)
    # int8 KV: the PROMPT keys are quantized here (unlike the fp teacher),
    # so compare greedy tokens rather than exact logits
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))


@pytest.mark.parametrize("quantized", [False, True])
def test_unrolled_step_matches_scan(quantized):
    """paged_append_step_unrolled (pre-split layer trees, python loop —
    the serving hot path after docs/PERF.md round 2) is numerically
    identical to the lax.scan form, incl. int8 KV and multi-token
    windows."""
    cfg = get_config("llama-tiny")
    params = _params(cfg)
    B, S = 2, 3
    caches = P.init_paged(B, 32, cfg, dtype=jnp.float32,
                          quantized=quantized, hot=8, page=8)
    caches = caches._replace(base=jnp.asarray([5, 9], jnp.int32))
    tokens = jax.random.randint(jax.random.key(2), (B, S), 0,
                                cfg.vocab_size)

    want_logits, want_hot = jax.jit(
        lambda p, t, c: P.paged_append_step(p, t, c, cfg, page=8))(
            params, tokens, caches)

    misc, layers = P.split_blocks(params)
    got_logits, got_hot = jax.jit(
        lambda m, ls, t, c: P.paged_append_step_unrolled(
            m, ls, t, c, cfg, page=8))(misc, layers, tokens, caches)

    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(want_logits, np.float32),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(got_hot), jax.tree.leaves(want_hot)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_unrolled_step_with_prefix():
    """Shared-prefix decode through the unrolled form."""
    cfg = get_config("llama-tiny")
    params = _params(cfg)
    pre_tokens = jnp.arange(1, 7, dtype=jnp.int32)
    _, prefix = P.build_prefix(params, pre_tokens, cfg)
    B = 2
    caches = P.init_paged(B, 32, cfg, dtype=jnp.float32, hot=8, page=8)
    tokens = jax.random.randint(jax.random.key(3), (B, 1), 0,
                                cfg.vocab_size)
    on = jnp.asarray([1, 0], jnp.int32)

    want, want_hot = jax.jit(
        lambda p, t, c: P.paged_decode_step(p, t, c, cfg, page=8,
                                            prefix=prefix, prefix_on=on))(
        params, tokens, caches)
    misc, layers = P.split_blocks(params)
    got, got_hot = jax.jit(
        lambda m, ls, t, c: P.paged_decode_step_unrolled(
            m, ls, t, c, cfg, page=8, prefix=prefix, prefix_on=on))(
        misc, layers, tokens, caches)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)
