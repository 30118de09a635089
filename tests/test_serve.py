"""Serving engine + mesh sharding tests (8 virtual CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.engine import Engine


@pytest.fixture(scope="module")
def tiny_model():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    return cfg, params


def _greedy_reference(params, cfg, prompt, n_new):
    """Straight-line greedy generation via full forward re-runs."""
    toks = list(prompt)
    for _ in range(n_new):
        logits = M.forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_engine_greedy_matches_reference(tiny_model):
    cfg, params = tiny_model
    prompt = [1, 2, 3, 4, 5]
    n_new = 6
    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    [req] = eng.run([dict(prompt=prompt, max_new_tokens=n_new)])
    want = _greedy_reference(params, cfg, prompt, n_new)
    assert req.generated[:n_new] == want


def test_engine_continuous_batching(tiny_model):
    """More requests than slots; all must complete and match the
    single-request result."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    reqs = eng.run([dict(prompt=p, max_new_tokens=4) for p in prompts])
    assert len(reqs) == 4
    assert all(len(r.generated) >= 4 for r in reqs)
    for p, r in zip(prompts, reqs):
        want = _greedy_reference(params, cfg, p, 4)
        assert r.generated[:4] == want, (p, r.generated, want)


def test_engine_sampling_reproducible(tiny_model):
    cfg, params = tiny_model
    a = Engine(params, cfg, max_batch=1, max_seq=64, seed=7)
    b = Engine(params, cfg, max_batch=1, max_seq=64, seed=7)
    [ra] = a.run([dict(prompt=[3, 1], max_new_tokens=5, temperature=1.0)])
    [rb] = b.run([dict(prompt=[3, 1], max_new_tokens=5, temperature=1.0)])
    assert ra.generated == rb.generated


def test_engine_packed_model(tiny_model):
    """Engine over a packed 2-bit model produces the same tokens as the
    dense-dequantized quantized model."""
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg, params = tiny_model
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(params, cfg, calib,
                                  QuantConfig.incoherence(2, "ldlq"),
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    e_dense = Engine(qparams, cfg, max_batch=1, max_seq=64)
    e_pack = Engine(packed, cfg, max_batch=1, max_seq=64)
    [rd] = e_dense.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    [rp] = e_pack.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    assert rd.generated == rp.generated


# ---------------------------------------------------------------------------
# Mesh / sharding (the multi-chip story, on 8 virtual CPU devices)
# ---------------------------------------------------------------------------


def test_mesh_sharded_forward(tiny_model):
    from quip_tpu.parallel.mesh import make_mesh, shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = tiny_model
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    # column-parallel weight is actually sharded over tp
    wq = sharded["blocks"]["attn"]["wq"]
    assert not wq.sharding.is_fully_replicated
    tokens = jax.device_put(
        jnp.ones((4, 16), jnp.int32),
        NamedSharding(mesh, P("dp")))

    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        logits = fwd(sharded, tokens)
    want = M.forward(params, jnp.ones((4, 16), jnp.int32), cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-4)


def test_mesh_sharded_hessian_psum(tiny_model):
    """Data-parallel Hessian accumulation: per-shard xᵀx psummed over dp
    equals the global xᵀx (SURVEY.md §2.6)."""
    from quip_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, _ = tiny_model
    mesh = make_mesh(dp=8, tp=1)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((16, 32)).astype(np.float32)
    Xs = jax.device_put(jnp.asarray(X), NamedSharding(mesh, P("dp", None)))

    @jax.jit
    def acc(x):
        return x.T @ x     # GSPMD turns this into partial xᵀx + psum

    H = np.asarray(acc(Xs))
    np.testing.assert_allclose(H, X.T @ X, atol=1e-4)


def test_packed_params_shard(tiny_model):
    """Packed trees shard too (planes split over tp)."""
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.parallel.mesh import make_mesh, shard_params
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg, params = tiny_model
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(params, cfg, calib,
                                  QuantConfig.incoherence(2, "ldlq"),
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    mesh = make_mesh(dp=1, tp=2)
    sharded = shard_params(packed, cfg, mesh)
    wq = sharded["blocks"]["attn"]["wq"]
    assert not wq.planes[0].sharding.is_fully_replicated
    tokens = jnp.ones((1, 8), jnp.int32)
    logits = jax.jit(lambda p, t: M.forward(p, t, cfg))(sharded, tokens)
    want = M.forward(packed, tokens, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-4)


def test_sequence_sharded_prefill(tiny_model):
    """Long-context prefill with the sequence axis sharded over the mesh
    must match the unsharded forward (GSPMD inserts the attention
    collectives)."""
    from quip_tpu.parallel.mesh import make_mesh, seq_sharded_spec, \
        shard_params
    from jax.sharding import NamedSharding

    cfg, params = tiny_model
    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, cfg, mesh)
    tokens = jnp.tile(jnp.arange(32, dtype=jnp.int32)[None], (2, 1))
    tok_sharded = jax.device_put(
        tokens, NamedSharding(mesh, seq_sharded_spec()))
    logits = jax.jit(lambda p, t: M.forward(p, t, cfg))(sharded, tok_sharded)
    want = M.forward(params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-4)


def test_pipeline_layer_sharding(tiny_model):
    """Layer-axis ('pp') sharding: blocks distributed across devices, same
    logits (parity with the reference's opt_multigpu layer distribution,
    done the GSPMD way)."""
    from quip_tpu.parallel.mesh import make_pp_mesh, shard_params_pp

    cfg, params = tiny_model    # 2 layers -> pp=2
    mesh = make_pp_mesh(pp=2)
    sharded = shard_params_pp(params, cfg, mesh)
    wq = sharded["blocks"]["attn"]["wq"]
    assert not wq.sharding.is_fully_replicated
    tokens = jnp.ones((1, 8), jnp.int32)
    logits = jax.jit(lambda p, t: M.forward(p, t, cfg))(sharded, tokens)
    want = M.forward(params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-4)


def test_engine_stream(tiny_model):
    """Streaming generator yields the same tokens as run()."""
    cfg, params = tiny_model
    e1 = Engine(params, cfg, max_batch=2, max_seq=64)
    toks = list(e1.stream([1, 2, 3], max_new_tokens=5))
    e2 = Engine(params, cfg, max_batch=2, max_seq=64)
    [req] = e2.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    assert toks == req.generated


def test_engine_chunked_matches_per_step(tiny_model):
    """step_chunk (multi-token lax.scan decode) == per-token step()."""
    cfg, params = tiny_model
    prompts = [[1, 2, 3], [9, 8]]
    a = Engine(params, cfg, max_batch=2, max_seq=64)
    ra = a.run([dict(prompt=p, max_new_tokens=9) for p in prompts],
               chunked=True)
    b = Engine(params, cfg, max_batch=2, max_seq=64)
    rb = b.run([dict(prompt=p, max_new_tokens=9) for p in prompts],
               chunked=False)
    for x, y in zip(ra, rb):
        assert x.generated == y.generated


def test_decode_scan_matches_decode_step(tiny_model):
    cfg, params = tiny_model
    B, T = 2, 5
    caches = M.init_caches(B, 32, cfg)
    tok = jnp.asarray([[3], [7]], jnp.int32)
    # warm the cache with one step so lengths > 0
    logits, caches = M.decode_step(params, tok, caches, cfg)
    nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

    toks_scan, _ = M.decode_scan(params, nxt, caches, cfg, T)

    toks_loop = []
    t, c = nxt, caches
    for _ in range(T):
        lg, c = M.decode_step(params, t, c, cfg)
        t = jnp.argmax(lg, -1).astype(jnp.int32)[:, None]
        toks_loop.append(np.asarray(t[:, 0]))
    np.testing.assert_array_equal(np.asarray(toks_scan),
                                  np.stack(toks_loop, axis=1))


def test_quantized_kv_cache_decode_close(tiny_model):
    """int8 KV cache decode logits stay close to the fp cache path."""
    cfg, params = tiny_model
    B = 2
    tok = jnp.asarray([[3], [11]], jnp.int32)
    c_fp = M.init_caches(B, 32, cfg)
    c_q = M.init_caches(B, 32, cfg, quantized=True)
    assert c_q.k.dtype == jnp.int8 and c_q.ks is not None
    lf, cf = M.decode_step(params, tok, c_fp, cfg)
    lq, cq = M.decode_step(params, tok, c_q, cfg)
    for _ in range(4):
        nf = jnp.argmax(lf, -1).astype(jnp.int32)[:, None]
        lf, cf = M.decode_step(params, nf, cf, cfg)
        lq, cq = M.decode_step(params, nf, cq, cfg)   # same token stream
    lf = np.asarray(lf, np.float32)
    lq = np.asarray(lq, np.float32)
    # int8 per-(position, head) quantization error is ~0.4%; logits of the
    # tiny random model are O(1)
    np.testing.assert_allclose(lq, lf, rtol=0.05, atol=0.05)


def test_engine_kv_quant_generates(tiny_model):
    """kv_quant engine completes and (on this tiny model) matches fp
    greedy token-for-token."""
    cfg, params = tiny_model
    prompts = [[1, 2, 3], [7, 6]]
    a = Engine(params, cfg, max_batch=2, max_seq=64, kv_quant=True)
    ra = a.run([dict(prompt=p, max_new_tokens=6) for p in prompts])
    b = Engine(params, cfg, max_batch=2, max_seq=64)
    rb = b.run([dict(prompt=p, max_new_tokens=6) for p in prompts])
    assert all(len(r.generated) >= 6 for r in ra)
    same = sum(x.generated == y.generated for x, y in zip(ra, rb))
    # greedy decoding is robust to the small int8 cache error; require
    # at least one stream identical and all streams completed
    assert same >= 1, (ra[0].generated, rb[0].generated)


def test_pp_tp_combined_sharding(tiny_model):
    """2-D (pp, tp) placement: layer axis over pp, features over tp —
    forward must match the unsharded model (dense AND packed trees)."""
    import numpy as np

    from quip_tpu.parallel.mesh import make_mesh_pp_tp, shard_params_pp_tp

    cfg, params = tiny_model
    if cfg.n_layers % 2:
        pytest.skip("needs even layer count")
    mesh = make_mesh_pp_tp(pp=2, tp=2)
    tokens = jnp.asarray(np.arange(24).reshape(2, 12) % cfg.vocab_size,
                         jnp.int32)
    want = np.asarray(M.forward(params, tokens, cfg))

    sharded = shard_params_pp_tp(params, cfg, mesh)
    got = np.asarray(jax.jit(lambda p, t: M.forward(p, t, cfg))(
        sharded, tokens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # packed tree on the same mesh
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    rng_t = np.random.default_rng(0)
    calib = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (4, 16)),
                        jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(9), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    want_q = np.asarray(M.forward(packed, tokens, cfg))
    packed_sh = shard_params_pp_tp(packed, cfg, mesh)
    got_q = np.asarray(jax.jit(lambda p, t: M.forward(p, t, cfg))(
        packed_sh, tokens))
    np.testing.assert_allclose(got_q, want_q, rtol=2e-4, atol=2e-4)


def test_engine_kv_quant_chunked(tiny_model):
    """kv_quant + chunked decode compose."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, kv_quant=True)
    reqs = eng.run([dict(prompt=[2, 4, 6], max_new_tokens=9)], chunked=True)
    assert len(reqs[0].generated) >= 9


@pytest.mark.parametrize("name", ["llama-tiny", "bloom-tiny"])
def test_engine_greedy_all_families(name):
    """Engine decode (RoPE and ALiBi cache paths) matches straight-line
    greedy for the non-OPT families too."""
    cfg = get_config(name)
    params = M.init_params(jax.random.key(3), cfg)
    prompt = [2, 5, 8]
    n_new = 5
    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    [req] = eng.run([dict(prompt=prompt, max_new_tokens=n_new)])
    want = _greedy_reference(params, cfg, prompt, n_new)
    assert req.generated[:n_new] == want, (name, req.generated, want)


@pytest.mark.parametrize("name", ["llama-tiny", "bloom-tiny"])
def test_engine_kv_quant_all_families(name):
    """int8 KV arenas work for RoPE and ALiBi paths."""
    cfg = get_config(name)
    params = M.init_params(jax.random.key(3), cfg)
    eng = Engine(params, cfg, max_batch=2, max_seq=64, kv_quant=True)
    [req] = eng.run([dict(prompt=[2, 5, 8], max_new_tokens=5)])
    assert len(req.generated) >= 5


def test_packed_head_shards_replicated():
    """A --quant_head packed tree (unstacked lm_head PackedLinear) must
    shard: the head's children are replicated (its output rotation mixes
    the whole m axis) while block planes still split over tp."""
    from quip_tpu.pack.format import PackedLinear
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.parallel.mesh import make_mesh, shard_params
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("llama-tiny")
    params = M.init_params(jax.random.key(31), cfg)
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(params, cfg, calib,
                                  QuantConfig.incoherence(2, "ldlq"),
                                  jax.random.key(32), chunk=4,
                                  quant_head=True)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    assert isinstance(packed["lm_head"], PackedLinear)
    mesh = make_mesh(dp=1, tp=2)
    sharded = shard_params(packed, cfg, mesh)   # crashed before the fix
    assert sharded["lm_head"].planes[0].sharding.is_fully_replicated
    assert not sharded["blocks"]["attn"]["wq"] \
        .planes[0].sharding.is_fully_replicated
    tokens = jnp.ones((1, 8), jnp.int32)
    logits = jax.jit(lambda p, t: M.forward(p, t, cfg))(sharded, tokens)
    want = M.forward(packed, tokens, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               atol=1e-4)


def test_engine_paged_matches_arena(tiny_model):
    """Paged engine (two-level KV) == arena engine, greedy, with more
    requests than slots, small hot ring (flush boundaries crossed) and a
    small page size (page loop exercised)."""
    cfg, params = tiny_model
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    a = Engine(params, cfg, max_batch=2, max_seq=48)
    ra = a.run([dict(prompt=p, max_new_tokens=7) for p in prompts])
    b = Engine(params, cfg, max_batch=2, max_seq=48, paged=True, hot=4,
               page=8)
    rb = b.run([dict(prompt=p, max_new_tokens=7) for p in prompts])
    for x, y in zip(ra, rb):
        assert x.generated == y.generated


def test_engine_paged_chunked(tiny_model):
    """Paged chunked decode (hot-ring scan carry) == paged per-step."""
    cfg, params = tiny_model
    prompts = [[1, 2, 3], [9, 8]]
    a = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=8,
               page=8)
    ra = a.run([dict(prompt=p, max_new_tokens=11) for p in prompts],
               chunked=True)
    b = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=8,
               page=8)
    rb = b.run([dict(prompt=p, max_new_tokens=11) for p in prompts],
               chunked=False)
    for x, y in zip(ra, rb):
        assert x.generated == y.generated


def test_engine_paged_kv_quant(tiny_model):
    """Paged + int8 KV engine still greedy-matches the reference forward."""
    cfg, params = tiny_model
    prompt = [1, 2, 3, 4, 5]
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=4,
                 page=8, kv_quant=True, cache_dtype=jnp.bfloat16)
    [req] = eng.run([dict(prompt=prompt, max_new_tokens=6)])
    want = _greedy_reference(params, cfg, prompt, 6)
    assert req.generated[:6] == want


def test_engine_paged_stream(tiny_model):
    cfg, params = tiny_model
    e1 = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=4)
    toks = list(e1.stream([1, 2, 3], max_new_tokens=5))
    e2 = Engine(params, cfg, max_batch=2, max_seq=64)
    [req] = e2.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    assert toks == req.generated


def test_paged_sharded_matches_unsharded(tiny_model):
    """Paged decode under a dp x tp mesh == unsharded paged decode."""
    from quip_tpu.models import paged as P
    from quip_tpu.parallel.mesh import make_mesh, shard_params, shard_paged

    cfg, params = tiny_model
    B = 4
    tok = jnp.asarray(np.arange(1, B + 1)[:, None], jnp.int32)

    def chain(params, caches, steps=10, page=8):
        step = jax.jit(lambda p, t, c: P.paged_decode_step(p, t, c, cfg,
                                                           page=page))
        flush = jax.jit(P.flush_hot)
        t = tok
        outs = []
        for i in range(steps):
            logits, hot_s = step(params, t, caches)
            caches = P.advance(caches, hot_s)
            if (i + 1) % 4 == 0:
                caches = flush(caches)
            t = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            outs.append(np.asarray(logits, np.float32))
        return np.stack(outs)

    base = chain(params, P.init_paged(B, 32, cfg, dtype=jnp.float32, hot=4))

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_paged(P.init_paged(B, 32, cfg, dtype=jnp.float32, hot=4),
                     mesh)
    sharded = chain(sp, sc)
    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=2e-4)


def test_paged_prefix_sharded_matches_unsharded(tiny_model):
    """Shared-prefix decode under a dp x tp mesh == unsharded (prefix
    kv_heads shard over tp alongside the per-slot caches)."""
    from quip_tpu.models import paged as P
    from quip_tpu.parallel.mesh import (make_mesh, shard_paged,
                                        shard_params, shard_prefix)

    cfg, params = tiny_model
    B = 4
    pre = [3, 1, 4, 1, 5]
    tok = jnp.asarray(np.arange(1, B + 1)[:, None], jnp.int32)
    on = jnp.asarray([1, 1, 0, 1], jnp.int32)

    def chain(params, caches, prefix, steps=6, page=8):
        step = jax.jit(lambda p, t, c, pre: P.paged_decode_step(
            p, t, c, cfg, page=page, prefix=pre, prefix_on=on))
        t = tok
        outs = []
        for i in range(steps):
            logits, hot_s = step(params, t, caches, prefix)
            caches = P.advance(caches, hot_s)
            if (i + 1) % 3 == 0:
                caches = P.flush_hot(caches)
            t = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
            outs.append(np.asarray(logits, np.float32))
        return np.stack(outs)

    _, prefix = P.build_prefix(params, pre, cfg)
    base = chain(params, P.init_paged(B, 32, cfg, dtype=jnp.float32, hot=4),
                 prefix)

    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, cfg, mesh)
    sc = shard_paged(P.init_paged(B, 32, cfg, dtype=jnp.float32, hot=4),
                     mesh)
    sharded = chain(sp, sc, shard_prefix(prefix, mesh))
    np.testing.assert_allclose(sharded, base, rtol=2e-4, atol=2e-4)


def test_engine_rejects_oversized_prompt(tiny_model):
    cfg, params = tiny_model
    for paged in (False, True):
        eng = Engine(params, cfg, max_batch=1, max_seq=16, paged=paged,
                     hot=4, page=8)
        with pytest.raises(ValueError, match="max_seq"):
            eng.submit(list(range(1, 17)))
        with pytest.raises(ValueError, match="empty"):
            eng.submit([])
        # boundary: longest admissible prompt still generates
        [req] = eng.run([dict(prompt=list(range(1, 15)),
                              max_new_tokens=4)])
        assert len(req.generated) >= 1


@pytest.mark.parametrize("paged,chunked", [(False, False), (True, False),
                                           (True, True)])
def test_engine_fuzz_greedy_parity(tiny_model, paged, chunked):
    """Random request mix (lengths, budgets) through continuous batching:
    every completed request must match its teacher-forced greedy tokens —
    catches admission/retirement/flush bookkeeping bugs."""
    cfg, params = tiny_model
    rng = np.random.default_rng(7)
    eng = Engine(params, cfg, max_batch=3, max_seq=48, paged=paged,
                 hot=4, page=8)
    prompts, budgets = [], []
    for _ in range(9):
        plen = int(rng.integers(1, 20))
        prompts.append(rng.integers(1, cfg.vocab_size, (plen,)).tolist())
        budgets.append(int(rng.integers(1, 12)))
    out = eng.run([dict(prompt=p, max_new_tokens=n)
                   for p, n in zip(prompts, budgets)], chunked=chunked)
    for p, n, r in zip(prompts, budgets, out):
        want = _greedy_reference(params, cfg, p, n)
        assert r.generated[:n] == want, (p, n, r.generated, want)


@pytest.mark.parametrize("chunked", [False, True])
def test_engine_fuzz_prefix_parity(tiny_model, chunked):
    """Random request mix with randomized shared-prefix opt-in: every
    completed request must match its teacher-forced greedy tokens on
    (prefix +) prompt — catches prefix admission/offset/retirement
    interleaving bugs across slot reuse and flushes."""
    cfg, params = tiny_model
    rng = np.random.default_rng(11)
    pre = rng.integers(1, cfg.vocab_size, (7,)).tolist()
    eng = Engine(params, cfg, max_batch=3, max_seq=64, paged=True,
                 hot=8, page=8, shared_prefix=pre)
    prompts, budgets, ons = [], [], []
    for _ in range(8):
        plen = int(rng.integers(1, 16))
        prompts.append(rng.integers(1, cfg.vocab_size, (plen,)).tolist())
        budgets.append(int(rng.integers(1, 10)))
        ons.append(bool(rng.integers(0, 2)))
    out = eng.run([dict(prompt=p, max_new_tokens=n, use_prefix=o)
                   for p, n, o in zip(prompts, budgets, ons)],
                  chunked=chunked)
    for p, n, o, r in zip(prompts, budgets, ons, out):
        want = _greedy_reference(params, cfg, (pre + p) if o else p, n)
        assert r.generated[:n] == want, (p, n, o, r.generated, want)


def test_engine_speculative_matches_plain(tiny_model):
    """Speculative continuous batching == plain greedy engine, including
    admissions mid-flight, ragged acceptance, budgets, and flushes."""
    cfg, params = tiny_model
    draft = M.init_params(jax.random.key(5), cfg)   # unrelated draft
    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10], [11, 12]]
    budgets = [7, 4, 9, 3, 6]
    plain = Engine(params, cfg, max_batch=2, max_seq=48, paged=True,
                   hot=8, page=8)
    want = plain.run([dict(prompt=p, max_new_tokens=n)
                      for p, n in zip(prompts, budgets)])
    spec = Engine(params, cfg, max_batch=2, max_seq=48, paged=True,
                  hot=8, page=8, draft=(draft, cfg), spec_k=3)
    got = spec.run([dict(prompt=p, max_new_tokens=n)
                    for p, n in zip(prompts, budgets)])
    for w, g, n in zip(want, got, budgets):
        assert g.generated[:n] == w.generated[:n], (w.generated, g.generated)


def test_engine_speculative_perfect_draft(tiny_model):
    """Draft == target: every step accepts spec_k tokens; output parity."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=1, max_seq=64, paged=True, hot=8,
                 page=8, draft=(params, cfg), spec_k=4)
    [req] = eng.run([dict(prompt=[1, 2, 3, 4, 5], max_new_tokens=10)])
    want = _greedy_reference(params, cfg, [1, 2, 3, 4, 5], 10)
    assert req.generated[:10] == want


def test_engine_speculative_accepts_sampling(tiny_model):
    """Spec engines serve sampling requests via rejection sampling
    (stochastic tests live in tests/test_speculative.py)."""
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=1, max_seq=32, paged=True, hot=8,
                 page=8, draft=(params, cfg), spec_k=2)
    [req] = eng.run([dict(prompt=[1, 2], max_new_tokens=6,
                          temperature=0.8, top_k=4)])
    assert len(req.generated) >= 6


def test_nucleus_sampling_support():
    """top_p masks sampling to the smallest prefix reaching the mass."""
    from quip_tpu.serve.engine import _sample
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = jnp.log(jnp.asarray(probs, jnp.float32))[None, :]
    # top_p = 0.8: mass before idx2 is exactly 0.8 -> support {0, 1}
    seen = set()
    for s in range(200):
        tok = _sample(jax.random.key(s), logits, jnp.asarray([1.0]),
                      top_p=jnp.asarray([0.8]))
        seen.add(int(tok[0]))
    assert seen == {0, 1}, seen
    # top_p = 1.0 (or None): full support reachable
    seen = set()
    for s in range(400):
        tok = _sample(jax.random.key(s), logits, jnp.asarray([1.0]),
                      top_p=jnp.asarray([1.0]))
        seen.add(int(tok[0]))
    assert seen == {0, 1, 2, 3}, seen
    # tiny top_p = argmax regardless of temperature
    for s in range(20):
        tok = _sample(jax.random.key(s), logits, jnp.asarray([5.0]),
                      top_p=jnp.asarray([0.05]))
        assert int(tok[0]) == 0
    # per-slot: one greedy row, one nucleus row, one full row in a batch
    batch = jnp.concatenate([logits] * 3, 0)
    tok = _sample(jax.random.key(0), batch, jnp.asarray([0.0, 1.0, 1.0]),
                  top_p=jnp.asarray([1.0, 0.5, 1.0]))
    assert int(tok[0]) == 0 and int(tok[1]) == 0


def test_nucleus_composes_with_top_k():
    from quip_tpu.serve.engine import _sample
    probs = np.array([0.4, 0.3, 0.2, 0.1])
    logits = jnp.log(jnp.asarray(probs, jnp.float32))[None, :]
    # top_k=3 keeps {0,1,2}; renormalized probs (0.44,0.33,0.22);
    # top_p=0.5 then keeps {0,1}
    seen = set()
    for s in range(300):
        tok = _sample(jax.random.key(s), logits, jnp.asarray([1.0]),
                      top_k=3, top_p=jnp.asarray([0.5]))
        seen.add(int(tok[0]))
    assert seen == {0, 1}, seen


def test_engine_top_p_run_reproducible(tiny_model):
    cfg, params = tiny_model
    a = Engine(params, cfg, max_batch=2, max_seq=64, seed=3)
    b = Engine(params, cfg, max_batch=2, max_seq=64, seed=3)
    reqs = [dict(prompt=[3, 1], max_new_tokens=5, temperature=0.9,
                 top_p=0.9),
            dict(prompt=[2, 4], max_new_tokens=5)]
    ra = a.run(reqs)
    rb = b.run(reqs)
    assert [r.generated for r in ra] == [r.generated for r in rb]
    # greedy slot unaffected by the nucleus slot sharing its batch
    want = _greedy_reference(params, cfg, [2, 4], 5)
    assert ra[1].generated[:5] == want


def test_engine_top_p_chunked(tiny_model):
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=8,
                 page=8, seed=5)
    reqs = eng.run([dict(prompt=[1, 2], max_new_tokens=8, temperature=1.0,
                         top_p=0.7)], chunked=True)
    assert len(reqs[0].generated) >= 8
    with pytest.raises(ValueError, match="top_p"):
        eng.submit([1], top_p=0.0)


def test_engine_stop_tokens(tiny_model):
    """Generation stops at (and includes) a stop token in every path."""
    cfg, params = tiny_model
    # greedy reference to learn what tokens actually appear
    want = _greedy_reference(params, cfg, [1, 2, 3], 8)
    stop_at = want[3]   # stop on the 4th generated token
    want_stopped = want[: want.index(stop_at) + 1]

    for kwargs in (dict(),                                # arena per-step
                   dict(paged=True, hot=8, page=8)):      # paged
        eng = Engine(params, cfg, max_batch=2, max_seq=64, **kwargs)
        [req] = eng.run([dict(prompt=[1, 2, 3], max_new_tokens=8,
                              stop=[stop_at])])
        assert req.generated == want_stopped, (kwargs, req.generated)
        # chunked path
        eng = Engine(params, cfg, max_batch=2, max_seq=64, **kwargs)
        [req] = eng.run([dict(prompt=[1, 2, 3], max_new_tokens=8,
                              stop=[stop_at])], chunked=True)
        assert req.generated == want_stopped, (kwargs, req.generated)


def test_engine_stop_tokens_spec(tiny_model):
    """Stop tokens through the speculative (chunked) engine; a slot that
    stops frees up for the next queued request."""
    cfg, params = tiny_model
    dparams = params
    want = _greedy_reference(params, cfg, [1, 2, 3], 8)
    stop_at = want[2]
    want_stopped = want[: want.index(stop_at) + 1]
    eng = Engine(params, cfg, max_batch=1, max_seq=64, paged=True, hot=16,
                 page=8, draft=(dparams, cfg), spec_k=2)
    reqs = eng.run([dict(prompt=[1, 2, 3], max_new_tokens=8,
                         stop=[stop_at]),
                    dict(prompt=[5, 6], max_new_tokens=4)], chunked=True)
    assert reqs[0].generated == want_stopped
    want2 = _greedy_reference(params, cfg, [5, 6], 4)
    assert reqs[1].generated[:4] == want2


def test_engine_stop_token_first(tiny_model):
    """A stop token appearing as the very first (prefill-sampled) token
    retires the request before any decode step."""
    cfg, params = tiny_model
    want = _greedy_reference(params, cfg, [1, 2, 3], 1)
    eng = Engine(params, cfg, max_batch=1, max_seq=64)
    [req] = eng.run([dict(prompt=[1, 2, 3], max_new_tokens=8,
                          stop=[want[0]])])
    assert req.generated == want[:1]


def test_engine_stats(tiny_model):
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=16,
                 page=8, draft=(params, cfg), spec_k=3)
    eng.run([dict(prompt=[1, 2, 3], max_new_tokens=6),
             dict(prompt=[4], max_new_tokens=4)], chunked=True)
    s = eng.stats()
    assert s["completed"] == 2 and s["active"] == 0 and s["queued"] == 0
    assert s["tokens"] >= 10
    assert 0 <= s["mean_ttft_s"] <= s["mean_request_s"]
    # perfect draft: every spec step emits spec_k tokens
    assert s["spec_emitted_mean"] == 3.0, s


# ---------------------------------------------------------------------------
# Shared-prefix (system prompt) caching
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "bloom-tiny"])
def test_paged_prefix_equals_inline(name):
    """Prefix + own cache == one cache prefilled with prefix+prompt, for
    all three position schemes (learned / RoPE / ALiBi)."""
    from quip_tpu.models import paged as PG
    cfg = get_config(name)
    params = M.init_params(jax.random.key(0), cfg)
    p, q = [3, 1, 4, 1, 5], [9, 2, 6, 8]

    _, prefix = PG.build_prefix(params, p, cfg)
    ca = PG.init_paged(1, 32, cfg, dtype=jnp.float32, hot=8, page=8)
    la, hot = PG.paged_append_step(params, jnp.asarray([q], jnp.int32), ca,
                                   cfg, page=8, prefix=prefix,
                                   prefix_on=jnp.asarray([1], jnp.int32))
    ca = PG.advance(ca, hot)
    la = la[:, -1, :]

    cb = PG.init_paged(1, 32, cfg, dtype=jnp.float32, hot=8, page=8)
    lb, cb = PG.paged_prefill(params, jnp.asarray([p + q], jnp.int32),
                              jnp.asarray([len(p + q)], jnp.int32), cb, cfg)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-4)

    tok_a = jnp.argmax(la, -1).astype(jnp.int32)[:, None]
    tok_b = jnp.argmax(lb, -1).astype(jnp.int32)[:, None]
    for _ in range(6):      # decode across a flush boundary
        la, hot = PG.paged_decode_step(params, tok_a, ca, cfg, page=8,
                                       prefix=prefix,
                                       prefix_on=jnp.asarray([1], jnp.int32))
        ca = PG.advance(ca, hot)
        if int(ca.hot_len[0]) >= 7:
            ca = PG.flush_hot(ca)
        lb, hotb = PG.paged_decode_step(params, tok_b, cb, cfg, page=8)
        cb = PG.advance(cb, hotb)
        if int(cb.hot_len[0]) >= 7:
            cb = PG.flush_hot(cb)
        tok_a = jnp.argmax(la, -1).astype(jnp.int32)[:, None]
        tok_b = jnp.argmax(lb, -1).astype(jnp.int32)[:, None]
        assert int(tok_a[0, 0]) == int(tok_b[0, 0])


def test_engine_shared_prefix(tiny_model):
    """Engine(shared_prefix=p) greedy streams == plain greedy on p+prompt;
    mixed prefix/non-prefix slots; slot reuse resets the flag; prompts
    longer than the hot ring stream through chunked admission."""
    cfg, params = tiny_model
    p = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True, hot=8,
                 page=8, shared_prefix=p)
    long_prompt = [7, 2, 9, 1, 8, 8, 1, 2, 3, 4, 5]   # > hot: chunked admit
    reqs = eng.run([dict(prompt=long_prompt, max_new_tokens=8),
                    dict(prompt=[8, 8, 8], max_new_tokens=8,
                         use_prefix=False)])
    assert reqs[0].generated[:8] == _greedy_reference(
        params, cfg, p + long_prompt, 8)
    assert reqs[1].generated[:8] == _greedy_reference(params, cfg,
                                                      [8, 8, 8], 8)
    # slot reuse (3 requests, 2 slots) + chunked decode path
    reqs = eng.run([dict(prompt=[7, 2], max_new_tokens=6),
                    dict(prompt=[1], max_new_tokens=6, use_prefix=False),
                    dict(prompt=[5, 5, 5], max_new_tokens=6)],
                   chunked=True)
    assert reqs[0].generated[:6] == _greedy_reference(params, cfg,
                                                      p + [7, 2], 6)
    assert reqs[1].generated[:6] == _greedy_reference(params, cfg, [1], 6)
    assert reqs[2].generated[:6] == _greedy_reference(params, cfg,
                                                      p + [5, 5, 5], 6)


def test_engine_shared_prefix_kv_quant(tiny_model):
    """int8 KV cache composes with the shared prefix (prefix scales fold
    around the attention dots like the cache scales)."""
    cfg, params = tiny_model
    p = [3, 1, 4, 1, 5]
    a = Engine(params, cfg, max_batch=1, max_seq=64, paged=True, hot=8,
               page=8, shared_prefix=p, kv_quant=True)
    b = Engine(params, cfg, max_batch=1, max_seq=64, paged=True, hot=8,
               page=8, kv_quant=True)
    [ra] = a.run([dict(prompt=[7, 2], max_new_tokens=6)])
    [rb] = b.run([dict(prompt=p + [7, 2], max_new_tokens=6)])
    assert ra.generated[:6] == rb.generated[:6]


def test_engine_prefix_validation(tiny_model):
    cfg, params = tiny_model
    eng = Engine(params, cfg, max_batch=1, max_seq=32, paged=True, hot=8,
                 page=8)
    with pytest.raises(ValueError, match="use_prefix"):
        eng.submit([1, 2], use_prefix=True)


def test_engine_shared_prefix_spec(tiny_model):
    """Shared prefix composes with speculative decoding: a perfect draft
    (== target) through both prefix caches emits exactly the plain greedy
    stream on prefix+prompt, in the per-step and chunked spec paths."""
    cfg, params = tiny_model
    p = [3, 1, 4, 1, 5, 9, 2, 6]
    prompts = [[7, 2], [8, 8, 8]]
    for chunked in (False, True):
        eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                     hot=16, page=8, draft=(params, cfg), spec_k=3,
                     shared_prefix=p)
        reqs = eng.run([dict(prompt=q, max_new_tokens=6) for q in prompts],
                       chunked=chunked)
        for q, r in zip(prompts, reqs):
            want = _greedy_reference(params, cfg, p + q, 6)
            assert r.generated[:6] == want, (chunked, q, r.generated, want)
        # perfect draft: every spec step emits spec_k tokens
        assert eng.stats()["spec_emitted_mean"] == 3.0


def test_engine_shared_prefix_spec_self_draft(tiny_model):
    """Layer-skip self-draft + shared prefix: the draft's own prefix is
    built from the sliced blocks; the emitted stream stays target-exact
    (verification guarantees exactness at any acceptance rate)."""
    from quip_tpu.serve.speculative import make_self_draft
    cfg, params = tiny_model
    p = [3, 1, 4, 1, 5]
    draft = make_self_draft(params, cfg, 1)
    eng = Engine(params, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=16, page=8, draft=draft, spec_k=3, shared_prefix=p)
    reqs = eng.run([dict(prompt=[7, 2], max_new_tokens=6),
                    dict(prompt=[6, 6], max_new_tokens=6,
                         use_prefix=False)], chunked=True)
    assert reqs[0].generated[:6] == _greedy_reference(params, cfg,
                                                      p + [7, 2], 6)
    assert reqs[1].generated[:6] == _greedy_reference(params, cfg,
                                                      [6, 6], 6)
