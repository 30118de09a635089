"""Model-family forward-pass tests (OPT / Llama / BLOOM)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "bloom-tiny"])
def test_forward_shapes_and_finiteness(name):
    cfg = get_config(name)
    params = M.init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0, cfg.vocab_size)
    logits = M.forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "bloom-tiny"])
def test_init_params_host_matches_structure(name):
    """The streamed host init (30B+ host_offload path) must produce the
    SAME tree structure/shapes/dtypes as init_params, in numpy leaves,
    and a working forward."""
    cfg = get_config(name)
    ref = M.init_params(jax.random.key(0), cfg)
    host = M.init_params_host(cfg, seed=0)
    rleaves = jax.tree.leaves(ref)
    hleaves = jax.tree.leaves(host)
    assert (jax.tree.structure(ref) == jax.tree.structure(host))
    for r, h in zip(rleaves, hleaves):
        assert isinstance(h, np.ndarray)
        assert r.shape == h.shape and r.dtype == h.dtype, (r.shape, h.shape)
    tokens = jax.random.randint(jax.random.key(1), (1, 8), 0,
                                cfg.vocab_size)
    logits = M.forward(jax.tree.map(jnp.asarray, host), tokens, cfg)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "bloom-tiny"])
def test_causality(name):
    """Changing a future token must not affect earlier logits."""
    cfg = get_config(name)
    params = M.init_params(jax.random.key(0), cfg)
    t1 = jax.random.randint(jax.random.key(1), (1, 12), 0, cfg.vocab_size)
    t2 = t1.at[0, -1].set((t1[0, -1] + 1) % cfg.vocab_size)
    l1 = np.asarray(M.forward(params, t1, cfg))
    l2 = np.asarray(M.forward(params, t2, cfg))
    np.testing.assert_allclose(l1[0, :-1], l2[0, :-1], atol=1e-5)
    assert np.abs(l1[0, -1] - l2[0, -1]).max() > 1e-6


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny", "bloom-tiny"])
def test_decode_matches_forward(name):
    """Token-by-token decode with KV cache must reproduce the full forward
    logits (the serving path's correctness contract)."""
    cfg = get_config(name)
    params = M.init_params(jax.random.key(0), cfg)
    S = 10
    tokens = jax.random.randint(jax.random.key(2), (1, S), 0, cfg.vocab_size)
    full = np.asarray(M.forward(params, tokens, cfg))

    caches = M.init_caches(1, 16, cfg)
    step = jax.jit(lambda tk, c: M.decode_step(params, tk, c, cfg))
    outs = []
    for i in range(S):
        logits, caches = step(tokens[:, i:i + 1], caches)
        outs.append(np.asarray(logits))
    dec = np.stack(outs, axis=1)[0]
    np.testing.assert_allclose(dec, full[0], atol=2e-4)


def test_opt350m_quirks():
    """OPT-350m: embed projection + post-LN + no final LN."""
    cfg = get_config("opt-350m")
    assert cfg.embed_proj_dim == 512
    assert not cfg.do_layer_norm_before
    # tiny clone of the quirky config
    from dataclasses import replace
    tiny = replace(cfg, vocab_size=128, d_model=32, n_layers=2, n_heads=4,
                   d_ff=64, embed_proj_dim=16, max_seq=64)
    params = M.init_params(jax.random.key(0), tiny)
    assert params["final_ln"] is None
    assert params["embed"]["proj_in"].shape == (16, 32)
    tokens = jax.random.randint(jax.random.key(1), (1, 8), 0, 128)
    logits = M.forward(params, tokens, tiny)
    assert logits.shape == (1, 8, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_gqa_llama70b_shape():
    """Grouped-query attention (n_kv_heads < n_heads)."""
    from dataclasses import replace
    cfg = replace(get_config("llama-2-70b"), vocab_size=64, d_model=64,
                  n_layers=1, n_heads=8, n_kv_heads=2, d_ff=128, max_seq=32)
    params = M.init_params(jax.random.key(0), cfg)
    assert params["blocks"]["attn"]["wk"].shape == (1, 64, 2 * 8)
    tokens = jax.random.randint(jax.random.key(1), (1, 8), 0, 64)
    logits = M.forward(params, tokens, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_taps_cover_all_linears():
    for name in ("opt-tiny", "llama-tiny", "bloom-tiny"):
        cfg = get_config(name)
        params = M.init_params(jax.random.key(0), cfg)
        layer0 = jax.tree.map(lambda x: x[0], params["blocks"])
        x = jax.random.normal(jax.random.key(1), (1, 8, cfg.d_model))
        pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
        _, _, taps = M.block_apply(layer0, x, cfg, pos, M.causal_mask(1, 8),
                                   with_taps=True)
        tap_names = {s.tap for s in M.linear_specs(cfg)}
        assert tap_names <= set(taps.keys())
        # every spec path resolves to a weight of the right fan-in
        for s in M.linear_specs(cfg):
            w = layer0
            for k in s.path:
                w = w[k]
            assert w.shape[0] == taps[s.tap].shape[-1]
