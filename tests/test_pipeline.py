"""quantize_layer pipeline tests: full incoherence recipe, jit, vmap."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.core import ldlq
from quip_tpu.quantize.config import PreprocConfig, QuantConfig
from quip_tpu.quantize.pipeline import quantize_layer
from tests.conftest import make_psd_hessian


def _layer(rng, m=64, d=96):
    W = rng.standard_normal((m, d))
    H = make_psd_hessian(rng, d)
    return jnp.asarray(W), jnp.asarray(H)


@pytest.mark.parametrize("method", ["ldlq", "ldlqRG", "allbal", "nearest",
                                    "gptq"])
def test_incoherence_recipe(rng, method):
    """--wbits 2 --quant X --incoh_processing (opt.py:592-597)."""
    W, H = _layer(rng)
    npasses = 2 if method in ("ldlqRG", "allbal") else 0
    cfg = QuantConfig.incoherence(wbits=2, method=method, npasses=npasses)
    res = quantize_layer(W, H, cfg, jax.random.key(1))
    assert res.W_hat.shape == W.shape
    assert np.isfinite(float(res.error))
    if res.codes is not None:
        codes = np.asarray(res.codes)
        assert codes.max() <= 3 and codes.min() >= 0
    # quantization must be lossy but sane: relative error bounded
    rel = float(jnp.linalg.norm(res.W_hat - W) / jnp.linalg.norm(W))
    assert rel < 1.0


def test_ldlq_incoherence_beats_nearest_plain(rng):
    """The paper's core claim at 2 bits: LDLQ+incoherence has (much) lower
    proxy loss than plain nearest rounding."""
    W, H = _layer(rng, 96, 128)
    k = jax.random.key(2)
    res_q = quantize_layer(
        W, H, QuantConfig.incoherence(wbits=2, method="ldlq"), k
    )
    res_n = quantize_layer(
        W, H, QuantConfig(wbits=2, method="nearest", qfn="a"), k
    )
    # compare end-to-end reconstruction loss against the *same* original H
    l_q = float(ldlq.hessian_loss(res_q.W_hat - W, H))
    l_n = float(ldlq.hessian_loss(res_n.W_hat - W, H))
    assert l_q < l_n


def test_pipeline_jits(rng):
    W, H = _layer(rng, 32, 64)
    cfg = QuantConfig.incoherence(wbits=4, method="ldlq")
    f = jax.jit(lambda w, h, k: quantize_layer(w, h, cfg, k))
    res = f(W, H, jax.random.key(3))
    res2 = quantize_layer(W, H, cfg, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(res.W_hat),
                               np.asarray(res2.W_hat), atol=1e-6)


def test_pipeline_vmap_layer_stack(rng):
    """Batched quantization of a stack of same-shaped layers — the
    TPU-first replacement for the reference's serial per-layer loop."""
    nl, m, d = 3, 32, 64
    Ws = jnp.asarray(np.stack([np.asarray(_layer(rng, m, d)[0])
                               for _ in range(nl)]))
    Hs = jnp.asarray(np.stack([np.asarray(make_psd_hessian(rng, d))
                               for _ in range(nl)]))
    keys = jax.random.split(jax.random.key(4), nl)
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    f = jax.jit(jax.vmap(lambda w, h, k: quantize_layer(w, h, cfg, k)))
    res = f(Ws, Hs, keys)
    assert res.W_hat.shape == (nl, m, d)
    single = quantize_layer(Ws[0], Hs[0], cfg, keys[0])
    np.testing.assert_allclose(np.asarray(res.W_hat[0]),
                               np.asarray(single.W_hat), atol=1e-6)


def test_wbits16_passthrough_error_is_zero(rng):
    """16-bit ('no quantization') sanity: nearest on a 16-bit grid has tiny
    error."""
    W, H = _layer(rng, 16, 32)
    res = quantize_layer(W, H,
                         QuantConfig(wbits=8, method="nearest", qfn="a"),
                         jax.random.key(5))
    rel = float(jnp.linalg.norm(res.W_hat - W) / jnp.linalg.norm(W))
    assert rel < 2e-2


def test_unbiased_pipeline(rng):
    W, H = _layer(rng, 16, 32)
    cfg = QuantConfig.incoherence(wbits=4, method="ldlq", npasses=0,
                                  unbiased=True)
    res = quantize_layer(W, H, cfg, jax.random.key(6))
    assert np.isfinite(np.asarray(res.W_hat)).all()


def test_codes_roundtrip_qfnb(rng):
    """codes + qfnb scale + preproc state reconstruct W_hat exactly —
    the packed-checkpoint contract (pack/format.py relies on this)."""
    from quip_tpu.core import grid as grid_mod
    from quip_tpu.core import hessian as hess

    W, H = _layer(rng, 32, 64)
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    res = quantize_layer(W, H, cfg, jax.random.key(7))
    maxq = jnp.asarray(3.0, dtype=jnp.float64)
    # reconstruct: codes -> dequant in rotated space -> postproc
    Wr = grid_mod.from_grid_qfnb(res.codes.astype(jnp.float64),
                                 res.qfnb_scale, maxq)
    Wback, _ = hess.postproc(Wr, jnp.zeros_like(H), res.preproc)
    np.testing.assert_allclose(np.asarray(Wback), np.asarray(res.W_hat),
                               atol=1e-6)


def test_weight_entropy(rng):
    from quip_tpu.core.ldlq import weight_entropy
    codes = jnp.asarray(rng.integers(0, 4, (64, 64)))
    e = weight_entropy(codes, 2)
    assert 1.9 < e <= 2.0          # near-uniform 2-bit codes
    e1 = weight_entropy(jnp.zeros((8, 8)), 2)
    assert e1 == 0.0


def test_activation_quant(rng):
    from quip_tpu.ops.actquant import quantize_activations
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    for sym in (True, False):
        xq = quantize_activations(x, bits=8, per_token=True, sym=sym)
        rel = float(jnp.linalg.norm(xq - x) / jnp.linalg.norm(x))
        assert rel < 2e-2
    xq2 = quantize_activations(x, bits=2)
    assert len(np.unique(np.asarray(xq2[0]))) <= 4


def test_conv2d_weight_quant(rng):
    from quip_tpu.ops.actquant import quantize_conv2d_weight
    O, I, K = 16, 8, 3
    W = jnp.asarray(rng.standard_normal((O, I, K, K)))
    d = I * K * K
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=4, method="ldlq")
    Wq, res = quantize_conv2d_weight(W, H, cfg, jax.random.key(0))
    assert Wq.shape == W.shape
    rel = float(jnp.linalg.norm(Wq - W) / jnp.linalg.norm(W))
    assert rel < 0.5
