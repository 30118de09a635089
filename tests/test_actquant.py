"""ActQuant activation-quantization wrapper (ops/actquant.py) — reference
ActQuantWrapper/add_actquant parity (zeroShot/models/quant.py:134-177)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.ops import actquant as AQ
from quip_tpu.ops.qlinear import linear_apply


def test_uncalibrated_is_identity():
    """scale == 0 => not ready => forward unchanged (reference ready())."""
    w = jax.random.normal(jax.random.key(0), (16, 8))
    x = jax.random.normal(jax.random.key(1), (4, 16))
    aq = AQ.wrap_actquant(w, bits=4)
    np.testing.assert_array_equal(np.asarray(linear_apply(aq, x)),
                                  np.asarray(x @ w))


def test_calibrated_quantizes_on_grid():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    aq = AQ.find_params(AQ.wrap_actquant(w, bits=4), x)
    xq = aq.quantize(x)
    # on-grid: requantizing is a fixed point
    np.testing.assert_allclose(np.asarray(aq.quantize(xq)), np.asarray(xq),
                               rtol=1e-6, atol=1e-6)
    # 4-bit per-channel grid keeps values roughly right
    assert float(jnp.mean(jnp.abs(xq - x))) < 0.2
    # 8-bit is much tighter than 2-bit
    e8 = AQ.find_params(AQ.wrap_actquant(w, bits=8), x).quantize(x) - x
    e2 = AQ.find_params(AQ.wrap_actquant(w, bits=2), x).quantize(x) - x
    assert float(jnp.abs(e8).mean()) < 0.1 * float(jnp.abs(e2).mean())


@pytest.mark.parametrize("name", ["opt-tiny", "llama-tiny"])
def test_model_tree_actquant(name):
    """add_actquant + calibrate on a full model: 8-bit activations leave
    logits close; uncalibrated tree is exactly the base model."""
    cfg = get_config(name)
    params = M.init_params(jax.random.key(0), cfg)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, (2, 12)),
        jnp.int32)
    base = M.forward(params, toks, cfg)

    wrapped = AQ.add_actquant(params, cfg, bits=8)
    np.testing.assert_array_equal(np.asarray(M.forward(wrapped, toks, cfg)),
                                  np.asarray(base))

    calib = AQ.calibrate_actquant(wrapped, cfg, toks)
    out = M.forward(calib, toks, cfg)
    err = float(jnp.mean(jnp.abs(out - base)) / jnp.mean(jnp.abs(base)))
    assert err < 0.05, err
    # and it actually quantized something
    assert not np.array_equal(np.asarray(out), np.asarray(base))


def test_actquant_decode_path():
    """Wrapped tree runs through the KV-cache decode path."""
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    toks = jnp.asarray(
        np.random.default_rng(1).integers(1, cfg.vocab_size, (1, 10)),
        jnp.int32)
    calib = AQ.calibrate_actquant(AQ.add_actquant(params, cfg, bits=8),
                                  cfg, toks)
    caches = M.init_caches(1, 16, cfg)
    tok = jnp.asarray([[3]], jnp.int32)
    for _ in range(4):
        logits, caches = M.decode_step(calib, tok, caches, cfg)
        tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    assert np.isfinite(np.asarray(logits, np.float32)).all()
