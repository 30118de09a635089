"""Cross-check against the ACTUAL reference implementation (torch, CPU).

The rest of the suite checks our solvers against independent NumPy
re-statements (tests/reference_impl.py). This file goes further: it
imports /root/reference/vector_balance.py and quant.py and runs THEM on
the same problems — our solvers vs the reference's own executable code.
No reference code is copied into this repo; it is invoked in place.

Tolerances: the reference dispatcher force-casts w to float32 inside
round_vecbal_Hsort (vector_balance.py:444) while keeping H in its input
dtype, so bit-exactness across frameworks isn't defined; we require
near-total integer-code agreement plus dequantized-output closeness
(differences only at floor boundaries, which the error-feedback then
keeps bounded).
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")
vb = pytest.importorskip("vector_balance")
refquant = pytest.importorskip("quant")

from quip_tpu.quantize.config import PreprocConfig, QuantConfig  # noqa: E402
from quip_tpu.quantize.pipeline import quantize_layer            # noqa: E402

NO_PRE = PreprocConfig(rescale=False, proj=False, gptqH=False)


def _problem(seed, m=8, d=48):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((m, d)).astype(np.float32)
    X = rng.standard_normal((4 * d, d)).astype(np.float32)
    H = (X.T @ X) / (4 * d) + 0.01 * np.eye(d, dtype=np.float32)
    return W, H


@pytest.mark.parametrize("qmethod,npasses,lazy", [
    ("ldlq", 0, False),
    ("ldlq", 2, False),
    ("ldlq", 0, True),           # reference lazy-batch block variant
    ("ldlqRG", 1, False),
    ("allbal", 2, False),
])
def test_qfnb_solvers_match_reference_code(qmethod, npasses, lazy):
    """quantize_layer (qfn-b, no preproc) vs the reference's own
    quantize_weight_vecbal on identical (W, H)."""
    W, H = _problem(seed=hash((qmethod, npasses, lazy)) % 1000)
    wbits = 2
    maxq = 2**wbits - 1

    ref = vb.quantize_weight_vecbal(
        torch.from_numpy(W.copy()), torch.from_numpy(H.copy()),
        nbits=wbits, npasses=npasses, scale=None, zero=None, maxq=maxq,
        unbiased=False, qfn="b", qmethod=qmethod, lazy_batch=lazy)
    ref = ref.float().numpy()

    cfg = QuantConfig(wbits=wbits, method=qmethod, npasses=npasses,
                      qfn="b", preproc=NO_PRE)
    res = quantize_layer(jnp.asarray(W), jnp.asarray(H), cfg,
                         jax.random.key(0))
    ours = np.asarray(res.W_hat, np.float32)

    scale = float(np.asarray(res.qfnb_scale))
    want_scale = 2.4 * np.sqrt((W**2).mean()) + 1e-16
    assert abs(scale - want_scale) < 1e-5 * want_scale

    # integer codes: reconstruct the reference's from its dequant output
    ref_codes = np.round(((ref / scale) + 1) / 2 * maxq)
    our_codes = np.asarray(res.codes, np.float64)
    agree = (ref_codes == our_codes).mean()
    assert agree >= 0.98, (qmethod, npasses, lazy, agree)
    # dequantized outputs: identical up to the reference's fp16 return
    # (and the rare boundary-flip codes counted above)
    step = 2 * scale / maxq
    close = np.abs(ours - ref) < 0.51 * step
    assert close.mean() >= 0.98
    np.testing.assert_allclose(np.sort(np.unique(our_codes)),
                               np.arange(maxq + 1), err_msg="code range")


@pytest.mark.parametrize("qmethod", ["ldlq", "allbal"])
def test_qfna_solvers_match_reference_code(qmethod):
    """qfn-a path: grid params from the reference's own Quantizer, rounding
    from both implementations."""
    W, H = _problem(seed=7)
    wbits = 4

    q = refquant.Quantizer()
    q.configure(bits=wbits, perchannel=True, sym=False, qfn="a", mse=False)
    q.find_params(torch.from_numpy(W.copy()), weight=True)
    ref = vb.quantize_weight_vecbal(
        torch.from_numpy(W.copy()), torch.from_numpy(H.copy()),
        nbits=wbits, npasses=1, scale=q.scale, zero=q.zero,
        maxq=q.maxq, unbiased=False, qfn="a", qmethod=qmethod,
        lazy_batch=False)
    ref = ref.float().numpy()

    cfg = QuantConfig(wbits=wbits, method=qmethod, npasses=1, qfn="a",
                      preproc=NO_PRE)
    res = quantize_layer(jnp.asarray(W), jnp.asarray(H), cfg,
                         jax.random.key(0))
    ours = np.asarray(res.W_hat, np.float32)

    # grid params must match the reference Quantizer exactly
    np.testing.assert_allclose(np.asarray(res.grid.scale).ravel(),
                               q.scale.numpy().ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.grid.zero).ravel(),
                               q.zero.numpy().ravel(), rtol=1e-5)

    scale = q.scale.numpy().reshape(-1, 1)
    close = np.abs(ours - ref) < 0.51 * scale
    assert close.mean() >= 0.98, close.mean()


def test_qfnb_scale_quirk_matches_reference():
    """The 2.4*RMS+1e-16 qfn-b scale is computed lazily at quantize time
    over the whole (possibly preprocessed) W — including the +1e-16
    epsilon (vector_balance.py:521-522)."""
    W = np.zeros((4, 16), np.float32)
    t = 2.4 * np.sqrt((W**2).mean()) + 1e-16
    ref = vb.quantize_weight_vecbal(
        torch.from_numpy(W.copy()),
        torch.from_numpy(np.eye(16, dtype=np.float32)),
        nbits=2, npasses=0, scale=None, zero=None, maxq=3,
        unbiased=False, qfn="b", qmethod="ldlq", lazy_batch=False)
    assert float(ref.abs().max()) <= t   # all-zero W stays ~zero


@pytest.mark.parametrize("shape", [(8, 16), (4, 6, 16), (5, 16, 3, 3)])
@pytest.mark.parametrize("perchannel", [True, False])
def test_find_params_act_matches_reference(shape, perchannel):
    """Activation-tensor grid finding (weight=False, 2-4D —
    quant.py:66-77,117-136): scales/zeros AND their broadcast shapes match
    the reference Quantizer exactly."""
    from quip_tpu.core.grid import find_params_qfna_act

    rng = np.random.default_rng(11)
    x = rng.standard_normal(shape).astype(np.float32) * 3.0

    q = refquant.Quantizer()
    q.configure(bits=4, perchannel=perchannel, sym=False, qfn="a", mse=False)
    q.find_params(torch.from_numpy(x.copy()), weight=False)

    g = find_params_qfna_act(jnp.asarray(x), 4, perchannel=perchannel)
    assert tuple(g.scale.shape) == tuple(q.scale.shape)
    np.testing.assert_allclose(np.asarray(g.scale), q.scale.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g.zero), q.zero.numpy(), rtol=1e-6)


def test_find_params_act_mse_matches_reference():
    """MSE grid-shrink search on an activation tensor (quant.py:95-114).

    Uses the zeroShot Quantizer (zeroShot/models/quant.py): the root
    quant.py's mse branch calls an undefined `quantize` (a latent
    reference bug — mse is unreachable through the root CLIs)."""
    import importlib.util

    from quip_tpu.core.grid import find_params_qfna_act

    spec = importlib.util.spec_from_file_location(
        "quant_zs_mse", "/root/reference/zeroShot/models/quant.py")
    refquant_zs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refquant_zs)

    rng = np.random.default_rng(13)
    x = rng.standard_normal((6, 24)).astype(np.float32)
    x[0, 0] = 40.0    # outlier: makes the shrink search actually shrink

    q = refquant_zs.Quantizer()
    q.configure(bits=3, perchannel=True, sym=False, mse=True)
    q.find_params(torch.from_numpy(x.copy()), weight=False)

    g = find_params_qfna_act(jnp.asarray(x), 3, perchannel=True, mse=True)
    np.testing.assert_allclose(np.asarray(g.scale), q.scale.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g.zero), q.zero.numpy(), rtol=1e-5)
