"""method="trueobs" vs the reference's own TrueOBS solver (torch, CPU).

Imports /root/reference/zeroShot/models/fast_trueobs.py and runs it in
place (no reference code is copied). The reference class accumulates a
RUNNING-AVERAGE Hessian (fast_trueobs.py:52-56) where this framework uses
the sum form everywhere; the OPTQ recursion is invariant to scaling H
(U -> U/sqrt(c) and the err·U row products cancel; percdamp uses
mean(diag), also scale-free), so we hand the torch side a deliberately
re-scaled H to prove parity AND the invariance claim in one test.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn


def _load(name, path):
    """Load a reference module by exact file path. fast_trueobs does
    `from quant import *` expecting its SIBLING zeroShot/models/quant.py;
    the root /root/reference/quant.py (imported by test_reference_parity)
    would otherwise shadow it in sys.modules."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_prev_quant = sys.modules.get("quant")
refquant_zs = _load("quant", "/root/reference/zeroShot/models/quant.py")
fast_trueobs = _load("fast_trueobs",
                     "/root/reference/zeroShot/models/fast_trueobs.py")
# restore whatever `quant` the parity tests had (root quant.py) — the
# symbols fast_trueobs needed were copied at its import
if _prev_quant is not None:
    sys.modules["quant"] = _prev_quant
else:
    sys.modules.pop("quant", None)

from quip_tpu.quantize.config import PreprocConfig, QuantConfig  # noqa: E402
from quip_tpu.quantize.pipeline import quantize_layer            # noqa: E402

GPTQH_ONLY = PreprocConfig(gptqH=True, percdamp=0.01)

# fasterquant unconditionally calls torch.cuda.synchronize()
# (fast_trueobs.py:157); make it a no-op on the CPU-only torch here
torch.cuda.synchronize = lambda *a, **k: None


def _problem(seed, m=12, d=32, n=256):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(m, d)).astype(np.float32)
    X = rng.normal(size=(n, d)).astype(np.float32)
    H = (X.T @ X / n).astype(np.float32)
    return W, H


@pytest.mark.parametrize("sparseout", [False, True])
@pytest.mark.parametrize("blocksize", [8, 128])
def test_trueobs_matches_reference_code(sparseout, blocksize):
    W, H = _problem(seed=3)
    wbits = 4

    layer = nn.Linear(W.shape[1], W.shape[0], bias=False)
    layer.weight.data = torch.from_numpy(W.copy())
    obs = fast_trueobs.TrueOBS(layer)
    # hand it 3x our H: running-average vs sum accumulation differ only by
    # a positive factor, and the solver must be invariant to it
    obs.H = torch.from_numpy(3.0 * H)
    obs.nsamples = 1
    q = refquant_zs.Quantizer()
    q.configure(bits=wbits, perchannel=True, sym=False, mse=False)
    obs.quantizer = q
    obs.fasterquant(blocksize=blocksize, percdamp=0.01, sparseout=sparseout)
    ref = layer.weight.data.numpy()

    # sparse_outlier <= 0 disables the escape (the reference's
    # sparseout=False); method="trueobs" defaults to 0.25 only when the
    # field is left at 0.0
    cfg = QuantConfig(wbits=wbits, method="trueobs", qfn="a",
                      blocksize=blocksize, preproc=GPTQH_ONLY,
                      sparse_outlier=0.25 if sparseout else -1.0)
    res = quantize_layer(jnp.asarray(W), jnp.asarray(H), cfg,
                         jax.random.key(0))
    ours = np.asarray(res.W_hat, np.float32)

    scale = np.asarray(res.grid.scale, np.float32).reshape(-1, 1)
    close = np.abs(ours - ref) < 0.51 * scale
    assert close.mean() >= 0.98, close.mean()

    if sparseout:
        # escaped entries keep the error-fed fp value (fast_trueobs.py:136:
        # q[sel] = w[sel] where w is the CURRENT column, not the original
        # weight) — so they are off the qfn-a grid. The escape must fire,
        # and both solvers must escape the same entries.
        def off_grid(M_):
            z = np.asarray(res.grid.zero, np.float32).reshape(-1, 1)
            q = np.clip(np.round(M_ / scale) + z, 0,
                        float(res.grid.maxq))
            return np.abs(M_ - scale * (q - z)) > 1e-5 * scale

        esc_ref, esc_ours = off_grid(ref), off_grid(ours)
        assert esc_ref.mean() > 0.0
        agree = (esc_ref == esc_ours).mean()
        assert agree >= 0.98, agree


def test_trueobs_default_sparse_outlier():
    """method="trueobs" with sparse_outlier left at 0.0 applies the
    reference default threshold 0.25 (fast_trueobs.py:108) — output differs
    from plain gptq and keeps some fp entries.

    The escape only fires when error feedback pushes weights outside the
    grid range (round-to-nearest error is otherwise <= scale/2, i.e.
    exactly the 0.25*scale^2 threshold), so use a near-rank-1 Hessian
    (strong feedback) rather than the well-conditioned default problem."""
    rng = np.random.default_rng(0)
    d, m, n = 32, 12, 128
    v = rng.normal(size=(1, d))
    X = (0.9 * rng.normal(size=(n, 1)) @ v
         + 0.1 * rng.normal(size=(n, d)))
    H = (X.T @ X / n + 1e-4 * np.eye(d)).astype(np.float32)
    W = rng.normal(size=(m, d)).astype(np.float32)
    kw = dict(wbits=2, qfn="a", preproc=GPTQH_ONLY)
    res_t = quantize_layer(jnp.asarray(W), jnp.asarray(H),
                           QuantConfig(method="trueobs", **kw),
                           jax.random.key(0))
    res_g = quantize_layer(jnp.asarray(W), jnp.asarray(H),
                           QuantConfig(method="gptq", **kw),
                           jax.random.key(0))
    ours = np.asarray(res_t.W_hat)
    scale = np.asarray(res_t.grid.scale, np.float32).reshape(-1, 1)
    zero = np.asarray(res_t.grid.zero, np.float32).reshape(-1, 1)
    q = np.clip(np.round(ours / scale) + zero, 0, float(res_t.grid.maxq))
    off_grid = np.abs(ours - scale * (q - zero)) > 1e-5 * scale
    assert off_grid.mean() > 0.0               # some entries escaped
    assert res_t.codes is None                 # mixed layers stay dense
    assert res_g.codes is not None
    assert not np.allclose(ours, np.asarray(res_g.W_hat))
