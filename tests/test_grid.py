"""Grid (qfn a/b/c) tests against straight-line NumPy semantics."""
import numpy as np
import jax.numpy as jnp

from quip_tpu.core import grid
from tests import reference_impl as ref


def test_find_params_qfna_matches_reference(rng):
    W = rng.standard_normal((16, 64))
    g = grid.find_params_qfna(jnp.asarray(W), bits=4, perchannel=True,
                              sym=False)
    scale, zero, maxq = ref.find_params_qfna_np(W, 4, sym=False)
    np.testing.assert_allclose(np.asarray(g.scale), scale, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g.zero), zero, atol=1e-12)
    assert float(g.maxq) == maxq


def test_find_params_qfna_sym(rng):
    W = rng.standard_normal((8, 32))
    g = grid.find_params_qfna(jnp.asarray(W), bits=3, perchannel=True,
                              sym=True)
    scale, zero, maxq = ref.find_params_qfna_np(W, 3, sym=True)
    np.testing.assert_allclose(np.asarray(g.scale), scale, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g.zero), zero, atol=1e-12)


def test_quantize_qfna_roundtrip(rng):
    W = rng.standard_normal((8, 32))
    g = grid.find_params_qfna(jnp.asarray(W), bits=8)
    q = grid.quantize_qfna(jnp.asarray(W), g.scale, g.zero, g.maxq)
    # 8-bit quantization error bounded by scale/2 per element
    err = np.abs(np.asarray(q) - W)
    assert (err <= np.asarray(g.scale) / 2 + 1e-12).all()


def test_qfnb_scale_and_quantize(rng):
    W = rng.standard_normal((16, 16))
    s = float(grid.qfnb_scale(jnp.asarray(W)))
    expect = 2.4 * np.sqrt((W**2).mean()) + 1e-16
    np.testing.assert_allclose(s, expect, rtol=1e-12)
    maxq = 3
    q = np.asarray(grid.quantize_qfnb(jnp.asarray(W), s, maxq))
    # all outputs on the 2-bit symmetric grid
    levels = (np.arange(maxq + 1) / maxq * 2 - 1) * s
    for v in np.unique(q):
        assert np.min(np.abs(levels - v)) < 1e-12


def test_grid_transforms_invert(rng):
    W = rng.standard_normal((8, 16))
    g = grid.find_params_qfna(jnp.asarray(W), bits=4)
    Wg = grid.to_grid_qfna(jnp.asarray(W), g)
    assert float(jnp.min(Wg)) >= 0 and float(jnp.max(Wg)) <= float(g.maxq)
    # integer grid points map back onto the qfn-a lattice
    codes = jnp.round(Wg)
    back = grid.from_grid_qfna(codes, g)
    direct = grid.quantize_qfna(jnp.asarray(W), g.scale, g.zero, g.maxq)
    np.testing.assert_allclose(np.asarray(back), np.asarray(direct),
                               atol=1e-12)


def test_mse_search_reduces_error(rng):
    W = rng.standard_normal((4, 256)) * np.array([[1], [2], [4], [0.5]])
    # inject outliers so min/max grid is suboptimal
    W[:, 0] *= 50
    g0 = grid.find_params_qfna(jnp.asarray(W), bits=3, mse=False)
    g1 = grid.find_params_qfna(jnp.asarray(W), bits=3, mse=True)
    q0 = grid.quantize_qfna(jnp.asarray(W), g0.scale, g0.zero, g0.maxq)
    q1 = grid.quantize_qfna(jnp.asarray(W), g1.scale, g1.zero, g1.maxq)
    e0 = float(jnp.sum(jnp.abs(q0 - W) ** 2.4))
    e1 = float(jnp.sum(jnp.abs(q1 - W) ** 2.4))
    assert e1 <= e0
