"""Butterfly / incoherence-processing tests (SURVEY.md §4c)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.core import incoherence as inc
from quip_tpu.core import hessian as hess
from tests.conftest import make_psd_hessian


def test_prime_factorization():
    assert inc.prime_factors(768) == [2, 2, 2, 2, 2, 2, 2, 2, 3]
    assert inc.prime_factors(1) == []
    assert inc.prime_factors(97) == [97]
    p, q = inc.butterfly_factors(768)
    assert p * q == 768
    p, q = inc.butterfly_factors(4096)
    assert p * q == 4096


@pytest.mark.parametrize("n", [64, 96, 768 // 4])
@pytest.mark.parametrize("mode", ["block", "noblock", "nopermute"])
def test_butterfly_orthogonal(n, mode):
    bf = inc.gen_butterfly(jax.random.key(0), n, mode, dtype=jnp.float64)
    U = np.asarray(inc.materialize(bf, dtype=jnp.float64))
    np.testing.assert_allclose(U @ U.T, np.eye(n), atol=1e-5)


def test_random_orthogonal_special():
    q = np.asarray(inc.random_orthogonal(jax.random.key(1), 5, 7,
                                         dtype=jnp.float64))
    for i in range(7):
        np.testing.assert_allclose(q[i] @ q[i].T, np.eye(5), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(q[i]), 1.0, atol=1e-5)


def test_apply_matches_dense(rng):
    n = 48
    bf = inc.gen_butterfly(jax.random.key(2), n, "block", dtype=jnp.float64)
    U = np.asarray(inc.materialize(bf, dtype=jnp.float64))
    x = rng.standard_normal((n, 5))
    got = np.asarray(inc.apply_butterfly(bf, jnp.asarray(x), axis=0))
    np.testing.assert_allclose(got, U @ x, atol=1e-10)
    # transpose application
    gotT = np.asarray(inc.apply_butterfly(bf, jnp.asarray(x), axis=0,
                                          transpose=True))
    np.testing.assert_allclose(gotT, U.T @ x, atol=1e-10)
    # axis=1 computes x @ Uᵀ
    y = rng.standard_normal((5, n))
    got1 = np.asarray(inc.apply_butterfly(bf, jnp.asarray(y), axis=1))
    np.testing.assert_allclose(got1, y @ U.T, atol=1e-10)


def test_rotate_unrotate_identity(rng):
    m, d = 24, 36
    ku, kv = jax.random.split(jax.random.key(3))
    U = inc.gen_butterfly(ku, m, "noblock", dtype=jnp.float64)
    V = inc.gen_butterfly(kv, d, "noblock", dtype=jnp.float64)
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wr = inc.rotate_weight(U, V, W)
    Hr = inc.rotate_hessian(V, H)
    Wb = inc.unrotate_weight(U, V, Wr)
    Hb = inc.unrotate_hessian(V, Hr)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(W), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Hb), np.asarray(H), atol=1e-5)


def test_rotation_preserves_proxy_loss(rng):
    """tr(ΔW H ΔWᵀ) is invariant under (U, V) rotation — the algebra the
    fused inference kernel relies on."""
    m, d = 16, 32
    ku, kv = jax.random.split(jax.random.key(4))
    U = inc.gen_butterfly(ku, m, "noblock", dtype=jnp.float64)
    V = inc.gen_butterfly(kv, d, "noblock", dtype=jnp.float64)
    dW = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    loss = float(jnp.trace(dW @ H @ dW.T))
    dWr = inc.rotate_weight(U, V, dW)
    Hr = inc.rotate_hessian(V, H)
    loss_r = float(jnp.trace(dWr @ Hr @ dWr.T))
    np.testing.assert_allclose(loss_r, loss, rtol=1e-5)


def test_keyed_regeneration():
    """Same key -> identical butterfly (checkpoints store keys only)."""
    a = inc.gen_butterfly(jax.random.key(7), 64, "noblock")
    b = inc.gen_butterfly(jax.random.key(7), 64, "noblock")
    np.testing.assert_array_equal(np.asarray(inc.materialize(a)),
                                  np.asarray(inc.materialize(b)))


def test_preproc_postproc_roundtrip(rng):
    """postproc ∘ preproc == identity on W (rescale + proj, without gptqH
    damping which is intentionally not inverted) — method.py:195-214."""
    m, d = 32, 48
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wp, Hp, state = hess.preproc(
        W, H, rescale=True, proj=True, proj_key=jax.random.key(5),
        proj_mode="noblock", gptqH=False,
    )
    Wb, _ = hess.postproc(Wp, Hp, state)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(W), atol=1e-5)


def test_incoherence_reduces_max_weight(rng):
    """The whole point of incoherence processing: rotation spreads outliers
    (paper §3). Check max|W|/rms shrinks for an outlier-heavy matrix."""
    m, d = 128, 128
    W = rng.standard_normal((m, d))
    W[0, 0] = 60.0  # a huge outlier
    Wj = jnp.asarray(W)
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wp, _, _ = hess.preproc(Wj, H, proj=True, proj_key=jax.random.key(6))
    def ratio(x):
        return float(jnp.max(jnp.abs(x)) / jnp.sqrt(jnp.mean(x * x)))
    assert ratio(Wp) < ratio(Wj)


# ---------------------------------------------------------------------------
# Randomized Hadamard/Kronecker transform (the permutation-free fast path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [64, 96, 4096 // 16, 43 * 4])
def test_rht_orthogonal(n):
    t = inc.gen_rht(jax.random.key(0), n)
    T = np.asarray(inc.materialize_rht(t, dtype=jnp.float64))
    np.testing.assert_allclose(T @ T.T, np.eye(n), atol=1e-5)


def test_rht_inverse_identity(rng):
    n = 96
    t = inc.gen_rht(jax.random.key(1), n)
    x = jnp.asarray(rng.standard_normal((n, 4)))
    y = inc.apply_rht(t, x, axis=0)
    back = inc.apply_rht(t, y, axis=0, transpose=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_rht_apply_matches_dense(rng):
    n = 64
    t = inc.gen_rht(jax.random.key(2), n)
    T = np.asarray(inc.materialize_rht(t, dtype=jnp.float64))
    x = rng.standard_normal((n, 3))
    got = np.asarray(inc.apply_rht(t, jnp.asarray(x), axis=0))
    np.testing.assert_allclose(got, T @ x, atol=1e-5)
    y = rng.standard_normal((3, n))
    got1 = np.asarray(inc.apply_rht(t, jnp.asarray(y), axis=1))
    np.testing.assert_allclose(got1, y @ T.T, atol=1e-5)


def test_rht_preproc_roundtrip(rng):
    m, d = 32, 48
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wp, Hp, state = hess.preproc(
        W, H, rescale=True, proj=True, proj_key=jax.random.key(5),
        proj_mode="rht", gptqH=False,
    )
    Wb, _ = hess.postproc(Wp, Hp, state)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(W), atol=1e-5)


def test_rht_reduces_outliers(rng):
    m, d = 128, 128
    W = rng.standard_normal((m, d))
    W[0, 0] = 60.0
    Wj = jnp.asarray(W)
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wp, _, _ = hess.preproc(Wj, H, proj=True, proj_key=jax.random.key(6),
                            proj_mode="rht")
    def ratio(x):
        return float(jnp.max(jnp.abs(x)) / jnp.sqrt(jnp.mean(x * x)))
    assert ratio(Wp) < ratio(Wj)
