"""Core solver tests: blocked TPU kernels vs straight-line NumPy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.core import ldlq
from tests.conftest import make_psd_hessian
from tests import reference_impl as ref


def _wg(rng, m, d, bits):
    """Random weights already in grid coordinates [0, maxq]."""
    return (rng.random((m, d)) * (2**bits - 1)).astype(np.float64)


def test_ldl_factor_matches_numpy(rng):
    H = make_psd_hessian(rng, 64)
    L = np.asarray(ldlq.ldl_factor(jnp.asarray(H)))
    Lnp = ref.ldl_factor_np(H)
    np.testing.assert_allclose(L, Lnp, atol=1e-10)


@pytest.mark.parametrize("m,d,bits,bs", [
    (16, 96, 2, 32),       # d not a multiple of blocksize -> padding path
    (32, 128, 2, 128),     # single block
    (8, 256, 4, 64),       # multi-block
])
def test_round_ldl_matches_reference(rng, m, d, bits, bs):
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    got = np.asarray(
        ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits,
                       n_greedy_passes=0, blocksize=bs)
    )
    want = ref.round_ldl_np(Wg, H, bits)
    np.testing.assert_array_equal(got, want)


def test_round_ldl_greedy_matches_reference(rng):
    m, d, bits = 12, 128, 2
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    got = np.asarray(
        ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits,
                       n_greedy_passes=3, blocksize=32)
    )
    want = ref.round_ldl_greedy_np(Wg, H, bits, npasses=3)
    np.testing.assert_array_equal(got, want)


def test_round_allbal_matches_reference(rng):
    m, d, bits = 10, 96, 2
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    got = np.asarray(
        ldlq.round_allbal(jnp.asarray(Wg), jnp.asarray(H), bits, npasses=4,
                          blocksize=32)
    )
    want = ref.round_allbal_np(Wg, H, bits, npasses=4)
    np.testing.assert_array_equal(got, want)


def test_gptqequiv_matches_reference(rng):
    m, d, bits = 10, 80, 3
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    got = np.asarray(
        ldlq.round_ldl_gptqequiv(jnp.asarray(Wg), jnp.asarray(H), bits,
                                 blocksize=16)
    )
    want = ref.round_gptqequiv_np(Wg, H, bits)
    np.testing.assert_array_equal(got, want)


def test_blocksize_invariance(rng):
    """Blocked and (nearly) unblocked paths must agree exactly in f64."""
    m, d, bits = 8, 128, 2
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    a = np.asarray(ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits,
                                  0, blocksize=128))
    b = np.asarray(ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits,
                                  0, blocksize=16))
    np.testing.assert_array_equal(a, b)


def test_ldlqRG_is_permutation_of_ldl(rng):
    """LDLQ-RG == LDLQ on diag-sorted (W, H), un-permuted
    (vector_balance.py:139-152)."""
    m, d, bits = 8, 64, 2
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    got = np.asarray(ldlq.round_ldlqRG(jnp.asarray(Wg), jnp.asarray(H), bits,
                                       n_greedy_passes=0, blocksize=32))
    p = np.argsort(np.diag(H))
    want = np.zeros_like(Wg)
    want[:, p] = ref.round_ldl_np(Wg[:, p], H[p][:, p], bits)
    np.testing.assert_array_equal(got, want)


def test_ldlq_beats_nearest_on_proxy_loss(rng):
    """LDLQ should do (much) better than round-to-nearest on correlated H."""
    m, d, bits = 32, 128, 2
    H = make_psd_hessian(rng, d, nsamples=d // 2)  # rank-deficient-ish + ridge
    Wg = _wg(rng, m, d, bits)
    Wj, Hj = jnp.asarray(Wg), jnp.asarray(H)
    ldl = ldlq.round_ldl(Wj, Hj, bits, 0)
    near = ldlq.round_nearest(Wj, bits)
    l_ldl = float(ldlq.hessian_loss(ldl - Wj, Hj))
    l_near = float(ldlq.hessian_loss(near - Wj, Hj))
    assert l_ldl < l_near


def test_nbits_respected(rng):
    m, d = 8, 64
    H = make_psd_hessian(rng, d)
    for bits in (2, 3, 4):
        Wg = _wg(rng, m, d, bits)
        out = ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits, 2)
        assert ldlq.check_nbits(out, bits)
        vals = np.unique(np.asarray(out))
        assert vals.min() >= 0 and vals.max() <= 2**bits - 1


def test_unbiased_rounding_is_unbiased(rng):
    """E[round(w)] == w for the unbiased dither (over keys)."""
    m, d, bits = 4, 32, 4
    H = np.eye(d) + 0.0
    Wg = _wg(rng, m, d, bits) * 0 + 5.3
    outs = []
    for s in range(200):
        out = ldlq.round_ldl(jnp.asarray(Wg), jnp.asarray(H), bits,
                             n_greedy_passes=0, unbiased=True,
                             key=jax.random.key(s))
        outs.append(np.asarray(out))
    mean = np.stack(outs).mean(0)
    np.testing.assert_allclose(mean, 5.3, atol=0.15)


def test_admm_solver_improves_or_matches(rng):
    """LDL-ADMM should produce a valid grid rounding with finite loss."""
    m, d, bits = 6, 32, 2
    H = make_psd_hessian(rng, d)
    Wg = _wg(rng, m, d, bits)
    out = ldlq.round_ldl_admm_sorted(jnp.asarray(Wg), jnp.asarray(H), bits,
                                     n_greedy_passes=2)
    out = np.asarray(out)
    assert ldlq.check_nbits(out, bits)
    loss = float(ldlq.hessian_loss(jnp.asarray(out) - jnp.asarray(Wg),
                                   jnp.asarray(H)))
    assert np.isfinite(loss)


def test_solvers_jit_and_vmap(rng):
    """The solver must jit and vmap over a stack of layers (batched
    quantization — the TPU-first win over the reference's serial loop)."""
    m, d, bits, nl = 8, 64, 2, 3
    Hs = np.stack([make_psd_hessian(rng, d) for _ in range(nl)])
    Ws = np.stack([_wg(rng, m, d, bits) for _ in range(nl)])
    f = jax.jit(jax.vmap(
        lambda w, h: ldlq.round_ldl(w, h, bits, 0, blocksize=32)
    ))
    out = np.asarray(f(jnp.asarray(Ws), jnp.asarray(Hs)))
    for i in range(nl):
        np.testing.assert_array_equal(out[i],
                                      ref.round_ldl_np(Ws[i], Hs[i], bits))
