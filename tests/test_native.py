"""Native C++ pack library: build, correctness vs the jnp layout, speed."""
import numpy as np
import jax.numpy as jnp
import pytest

from quip_tpu.pack import native
from quip_tpu.pack.format import pack_codes, unpack_codes


def test_native_builds():
    assert native.available(), "C++ packlib failed to build/load"


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_native_plane_matches_jnp_layout(rng, bits):
    m, d = 64, 256
    codes = rng.integers(0, 2**bits, (m, d)).astype(np.uint8)
    got = native.pack_plane_np(codes, bits)
    from quip_tpu.pack.format import _pack_plane
    want = _pack_plane(jnp.asarray(codes.astype(np.int32)), bits)
    np.testing.assert_array_equal(got, np.asarray(want))
    back = native.unpack_plane_np(got, bits, d)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_native_composite_matches_jnp(rng, bits):
    m, d = 64, 256
    codes = rng.integers(0, 2**bits, (m, d)).astype(np.uint8)
    got = native.pack_np(codes, bits)
    want = pack_codes(jnp.asarray(codes.astype(np.int32)), bits)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))
    back = native.unpack_np(got, bits, d)
    np.testing.assert_array_equal(back, codes)


def test_native_dequant_qfnb(rng):
    m, d, bits = 32, 128, 2
    codes = rng.integers(0, 4, (m, d)).astype(np.uint8)
    planes = native.pack_np(codes, bits)
    scale = 0.37
    got = native.dequant_qfnb_np(planes, bits, d, scale)
    want = ((codes.astype(np.float32) / 3) * 2 - 1) * scale
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_large_roundtrip(rng):
    """A 4096x4096 2-bit layer packs+unpacks exactly (production-size)."""
    m = d = 4096
    codes = rng.integers(0, 4, (m, d)).astype(np.uint8)
    (words,) = native.pack_np(codes, 2)
    assert words.nbytes == m * d // 4
    back = native.unpack_np((words,), 2, d)
    np.testing.assert_array_equal(back, codes)
