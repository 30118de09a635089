"""Sign-folded RHT serving format (proj_mode 'rht_sf').

The outer-sign transform T = diag(s)·K puts the sign vectors adjacent to
the rotated payload, and the symmetric qfn-b grid (c -> maxq-c negates
exactly) absorbs them into the packed codes at pack time
(pack/format.py::fold_rht_signs) — decode rotations become pure Kronecker
dots. These tests pin the algebra end to end: outer rotate/unrotate
identity, preproc/postproc inverse, the pack contract (dequantize ==
pipeline W_hat), the serving forward (qlinear_apply == dense), the
widen_3bit composition, and a quality sanity vs the inner-sign 'rht'.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.core import incoherence as inc
from quip_tpu.core import hessian as hess
from quip_tpu.ops.qlinear import qlinear_apply
from quip_tpu.pack.format import (fold_rht_signs, pack_layer_result,
                                  unpack_codes, widen_3bit)
from quip_tpu.quantize.config import QuantConfig
from quip_tpu.quantize.pipeline import quantize_layer
from tests.conftest import make_psd_hessian


def test_outer_rotate_unrotate_identity(rng):
    m, d = 48, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    ku, kv = jax.random.split(jax.random.key(3))
    U = inc.gen_rht(ku, m, jnp.float64)
    V = inc.gen_rht(kv, d, jnp.float64)
    Wr = inc.rht_rotate_weight_outer(U, V, W)
    Hr = inc.rht_rotate_hessian_outer(V, H)
    # atol matches test_incoherence: the odd-factor Haar orthogonal is
    # generated in f32
    np.testing.assert_allclose(
        np.asarray(inc.rht_unrotate_weight_outer(U, V, Wr)),
        np.asarray(W), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(inc.rht_unrotate_hessian_outer(V, Hr)),
        np.asarray(H), rtol=1e-5, atol=1e-3)
    # outer vs inner differ only by entry signs: |W_rot| must agree with
    # the sign-stripped Kronecker rotation
    Wk = inc.apply_rht(U._replace(signs=None),
                       inc.apply_rht(V._replace(signs=None), W, axis=1),
                       axis=0)
    np.testing.assert_allclose(np.abs(np.asarray(Wr)),
                               np.abs(np.asarray(Wk)), atol=1e-8)


def test_preproc_postproc_inverse_rht_sf(rng):
    m, d = 32, 64
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    Wp, Hp, state = hess.preproc(W, H, rescale=True, proj=True,
                                 proj_key=jax.random.key(5),
                                 proj_mode="rht_sf")
    Wb, _ = hess.postproc(Wp, Hp, state)
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(W), atol=1e-5)


def test_fold_is_exact_negation(rng):
    """grid(maxq - c) == -grid(c) for qfn-b — the symmetry the fold uses."""
    for bits in (2, 3, 4):
        maxq = 2**bits - 1
        c = jnp.arange(maxq + 1, dtype=jnp.float64)
        g = (c / maxq) * 2 - 1
        gf = ((maxq - c) / maxq) * 2 - 1
        np.testing.assert_allclose(np.asarray(gf), -np.asarray(g),
                                   atol=0)


@pytest.mark.parametrize("mode,bits", [("rht_sf", 2), ("rht_sf", 3),
                                       ("rht_sf", 4), ("rht_uf", 2),
                                       ("rht_uf", 4)])
def test_pack_contract_folded(rng, mode, bits):
    """dequantize() of a sign-folded PackedLinear reproduces the
    pipeline's W_hat bit-for-bit (up to f64 rounding)."""
    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=bits, method="ldlq",
                                  proj_mode=mode)
    res = quantize_layer(W, H, cfg, jax.random.key(0))
    packed = pack_layer_result(res, bits)
    assert packed.proj_mode == mode
    # the stored rot carries no U-side sign vector (pure Kronecker); the
    # hybrid keeps the V-side signs (they ride vin)
    assert isinstance(packed.rot["u"][0], tuple) and not packed.rot["u"][0]
    if mode == "rht_sf":
        assert isinstance(packed.rot["v"][0], tuple) \
            and not packed.rot["v"][0]
    else:
        assert packed.rot["v"][0] is not None
    Wd = packed.dequantize(dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(Wd), np.asarray(res.W_hat),
                               atol=1e-6)


@pytest.mark.parametrize("mode", ["rht_sf", "rht_uf"])
def test_qlinear_apply_folded_matches_dense(rng, mode):
    """Serving forward through the folded codes == x @ W_hat.T."""
    m, d = 64, 96
    B = 4
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq",
                                  proj_mode=mode)
    res = quantize_layer(W, H, cfg, jax.random.key(1))
    packed = pack_layer_result(res, 2)
    x = jnp.asarray(rng.standard_normal((B, d)))
    got = qlinear_apply(packed, x, use_kernel=False)
    want = x @ res.W_hat.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["rht_sf", "rht_uf"])
def test_qlinear_folded_key_fallback(rng, mode):
    """rot=None path (regenerate transforms from the key) must also strip
    the signs for folded codes."""
    m, d = 32, 64
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq",
                                  proj_mode=mode)
    res = quantize_layer(W, H, cfg, jax.random.key(2))
    packed = pack_layer_result(res, 2)
    bare = packed.__class__(
        packed.planes, packed.scale, packed.zero, packed.scale_b,
        packed.scaleWH, packed.proj_key, packed.bias, bits=packed.bits,
        qfn=packed.qfn, proj_mode=packed.proj_mode,
        out_features=packed.out_features, in_features=packed.in_features,
        rot=None)
    x = jnp.asarray(rng.standard_normal((3, d)))
    got = qlinear_apply(bare, x, use_kernel=False)
    want = qlinear_apply(packed, x, use_kernel=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fold_codes_roundtrip(rng):
    """fold_rht_signs is an involution (applying twice restores codes)."""
    m, d = 48, 64
    codes = jnp.asarray(rng.integers(0, 4, (m, d)), jnp.int32)
    key = jax.random.key(9)
    once = fold_rht_signs(codes, key, 2)
    twice = fold_rht_signs(once, key, 2)
    np.testing.assert_array_equal(np.asarray(twice), np.asarray(codes))
    assert (np.asarray(once) != np.asarray(codes)).any()


def test_widen3_composes_with_rht_sf(rng):
    """3-in-4 serving transcode preserves the folded-code contract."""
    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=3, method="ldlq",
                                  proj_mode="rht_sf")
    res = quantize_layer(W, H, cfg, jax.random.key(4))
    packed = pack_layer_result(res, 3)
    wide = widen_3bit(packed)
    assert wide.bits == 4 and wide.code_bits == 3
    x = jnp.asarray(rng.standard_normal((3, d)))
    np.testing.assert_allclose(
        np.asarray(qlinear_apply(wide, x, use_kernel=False)),
        np.asarray(qlinear_apply(packed, x, use_kernel=False)),
        rtol=1e-6, atol=1e-7)


def test_engine_rht_sf_matches_dense(rng):
    """Whole-model path: quantize with rht_sf, pack, serve — the packed
    engine emits the same greedy tokens as the dense dequantized model."""
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.driver import quantize_model
    from quip_tpu.serve.engine import Engine

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qcfg = QuantConfig.incoherence(2, "ldlq", proj_mode="rht_sf")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    e_dense = Engine(qparams, cfg, max_batch=1, max_seq=64)
    e_pack = Engine(packed, cfg, max_batch=1, max_seq=64, paged=True,
                    hot=8, page=8)
    [rd] = e_dense.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    [rp] = e_pack.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    assert rd.generated == rp.generated


@pytest.mark.parametrize("mode", ["rht_sf", "rht_uf"])
def test_checkpoint_roundtrip_folded(rng, mode, tmp_path):
    """Packed checkpoints serialize the folded formats bit-exactly (the
    rot dict's empty () sign slots must survive the pytree IO)."""
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(
        params, cfg, calib,
        QuantConfig.incoherence(2, "ldlq", proj_mode=mode),
        jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    save_checkpoint(str(tmp_path), packed, {"model": "opt-tiny"})
    loaded, _ = load_checkpoint(str(tmp_path))
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(M.forward(packed, toks, cfg)),
        np.asarray(M.forward(loaded, toks, cfg)))


def test_structured_inputs_expose_fold_quality_gap(rng):
    """WHY 'rht' stays the default: on activation-like Hessians (dominant
    FLAT eigenvector — the common-token/bias direction real E[xxᵀ] has)
    with mean-structured weights, the outer-sign modes lose the
    randomization that protects against Hadamard-coherent structure.
    Measured here (and the basis of the default choice): rht ~109,
    rht_uf ~770, rht_sf ~5600 mean proxy error. The folded modes are
    perf-NEUTRAL on v5e (docs/PERF.md round 3), so they are strictly
    experimental format options."""
    m, d = 64, 128
    ones = np.ones(d) / np.sqrt(d)
    H = 100.0 * np.outer(ones, ones) + 0.5 * np.eye(d)
    X = rng.standard_normal((256, d)) * 0.1
    H = jnp.asarray(H + X.T @ X / 256)
    W = jnp.asarray(rng.standard_normal((m, d)) + 0.3)
    err = {}
    for mode in ("rht", "rht_sf"):
        cfg = QuantConfig.incoherence(2, "ldlq", proj_mode=mode)
        err[mode] = float(quantize_layer(W, H, cfg,
                                         jax.random.key(0)).error)
    # the inner-sign default must be far better on this structure
    assert err["rht"] * 5 < err["rht_sf"], err


def test_rht_sf_quality_comparable(rng):
    """Proxy loss of the outer-sign mode stays in the same ballpark as the
    inner-sign 'rht' on random layers (the randomization argument differs;
    this is a regression tripwire, not a guarantee)."""
    m, d = 64, 96
    errs = {"rht": [], "rht_sf": [], "rht_uf": []}
    for seed in range(3):
        W = jnp.asarray(rng.standard_normal((m, d)))
        H = jnp.asarray(make_psd_hessian(rng, d))
        for mode in errs:
            cfg = QuantConfig.incoherence(wbits=2, method="ldlq",
                                          proj_mode=mode)
            res = quantize_layer(W, H, cfg, jax.random.key(seed))
            errs[mode].append(float(res.error))
    assert np.mean(errs["rht_sf"]) < 2.0 * np.mean(errs["rht"]), errs
    assert np.mean(errs["rht_uf"]) < 2.0 * np.mean(errs["rht"]), errs
