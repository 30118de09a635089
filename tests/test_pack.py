"""Pack/unpack round-trip + fused dequant-matmul kernel numerics +
packed-checkpoint IO (SURVEY.md §4d, §4e)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.core import ldlq
from quip_tpu.kernels.dequant_matmul import dequant_matmul, dequant_matmul_ref
from quip_tpu.ops.qlinear import qlinear_apply
from quip_tpu.pack.format import (PackedLinear, pack_codes,
                                  pack_layer_result, unpack_codes)
from quip_tpu.quantize.config import QuantConfig
from quip_tpu.quantize.pipeline import quantize_layer
from tests.conftest import make_psd_hessian


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_unpack_roundtrip(rng, bits):
    m, d = 24, 128
    codes = jnp.asarray(rng.integers(0, 2**bits, (m, d)), jnp.int32)
    planes = pack_codes(codes, bits)
    # packed payload is the expected factor smaller
    payload_bits = sum(p.size * 32 for p in planes)
    assert payload_bits == m * d * bits
    back = unpack_codes(planes, bits, d)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))


@pytest.mark.parametrize("bits,qfn", [(2, "b"), (3, "b"), (4, "b"),
                                      (2, "a"), (4, "a")])
def test_dequant_matmul_interpret_matches_ref(rng, bits, qfn):
    """Pallas kernel (interpret mode on CPU) vs pure-jnp reference."""
    B, m, d = 8, 256, 128
    codes = jnp.asarray(rng.integers(0, 2**bits, (m, d)), jnp.int32)
    planes = pack_codes(codes, bits)
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    if qfn == "b":
        scale = jnp.asarray(0.37, jnp.float32)
        zero = None
    else:
        scale = jnp.asarray(rng.random(m) * 0.1 + 0.01, jnp.float32)
        zero = jnp.asarray(rng.integers(0, 2**bits, m), jnp.float32)
    # kernel semantics: y = bf16(x) @ Ŵᵀ accumulated in f32 (the MXU
    # consumes bf16 operands) — compare the ref on the same bf16-cast x
    x_bf = x.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(dequant_matmul_ref(x_bf, planes, scale, zero,
                                         bits=bits, qfn=qfn))
    got = np.asarray(dequant_matmul(x, planes, scale, zero, bits=bits,
                                    qfn=qfn, tile_m=128, interpret=True))
    # residual: f32 accumulation-order noise around the folded 128-offset,
    # ~ulp(128·Σ|x|) per output
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_packed_linear_dequantize_matches_pipeline(rng):
    """PackedLinear.dequantize must reproduce quantize_layer's W_hat."""
    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    res = quantize_layer(W, H, cfg, jax.random.key(0))
    packed = pack_layer_result(res, 2)
    Wd = packed.dequantize(dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(Wd), np.asarray(res.W_hat),
                               atol=1e-6)


def test_qlinear_apply_matches_dense(rng):
    """Full fused path (rescale -> Vᵀ -> packed matmul -> U) == dense
    x @ Ŵᵀ."""
    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    res = quantize_layer(W, H, cfg, jax.random.key(1))
    packed = pack_layer_result(res, 2)

    x = jnp.asarray(rng.standard_normal((5, d)))
    y_dense = x @ res.W_hat.T
    y_packed = qlinear_apply(packed, x, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_dense),
                               rtol=1e-4, atol=1e-5)


def test_qlinear_apply_qfna_no_rotation(rng):
    m, d = 32, 64
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig(wbits=4, method="ldlq", qfn="a")
    res = quantize_layer(W, H, cfg, jax.random.key(2))
    packed = pack_layer_result(res, 4)
    x = jnp.asarray(rng.standard_normal((3, d)))
    y_dense = x @ res.W_hat.T
    y_packed = qlinear_apply(packed, x, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_dense),
                               rtol=1e-4, atol=1e-5)


def test_packed_checkpoint_roundtrip(rng, tmp_path):
    """Quantize a tiny model, pack it, save, load, compare logits."""
    from quip_tpu.eval.ppl import perplexity
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(3), cfg)
    rng_t = np.random.default_rng(0)
    calib = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (4, 32)),
                        jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(4), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)

    tokens = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (1, 16)),
                         jnp.int32)
    logits_dense = np.asarray(M.forward(qparams, tokens, cfg))
    logits_packed = np.asarray(M.forward(packed, tokens, cfg))
    np.testing.assert_allclose(logits_packed, logits_dense, rtol=1e-3,
                               atol=1e-3)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, packed, {"model": "opt-tiny", "wbits": 2})
    loaded, meta = load_checkpoint(path)
    assert meta["wbits"] == 2
    logits_loaded = np.asarray(M.forward(loaded, tokens, cfg))
    np.testing.assert_allclose(logits_loaded, logits_packed, atol=1e-5)

    # packed checkpoint is materially smaller than dense fp32
    import os
    sz = os.path.getsize(os.path.join(path, "arrays.npz"))
    dense_sz = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
    assert sz < dense_sz


@pytest.mark.parametrize("wbits", [3, 4])
def test_packed_model_other_widths(rng, wbits):
    """3-bit (two-plane) and 4-bit packed models serve with dense parity."""
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(20 + wbits), cfg)
    rng_t = np.random.default_rng(0)
    calib = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (4, 32)),
                        jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=wbits, method="ldlq")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, wbits)
    tokens = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (1, 12)),
                         jnp.int32)
    ld = np.asarray(M.forward(qparams, tokens, cfg))
    lp = np.asarray(M.forward(packed, tokens, cfg))
    np.testing.assert_allclose(lp, ld, rtol=1e-3, atol=1e-3)


def test_dequant_matmul_batch_tiled(rng):
    """B > tile_b exercises the (B_tiles, m_tiles) grid (prefill path)."""
    from quip_tpu.pack.format import pack_codes as _pack

    B, m, d = 32, 256, 128
    codes = jnp.asarray(rng.integers(0, 4, (m, d)), jnp.int32)
    planes = _pack(codes, 2)
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    scale = jnp.asarray(0.21, jnp.float32)
    x_bf = x.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(dequant_matmul_ref(x_bf, planes, scale, None,
                                         bits=2, qfn="b"))
    got = np.asarray(dequant_matmul(x, planes, scale, None, bits=2,
                                    qfn="b", tile_m=128, tile_b=8,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_dequant_matmul_vmap_stacked_layers(rng):
    """The model calls the kernel on layer-stacked planes under vmap/scan."""
    from quip_tpu.pack.format import pack_codes as _pack

    L, B, m, d = 3, 8, 256, 128
    codes = jnp.asarray(rng.integers(0, 4, (L, m, d)), jnp.int32)
    planes_l = [_pack(codes[i], 2) for i in range(L)]
    planes = (jnp.stack([p[0] for p in planes_l]),)
    xs = jnp.asarray(rng.standard_normal((L, B, d)), jnp.float32)
    scale = jnp.asarray(rng.random(L) * 0.3 + 0.05, jnp.float32)

    def one(x, plane, s):
        return dequant_matmul(x, (plane,), s, None, bits=2, qfn="b",
                              tile_m=128, interpret=True)

    got = np.asarray(jax.vmap(one)(xs, planes[0], scale))
    for i in range(L):
        x_bf = xs[i].astype(jnp.bfloat16).astype(jnp.float32)
        want = np.asarray(dequant_matmul_ref(x_bf, planes_l[i], scale[i],
                                             None, bits=2, qfn="b"))
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


def test_dequant_matmul_odd_m_default_tile(rng):
    """default_tile_m must handle out_features not divisible by 128
    (e.g. m=160) by falling back to a divisor of m."""
    from quip_tpu.kernels.dequant_matmul import default_tile_m

    B, m, d = 8, 160, 128
    assert m % default_tile_m(m, d) == 0
    codes = jnp.asarray(rng.integers(0, 4, (m, d)), jnp.int32)
    planes = pack_codes(codes, 2)
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    scale = jnp.asarray(0.3, jnp.float32)
    x_bf = x.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(dequant_matmul_ref(x_bf, planes, scale, None,
                                         bits=2, qfn="b"))
    got = np.asarray(dequant_matmul(x, planes, scale, None, bits=2,
                                    qfn="b", interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_checkpoint_bf16_roundtrip(tmp_path):
    """bfloat16 leaves must survive the npz round-trip (numpy stores
    ml_dtypes as opaque '|V2' voids without the dtype record)."""
    from quip_tpu.pack.model import load_checkpoint, save_checkpoint

    tree = {"w": jnp.asarray([[1.5, -2.25]], jnp.bfloat16),
            "b": jnp.asarray([3], jnp.int32)}
    path = str(tmp_path / "ck")
    save_checkpoint(path, tree, {"x": 1})
    loaded, meta = load_checkpoint(path)
    assert loaded["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(loaded["w"], np.float32),
                                  np.asarray(tree["w"], np.float32))
    assert loaded["b"].dtype == jnp.int32


def test_qlinear_vin_fold_matches_legacy_rot(rng):
    """The folded vin = signs_V/scaleWH fast path must match a legacy rot
    dict (pre-fold checkpoints) that lacks the 'vin' entry."""
    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    res = quantize_layer(W, H, cfg, jax.random.key(3))
    packed = pack_layer_result(res, 2)
    assert packed.rot is not None and "vin" in packed.rot

    legacy_rot = {k: v for k, v in packed.rot.items() if k != "vin"}
    legacy = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(packed),
        jax.tree_util.tree_leaves(packed))
    legacy.rot = legacy_rot

    x = jnp.asarray(rng.standard_normal((5, d)))
    y_fold = qlinear_apply(packed, x, use_kernel=False)
    y_legacy = qlinear_apply(legacy, x, use_kernel=False)
    # The two paths differ only in rounding order (x*(s/w) vs (x/w)*s), but
    # the packed matmul's bf16 activation cast can flip on that 1-ulp
    # perturbation, so compare at bf16-output precision like the dense test.
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_legacy),
                               rtol=1e-4, atol=1e-5)
    y_dense = x @ res.W_hat.T
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_dense),
                               rtol=1e-4, atol=1e-5)


def test_padded_m_rules():
    """padded_m targets the measured fast band (scripts/bench_tiles.py):
    the only 7B shape it touches is fused gate-up 22016 -> 22528."""
    import os

    from quip_tpu.kernels.dequant_matmul import default_tile_m
    from quip_tpu.pack.format import padded_m

    # 22528/2816 (2.9 MB tile, 8 steps) measured 36.4 µs vs 22400/3200's
    # 38.4 and unpadded 5504's 39.1 (scripts/tpu_session_r2b.py micro)
    assert padded_m(22016, 4096, 2) == 22528
    assert default_tile_m(22528, 4096) == 2816     # the measured winner
    assert default_tile_m(22016, 4096) == 5504     # unpadded keeps its best
    # every other 7B decode shape stays exact
    for m, d in [(4096, 4096), (12288, 4096), (4096, 11008), (32000, 4096)]:
        assert padded_m(m, d, 2) == m, (m, d)
    # small test shapes never pad (band needs >=1.5MB packed tiles)
    assert padded_m(160, 128, 2) == 160
    os.environ["QUIP_NO_PAD_M"] = "1"
    try:
        assert padded_m(22016, 4096, 2) == 22016
    finally:
        del os.environ["QUIP_NO_PAD_M"]


def test_padded_planes_sliced_to_out_features(rng):
    """A PackedLinear whose planes carry padded_m rows must behave exactly
    like the unpadded weights: dequantize drops the pad rows and
    qlinear_apply slices the matmul output."""
    m, mp, d = 48, 64, 64
    codes = rng.integers(0, 4, (m, d)).astype(np.int32)
    padded = np.zeros((mp, d), np.int32)
    padded[:m] = codes
    planes = pack_codes(jnp.asarray(padded), 2)
    scale_b = jnp.asarray(0.37, jnp.float32)
    q = PackedLinear(planes, None, None, scale_b, None, None, None,
                     bits=2, qfn="b", proj_mode="rht",
                     out_features=m, in_features=d, rot=None)
    Wd = q.dequantize(jnp.float64)
    assert Wd.shape == (m, d)
    want = ((jnp.asarray(codes, jnp.float64) / 3.0) * 2 - 1) * 0.37
    np.testing.assert_allclose(np.asarray(Wd), np.asarray(want), atol=1e-6)
    x = jnp.asarray(rng.standard_normal((5, d)))
    y = qlinear_apply(q, x, use_kernel=False)
    assert y.shape == (5, m)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ Wd.T),
                               rtol=1e-4, atol=1e-5)


def test_widen_3bit_exact(rng):
    """3-in-4 transcode: identical codes + maxq=7 grid => outputs equal the
    two-plane 3-bit layer's (same dequantized weights)."""
    from quip_tpu.pack.format import widen_3bit

    m, d = 64, 96
    W = jnp.asarray(rng.standard_normal((m, d)))
    H = jnp.asarray(make_psd_hessian(rng, d))
    cfg = QuantConfig.incoherence(wbits=3, method="ldlq")
    res = quantize_layer(W, H, cfg, jax.random.key(5))
    packed = pack_layer_result(res, 3)
    wide = widen_3bit(packed)
    assert wide.bits == 4 and wide.code_bits == 3 and len(wide.planes) == 1
    np.testing.assert_allclose(np.asarray(wide.dequantize(jnp.float64)),
                               np.asarray(packed.dequantize(jnp.float64)),
                               atol=1e-12)
    x = jnp.asarray(rng.standard_normal((5, d)))
    y3 = qlinear_apply(packed, x, use_kernel=False)
    y4 = qlinear_apply(wide, x, use_kernel=False)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y3), atol=1e-9)


def test_widen_3bit_tree_model_and_checkpoint(rng, tmp_path):
    """Tree-walk widening on a stacked packed model preserves logits, and
    a widened tree checkpoint round-trips (code_bits aux survives)."""
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.format import widen_3bit_tree
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(9), cfg)
    rng_t = np.random.default_rng(0)
    calib = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (4, 32)),
                        jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=3, method="ldlq")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 3)
    wide = widen_3bit_tree(packed)
    tokens = jnp.asarray(rng_t.integers(0, cfg.vocab_size, (1, 12)),
                         jnp.int32)
    l3 = np.asarray(M.forward(packed, tokens, cfg))
    l4 = np.asarray(M.forward(wide, tokens, cfg))
    np.testing.assert_allclose(l4, l3, rtol=1e-5, atol=1e-5)

    path = str(tmp_path / "wide")
    save_checkpoint(path, wide, {"wbits": 3})
    loaded, _ = load_checkpoint(path)
    np.testing.assert_allclose(np.asarray(M.forward(loaded, tokens, cfg)),
                               l4, atol=1e-6)

    import os
    os.environ["QUIP_NO_WIDEN3"] = "1"
    try:
        same = widen_3bit_tree(packed)
        assert same is packed
    finally:
        del os.environ["QUIP_NO_WIDEN3"]
