"""End-to-end slice: calibrate -> quantize -> eval perplexity on tiny models.

This is the test-pyramid apex for the quantization side (SURVEY.md §4g):
the full pipeline must (a) run, (b) keep valid grid weights, (c) degrade
perplexity only modestly at 4 bits, and (d) beat nearest at 2 bits.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.eval.ppl import perplexity
from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.quantize.config import QuantConfig
from quip_tpu.quantize.driver import quantize_model, save_hessians


def _toy_stream(rng, vocab, n):
    """Synthetic 'language': markov-ish token stream so the model's H has
    correlated structure."""
    toks = [int(rng.integers(vocab))]
    for _ in range(n - 1):
        if rng.random() < 0.7:
            toks.append((toks[-1] * 7 + 3) % vocab)
        else:
            toks.append(int(rng.integers(vocab)))
    return np.asarray(toks, dtype=np.int32)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    stream = _toy_stream(rng, cfg.vocab_size, 4096)
    seqlen = 64
    calib = stream[: 8 * seqlen].reshape(8, seqlen)
    test = stream[8 * seqlen:]
    return cfg, params, jnp.asarray(calib), test, seqlen


def test_quantize_model_4bit(tiny_setup):
    cfg, params, calib, test, seqlen = tiny_setup
    qcfg = QuantConfig.incoherence(wbits=4, method="ldlq")
    newp, art = quantize_model(params, cfg, calib, qcfg, jax.random.key(1),
                               chunk=4)
    # every linear got quantized
    assert len(art.errors) == cfg.n_layers * len(M.linear_specs(cfg))
    assert all(np.isfinite(v) for v in art.errors.values())

    ppl_fp = perplexity(params, cfg, test, seqlen)
    ppl_q = perplexity(newp, cfg, test, seqlen)
    assert np.isfinite(ppl_q)
    # 4-bit incoherence quantization should cost < 15% ppl on this toy
    assert ppl_q < ppl_fp * 1.15, (ppl_fp, ppl_q)


def test_2bit_ldlq_beats_2bit_nearest(tiny_setup):
    """At 2 bits, LDLQ+incoherence must reconstruct the fp model's *outputs*
    better than plain nearest (logits MSE on held-out windows — a sharper
    discriminator than toy-model perplexity)."""
    cfg, params, calib, test, seqlen = tiny_setup
    k = jax.random.key(2)
    p_ldlq, _ = quantize_model(
        params, cfg, calib, QuantConfig.incoherence(2, "ldlq"), k, chunk=4)
    p_near, _ = quantize_model(
        params, cfg, calib, QuantConfig(wbits=2, method="nearest", qfn="a"),
        k, chunk=4)
    win = jnp.asarray(test[: 4 * seqlen].reshape(4, seqlen).astype(np.int32))
    ref_logits = M.forward(params, win, cfg)

    def mse(p):
        return float(jnp.mean((M.forward(p, win, cfg) - ref_logits) ** 2))

    m_ldlq, m_near = mse(p_ldlq), mse(p_near)
    assert m_ldlq < m_near, (m_ldlq, m_near)


def test_wbits16_is_identity(tiny_setup):
    cfg, params, calib, test, seqlen = tiny_setup
    newp, art = quantize_model(params, cfg, calib,
                               QuantConfig(wbits=16), jax.random.key(3))
    assert art.errors == {}
    a = jax.tree.leaves(params["blocks"])
    b = jax.tree.leaves(newp["blocks"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_layer_filter_subset(tiny_setup):
    """Quantize only fc2 (proxy-eval style, opt_proxy.py:227-236)."""
    cfg, params, calib, test, seqlen = tiny_setup
    newp, art = quantize_model(
        params, cfg, calib, QuantConfig.incoherence(4, "ldlq"),
        jax.random.key(4), layer_filter=["fc2"])
    assert set(k.split(".")[-1] for k in art.errors) == {"fc2"}
    # untouched weights identical
    np.testing.assert_array_equal(
        np.asarray(newp["blocks"]["attn"]["wq"]),
        np.asarray(params["blocks"]["attn"]["wq"]))
    assert not np.array_equal(np.asarray(newp["blocks"]["mlp"]["w2"]),
                              np.asarray(params["blocks"]["mlp"]["w2"]))


def test_save_hessians(tiny_setup):
    cfg, params, calib, *_ = tiny_setup
    Hs = save_hessians(params, cfg, calib, chunk=4)
    assert len(Hs) == cfg.n_layers * len(M.linear_specs(cfg))
    for name, H in Hs.items():
        H = np.asarray(H)
        assert H.shape[0] == H.shape[1]
        np.testing.assert_allclose(H, H.T, atol=1e-4)
        ev = np.linalg.eigvalsh(H)
        assert ev.min() > -1e-4    # PSD up to numerics


def test_llama_family_quantizes(tiny_setup):
    cfg = get_config("llama-tiny")
    params = M.init_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(1)
    stream = _toy_stream(rng, cfg.vocab_size, 1024)
    calib = jnp.asarray(stream[:512].reshape(8, 64))
    newp, art = quantize_model(params, cfg, calib,
                               QuantConfig.incoherence(2, "ldlq"),
                               jax.random.key(6), chunk=4)
    assert len(art.errors) == cfg.n_layers * len(M.linear_specs(cfg))
    ppl = perplexity(newp, cfg, stream[512:], 64)
    assert np.isfinite(ppl)


def test_resume_and_host_offload(tiny_setup, tmp_path):
    """Mid-quantization resume (SURVEY §5.4) + host-offload streaming:
    a resumed run must produce identical weights to an uninterrupted one."""
    cfg, params, calib, test, seqlen = tiny_setup
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    rdir = str(tmp_path / "resume")

    full, _ = quantize_model(params, cfg, calib, qcfg, jax.random.key(9),
                             chunk=4)
    # host_offload consumes AND produces a host-side (numpy) tree: blocks,
    # per-layer artifacts, and the final stack never re-materialize the
    # whole model on device
    host_params = dict(params)
    host_params["blocks"] = jax.tree.map(np.asarray, params["blocks"])
    first, art1 = quantize_model(host_params, cfg, calib, qcfg,
                                 jax.random.key(9), chunk=4,
                                 resume_dir=rdir, host_offload=True)
    assert all(isinstance(x, np.ndarray)
               for x in jax.tree.leaves(first["blocks"]))
    assert all(isinstance(x, np.ndarray)
               for r in art1.results.values() for x in jax.tree.leaves(r))
    # second run resumes every layer from disk
    second, art2 = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(9), chunk=4,
                                  resume_dir=rdir)
    for a, b, c in zip(jax.tree.leaves(full["blocks"]),
                       jax.tree.leaves(second["blocks"]),
                       jax.tree.leaves(first["blocks"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert len(art2.errors) > 0   # errors restored from resume files


def test_fused_qkv_pipeline(tiny_setup):
    """fuse_params -> exact forward equivalence; fused quantization runs,
    packs, and serves with close logits fidelity."""
    from quip_tpu.pack.model import pack_quantized_model

    cfg = get_config("llama-tiny")
    params = M.init_params(jax.random.key(11), cfg)
    fused = M.fuse_params(params, cfg)
    tokens = jnp.asarray(np.arange(12)[None] % cfg.vocab_size, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(M.forward(fused, tokens, cfg)),
        np.asarray(M.forward(params, tokens, cfg)), atol=1e-5)

    rng = np.random.default_rng(3)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    qf, art = quantize_model(fused, cfg, calib, qcfg, jax.random.key(12),
                             chunk=4)
    assert any("qkv_proj" in k for k in art.errors)
    assert any("gate_up_proj" in k for k in art.errors)
    assert len(art.errors) == cfg.n_layers * 4

    packed = pack_quantized_model(qf, cfg, art, 2)
    lg_dense = np.asarray(M.forward(qf, tokens, cfg))
    lg_packed = np.asarray(M.forward(packed, tokens, cfg))
    np.testing.assert_allclose(lg_packed, lg_dense, rtol=1e-3, atol=1e-3)

    # quantized-fused quality comparable to quantized-unfused (logits MSE
    # vs the fp model within 2x of each other)
    qu, _ = quantize_model(params, cfg, calib, qcfg, jax.random.key(12),
                           chunk=4)
    ref = np.asarray(M.forward(params, tokens, cfg))
    mse_f = float(np.mean((np.asarray(M.forward(qf, tokens, cfg)) - ref) ** 2))
    mse_u = float(np.mean((np.asarray(M.forward(qu, tokens, cfg)) - ref) ** 2))
    assert mse_f < mse_u * 2.5, (mse_f, mse_u)


def test_resume_rejects_stale_format(tmp_path):
    """Resume files from an older pack layout must be rejected, not
    silently unflattened (the plane layout changed in v2)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest

    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.quantize import driver as D
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)
    qcfg = QuantConfig(wbits=4, method="nearest", qfn="a")
    rdir = str(tmp_path / "resume")
    quantize_model(params, cfg, calib, qcfg, jax.random.key(1), chunk=4,
                   resume_dir=rdir)
    # tamper: rewrite layer 0 with a v1 version stamp
    path = D._resume_path(rdir, 0)
    data = dict(np.load(path, allow_pickle=False))
    data["__format_version__"] = np.asarray(1, np.int64)
    np.savez(path, **data)
    template = jax.tree.map(lambda x: x[0], params["blocks"])
    with pytest.raises(ValueError, match="layout v1"):
        D._load_resume_layer(rdir, 0, template)


def test_resume_roundtrips_bfloat16(tmp_path):
    """Resume files must round-trip ml_dtypes leaves (bfloat16 is the TPU
    default model dtype; raw np.savez mangles it to void16)."""
    import ml_dtypes

    from quip_tpu.quantize import driver as D

    layer = {"w": np.arange(12, dtype=np.float32).reshape(3, 4)
             .astype(ml_dtypes.bfloat16),
             "b": np.ones((3,), np.float32)}
    D._save_resume_layer(str(tmp_path), 0, layer, {"layers.0.w": 0.5})
    got, errs = D._load_resume_layer(str(tmp_path), 0, layer)
    assert got["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got["w"]), layer["w"])
    np.testing.assert_array_equal(np.asarray(got["b"]), layer["b"])
    assert errs == {"layers.0.w": 0.5}


def test_host_offload_end_to_end_packed(tiny_setup, tmp_path):
    """The full 70B-on-small-slice flow at tiny scale: host-built params ->
    host_offload quantize -> on_host pack -> checkpoint -> reload serves
    the same logits as the all-device flow."""
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)

    cfg, params, calib, test, seqlen = tiny_setup
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")

    host_params = jax.tree.map(np.asarray, params)
    newp, art = quantize_model(host_params, cfg, calib, qcfg,
                               jax.random.key(3), chunk=4,
                               host_offload=True)
    packed = pack_quantized_model(newp, cfg, art, 2, on_host=True)
    # the packed tree is host-side numpy throughout
    assert all(isinstance(x, np.ndarray)
               for x in jax.tree.leaves(packed["blocks"]))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, packed, {"wbits": 2})
    loaded, _ = load_checkpoint(ck)

    dev_newp, dev_art = quantize_model(params, cfg, calib, qcfg,
                                       jax.random.key(3), chunk=4)
    dev_packed = pack_quantized_model(dev_newp, cfg, dev_art, 2)
    tokens = np.asarray(test[:32].reshape(1, 32), np.int32)
    got = np.asarray(M.forward(loaded, tokens, cfg))
    want = np.asarray(M.forward(dev_packed, tokens, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quant_head_untied(tiny_setup):
    """--quant_head: the (untied) lm_head is quantized against the true
    head-input Hessian, packs, and serves (packed-vs-dense parity)."""
    from quip_tpu.pack.model import pack_quantized_model

    cfg = get_config("llama-tiny")
    params = M.init_params(jax.random.key(21), cfg)
    rng = np.random.default_rng(7)
    stream = _toy_stream(rng, cfg.vocab_size, 1024)
    calib = jnp.asarray(stream[:512].reshape(8, 64))
    qcfg = QuantConfig.incoherence(wbits=4, method="ldlq")
    newp, art = quantize_model(params, cfg, calib, qcfg, jax.random.key(22),
                               chunk=4, quant_head=True)
    assert "lm_head" in art.errors and np.isfinite(art.errors["lm_head"])
    assert not np.array_equal(np.asarray(newp["lm_head"]),
                              np.asarray(params["lm_head"]))

    # quality: quantized-head model still tracks the fp model's logits
    win = jnp.asarray(stream[512: 512 + 2 * 64].reshape(2, 64))
    ref = np.asarray(M.forward(params, win, cfg))
    got = np.asarray(M.forward(newp, win, cfg))
    assert np.isfinite(got).all()
    base = float(np.mean(ref ** 2))
    assert float(np.mean((got - ref) ** 2)) < base, "head quant destroyed logits"

    packed = pack_quantized_model(newp, cfg, art, 4)
    from quip_tpu.pack.format import PackedLinear
    assert isinstance(packed["lm_head"], PackedLinear)
    lg_dense = np.asarray(M.forward(newp, win, cfg))
    lg_packed = np.asarray(M.forward(packed, win, cfg))
    np.testing.assert_allclose(lg_packed, lg_dense, rtol=2e-3, atol=2e-3)


def test_quant_head_rejects_tied(tiny_setup):
    cfg, params, calib, test, seqlen = tiny_setup   # opt-tiny is tied
    with pytest.raises(ValueError, match="untied"):
        quantize_model(params, cfg, calib,
                       QuantConfig.incoherence(wbits=4, method="ldlq"),
                       jax.random.key(1), chunk=4, quant_head=True)
