"""END-TO-END quality parity vs the reference's own pipelines (torch, CPU).

tests/test_reference_parity.py pins solver-level equality by importing the
reference's vector_balance/quant code. This goes all the way: build ONE
tiny random-init HF model, quantize it with the reference's own sequential
driver (/root/reference/opt.py:30-190, llama.py:36-171 — hooks, float64 H,
butterfly incoherence, torch rounding) AND with this framework's
`quantize_model` from the SAME weights and calibration tokens, then
compare the end metric both pipelines exist to optimize: how little the
quantized model's logits degrade from the fp32 model's.

Exact weight equality is impossible by design (each pipeline draws its own
random orthogonal rotations), so the assertion is on QUALITY: our logits
degradation must be within 1.5x of the reference's on identical inputs.
The matrix (VERDICT r3 item 5): OPT at 2-bit LDLQ (two seeds), OPT at
4-bit, and Llama (RoPE + GQA — where positional plumbing bugs would hide)
against the reference's own `llama_sequential` GPTQ path. Observed ratios
(our_deg / ref_deg) recorded per run in the assert message; the 1.5x
bound holds with margin across the matrix. No reference code is copied;
it runs in place (SURVEY §4g — the offline version of the opt-125m
parity run).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# The reference's method.py imports `primefac`, llama.py imports
# `texttable` (neither installed in this image). Shim the slivers it uses
# so the reference modules load unmodified.
if "primefac" not in sys.modules:
    def _primefac(n):
        d = 2
        while d * d <= n:
            while n % d == 0:
                yield d
                n //= d
            d += 1
        if n > 1:
            yield n

    _m = types.ModuleType("primefac")
    _m.primefac = _primefac
    sys.modules["primefac"] = _m

if "texttable" not in sys.modules:
    _t = types.ModuleType("texttable")

    class _Texttable:                      # llama.py only builds tables
        def __getattr__(self, k):
            return lambda *a, **kw: self

    _t.Texttable = _Texttable
    sys.modules["texttable"] = _t

# The reference's gptq.py calls torch.cuda.synchronize() unconditionally
# (it assumes a GPU box); a no-op shim lets the math run on CPU torch.
if not torch.cuda.is_available():
    torch.cuda.synchronize = lambda *a, **k: None

sys.path.insert(0, "/root/reference")
refopt = pytest.importorskip("opt")
refllama = pytest.importorskip("llama")

# The reference solver returns fp16 weights (vector_balance.py:520,530 —
# it assumes fp16 GPU checkpoints), which clashes with the float32 CPU
# model torch builds here. Cast its output back to float at the test
# boundary: a storage-precision accommodation, not a semantic change (the
# fp16 rounding of already-2-bit-quantized weights is noise vs the
# quantization error being compared).
import bal as _refbal                                     # noqa: E402
_orig_qwv = _refbal.quantize_weight_vecbal
_refbal.quantize_weight_vecbal = (
    lambda *a, **k: _orig_qwv(*a, **k).float())

from quip_tpu.models import model as M                    # noqa: E402
from quip_tpu.models.config import ModelConfig            # noqa: E402
from quip_tpu.models.hf_import import state_dict_to_params  # noqa: E402
from quip_tpu.quantize.config import QuantConfig          # noqa: E402
from quip_tpu.quantize.driver import quantize_model       # noqa: E402


def _rel_deg(q, fp):
    return float(np.linalg.norm(q - fp) / np.linalg.norm(fp))


def _ref_args(quant, wbits, nsamples):
    import argparse
    return argparse.Namespace(
        quant=quant, wbits=wbits, nsamples=nsamples, percdamp=0.01,
        npasses=0, unbiased=False, qfn="b", groupsize=-1,
        pre_gptqH=True, pre_rescale=True, pre_proj=True, pre_proj_extra=0,
        lazy_batch=False, qbits=wbits)


@pytest.mark.parametrize("wbits,seed", [(2, 0), (4, 0), (2, 1)])
def test_opt_pipeline_quality_parity(wbits, seed):
    torch.manual_seed(seed)
    V, D, L, H, F, S = 256, 64, 2, 4, 128, 64
    hf_cfg = transformers.OPTConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L, ffn_dim=F,
        num_attention_heads=H, max_position_embeddings=128,
        word_embed_proj_dim=D, do_layer_norm_before=True)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval().float()
    hf.seqlen = S

    rng = np.random.default_rng(seed)
    nsamples = 6
    calib = rng.integers(1, V, (nsamples, S))
    evaltok = rng.integers(1, V, (2, S))
    ev = torch.tensor(evaltok)
    with torch.no_grad():
        fp_ref = hf(ev).logits.numpy()

    # ---- our framework, SAME weights -------------------------------
    cfg = ModelConfig(family="opt", vocab_size=V, d_model=D, n_layers=L,
                      n_heads=H, d_ff=F, max_seq=128)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = state_dict_to_params(sd, cfg, dtype="float32")
    fp_ours = np.asarray(M.forward(params, evaltok.astype(np.int32), cfg))
    # both fp models are the same function (hf_import parity)
    np.testing.assert_allclose(fp_ours / np.abs(fp_ref).max(),
                               fp_ref / np.abs(fp_ref).max(), atol=2e-3)

    qcfg = QuantConfig.incoherence(wbits, "ldlq")
    qparams, _ = quantize_model(params, cfg, jnp.asarray(calib, jnp.int32),
                                qcfg, jax.random.key(seed), chunk=nsamples)
    q_ours = np.asarray(M.forward(qparams, evaltok.astype(np.int32), cfg))

    # ---- the reference's own pipeline, in place --------------------
    refopt.opt_sequential(
        hf, [(torch.tensor(calib[i:i + 1]),) for i in range(nsamples)],
        torch.device("cpu"), _ref_args("ldlq", wbits, nsamples))
    with torch.no_grad():
        q_ref = hf(ev).logits.numpy()

    ref_deg = _rel_deg(q_ref, fp_ref)
    our_deg = _rel_deg(q_ours, fp_ours)
    assert np.isfinite(q_ours).all() and np.isfinite(q_ref).all()
    # the reference pipeline itself must have done something sane
    assert 0.0 < ref_deg < 2.0, ref_deg
    # identical-weights/data quality parity (rotation draws differ)
    assert our_deg <= 1.5 * ref_deg, \
        (wbits, seed, our_deg, ref_deg, our_deg / ref_deg)


class _LayerAdapter(torch.nn.Module):
    """transformers>=4.4x API bridge for the reference's llama replay.

    llama_sequential (llama.py:95-100, 158-159) replays layers with
    (hidden_states, attention_mask, position_ids) — the API the reference
    was written against. Modern LlamaAttention requires the rotary
    `position_embeddings` tuple instead and no longer derives it from
    position_ids. This wrapper recomputes it from the model's own
    rotary_emb when absent — an environment bridge, not a change to the
    reference's math (same cos/sin the full model forward would pass)."""

    def __init__(self, layer, rotary):
        super().__init__()
        self.module = layer
        self.rotary = rotary

    def forward(self, hidden_states, attention_mask=None,
                position_ids=None, **kw):
        if kw.get("position_embeddings") is None and position_ids is not None:
            kw["position_embeddings"] = self.rotary(hidden_states,
                                                    position_ids)
        return self.module(hidden_states, attention_mask=attention_mask,
                           position_ids=position_ids, **kw)


def test_llama_pipeline_quality_parity():
    """Llama (RoPE + GQA) end-to-end vs the reference's own
    llama_sequential GPTQ path (llama.py:36-171; its Balance path crashes
    upstream on the undefined args.qbits — SURVEY §7 known quirk)."""
    torch.manual_seed(0)
    V, D, L, H, KV, F, S = 256, 64, 2, 4, 2, 128, 64
    hf_cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=KV,
        intermediate_size=F, max_position_embeddings=128)
    with torch.no_grad():
        hf = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    hf.seqlen = S

    rng = np.random.default_rng(0)
    nsamples = 6
    calib = rng.integers(1, V, (nsamples, S))
    evaltok = rng.integers(1, V, (2, S))
    ev = torch.tensor(evaltok)
    with torch.no_grad():
        fp_ref = hf(ev).logits.numpy()

    # ---- our framework, SAME weights -------------------------------
    cfg = ModelConfig(family="llama", vocab_size=V, d_model=D, n_layers=L,
                      n_heads=H, n_kv_heads=KV, d_ff=F, positions="rope",
                      norm="rms", act="silu_glu",
                      tie_word_embeddings=False, attn_bias=False,
                      mlp_bias=False, max_seq=128,
                      norm_eps=hf_cfg.rms_norm_eps)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = state_dict_to_params(sd, cfg, dtype="float32")
    fp_ours = np.asarray(M.forward(params, evaltok.astype(np.int32), cfg))
    np.testing.assert_allclose(fp_ours / np.abs(fp_ref).max(),
                               fp_ref / np.abs(fp_ref).max(), atol=2e-3)

    qcfg = QuantConfig.incoherence(2, "gptq")
    qparams, _ = quantize_model(params, cfg, jnp.asarray(calib, jnp.int32),
                                qcfg, jax.random.key(0), chunk=nsamples)
    q_ours = np.asarray(M.forward(qparams, evaltok.astype(np.int32), cfg))

    # ---- the reference's own pipeline, in place --------------------
    rot = hf.model.rotary_emb
    for i, lay in enumerate(hf.model.layers):
        hf.model.layers[i] = _LayerAdapter(lay, rot)
    refllama.args = _ref_args("gptq", 2, nsamples)
    refllama.llama_sequential(
        hf, [(torch.tensor(calib[i:i + 1]),) for i in range(nsamples)],
        torch.device("cpu"))
    with torch.no_grad():
        q_ref = hf(ev).logits.numpy()

    ref_deg = _rel_deg(q_ref, fp_ref)
    our_deg = _rel_deg(q_ours, fp_ours)
    assert np.isfinite(q_ours).all() and np.isfinite(q_ref).all()
    assert 0.0 < ref_deg < 2.0, ref_deg
    assert our_deg <= 1.5 * ref_deg, (our_deg, ref_deg, our_deg / ref_deg)
