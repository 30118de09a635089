"""END-TO-END quality parity vs the reference's own pipeline (torch, CPU).

tests/test_reference_parity.py pins solver-level equality by importing the
reference's vector_balance/quant code. This goes all the way: build ONE
tiny random-init HF OPT model, quantize it with the reference's own
`opt_sequential` (/root/reference/opt.py:30-190 — hooks, float64 H,
butterfly incoherence, torch LDLQ) AND with this framework's
`quantize_model` from the SAME weights and calibration tokens, then
compare the end metric both pipelines exist to optimize: how little the
quantized model's logits degrade from the fp32 model's.

Exact weight equality is impossible by design (each pipeline draws its own
random orthogonal rotations), so the assertion is on QUALITY: our 2-bit
LDLQ+incoherence logits degradation must be within 1.5x of the
reference's on identical inputs. No reference code is copied; it runs in
place (SURVEY §4g — the offline version of the opt-125m parity run).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# The reference's method.py imports `primefac` (not installed in this
# image). Shim the one function it uses (prime factorization) so the
# reference module loads unmodified.
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

sys.path.insert(0, "/root/reference")
refopt = pytest.importorskip("opt")

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


def test_full_pipeline_quality_parity():
    torch.manual_seed(0)
    V, D, L, H, F, S = 256, 64, 2, 4, 128, 64
    hf_cfg = transformers.OPTConfig(
        vocab_size=V, hidden_size=D, num_hidden_layers=L, ffn_dim=F,
        num_attention_heads=H, max_position_embeddings=128,
        word_embed_proj_dim=D, do_layer_norm_before=True)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval().float()
    hf.seqlen = S

    rng = np.random.default_rng(0)
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

    qcfg = QuantConfig.incoherence(2, "ldlq")
    qparams, _ = quantize_model(params, cfg, jnp.asarray(calib, jnp.int32),
                                qcfg, jax.random.key(0), chunk=nsamples)
    q_ours = np.asarray(M.forward(qparams, evaltok.astype(np.int32), cfg))

    # ---- the reference's own pipeline, in place --------------------
    import argparse
    args = argparse.Namespace(
        quant="ldlq", wbits=2, nsamples=nsamples, percdamp=0.01,
        npasses=0, unbiased=False, qfn="b", groupsize=-1,
        pre_gptqH=True, pre_rescale=True, pre_proj=True, pre_proj_extra=0,
        lazy_batch=False)
    dataloader = [(torch.tensor(calib[i:i + 1]),) for i in range(nsamples)]
    refopt.opt_sequential(hf, dataloader, torch.device("cpu"), args)
    with torch.no_grad():
        q_ref = hf(ev).logits.numpy()

    ref_deg = _rel_deg(q_ref, fp_ref)
    our_deg = _rel_deg(q_ours, fp_ours)
    assert np.isfinite(q_ours).all() and np.isfinite(q_ref).all()
    # the reference pipeline itself must have done something sane
    assert 0.0 < ref_deg < 2.0, ref_deg
    # identical-weights/data quality parity (rotation draws differ)
    assert our_deg <= 1.5 * ref_deg, (our_deg, ref_deg)
