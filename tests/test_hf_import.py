"""HF checkpoint import + logits parity vs transformers (torch CPU).

The strongest model-correctness test we can run offline: construct a tiny
random-init HF model (no download), import its state dict, and require
logits agreement between transformers' torch forward and our JAX forward.
"""
import numpy as np
import pytest

import jax

from quip_tpu.models.config import ModelConfig
from quip_tpu.models import model as M
from quip_tpu.models.hf_import import state_dict_to_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _np_sd(model):
    return {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()}


def _compare(logits_hf, logits_jax, atol=2e-3):
    a = np.asarray(logits_hf)
    b = np.asarray(logits_jax)
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(a / scale, b / scale, atol=atol)


def test_opt_parity():
    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=True)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(family="opt", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, max_seq=64)
    params = state_dict_to_params(_np_sd(hf), cfg, dtype="float32")
    tokens = np.array([[1, 5, 9, 2, 7, 3]], np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(tokens)).logits.numpy()
    got = M.forward(params, np.asarray(tokens, np.int32), cfg)
    _compare(want, got)


def test_opt350m_style_parity():
    """post-LN + embed projection variant (OPT-350m shape family)."""
    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=16, do_layer_norm_before=False)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(family="opt", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, max_seq=64, embed_proj_dim=16,
                      do_layer_norm_before=False)
    params = state_dict_to_params(_np_sd(hf), cfg, dtype="float32")
    tokens = np.array([[4, 2, 8, 1]], np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(tokens)).logits.numpy()
    got = M.forward(params, np.asarray(tokens, np.int32), cfg)
    _compare(want, got)


def test_llama_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, tie_word_embeddings=False)
    with torch.no_grad():
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(family="llama", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, n_kv_heads=2, d_ff=64, positions="rope",
                      norm="rms", act="silu_glu", tie_word_embeddings=False,
                      attn_bias=False, mlp_bias=False, max_seq=64,
                      norm_eps=hf_cfg.rms_norm_eps)
    params = state_dict_to_params(_np_sd(hf), cfg, dtype="float32")
    tokens = np.array([[3, 7, 1, 9, 2]], np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(tokens)).logits.numpy()
    got = M.forward(params, np.asarray(tokens, np.int32), cfg)
    _compare(want, got)


def test_bloom_parity():
    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
        apply_residual_connection_post_layernorm=False)
    with torch.no_grad():
        hf = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(family="bloom", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, d_ff=128, positions="alibi", norm="ln",
                      act="gelu", embed_layer_norm=True, max_seq=64)
    params = state_dict_to_params(_np_sd(hf), cfg, dtype="float32")
    tokens = np.array([[3, 7, 1, 9]], np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(tokens)).logits.numpy()
    got = M.forward(params, np.asarray(tokens, np.int32), cfg)
    _compare(want, got)


def test_on_host_lazy_safetensors_import(tmp_path):
    """--host_offload loader: safetensors stream tensor-by-tensor
    (LazyStateDict) into a pure-numpy tree; forward parity with the
    device-side import."""
    safetensors = pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from quip_tpu.models.hf_import import load_hf_params

    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=True)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval()
    save_file(_np_sd(hf), str(tmp_path / "model.safetensors"))

    cfg = ModelConfig(family="opt", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, max_seq=64)
    host, _ = load_hf_params(str(tmp_path), cfg, dtype="float32",
                             on_host=True)
    assert all(isinstance(x, np.ndarray) for x in jax.tree.leaves(host))
    dev, _ = load_hf_params(str(tmp_path), cfg, dtype="float32")
    tokens = np.array([[1, 5, 9, 2]], np.int32)
    np.testing.assert_allclose(np.asarray(M.forward(host, tokens, cfg)),
                               np.asarray(M.forward(dev, tokens, cfg)),
                               atol=1e-6)


def test_sharded_bin_lazy_import(tmp_path):
    """LazyBinStateDict: sharded pytorch .bin checkpoints stream one shard
    at a time via the HF index; parity with the eager import."""
    import json

    from quip_tpu.models.hf_import import LazyBinStateDict, load_hf_params

    hf_cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=True)
    with torch.no_grad():
        hf = transformers.OPTForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()
    keys = sorted(sd.keys())
    half = len(keys) // 2
    shards = {"pytorch_model-00001-of-00002.bin": keys[:half],
              "pytorch_model-00002-of-00002.bin": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        torch.save({k: sd[k] for k in ks}, str(tmp_path / fname))
        weight_map.update({k: fname for k in ks})
    with open(tmp_path / "pytorch_model.bin.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)

    lazy = LazyBinStateDict(str(tmp_path))
    assert set(lazy.keys()) == set(keys)

    cfg = ModelConfig(family="opt", vocab_size=128, d_model=32, n_layers=2,
                      n_heads=4, d_ff=64, max_seq=64)
    host, _ = load_hf_params(str(tmp_path), cfg, dtype="float32",
                             on_host=True)
    assert all(isinstance(x, np.ndarray) for x in jax.tree.leaves(host))
    want = state_dict_to_params(_np_sd(hf), cfg, dtype="float32")
    tokens = np.array([[3, 1, 4, 1, 5]], np.int32)
    np.testing.assert_allclose(np.asarray(M.forward(host, tokens, cfg)),
                               np.asarray(M.forward(want, tokens, cfg)),
                               atol=1e-6)
