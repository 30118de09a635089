"""Import HuggingFace checkpoints into quip_tpu param trees.

Replaces the reference's `OPTForCausalLM.from_pretrained` + in-place surgery
(opt.py:14-26, llama.py:17-33) with a direct state-dict -> pytree mapping
(no torch modules are built; tensors are converted leaf-by-leaf so a 70B
import streams instead of double-materializing).

Sources: a local directory containing *.safetensors or pytorch_model*.bin,
or anything `transformers` can resolve from its cache. Works fully offline
when files are local.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Iterator, Tuple

import numpy as np
import jax.numpy as jnp

from quip_tpu.models.config import ModelConfig, get_config


def _iter_state_dict(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) from local checkpoint files."""
    sts = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))) or \
        sorted(glob.glob(os.path.join(path, "*.bin")))
    if sts:
        from safetensors import safe_open

        for f in sts:
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    yield k, sf.get_tensor(k)
    elif bins:
        import torch

        for f in bins:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                yield k, _torch_to_np(v)
    else:
        raise FileNotFoundError(f"no checkpoint files under {path!r}")


def _torch_to_np(v) -> np.ndarray:
    """torch tensor -> numpy without dtype inflation (bf16 has no native
    numpy conversion; go through a uint16 view into ml_dtypes)."""
    import torch

    if v.dtype == torch.bfloat16:
        import ml_dtypes

        return v.contiguous().view(torch.uint16).numpy() \
            .view(ml_dtypes.bfloat16)
    return v.numpy()


class LazyStateDict:
    """Read-on-demand view over sharded *.safetensors files.

    Each tensor is read from disk only when accessed and never retained
    here, so building a param tree from an N-GB checkpoint peaks at
    ~(output tree + one tensor) of host RAM instead of 2N GB. This is the
    host-side loader required to quantize models whose fp16 state dict
    doesn't fit alongside the built tree (70B on a small host).
    """

    def __init__(self, files):
        from safetensors import safe_open

        self._handles = {}
        self._where: Dict[str, str] = {}
        for f in files:
            h = safe_open(f, framework="np")
            self._handles[f] = h
            for k in h.keys():
                self._where[k] = f

    def __getitem__(self, k: str) -> np.ndarray:
        return self._handles[self._where[k]].get_tensor(k)

    def __contains__(self, k: str) -> bool:
        return k in self._where

    def __iter__(self):
        return iter(self._where)

    def __len__(self):
        return len(self._where)

    def keys(self):
        return self._where.keys()


class LazyBinStateDict:
    """One-shard-resident view over sharded pytorch_model-*.bin files.

    Uses the HF ``pytorch_model.bin.index.json`` weight map to load one
    shard at a time (HF shards are layer-contiguous, so the sequential
    access pattern of state_dict_to_params touches each shard ~once).
    Peak host RAM: output tree + one shard, instead of 2x model size.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, "pytorch_model.bin.index.json")) as f:
            idx = json.load(f)
        self._where = {k: os.path.join(path, v)
                       for k, v in idx["weight_map"].items()}
        self._cur_file: str | None = None
        self._cur_sd: Dict[str, Any] = {}

    def __getitem__(self, k: str) -> np.ndarray:
        import torch

        f = self._where[k]
        if f != self._cur_file:
            self._cur_sd = torch.load(f, map_location="cpu",
                                      weights_only=True)
            self._cur_file = f
        return _torch_to_np(self._cur_sd[k])

    def __contains__(self, k: str) -> bool:
        return k in self._where

    def __iter__(self):
        return iter(self._where)

    def __len__(self):
        return len(self._where)

    def keys(self):
        return self._where.keys()


def state_dict_to_params(sd: Dict[str, np.ndarray],
                         cfg: ModelConfig, dtype=None,
                         on_host: bool = False) -> Dict[str, Any]:
    """Map an HF state dict (name -> array) to a quip_tpu param tree.

    ``on_host``: build numpy leaves in host RAM instead of device arrays —
    the tree never touches the accelerator (pairs with the quantize
    driver's ``host_offload`` block streaming; sd may be a LazyStateDict
    so neither the state dict nor the tree is ever double-resident).
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    fam = cfg.family

    if on_host:
        def _as(arr):
            return np.asarray(arr).astype(dtype)   # ml_dtypes handles bf16
    else:
        def _as(arr):
            return jnp.asarray(np.asarray(arr), dtype)

    def g(name):
        return _as(sd[name])

    def maybe(name):
        return g(name) if name in sd else None

    def lin_t(name):           # HF Linear weight (out, in) -> ours (in, out)
        return _as(np.asarray(sd[name]).T)

    D, H, KV, hd = cfg.d_model, cfg.n_heads, cfg.kv_heads, cfg.hd

    if fam == "opt":
        pre = "model.decoder."
        if pre + "embed_tokens.weight" not in sd and \
                "decoder.embed_tokens.weight" in sd:
            pre = "decoder."
        embed = {"tokens": g(pre + "embed_tokens.weight"),
                 "positions": g(pre + "embed_positions.weight")}
        if cfg.embed_proj_dim is not None:
            embed["proj_in"] = lin_t(pre + "project_in.weight")
            embed["proj_out"] = lin_t(pre + "project_out.weight")
        blocks = []
        for i in range(cfg.n_layers):
            b = f"{pre}layers.{i}."
            attn = {}
            for ours, hf in (("wq", "q_proj"), ("wk", "k_proj"),
                             ("wv", "v_proj"), ("wo", "out_proj")):
                attn[ours] = lin_t(b + f"self_attn.{hf}.weight")
                attn["b" + ours[1:]] = g(b + f"self_attn.{hf}.bias")
            blocks.append({
                "ln1": {"scale": g(b + "self_attn_layer_norm.weight"),
                        "bias": g(b + "self_attn_layer_norm.bias")},
                "ln2": {"scale": g(b + "final_layer_norm.weight"),
                        "bias": g(b + "final_layer_norm.bias")},
                "attn": attn,
                "mlp": {"w1": lin_t(b + "fc1.weight"),
                        "b1": g(b + "fc1.bias"),
                        "w2": lin_t(b + "fc2.weight"),
                        "b2": g(b + "fc2.bias")},
            })
        final_ln = None
        if cfg.do_layer_norm_before:
            final_ln = {"scale": g(pre + "final_layer_norm.weight"),
                        "bias": g(pre + "final_layer_norm.bias")}
        params = {"embed": embed, "final_ln": final_ln}
    elif fam == "llama":
        pre = "model."
        embed = {"tokens": g(pre + "embed_tokens.weight")}
        blocks = []
        for i in range(cfg.n_layers):
            b = f"{pre}layers.{i}."
            blocks.append({
                "ln1": {"scale": g(b + "input_layernorm.weight")},
                "ln2": {"scale": g(b + "post_attention_layernorm.weight")},
                "attn": {
                    "wq": lin_t(b + "self_attn.q_proj.weight"),
                    "wk": lin_t(b + "self_attn.k_proj.weight"),
                    "wv": lin_t(b + "self_attn.v_proj.weight"),
                    "wo": lin_t(b + "self_attn.o_proj.weight"),
                },
                "mlp": {"wg": lin_t(b + "mlp.gate_proj.weight"),
                        "wu": lin_t(b + "mlp.up_proj.weight"),
                        "wd": lin_t(b + "mlp.down_proj.weight")},
            })
        params = {
            "embed": embed,
            "final_ln": {"scale": g(pre + "norm.weight")},
            "lm_head": lin_t("lm_head.weight"),
        }
    elif fam == "bloom":
        pre = "transformer." if "transformer.word_embeddings.weight" in sd \
            else ""
        embed = {
            "tokens": g(pre + "word_embeddings.weight"),
            "ln": {"scale": g(pre + "word_embeddings_layernorm.weight"),
                   "bias": g(pre + "word_embeddings_layernorm.bias")},
        }
        blocks = []
        for i in range(cfg.n_layers):
            b = f"{pre}h.{i}."
            # fused QKV layout: (H, 3, hd, D) on the output axis
            qkv_w = np.asarray(sd[b + "self_attention.query_key_value.weight"])
            qkv_b = np.asarray(sd[b + "self_attention.query_key_value.bias"])
            qkv_w = qkv_w.reshape(H, 3, hd, D)
            qkv_b = qkv_b.reshape(H, 3, hd)

            def take(j):
                w = qkv_w[:, j].reshape(H * hd, D).T      # (in, out)
                bb = qkv_b[:, j].reshape(H * hd)
                return (_as(w), _as(bb))

            (wq, bq), (wk, bk), (wv, bv) = take(0), take(1), take(2)
            blocks.append({
                "ln1": {"scale": g(b + "input_layernorm.weight"),
                        "bias": g(b + "input_layernorm.bias")},
                "ln2": {"scale": g(b + "post_attention_layernorm.weight"),
                        "bias": g(b + "post_attention_layernorm.bias")},
                "attn": {"wq": wq, "bq": bq, "wk": wk, "bk": bk,
                         "wv": wv, "bv": bv,
                         "wo": lin_t(b + "self_attention.dense.weight"),
                         "bo": g(b + "self_attention.dense.bias")},
                "mlp": {"w1": lin_t(b + "mlp.dense_h_to_4h.weight"),
                        "b1": g(b + "mlp.dense_h_to_4h.bias"),
                        "w2": lin_t(b + "mlp.dense_4h_to_h.weight"),
                        "b2": g(b + "mlp.dense_4h_to_h.bias")},
            })
        params = {
            "embed": embed,
            "final_ln": {"scale": g(pre + "ln_f.weight"),
                         "bias": g(pre + "ln_f.bias")},
        }
    else:
        raise ValueError(fam)

    import jax
    stack = np.stack if on_host else jnp.stack
    params["blocks"] = jax.tree.map(lambda *xs: stack(xs), *blocks)
    return params


def load_hf_params(path_or_name: str, cfg: ModelConfig | None = None,
                   dtype=None, on_host: bool = False):
    """Load from a local checkpoint dir (or transformers cache).

    ``on_host`` keeps the result in host RAM (numpy leaves) and, for
    safetensors checkpoints, streams tensors one at a time off disk
    (LazyStateDict) — nothing is materialized twice and nothing lands on
    the accelerator. Use together with the driver's ``host_offload``.
    """
    if cfg is None:
        cfg = get_config(path_or_name)
    if os.path.isdir(path_or_name):
        path = path_or_name
    else:
        from huggingface_hub import snapshot_download

        path = snapshot_download(path_or_name,
                                 allow_patterns=["*.safetensors", "*.bin",
                                                 "*.json"])
    sts = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if sts:
        sd = LazyStateDict(sts)
    elif os.path.exists(os.path.join(path, "pytorch_model.bin.index.json")):
        sd = LazyBinStateDict(path)
    else:
        # single-file .bin: torch.load is all-at-once by nature; peak host
        # RAM = checkpoint + output tree (no fp32 inflation — _torch_to_np
        # keeps the stored dtype)
        sd = dict(_iter_state_dict(path))
    return state_dict_to_params(sd, cfg, dtype, on_host=on_host), cfg
