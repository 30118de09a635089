"""Packed-model assembly and checkpoint IO.

Replaces the reference's pack/load drivers (opt_pack3/load_quant3,
/root/reference/opt.py:302-381, llama.py:256-358) with a TPU-native packed
checkpoint: int2/3/4 payload planes + grid params + PRNG keys that
regenerate the incoherence rotations (SURVEY.md §5.4). A packed Llama-2-7B
at 2 bits is ~2 GB instead of 13 GB fp16.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from quip_tpu.models import model as M
from quip_tpu.models.config import ModelConfig
from quip_tpu.pack.format import PackedLinear, pack_layer_result


def pack_quantized_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    artifacts,                      # QuantizedModelArtifacts
    wbits: int,
    on_host: bool = False,
) -> Dict[str, Any]:
    """Swap each quantized linear's dense leaf for a PackedLinear.

    The result is a drop-in param tree: models/model.py routes every
    projection through ops.qlinear.linear_apply, which dispatches on leaf
    type. Blocks stay stacked (scan-compatible — PackedLinear is a pytree).

    ``on_host``: pull each layer's packed planes back to host as they are
    built and stack in numpy — device residency stays at one layer
    (the host_offload path for models whose packed form exceeds HBM).
    """
    specs = M.linear_specs(cfg, fused="wqkv" in params["blocks"]["attn"])
    blocks = params["blocks"]
    per_layer = []
    for li in range(cfg.n_layers):
        layer = jax.tree.map(lambda x: x[li], blocks)
        for spec in specs:
            res = artifacts.results.get(f"layers.{li}.{spec.name}")
            if res is None or res.codes is None:
                continue
            packed = pack_layer_result(res, wbits)
            if on_host:
                packed = jax.tree.map(np.asarray, packed)
            layer = _set_path(layer, spec.path, packed)
        per_layer.append(layer)
    stack = np.stack if on_host else jnp.stack
    new_blocks = jax.tree.map(lambda *xs: stack(xs), *per_layer)
    out = dict(params)
    out["blocks"] = new_blocks
    head = artifacts.results.get("lm_head")
    if head is not None and head.codes is not None:
        packed = pack_layer_result(head, wbits)
        if on_host:
            packed = jax.tree.map(np.asarray, packed)
        out["lm_head"] = packed           # unembed dispatches on leaf type
    return out


def unpack_model(params):
    """Packed -> dense: replace every PackedLinear with its dequantized
    (in, out) dense weight (the load_quant parity direction,
    /root/reference/opt.py:318-348 rebuilt dense fp16 from checkpoints).
    The walk is layout-aware: stacked (layers-leading) PackedLinear leaves
    dequantize per layer."""
    import jax.numpy as jnp

    from quip_tpu.pack.format import PackedLinear

    def walk(tree):
        if isinstance(tree, PackedLinear):
            plane0 = tree.planes[0]
            if plane0.ndim == 3:            # stacked over layers
                layers = []
                for li in range(plane0.shape[0]):
                    one = jax.tree.map(lambda x: x[li], tree)
                    layers.append(one.dequantize(jnp.float32).T)
                return jnp.stack(layers)
            return tree.dequantize(jnp.float32).T
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(params)


def _set_path(tree, path, value):
    out = dict(tree)
    if len(path) == 1:
        out[path[0]] = value
    else:
        out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


# ---------------------------------------------------------------------------
# Checkpoint IO (flat .npz + JSON treedef) — works for dense and packed trees
# ---------------------------------------------------------------------------


# numpy's npz format round-trips ml_dtypes (bfloat16, fp8) as opaque void
# descriptors ('|V2'); store such leaves as raw integer views with the real
# dtype recorded in tree.json
_EXOTIC_VIEWS = {
    "bfloat16": np.uint16,
    "float8_e4m3fn": np.uint8,
    "float8_e5m2": np.uint8,
    "float8_e4m3": np.uint8,
}


def _leaf_to_np(x):
    a = np.asarray(x)
    name = a.dtype.name
    if name in _EXOTIC_VIEWS:
        return a.view(_EXOTIC_VIEWS[name]), name
    return a, None


def save_checkpoint(path: str, params: Dict[str, Any],
                    meta: Dict[str, Any] | None = None) -> None:
    """Save a (possibly packed) param tree.

    Layout: <path>/arrays.npz with leaves keyed by index, plus tree.json
    holding the treedef repr and metadata. PackedLinear aux data round-trips
    through the pytree registry.
    """
    from quip_tpu.pack.format import PACK_FORMAT_VERSION

    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(params)
    arrays, exotic = {}, {}
    for i, x in enumerate(leaves):
        a, name = _leaf_to_np(x)
        arrays[f"leaf_{i}"] = a
        if name:
            exotic[str(i)] = name
    np.savez(os.path.join(path, "arrays.npz"), **arrays)
    spec = {
        "treedef": _treedef_to_json(params),
        "meta": meta or {},
        "n_leaves": len(leaves),
        "leaf_dtypes": exotic,
        "pack_format_version": PACK_FORMAT_VERSION,
    }
    with open(os.path.join(path, "tree.json"), "w") as f:
        json.dump(spec, f)


def load_checkpoint(path: str) -> tuple[Dict[str, Any], Dict[str, Any]]:
    import ml_dtypes

    from quip_tpu.pack.format import PACK_FORMAT_VERSION

    with open(os.path.join(path, "tree.json")) as f:
        spec = json.load(f)
    ver = spec.get("pack_format_version", 1)
    if ver != PACK_FORMAT_VERSION:
        raise ValueError(
            f"checkpoint at {path} uses packed-plane layout v{ver}; this "
            f"build reads v{PACK_FORMAT_VERSION} (halfword-spread "
            f"transposed). Re-quantize or transcode the checkpoint.")
    data = np.load(os.path.join(path, "arrays.npz"))
    exotic = spec.get("leaf_dtypes", {})
    leaves = []
    for i in range(spec["n_leaves"]):
        a = data[f"leaf_{i}"]
        name = exotic.get(str(i))
        if name:
            a = a.view(getattr(ml_dtypes, name))
        leaves.append(jnp.asarray(a))
    tree = _treedef_from_json(spec["treedef"], iter(leaves))
    return tree, spec["meta"]


def _treedef_to_json(tree) -> Any:
    """Serialize the tree structure (dicts/lists/tuples/PackedLinear/None)
    with leaves replaced by a sentinel."""
    if isinstance(tree, dict):
        # jax.tree.flatten visits dict keys in sorted order; serialize in the
        # same order so leaves re-attach correctly on load
        return {"__t": "dict",
                "items": {k: _treedef_to_json(tree[k])
                          for k in sorted(tree.keys())}}
    if isinstance(tree, (list, tuple)):
        kind = "list" if isinstance(tree, list) else "tuple"
        # NamedTuples (KVCache etc.) are stored as plain tuples
        return {"__t": kind, "items": [_treedef_to_json(v) for v in tree]}
    if isinstance(tree, PackedLinear):
        children, aux = tree.tree_flatten()
        return {"__t": "packed_linear", "aux": list(aux),
                "children": [_treedef_to_json(c) for c in children]}
    if tree is None:
        return {"__t": "none"}
    return {"__t": "leaf"}


def _treedef_from_json(spec, leaves_iter):
    t = spec["__t"]
    if t == "dict":
        return {k: _treedef_from_json(v, leaves_iter)
                for k, v in spec["items"].items()}
    if t in ("list", "tuple"):
        items = [_treedef_from_json(v, leaves_iter) for v in spec["items"]]
        return items if t == "list" else tuple(items)
    if t == "packed_linear":
        children = tuple(_treedef_from_json(c, leaves_iter)
                         for c in spec["children"])
        return PackedLinear.tree_unflatten(tuple(spec["aux"]), children)
    if t == "none":
        return None
    return next(leaves_iter)
