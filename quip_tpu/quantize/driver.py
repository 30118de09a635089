"""Layer-streaming calibration + quantization driver.

Capability parity with the reference sequential drivers
(opt_sequential /root/reference/opt.py:29-190, llama_sequential
llama.py:36-171, bloom_sequential zeroShot/models/bloom.py:321-429),
TPU-first:

  * No forward hooks or Catcher exceptions: ``block_apply(with_taps=True)``
    returns each linear's input functionally; the per-block Hessian
    accumulation is one jitted scan over calibration samples.
  * Hessians are shared per tap point (q/k/v read the same activations —
    the reference computes the identical H three times, opt.py:131-145).
  * Per-block flow matches opt.py:94-181: accumulate H -> quantize each
    linear -> replay the block with *quantized* weights to produce the next
    block's inputs.
  * The whole per-block program is jitted once and reused across layers
    (same shapes), so layer-streaming costs one compile.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from quip_tpu.models import model as M
from quip_tpu.utils import name_salt as _name_salt
from quip_tpu.models.config import ModelConfig
from quip_tpu.quantize.config import QuantConfig
from quip_tpu.quantize.pipeline import LayerQuantResult, quantize_layer


@dataclass
class QuantizedModelArtifacts:
    """Per-layer metadata produced by the driver (the analog of the
    reference's ``quantizers`` dict + errors/Hmags/times lists,
    opt.py:92-93, 164-170)."""

    results: Dict[str, LayerQuantResult] = field(default_factory=dict)
    errors: Dict[str, float] = field(default_factory=dict)
    Hmags: Dict[str, float] = field(default_factory=dict)
    times: Dict[str, float] = field(default_factory=dict)
    hessians: Dict[str, jax.Array] = field(default_factory=dict)

    @property
    def total_error(self) -> float:
        return float(sum(self.errors.values()))


def _block_inputs(params, cfg: ModelConfig, tokens: jax.Array,
                  chunk: int = 8) -> jax.Array:
    """Block-0 inputs for all calibration samples — the functional version of
    the Catcher trick (opt.py:55-73). tokens: (N, S)."""
    N, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S), (1, S))

    @jax.jit
    def emb(p, tk):
        pos = jnp.broadcast_to(jnp.arange(S), tk.shape)
        return M.embed(p, tk, cfg, pos)

    # one up-front device transfer (params may be a host-side numpy tree)
    embed_params = jax.tree.map(jnp.asarray, {k: params[k]
                                              for k in ("embed",)})
    outs = []
    for i in range(0, N, chunk):
        outs.append(emb(embed_params, tokens[i:i + chunk]))
    return jnp.concatenate(outs, axis=0)


def _make_block_fns(cfg: ModelConfig, seqlen: int, chunk: int):
    """Jitted per-block programs, compiled once and reused for every layer."""
    positions = jnp.broadcast_to(jnp.arange(seqlen), (chunk, seqlen))
    mask = M.causal_mask(chunk, seqlen)
    # the calibration mask is exactly causal-with-full-length, so pass
    # plen and let long sequences take the flash prefill kernel: the
    # dense path materializes (chunk, H, S, S) f32 logits — 7.5 GB at
    # opt-30b chunk=8 S=2048, which OOM'd the r5 host_offload drill
    plen = jnp.full((chunk,), seqlen, jnp.int32)

    @jax.jit
    def accumulate(layer_params, inps, H_init):
        """Run the block over a chunk of samples; return outputs and
        accumulated (unnormalized) Hessians per tap: H += Σ xᵀx."""
        y, _, taps = M.block_apply(layer_params, inps, cfg, positions, mask,
                                   with_taps=True, plen=plen)
        H_new = {}
        for name, x in taps.items():
            xt = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            # true-f32 accumulation: TPU default bf16 matmul passes corrupt
            # H enough to break the downstream Cholesky
            H_new[name] = H_init[name] + jnp.matmul(
                xt.T, xt, precision=jax.lax.Precision.HIGHEST)
        return y, H_new

    @jax.jit
    def replay(layer_params, inps):
        y, _, _ = M.block_apply(layer_params, inps, cfg, positions, mask,
                                plen=plen)
        return y

    return accumulate, replay


@functools.lru_cache(maxsize=None)
def _jitted_quantize_layer(qcfg: QuantConfig):
    """Per-config jitted quantize_layer; XLA caches one program per weight
    shape, reused across all layers of the model (the reference re-runs
    everything eagerly per layer)."""
    return jax.jit(lambda W, H, k: quantize_layer(W, H, qcfg, k))


def quantize_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    calib_tokens: jax.Array,            # (nsamples, seqlen) int32
    qcfg: QuantConfig,
    key: jax.Array,
    *,
    chunk: int = 4,
    keep_hessians: bool = False,
    layer_filter: Optional[List[str]] = None,
    progress: bool = False,
    resume_dir: Optional[str] = None,
    host_offload: bool = False,
    quant_head: bool = False,
) -> tuple[Dict[str, Any], QuantizedModelArtifacts]:
    """Quantize every linear in every block, layer-streaming.

    Returns (new params, artifacts). ``layer_filter``: optional list of
    linear names to quantize (the proxy-eval tool quantizes subsets,
    opt_proxy.py:227-236).

    ``resume_dir``: per-layer resume (SURVEY.md §5.4 — no reference
    counterpart): each finished block is written to
    ``resume_dir/layer_{i}.npz``; re-running skips finished layers (the
    block is reloaded and only replayed to rebuild activations).

    ``host_offload``: keep the (possibly huge) stacked blocks in host
    memory and move a single block to the device at a time — the TPU analog
    of the reference's CPU↔GPU block streaming (opt.py:94-181), required to
    quantize 70B on a small slice. Quantized layers and per-layer artifacts
    (dense W_hat + codes) are pulled back to host as they are produced, so
    device residency stays at one block + calibration activations
    regardless of model size; pair with a host-built params tree
    (cli.common.load_model --host_offload).

    ``quant_head``: also quantize the (untied) lm_head — no reference
    counterpart (the reference leaves it fp16, opt.py:283-286). At decode
    the head matvec is the single largest matmul (V×d) and dominates the
    fixed per-step cost, so a packed head is a serving win; calibration
    taps the true head input (final norm + project_out) on the *quantized*
    model's activations, consistent with sequential-GPTQ semantics.
    """
    if quant_head and (cfg.tie_word_embeddings or
                       params.get("lm_head") is None):
        # validated up-front: a 70B run must not stream every block through
        # LDLQ for hours before discovering the head can't be quantized
        raise ValueError(
            "quant_head requires an untied lm_head: tied families "
            "(OPT/BLOOM) reuse the token table, which must stay dense "
            "for the embedding gather")
    if qcfg.wbits >= 16:
        return params, QuantizedModelArtifacts()

    N, S = calib_tokens.shape
    assert N % chunk == 0, f"nsamples {N} must be divisible by chunk {chunk}"
    fused = "wqkv" in params["blocks"]["attn"]
    specs = M.linear_specs(cfg, fused=fused)
    art = QuantizedModelArtifacts()
    qlayer = _jitted_quantize_layer(qcfg)

    inps = _block_inputs(params, cfg, calib_tokens, chunk)
    accumulate, replay = _make_block_fns(cfg, S, chunk)

    import numpy as _np

    def _to_host(tree):
        return jax.tree.map(_np.asarray, tree)

    blocks = params["blocks"]
    if host_offload:
        blocks = _to_host(blocks)
    new_block_list = []
    n_layers = cfg.n_layers

    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    for li in range(n_layers):
        template = jax.tree.map(lambda x: x[li], blocks) \
            if resume_dir else None          # shapes/structure only
        resumed = _load_resume_layer(resume_dir, li, template)
        if resumed is not None:
            new_layer, saved_err = resumed
            new_block_list.append(_to_host(new_layer) if host_offload
                                  else new_layer)
            art.errors.update(saved_err)
            outs = []
            for i in range(0, N, chunk):
                outs.append(replay(new_layer, inps[i:i + chunk]))
            inps = jnp.concatenate(outs, axis=0)
            if progress:
                print(f"[quantize] layer {li + 1}/{n_layers} (resumed)",
                      flush=True)
            continue

        layer_params = jax.tree.map(lambda x: jnp.asarray(x[li]), blocks)
        t0 = time.time()

        # --- pass 1: accumulate tap Hessians (opt.py:131-148) ---
        d_taps = {}
        probe_y, _, probe_taps = M.block_apply(
            layer_params, inps[:chunk], cfg,
            jnp.broadcast_to(jnp.arange(S), (chunk, S)),
            M.causal_mask(chunk, S), with_taps=True,
            plen=jnp.full((chunk,), S, jnp.int32))
        for name, x in probe_taps.items():
            d_taps[name] = x.shape[-1]
        H = {name: jnp.zeros((d, d), jnp.float32)
             for name, d in d_taps.items()}
        for i in range(0, N, chunk):
            _, H = accumulate(layer_params, inps[i:i + chunk], H)
        # normalize: reference divides by nsamples (sequences)
        # (method.py:122-123)
        H = {k: v / N for k, v in H.items()}

        # --- quantize each linear (opt.py:150-170) ---
        new_layer = layer_params
        for spec in specs:
            full_name = f"layers.{li}.{spec.name}"
            if layer_filter is not None and spec.name not in layer_filter:
                continue
            Wm = new_layer
            for k in spec.path:
                Wm = Wm[k]
            # model stores (in, out); solver wants (m=out, d=in)
            Wt = Wm.T
            lkey = jax.random.fold_in(key, _name_salt(full_name))
            res = qlayer(Wt, H[spec.tap], lkey)
            What = res.W_hat.T.astype(Wm.dtype)
            new_layer = _set_path(new_layer, spec.path, What)
            art.errors[full_name] = float(res.error)
            art.Hmags[full_name] = float(res.Hmag)
            # host_offload: per-layer artifacts hold full dense W_hat +
            # codes; left on device they'd re-materialize the whole model
            art.results[full_name] = _to_host(res) if host_offload else res
            if keep_hessians:
                art.hessians[full_name] = (
                    _to_host(H[spec.tap]) if host_offload else H[spec.tap])
        art.times[f"layers.{li}"] = time.time() - t0

        # --- pass 2: replay with quantized weights (opt.py:172-174) ---
        outs = []
        for i in range(0, N, chunk):
            outs.append(replay(new_layer, inps[i:i + chunk]))
        inps = jnp.concatenate(outs, axis=0)

        if host_offload:
            new_layer = _to_host(new_layer)
        new_block_list.append(new_layer)
        if resume_dir:
            _save_resume_layer(resume_dir, li, new_layer, {
                k: v for k, v in art.errors.items()
                if k.startswith(f"layers.{li}.")})
        if progress:
            err = sum(v for k, v in art.errors.items()
                      if k.startswith(f"layers.{li}."))
            print(f"[quantize] layer {li + 1}/{n_layers} "
                  f"error={err:.4f} t={art.times[f'layers.{li}']:.1f}s",
                  flush=True)

    stack = _np.stack if host_offload else jnp.stack
    new_blocks = jax.tree.map(lambda *xs: stack(xs), *new_block_list)
    new_params = dict(params)
    new_params["blocks"] = new_blocks

    if quant_head:
        t0 = time.time()
        # calibration tap: the exact head input (final norm + project_out)
        # on the quantized model's last-block outputs (`inps` at this point)
        aux = {"final_ln": jax.tree.map(jnp.asarray, params["final_ln"])
               if params.get("final_ln") is not None else None}
        if cfg.embed_proj_dim is not None:
            aux["embed"] = {"proj_out": jnp.asarray(
                params["embed"]["proj_out"])}

        @jax.jit
        def head_tap(aux_p, x, H_init):
            z = M.head_input(aux_p, x, cfg)
            zt = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
            return H_init + jnp.matmul(zt.T, zt,
                                       precision=jax.lax.Precision.HIGHEST)

        E = int(_np.shape(params["lm_head"])[0])
        Hh = jnp.zeros((E, E), jnp.float32)
        for i in range(0, N, chunk):
            Hh = head_tap(aux, inps[i:i + chunk], Hh)
        Hh = Hh / N
        Wh = jnp.asarray(params["lm_head"]).T      # solver wants (m=V, d=E)
        hkey = jax.random.fold_in(key, _name_salt("lm_head"))
        res = qlayer(Wh, Hh, hkey)
        new_head = res.W_hat.T.astype(jnp.dtype(cfg.dtype))
        art.errors["lm_head"] = float(res.error)
        art.Hmags["lm_head"] = float(res.Hmag)
        art.results["lm_head"] = _to_host(res) if host_offload else res
        if keep_hessians:
            art.hessians["lm_head"] = _to_host(Hh) if host_offload else Hh
        if host_offload:
            new_head = _np.asarray(new_head)
        new_params["lm_head"] = new_head
        art.times["lm_head"] = time.time() - t0
        if progress:
            print(f"[quantize] lm_head error={art.errors['lm_head']:.4f} "
                  f"t={art.times['lm_head']:.1f}s", flush=True)

    return new_params, art


def _resume_path(resume_dir: str, li: int) -> str:
    return os.path.join(resume_dir, f"layer_{li}.npz")


def _save_resume_layer(resume_dir: str, li: int, layer, errors) -> None:
    import numpy as np

    from quip_tpu.pack.format import PACK_FORMAT_VERSION
    from quip_tpu.pack.model import _leaf_to_np

    leaves, _ = jax.tree.flatten(layer)
    arrays, dtypes = {}, []
    for i, x in enumerate(leaves):
        # npz mangles ml_dtypes (bf16 -> void); store integer views + names
        a, name = _leaf_to_np(x)
        arrays[f"leaf_{i}"] = a
        dtypes.append(name or "")
    np.savez(
        _resume_path(resume_dir, li),
        __format_version__=np.asarray(PACK_FORMAT_VERSION, np.int64),
        __errors__=np.asarray(list(errors.values()), np.float64),
        __error_names__=np.asarray(list(errors.keys())),
        __leaf_dtypes__=np.asarray(dtypes),
        **arrays,
    )


def _load_resume_layer(resume_dir, li, template):
    """Load a finished layer against the live tree structure, or None."""
    import numpy as np

    if not resume_dir:
        return None
    path = _resume_path(resume_dir, li)
    if not os.path.exists(path):
        return None
    from quip_tpu.pack.format import PACK_FORMAT_VERSION

    data = np.load(path, allow_pickle=False)
    ver = int(data["__format_version__"]) if "__format_version__" in \
        data.files else 1
    if ver != PACK_FORMAT_VERSION:
        raise ValueError(
            f"resume file {path} uses packed-plane layout v{ver}; this "
            f"build writes v{PACK_FORMAT_VERSION}. Delete the resume dir "
            f"and re-run the quantization.")
    import ml_dtypes

    n = len([k for k in data.files if k.startswith("leaf_")])
    dtypes = [str(s) for s in data["__leaf_dtypes__"]] \
        if "__leaf_dtypes__" in data.files else [""] * n
    leaves = []
    for i in range(n):
        a = data[f"leaf_{i}"]
        if dtypes[i]:
            a = a.view(getattr(ml_dtypes, dtypes[i]))
        leaves.append(jnp.asarray(a))
    treedef = jax.tree.structure(template)
    tmpl_leaves = jax.tree.leaves(template)
    for i, (got, want) in enumerate(zip(leaves, tmpl_leaves)):
        if got.shape != jnp.shape(want):
            raise ValueError(
                f"resume file {path} leaf {i} has shape {got.shape}, the "
                f"live tree expects {jnp.shape(want)} — stale resume dir?")
    errors = dict(zip([str(s) for s in data["__error_names__"]],
                      [float(x) for x in data["__errors__"]]))
    return jax.tree.unflatten(treedef, leaves), errors


def _set_path(tree, path, value):
    """Immutable nested-dict update."""
    if len(path) == 1:
        out = dict(tree)
        out[path[0]] = value
        return out
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def save_hessians(
    params: Dict[str, Any],
    cfg: ModelConfig,
    calib_tokens: jax.Array,
    *,
    chunk: int = 4,
) -> Dict[str, jax.Array]:
    """Hessian-saver (parity with opt_saveH.py:165-166): run calibration
    only, return {layer_name: H} without quantizing."""
    N, S = calib_tokens.shape
    specs = M.linear_specs(cfg)
    inps = _block_inputs(params, cfg, calib_tokens, chunk)
    accumulate, replay = _make_block_fns(cfg, S, chunk)
    out: Dict[str, jax.Array] = {}
    blocks = params["blocks"]
    for li in range(cfg.n_layers):
        layer_params = jax.tree.map(lambda x: x[li], blocks)
        _, _, probe_taps = M.block_apply(
            layer_params, inps[:chunk], cfg,
            jnp.broadcast_to(jnp.arange(S), (chunk, S)),
            M.causal_mask(chunk, S), with_taps=True,
            plen=jnp.full((chunk,), S, jnp.int32))
        H = {name: jnp.zeros((x.shape[-1], x.shape[-1]), jnp.float32)
             for name, x in probe_taps.items()}
        for i in range(0, N, chunk):
            _, H = accumulate(layer_params, inps[i:i + chunk], H)
        H = {k: v / N for k, v in H.items()}
        for spec in specs:
            out[f"layers.{li}.{spec.name}"] = H[spec.tap]
        outs = []
        for i in range(0, N, chunk):
            outs.append(replay(layer_params, inps[i:i + chunk]))
        inps = jnp.concatenate(outs, axis=0)
    return out
