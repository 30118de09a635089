"""Activation quantization wrapper (reference ActQuantWrapper parity).

The reference wraps nn.Linear modules so their *inputs* are quantized on a
per-fan-in-channel qfn-a grid at forward time (`ActQuantWrapper` /
`add_actquant`, /root/reference/zeroShot/models/quant.py:134-177) — exported
but unused in its main flow. Here the same capability is a pytree leaf
wrapper: :class:`ActQuant` wraps any linear leaf (dense array or
PackedLinear) and ``ops.qlinear.linear_apply`` dispatches on it, so a
wrapped param tree runs through every existing path (forward, decode,
engine, eval) unchanged.

Matching the reference's ``ready()`` semantics, a wrapper whose scales are
all zero is an identity (calibration not run yet). Calibration finds
per-channel (scale, zero) from recorded activations (the reference's
external ``find_params`` call), using the same qfn-a grid math.

Leaves follow the model's stacked-layer convention: wrapping a stacked
(n_layers, ...) leaf stores stacked (n_layers, in_features) grids, which
``lax.scan`` slices per layer together with the weights.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from quip_tpu.core import grid
from quip_tpu.pack.format import PackedLinear


def quantize_activations(
    x: jax.Array,
    bits: int = 8,
    per_token: bool = True,
    sym: bool = True,
) -> jax.Array:
    """Fake-quant x on a 2**bits uniform grid (stateless one-shot form).

    per_token: scales per leading position (row) — the serving-relevant
    mode; otherwise one scale for the whole tensor. The stateful
    calibrated form is :class:`ActQuant` below.
    """
    maxq = 2**bits - 1
    axis = -1 if per_token else None
    if sym:
        amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
        amax = jnp.maximum(amax, 1e-8)
        scale = (2 * amax) / maxq
        zero = (maxq + 1) / 2
        q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
        return scale * (q - zero)
    xmin = jnp.minimum(jnp.min(x, axis=axis, keepdims=True), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=axis, keepdims=True), 0.0)
    scale = jnp.maximum(xmax - xmin, 1e-8) / maxq
    zero = jnp.round(-xmin / scale)
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def quantize_conv2d_weight(W4d: jax.Array, H: jax.Array, cfg, key):
    """Quantize a Conv2d weight (O, I, Kh, Kw) by flattening the receptive
    field (method.py:88-89 W.flatten(1); H over the unfolded patches).

    Returns the quantized weight in the original 4-D shape.
    """
    from quip_tpu.quantize.pipeline import quantize_layer

    O = W4d.shape[0]
    W2 = W4d.reshape(O, -1)
    res = quantize_layer(W2, H, cfg, key)
    return res.W_hat.reshape(W4d.shape), res


class ActQuant(NamedTuple):
    """Activation-quantizing wrapper around a linear leaf.

    scale/zero: (in_features,) per-fan-in-channel qfn-a grid — or stacked
    (n_layers, in_features) when ``inner`` is a stacked block leaf. A zero
    scale means "not calibrated": forward is the identity (reference
    ``Quantizer.ready()``, zeroShot/models/quant.py:122-131).
    """

    inner: Any               # dense (in, out) array or PackedLinear
    scale: jax.Array
    zero: jax.Array
    maxq: jax.Array          # () or (n_layers,) float

    def quantize(self, x: jax.Array) -> jax.Array:
        ready = jnp.all(self.scale != 0)
        scale = jnp.where(self.scale == 0, 1.0, self.scale).astype(x.dtype)
        q = grid.quantize_qfna(x, scale, self.zero.astype(x.dtype),
                               jnp.asarray(self.maxq, x.dtype))
        return jnp.where(ready, q, x)


def _in_features(leaf) -> int:
    if isinstance(leaf, PackedLinear):
        return leaf.in_features
    return leaf.shape[-2]


def wrap_actquant(leaf, bits: int = 8, n_layers: int | None = None
                  ) -> ActQuant:
    """Wrap one linear leaf, uncalibrated (identity until calibrated).

    n_layers: set for stacked block leaves (adds the leading layer axis to
    the grid arrays so lax.scan slices them alongside the weights)."""
    d = _in_features(leaf)
    shp = (d,) if n_layers is None else (n_layers, d)
    mshp = () if n_layers is None else (n_layers,)
    return ActQuant(leaf, jnp.zeros(shp, jnp.float32),
                    jnp.zeros(shp, jnp.float32),
                    jnp.full(mshp, float(2**bits - 1), jnp.float32))


def find_params(aq: ActQuant, x: jax.Array, sym: bool = False,
                mse: bool = False) -> ActQuant:
    """Calibrate one wrapper from recorded input activations.

    x: (..., in_features) — or (n_layers, ..., in_features) for stacked
    wrappers. Per-channel asymmetric min/max grid via the shared
    activation-tensor grid finder (grid.find_params_qfna_act — the
    weight=False cases of reference quant.py:66-77,117-136), so the grid
    layer is one implementation."""
    bits = int(round(float(jnp.log2(jnp.max(aq.maxq) + 1))))

    def one(xl):
        g = grid.find_params_qfna_act(
            xl.reshape(-1, xl.shape[-1]).astype(jnp.float32), bits,
            sym=sym, mse=mse)
        return g.scale.reshape(-1), g.zero.reshape(-1)

    if aq.scale.ndim == 2:      # stacked layers
        scale, zero = jax.vmap(one)(x)
    else:
        scale, zero = one(x)
    return aq._replace(scale=scale, zero=zero)


def add_actquant(params: dict, cfg, bits: int = 8) -> dict:
    """Wrap every block linear (and the untied lm_head) with an
    uncalibrated ActQuant — the reference's ``add_actquant`` walk
    (zeroShot/models/quant.py:152-177) as a pytree rewrite."""
    from quip_tpu.models.model import linear_specs

    blocks = dict(params["blocks"])
    fused = "wqkv" in blocks.get("attn", {})
    n_layers = cfg.n_layers

    def wrap_path(path):
        grp = dict(blocks[path[0]])
        grp[path[1]] = wrap_actquant(grp[path[1]], bits, n_layers)
        blocks[path[0]] = grp

    for spec in linear_specs(cfg, fused=fused):
        wrap_path(spec.path)
    out = dict(params)
    out["blocks"] = blocks
    if not cfg.tie_word_embeddings and "lm_head" in out:
        out["lm_head"] = wrap_actquant(out["lm_head"], bits)
    return out


def calibrate_actquant(params: dict, cfg, tokens: jax.Array,
                       sym: bool = False, mse: bool = False) -> dict:
    """Calibrate every ActQuant wrapper from one forward over ``tokens``.

    Runs the model with activation taps (the hook-free equivalent of the
    reference's calibration forward) and finds each wrapper's per-channel
    grid from the recorded inputs. Returns the calibrated tree.
    """
    from quip_tpu.models import model as M
    from quip_tpu.models.model import linear_specs

    B, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = M.causal_mask(B, S)
    x = M.embed(params, tokens, cfg, positions)
    cs = (M.rope_tables(cfg, positions)
          if cfg.positions == "rope" else None)

    def body(x, layer_params):
        y, _, taps = M.block_apply(layer_params, x, cfg, positions, mask,
                                   with_taps=True, rope_cs=cs)
        return y, taps

    x, taps = jax.lax.scan(body, x, params["blocks"])   # taps: (L, B, S, D)

    blocks = dict(params["blocks"])
    fused = "wqkv" in blocks.get("attn", {})
    for spec in linear_specs(cfg, fused=fused):
        grp = dict(blocks[spec.path[0]])
        leaf = grp[spec.path[1]]
        if isinstance(leaf, ActQuant):
            grp[spec.path[1]] = find_params(leaf, taps[spec.tap], sym=sym,
                                            mse=mse)
            blocks[spec.path[0]] = grp
    out = dict(params)
    out["blocks"] = blocks
    if isinstance(out.get("lm_head"), ActQuant):
        head_in = M.head_input(out, x, cfg)
        out["lm_head"] = find_params(out["lm_head"], head_in, sym=sym,
                                     mse=mse)
    return out
