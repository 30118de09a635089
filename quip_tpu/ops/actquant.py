"""Activation quantization.

Parity with the reference's ActQuantWrapper
(/root/reference/zeroShot/models/quant.py:134-177 — present but unused in
its main flow): fake-quantize activations on a qfn-a grid before a linear.
Here it is a pure function usable around any `linear_apply`, and the
building block for a future W2A8 int8 serving path (docs/PERF.md roadmap).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_activations(
    x: jax.Array,
    bits: int = 8,
    per_token: bool = True,
    sym: bool = True,
) -> jax.Array:
    """Fake-quant x on a 2**bits uniform grid.

    per_token: scales per leading position (row) — the serving-relevant
    mode; otherwise one scale for the whole tensor.
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
