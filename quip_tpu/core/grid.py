"""Scalar quantization grids ("qfn" a/b/c) as pure jnp functions.

Capability parity with the reference scalar quantizer
(/root/reference/quant.py:6-163): three grid transforms

  * qfn 'a' — asymmetric per-channel min/max grid (scale, zero point),
    optional MSE grid-shrink search.
  * qfn 'b' — symmetric grid with scale = 2.4 * RMS(W) + 1e-16, computed
    lazily *after* incoherence preprocessing (the QuIP grid).
  * qfn 'c' — like 'a' but rounding deferred to the solver; used for the
    LDLQ ≡ OPTQ equivalence check.

Unlike the reference's stateful ``Quantizer`` nn.Module, grid parameters are
a plain pytree (:class:`GridParams`) and every transform is a pure function,
so the whole grid layer is jit/vmap/shard-transparent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GridParams(NamedTuple):
    """Per-channel uniform-grid parameters.

    scale/zero have shape (rows, 1) for per-channel (perchannel=True) weight
    grids, or (1, 1) for whole-tensor grids. ``maxq`` = 2**bits - 1.
    """

    scale: jax.Array
    zero: jax.Array
    maxq: jax.Array

    @property
    def bits(self) -> int:
        return int(jnp.log2(self.maxq + 1))


def maxq_for_bits(bits: int) -> jnp.ndarray:
    return jnp.asarray(2**bits - 1)


# ---------------------------------------------------------------------------
# qfn 'a': asymmetric min/max grid  (reference quant.py:6-8, 57-136)
# ---------------------------------------------------------------------------


def _rowwise_qfna(xr, maxq, sym, mse, norm, grid, maxshrink):
    """Shared min/max grid + optional MSE shrink over rows of xr (rows =
    channels). The row-wise core of reference find_params_qfna
    (quant.py:75-114)."""
    zeros_like_row = jnp.zeros((xr.shape[0],), dtype=xr.dtype)
    xmin = jnp.minimum(xr.min(axis=1), zeros_like_row)
    xmax = jnp.maximum(xr.max(axis=1), zeros_like_row)

    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)

    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if mse:
        # Grid-shrink MSE search (quant.py:95-114). Static unrolled grid.
        best = jnp.full((xr.shape[0],), jnp.inf, dtype=xr.dtype)
        for i in range(int(maxshrink * grid)):
            p = 1 - i / grid
            xmin1 = p * xmin
            xmax1 = p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = jnp.round(-xmin1 / scale1) if not sym else zero
            q = quantize_qfna(xr, scale1[:, None], zero1[:, None], maxq)
            err = jnp.sum(jnp.abs(q - xr) ** norm, axis=1)
            better = err < best
            best = jnp.where(better, err, best)
            scale = jnp.where(better, scale1, scale)
            zero = jnp.where(better, zero1, zero)
    return scale, zero


def find_params_qfna(
    x: jax.Array,
    bits: int,
    perchannel: bool = True,
    sym: bool = False,
    mse: bool = False,
    norm: float = 2.4,
    grid: int = 100,
    maxshrink: float = 0.8,
) -> GridParams:
    """Find (scale, zero) for the qfn-a grid over a weight matrix.

    Mirrors reference ``Quantizer.find_params_qfna`` (quant.py:57-136) for
    the weight case (weight=True): rows are channels. For activation
    tensors (weight=False, 2-4D) use :func:`find_params_qfna_act`.
    """
    maxq = jnp.asarray(2**bits - 1, dtype=x.dtype)
    if perchannel:
        xr = x.reshape(x.shape[0], -1)
    else:
        xr = x.reshape(1, -1)

    scale, zero = _rowwise_qfna(xr, maxq, sym, mse, norm, grid, maxshrink)

    if not perchannel:
        scale = jnp.repeat(scale, x.shape[0])
        zero = jnp.repeat(zero, x.shape[0])

    return GridParams(scale=scale[:, None], zero=zero[:, None], maxq=maxq)


def find_params_qfna_act(
    x: jax.Array,
    bits: int,
    perchannel: bool = True,
    sym: bool = False,
    mse: bool = False,
    norm: float = 2.4,
    grid: int = 100,
    maxshrink: float = 0.8,
) -> GridParams:
    """qfn-a grid for ACTIVATION tensors — the weight=False cases of
    reference find_params_qfna (quant.py:66-77, 117-136).

    Channel axis by rank: 4-D (N, C, H, W) -> axis 1 (conv features);
    3-D (B, S, C) and 2-D (B, C) -> last axis. Returned scale/zero are
    shaped to broadcast against x directly: (1, C, 1, 1) / (1, 1, C) /
    (1, C). 1-D inputs are whole-tensor grids with shape (1,) (the
    reference's perchannel branch cannot take 1-D at all; this is the
    natural extension).
    """
    maxq = jnp.asarray(2**bits - 1, dtype=x.dtype)
    shape = x.shape
    if perchannel and x.ndim >= 2:
        if x.ndim == 4:
            xr = jnp.moveaxis(x, 1, 0).reshape(shape[1], -1)
        elif x.ndim == 3:
            xr = x.reshape(-1, shape[-1]).T
        else:
            xr = x.T
    else:
        xr = x.reshape(1, -1)

    scale, zero = _rowwise_qfna(xr, maxq, sym, mse, norm, grid, maxshrink)

    if not perchannel and x.ndim >= 2:
        # broadcast the whole-tensor grid over the channel axis
        # (quant.py:117-121)
        nch = shape[1] if x.ndim != 3 else shape[2]
        scale = jnp.repeat(scale, nch)
        zero = jnp.repeat(zero, nch)

    if x.ndim == 4:
        bshape = (1, -1, 1, 1)
    elif x.ndim == 3:
        bshape = (1, 1, -1)
    elif x.ndim == 2:
        bshape = (1, -1)
    else:
        bshape = (-1,)
    return GridParams(scale=scale.reshape(bshape), zero=zero.reshape(bshape),
                      maxq=maxq)


def quantize_qfna(x, scale, zero, maxq):
    """Round-to-nearest on the qfn-a grid (quant.py:6-8)."""
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def quantize_qfnc(x, scale, zero, maxq):
    """qfn-c: clamp *before* rounding (quant.py:17-21) — matches the order of
    operations inside the LDLQ solver, used for the OPTQ equivalence test."""
    q = jnp.clip((x / scale) + zero, 0, maxq)
    q = jnp.round(q)
    return scale * (q - zero)


# ---------------------------------------------------------------------------
# qfn 'b': symmetric RMS grid (the incoherence-processing grid)
# (reference quant.py:10-15, 148-151)
# ---------------------------------------------------------------------------


def qfnb_scale(w: jax.Array) -> jax.Array:
    """scale = 2.4 * RMS(W) + 1e-16, computed over the whole matrix at
    quantize time (after preprocessing) — reference quant.py:150,
    vector_balance.py:522."""
    return 2.4 * jnp.sqrt(jnp.mean(jnp.square(w))) + 1e-16


def quantize_qfnb(x, scale, maxq):
    """Round-to-nearest on the qfn-b grid (quant.py:10-15)."""
    q = x / scale
    q = jnp.clip(jnp.round(((q + 1) / 2) * maxq), 0, maxq)
    q = (q / maxq) * 2 - 1
    return q * scale


# ---------------------------------------------------------------------------
# Grid transforms used around the adaptive-rounding solvers.
#
# The solvers (core/ldlq.py) operate on "grid coordinates": W mapped into
# [0, maxq]. These helpers are the to/from maps used by the reference
# dispatcher quantize_weight_vecbal (vector_balance.py:499-532).
# ---------------------------------------------------------------------------


def to_grid_qfna(w, g: GridParams):
    """W -> clamp(W/scale + zero, 0, maxq)  (vector_balance.py:515)."""
    return jnp.clip(w / g.scale + g.zero, 0, g.maxq)


def from_grid_qfna(wq, g: GridParams):
    """grid codes -> scale * (q - zero)  (vector_balance.py:519)."""
    return g.scale * (wq - g.zero)


def to_grid_qfnb(w, scale, maxq):
    """W -> clamp(((W/scale)+1)/2 * maxq, 0, maxq)  (vector_balance.py:523-524)."""
    wr = w / scale
    return jnp.clip(((wr + 1) / 2) * maxq, 0, maxq)


def from_grid_qfnb(wq, scale, maxq):
    """grid codes -> ((q/maxq)*2 - 1) * scale  (vector_balance.py:528-529)."""
    return ((wq / maxq) * 2 - 1) * scale
