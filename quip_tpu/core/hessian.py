"""Proxy-Hessian accumulation and the incoherence pre/post-processing pipeline.

Capability parity with the reference QuantMethod lifecycle
(/root/reference/method.py:80-233), re-designed as *pure functions over
(W, H)* instead of a stateful per-layer object:

  * accumulation: H = E[x xᵀ] over calibration tokens. The reference uses
    float64 (method.py:94, 119); TPUs lack fast fp64, so the default is fp32
    with Kahan compensated summation (``HessianAccumulator``), validated
    against fp64 in tests. Data-parallel accumulation is a psum.
  * preproc (method.py:125-193): (a) diagonal rescale, (b) random orthogonal
    butterfly rotation, (c) GPTQ damping — each a pure function returning the
    transformed (W, H) plus an inverse-state pytree.
  * postproc (method.py:195-214): exact inverse, proj then rescale.

The inverse state stores only PRNG keys for U/V (regenerable), never dense
matrices.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quip_tpu.core import incoherence as inc


class HessianAccumulator(NamedTuple):
    """Kahan-compensated fp32 running sum of xᵀx plus sample count.

    Matches method.py:98-123 semantics (sum over tokens, then divide by the
    number of *sequences* added) with fp32+compensation instead of fp64.
    """

    H: jax.Array          # (d, d) running sum
    comp: jax.Array       # (d, d) Kahan compensation term
    nsamples: jax.Array   # scalar int32 — number of sequences

    @staticmethod
    def init(d: int, dtype=jnp.float32) -> "HessianAccumulator":
        z = jnp.zeros((d, d), dtype=dtype)
        return HessianAccumulator(z, z, jnp.zeros((), jnp.int32))

    def add_batch(self, x: jax.Array) -> "HessianAccumulator":
        """Add a batch of activations.

        x: (batch, seq, d) or (tokens, d). Each leading "batch" element
        counts as one sample (method.py:104, 118).
        """
        if x.ndim == 2:
            nseq = 1
            xt = x
        else:
            nseq = x.shape[0]
            xt = x.reshape(-1, x.shape[-1])
        xt = xt.astype(self.H.dtype)
        update = jnp.matmul(xt.T, xt,
                            precision=jax.lax.Precision.HIGHEST)  # MXU f32
        # Kahan step
        y = update - self.comp
        t = self.H + y
        comp = (t - self.H) - y
        return HessianAccumulator(t, comp, self.nsamples + nseq)

    def finalize(self, dtype=jnp.float32) -> jax.Array:
        """H / nsamples, cast to fp32 (method.py:122-123)."""
        return (self.H / self.nsamples.astype(self.H.dtype)).astype(dtype)


def accumulate_hessian(x: jax.Array, H: Optional[jax.Array] = None) -> jax.Array:
    """One-shot H += xᵀ x (flattening leading dims)."""
    xt = x.reshape(-1, x.shape[-1])
    up = jnp.matmul(xt.T, xt, precision=jax.lax.Precision.HIGHEST)
    return up if H is None else H + up


# ---------------------------------------------------------------------------
# Preprocessing pipeline
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class PreprocState:
    """Everything needed to invert preprocessing (and to regenerate U/V).

    A pytree whose array children are (scaleWH, proj_key); the butterfly
    mode and matrix shape are static aux data, so instances round-trip
    through jit/vmap/checkpoints cleanly.
    """

    def __init__(self, scaleWH, proj_key, proj_mode: str, rows: int,
                 cols: int):
        self.scaleWH = scaleWH          # (d,) diagonal rescale, or None
        self.proj_key = proj_key        # PRNG key for (U, V), or None
        self.proj_mode = proj_mode
        self.rows = rows
        self.cols = cols

    def tree_flatten(self):
        return (self.scaleWH, self.proj_key), (self.proj_mode, self.rows,
                                               self.cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        scaleWH, proj_key = children
        return cls(scaleWH, proj_key, *aux)

    def transforms(self, dtype=jnp.float32):
        """(U, V) — Butterfly or RHT depending on proj_mode."""
        assert self.proj_key is not None
        ku, kv = jax.random.split(self.proj_key)
        if self.proj_mode in ("rht", "rht_sf", "rht_uf"):
            return (inc.gen_rht(ku, self.rows, dtype),
                    inc.gen_rht(kv, self.cols, dtype))
        U = inc.gen_butterfly(ku, self.rows, self.proj_mode, dtype)
        V = inc.gen_butterfly(kv, self.cols, self.proj_mode, dtype)
        return U, V

    # back-compat alias
    butterflies = transforms

    def __repr__(self):
        return (f"PreprocState(rescale={self.scaleWH is not None}, "
                f"proj={self.proj_key is not None}, mode={self.proj_mode!r}, "
                f"shape=({self.rows}, {self.cols}))")


def preproc_rescale(W: jax.Array, H: jax.Array):
    """Diagonal rescale (method.py:139-156).

    H /= max|H|; scaleWH = (diag(H)/diag(WᵀW))^(1/4); W *= s, H -> S⁻¹HS⁻¹.
    Returns (W', H', scaleWH).
    """
    W = W.astype(jnp.promote_types(W.dtype, jnp.float32))
    H = H / jnp.max(jnp.abs(H))
    diagH = jnp.clip(jnp.diagonal(H), 1e-8, None)
    diagW2 = jnp.clip(jnp.sum(W * W, axis=0), 1e-8, None)
    scaleWH = jnp.clip(jnp.sqrt(jnp.sqrt(diagH / diagW2)), 1e-8, None)
    W = W * scaleWH[None, :]
    H = H / scaleWH[None, :]
    H = H / scaleWH[:, None]
    return W, H, scaleWH


def preproc_proj(W: jax.Array, H: jax.Array, key: jax.Array,
                 mode: str = "noblock"):
    """Random orthogonal rotation (method.py:157-180).

    H is trace-normalized and regularized first (method.py:173):
        H <- H * (d / (tr(H)+1e-8)) + 1e-2 I
    then W -> U W Vᵀ, H -> V H Vᵀ with keyed transforms: random butterflies
    (reference modes 'block'/'noblock'/'nopermute') or the permutation-free
    randomized Hadamard/Kronecker transform ('rht' — TPU-fast at inference).
    """
    d = H.shape[0]
    H = H * (d / (jnp.trace(H) + 1e-8)) + 1e-2 * jnp.eye(d, dtype=H.dtype)
    ku, kv = jax.random.split(key)
    if mode == "rht_sf":
        # outer-sign RHT (sign-folded serving format): T = diag(s)·K, so
        # the signs sit adjacent to the rotated payload and fold into the
        # packed qfn-b codes (incoherence.py OUTER-sign section)
        U = inc.gen_rht(ku, W.shape[0], dtype=W.dtype)
        V = inc.gen_rht(kv, W.shape[1], dtype=W.dtype)
        return (inc.rht_rotate_weight_outer(U, V, W),
                inc.rht_rotate_hessian_outer(V, H))
    if mode == "rht_uf":
        # hybrid: V/H-side signs stay INNER (full incoherence
        # randomization where it matters), U-side signs go outer and fold
        # into the code rows (incoherence.py rht_rotate_weight_uf)
        U = inc.gen_rht(ku, W.shape[0], dtype=W.dtype)
        V = inc.gen_rht(kv, W.shape[1], dtype=W.dtype)
        return (inc.rht_rotate_weight_uf(U, V, W),
                inc.rht_rotate_hessian(V, H))
    if mode == "rht":
        U = inc.gen_rht(ku, W.shape[0], dtype=W.dtype)
        V = inc.gen_rht(kv, W.shape[1], dtype=W.dtype)
        return inc.rht_rotate_weight(U, V, W), inc.rht_rotate_hessian(V, H)
    U = inc.gen_butterfly(ku, W.shape[0], mode, dtype=W.dtype)
    V = inc.gen_butterfly(kv, W.shape[1], mode, dtype=W.dtype)
    W = inc.rotate_weight(U, V, W)
    H = inc.rotate_hessian(V, H)
    return W, H


def preproc_gptqH(W: jax.Array, H: jax.Array, percdamp: float = 0.01):
    """Dead-column zeroing + diagonal damping (method.py:182-192)."""
    d = H.shape[0]
    diag = jnp.diagonal(H)
    dead = diag == 0
    H = H.at[jnp.arange(d), jnp.arange(d)].set(jnp.where(dead, 1.0, diag))
    W = jnp.where(dead[None, :], 0.0, W)
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H.at[jnp.arange(d), jnp.arange(d)].add(damp)
    return W, H


def preproc(
    W: jax.Array,
    H: jax.Array,
    *,
    rescale: bool = False,
    proj: bool = False,
    proj_key: Optional[jax.Array] = None,
    proj_mode: str = "noblock",
    gptqH: bool = False,
    percdamp: float = 0.01,
) -> Tuple[jax.Array, jax.Array, PreprocState]:
    """Full preprocessing chain, reference order: rescale -> proj -> gptqH
    (method.py:125-193)."""
    rows, cols = W.shape
    scaleWH = None
    if rescale:
        W, H, scaleWH = preproc_rescale(W, H)
    if proj:
        assert proj_key is not None, "preproc proj requires a PRNG key"
        W, H = preproc_proj(W, H, proj_key, proj_mode)
    if gptqH:
        W, H = preproc_gptqH(W, H, percdamp)
    state = PreprocState(
        scaleWH=scaleWH,
        proj_key=proj_key if proj else None,
        proj_mode=proj_mode,
        rows=rows,
        cols=cols,
    )
    return W, H, state


def postproc(W: jax.Array, H: jax.Array, state: PreprocState):
    """Exact inverse of preproc: un-rotate then un-scale (method.py:195-214).

    (The gptqH damping is intentionally not undone, matching the reference.)
    """
    if state.proj_key is not None:
        U, V = state.transforms(dtype=W.dtype)
        if state.proj_mode == "rht_sf":
            W = inc.rht_unrotate_weight_outer(U, V, W)
            H = inc.rht_unrotate_hessian_outer(V, H)
        elif state.proj_mode == "rht_uf":
            W = inc.rht_unrotate_weight_uf(U, V, W)
            H = inc.rht_unrotate_hessian(V, H)
        elif state.proj_mode == "rht":
            W = inc.rht_unrotate_weight(U, V, W)
            H = inc.rht_unrotate_hessian(V, H)
        else:
            W = inc.unrotate_weight(U, V, W)
            H = inc.unrotate_hessian(V, H)
    if state.scaleWH is not None:
        s = state.scaleWH.astype(W.dtype)
        W = W / s[None, :]
        H = H * s[:, None]
        H = H * s[None, :]
    return W, H
