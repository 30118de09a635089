"""OPTQ/GPTQ adaptive rounding as a blocked lax.scan.

Capability parity with /root/reference/gptq.py:17-116 (which is itself the
OPTQ algorithm): per-column quantize with error feedback through the upper
Cholesky factor of H⁻¹, 128-column blocks with lazy tail updates.

TPU-first notes: the column loop is a short in-block ``lax.scan``; the tail
update W[:, i2:] -= Err @ Hinv[i1:i2, i2:] is a masked full-width matmul on
the MXU (static shapes — no dynamic slicing of the tail).

LDLQ with flipped order is mathematically identical to this algorithm
(reference README.md:29, optq_ldlq_equiv.py); both are kept for the
equivalence test (tests/test_equivalence.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from quip_tpu.core.grid import GridParams, qfnb_scale


def cholesky_inv_upper(H: jax.Array) -> jax.Array:
    """U upper-triangular with H⁻¹ = Uᵀ U (gptq.py:51-54).

    torch: chol -> cholesky_inverse -> chol(upper). Here: H⁻¹ via Cholesky
    solve, then U = chol(H⁻¹)ᵀ.
    """
    eye = jnp.eye(H.shape[0], dtype=H.dtype)
    C = jnp.linalg.cholesky(H)
    Hinv = jax.scipy.linalg.cho_solve((C, True), eye)
    # symmetrize against roundoff before the second factorization
    Hinv = (Hinv + Hinv.T) / 2
    return jnp.linalg.cholesky(Hinv).T


def _quantize_col(w, grid: GridParams, qfn: str):
    """Quantize one column (m,) with per-row grid params.

    qfn 'a': round-then-clamp (quant.py:6-8); 'c': clamp-then-round
    (quant.py:17-21); 'b': symmetric RMS grid computed per column
    (quant.py:148-151 — scale from the column itself when called per-column).
    """
    scale = grid.scale[:, 0]
    zero = grid.zero[:, 0]
    maxq = grid.maxq
    if qfn == "a":
        q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
        return scale * (q - zero)
    elif qfn == "c":
        q = jnp.round(jnp.clip(w / scale + zero, 0, maxq))
        return scale * (q - zero)
    elif qfn == "b":
        s = qfnb_scale(w)
        q = w / s
        q = jnp.clip(jnp.round(((q + 1) / 2) * maxq), 0, maxq)
        return ((q / maxq) * 2 - 1) * s
    else:
        raise ValueError(f"unknown qfn {qfn!r}")


def gptq_round(
    W: jax.Array,
    H: jax.Array,
    grid: GridParams,
    qfn: str = "a",
    blocksize: int = 128,
    groupsize: int = -1,
    sparse_outlier: float = 0.0,
) -> jax.Array:
    """OPTQ rounding. W (m, d) in the original weight domain; returns the
    quantized (still-dense) weights.

    groupsize != -1 re-derives grid params every ``groupsize`` columns from
    the *current* (error-fed) weights (gptq.py:70-74).

    sparse_outlier > 0 enables the TrueOBS outlier escape hatch
    (zeroShot/models/fast_trueobs.py:108, 134-139): entries whose squared
    rounding error exceeds ``sparse_outlier * scale^2`` are kept at full
    precision (a mixed sparse+quantized layer; the reference uses 0.25).
    """
    if groupsize != -1:
        return _gptq_round_grouped(W, H, grid, qfn, blocksize, groupsize)

    m, d = W.shape
    B = blocksize
    nb = -(-d // B)
    dp = nb * B
    if dp != d:
        # pad H with identity; padded columns quantize to garbage we discard,
        # and feed back zero error (their Hinv rows are e_i).
        Hp = jnp.eye(dp, dtype=H.dtype).at[:d, :d].set(H)
        Wp = jnp.pad(W, ((0, 0), (0, dp - d)))
    else:
        Hp, Wp = H, W

    U = cholesky_inv_upper(Hp)
    col_ids = jnp.arange(dp)

    def block_step(W_c, xs):
        start, Ublk_in, Urow, diagU_in = xs
        W1 = lax.dynamic_slice(W_c, (0, start), (m, B))

        def col_body(carry, i):
            W1, Err1 = carry
            w = W1[:, i]
            q = _quantize_col(w, grid, qfn)
            if sparse_outlier > 0:
                # TrueOBS escape: keep fp weights with large rounding error
                thresh = sparse_outlier * jnp.square(grid.scale[:, 0])
                keep = jnp.square(w - q) > thresh
                q = jnp.where(keep, w, q)
            dcoef = diagU_in[i]
            err = (w - q) / dcoef
            mask = (jnp.arange(B) >= i).astype(W1.dtype)
            W1 = W1 - err[:, None] * (Ublk_in[i, :] * mask)[None, :]
            W1 = W1.at[:, i].set(q)
            Err1 = Err1.at[:, i].set(err)
            return (W1, Err1), None

        (W1, Err1), _ = lax.scan(
            col_body, (W1, jnp.zeros((m, B), W_c.dtype)), jnp.arange(B)
        )
        # lazy tail update (gptq.py:90): W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]
        tail_mask = (col_ids >= start + B).astype(W_c.dtype)
        W_c = W_c - (Err1 @ (Urow * tail_mask[None, :]))
        W_c = lax.dynamic_update_slice(W_c, W1, (0, start))
        return W_c, W1

    starts = jnp.arange(nb) * B
    Ublks = jax.vmap(
        lambda s: lax.dynamic_slice(U, (s, s), (B, B))
    )(starts)                                     # (nb, B, B)
    Urows = jax.vmap(
        lambda s: lax.dynamic_slice(U, (s, 0), (B, dp))
    )(starts)                                     # (nb, B, dp)
    diagUs = jax.vmap(lambda s: jnp.diagonal(
        lax.dynamic_slice(U, (s, s), (B, B))
    ))(starts)                                    # (nb, B)

    Wq, _ = lax.scan(block_step, Wp, (starts, Ublks, Urows, diagUs))
    return Wq[:, :d]


def _gptq_round_grouped(W, H, grid, qfn, blocksize, groupsize):
    """Grouped variant: find qfn-a params per group from current weights.

    Requires groupsize to divide blocksize or equal a multiple of it; the
    reference recomputes at every (i1+i) % groupsize == 0 boundary
    (gptq.py:70-74).
    """
    from quip_tpu.core.grid import find_params_qfna

    m, d = W.shape
    assert d % groupsize == 0, "groupsize must divide d"
    maxq = grid.maxq
    bits = int(round(float(jnp.log2(maxq + 1))))

    U = cholesky_inv_upper(H)
    W = W.astype(H.dtype)

    # process column-by-column (simple scan; grouped mode is an offline path)
    def col_body(W_c, i):
        # refresh grid at group boundaries from the live weights
        gstart = (i // groupsize) * groupsize
        wgroup = lax.dynamic_slice(W_c, (0, gstart), (m, groupsize))
        g = find_params_qfna(wgroup, bits, perchannel=True, sym=False)
        w = W_c[:, i]
        q = _quantize_col(w, g, qfn)
        err = (w - q) / U[i, i]
        mask = (jnp.arange(d) > i).astype(W_c.dtype)
        W_c = W_c - err[:, None] * (U[i, :] * mask)[None, :]
        W_c = W_c.at[:, i].set(q)
        return W_c, None

    Wq, _ = lax.scan(col_body, W, jnp.arange(d))
    return Wq
