"""Adaptive rounding solvers: LDLQ, LDLQ-RG, greedy ("allbal"), LDL-ADMM.

Capability parity with /root/reference/vector_balance.py, designed TPU-first:

  * The sequential column recurrence (vector_balance.py:179-180) is expressed
    as a *blocked* double ``lax.scan`` — the natural JAX form of the
    reference's "lazy batch" variant (vector_balance.py:218-291). Cross-block
    error feedback becomes an (m, d) x (d, B) matmul that runs on the MXU;
    only the short within-block scan is serial.
  * All solvers operate on "grid coordinates" (W mapped into [0, maxq], see
    core/grid.py) and are pure functions of (W, H) — no in-place module
    mutation, fully jit/vmap-able so many layers can be quantized as one
    batched program.
  * Randomness (unbiased rounding) comes from explicit PRNG keys.

Shapes follow the reference convention: W is (m, d) with d the contraction
(fan-in) dimension and H the (d, d) proxy Hessian E[x xᵀ].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def ldl_factor(H: jax.Array) -> jax.Array:
    """Return the strictly-lower LDL "feedback" factor.

    L = chol(H) @ diag(1/diag(chol(H))) - I   (vector_balance.py:171-173).
    The LDLQ recurrence only ever uses this zero-diagonal unit-lower factor.
    """
    C = jnp.linalg.cholesky(H)
    L = C * (1.0 / jnp.diagonal(C))[None, :]
    return L - jnp.eye(H.shape[0], dtype=H.dtype)


def _pad_wh(Wg, H, blocksize):
    """Pad d up to a multiple of blocksize.

    H is padded block-diagonally with (max diag(H)) * I so that (a) the
    Cholesky factor decouples the pad columns, (b) greedy passes that
    normalize by max(diag(H)) are unaffected.
    """
    m, d = Wg.shape
    dp = _cdiv(d, blocksize) * blocksize
    if dp == d:
        return Wg, H, d
    pad = dp - d
    diag_max = jnp.max(jnp.diagonal(H))
    Hp = jnp.zeros((dp, dp), dtype=H.dtype)
    Hp = Hp.at[:d, :d].set(H)
    Hp = Hp.at[jnp.arange(d, dp), jnp.arange(d, dp)].set(diag_max)
    Wp = jnp.pad(Wg, ((0, 0), (0, pad)))
    return Wp, Hp, d


def _block_views(M: jax.Array, blocksize: int):
    """Split the columns of (r, d) M into (nb, r, B) blocks."""
    r, d = M.shape
    nb = d // blocksize
    return M.reshape(r, nb, blocksize).transpose(1, 0, 2)


def _diag_blocks(L: jax.Array, blocksize: int):
    """(nb, B, B) diagonal blocks of a (d, d) matrix."""
    d = L.shape[0]
    nb = d // blocksize
    idx = jnp.arange(nb) * blocksize
    return jax.vmap(
        lambda i: lax.dynamic_slice(L, (i, i), (blocksize, blocksize))
    )(idx)


# ---------------------------------------------------------------------------
# The LDLQ initial pass (vector_balance.py:155-181 / blocked 218-258)
# ---------------------------------------------------------------------------


def _ldl_initial_pass(Wg, L, eta, maxq, blocksize):
    """Blocked LDLQ rounding sweep, columns processed d-1 -> 0.

    Recurrence (vector_balance.py:179-180):
        w_hat[:, i] = clamp(floor(w[:, i] + (w[:, i:] - w_hat[:, i:]) @ L[i:, i]
                                  + eta[:, i]), 0, maxq)

    Carry is the error matrix E = W - What (zero for unprocessed columns).
    Cross-block feedback T = E @ L[:, block] is one MXU matmul per block; the
    inner scan only touches the (m, B) local error block.
    """
    m, d = Wg.shape
    nb = d // blocksize
    B = blocksize

    L_colblocks = _block_views(L, B)          # (nb, d, B)
    L_diagblocks = _diag_blocks(L, B)         # (nb, B, B)
    W_blocks = _block_views(Wg, B)            # (nb, m, B)
    eta_blocks = _block_views(eta, B)         # (nb, m, B)
    starts = jnp.arange(nb) * B

    rev = slice(None, None, -1)

    def col_step(carry, xs):
        Eblk = carry                           # (m, B) local errors
        lcol, tcol, wcol, ecol, i = xs
        c = Eblk @ lcol + tcol                 # (m,)
        w_hat = jnp.clip(jnp.floor(wcol + c + ecol), 0, maxq)
        Eblk = Eblk.at[:, i].set(wcol - w_hat)
        return Eblk, w_hat

    def block_step(E, xs):
        Lcol, Lblk, W1, eta1, start = xs
        T = E @ Lcol                           # (m, B) tail contributions
        idxs = jnp.arange(B - 1, -1, -1)
        col_xs = (
            Lblk.T[idxs],                      # (B, B): column i of Lblk
            T.T[idxs],                         # (B, m)
            W1.T[idxs],
            eta1.T[idxs],
            idxs,
        )
        Eblk, whats_rev = lax.scan(
            col_step, jnp.zeros((m, B), Wg.dtype), col_xs
        )
        What1 = whats_rev[rev].T               # (m, B)
        E = lax.dynamic_update_slice(E, Eblk, (0, start))
        return E, What1

    xs = (
        L_colblocks[rev],
        L_diagblocks[rev],
        W_blocks[rev],
        eta_blocks[rev],
        starts[rev],
    )
    _, What_blocks_rev = lax.scan(block_step, jnp.zeros((m, d), Wg.dtype), xs)
    return What_blocks_rev[rev].transpose(1, 0, 2).reshape(m, d)


# ---------------------------------------------------------------------------
# Greedy coordinate-descent sweeps
# (vector_balance.py:28-33, 62-72 "allbal"; 186-196 LDL greedy passes)
# ---------------------------------------------------------------------------


def _greedy_sweep(wr, s, Hn, maxq, blocksize, reverse, unbiased_key=None):
    """One full coordinate-descent pass over all columns.

    Per column i: Hs = s @ Hn[:, i];
        eps = wr[:, i] - round_fn(wr[:, i] - Hs / Hn[i, i]);
        wr[:, i] -= eps; s[:, i] -= eps.
    round_fn is round() (biased) or floor(. + U[0,1)) (unbiased allbal,
    vector_balance.py:28-33). Blocked: contributions from outside the current
    block are one matmul (the reference's S0/S2 term, vector_balance.py:117).
    """
    m, d = wr.shape
    nb = d // blocksize
    B = blocksize

    H_colblocks = _block_views(Hn, B)          # (nb, d, B)
    H_diagblocks = _diag_blocks(Hn, B)         # (nb, B, B)
    starts = jnp.arange(nb) * B
    hdiag = jnp.diagonal(Hn)
    hdiag_blocks = hdiag.reshape(nb, B)

    if reverse:
        border = slice(None, None, -1)
        col_idxs = jnp.arange(B - 1, -1, -1)
    else:
        border = slice(None)
        col_idxs = jnp.arange(B)

    unbiased = unbiased_key is not None

    def col_step(carry, xs):
        W1, S1 = carry                          # (m, B), (m, B)
        h1col, tcol, hii, i, noise = xs
        Hs = S1 @ h1col + tcol
        target = W1[:, i] - Hs / hii
        if unbiased:
            z = jnp.floor(target + noise)
        else:
            z = jnp.round(target)
        eps = W1[:, i] - z
        W1 = W1.at[:, i].add(-eps)
        S1 = S1.at[:, i].add(-eps)
        return (W1, S1), None

    def block_step(carry, xs):
        wr_c, s_c = carry
        Hcol, Hblk, hd, start, nz = xs
        W1 = lax.dynamic_slice(wr_c, (0, start), (m, B))
        S1 = lax.dynamic_slice(s_c, (0, start), (m, B))
        s_masked = lax.dynamic_update_slice(
            s_c, jnp.zeros((m, B), s_c.dtype), (0, start)
        )
        T = s_masked @ Hcol                     # (m, B): S0/S2 contributions
        col_xs = (
            Hblk.T[col_idxs],
            T.T[col_idxs],
            hd[col_idxs],
            col_idxs,
            nz[col_idxs],
        )
        (W1, S1), _ = lax.scan(col_step, (W1, S1), col_xs)
        wr_c = lax.dynamic_update_slice(wr_c, W1, (0, start))
        s_c = lax.dynamic_update_slice(s_c, S1, (0, start))
        return (wr_c, s_c), None

    if unbiased:
        noise = jax.random.uniform(unbiased_key, (nb, B, m), dtype=wr.dtype)
    else:
        noise = jnp.zeros((nb, B, 1), dtype=wr.dtype)

    xs = (
        H_colblocks[border],
        H_diagblocks[border],
        hdiag_blocks[border],
        starts[border],
        noise[border],
    )
    (wr, s), _ = lax.scan(block_step, (wr, s), xs)
    return wr, s


def _greedy_passes(wr0, s0, Hn, maxq, npasses, blocksize, reverse,
                   w_hat0, unbiased_key=None):
    """npasses greedy sweeps with fixed-point early exit.

    Faithful to the reference semantics: clamp is applied to wr *after* each
    pass but s is NOT re-synchronized to the clamped wr
    (vector_balance.py:186-196) — the clamp/early-exit interplay is part of
    observed behavior.
    """
    if npasses <= 0:
        return wr0

    def cond(state):
        ip, done, *_ = state
        return jnp.logical_and(ip < npasses, jnp.logical_not(done))

    def body(state):
        ip, _, wr, s, w_hat = state
        key = (
            jax.random.fold_in(unbiased_key, ip)
            if unbiased_key is not None
            else None
        )
        wr, s = _greedy_sweep(wr, s, Hn, maxq, blocksize, reverse, key)
        wr = jnp.clip(wr, 0, maxq)
        done = jnp.all(w_hat == wr)
        return (ip + 1, done, wr, s, wr)

    state = (jnp.asarray(0), jnp.asarray(False), wr0, s0, w_hat0)
    _, _, wr, _, _ = lax.while_loop(cond, body, state)
    return wr


# ---------------------------------------------------------------------------
# Public solvers
# ---------------------------------------------------------------------------


def round_ldl(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    n_greedy_passes: int = 9,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    blocksize: int = 128,
) -> jax.Array:
    """LDLQ rounding (vector_balance.py:155-199 / blocked 218-291).

    Wg in grid coordinates (target range [0, 2**bits - 1]); H PSD.
    """
    if unbiased and n_greedy_passes > 0:
        raise ValueError(
            "greedy passes are incompatible with unbiased LDL rounding"
        )
    maxq = float(2**bits - 1)
    Wp, Hp, d0 = _pad_wh(Wg, H, blocksize)
    m, d = Wp.shape

    L = ldl_factor(Hp)
    if unbiased:
        assert key is not None, "unbiased rounding requires a PRNG key"
        eta = jax.random.uniform(key, Wp.shape, dtype=Wp.dtype)
    else:
        eta = jnp.full(Wp.shape, 0.5, dtype=Wp.dtype)

    What = _ldl_initial_pass(Wp, L, eta, maxq, blocksize)

    if n_greedy_passes > 0:
        s = What - Wp
        Hn = Hp / jnp.max(jnp.diagonal(Hp))
        What = _greedy_passes(
            What, s, Hn, maxq, n_greedy_passes, blocksize,
            reverse=True, w_hat0=What,
        )
    return What[:, :d0]


def round_ldl_gptqequiv(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    blocksize: int = 128,
) -> jax.Array:
    """OPTQ-order LDLQ (vector_balance.py:381-422).

    The reference flips H, takes the Cholesky factor, flips back, and rounds
    columns 0 -> d-1. That is exactly ``round_ldl`` on column-reversed (W, H):
    we reuse the same blocked kernel under a flip.
    """
    Wf = Wg[:, ::-1]
    Hf = H[::-1, ::-1]
    out = round_ldl(
        Wf, Hf, bits, n_greedy_passes=0, unbiased=unbiased, key=key,
        blocksize=blocksize,
    )
    return out[:, ::-1]


def round_allbal(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    npasses: int,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    blocksize: int = 128,
) -> jax.Array:
    """Greedy coordinate descent from the *unrounded* weights
    (vector_balance.py:36-135). Columns swept 0 -> d-1, npasses passes,
    fixed-point early exit."""
    maxq = float(2**bits - 1)
    Wp, Hp, d0 = _pad_wh(Wg, H, blocksize)
    Hn = Hp / jnp.max(jnp.diagonal(Hp))
    s = jnp.zeros_like(Wp)
    # reference: w_hat starts as a copy of the *continuous* weights
    # (vector_balance.py:54), so pass 1 never triggers the fixed-point exit.
    What = _greedy_passes(
        Wp, s, Hn, maxq, npasses, blocksize, reverse=False, w_hat0=Wp,
        unbiased_key=key if unbiased else None,
    )
    return What[:, :d0]


def _permute_wh(Wg, H, p):
    return Wg[:, p], H[p, :][:, p]


def round_ldlqRG(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    n_greedy_passes: int = 9,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    blocksize: int = 128,
) -> jax.Array:
    """LDLQ with columns sorted by ascending diag(H) plus greedy passes
    (vector_balance.py:139-152, 202-215)."""
    p = jnp.argsort(jnp.diagonal(H))
    Wp, Hp = _permute_wh(Wg, H, p)
    Whatp = round_ldl(
        Wp, Hp, bits, n_greedy_passes, unbiased, key, blocksize
    )
    ip = jnp.argsort(p)
    return Whatp[:, ip]


def round_allbal_sorted(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    npasses: int,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    blocksize: int = 128,
) -> jax.Array:
    """'allbal' with descending diag(H) sort, as dispatched by
    round_vecbal_Hsort (vector_balance.py:476-496)."""
    p = jnp.argsort(-jnp.diagonal(H))
    Wp, Hp = _permute_wh(Wg, H, p)
    Whatp = round_allbal(Wp, Hp, bits, npasses, unbiased, key, blocksize)
    ip = jnp.argsort(p)
    return Whatp[:, ip]


# ---------------------------------------------------------------------------
# LDL-ADMM variant (vector_balance.py:293-378)
# ---------------------------------------------------------------------------


def ldlp_admm(H: jax.Array, rho: float = 0.1, niters: int = 100) -> jax.Array:
    """ADMM solve for a strictly-lower feedback matrix Z minimizing
    tr((Z+I) H (Z+I)ᵀ) under unit column-norm constraints
    (vector_balance.py:308-324)."""
    n = H.shape[0]
    eye = jnp.eye(n, dtype=H.dtype)
    L = jnp.linalg.cholesky(2 * H + rho * eye)
    Linv = jnp.linalg.inv(L)
    M = (jnp.arange(n)[None, :] < jnp.arange(n)[:, None]).astype(H.dtype)
    MH = M * H

    def body(_, state):
        X, Z, W = state
        X = (((rho * Z - rho * W - 2 * MH) @ Linv.T) * M) @ Linv
        colnorm = jnp.sqrt(jnp.diagonal((X + W).T @ (X + W)))
        C = 1.0 / jnp.maximum(1.0, colnorm)
        Z = (X + W) * C[None, :]
        W = W + X - Z
        return (X, Z, W)

    zeros = jnp.zeros((n, n), dtype=H.dtype)
    _, Z, _ = lax.fori_loop(0, niters, body, (zeros, zeros, zeros))
    return Z


def round_ldl_admm(
    Wg: jax.Array,
    H: jax.Array,
    bits: int,
    n_greedy_passes: int = 9,
    unbiased: bool = False,
    key: Optional[jax.Array] = None,
    admm_iters: int = 100,
) -> jax.Array:
    """Fixed-point rounding with the ADMM feedback matrix plus
    triangle-greedy passes (vector_balance.py:326-378)."""
    maxq = float(2**bits - 1)
    m, d = Wg.shape
    Hn = H / jnp.max(jnp.diagonal(H))
    L = jnp.linalg.inv(
        ldlp_admm(Hn, niters=admm_iters) + jnp.eye(d, dtype=H.dtype)
    )
    if unbiased:
        assert key is not None
        eta = jax.random.uniform(key, Wg.shape, dtype=Wg.dtype)
    else:
        eta = jnp.full(Wg.shape, 0.5, dtype=Wg.dtype)

    w_hat0 = jnp.floor(Wg + eta)

    def fp_cond(state):
        i, done, _ = state
        return jnp.logical_and(i < d, jnp.logical_not(done))

    def fp_body(state):
        i, _, w_hat = state
        w_next = jnp.clip(jnp.floor(w_hat - (w_hat - Wg) @ L + eta), 0, maxq)
        done = jnp.all(w_next == w_hat)
        return (i + 1, done, w_next)

    _, _, wr = lax.while_loop(fp_cond, fp_body, (0, jnp.asarray(False), w_hat0))

    Hd = Hn @ jnp.diag(1.0 / jnp.diagonal(Hn))
    M = (jnp.arange(d)[None, :] < jnp.arange(d)[:, None]).astype(H.dtype)
    HnM = Hd * M

    def tri_pass(state):
        jj, done, wr = state
        wr_target = Wg + (Wg - wr) @ (Hd * M.T)

        def inner_cond(s):
            ii, idone, _ = s
            return jnp.logical_and(ii < d, jnp.logical_not(idone))

        def inner_body(s):
            ii, _, wr_i = s
            wr_new = jnp.clip(
                jnp.round(wr_target + (Wg - wr_i) @ HnM), 0, maxq
            )
            idone = jnp.all(wr_new == wr_i)
            return (ii + 1, idone, wr_new)

        n_inner, _, wr_new = lax.while_loop(
            inner_cond, inner_body, (0, jnp.asarray(False), wr)
        )
        # reference breaks the outer loop when the inner loop converges
        # immediately (vector_balance.py:373-375)
        done = n_inner <= 1
        return (jj + 1, done, wr_new)

    def tri_cond(state):
        jj, done, _ = state
        return jnp.logical_and(jj < n_greedy_passes, jnp.logical_not(done))

    _, _, wr = lax.while_loop(tri_cond, tri_pass, (0, jnp.asarray(False), wr))
    return wr


def round_ldl_admm_sorted(Wg, H, bits, n_greedy_passes=9, unbiased=False,
                          key=None):
    """Ascending diag(H) sort wrapper (vector_balance.py:293-306)."""
    p = jnp.argsort(jnp.diagonal(H))
    Wp, Hp = _permute_wh(Wg, H, p)
    Whatp = round_ldl_admm(Wp, Hp, bits, n_greedy_passes, unbiased, key)
    ip = jnp.argsort(p)
    return Whatp[:, ip]


def round_nearest(Wg: jax.Array, bits: int) -> jax.Array:
    """Round-to-nearest on the grid — baseline (near.py:5-20)."""
    return jnp.clip(jnp.round(Wg), 0, 2**bits - 1)


def hessian_loss(dW: jax.Array, H: jax.Array) -> jax.Array:
    """Proxy loss tr(ΔW H ΔWᵀ) (vector_balance.py:14-15, method.py:228-233)."""
    return jnp.trace(dW @ H @ dW.T)


def weight_entropy(Wr, bits: int) -> float:
    """Average bits per weight of the empirical code distribution
    (vector_balance.py:18-24 `calc_entropy`)."""
    import numpy as np

    vals, counts = np.unique(np.asarray(Wr), return_counts=True)
    p = counts / counts.sum()
    return float(-(p * np.log(p)).sum() / np.log(2.0))


def check_nbits(Wr, bits: int) -> bool:
    """Debug helper: True iff the rounded weights use at most 2**bits values
    (vector_balance.py:8-11). Not jittable; call on concrete arrays."""
    import numpy as np

    vals = np.unique(np.asarray(Wr))
    return len(vals) <= 2**bits
