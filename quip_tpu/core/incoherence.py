"""Incoherence processing: PRNG-keyed random orthogonal butterfly transforms.

Capability parity with the reference butterfly machinery
(/root/reference/method.py:16-78), TPU-first:

  * Transforms are *keyed*, not stored: a checkpoint only needs the PRNG key
    (plus n and the mode) to regenerate U and V exactly — the reference
    instead materializes dense U/V and keeps them on the CPU
    (method.py:162-169, 177-178).
  * Application is the O(n (p + q)) structured product via reshape/transpose
    + batched matmul on the MXU (method.py:46-67), never a dense n² matmul,
    unless explicitly materialized for tests.
  * Random SO(p) blocks come from QR of a Gaussian with sign fixing
    (Haar-distributed), replacing scipy.stats.special_ortho_group
    (method.py:20-31); p = 2 uses the direct rotation-matrix fast path.

Modes match ``preproc_proj_extra`` (method.py:125-135):
  'block'     — per-block random SO(p) + random permutations      (extra=0)
  'noblock'   — one shared SO(p) per factor + permutations        (extra=1, default)
  'nopermute' — per-block SO(p), identity permutations            (extra=2)
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def raw_key(key: jax.Array) -> jax.Array:
    """Normalize a PRNG key to the raw uint32 representation so it can live
    inside checkpoints (np.savez can't serialize typed key arrays)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key)
    return key


def prime_factors(n: int) -> list[int]:
    """Prime factorization by trial division (replaces the primefac dep)."""
    fs = []
    x = n
    p = 2
    while p * p <= x:
        while x % p == 0:
            fs.append(p)
            x //= p
        p += 1 if p == 2 else 2
    if x > 1:
        fs.append(x)
    return fs


def butterfly_factors(n: int) -> Tuple[int, int]:
    """Split n = p * q by alternating prime factors (method.py:16-18)."""
    pf = prime_factors(n)
    return (math.prod(pf[0::2]), math.prod(pf[1::2]))


class Butterfly(NamedTuple):
    """A random orthogonal butterfly operator of dimension n.

    blocks[i] has shape (n_blocks_i, p_i, p_i) with n_blocks_i in {1, n//p_i}
    (1 for 'noblock' mode, broadcast over blocks).
    perm_in/perm_out are permutation index vectors of length n (or None for
    'nopermute').
    """

    blocks: Tuple[jax.Array, ...]
    perm_in: jax.Array | None
    perm_out: jax.Array | None
    n: int

    @property
    def factors(self) -> Tuple[int, ...]:
        return tuple(b.shape[-1] for b in self.blocks)


def random_orthogonal(key: jax.Array, p: int, size: int,
                      dtype=jnp.float32) -> jax.Array:
    """(size, p, p) Haar-random special-orthogonal matrices.

    p == 2 fast path: rotation by U[0, 2π) (method.py:23-31). General p: QR
    of a Gaussian with R-diagonal sign correction gives Haar on O(p); a
    column flip makes det = +1 (SO(p)), matching special_ortho_group.
    """
    # ALWAYS sample in float32 and cast: the same key must yield bitwise
    # identical rotations no matter the requested dtype, because the same
    # butterfly is regenerated at quantize time (possibly f64), checkpoint
    # load, and inference (bf16). (Also: QR has no bf16 kernel.)
    cdtype = jnp.float32
    if p == 2:
        t = jax.random.uniform(key, (size,), dtype=cdtype) * (2 * math.pi)
        c, s = jnp.cos(t), jnp.sin(t)
        return jnp.stack(
            [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2
        ).astype(dtype)
    g = jax.random.normal(key, (size, p, p), dtype=cdtype)
    q, r = jnp.linalg.qr(g)
    sign = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    q = q * sign[:, None, :]
    det = jnp.linalg.det(q)
    # flip the last column where det < 0 so det = +1
    flip = jnp.where(det < 0, -1.0, 1.0)
    return q.at[:, :, -1].multiply(flip[:, None]).astype(dtype)


def gen_butterfly(key: jax.Array, n: int, mode: str = "noblock",
                  dtype=jnp.float32) -> Butterfly:
    """Generate a keyed random orthogonal butterfly of dimension n
    (method.py:33-43)."""
    if mode not in ("block", "noblock", "nopermute"):
        raise ValueError(f"unknown butterfly mode: {mode}")
    facs = butterfly_factors(n)
    facs = tuple(f for f in facs if f > 1) or (1,)
    keys = jax.random.split(key, len(facs) + 2)
    blocks = []
    for i, p in enumerate(facs):
        size = 1 if mode == "noblock" else n // p
        blocks.append(random_orthogonal(keys[i], p, size, dtype))
    if mode == "nopermute":
        perm_in = perm_out = None
    else:
        perm_in = jax.random.permutation(keys[-2], n)
        perm_out = jax.random.permutation(keys[-1], n)
    return Butterfly(tuple(blocks), perm_in, perm_out, n)


def _apply_factor(x: jax.Array, Bi: jax.Array, mpfx: int, p: int,
                  msfx: int, transpose: bool) -> jax.Array:
    """Apply one butterfly stage to the leading axis of (n, q) x
    (method.py:57-63)."""
    n, q = x.shape
    x = x.reshape(mpfx, p, msfx, q).transpose(0, 2, 1, 3)
    x = x.reshape(mpfx * msfx, p, q)
    B = jnp.swapaxes(Bi, -1, -2) if transpose else Bi
    if B.shape[0] == 1:
        x = jnp.einsum("ab,nbq->naq", B[0], x)
    else:
        x = jnp.einsum("nab,nbq->naq", B, x)
    x = x.reshape(mpfx, msfx, p, q).transpose(0, 2, 1, 3)
    return x.reshape(n, q)


def apply_butterfly(bf: Butterfly, x: jax.Array, axis: int = 0,
                    transpose: bool = False) -> jax.Array:
    """y = B @ x along ``axis`` (or Bᵀ @ x when transpose=True — the exact
    inverse, since B is orthogonal).

    Matches mul_ortho_butterfly (method.py:46-67): x -> P_out B_k ... B_0 P_in x.
    """
    orig_shape = x.shape
    x = jnp.moveaxis(x, axis, 0)
    lead = x.shape[0]
    assert lead == bf.n, f"butterfly dim {bf.n} != axis size {lead}"
    tail_shape = x.shape[1:]
    x = x.reshape(lead, -1)

    facs = bf.factors
    sizes = []
    for i in range(len(facs)):
        mpfx = math.prod(facs[:i])
        msfx = math.prod(facs[i + 1:])
        sizes.append((mpfx, facs[i], msfx))

    if not transpose:
        if bf.perm_in is not None:
            x = x[bf.perm_in, :]
        for Bi, (mpfx, p, msfx) in zip(bf.blocks, sizes):
            x = _apply_factor(x, Bi, mpfx, p, msfx, transpose=False)
        if bf.perm_out is not None:
            x = x[bf.perm_out, :]
    else:
        # (P_out B_k .. B_0 P_in)^T = P_in^T B_0^T .. B_k^T P_out^T
        if bf.perm_out is not None:
            x = _inv_permute(x, bf.perm_out)
        for Bi, (mpfx, p, msfx) in zip(reversed(bf.blocks), reversed(sizes)):
            x = _apply_factor(x, Bi, mpfx, p, msfx, transpose=True)
        if bf.perm_in is not None:
            x = _inv_permute(x, bf.perm_in)

    x = x.reshape((lead,) + tail_shape)
    x = jnp.moveaxis(x, 0, axis)
    return x.reshape(orig_shape)


def _inv_permute(x: jax.Array, perm: jax.Array) -> jax.Array:
    """Apply the inverse of x -> x[perm] as a *gather* with the inverse
    index (TPU scatters are far slower than gathers)."""
    return x[jnp.argsort(perm), :]


def materialize(bf: Butterfly, dtype=jnp.float32) -> jax.Array:
    """Dense n x n matrix (method.py:71-78) — for tests / small dims."""
    return apply_butterfly(bf, jnp.eye(bf.n, dtype=dtype), axis=0)


# ---------------------------------------------------------------------------
# Two-sided weight/Hessian rotations used by incoherence preprocessing
# (method.py:175-176: w -> U w Vᵀ,  H -> V H Vᵀ)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Randomized Hadamard/Kronecker transform (RHT) — the permutation-free fast
# incoherence path (the QuIP# improvement over QuIP's butterfly; public
# algorithm, arXiv 2402.04396).
#
# T = (H_{2^k} ⊗ O_r) · diag(s), with H a normalized Hadamard, O_r a random
# orthogonal for the odd part r of n = 2^k · r, and s random ±1 signs.
# Orthogonal by construction; application is one elementwise multiply plus
# two *small dense matmuls* on a (2^k, r) reshape — no gathers/scatters, so
# it runs at MXU/VPU speed inside serving kernels (the butterfly's random
# permutations cost ~50µs of gather per application on TPU).
# ---------------------------------------------------------------------------


class RHT(NamedTuple):
    """Randomized Hadamard/Kronecker transform of dimension n = a * b."""

    signs: jax.Array          # (n,) ±1
    left: jax.Array           # (a, a) orthogonal (normalized Hadamard)
    right: jax.Array | None   # (b, b) orthogonal, or None when b == 1
    n: int

    @property
    def a(self) -> int:
        return self.left.shape[0]

    @property
    def b(self) -> int:
        return self.n // self.left.shape[0]


def _hadamard(k: int, dtype=jnp.float32) -> jax.Array:
    """Normalized H_{2^k} (orthogonal)."""
    H = jnp.asarray([[1.0]], dtype)
    base = jnp.asarray([[1.0, 1.0], [1.0, -1.0]], dtype)
    for _ in range(k):
        H = jnp.kron(base, H)
    return H / jnp.sqrt(jnp.asarray(2.0**k, dtype))


def _pow2_split(n: int) -> Tuple[int, int]:
    """n = a * b with a a power of two chosen near sqrt(n).

    Both Kronecker factors must stay small: a lop-sided split (e.g.
    12288 = 4096 x 3) would make the left Hadamard a 4096^2 dense constant —
    67 MB of reads per application, observed as a 1.6x decode regression.
    """
    k = 0
    m = n
    while m % 2 == 0:
        m //= 2
        k += 1
    # a = 2^ka closest to sqrt(n), bounded by the available 2-power
    ka = min(k, max(1, round(math.log2(math.sqrt(n)))))
    return 2**ka, (2 ** (k - ka)) * m


def gen_rht(key: jax.Array, n: int, dtype=jnp.float32) -> RHT:
    """Keyed RHT; same key -> identical transform (checkpoints store keys)."""
    a, b = _pow2_split(n)
    ks, ko = jax.random.split(key)
    signs = jnp.where(
        jax.random.bernoulli(ks, 0.5, (n,)), 1.0, -1.0).astype(dtype)
    k = int(math.log2(a))
    left = _hadamard(k, dtype)
    if b == 1:
        right = None
    elif b & (b - 1) == 0:  # power of two
        right = _hadamard(int(math.log2(b)), dtype)
    else:
        right = random_orthogonal(ko, b, 1, dtype)[0]
    return RHT(signs, left, right, n)


def apply_rht(t: RHT, x: jax.Array, axis: int = 0,
              transpose: bool = False) -> jax.Array:
    """y = T x (or Tᵀ x) along ``axis``; Tᵀ is the exact inverse.

    ``t.signs is None`` skips the sign multiply — the pure-Kronecker map
    K = L ⊗ R used by the sign-folded serving format (proj_mode 'rht_sf',
    pack/format.py::fold_rht_signs), where diag(s) lives in the packed
    codes instead of the activation path."""
    orig_shape = x.shape
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    assert x.shape[-1] == t.n
    a, b = t.a, t.b
    L = t.left.astype(x.dtype)
    R = t.right.astype(x.dtype) if t.right is not None else None
    s = t.signs.astype(x.dtype) if t.signs is not None else None

    if not transpose:
        if s is not None:
            x = x * s
        x = x.reshape(*lead, a, b)
        x = jnp.einsum("pa,...ab->...pb", L, x)
        if R is not None:
            x = jnp.einsum("qb,...ab->...aq", R, x)
        x = x.reshape(*lead, t.n)
    else:
        x = x.reshape(*lead, a, b)
        x = jnp.einsum("pa,...pb->...ab", L, x)      # Lᵀ on the a axis
        if R is not None:
            x = jnp.einsum("qb,...aq->...ab", R, x)  # Rᵀ on the b axis
        x = x.reshape(*lead, t.n)
        if s is not None:
            x = x * s
    x = jnp.moveaxis(x, -1, axis)
    return x.reshape(orig_shape)


def materialize_rht(t: RHT, dtype=jnp.float32) -> jax.Array:
    return apply_rht(t, jnp.eye(t.n, dtype=dtype), axis=0)


def rht_rotate_weight(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    """w -> U w Vᵀ."""
    w = apply_rht(u, w, axis=0)
    return apply_rht(v, w, axis=1)


def rht_rotate_hessian(v: RHT, H: jax.Array) -> jax.Array:
    H = apply_rht(v, H, axis=0)
    return apply_rht(v, H, axis=1)


def rht_unrotate_weight(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    w = apply_rht(u, w, axis=0, transpose=True)
    return apply_rht(v, w, axis=1, transpose=True)


def rht_unrotate_hessian(v: RHT, H: jax.Array) -> jax.Array:
    H = apply_rht(v, H, axis=0, transpose=True)
    return apply_rht(v, H, axis=1, transpose=True)


# ---------------------------------------------------------------------------
# OUTER-sign RHT variant (proj_mode 'rht_sf' — the sign-folded serving
# format). Transform T = diag(s) · (L ⊗ R): signs applied in the ROTATED
# basis, i.e. adjacent to the rotated payload W₂ = U W Vᵀ =
# diag(s_u) K_u W K_vᵀ diag(s_v). Because the qfn-b grid is symmetric
# (code c → maxq − c negates exactly), those outer signs fold into the
# packed codes at pack time and the serving path runs PURE Kronecker dots —
# zero sign passes (docs/PERF.md round-3 roadmap item 1).
#
# Trade-off vs the standard inner-sign RHT (T = K · diag(s)): the sign
# randomization no longer touches the magnitudes of K H Kᵀ / K_u W K_vᵀ
# (outer flips change entry signs only), so the formal incoherence argument
# rests on the Kronecker mixing + the odd-factor random orthogonal alone.
# Opt-in (QuantConfig proj_mode='rht_sf'); validate quality per model.
# ---------------------------------------------------------------------------


def _nosign(t: RHT) -> RHT:
    return t._replace(signs=None)


def rht_rotate_weight_outer(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    """w -> U w Vᵀ with U = diag(s_u)·K_u, V = diag(s_v)·K_v."""
    w = apply_rht(_nosign(u), w, axis=0)
    w = apply_rht(_nosign(v), w, axis=1)
    return w * u.signs.astype(w.dtype)[:, None] \
        * v.signs.astype(w.dtype)[None, :]


def rht_unrotate_weight_outer(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    w = w * u.signs.astype(w.dtype)[:, None] \
        * v.signs.astype(w.dtype)[None, :]
    w = apply_rht(_nosign(u), w, axis=0, transpose=True)
    return apply_rht(_nosign(v), w, axis=1, transpose=True)


def rht_rotate_weight_uf(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    """Hybrid ('rht_uf'): U outer (diag(s_u)·K_u), V inner (K_v·diag(s_v)).

    The quality-critical sign randomization is the V/H side (real
    activation Hessians have flat-ish top eigenvectors that an unsigned
    Hadamard maps onto a coherent basis vector); it is kept INNER, and its
    decode pass is already free (folds into vin with 1/scaleWH). The
    U-side signs — the only remaining decode pass — go OUTER so they fold
    into the packed code ROWS (fold_rht_sign_rows)."""
    w = apply_rht(v, w, axis=1)                 # inner V: w -> w Vᵀ
    w = apply_rht(_nosign(u), w, axis=0)        # K_u
    return w * u.signs.astype(w.dtype)[:, None]


def rht_unrotate_weight_uf(u: RHT, v: RHT, w: jax.Array) -> jax.Array:
    w = w * u.signs.astype(w.dtype)[:, None]
    w = apply_rht(_nosign(u), w, axis=0, transpose=True)
    return apply_rht(v, w, axis=1, transpose=True)


def rht_rotate_hessian_outer(v: RHT, H: jax.Array) -> jax.Array:
    """H -> V H Vᵀ = diag(s_v) K_v H K_vᵀ diag(s_v)."""
    H = apply_rht(_nosign(v), H, axis=0)
    H = apply_rht(_nosign(v), H, axis=1)
    s = v.signs.astype(H.dtype)
    return H * s[:, None] * s[None, :]


def rht_unrotate_hessian_outer(v: RHT, H: jax.Array) -> jax.Array:
    s = v.signs.astype(H.dtype)
    H = H * s[:, None] * s[None, :]
    H = apply_rht(_nosign(v), H, axis=0, transpose=True)
    return apply_rht(_nosign(v), H, axis=1, transpose=True)


def rotate_weight(u: Butterfly, v: Butterfly, w: jax.Array) -> jax.Array:
    """w -> U w Vᵀ without materializing U or V.

    (Applying a butterfly along axis=1 computes w @ Bᵀ.)
    """
    w = apply_butterfly(u, w, axis=0)              # U w
    return apply_butterfly(v, w, axis=1)           # (U w) Vᵀ


def rotate_hessian(v: Butterfly, H: jax.Array) -> jax.Array:
    """H -> V H Vᵀ."""
    H = apply_butterfly(v, H, axis=0)              # V H
    return apply_butterfly(v, H, axis=1)           # (V H) Vᵀ


def unrotate_weight(u: Butterfly, v: Butterfly, w: jax.Array) -> jax.Array:
    """w -> Uᵀ w V (exact inverse of rotate_weight; method.py:202)."""
    w = apply_butterfly(u, w, axis=0, transpose=True)   # Uᵀ w
    return apply_butterfly(v, w, axis=1, transpose=True)


def unrotate_hessian(v: Butterfly, H: jax.Array) -> jax.Array:
    """H -> Vᵀ H V (method.py:203)."""
    H = apply_butterfly(v, H, axis=0, transpose=True)
    return apply_butterfly(v, H, axis=1, transpose=True)
