"""Packed int2/3/4/8 weight format, TPU-first.

Replaces the reference's CUDA-oriented bit-packing (Quant3Linear.pack,
/root/reference/quant.py:185-220, zeroShot/models/quant.py:183-212) with a
**halfword-spread, transposed** layout designed so the Pallas kernel
(kernels/dequant_matmul.py) can turn packed words into bf16 matmul operands
with ~1.5 VPU ops per element and ZERO int->float conversions:

  * A plane is an int32 array of shape (nwords, m) — fan-in packed on the
    sublane axis, out-features on the 128-wide lane axis (already in the
    layout the MXU wants for `x @ Wᵀ` as an NN dot).
  * Word (j, i) carries codes of weight row i at bit-field (16*h + bits*k),
    h in {0,1}, k in 0..(16/bits)-1, for fan-in column
        c = k * (2 * nwords) + 2 * j + h.
    Unpacking field k for *both* halves at once is one shift+mask+or:
        ((w >> bits*k) & mask16) | 0x4300_4300
    which bit-patterns each 16-bit half into the bfloat16 value 128+code
    (0x4300 is bf16 128.0; codes < 16 live in the low mantissa bits). A
    bitwidth-changing `pltpu.bitcast` to bf16 then yields a (2*nwords, m)
    slab whose rows are exactly fan-in columns k*2nw..k*2nw+2nw-1 — the
    concatenated slabs ARE the (d, m) operand, offset by 128, and the 128
    offset folds into the affine fixup (128 * Σx) the kernel already
    computes. No gathers, no per-element converts, no dense W materialized.
  * Every plane holds 1, 2, or 4-bit fields; wider widths compose planes:
    2-bit -> (p2,), 3-bit -> (p2_low, p1_high), 4-bit -> (p4,),
    8-bit -> (p4_low, p4_high). Multi-plane formats cost one extra MXU dot,
    which is free at decode batch sizes (the kernel is bandwidth-bound).
  * Metadata carries everything inference needs: grid params (qfn-a per-row
    scale/zero or qfn-b scalar), the diagonal rescale vector, and the PRNG
    key that regenerates the U/V butterflies (checkpoints never store dense
    rotation matrices).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Packed-plane layout version. v1 = slab-major (m, nwords) planes;
# v2 = halfword-spread transposed (nwords, m) planes (the bf16-direct
# kernel layout). Checkpoints and resume files record this; loaders reject
# mismatches instead of feeding the kernel transposed garbage.
PACK_FORMAT_VERSION = 2

# (field bit width, code-combine weight) per plane, keyed by total width
PLANE_SPLITS = {
    2: ((2, 1),),
    3: ((2, 1), (1, 4)),
    4: ((4, 1),),
    8: ((4, 1), (4, 16)),
}


def _pack_plane(codes: jax.Array, bits: int) -> jax.Array:
    """Pack (m, d) integer codes (< 2**bits, bits in {1,2,4}) into a
    halfword-spread transposed (d*bits//32, m) int32 plane."""
    m, d = codes.shape
    fph = 16 // bits                      # fields per 16-bit half
    cpw = 2 * fph                         # codes per 32-bit word
    assert d % cpw == 0, f"d={d} must be divisible by {cpw}"
    nw = d // cpw
    # fan-in column c = k*(2*nw) + 2*j + h  ->  axes (k, j, h)
    c = codes.astype(jnp.uint32).T.reshape(fph, nw, 2, m)
    word = jnp.zeros((nw, m), jnp.uint32)
    for k in range(fph):
        for h in range(2):
            word = word | (c[k, :, h, :] << (16 * h + bits * k))
    return word.astype(jnp.int32)


def _unpack_plane(words: jax.Array, bits: int, d: int) -> jax.Array:
    """Inverse of _pack_plane -> (m, d) int32 codes."""
    fph = 16 // bits
    nw = d // (2 * fph)
    w = words.astype(jnp.uint32)
    mask = jnp.uint32(2**bits - 1)
    # rebuild the (fph, nw, 2, m) code axes, then invert the pack reshape
    c = jnp.stack(
        [jnp.stack([(w >> (16 * h + bits * k)) & mask for h in range(2)],
                   axis=1)
         for k in range(fph)], axis=0)            # (fph, nw, 2, m)
    return c.reshape(d, words.shape[-1]).T.astype(jnp.int32)


def padded_m(m: int, d: int, bits: int) -> int:
    """Smallest lane-aligned out-feature pad (<= ~2.5%) that puts a kernel
    m-tile in the measured fast band — packed tile ~1.5-3.5 MB with 4-16
    grid steps (scripts/bench_tiles.py 2026-08-20: those run 640-665 GB/s
    on v5e; the ~5.6 MB tiles drop to ~530-590).

    The one production shape that needs it is Llama's fused gate-up
    m = 22016 = 43*512, whose only mid-size divisor is 5504 (5.6 MB tile,
    ~590 GB/s) — padding to 22528 unlocks tile 2816 (2.9 MB, 649 GB/s
    measured, ~9%% faster wall-clock despite +2.3%% traffic). Padded rows
    are zero codes; qlinear slices outputs back to ``out_features``.

    QUIP_NO_PAD_M=1 disables (A/B probes)."""
    import os

    if os.environ.get("QUIP_NO_PAD_M") == "1":
        return m

    def band_score(mm: int):
        """Best in-band tile's distance from the measured sweet spot
        (~2.9 MB packed — 22528/2816 measured 36.4 µs vs 22400/3200's
        38.4 on the gate-up shape); None when mm has no band tile."""
        scores = [abs(d * t * bits / 8 - 2.9e6)
                  for t in range(128, mm // 4 + 1, 128)
                  if mm % t == 0 and 1.5e6 <= d * t * bits / 8 <= 3.5e6
                  and 4 <= mm // t <= 16]
        return min(scores) if scores else None

    if m % 128 == 0 and band_score(m) is not None:
        return m
    cap = m + max(128, int(m * 0.025) // 128 * 128)
    best, best_score = m, None
    mm = (m + 127) // 128 * 128
    while mm <= cap:
        s = band_score(mm)
        if s is not None and (best_score is None or s < best_score):
            best, best_score = mm, s
        mm += 128
    return best


def pack_codes(codes: jax.Array, bits: int) -> Tuple[jax.Array, ...]:
    """Pack integer grid codes into halfword-spread transposed planes.
    Returns one (nw, m) int32 plane per PLANE_SPLITS entry."""
    if bits not in PLANE_SPLITS:
        raise ValueError(f"unsupported bit width {bits}")
    planes = []
    shift = 0
    for field_bits, _ in PLANE_SPLITS[bits]:
        part = (codes >> shift) & ((1 << field_bits) - 1)
        planes.append(_pack_plane(part, field_bits))
        shift += field_bits
    return tuple(planes)


def unpack_codes(planes: Tuple[jax.Array, ...], bits: int, d: int) -> jax.Array:
    if bits not in PLANE_SPLITS:
        raise ValueError(f"unsupported bit width {bits}")
    out = None
    shift = 0
    for plane, (field_bits, _) in zip(planes, PLANE_SPLITS[bits]):
        part = _unpack_plane(plane, field_bits, d)
        out = part << shift if out is None else out | (part << shift)
        shift += field_bits
    return out


@jax.tree_util.register_pytree_node_class
class PackedLinear:
    """One packed quantized linear: y = x @ Ŵᵀ reconstructed from codes.

    Grid semantics:
      qfn 'b' (incoherence grid): Ŵ_rot = ((codes/maxq)*2 - 1) * scale_b,
          with butterflies (U, V) and diagonal rescale applied around it.
      qfn 'a': Ŵ = scale_row * (codes - zero_row), no rotation.

    The packed checkpoint contract (tests/test_pack.py): apply() must equal
    the dense dequantized weights' forward bit-for-bit up to dtype rounding.
    """

    def __init__(self, planes, scale, zero, scale_b, scaleWH, proj_key,
                 bias, *, bits: int, qfn: str, proj_mode: str,
                 out_features: int, in_features: int, rot=None,
                 code_bits=None):
        self.planes = tuple(planes)
        self.scale = scale          # (m, 1) qfn-a scale or None
        self.zero = zero            # (m, 1) qfn-a zero or None
        self.scale_b = scale_b      # scalar qfn-b scale or None
        self.scaleWH = scaleWH      # (d,) diagonal rescale or None
        self.proj_key = proj_key    # PRNG key for U/V or None
        self.bias = bias            # (m,) or None
        # rot: materialized butterfly components, built once at pack/load
        # time from proj_key. Regenerating them inside a jitted forward would
        # put ~2 QR decompositions per linear per step on the device — the
        # dominant cost of the whole decode (observed 8x slowdown).
        # Layout: {'u': (blocks_tuple, perm_in, perm_out), 'v': (...)}
        # (perms may be None in 'nopermute' mode).
        self.rot = rot
        # code_bits: true code width when the planes store wider fields —
        # the 3-in-4 serving transcode (widen_3bit) keeps 3-bit codes in
        # 4-bit planes (single-plane kernel: ~17% faster decode than the
        # two-plane 3-bit format, at 4/3 the weight traffic). None = bits.
        self.code_bits = code_bits
        self.bits = bits
        self.qfn = qfn
        self.proj_mode = proj_mode
        self.out_features = out_features
        self.in_features = in_features

    # -- pytree protocol --
    def tree_flatten(self):
        children = (self.planes, self.scale, self.zero, self.scale_b,
                    self.scaleWH, self.proj_key, self.bias, self.rot)
        aux = (self.bits, self.qfn, self.proj_mode, self.out_features,
               self.in_features, self.code_bits)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        planes, scale, zero, scale_b, scaleWH, proj_key, bias, rot = children
        # pre-code_bits checkpoints serialized a 5-tuple aux
        bits, qfn, proj_mode, m, d = aux[:5]
        code_bits = aux[5] if len(aux) > 5 else None
        return cls(planes, scale, zero, scale_b, scaleWH, proj_key, bias,
                   bits=bits, qfn=qfn, proj_mode=proj_mode,
                   out_features=m, in_features=d, rot=rot,
                   code_bits=code_bits)

    @property
    def maxq(self) -> float:
        return float(2**(self.code_bits or self.bits) - 1)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Reconstruct the dense Ŵ (m, d) in the original space — the
        packed-checkpoint -> dense path (load_quant3 parity, opt.py:318-348)."""
        from quip_tpu.core import incoherence as inc

        codes = unpack_codes(self.planes, self.bits, self.in_features)
        codes = codes[: self.out_features]   # drop padded_m tiling rows
        codes = codes.astype(dtype)
        if self.qfn == "b":
            W = ((codes / self.maxq) * 2 - 1) * self.scale_b.astype(dtype)
        else:
            W = self.scale.astype(dtype) * (codes - self.zero.astype(dtype))
        if self.proj_key is not None:
            if self.rot is not None:
                U, V = rot_to_butterflies(self, dtype=dtype)
            elif self.proj_mode in ("rht", "rht_sf", "rht_uf"):
                ku, kv = jax.random.split(self.proj_key)
                U = inc.gen_rht(ku, self.out_features, dtype)
                V = inc.gen_rht(kv, self.in_features, dtype)
                if self.proj_mode == "rht_sf":
                    # signs already folded into the codes: the stored
                    # payload is sign-stripped, un-rotate with K only
                    U, V = U._replace(signs=None), V._replace(signs=None)
                elif self.proj_mode == "rht_uf":
                    # only the U-side signs live in the code rows
                    U = U._replace(signs=None)
            else:
                ku, kv = jax.random.split(self.proj_key)
                U = inc.gen_butterfly(ku, self.out_features, self.proj_mode,
                                      dtype)
                V = inc.gen_butterfly(kv, self.in_features, self.proj_mode,
                                      dtype)
            if self.proj_mode in ("rht", "rht_sf", "rht_uf"):
                # folded modes: sign-stripped transform slots carry
                # signs=None (apply_rht skips), so the same unrotate
                # expression covers all three
                W = inc.rht_unrotate_weight(U, V, W)
            else:
                W = inc.unrotate_weight(U, V, W)
        if self.scaleWH is not None:
            W = W / self.scaleWH.astype(dtype)[None, :]
        return W

    def __repr__(self):
        return (f"PackedLinear({self.out_features}x{self.in_features}, "
                f"{self.bits}-bit, qfn={self.qfn!r}, "
                f"rot={self.proj_key is not None})")


def widen_3bit(q: "PackedLinear") -> "PackedLinear":
    """3-in-4 serving transcode: repack the two-plane 3-bit format (2-bit
    plane + 1-bit plane) into ONE 4-bit plane holding the same 3-bit codes.

    Why: the 1-bit plane unpacks 16 fields per word — 16 thin MXU dots per
    m-tile — and measured end-to-end decode at 7B shapes is 165.6 tok/s
    for two-plane 3-bit vs 193.4 for single-plane 4-bit (bench.py
    2026-08-20), i.e. the extra dots cost more than the extra 1/3 weight
    traffic of 4-bit fields. Quality is untouched (identical codes/grid:
    code_bits keeps maxq = 7). Storage stays 3-bit; widen at load.
    Works on single and layer-stacked leaves."""
    if q.bits != 3:
        return q
    d = q.in_features
    # Transcode on the HOST, one layer at a time (native/packlib.cpp when
    # built, numpy otherwise): a device-side unpack materializes the full
    # int32 code tensor — (32, 22528, 4096)x4B ≈ 12 GB for stacked 7B
    # gate-up, which OOM'd a 16 GB chip on the first on-chip run.
    from quip_tpu.pack import native

    def one(planes_np):
        return native.pack_np(native.unpack_np(planes_np, 3, d), 4)

    p0 = q.planes[0]
    if p0.ndim == 3:                   # (layers, nw, m) stacked
        L = p0.shape[0]
        per = [one([np.asarray(p[l]) for p in q.planes]) for l in range(L)]
        new_planes = tuple(
            jnp.asarray(np.stack([per[l][i] for l in range(L)]))
            for i in range(len(per[0])))
    else:
        new_planes = tuple(
            jnp.asarray(p) for p in one([np.asarray(p) for p in q.planes]))
    return PackedLinear(new_planes, q.scale, q.zero, q.scale_b, q.scaleWH,
                        q.proj_key, q.bias, bits=4, qfn=q.qfn,
                        proj_mode=q.proj_mode, out_features=q.out_features,
                        in_features=d, rot=q.rot, code_bits=3)


def widen_3bit_tree(params):
    """Apply widen_3bit to every 3-bit PackedLinear leaf of a param tree
    (Engine/serve default for 3-bit checkpoints; QUIP_NO_WIDEN3=1 keeps
    the tight two-plane format)."""
    import os

    if os.environ.get("QUIP_NO_WIDEN3") == "1":
        return params

    def walk(tree):
        if isinstance(tree, PackedLinear):
            return widen_3bit(tree)
        if isinstance(tree, dict):
            return {k: walk(v) for k, v in tree.items()}
        return tree

    return walk(params)


def materialize_rotation(proj_key, m: int, d: int, mode: str,
                         dtype=jnp.float32, scaleWH=None):
    """Build the runtime rotation components (small arrays) from the
    checkpoint key — done once, outside any hot loop.

    mode 'rht': {'u': (signs, left, right|()), 'v': ...} (permutation-free),
    plus 'vin' = signs_V / scaleWH — the diagonal un-scale and the V-side
    sign flip folded into ONE vector so the decode hot path pays a single
    VPU pass instead of two (docs/PERF.md round-2 roadmap item). Loaders of
    older checkpoints may lack 'vin'; qlinear_apply falls back to the
    two-pass form.
    butterfly modes: {'u': (blocks, perm_in, perm_out), 'v': ...}.
    """
    from quip_tpu.core import incoherence as inc

    if proj_key is None:
        return None
    ku, kv = jax.random.split(proj_key)
    if mode == "rht_sf":
        # sign-folded serving format: signs live in the packed codes
        # (fold_rht_signs), the rotation is the pure Kronecker map; the
        # only input-side diagonal left is 1/scaleWH (absent entirely
        # without rescale — zero VPU passes around the kernel then)
        U = inc.gen_rht(ku, m, dtype)
        V = inc.gen_rht(kv, d, dtype)
        return {
            "u": ((), U.left, () if U.right is None else U.right),
            "v": ((), V.left, () if V.right is None else V.right),
            "vin": (() if scaleWH is None
                    else 1.0 / scaleWH.astype(dtype)),
        }
    if mode == "rht_uf":
        # hybrid fold: U-side signs live in the code rows
        # (fold_rht_sign_rows); V-side signs stay inner and ride vin —
        # identical input pass to 'rht', zero output sign pass
        U = inc.gen_rht(ku, m, dtype)
        V = inc.gen_rht(kv, d, dtype)
        vin = V.signs if scaleWH is None \
            else V.signs / scaleWH.astype(V.signs.dtype)
        return {
            "u": ((), U.left, () if U.right is None else U.right),
            "v": (V.signs, V.left, () if V.right is None else V.right),
            "vin": vin,
        }
    if mode == "rht":
        U = inc.gen_rht(ku, m, dtype)
        V = inc.gen_rht(kv, d, dtype)
        vin = V.signs if scaleWH is None \
            else V.signs / scaleWH.astype(V.signs.dtype)
        return {
            "u": (U.signs, U.left, () if U.right is None else U.right),
            "v": (V.signs, V.left, () if V.right is None else V.right),
            "vin": vin,
        }
    U = inc.gen_butterfly(ku, m, mode, dtype)
    V = inc.gen_butterfly(kv, d, mode, dtype)
    return {
        "u": (U.blocks, U.perm_in, U.perm_out),
        "v": (V.blocks, V.perm_in, V.perm_out),
    }


def rot_to_butterflies(q: "PackedLinear", dtype=None):
    """Reconstruct (U, V) transform views over the stored arrays."""
    from quip_tpu.core.incoherence import RHT, Butterfly

    if q.proj_mode in ("rht", "rht_sf", "rht_uf"):
        us, ul, ur = q.rot["u"]
        vs, vl, vr = q.rot["v"]
        ur = None if (isinstance(ur, tuple) and not ur) else ur
        vr = None if (isinstance(vr, tuple) and not vr) else vr
        # rht_sf stores () sign slots: the signs live in the codes
        us = None if (isinstance(us, tuple) and not us) else us
        vs = None if (isinstance(vs, tuple) and not vs) else vs
        return (RHT(us, ul, ur, q.out_features),
                RHT(vs, vl, vr, q.in_features))
    ub, upi, upo = q.rot["u"]
    vb, vpi, vpo = q.rot["v"]
    if dtype is not None:
        ub = tuple(b.astype(dtype) for b in ub)
        vb = tuple(b.astype(dtype) for b in vb)
    return (Butterfly(tuple(ub), upi, upo, q.out_features),
            Butterfly(tuple(vb), vpi, vpo, q.in_features))


def fold_rht_signs(codes: jax.Array, proj_key, bits: int) -> jax.Array:
    """Fold the outer RHT sign vectors into qfn-b codes (proj_mode
    'rht_sf').

    The payload W₂ = diag(s_u) K_u W K_vᵀ diag(s_v) (outer-sign transform,
    incoherence.py): entry (i, j) of the SIGN-STRIPPED payload differs from
    W₂ by the factor s_u[i]·s_v[j], and the symmetric qfn-b grid negates
    exactly under c → maxq − c. Storing the stripped codes makes both
    decode-time rotations pure Kronecker dots — no sign passes
    (docs/PERF.md round-3 roadmap item 1). The cost is the format
    contract: checkpoints can no longer regenerate the *payload* signs
    from the PRNG key alone (the codes themselves carry them), which is
    why this is a distinct proj_mode, not a flag on 'rht'.
    """
    from quip_tpu.core import incoherence as inc

    m, d = codes.shape
    ku, kv = jax.random.split(proj_key)
    su = inc.gen_rht(ku, m, jnp.float32).signs
    sv = inc.gen_rht(kv, d, jnp.float32).signs
    neg = (su[:, None] * sv[None, :]) < 0
    return jnp.where(neg, (2**bits - 1) - codes, codes)


def fold_rht_sign_rows(codes: jax.Array, proj_key, bits: int) -> jax.Array:
    """Row-only fold for the hybrid 'rht_uf' mode: only the U-side signs
    are outer (the V-side stays inner and rides vin), so only code ROWS
    flip (see incoherence.py::rht_rotate_weight_uf)."""
    from quip_tpu.core import incoherence as inc

    m, _ = codes.shape
    ku, _ = jax.random.split(proj_key)
    su = inc.gen_rht(ku, m, jnp.float32).signs
    return jnp.where(su[:, None] < 0, (2**bits - 1) - codes, codes)


def pack_layer_result(res, bits: int,
                      bias: Optional[jax.Array] = None) -> PackedLinear:
    """Build a PackedLinear from a quantize_layer LayerQuantResult."""
    assert res.codes is not None, (
        "method produced no integer codes to pack (grouped grids "
        "(groupsize>0) quantize per-group and cannot be packed; use "
        "per-row grids)")
    codes = res.codes.astype(jnp.int32)
    m, d = codes.shape
    if res.preproc.proj_mode in ("rht_sf", "rht_uf") \
            and res.preproc.proj_key is not None:
        assert res.qfnb_scale is not None, \
            "sign folding needs the symmetric qfn-b grid (c -> maxq-c)"
        fold = (fold_rht_signs if res.preproc.proj_mode == "rht_sf"
                else fold_rht_sign_rows)
        codes = fold(codes, res.preproc.proj_key, bits)
    # qfn-b (scalar grid): pad out-features into the kernel's fast tile
    # band when the true m offers none (padded_m docstring). qfn-a keeps
    # exact m (its per-row scale/zero would need padding too).
    if res.qfnb_scale is not None:
        mp = padded_m(m, d, bits)
        if mp != m:
            codes = jnp.pad(codes, ((0, mp - m), (0, 0)))
    planes = pack_codes(codes, bits)
    st = res.preproc
    return PackedLinear(
        planes,
        res.grid.scale if res.grid is not None else None,
        res.grid.zero if res.grid is not None else None,
        res.qfnb_scale,
        st.scaleWH,
        st.proj_key,
        bias,
        bits=bits,
        qfn="b" if res.qfnb_scale is not None else "a",
        proj_mode=st.proj_mode,
        out_features=m,
        in_features=d,
        rot=materialize_rotation(st.proj_key, m, d, st.proj_mode,
                                 scaleWH=st.scaleWH),
    )
