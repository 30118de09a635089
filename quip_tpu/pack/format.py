"""Packed int2/3/4/8 weight format, TPU-first.

Replaces the reference's CUDA-oriented bit-packing (Quant3Linear.pack,
/root/reference/quant.py:185-220, zeroShot/models/quant.py:183-212) with a
lane-friendly layout designed for vectorized unpack inside a Pallas kernel:

  * Codes are packed along the fan-in (d) axis, **slab-major**: 32-bit word j
    of a row holds code columns {b*nwords + j : b in 0..codes_per_word-1} in
    bit-fields [bits*b, bits*(b+1)). Unpacking is then `codes_per_word`
    shift+mask ops, each yielding a *contiguous* (m, nwords) column slab —
    no cross-lane interleave, no gathers (cf. the reference's 10×3-bit+spill
    row-triplet format which needs serial bit surgery, quant.py:197-217).
  * 3-bit uses two planes (low 2 bits + high bit), each slab-major, keeping
    every plane power-of-two packed.
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


def _pack_plane(codes: jax.Array, bits: int) -> jax.Array:
    """Pack (m, d) integer codes (< 2**bits, bits in {1,2,4,8}) into
    (m, d*bits//32) int32, slab-major."""
    m, d = codes.shape
    cpw = 32 // bits                      # codes per word
    assert d % cpw == 0, f"d={d} must be divisible by {cpw}"
    nw = d // cpw
    c = codes.astype(jnp.uint32).reshape(m, cpw, nw)
    word = jnp.zeros((m, nw), jnp.uint32)
    for b in range(cpw):
        word = word | (c[:, b, :] << (bits * b))
    return word.astype(jnp.int32)


def _unpack_plane(words: jax.Array, bits: int, d: int) -> jax.Array:
    """Inverse of _pack_plane -> (m, d) int32 codes."""
    cpw = 32 // bits
    nw = d // cpw
    w = words.astype(jnp.uint32)
    mask = jnp.uint32(2**bits - 1)
    slabs = [((w >> (bits * b)) & mask) for b in range(cpw)]
    return jnp.concatenate(slabs, axis=1).astype(jnp.int32)


def pack_codes(codes: jax.Array, bits: int) -> Tuple[jax.Array, ...]:
    """Pack integer grid codes. Returns a tuple of int32 planes:
    one plane for bits in {2, 4, 8}; (low2, high1) planes for 3-bit."""
    if bits in (2, 4, 8):
        return (_pack_plane(codes, bits),)
    if bits == 3:
        lo = codes & 3
        hi = (codes >> 2) & 1
        return (_pack_plane(lo, 2), _pack_plane(hi, 1))
    raise ValueError(f"unsupported bit width {bits}")


def unpack_codes(planes: Tuple[jax.Array, ...], bits: int, d: int) -> jax.Array:
    if bits in (2, 4, 8):
        return _unpack_plane(planes[0], bits, d)
    if bits == 3:
        lo = _unpack_plane(planes[0], 2, d)
        hi = _unpack_plane(planes[1], 1, d)
        return lo | (hi << 2)
    raise ValueError(f"unsupported bit width {bits}")


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
                 out_features: int, in_features: int, rot=None):
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
               self.in_features)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        planes, scale, zero, scale_b, scaleWH, proj_key, bias, rot = children
        bits, qfn, proj_mode, m, d = aux
        return cls(planes, scale, zero, scale_b, scaleWH, proj_key, bias,
                   bits=bits, qfn=qfn, proj_mode=proj_mode,
                   out_features=m, in_features=d, rot=rot)

    @property
    def maxq(self) -> float:
        return float(2**self.bits - 1)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Reconstruct the dense Ŵ (m, d) in the original space — the
        packed-checkpoint -> dense path (load_quant3 parity, opt.py:318-348)."""
        from quip_tpu.core import incoherence as inc

        codes = unpack_codes(self.planes, self.bits, self.in_features)
        codes = codes.astype(dtype)
        if self.qfn == "b":
            W = ((codes / self.maxq) * 2 - 1) * self.scale_b.astype(dtype)
        else:
            W = self.scale.astype(dtype) * (codes - self.zero.astype(dtype))
        if self.proj_key is not None:
            if self.rot is not None:
                U, V = rot_to_butterflies(self, dtype=dtype)
            elif self.proj_mode == "rht":
                ku, kv = jax.random.split(self.proj_key)
                U = inc.gen_rht(ku, self.out_features, dtype)
                V = inc.gen_rht(kv, self.in_features, dtype)
            else:
                ku, kv = jax.random.split(self.proj_key)
                U = inc.gen_butterfly(ku, self.out_features, self.proj_mode,
                                      dtype)
                V = inc.gen_butterfly(kv, self.in_features, self.proj_mode,
                                      dtype)
            if self.proj_mode == "rht":
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


def materialize_rotation(proj_key, m: int, d: int, mode: str,
                         dtype=jnp.float32):
    """Build the runtime rotation components (small arrays) from the
    checkpoint key — done once, outside any hot loop.

    mode 'rht': {'u': (signs, left, right|()), 'v': ...} (permutation-free).
    butterfly modes: {'u': (blocks, perm_in, perm_out), 'v': ...}.
    """
    from quip_tpu.core import incoherence as inc

    if proj_key is None:
        return None
    ku, kv = jax.random.split(proj_key)
    if mode == "rht":
        U = inc.gen_rht(ku, m, dtype)
        V = inc.gen_rht(kv, d, dtype)
        return {
            "u": (U.signs, U.left, () if U.right is None else U.right),
            "v": (V.signs, V.left, () if V.right is None else V.right),
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

    if q.proj_mode == "rht":
        us, ul, ur = q.rot["u"]
        vs, vl, vr = q.rot["v"]
        ur = None if (isinstance(ur, tuple) and not ur) else ur
        vr = None if (isinstance(vr, tuple) and not vr) else vr
        return (RHT(us, ul, ur, q.out_features),
                RHT(vs, vl, vr, q.in_features))
    ub, upi, upo = q.rot["u"]
    vb, vpi, vpo = q.rot["v"]
    if dtype is not None:
        ub = tuple(b.astype(dtype) for b in ub)
        vb = tuple(b.astype(dtype) for b in vb)
    return (Butterfly(tuple(ub), upi, upo, q.out_features),
            Butterfly(tuple(vb), vpi, vpo, q.in_features))


def pack_layer_result(res, bits: int,
                      bias: Optional[jax.Array] = None) -> PackedLinear:
    """Build a PackedLinear from a quantize_layer LayerQuantResult."""
    assert res.codes is not None, "method produced no integer codes"
    codes = res.codes.astype(jnp.int32)
    m, d = codes.shape
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
        rot=materialize_rotation(st.proj_key, m, d, st.proj_mode),
    )
