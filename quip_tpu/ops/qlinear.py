"""Quantized-linear forward: the full incoherence-aware inference op.

y = x @ Ŵᵀ with Ŵ = diag(1/s) is folded into the activation path:

    Ŵ = Uᵀ Ŵ₂ V · diag(1/s)   (postproc, method.py:195-214)
 => y = ((x / s) @ Vᵀ) @ Ŵ₂ᵀ @ U

Steps: diagonal un-scale (VPU) -> butterfly Vᵀ (two tiny batched matmuls)
-> fused packed dequant-matmul (Pallas, kernels/dequant_matmul.py) ->
butterfly U. The dense rotated weights are never materialized — this is the
"fused unpack -> un-rotate -> dequant -> GEMM" design from SURVEY.md §2.5.

The reference has no equivalent: its packed path (quant.py:222-233) only ran
single-token through an external CUDA op and stored *unrotated* qfn-a grids.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quip_tpu.core import incoherence as inc
from quip_tpu.kernels.dequant_matmul import dequant_matmul, dequant_matmul_ref
from quip_tpu.pack.format import PackedLinear


def _kernel_interpret() -> bool:
    """QUIP_KERNEL_INTERPRET=1: run the Pallas kernel in interpret mode on
    CPU — the virtual-mesh way to exercise/compile the REAL kernel path
    (incl. its SPMD partitioning rules) without a TPU. Used by
    cli/commreport.py and the sharding tests."""
    import os
    return os.environ.get("QUIP_KERNEL_INTERPRET") == "1"


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu" or _kernel_interpret()


def _fused_rht_enabled() -> bool:
    import os
    return os.environ.get("QUIP_FUSED_RHT") == "1"


def _packed_matmul(q: PackedLinear, x2: jax.Array, tile_m: Optional[int],
                   use_kernel: Optional[bool]) -> jax.Array:
    """x2 (B, d) @ Ŵ₂ᵀ via the fused kernel (TPU) or jnp reference (CPU)."""
    use = _use_pallas() if use_kernel is None else use_kernel
    scale = q.scale_b if q.qfn == "b" else q.scale
    zero = None if q.qfn == "b" else q.zero
    m_planes = q.planes[0].shape[-1]       # may exceed out_features (padded_m)
    if use:
        B = x2.shape[0]
        pad = (-B) % 8
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        tm = None if tile_m is None else min(tile_m, m_planes)
        interp = _kernel_interpret() and jax.default_backend() != "tpu"
        out = dequant_matmul(x2, q.planes, scale, zero, bits=q.bits,
                             qfn=q.qfn, tile_m=tm, interpret=interp,
                             partitioned=None if not interp else True,
                             code_bits=q.code_bits)
    else:
        out = dequant_matmul_ref(x2, q.planes, scale, zero, bits=q.bits,
                                 qfn=q.qfn, code_bits=q.code_bits)
        pad = 0
    if m_planes != q.out_features:
        out = out[:, : q.out_features]     # padded_m tiling rows are dead
    return out[: x2.shape[0] - pad] if pad else out


def qlinear_apply(q: PackedLinear, x: jax.Array, *,
                  tile_m: Optional[int] = None,
                  use_kernel: Optional[bool] = None) -> jax.Array:
    """Apply a packed quantized linear to x (..., in_features)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    assert d == q.in_features, (d, q.in_features)
    x2 = x.reshape(-1, d)
    use = _use_pallas() if use_kernel is None else use_kernel

    if use and q.proj_mode == "rht" and q.proj_key is not None \
            and q.rot is not None and x2.shape[0] <= 32 \
            and _fused_rht_enabled():
        # fused-launch RHT path: ONE Pallas op per rotation (signs + both
        # Kronecker dots + the scaleWH fold) instead of ~5 XLA ops.
        # MEASURED SLOWER on the v5e relay (151 vs 169 tok/s headline,
        # docs/PERF.md round 2): a Pallas launch costs more than the small
        # XLA op chain it replaces. Kept behind QUIP_FUSED_RHT=1 for
        # runtimes with cheaper kernel launch; default OFF.
        from quip_tpu.kernels.rht import rht_apply_fused
        from quip_tpu.pack.format import rot_to_butterflies

        U, V = rot_to_butterflies(q, dtype=x2.dtype)
        B = x2.shape[0]
        pad = (-B) % 8
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        vec_v = V.signs if q.scaleWH is None \
            else V.signs / q.scaleWH.astype(V.signs.dtype)
        x2 = rht_apply_fused(x2, vec_v, V.left, V.right)
        t = _packed_matmul(q, x2, tile_m, use)
        y = rht_apply_fused(t, U.signs, U.left, U.right, transpose=True)
        if pad:
            y = y[:B]
        if q.bias is not None:
            y = y + q.bias.astype(y.dtype)
        return y.reshape(*lead, q.out_features)

    # Folded fast path (serving default): rot carries vin = signs_V/scaleWH,
    # so the diagonal un-scale + V-side sign flip are ONE VPU pass. Swapping
    # vin in as the RHT signs vector is exact up to dtype rounding.
    # proj_mode 'rht_sf' goes further: the signs are folded into the packed
    # CODES (pack/format.py::fold_rht_signs), U/V carry signs=None (the
    # Kronecker dots alone), and vin reduces to 1/scaleWH — or nothing.
    folded = (q.proj_mode in ("rht", "rht_sf", "rht_uf")
              and q.rot is not None
              and isinstance(q.rot, dict) and "vin" in q.rot)
    if q.scaleWH is not None and not folded:
        x2 = x2 / q.scaleWH.astype(x2.dtype)[None, :]

    if q.proj_key is not None:
        if q.rot is not None:
            from quip_tpu.pack.format import rot_to_butterflies
            U, V = rot_to_butterflies(q, dtype=x2.dtype)
            if folded:
                vin = q.rot["vin"]
                if isinstance(vin, tuple) and not vin:
                    vin = None         # rht_sf without rescale: no pass
                V = V._replace(signs=vin)
        else:
            # fallback: regenerate from the key. NOTE: inside a jitted hot
            # loop this puts QR sampling on the device per call — always
            # materialize `rot` for serving (pack_layer_result does).
            ku, kv = jax.random.split(q.proj_key)
            if q.proj_mode in ("rht", "rht_sf", "rht_uf"):
                U = inc.gen_rht(ku, q.out_features, x2.dtype)
                V = inc.gen_rht(kv, q.in_features, x2.dtype)
                if q.proj_mode == "rht_sf":
                    # codes already carry the signs
                    U = U._replace(signs=None)
                    V = V._replace(signs=None)
                elif q.proj_mode == "rht_uf":
                    # only the U-side signs live in the code rows
                    U = U._replace(signs=None)
            else:
                U = inc.gen_butterfly(ku, q.out_features, q.proj_mode,
                                      x2.dtype)
                V = inc.gen_butterfly(kv, q.in_features, q.proj_mode,
                                      x2.dtype)
        if q.proj_mode in ("rht", "rht_sf", "rht_uf"):
            x2 = inc.apply_rht(V, x2, axis=-1)            # x @ Vᵀ
            t = _packed_matmul(q, x2, tile_m, use_kernel)
            y = inc.apply_rht(U, t, axis=-1, transpose=True)  # @ U
        else:
            x2 = inc.apply_butterfly(V, x2, axis=-1)      # x @ Vᵀ
            t = _packed_matmul(q, x2, tile_m, use_kernel)
            y = inc.apply_butterfly(U, t, axis=-1,
                                    transpose=True)       # @ U
    else:
        y = _packed_matmul(q, x2, tile_m, use_kernel)

    if q.bias is not None:
        y = y + q.bias.astype(y.dtype)
    return y.reshape(*lead, q.out_features)


def linear_apply(w, x: jax.Array) -> jax.Array:
    """Dense-or-packed dispatch: the model code path calls this for every
    projection so a quantized model is just the same param tree with
    PackedLinear leaves. ActQuant wrappers (ops/actquant.py — reference
    ActQuantWrapper parity) quantize the activations first, then recurse."""
    from quip_tpu.ops.actquant import ActQuant
    if isinstance(w, ActQuant):
        return linear_apply(w.inner, w.quantize(x))
    if isinstance(w, PackedLinear):
        return qlinear_apply(w, x)
    return x @ w
