"""Per-layer quantization pipeline: preproc -> grid -> round -> postproc.

The single pure-function entry replacing the reference's QuantMethod class
hierarchy (Balance bal.py:13-48, Nearest near.py:5-20, GPTQ gptq.py:17-116)
and the rounding dispatcher quantize_weight_vecbal
(vector_balance.py:499-532).

Everything is jit-able; quantizing a stack of same-shaped layers is just
``jax.vmap(quantize_layer_fn)`` over (W, H, key).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quip_tpu.core import grid as grid_mod
from quip_tpu.core import hessian as hess
from quip_tpu.core import ldlq
from quip_tpu.core.gptq import gptq_round
from quip_tpu.core.grid import GridParams
from quip_tpu.quantize.config import QuantConfig


class LayerQuantResult(NamedTuple):
    """Everything produced by quantizing one linear layer."""

    W_hat: jax.Array                 # dequantized weights, original space
    codes: Optional[jax.Array]       # integer grid codes (rotated space), uint8
    grid: Optional[GridParams]       # grid parameters used
    qfnb_scale: Optional[jax.Array]  # scalar scale for qfn-b (None otherwise)
    preproc: hess.PreprocState       # inverse-state (keys/scales only)
    error: jax.Array                 # proxy loss tr(ΔW H ΔWᵀ) in rotated space
    Hmag: jax.Array                  # max |H| after preproc (method.py:233)


def _round_on_grid(key, Wg, H, cfg: QuantConfig):
    """Dispatch to the adaptive-rounding solvers (vector_balance.py:426-496)."""
    m = cfg.method
    if m == "ldlq":
        return ldlq.round_ldl(Wg, H, cfg.wbits, cfg.npasses, cfg.unbiased,
                              key, cfg.blocksize)
    if m == "ldlqRG":
        return ldlq.round_ldlqRG(Wg, H, cfg.wbits, cfg.npasses, cfg.unbiased,
                                 key, cfg.blocksize)
    if m == "allbal":
        return ldlq.round_allbal_sorted(Wg, H, cfg.wbits, cfg.npasses,
                                        cfg.unbiased, key, cfg.blocksize)
    if m == "ldlbal_admm":
        return ldlq.round_ldl_admm_sorted(Wg, H, cfg.wbits, cfg.npasses,
                                          cfg.unbiased, key)
    if m == "ldl_gptqequiv":
        return ldlq.round_ldl_gptqequiv(Wg, H, cfg.wbits, cfg.unbiased, key,
                                        cfg.blocksize)
    if m == "nearest":
        return ldlq.round_nearest(Wg, cfg.wbits)
    raise ValueError(f"method {cfg.method!r} is not a grid solver")


def quantize_layer(
    W: jax.Array,
    H: jax.Array,
    cfg: QuantConfig,
    key: jax.Array,
) -> LayerQuantResult:
    """Quantize one (m, d) weight matrix against its (d, d) proxy Hessian.

    Follows the reference lifecycle (opt.py:150-170):
      preproc (method.py:125-193) -> find grid params -> adaptive rounding
      (vector_balance.py:499-532 / gptq.py:19-116) -> postproc
      (method.py:195-214) -> proxy error (method.py:228-233).
    """
    from quip_tpu.core.incoherence import raw_key

    kproj, kround = jax.random.split(raw_key(key))
    # TPU matmuls default to bf16 passes; the solver's Cholesky/error
    # recurrences need true f32 (NaNs otherwise — verified on v5e)
    with jax.default_matmul_precision("float32"):
        return _quantize_layer_inner(W, H, cfg, kproj, kround)


def _quantize_layer_inner(W, H, cfg, kproj, kround):
    W0 = W.astype(jnp.float32) if W.dtype == jnp.bfloat16 else W
    H = H.astype(W0.dtype)

    pp = cfg.preproc
    Wp, Hp, state = hess.preproc(
        W0, H,
        rescale=pp.rescale,
        proj=pp.proj,
        proj_key=kproj,
        proj_mode=pp.proj_mode,
        gptqH=pp.gptqH,
        percdamp=pp.percdamp,
    )

    maxq = jnp.asarray(2**cfg.wbits - 1, dtype=Wp.dtype)
    codes = None
    gp: Optional[GridParams] = None
    scale_b = None

    if cfg.method in ("gptq", "trueobs"):
        # "trueobs" is the reference's standalone TrueOBS solver
        # (zeroShot/models/fast_trueobs.py:59-165). Its inner loop IS the
        # blocked OPTQ recursion (same per-column quantize + error feedback
        # through the inverse-Cholesky factor); the differences are:
        #   * the fp-outlier escape ON by default (sparseout, threshold
        #     0.25·scale² — fast_trueobs.py:108,134-139), and
        #   * running-average Hessian accumulation (fast_trueobs.py:52-56):
        #     H_avg = (2/N)·ΣxxT ∝ H_sum, and the recursion is invariant to
        #     scaling H (U -> U/√c, err·U rows unchanged; percdamp uses
        #     mean(diag), also scale-free), so the sum-form H used everywhere
        #     in this framework yields the identical result
        #     (tests/test_trueobs.py proves this against the torch file).
        sparse = cfg.sparse_outlier
        if cfg.method == "trueobs" and sparse == 0.0:
            sparse = 0.25
        if cfg.qfn in ("a", "c"):
            gp = grid_mod.find_params_qfna(Wp, cfg.wbits, perchannel=True,
                                           sym=False)
        else:  # qfn 'b': per-column scale computed inside the solver
            gp = GridParams(scale=jnp.ones((Wp.shape[0], 1), Wp.dtype),
                            zero=jnp.zeros((Wp.shape[0], 1), Wp.dtype),
                            maxq=maxq)
        What_p = gptq_round(Wp, Hp, gp, cfg.qfn, cfg.blocksize, cfg.groupsize,
                            sparse_outlier=sparse)
        if cfg.qfn in ("a", "c") and cfg.groupsize == -1 and sparse == 0.0:
            # recover integer codes from the grid for packing (the
            # reference's pack path does the same inversion, quant.py:190-191)
            # — undefined when fp outliers were kept (mixed sparse+quant
            # layers stay dense, as in the reference)
            codes = jnp.clip(jnp.round(What_p / gp.scale + gp.zero), 0, maxq)
    elif cfg.qfn == "a":
        gp = grid_mod.find_params_qfna(Wp, cfg.wbits, perchannel=True,
                                       sym=False)
        if cfg.method == "ldl_gptqequiv":
            # reference skips the pre-clamp for the equivalence path
            # (vector_balance.py:510-513)
            Wg = Wp / gp.scale + gp.zero
        else:
            Wg = grid_mod.to_grid_qfna(Wp, gp)
        Wq = _round_on_grid(kround, Wg, Hp, cfg)
        codes = Wq
        What_p = grid_mod.from_grid_qfna(Wq, gp)
    elif cfg.qfn == "b":
        scale_b = grid_mod.qfnb_scale(Wp)      # 2.4·RMS after preproc
        if cfg.method == "nearest":
            What_p = grid_mod.quantize_qfnb(Wp, scale_b, maxq)
            codes = jnp.clip(
                jnp.round(((Wp / scale_b + 1) / 2) * maxq), 0, maxq
            )
        else:
            Wg = grid_mod.to_grid_qfnb(Wp, scale_b, maxq)
            Wq = _round_on_grid(kround, Wg, Hp, cfg)
            codes = Wq
            What_p = grid_mod.from_grid_qfnb(Wq, scale_b, maxq)
    elif cfg.qfn == "c":
        gp = grid_mod.find_params_qfna(Wp, cfg.wbits, perchannel=True,
                                       sym=False)
        What_p = grid_mod.quantize_qfnc(Wp, gp.scale, gp.zero, maxq)
        codes = jnp.round(jnp.clip(Wp / gp.scale + gp.zero, 0, maxq))
    else:
        raise ValueError(f"unsupported qfn {cfg.qfn!r}")

    # Proxy loss in the preprocessed space: tr(ΔW Hp ΔWᵀ). By orthogonal
    # invariance this equals the loss in original space against the damped H.
    # (The reference's error_compute mixes rotated ΔW with the un-rotated H —
    # method.py:228-233 after bal.py:44-48 — a quirk we do not replicate.)
    dW = Wp - What_p
    error = ldlq.hessian_loss(dW, Hp)
    Hmag = jnp.max(Hp)

    What, _ = hess.postproc(What_p, Hp, state)
    What = What.astype(W.dtype)

    codes_u8 = None
    if codes is not None:
        codes_u8 = codes.astype(jnp.uint8)

    return LayerQuantResult(
        W_hat=What,
        codes=codes_u8,
        grid=gp,
        qfnb_scale=scale_b,
        preproc=state,
        error=error,
        Hmag=Hmag,
    )
