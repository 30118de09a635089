"""Analysis / verification tools.

Capability parity with the reference analysis scripts (SURVEY.md §2.4):
  * Hessian saving     — opt_saveH.py (driver.save_hessians + npz IO here)
  * proxy-loss eval    — opt_proxy.py:227-263 (quantize selected layers from
                         saved Hessians, report avg tr(ΔW H ΔWᵀ))
  * Hessian summary    — compute_Hsummary.py:18-31 (tr(D)/tr(H), rank at
                         rtol {0, 0.01}, incoherence μ)
  * OPTQ ≡ LDLQ check  — optq_ldlq_equiv.py (runnable form of the
                         tests/test_equivalence.py property)
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def save_hessians_npz(path: str, hessians: Dict[str, jax.Array]) -> None:
    """Write per-layer Hessians (opt_saveH.py:165-166 saved .pt per layer;
    here one npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in hessians.items()})


def load_hessians_npz(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}


def hessian_summary(H, percdamp: float = 0.01) -> Tuple[float, float, float,
                                                        float]:
    """(tr(D)/tr(H), rank/n @rtol0, rank/n @rtol0.01, incoherence μ) —
    compute_Hsummary.py:18-31."""
    H = jnp.asarray(H, jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.asarray(H, jnp.float32)
    n = H.shape[0]
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(n, dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    D = jnp.square(jnp.diagonal(L))
    a = float(jnp.sum(D) / jnp.trace(H))
    sv = jnp.linalg.svd(H, compute_uv=False)
    eps = jnp.finfo(H.dtype).eps
    k00 = float(jnp.sum(sv > sv[0] * n * eps) / n)
    k01 = float(jnp.sum(sv > sv[0] * 0.01) / n)
    _, Q = jnp.linalg.eigh(H)
    mu = float(jnp.max(jnp.abs(Q)) * np.sqrt(n))
    return a, k00, k01, mu


def eigenspectrum_csv(path: str, hessians: Dict[str, np.ndarray],
                      percdamp: float = 0.01) -> None:
    """Per-Hessian eigenvalue spectra as CSV, one column per layer
    (compute_Hsummary.py:72-83 parity; descending eigenvalues)."""
    cols = {}
    for name, H in hessians.items():
        H = np.asarray(H, np.float64)
        n = H.shape[0]
        Hd = H + percdamp * np.mean(np.diag(H)) * np.eye(n)
        ev = np.linalg.eigvalsh(Hd)[::-1]
        cols[name] = ev
    width = max(len(v) for v in cols.values())
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(",".join(cols.keys()) + "\n")
        for i in range(width):
            f.write(",".join(
                f"{v[i]:.8g}" if i < len(v) else "" for v in cols.values())
                + "\n")


def hessian_summary_sweep(hessians: Dict[str, np.ndarray],
                          percdamp: float = 0.01,
                          pickle_path: Optional[str] = None) -> dict:
    """Summary stats over a set of Hessians; optional pickle dump
    (compute_Hsummary.py:33-57 folder sweep + pickle parity)."""
    rows = {name: hessian_summary(H, percdamp)
            for name, H in hessians.items()}
    if pickle_path:
        import pickle

        os.makedirs(os.path.dirname(pickle_path) or ".", exist_ok=True)
        with open(pickle_path, "wb") as f:
            pickle.dump(rows, f)
    return rows


def proxy_eval(
    params,
    cfg,
    hessians: Dict[str, np.ndarray],
    qcfg,
    key: jax.Array,
    layer_indices: Optional[List[int]] = None,
    layer_names: Optional[List[str]] = None,
) -> Dict[str, float]:
    """Quantize selected layers against saved Hessians; return per-layer
    proxy losses (opt_proxy.py semantics: no model forward needed)."""
    from quip_tpu.models import model as M
    from quip_tpu.quantize.pipeline import quantize_layer
    from quip_tpu.utils import name_salt as _name_salt

    specs = M.linear_specs(cfg)
    out: Dict[str, float] = {}
    blocks = params["blocks"]
    for li in range(cfg.n_layers):
        if layer_indices is not None and li not in layer_indices:
            continue
        layer = jax.tree.map(lambda x: x[li], blocks)
        for spec in specs:
            if layer_names is not None and spec.name not in layer_names:
                continue
            name = f"layers.{li}.{spec.name}"
            if name not in hessians:
                continue
            W = layer
            for k in spec.path:
                W = W[k]
            lkey = jax.random.fold_in(key, _name_salt(name))
            res = quantize_layer(W.T, jnp.asarray(hessians[name]), qcfg,
                                 lkey)
            out[name] = float(res.error)
    return out


def optq_ldlq_equivalence_check(m: int = 256, d: int = 256,
                                bits: int = 4, seed: int = 0) -> dict:
    """Runnable LDLQ ≡ OPTQ check on a synthetic layer
    (optq_ldlq_equiv.py:9-96). Returns agreement stats."""
    from quip_tpu.core import gptq as gptq_mod
    from quip_tpu.core import grid as grid_mod
    from quip_tpu.core import ldlq

    rng = np.random.default_rng(seed)
    W = rng.standard_normal((m, d))
    X = rng.standard_normal((4 * d, d))
    H = X.T @ X / (4 * d) + 0.01 * np.eye(d)
    Wj, Hj = jnp.asarray(W), jnp.asarray(H)

    g = grid_mod.find_params_qfna(Wj, bits, perchannel=True, sym=False)
    q_gptq = np.asarray(gptq_mod.gptq_round(Wj, Hj, g, qfn="c"))
    Wg = Wj / g.scale + g.zero
    wq = ldlq.round_ldl_gptqequiv(Wg, Hj, bits)
    q_ldl = np.asarray(g.scale * (wq - g.zero))
    q_near = np.asarray(grid_mod.quantize_qfna(Wj, g.scale, g.zero, g.maxq))

    diff = np.abs(q_gptq - q_ldl)
    return {
        "max_diff": float(diff.max()),
        "avg_diff": float(diff.mean()),
        "frac_agree_1e6": float((diff < 1e-6).mean()),
        "proxy_gptq": float(ldlq.hessian_loss(jnp.asarray(q_gptq) - Wj, Hj)),
        "proxy_ldlq": float(ldlq.hessian_loss(jnp.asarray(q_ldl) - Wj, Hj)),
        "proxy_nearest": float(
            ldlq.hessian_loss(jnp.asarray(q_near) - Wj, Hj)),
    }
