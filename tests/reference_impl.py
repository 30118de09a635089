"""Independent NumPy re-statements of the reference algorithms, used as test
oracles.

These are deliberately naive, column-by-column transcriptions of the math in
/root/reference/vector_balance.py and quant.py (cited per function) — NOT the
production implementations — so the blocked/scanned TPU kernels in
quip_tpu.core can be checked against straight-line semantics.
"""
import numpy as np


def ldl_factor_np(H):
    """vector_balance.py:171-173."""
    C = np.linalg.cholesky(H)
    L = C @ np.diag(1.0 / np.diag(C))
    return L - np.eye(H.shape[0])


def round_ldl_np(w, H, nbits, eta=None):
    """The unblocked LDLQ recurrence (vector_balance.py:155-181), no greedy."""
    m, d = w.shape
    L = ldl_factor_np(H)
    if eta is None:
        eta = 0.5 * np.ones_like(w)
    w_hat = w.copy()
    for i in reversed(range(d)):
        w_hat[:, i] = np.clip(
            np.floor(w[:, i] + (w[:, i:] - w_hat[:, i:]) @ L[i:, i]
                     + eta[:, i]),
            0, 2**nbits - 1,
        )
    return w_hat


def greedy_pass_np(wr, s, Hn, nbits, reverse=True):
    """One greedy sweep (vector_balance.py:186-196 order for reverse=True,
    vector_balance.py:62-72 for reverse=False). Mutates/returns copies."""
    m, d = wr.shape
    wr = wr.copy()
    s = s.copy()
    order = reversed(range(d)) if reverse else range(d)
    for i in order:
        Hs = s @ Hn[:, i]
        eps = wr[:, i] - np.round(wr[:, i] - Hs / Hn[i, i])
        wr[:, i] -= eps
        s[:, i] -= eps
    return wr, s


def round_ldl_greedy_np(w, H, nbits, npasses):
    """Full round_ldl with greedy passes (vector_balance.py:155-199)."""
    w_hat = round_ldl_np(w, H, nbits)
    wr = w_hat.copy()
    s = w_hat - w
    Hn = H / np.diag(H).max()
    for _ in range(npasses):
        wr, s = greedy_pass_np(wr, s, Hn, nbits, reverse=True)
        wr = np.clip(wr, 0, 2**nbits - 1)
        if (w_hat == wr).all():
            break
        w_hat = wr.copy()
    return wr


def round_allbal_np(w, H, nbits, npasses):
    """vector_balance.py:36-78 (biased path)."""
    m, d = w.shape
    wr = w.copy()
    s = np.zeros_like(w)
    w_hat = wr.copy()
    Hn = H / np.diag(H).max()
    for _ in range(npasses):
        for i in range(d):
            Hs = s @ Hn[:, i]
            eps = wr[:, i] - np.round(wr[:, i] - Hs / Hn[i, i])
            wr[:, i] -= eps
            s[:, i] -= eps
        wr = np.clip(wr, 0, 2**nbits - 1)
        if (w_hat == wr).all():
            break
        w_hat = wr.copy()
    return wr


def round_gptqequiv_np(w, H, nbits):
    """vector_balance.py:381-422."""
    m, d = w.shape
    Hf = H[::-1, ::-1].copy()
    L = np.linalg.cholesky(Hf)
    L = L[::-1, ::-1].copy()
    L = L @ np.diag(1.0 / np.diag(L))
    L = L - np.eye(d)
    eta = 0.5 * np.ones_like(w)
    w_hat = w.copy()
    for i in range(d):
        w_hat[:, i] = np.clip(
            np.floor(w[:, i] + (w[:, :i + 1] - w_hat[:, :i + 1]) @ L[:i + 1, i]
                     + eta[:, i]),
            0, 2**nbits - 1,
        )
    return w_hat


def gptq_np(W, H, scale, zero, maxq, blocksize=128, qfn="c"):
    """gptq.py:19-116 with qfn-a/c per-channel quantizer."""
    W = W.copy()
    m, d = W.shape
    C = np.linalg.cholesky(H)
    Hinv = np.linalg.inv(C.T) @ np.linalg.inv(C)
    Hinv = (Hinv + Hinv.T) / 2
    U = np.linalg.cholesky(Hinv).T
    Q = np.zeros_like(W)
    for i1 in range(0, d, blocksize):
        i2 = min(i1 + blocksize, d)
        count = i2 - i1
        W1 = W[:, i1:i2].copy()
        Q1 = np.zeros_like(W1)
        Err1 = np.zeros_like(W1)
        U1 = U[i1:i2, i1:i2]
        for i in range(count):
            w = W1[:, i]
            dcoef = U1[i, i]
            if qfn == "a":
                q = np.clip(np.round(w / scale[:, 0]) + zero[:, 0], 0, maxq)
            else:  # 'c'
                q = np.round(np.clip(w / scale[:, 0] + zero[:, 0], 0, maxq))
            q = scale[:, 0] * (q - zero[:, 0])
            Q1[:, i] = q
            err = (w - q) / dcoef
            W1[:, i:] -= err[:, None] * U1[i, i:][None, :]
            Err1[:, i] = err
        Q[:, i1:i2] = Q1
        W[:, i2:] -= Err1 @ U[i1:i2, i2:]
    return Q


def quantize_qfna_np(x, scale, zero, maxq):
    q = np.clip(np.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def find_params_qfna_np(x, bits, sym=False):
    """Per-channel weight grid (quant.py:57-136, perchannel path)."""
    maxq = 2**bits - 1
    xr = x.reshape(x.shape[0], -1)
    xmin = np.minimum(xr.min(axis=1), 0)
    xmax = np.maximum(xr.max(axis=1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg] = -1
    xmax[deg] = 1
    scale = (xmax - xmin) / maxq
    if sym:
        zero = np.full_like(scale, (maxq + 1) / 2)
    else:
        zero = np.round(-xmin / scale)
    return scale[:, None], zero[:, None], maxq
