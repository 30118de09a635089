"""Flash vs dense prefill attention: on-chip parity + timing (run ALONE).

VERDICT r1 item 5: the dense path materializes (B, H, S, L) f32 logits —
memory-gated past 2-4k ctx. kernels/flash_attn.py replaces it for
prefill. This script checks numeric parity on the real chip at 512 ctx
(dense still fits) and times full-model prefill at 2k/4k/8k with the
kernel on vs off (QUIP_FLASH_PREFILL).

Methodology: whole-forward wall time over chained calls, hard host-read
sync (docs/PERF.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_forward(params, cfg, S, iters=4):
    from quip_tpu.models import model as M

    tokens = jnp.zeros((1, S), jnp.int32)
    fwd = jax.jit(lambda p, t: M.forward(p, t, cfg)[:, -1, :])
    out = fwd(params, tokens)
    float(out[0, 0])                       # compile + hard sync
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, tokens)
    float(out[0, 0])
    return (time.time() - t0) / iters


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M

    # ---- parity on chip (both paths executable at 512 ctx) ----------
    cfg = replace(get_config("llama-2-7b"), n_layers=2, dtype="bfloat16")
    params = _packed_llama(cfg, bits=2, seed=0)
    tokens = jnp.zeros((1, 512), jnp.int32) + 7

    os.environ["QUIP_FLASH_PREFILL"] = "0"
    dense = jax.jit(lambda p, t: M.forward(p, t, cfg))(params, tokens)
    dense = np.asarray(dense, np.float32)
    os.environ["QUIP_FLASH_PREFILL"] = "1"
    flash = jax.jit(lambda p, t: M.forward(p, t, cfg))(params, tokens)
    flash = np.asarray(flash, np.float32)
    err = np.max(np.abs(flash - dense)) / (np.max(np.abs(dense)) + 1e-9)
    print(f"parity(512 ctx, 2-layer 7B shapes): rel err {err:.2e}",
          flush=True)
    assert err < 3e-2, err
    del params

    # ---- timing, full 32-layer model ---------------------------------
    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16",
                  max_seq=8192)
    params = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    for S in (2048, 4096, 8192):
        row = {}
        for flag in ("1", "0"):
            os.environ["QUIP_FLASH_PREFILL"] = flag
            try:
                dt = time_forward(params, cfg, S)
                row["flash" if flag == "1" else "dense"] = dt
            except Exception as e:   # dense OOMs at long ctx — that's the point
                row["flash" if flag == "1" else "dense"] = \
                    f"FAIL({type(e).__name__})"
        print(f"S={S}: flash={row['flash']} dense={row['dense']}",
              flush=True)


if __name__ == "__main__":
    main()
