"""Which glue costs what? Ablation bench on the real chip (run ALONE).

The step decomposition (bench_step.py) left ~70 us/layer of non-kernel,
non-attention time. Candidates: RHT rotations (8/layer, ~5 XLA ops each),
norms, rope, reshapes/residuals. Each variant strips ONE candidate (the
numerics change; only the op mix matters for timing):

  A  baseline (XLA rotations)
  R  rotations stripped (proj_key=None on every PackedLinear)
  N  norms -> identity
  P  rope -> identity
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from quip_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from bench import bench_decode
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.format import PackedLinear

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built packed in {time.time()-t0:.0f}s", file=sys.stderr)

    def run(tag, params=None, **kw):
        tps = bench_decode(params if params is not None else packed, cfg,
                           steps=96, **kw)
        print(f"{tag}: {tps:.1f} tok/s", flush=True)
        return tps

    a1 = run("A  baseline")

    # R: strip every rotation (numerics wrong, op mix right)
    def strip(t):
        if isinstance(t, PackedLinear):
            return PackedLinear(
                t.planes, t.scale, t.zero, t.scale_b, None, None,
                t.bias, bits=t.bits, qfn=t.qfn, proj_mode=t.proj_mode,
                out_features=t.out_features, in_features=t.in_features,
                rot=None)
        return t

    stripped = jax.tree.map(
        strip, packed,
        is_leaf=lambda t: isinstance(t, PackedLinear) or t is None)
    run("R  rotations stripped", params=stripped)

    orig_norm = M.norm
    M.norm = lambda p, x, cfg_: x
    try:
        run("N  norms stripped")
    finally:
        M.norm = orig_norm

    orig_rope = M.apply_rope
    M.apply_rope = lambda x, c, s: x
    try:
        run("P  rope stripped")
    finally:
        M.apply_rope = orig_rope

    a2 = run("A' baseline re-run")
    print(f"drift {abs(a2 - a1) / a1 * 100:.1f}%")


if __name__ == "__main__":
    main()
