"""Chip batch 2 (one process, run ALONE): padded-m validation.

  1. microbench: (22016,4096) unpadded/5504 vs padded 22400/3200 vs
     padded 22528/2816, A/B/A
  2. e2e decode A/B/A: headline config with QUIP_NO_PAD_M toggled at
     model-build time (96-step chains; drift band ~0.4%)
  3. bench.py main with padding active (the new headline JSON line)
"""
import functools
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def phase(name, fn):
    print(f"\n===== PHASE {name} start {time.strftime('%H:%M:%S')} =====",
          flush=True)
    t0 = time.time()
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"===== PHASE {name} FAILED =====", flush=True)
    print(f"===== PHASE {name} done in {time.time()-t0:.0f}s =====",
          flush=True)


def micro():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from quip_tpu.kernels.dequant_matmul import dequant_matmul
    from quip_tpu.pack.format import pack_codes
    from bench_kernel import slope_time

    rng = np.random.default_rng(0)
    d, bits = 4096, 2
    cases = [(22016, 5504), (22400, 3200), (22528, 2816), (22016, 5504)]
    x0 = jnp.asarray(rng.standard_normal((1, d)), jnp.bfloat16)
    true_bytes = 22016 * d * bits / 8
    packs = {}
    for m, _ in cases:
        if m not in packs:
            codes = jnp.asarray(rng.integers(0, 4, size=(m, d)), jnp.int32)
            packs[m] = tuple(jax.device_put(p)
                             for p in pack_codes(codes, bits))
    for m, tm in cases:
        fn = functools.partial(dequant_matmul, planes=packs[m],
                               scale=jnp.float32(0.02), zero=None,
                               bits=bits, qfn="b", tile_m=tm)
        t = slope_time(lambda x: fn(x), x0, d, m)
        print(f"m={m} tile={tm}: {t*1e6:7.1f} us  "
              f"{true_bytes/t/1e9:6.1f} GB/s(true-bytes)", flush=True)


def e2e_ab():
    import gc
    from dataclasses import replace

    import jax

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from bench import bench_decode

    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    for tag, no_pad in (("pad", "0"), ("nopad", "1"), ("pad#2", "0")):
        os.environ["QUIP_NO_PAD_M"] = no_pad
        t0 = time.time()
        params = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
        print(f"# [{tag}] built in {time.time()-t0:.0f}s", flush=True)
        tps = bench_decode(params, cfg, steps=96)
        print(f"[{tag}] {tps:.1f} tok/s", flush=True)
        del params
        gc.collect()
    os.environ.pop("QUIP_NO_PAD_M", None)


def main():
    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from quip_tpu.utils import enable_compile_cache
    enable_compile_cache()

    phase("micro-padded-tiles", micro)
    phase("e2e-pad-ab", e2e_ab)

    import bench
    phase("headline-bench", bench.main)


if __name__ == "__main__":
    main()
