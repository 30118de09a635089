"""Chip measurement: shared-prefix (system prompt) serving economics.

Run ALONE on the TPU (CLAUDE.md: never share the relayed chip). Measures,
on the packed 7B serving engine (paged + chunked, batch 8):

  1. E2E served throughput + total wall for a request mix where every
     request carries the SAME long system prompt:
       a) baseline: the prompt is prepended to every request (the only
          option without prefix caching — per-slot prefill recomputes and
          stores the prefix KV B times);
       b) shared-prefix: Engine(shared_prefix=...) computes it once.
  2. Admission (TTFT proxy) cost of one request under both schemes.

Methodology: wall-clock including host reads (same as docs/PERF.md "E2E
serving"); engines are warmed with a small run first so compile time is
excluded. Random weights — the numbers measure cache/prefill mechanics,
not model quality.
"""
import sys
import time
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _packed_llama          # noqa: E402
from quip_tpu.models import get_config             # noqa: E402
from quip_tpu.serve.engine import Engine           # noqa: E402
from quip_tpu.utils import enable_compile_cache    # noqa: E402


def reqs_with(prefix_len, plen, new, n_req, inline_prefix):
    rng = np.random.default_rng(0)
    sysp = rng.integers(1, 1000, prefix_len).tolist()
    out = []
    for _ in range(n_req):
        q = rng.integers(1, 1000, plen).tolist()
        out.append(dict(prompt=(sysp + q) if inline_prefix else q,
                        max_new_tokens=new))
    return sysp, out


def e2e(eng, reqs):
    t0 = time.time()
    done = eng.run(reqs, chunked=True)
    dt = time.time() - t0
    toks = sum(len(r.generated) for r in done)
    return toks / dt, dt


def main():
    enable_compile_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = replace(get_config("llama-2-7b"), dtype="bfloat16")
    print("# building packed 7B...", file=sys.stderr)
    t0 = time.time()
    packed = _packed_llama(cfg, bits=2, seed=0, head_bits=2)
    print(f"# built in {time.time()-t0:.0f}s", file=sys.stderr)

    B, new, n_req = 8, 32, 16
    P, Q = 256, 32          # system prompt length, per-request prompt
    common = dict(max_batch=B, cache_dtype=jnp.bfloat16, paged=True,
                  hot=32, page=64)

    # -- a) inline baseline: prefix recomputed + stored per slot ------------
    sysp, reqs = reqs_with(P, Q, new, n_req, inline_prefix=True)
    eng = Engine(packed, cfg, max_seq=P + Q + new + 66, **common)
    e2e(eng, reqs[:B])                               # warm compiles
    tps, dt = e2e(eng, reqs)
    print(f"inline prefix (P={P}): {tps:.1f} tok/s ({dt:.1f}s)")

    # admission cost of ONE request (TTFT proxy), warm (chunked, the
    # already-compiled path — per-step decode would re-compile here)
    eng.run([reqs[0]], chunked=True)
    t0 = time.time()
    eng.run([reqs[1]], chunked=True)
    t_inline = time.time() - t0
    print(f"inline single-request wall (P+{Q} prompt, {new} new): "
          f"{t_inline*1e3:.0f} ms")

    # free the inline engine's caches before building the next engine:
    # two live engines double the resident buffer set on the 16 GB chip
    import gc
    del eng
    gc.collect()

    # -- b) shared prefix: computed once at engine build --------------------
    _, reqs_np = reqs_with(P, Q, new, n_req, inline_prefix=False)
    eng = Engine(packed, cfg, max_seq=Q + new + 66, shared_prefix=sysp,
                 **common)
    e2e(eng, reqs_np[:B])                            # warm compiles
    tps, dt = e2e(eng, reqs_np)
    print(f"shared prefix (P={P}): {tps:.1f} tok/s ({dt:.1f}s)")

    eng.run([reqs_np[0]], chunked=True)
    t0 = time.time()
    eng.run([reqs_np[1]], chunked=True)
    t_shared = time.time() - t0
    print(f"shared single-request wall ({Q} prompt, {new} new): "
          f"{t_shared*1e3:.0f} ms")


if __name__ == "__main__":
    main()
