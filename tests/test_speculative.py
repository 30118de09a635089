"""Speculative decoding (serve/speculative.py): greedy-exactness.

The defining property: for ANY draft model, the emitted stream equals the
target model's plain greedy decoding — the draft only changes how many
dispatches it takes. A perfect draft (== target) must accept K tokens per
step; an unrelated draft still produces the exact stream.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.serve.speculative import SpecDecoder


def _greedy_reference(params, cfg, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits = M.forward(params, jnp.asarray([toks], jnp.int32), cfg)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.mark.parametrize("name", ["llama-tiny", "opt-tiny"])
def test_spec_exactness_unrelated_draft(name):
    cfg = get_config(name)
    target = M.init_params(jax.random.key(0), cfg)
    draft = M.init_params(jax.random.key(1), cfg)   # unrelated weights
    prompt = [5, 2, 9, 1]
    n_new = 24
    dec = SpecDecoder(draft, target, cfg, cfg, K=4, max_seq=64, hot=8,
                      page=8, cache_dtype=jnp.float32)
    [out], accept = dec.generate([prompt], max_new_tokens=n_new)
    want = _greedy_reference(target, cfg, prompt, n_new)
    assert out[: len(want)] == want, (out, want, accept)
    assert 1.0 <= accept <= 4.0


def test_spec_perfect_draft_accepts_K():
    cfg = get_config("llama-tiny")
    target = M.init_params(jax.random.key(0), cfg)
    prompt = [3, 7, 7]
    n_new = 20
    dec = SpecDecoder(target, target, cfg, cfg, K=4, max_seq=64, hot=8,
                      page=8, cache_dtype=jnp.float32)
    [out], accept = dec.generate([prompt], max_new_tokens=n_new)
    want = _greedy_reference(target, cfg, prompt, n_new)
    assert out[: len(want)] == want
    assert accept == 4.0, accept       # every step emits K tokens


def test_spec_batch_and_small_draft():
    """B=2 slots, draft genuinely smaller than the target."""
    import dataclasses
    cfg_t = get_config("opt-tiny")
    cfg_d = dataclasses.replace(cfg_t, n_layers=1, d_ff=64)
    target = M.init_params(jax.random.key(0), cfg_t)
    draft = M.init_params(jax.random.key(2), cfg_d)
    prompts = [[4, 4, 1], [9, 8, 7, 6, 5]]
    n_new = 16
    dec = SpecDecoder(draft, target, cfg_d, cfg_t, K=3, max_seq=64, hot=8,
                      page=8, batch=2, cache_dtype=jnp.float32)
    outs, _ = dec.generate(prompts, max_new_tokens=n_new)
    for p, o in zip(prompts, outs):
        want = _greedy_reference(target, cfg_t, p, n_new)
        assert o[: len(want)] == want, (p, o, want)
