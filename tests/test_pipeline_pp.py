"""Pipeline-parallel prefill (GPipe schedule) + comm accounting tests.

Runs on the hermetic 8-virtual-CPU-device mesh (conftest.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.parallel import mesh as PM
from quip_tpu.parallel.pipeline import (pipeline_comm_bytes,
                                        pipelined_forward)


@pytest.fixture(scope="module")
def tiny():
    from dataclasses import replace
    cfg = replace(get_config("llama-tiny"), n_layers=4, dtype="float32")
    params = M.init_params(jax.random.key(0), cfg)
    return params, cfg


@pytest.mark.parametrize("pp,mb", [(2, 2), (4, 2), (4, 4), (1, 4)])
def test_pipelined_forward_matches_scan(tiny, pp, mb):
    """The GPipe schedule is numerically identical to the single-program
    lax.scan forward for every (stages, microbatches) split."""
    params, cfg = tiny
    mesh = PM.make_pp_mesh(pp)
    tokens = jax.random.randint(jax.random.key(1), (4, 16), 0,
                                cfg.vocab_size)
    want = M.forward(params, tokens, cfg)
    got = pipelined_forward(params, tokens, cfg, mesh, microbatches=mb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pipelined_forward_packed(tiny):
    """Packed (PackedLinear) block leaves pipeline too — the 2-bit
    quantized model is the serving configuration."""
    from dataclasses import replace
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _packed_llama

    cfg = replace(get_config("llama-tiny"), n_layers=4, dtype="float32")
    params = _packed_llama(cfg, bits=2, seed=0)
    mesh = PM.make_pp_mesh(4)
    tokens = jax.random.randint(jax.random.key(2), (4, 8), 0,
                                cfg.vocab_size)
    want = M.forward(params, tokens, cfg)
    got = pipelined_forward(params, tokens, cfg, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_uses_collective_permute(tiny):
    """The compiled pipeline program moves boundary activations by
    collective-permute (real pipelining, not resharding)."""
    from quip_tpu.parallel.comm import comm_report

    params, cfg = tiny
    mesh = PM.make_pp_mesh(4)
    tokens = jnp.zeros((4, 8), jnp.int32)
    rep = comm_report(
        lambda p, t: pipelined_forward(p, t, cfg, mesh, microbatches=2),
        (params, tokens), mesh=mesh)
    assert rep["per_kind"].get("collective-permute", {}).get("count", 0) > 0


def test_comm_report_counts_psum():
    """collectives_from_hlo sees GSPMD's all-reduce and sizes it."""
    from quip_tpu.parallel.comm import comm_report

    mesh = PM.make_mesh(dp=8)
    x = jnp.ones((8, 128), jnp.float32)
    xs = jax.device_put(x, jax.sharding.NamedSharding(mesh, P("dp", None)))

    def f(x):
        return jnp.sum(x, axis=0)

    rep = comm_report(f, (xs,), mesh=mesh)
    ar = rep["per_kind"].get("all-reduce") or \
        rep["per_kind"].get("reduce-scatter")
    assert ar and ar["count"] >= 1 and ar["bytes"] >= 128 * 4


def test_pipeline_comm_model():
    cfg = get_config("llama-2-7b")
    r = pipeline_comm_bytes(cfg, batch=8, seq=2048, microbatches=8, pp=4)
    assert r["ticks"] == 11
    assert r["bubble_fraction"] == pytest.approx(3 / 11)
    # one hop = (8/8) * 2048 * 4096 * 2B = 16 MiB
    assert r["hop_bytes"] == pytest.approx(2048 * 4096 * 2)


def test_hybrid_mesh_single_host_fallback():
    """make_hybrid_mesh on a single host degenerates to make_mesh; the
    multi-host path is exercised by scripts/dryrun_multiprocess.py."""
    m = PM.make_hybrid_mesh(dp=4, tp=2)
    assert dict(m.shape) == {"dp": 4, "tp": 2}
    m2 = PM.make_mesh(dp=2, tp=4)
    assert dict(m2.shape) == {"dp": 2, "tp": 4}
