"""SPMD partitioning rules for the packed dequant-matmul kernel.

Without them, pallas_call is opaque to the partitioner and GSPMD
all-gathers the packed planes to every device (measured ~217 MB/layer/step
at 7B tp=4 — cli/commreport.py). These tests run the REAL kernel path in
interpret mode on the 8-virtual-device CPU mesh and check (a) sharded ==
unsharded numerics through jit, (b) the compiled HLO contains no
plane-sized all-gathers.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from quip_tpu.kernels.dequant_matmul import (dequant_matmul,
                                             dequant_matmul_ref)
from quip_tpu.pack.format import pack_codes
from quip_tpu.parallel.mesh import make_mesh


@pytest.fixture()
def problem():
    rng = np.random.default_rng(0)
    m, d, B = 256, 64, 8
    codes = jnp.asarray(rng.integers(0, 4, size=(m, d)), jnp.int32)
    planes = pack_codes(codes, 2)
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    scale = jnp.asarray(0.02, jnp.float32)
    return x, planes, scale


def test_partitioned_kernel_matches_ref(problem):
    x, planes, scale = problem
    mesh = make_mesh(dp=2, tp=4)

    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    ps = tuple(jax.device_put(p, NamedSharding(mesh, P(None, "tp")))
               for p in planes)

    y = jax.jit(lambda x, ps: dequant_matmul(
        x, ps, scale, None, bits=2, qfn="b", interpret=True,
        partitioned=True))(xs, ps)
    want = dequant_matmul_ref(x, planes, scale, None, bits=2, qfn="b")
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # the result actually lands sharded on the plane's m axis
    assert not y.sharding.is_fully_replicated


def test_no_plane_allgather_in_hlo(problem):
    from quip_tpu.parallel.comm import comm_report

    x, planes, scale = problem
    mesh = make_mesh(dp=1, tp=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None)))
    ps = tuple(jax.device_put(p, NamedSharding(mesh, P(None, "tp")))
               for p in planes)

    rep = comm_report(
        jax.jit(lambda x, ps: dequant_matmul(
            x, ps, scale, None, bits=2, qfn="b", interpret=True,
            partitioned=True)),
        (xs, ps), mesh=mesh)
    plane_bytes = planes[0].size * 4
    big = [c for c in rep["collectives"] if c["bytes"] >= plane_bytes]
    assert not big, big


def test_sharded_packed_forward_matches(monkeypatch):
    """Full packed llama-tiny forward, kernel path (interpret), tp-sharded
    vs unsharded — the serving-configuration parity check the round-1
    virtual-mesh tests only ran on the jnp reference path."""
    import sys
    sys.path.insert(0, "/root/repo")
    from dataclasses import replace

    from __graft_entry__ import _packed_llama
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.parallel.mesh import shard_params

    monkeypatch.setenv("QUIP_KERNEL_INTERPRET", "1")
    cfg = replace(get_config("llama-tiny"), n_layers=2, dtype="float32")
    params = _packed_llama(cfg, bits=2, seed=0)
    tokens = jax.random.randint(jax.random.key(1), (2, 8), 0,
                                cfg.vocab_size)

    want = jax.jit(lambda p, t: M.forward(p, t, cfg))(params, tokens)

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    got = jax.jit(lambda p, t: M.forward(p, t, cfg))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-3, atol=5e-3)
