"""End-to-end CLI regression tests (offline, tiny model, synthetic data)."""
import json
import os

import numpy as np
import pytest


ARGS_TINY = ["opt-tiny", "synthetic", "--nsamples", "8", "--seqlen", "64"]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from quip_tpu.cli import quantize

    path = str(tmp_path_factory.mktemp("cli") / "ckpt")
    quantize.main(ARGS_TINY + ["--wbits", "2", "--quant", "ldlq",
                               "--incoh_processing", "--save", path,
                               "--packed"])
    assert os.path.exists(os.path.join(path, "arrays.npz"))
    return path


def test_eval_cli(ckpt_dir, capsys):
    from quip_tpu.cli import eval as ecli

    ecli.main(ARGS_TINY + ["--load", ckpt_dir])
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    assert np.isfinite(json.loads(line)["ppl"])


def test_serve_cli(ckpt_dir, capsys):
    from quip_tpu.cli import serve

    serve.main(["opt-tiny", "--load", ckpt_dir, "--prompt", "ab",
                "--max_new_tokens", "4", "--max_seq", "64"])
    out = capsys.readouterr().out
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["prompt"] == "ab"


def test_serve_cli_sharded_matches(ckpt_dir, capsys):
    """--dp/--tp route through Engine(mesh=): same completion as the
    single-device engine (8 virtual CPU devices)."""
    from quip_tpu.cli import serve

    def run(extra):
        serve.main(["opt-tiny", "--load", ckpt_dir, "--prompt", "ab",
                    "--max_new_tokens", "4", "--max_seq", "64",
                    "--max_batch", "2"] + extra)
        out = capsys.readouterr().out
        return json.loads([ln for ln in out.splitlines()
                           if ln.startswith("{")][-1])

    plain = run([])
    shard = run(["--dp", "2", "--tp", "4"])
    assert shard["completion"] == plain["completion"]


def test_bench_cli(capsys):
    from quip_tpu.cli import bench as bcli

    bcli.main(["opt-tiny", "--tokens", "4", "--max_seq", "32"])
    out = capsys.readouterr().out
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["tokens_per_sec"] > 0

    # tensor-parallel mesh + int8 KV cache on the virtual devices
    bcli.main(["opt-tiny", "--tokens", "4", "--max_seq", "32",
               "--tp", "2", "--batch", "2", "--kv_quant"])
    out = capsys.readouterr().out
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["tokens_per_sec"] > 0 and rec["mesh"]["tp"] == 2

    # dp x tp with batch and KV arenas sharded over the mesh
    bcli.main(["opt-tiny", "--tokens", "4", "--max_seq", "32",
               "--dp", "2", "--tp", "2", "--batch", "4", "--kv_quant"])
    out = capsys.readouterr().out
    rec = json.loads([ln for ln in out.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["tokens_per_sec"] > 0 and rec["mesh"]["dp"] == 2


def test_tools_cli(tmp_path, capsys):
    from quip_tpu.cli import tools

    hpath = str(tmp_path / "H.npz")
    tools.main(["save-hessians"] + ARGS_TINY + ["--out", hpath])
    tools.main(["hsummary", "--hessians", hpath])
    tools.main(["proxy", "opt-tiny", "--hessians", hpath, "--wbits", "4",
                "--quant", "ldlq", "--incoh_processing", "--layers", "0",
                "--names", "fc2"])
    out = capsys.readouterr().out
    assert "avg_proxy_error" in out
    tools.main(["equiv-check", "--m", "64", "--d", "48"])
    out = capsys.readouterr().out
    assert "EQUIVALENCE OK" in out


def test_zeroshot_cli_offline_rejects_cleanly():
    """Without network/cache, task download must fail with a real error,
    not hang (the CLI surface still parses + selects tasks)."""
    from quip_tpu.cli.zeroshot import pattern_match
    from quip_tpu.eval.zeroshot.registry import ALL_TASKS

    assert pattern_match(["arc_*"], ALL_TASKS) == ["arc_challenge",
                                                   "arc_easy"]
    assert pattern_match(["piqa,bogus".split(",")[0]], ALL_TASKS) == ["piqa"]


def test_quantize_cli_fuse_and_resume(tmp_path, capsys):
    from quip_tpu.cli import quantize

    rdir = str(tmp_path / "resume")
    # llama-tiny has silu_glu => both qkv and gate_up fuse
    quantize.main(["llama-tiny", "synthetic", "--nsamples", "8",
                   "--seqlen", "64", "--wbits", "2", "--quant", "ldlq",
                   "--incoh_processing", "--fuse", "--resume_dir", rdir])
    out = capsys.readouterr().out
    assert "Total proxy error" in out
    import os
    assert os.path.exists(os.path.join(rdir, "layer_0.npz"))
    # resumed re-run is near-instant and identical
    quantize.main(["llama-tiny", "synthetic", "--nsamples", "8",
                   "--seqlen", "64", "--wbits", "2", "--quant", "ldlq",
                   "--incoh_processing", "--fuse", "--resume_dir", rdir])
    out2 = capsys.readouterr().out
    assert "(resumed)" in out2


def test_tools_hsummary_exports(tmp_path, capsys):
    """hsummary --eigens_csv/--pickle (compute_Hsummary.py:33-83 parity)."""
    import pickle

    import numpy as np

    from quip_tpu import analysis
    from quip_tpu.cli import tools

    rng = np.random.default_rng(0)
    Hs = {}
    for name, n in [("layers.0.q", 24), ("layers.0.k", 24)]:
        X = rng.standard_normal((64, n))
        Hs[name] = X.T @ X / 64
    hpath = str(tmp_path / "H.npz")
    analysis.save_hessians_npz(hpath, Hs)
    csv = str(tmp_path / "eig.csv")
    pkl = str(tmp_path / "summary.pkl")
    tools.main(["hsummary", "--hessians", hpath,
                "--eigens_csv", csv, "--pickle", pkl])
    header = open(csv).readline().strip().split(",")
    assert header == list(Hs.keys())
    rows = open(csv).read().strip().splitlines()
    assert len(rows) == 25  # header + 24 eigenvalues
    ev0 = [float(r.split(",")[0]) for r in rows[1:]]
    assert ev0 == sorted(ev0, reverse=True)
    with open(pkl, "rb") as f:
        summary = pickle.load(f)
    assert set(summary) == set(Hs)


def test_tools_transcode_packed_to_dense(tmp_path):
    """transcode rebuilds dense weights from a packed checkpoint with
    logits parity (load_quant direction, opt.py:318-348)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from quip_tpu.cli import tools
    from quip_tpu.models import get_config
    from quip_tpu.models import model as M
    from quip_tpu.pack.model import (load_checkpoint, pack_quantized_model,
                                     save_checkpoint)
    from quip_tpu.quantize.config import QuantConfig
    from quip_tpu.quantize.driver import quantize_model

    cfg = get_config("opt-tiny")
    params = M.init_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)
    qcfg = QuantConfig.incoherence(wbits=2, method="ldlq")
    qparams, art = quantize_model(params, cfg, calib, qcfg,
                                  jax.random.key(6), chunk=4)
    packed = pack_quantized_model(qparams, cfg, art, 2)
    src = str(tmp_path / "packed")
    dst = str(tmp_path / "dense")
    save_checkpoint(src, packed, {"model": "opt-tiny", "wbits": 2,
                                  "packed": True})
    tools.main(["transcode", "--load", src, "--save", dst])
    dense, meta = load_checkpoint(dst)
    assert meta["packed"] is False
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    lp = np.asarray(M.forward(packed, tokens, cfg))
    ld = np.asarray(M.forward(dense, tokens, cfg))
    np.testing.assert_allclose(ld, lp, rtol=2e-3, atol=2e-3)


def test_quantize_cli_rejects_packed_groupsize(capsys):
    import pytest

    from quip_tpu.cli import quantize as qcli

    with pytest.raises(SystemExit):
        qcli.main(["opt-tiny", "synthetic", "--wbits", "4",
                   "--quant", "gptq", "--groupsize", "16", "--packed",
                   "--save", "/tmp/never"])
    assert "groupsize" in capsys.readouterr().err


def test_quantize_cli_dp_mesh(tmp_path, capsys):
    """--dp shards calibration over the virtual mesh (GSPMD psum Hessians)
    and produces a working checkpoint."""
    from quip_tpu.cli import quantize as qcli

    ck = str(tmp_path / "dp_ck")
    qcli.main(["opt-tiny", "synthetic", "--wbits", "2", "--quant", "ldlq",
               "--incoh_processing", "--nsamples", "8", "--seqlen", "32",
               "--chunk", "8", "--dp", "2", "--packed", "--save", ck])
    out = capsys.readouterr().out
    assert "saved checkpoint" in out
    from quip_tpu.pack.model import load_checkpoint
    tree, meta = load_checkpoint(ck)
    assert meta["wbits"] == 2


def test_accept_smoke(tmp_path, capsys):
    """The turnkey acceptance harness runs the full matrix (fp16 + one
    quantized width, ppl + zero-shot) end to end with zero egress and
    emits a pass/fail report with recorded values."""
    from quip_tpu.cli import accept

    out_path = str(tmp_path / "report.json")
    with pytest.raises(SystemExit) as e:
        accept.main(ARGS_TINY + [
            "--bits", "16,2", "--tasks", "synthetic", "--limit", "4",
            "--bootstrap_iters", "0", "--output", out_path])
    assert e.value.code == 0
    with open(out_path) as f:
        report = json.load(f)
    assert report["pass"] is True
    assert np.isfinite(report["results"]["ppl"]["16"])
    assert np.isfinite(report["results"]["ppl"]["2"])
    assert "synthetic" in report["results"]["zeroshot"]["2"]
    # no published numbers yet: every delta check records no_baseline
    statuses = {c["status"] for c in report["checks"]}
    assert "no_baseline" in statuses and report["n_baseline_checks"] == 0


def test_accept_baseline_gate(tmp_path):
    """With published numbers present, the ppl-delta gate actually gates:
    an impossible baseline (delta 0 allowed) fails the run."""
    from quip_tpu.cli import accept

    baseline = {"published": {"opt-tiny": {
        "ppl": {"synthetic": {"16": 1.0, "2": 1.0}}}}}
    bpath = str(tmp_path / "baseline.json")
    with open(bpath, "w") as f:
        json.dump(baseline, f)
    with pytest.raises(SystemExit) as e:
        accept.main(ARGS_TINY + [
            "--bits", "16,2", "--tasks", "", "--baseline", bpath,
            "--tol_ppl", "0.0"])
    assert e.value.code == 1
