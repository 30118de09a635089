"""Analysis tools CLI — parity with the reference scripts opt_saveH.py,
opt_proxy.py, compute_Hsummary.py, optq_ldlq_equiv.py (SURVEY.md §2.4).

  python -m quip_tpu.cli.tools save-hessians opt-tiny synthetic --out H.npz
  python -m quip_tpu.cli.tools proxy opt-tiny --hessians H.npz --wbits 4 ...
  python -m quip_tpu.cli.tools hsummary --hessians H.npz
  python -m quip_tpu.cli.tools equiv-check
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from quip_tpu.cli import common


def main(argv=None):
    p = argparse.ArgumentParser("quip_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("save-hessians",
                        help="calibrate and dump per-layer Hessians "
                             "(opt_saveH.py parity)")
    common.add_model_args(ps)
    common.add_data_args(ps)
    ps.add_argument("--out", required=True)
    ps.add_argument("--chunk", type=int, default=4)

    pp = sub.add_parser("proxy", help="proxy-loss eval from saved Hessians "
                                      "(opt_proxy.py parity)")
    common.add_model_args(pp)
    common.add_quant_args(pp)
    pp.add_argument("--hessians", required=True)
    pp.add_argument("--layers", type=str, default=None,
                    help="comma list of block indices")
    pp.add_argument("--names", type=str, default=None,
                    help="comma list of linear names (e.g. fc2)")

    ph = sub.add_parser("hsummary", help="Hessian statistics "
                                         "(compute_Hsummary.py parity)")
    ph.add_argument("--hessians", required=True)
    ph.add_argument("--percdamp", type=float, default=0.01)
    ph.add_argument("--eigens_csv", type=str, default=None,
                    help="also dump per-layer eigenvalue spectra "
                         "(compute_Hsummary.py:72-83)")
    ph.add_argument("--pickle", type=str, default=None,
                    help="dump the summary dict as pickle "
                         "(compute_Hsummary.py:33-57)")

    pe = sub.add_parser("equiv-check",
                        help="LDLQ == OPTQ equivalence (optq_ldlq_equiv.py)")
    pe.add_argument("--m", type=int, default=256)
    pe.add_argument("--d", type=int, default=256)
    pe.add_argument("--wbits", type=int, default=4)
    pe.add_argument("--seed", type=int, default=0)

    pt = sub.add_parser("transcode",
                        help="packed checkpoint -> dense checkpoint "
                             "(load_quant parity: rebuild dense weights "
                             "from codes + scales + rotation keys)")
    pt.add_argument("--load", required=True)
    pt.add_argument("--save", required=True)

    pc = sub.add_parser("counter",
                        help="finite-grid counterexample: rounder proxy "
                             "losses on adversarial (W, H) "
                             "(optq_counter.py:7-43)")
    pc.add_argument("--sizes", type=str, default="256,512,1024,2048,4096")

    args = p.parse_args(argv)

    from quip_tpu import analysis

    if args.cmd == "save-hessians":
        params, cfg = common.load_model(args)
        (calib, _), seqlen = common.get_data(args, cfg)
        from quip_tpu.quantize.driver import save_hessians
        Hs = save_hessians(params, cfg, jnp.asarray(calib),
                           chunk=args.chunk)
        analysis.save_hessians_npz(args.out, Hs)
        print(f"saved {len(Hs)} Hessians to {args.out}")

    elif args.cmd == "proxy":
        params, cfg = common.load_model(args)
        Hs = analysis.load_hessians_npz(args.hessians)
        qcfg = common.quant_config_from_args(args)
        layers = ([int(x) for x in args.layers.split(",")]
                  if args.layers else None)
        names = args.names.split(",") if args.names else None
        errs = analysis.proxy_eval(params, cfg, Hs, qcfg,
                                   jax.random.key(args.seed
                                                  if hasattr(args, "seed")
                                                  else 0),
                                   layer_indices=layers, layer_names=names)
        total = sum(errs.values())
        print(json.dumps({"per_layer": errs,
                          "avg_proxy_error": total / max(len(errs), 1),
                          "total": total, "n": len(errs)}, indent=2))

    elif args.cmd == "hsummary":
        Hs = analysis.load_hessians_npz(args.hessians)
        rows = []
        for name, H in Hs.items():
            a, k00, k01, mu = analysis.hessian_summary(H, args.percdamp)
            rows.append((name, a, k00, k01, mu))
            print(f"{name}: tr(D)/tr(H)={a:.4f} rank0={k00:.3f} "
                  f"rank.01={k01:.3f} mu={mu:.2f}")
        arr = np.array([[r[1], r[2], r[3], r[4]] for r in rows])
        print(f"tr(D)/tr(H): {arr[:, 0].mean():.4f} (+/- {arr[:, 0].std():.4f})")
        print(f"matrix rank rtol=0.00: {arr[:, 1].mean():.4f} "
              f"(+/- {arr[:, 1].std():.4f})")
        print(f"matrix rank rtol=0.01: {arr[:, 2].mean():.4f} "
              f"(+/- {arr[:, 2].std():.4f})")
        print(f"incoherency mu: {arr[:, 3].mean():.4f} "
              f"(+/- {arr[:, 3].std():.4f})")
        if args.eigens_csv:
            analysis.eigenspectrum_csv(args.eigens_csv, Hs, args.percdamp)
            print(f"wrote eigenspectra to {args.eigens_csv}")
        if args.pickle:
            import pickle as _pickle
            with open(args.pickle, "wb") as f:
                _pickle.dump({r[0]: tuple(r[1:]) for r in rows}, f)
            print(f"wrote summary pickle to {args.pickle}")

    elif args.cmd == "transcode":
        from quip_tpu.pack.model import (load_checkpoint, save_checkpoint,
                                         unpack_model)
        tree, meta = load_checkpoint(args.load)
        dense = unpack_model(tree)
        meta = dict(meta)
        meta["packed"] = False
        meta["transcoded_from"] = args.load
        save_checkpoint(args.save, dense, meta)
        print(f"transcoded {args.load} -> dense at {args.save}")

    elif args.cmd == "equiv-check":
        out = analysis.optq_ldlq_equivalence_check(args.m, args.d,
                                                   args.wbits, args.seed)
        print(json.dumps(out, indent=2))
        assert out["frac_agree_1e6"] > 0.99, "LDLQ != OPTQ!"
        print("EQUIVALENCE OK")

    elif args.cmd == "counter":
        from quip_tpu.core import ldlq
        for n in [int(s) for s in args.sizes.split(",")]:
            # adversarial pairwise-coupled H on a 1-bit grid
            H = np.eye(n)
            for i in range(0, n - 1, 2):
                H[i, i + 1] = H[i + 1, i] = 0.499
            W = np.full((4, n), 0.499)
            Wj = jnp.asarray(W)
            Hj = jnp.asarray(H + 1e-3 * np.eye(n))
            rows = {}
            rows["ldlq"] = float(ldlq.hessian_loss(
                ldlq.round_ldl(Wj, Hj, 1, 0) - Wj, Hj))
            rows["ldlqRG"] = float(ldlq.hessian_loss(
                ldlq.round_ldlqRG(Wj, Hj, 1, 0) - Wj, Hj))
            rows["allbal(2)"] = float(ldlq.hessian_loss(
                ldlq.round_allbal_sorted(Wj, Hj, 1, 2) - Wj, Hj))
            rows["nearest"] = float(ldlq.hessian_loss(
                ldlq.round_nearest(Wj, 1) - Wj, Hj))
            print(json.dumps({"n": n, **rows}))


if __name__ == "__main__":
    main()
