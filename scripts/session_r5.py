"""Round-5 chip session driver: ALL chip measurements in ONE process.

TPU process startup through the relay can take 15-20 min (CLAUDE.md), so
every harness runs in-process via runpy with a patched argv, sequentially,
output unbuffered to the launch shell's redirect file. Never run anything
else against the chip while this is up.

Legs (override with --legs):
  spec       bench_spec e2e+steps (serial-vs-pump A/B, post-fix step costs)
  serve      bench_serve e2e+depth+arrival+burst (adaptive admission A/B,
             coalesced reads, pipeline_depth sweep)
  kvq        bench_kvquality --chip (7B drift/NLL bound for --kv_quant)
  drill      drill_30b (host_offload 30B pipeline; LAST — frees nothing
             for anyone after it)
"""
import argparse
import gc
import runpy
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

_ap = argparse.ArgumentParser("session_r5")
_ap.add_argument("--legs", default="bench,spec,serve,kvq,drill")
_ap.add_argument("--drill-layers", type=int, default=0)
ARGS = _ap.parse_args()

LEGS = {
    # headline first (CLAUDE.md: bench before experiments) — confirms the
    # round-5 engine changes left the driver metric intact
    "bench": ["bench.py"],
    "spec": ["bench_spec.py", "--sections", "e2e,steps"],
    "serve": ["bench_serve.py", "--sections", "e2e,depth,arrival",
              "--rates", "2,4,8"],
    "kvq": ["bench_kvquality.py", "--chip", "--T", "512"],
    "drill": ["drill_30b.py"] + (["--layers", str(ARGS.drill_layers)]
                                 if ARGS.drill_layers else []),
}


def main():
    t_session = time.time()
    for leg in ARGS.legs.split(","):
        argv = LEGS[leg]
        print(f"\n######## leg {leg}: {argv} "
              f"(t+{time.time()-t_session:.0f}s) ########", flush=True)
        sys.argv = argv
        t0 = time.time()
        base = "/root/repo/" if argv[0] == "bench.py" else \
            "/root/repo/scripts/"
        try:
            runpy.run_path(base + argv[0], run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"leg {leg} exited rc={e.code}", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"leg {leg} FAILED (continuing)", flush=True)
        gc.collect()
        print(f"######## leg {leg} done in {time.time()-t0:.0f}s ########",
              flush=True)
    print(f"\nSESSION DONE in {time.time()-t_session:.0f}s", flush=True)


if __name__ == "__main__":
    main()
