"""Per-kernel time table from a captured XProf trace.

The TPU analogue of reading an Nsight-Compute report
(/root/reference/my-ncu.sh writes csv metric tables): capture a trace
with `myraytracer_tpu.utils.profiling.profile_trace`, then point this at
the dump dir to get device-side per-op totals from the "XLA Ops" track.

Usage:
  python tools/trace_table.py /tmp/xprof_office [--runs N] [--top K]

--runs divides totals by the number of profiled iterations so the table
reads as per-forward milliseconds.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(dump_dir: str) -> list[dict]:
    paths = sorted(glob.glob(
        os.path.join(dump_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        sys.exit(f"no *.trace.json.gz under {dump_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"]


def op_table(events: list[dict]):
    """Leaf-op totals from the device 'XLA Ops' thread."""
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev = [p for p, n in pids.items() if "TPU" in n]
    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    shape = {}
    for e in events:
        if (e.get("ph") == "X" and e["pid"] in dev
                and tids.get((e["pid"], e["tid"])) == "XLA Ops"):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            if e["name"] not in shape:
                shape[e["name"]] = e.get("args", {}).get("long_name", "")
    return dur, cnt, shape


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("dump_dir")
    ap.add_argument("--runs", type=int, default=1,
                    help="profiled iterations (divide totals)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    dur, cnt, shape = op_table(load_events(args.dump_dir))
    tot = sum(dur.values()) / args.runs / 1e3
    print(f"device XLA-op total: {tot:.1f} ms per run "
          f"({args.runs} runs profiled)")
    print(f"{'ms/run':>8}  {'calls':>6}  op")
    for n, d in sorted(dur.items(), key=lambda kv: -kv[1])[:args.top]:
        desc = shape[n][:72]
        print(f"{d/args.runs/1e3:8.2f}  {cnt[n]//args.runs:6d}  {n:38s} {desc}")


if __name__ == "__main__":
    main()
