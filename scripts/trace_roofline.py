"""Roofline accounting from a jax.profiler trace: HBM bytes, FLOPs, MFU.

Sums `bytes_accessed` and `model_flops` over every leaf device op in a
profiler trace (the compiler's own accounting), prints achieved bandwidth,
the bandwidth-roofline floor, the compute-roofline floor, and a per-
hlo-category breakdown. This is the evidence behind BASELINE.md's round-3
"the update is HBM-bandwidth-bound at 84% of the v5e roofline" claim.

Usage:
    python scripts/update_bench.py --updates 2 --modes exact/xla --trace DIR
    python scripts/trace_roofline.py DIR --updates 2

`--updates` divides the totals (the trace covers N timed updates).
Peak numbers default to TPU v5e (819 GB/s HBM, 197 bf16 TFLOP/s); override
with --peak-bw-gbs / --peak-tflops for other parts.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def find_trace(root: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    )
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return hits[-1]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("dir")
    p.add_argument("--updates", type=int, default=1,
                   help="number of timed updates the trace covers")
    p.add_argument("--peak-bw-gbs", type=float, default=819.0)
    p.add_argument("--peak-tflops", type=float, default=197.0)
    a = p.parse_args()

    with gzip.open(find_trace(a.dir), "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev = {p_ for p_, n in pids.items() if "TPU" in n or "device" in n.lower()}

    tot_bytes = tot_flops = 0
    tot_t = 0.0
    cat = defaultdict(lambda: [0.0, 0, 0])  # t, bytes, flops
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        args = e.get("args", {})
        if "bytes_accessed" not in args:
            continue  # wrapper lanes (while/jit regions) carry no accounting
        c = args.get("hlo_category", "?")
        if c in ("while", "conditional", "call"):
            continue  # would double-count their bodies
        b = int(args["bytes_accessed"])
        fl = int(args.get("model_flops", 0) or 0)
        t = e.get("dur", 0) / 1e6
        tot_bytes += b
        tot_flops += fl
        tot_t += t
        cat[c][0] += t
        cat[c][1] += b
        cat[c][2] += fl

    n = a.updates
    bw = tot_bytes / tot_t / 1e9 if tot_t else 0.0
    print(f"leaf device time {tot_t / n:.2f} s/update   "
          f"HBM {tot_bytes / n / 1e12:.2f} TB/update   "
          f"{tot_flops / n / 1e12:.1f} TFLOP/update")
    print(f"achieved BW {bw:.0f} GB/s = {100 * bw / a.peak_bw_gbs:.0f}% of "
          f"{a.peak_bw_gbs:.0f} GB/s peak")
    print(f"BW roofline floor    {tot_bytes / n / (a.peak_bw_gbs * 1e9):.2f} s/update")
    print(f"compute roofline     {tot_flops / n / (a.peak_tflops * 1e12):.2f} s/update")
    ai = tot_flops / tot_bytes if tot_bytes else 0.0
    ridge = a.peak_tflops * 1e12 / (a.peak_bw_gbs * 1e9)
    print(f"arithmetic intensity {ai:.0f} FLOP/B (ridge {ridge:.0f})")
    print()
    for c in sorted(cat, key=lambda c: -cat[c][0]):
        t, b, fl = cat[c]
        if t / n < 0.005:
            continue
        print(f"  {t / n:6.2f} s/upd  {b / n / 1e9:7.1f} GB/upd  "
              f"BW {b / t / 1e9 if t else 0:5.0f} GB/s  "
              f"{fl / n / 1e12:6.1f} TFLOP  {c}")


if __name__ == "__main__":
    main()
