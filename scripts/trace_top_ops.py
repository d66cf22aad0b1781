"""Summarize a jax.profiler trace: top ops by total device time.

Reads the perfetto trace.json.gz that jax.profiler.start_trace writes under
<dir>/plugins/profile/<run>/, aggregates complete events by name, and prints
the top-K with total/percent — enough to see where an update's seconds go
without TensorBoard.

Usage: python scripts/trace_top_ops.py logs/trace_shared [--top 25]
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
    p.add_argument("--top", type=int, default=25)
    a = p.parse_args()
    path = find_trace(a.dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device lanes only: keep pids whose process name mentions TPU/device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_name.items()
        if "TPU" in name or "/device" in name.lower()
    } or set(pid_name)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            tot[e["name"]] += e.get("dur", 0.0)
            cnt[e["name"]] += 1
    grand = sum(tot.values())
    print(f"trace: {path}")
    print(f"device lanes: {[pid_name[p] for p in device_pids][:4]} ...")
    print(f"total device event time: {grand / 1e6:.3f} s\n")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[: a.top]:
        print(f"{us / 1e6:8.3f}s  {100 * us / grand:5.1f}%  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
