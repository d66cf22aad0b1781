"""Extract the Pendulum learning curve from a train rank log.

The CLI train loop logs one line per update
(``update N | global_step S | loss L | return R | rooms K``,
eavit_tpu/train.py); this turns those lines into a JSONL curve artifact
under results/ so the continuous-action learning run is inspectable the
same way the maze A/B curves are.

Usage: python scripts/pendulum_curve.py logs/pendulum_r5_rank0.log \
           results/pendulum/curve_seed42.jsonl
"""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(
    r"update (\d+) \| global_step (\d+) \| loss ([-\d.na]+) \| "
    r"return ([-\d.]+|-) \| rooms"
)


def main(log_path: str, out_path: str) -> None:
    rows = []
    with open(log_path) as f:
        for line in f:
            m = LINE.search(line)
            if not m:
                continue
            update, step, loss, ret = m.groups()
            rows.append(
                {
                    "update": int(update),
                    "global_step": int(step),
                    "loss": None if loss == "nan" else float(loss),
                    "return": None if ret == "-" else float(ret),
                }
            )
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    returns = [r["return"] for r in rows if r["return"] is not None]
    if returns:
        k = max(1, len(returns) // 10)
        print(
            f"{len(rows)} updates | first-{k} mean return "
            f"{sum(returns[:k]) / k:.2f} | last-{k} mean return "
            f"{sum(returns[-k:]) / k:.2f}"
        )
    else:
        print(f"{len(rows)} updates, no finished episodes yet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
