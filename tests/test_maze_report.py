"""Regression tests for scripts/maze_ab_report.py — the aggregation whose
numbers BASELINE.md / README quote for the sparse-goal A/B (reference claim:
RND converts sparse reward into a policy, reference train.py:126-130).

Covers the round-4 verdict fixes that are easy to silently regress:
  * sustained-solve point = first return>=0.9 that NEVER drops below again
    (a transient solve followed by a collapse must reset the point),
  * never-solved arms censored at their own run length + 1,
  * the pre-solve harvest mark + cumulative goal-hit counts,
  * multi-seed mode suppresses the misleading single-pair "SPARSE VERDICT"
    tail (round-4 verdict weak #3), single-pair mode keeps it.

Runs the script as a subprocess on synthetic JSONL fixtures — the same way
a user drives it.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "maze_ab_report.py"


def _write_arm(dirpath: Path, name: str, returns, hits_per_update):
    rows = []
    for i, ret in enumerate(returns, start=1):
        rows.append({
            "update": i,
            "return": ret,
            "goal_hits": hits_per_update,
            "rooms_per_episode": 1.0 + 0.1 * i,
            "entropy": 1.0,
            "rooms_discovered": float(i),
        })
    (dirpath / f"{name}.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _run_report(dirpath: Path) -> str:
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--dir", str(dirpath), "--window", "4"],
        capture_output=True, text=True, timeout=120, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_multiseed_aggregation(tmp_path):
    n = 12
    # seed 1: RND transiently solves at update 3, collapses at 4, holds
    # from 5 — the sustained point must be 5, not 3. PPO holds from 8.
    rnd1 = [0.0, 0.0, 0.95, 0.5] + [0.95] * (n - 4)
    ppo1 = [0.0] * 7 + [0.95] * (n - 7)
    # seed 2: RND holds from 6; PPO never solves (censored at 12 + 1).
    rnd2 = [0.1] * 5 + [0.95] * (n - 5)
    ppo2 = [0.1] * n
    _write_arm(tmp_path, "rnd_g9d9_seed1", rnd1, hits_per_update=10.0)
    _write_arm(tmp_path, "ppo_g9d9_seed1", ppo1, hits_per_update=1.0)
    _write_arm(tmp_path, "rnd_g9d9_seed2", rnd2, hits_per_update=10.0)
    _write_arm(tmp_path, "ppo_g9d9_seed2", ppo2, hits_per_update=1.0)

    out = _run_report(tmp_path)

    # sustained-solve detection incl. the transient-collapse reset
    assert "seed   1: RND @ 5  PPO @ 8  -> RND" in out
    assert "seed   2: RND @ 6  PPO @ None  -> RND" in out
    # pre-solve harvest: seed-1 mark is RND's solve point 5, so the
    # cumulative hits strictly before update 5 are 4*10 vs 4*1.
    assert "pre-solve cum hits by upd 5: RND 40 vs PPO 4" in out
    assert "pre-solve harvest: RND ahead on 2/2 seeds" in out
    # censoring note for PPO seed 2 (never solved, run length 12 -> 13)
    assert "RND faster on 2/2 seeds (1 never-solved arm(s) censored" in out
    # multi-seed mode: aggregation is the verdict, single-pair tail gone
    assert "single-pair tail suppressed" in out
    assert "SPARSE VERDICT" not in out


def test_multiseed_sign_test_counts_only_decided_pairs(tmp_path):
    n = 10
    # one RND win, one exact tie (identical solve points) -> the sign test
    # must run on 1 decided pair, not 2.
    _write_arm(tmp_path, "rnd_s_seed1", [0.0] * 2 + [0.95] * (n - 2), 5.0)
    _write_arm(tmp_path, "ppo_s_seed1", [0.0] * 6 + [0.95] * (n - 6), 1.0)
    _write_arm(tmp_path, "rnd_s_seed2", [0.0] * 4 + [0.95] * (n - 4), 5.0)
    _write_arm(tmp_path, "ppo_s_seed2", [0.0] * 4 + [0.95] * (n - 4), 1.0)

    out = _run_report(tmp_path)
    assert "seed   2: RND @ 5  PPO @ 5  -> tie" in out
    assert "RND faster on 1/2 seeds" in out
    try:
        import scipy  # noqa: F401
    except ImportError:
        return
    # binomtest(1 win, 1 decided) is p = 1.0
    assert "sign test (RND faster, two-sided): p = 1.0000" in out


def test_single_pair_keeps_verdict_tail(tmp_path):
    n = 10
    _write_arm(tmp_path, "rnd_only_seed1", [0.0] * 3 + [0.95] * (n - 3), 5.0)
    _write_arm(tmp_path, "ppo_only_seed1", [0.0] * 8 + [0.95] * (n - 8), 1.0)

    out = _run_report(tmp_path)
    assert "SPARSE VERDICT @ matched 10 updates" in out
    assert "single-pair tail suppressed" not in out
