"""Summarize the maze A/B JSONL curves (scripts/maze_ab.py output).

Prints windowed means of rooms/episode AND cumulative fleet discovery for
each arm, plus arm-vs-arm comparisons: a Welch t on the last-K
rooms/episode window and the final discovered-room counts (the
frontier-pushing signal — monotone, so compared directly at matched
update counts).

Usage: python scripts/maze_ab_report.py [--dir logs/maze_ab] [--window 50]
       [--match <substring>]  (only files whose name contains it)
"""

from __future__ import annotations

import argparse
import glob
import re
import json
import math
import os

import numpy as np


def load(path):
    return [json.loads(l) for l in open(path)]


def welch_t(a: np.ndarray, b: np.ndarray) -> float:
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    return float((a.mean() - b.mean()) / math.sqrt(va + vb + 1e-12))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="logs/maze_ab")
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--match", default="")
    a = p.parse_args()

    arms = {}
    for f in sorted(glob.glob(os.path.join(a.dir, "*.jsonl"))):
        if a.match and a.match not in os.path.basename(f):
            continue
        rows = load(f)
        if rows:
            arms[os.path.basename(f).replace(".jsonl", "")] = rows

    for name, rows in arms.items():
        rooms = np.array([r["rooms_per_episode"] for r in rows])
        ent = np.array([r["entropy"] for r in rows])
        disc = np.array([r.get("rooms_discovered", 0.0) for r in rows])
        print(f"\n== {name} ({len(rows)} updates) ==")
        w = a.window
        for lo in range(0, len(rooms), w):
            s = slice(lo, lo + w)
            if s.stop - 1 >= len(rooms) and len(rooms[s]) < w // 2:
                break
            print(
                f"  upd {lo + 1:4d}-{min(lo + w, len(rooms)):4d}: "
                f"rooms {rooms[s].mean():6.2f} +- {rooms[s].std():.2f}   "
                f"discovered {disc[s].max():5.0f}   "
                f"entropy {ent[s].mean():.4f}"
            )
        print(
            f"  first-{w} {rooms[:w].mean():.2f} -> last-{w} "
            f"{rooms[-w:].mean():.2f}  (max windowed "
            f"{max(rooms[i:i+w].mean() for i in range(0, max(1, len(rooms)-w+1), w)):.2f})"
            f"  final discovered {disc[-1]:.0f}"
        )

    # ---- sparse-goal section (round 4): the reference's headline claim is
    # RND converting sparse extrinsic reward into a policy (Montezuma,
    # reference train.py:126-130). Metrics of record: mean episode return
    # (1.0 = every episode reaches the goal), goal hits per rollout vs the
    # calibrated uniform-policy encounter level, and frames-to-solve.
    sparse_arms = {
        k: v for k, v in arms.items() if v and "goal_hits" in v[0]
    }
    for name, rows in sparse_arms.items():
        ret = np.array([r["return"] for r in rows])
        hits = np.array([r["goal_hits"] for r in rows])
        w = a.window
        first_solve = next(
            (r["update"] for r, m in zip(rows, ret) if m >= 0.9), None
        )
        first_half = next(
            (r["update"] for r, m in zip(rows, ret) if m >= 0.5), None
        )
        print(
            f"\n== sparse {name}: last-{w} return "
            f"{ret[-w:].mean():.3f} +- {ret[-w:].std():.3f}   "
            f"goal hits/rollout last-{w} {hits[-w:].mean():.1f}   "
            f"return>=0.5 @ update {first_half}   "
            f">=0.9 @ update {first_solve}   "
            f"return AUC {ret.mean():.3f}"
        )

    # ---- multi-seed solve-point aggregation: the per-seed luck variance
    # of a uniform policy stumbling into the goal is large (seed 13: PPO
    # lucked into 17 hits by update 40), so the honest cross-seed statistic
    # is the per-seed frames-to-sustained-solve distribution, not any one
    # seed's gap.
    if len(sparse_arms) > 2:
        by_arm: dict = {}
        for name, rows in sparse_arms.items():
            m = re.match(r"(rnd|ppo).*_seed(\d+)$", name)
            if not m:
                continue
            ret = np.array([r["return"] for r in rows])
            solved_from = None
            for r, v in zip(rows, ret):
                if v >= 0.9:
                    if solved_from is None:
                        solved_from = r["update"]
                else:
                    solved_from = None
            # (solve point, this arm's run length, per-update goal hits) —
            # the length is the censoring bound when the arm never solved;
            # the hits vector feeds the pre-solve harvest statistic.
            arm_len = max((r["update"] for r in rows), default=0)
            hits_by_upd = {r["update"]: r["goal_hits"] for r in rows}
            by_arm.setdefault(m.group(1), {})[int(m.group(2))] = (
                solved_from, arm_len, hits_by_upd)
        if "rnd" in by_arm and "ppo" in by_arm:
            seeds = sorted(set(by_arm["rnd"]) & set(by_arm["ppo"]))
            if seeds:
                print("\n== multi-seed sustained-solve points (update of "
                      "first return>=0.9 never dropping below) ==")
                wins = losses = 0
                harvest = []  # (seed, mark, rnd cum hits, ppo cum hits)
                for s in seeds:
                    (r, _, rh), (p, _, ph) = by_arm["rnd"][s], by_arm["ppo"][s]
                    verdict = ("RND" if (r or 10**9) < (p or 10**9)
                               else "PPO" if (p or 10**9) < (r or 10**9)
                               else "tie")
                    wins += verdict == "RND"
                    losses += verdict == "PPO"
                    # mechanism statistic: cumulative goal hits strictly
                    # BEFORE the first arm's sustained solve (the window
                    # where novelty pressure must do the work — round-4
                    # narrative, now per seed). Never-solved pairs use the
                    # shorter run as the mark.
                    mark = min(
                        x for x in (
                            r, p, min(max(rh, default=0), max(ph, default=0))
                        ) if x
                    )
                    rc = sum(v for u, v in rh.items() if u < mark)
                    pc = sum(v for u, v in ph.items() if u < mark)
                    harvest.append((s, mark, rc, pc))
                    print(f"  seed {s:3d}: RND @ {r}  PPO @ {p}  -> {verdict}"
                          f"   [pre-solve cum hits by upd {mark}: "
                          f"RND {rc:.0f} vs PPO {pc:.0f}]")
                n_harv = sum(rc > pc for _, _, rc, pc in harvest)
                ratios = [(rc + 1.0) / (pc + 1.0) for _, _, rc, pc in harvest]
                print(f"  pre-solve harvest: RND ahead on "
                      f"{n_harv}/{len(harvest)} seeds; median "
                      f"(RND+1)/(PPO+1) hit ratio "
                      f"{float(np.median(ratios)):.1f}x")
                # Censored (never-solved) arms: cap at that arm's own run
                # length + 1. Conservative for the winner — the true solve
                # point is at least that late, so gaps are understated,
                # never overstated.
                rs_c = [
                    v if v is not None else n + 1
                    for v, n, _ in (by_arm["rnd"][s] for s in seeds)
                ]
                ps_c = [
                    v if v is not None else n + 1
                    for v, n, _ in (by_arm["ppo"][s] for s in seeds)
                ]
                censored = sum(
                    by_arm[a][s][0] is None
                    for a in ("rnd", "ppo") for s in seeds
                )
                med_note = (
                    "" if not censored
                    else f" ({censored} never-solved arm(s) censored at "
                    "own run length + 1)"
                )
                print(f"  median: RND {np.median(rs_c):.0f} vs PPO "
                      f"{np.median(ps_c):.0f}; mean {np.mean(rs_c):.1f} vs "
                      f"{np.mean(ps_c):.1f}; RND faster on "
                      f"{wins}/{len(seeds)} seeds{med_note}")
                try:
                    from scipy import stats as _st

                    decided = wins + losses
                    if decided:
                        sign_p = _st.binomtest(wins, decided).pvalue
                        print(f"  sign test (RND faster, two-sided): "
                              f"p = {sign_p:.4f}")
                    diffs = [p - r for r, p in zip(rs_c, ps_c) if p != r]
                    if len(diffs) >= 5:
                        wil = _st.wilcoxon(diffs, alternative="two-sided")
                        print(f"  Wilcoxon signed-rank on PPO-RND solve-point "
                              f"gaps: W = {wil.statistic:.0f}, "
                              f"p = {wil.pvalue:.4f}"
                              f" (median gap {np.median(diffs):+.0f} updates)")
                except ImportError:
                    pass

    # The single-pair tail below picks the alphabetically-first rnd/ppo
    # pair, which is misleading whenever several seeds match (round-4
    # verdict, weak #3) — the aggregation above is the verdict then.
    if len(sparse_arms) > 2:
        print("\n(>1 seed matched: per-seed aggregation above is the "
              "sparse verdict; single-pair tail suppressed)")
        return

    rnd = next((v for k, v in arms.items() if k.startswith("rnd")), None)
    ppo = next((v for k, v in arms.items() if k.startswith("ppo")), None)
    if rnd and ppo and "goal_hits" in rnd[0] and "goal_hits" in ppo[0]:
        n = min(len(rnd), len(ppo))
        r_ret = np.array([r["return"] for r in rnd[:n]])
        p_ret = np.array([r["return"] for r in ppo[:n]])
        w = min(a.window, n)
        t = welch_t(r_ret[-w:], p_ret[-w:])
        print(
            f"\nSPARSE VERDICT @ matched {n} updates: RND last-{w} return "
            f"{r_ret[-w:].mean():.3f} vs PPO {p_ret[-w:].mean():.3f} "
            f"(Welch t = {t:.2f}); AUC {r_ret.mean():.3f} vs {p_ret.mean():.3f}"
        )
    if rnd and ppo:
        w = a.window
        r_last = np.array([r["rooms_per_episode"] for r in rnd[-w:]])
        p_all = np.array([r["rooms_per_episode"] for r in ppo])
        t = welch_t(r_last, p_all)
        print(
            f"\nRND last-{w} rooms/ep ({r_last.mean():.2f}) vs PPO overall "
            f"({p_all.mean():.2f}): Welch t = {t:.2f} "
            f"({'separation' if t > 3 else 'no clear separation'})"
        )
        n = min(len(rnd), len(ppo))
        rd = rnd[n - 1].get("rooms_discovered", 0.0)
        pd = ppo[n - 1].get("rooms_discovered", 0.0)
        if rd or pd:
            print(
                f"fleet discovery @ update {n}: RND {rd:.0f} vs PPO {pd:.0f} "
                f"rooms ({'RND ahead' if rd > pd else 'no RND advantage'}, "
                f"{rd - pd:+.0f})"
            )


if __name__ == "__main__":
    main()
