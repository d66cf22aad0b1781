"""Calibrate the round-4 middle-regime sparse-goal maze (VERDICT r3 item 2).

Round 3's two sparse regimes bracketed the learnable band: depth 46 with
single-variant frames (intrinsic dead by update ~35, uniform hits ~0.05 per
rollout — too rare to bootstrap) and depth 231 with 16 variants (goal never
encountered). This script measures, in pure numpy on the EXACT maze the
device env builds (same seed → same `_maze_walls` spanning tree, spawn
(0,0), 5-action blocked-move walk, terminate-at-goal), the uniform-policy
goal-encounter rate for candidate (grid, goal_depth, ep_len) regimes — the
PPO arm's learning signal at initialization. Pick the regime where uniform
encounters are rare-but-present (~0.1-0.5 hits per 32x128 rollout) and an
informed walker (goal-biased action mixture) hits reliably, i.e. there is
headroom for exploration to convert encounters into returns.

Usage: python scripts/sparse_calibrate.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eavit_tpu.envs.device_env import (
    _bfs_distances,
    _maze_walls,
    goal_room_for_depth,
)

# movement tables match device_env_step: actions 0 noop, 1 up, 2 down,
# 3 left, 4 right; dir_idx = action-1; walls[y,x,d] blocks
DY = np.array([0, -1, 1, 0, 0])
DX = np.array([0, 0, 0, -1, 1])


def build(grid: int, seed: int, goal_depth: int):
    # world i=0's stream: (seed + i) * 104729 + 7 (make_device_env)
    walls = _maze_walls(grid, np.random.default_rng(seed * 104729 + 7))
    dist = _bfs_distances(walls)
    # placement comes from the env's own helper — the calibration measures
    # the EXACT goal the env will build, by construction
    goal = goal_room_for_depth(walls, goal_depth)
    return walls, dist, goal


def walk_hits(walls, goal, ep_len, episodes, rng, bias=None, dist=None):
    """Episodes of a (possibly goal-biased) walk; returns hit fraction and
    mean steps-to-goal among hits. bias=None -> uniform over 5 actions;
    bias=p -> with prob p take the BFS-descent action toward the goal."""
    g = walls.shape[0]
    gy, gx = divmod(goal, g)
    if bias is not None:
        # per-cell greedy action: neighbor with smaller BFS distance TO GOAL
        dist_to_goal = _bfs_from(walls, gy, gx)
    hits = 0
    steps_sum = 0
    for _ in range(episodes):
        y = x = 0
        for t in range(1, ep_len + 1):
            if bias is not None and rng.random() < bias:
                a = _greedy_action(walls, dist_to_goal, y, x)
            else:
                a = rng.integers(0, 5)
            if a > 0 and not walls[y, x, a - 1]:
                y = (y + DY[a]) % g
                x = (x + DX[a]) % g
            if y == gy and x == gx:
                hits += 1
                steps_sum += t
                break
    return hits / episodes, (steps_sum / hits if hits else float("nan"))


def _bfs_from(walls, sy, sx):
    g = walls.shape[0]
    dist = np.full((g, g), -1, np.int32)
    dist[sy, sx] = 0
    frontier = [(sy, sx)]
    while frontier:
        nxt = []
        for y, x in frontier:
            for d, (dy, dx) in enumerate(((-1, 0), (1, 0), (0, -1), (0, 1))):
                if walls[y, x, d]:
                    continue
                ny, nx = (y + dy) % g, (x + dx) % g
                if dist[ny, nx] < 0:
                    dist[ny, nx] = dist[y, x] + 1
                    nxt.append((ny, nx))
        frontier = nxt
    return dist


def _greedy_action(walls, dist_to_goal, y, x):
    g = walls.shape[0]
    best_a, best_d = 0, dist_to_goal[y, x]
    for a in (1, 2, 3, 4):
        if walls[y, x, a - 1]:
            continue
        ny, nx = (y + DY[a]) % g, (x + DX[a]) % g
        if dist_to_goal[ny, nx] >= 0 and dist_to_goal[ny, nx] < best_d:
            best_a, best_d = a, dist_to_goal[ny, nx]
    return best_a


def main():
    seed = 42  # maze_ab.py shared_world -> world 0 uses cfg.seed
    episodes = 4000
    rng = np.random.default_rng(0)
    print(f"{'grid':>4} {'tgt':>4} {'depth':>5} {'ep_len':>6} "
          f"{'unif hit%':>9} {'hits/rollout':>12} {'biased.5 hit%':>13} "
          f"{'steps|hit':>9}")
    for grid in (8, 10, 12):
        for tgt in (16, 20, 24, 28):
            walls, dist, goal = build(grid, seed, tgt)
            depth = int(dist.reshape(-1)[goal])
            if depth != tgt and abs(depth - tgt) > 6:
                continue
            for ep_len in (256, 384):
                u, su = walk_hits(walls, goal, ep_len, episodes, rng)
                b, sb = walk_hits(walls, goal, ep_len, episodes // 4, rng,
                                  bias=0.5)
                # hits per 32-env x 128-step rollout at uniform policy:
                # episode throughput per rollout = 32*128/E[ep length]
                mean_len = ep_len * (1 - u) + (su if u else ep_len) * u
                per_rollout = 32 * 128 / mean_len * u
                print(f"{grid:>4} {tgt:>4} {depth:>5} {ep_len:>6} "
                      f"{100*u:>8.2f}% {per_rollout:>12.3f} "
                      f"{100*b:>12.1f}% {su:>9.0f}")


if __name__ == "__main__":
    main()
