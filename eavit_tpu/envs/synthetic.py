"""Deterministic synthetic Atari-like environment.

Purpose (SURVEY.md §4): the reference's tests hit real ALE; this machine has
no ALE/nes-py, and unit tests should not depend on emulators anyway. This env
produces procedurally generated 84x84 grayscale frames with Atari-compatible
shapes/dtypes, sparse rewards, an explorable "room" structure mirroring
``MontezumaInfoWrapper``'s visited-room metric (reference envs.py:222-245),
and fully deterministic dynamics given a seed — so preprocessing, rollout,
GAE, RND, and checkpoint logic are testable bit-for-bit, and benchmarks can
measure framework throughput without emulator noise.

Dynamics: the agent walks on a ``grid x grid`` torus; each cell renders a
distinct frame (checkerboard + position-dependent stripes). Entering an
unvisited cell yields +1 reward; episodes end after ``max_episode_steps``.
Action space: 5 discrete actions (noop / up / down / left / right).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np


class SyntheticAtariEnv:
    """Single synthetic env with the reference worker's observation contract:
    stacked uint8 frames [stack, H, W]."""

    metadata = {"render_modes": ["rgb_array"]}

    def __init__(
        self,
        seed: int = 0,
        height: int = 84,
        width: int = 84,
        stack: int = 4,
        grid: int = 8,
        max_episode_steps: int = 4500,
        sticky_action: bool = False,
        action_prob: float = 0.25,
    ):
        self.h, self.w, self.stack = height, width, stack
        self.grid = grid
        self.max_episode_steps = max_episode_steps
        self.sticky_action = sticky_action
        self.action_prob = action_prob
        self.action_space_n = 5
        self.rng = np.random.default_rng(seed)
        self.seed = seed
        # position-dependent frames, fixed per seed, pre-rendered once so
        # stepping costs O(memcpy) and benchmarks measure the framework
        pat_rng = np.random.default_rng(seed * 7919 + 13)
        phase = pat_rng.uniform(0, 2 * np.pi, size=(grid, grid, 2))
        yy = np.linspace(0, 4 * np.pi, self.h)[:, None]
        xx = np.linspace(0, 4 * np.pi, self.w)[None, :]
        cells = 127.5 * (
            1
            + np.sin(yy[None, None] + phase[..., 0:1, None])
            * np.cos(xx[None, None] + phase[..., 1:2, None])
        )
        idx = np.arange(grid * grid).reshape(grid, grid)
        cells += 40.0 * (idx[..., None, None] / (grid * grid))
        self._frames_cache = np.clip(cells, 0, 255).astype(np.uint8)
        self.reset()

    # -- rendering ---------------------------------------------------------
    def _frame(self) -> np.ndarray:
        gy, gx = self.pos
        return self._frames_cache[gy, gx]

    def render(self) -> np.ndarray:
        f = self._frame()
        return np.stack([f, f, f], axis=-1)

    # -- gym-ish API ---------------------------------------------------------
    def reset(self) -> Tuple[np.ndarray, Dict]:
        self.pos = (0, 0)
        self.steps = 0
        self.episode_reward = 0.0
        self.visited: Set[int] = {0}
        self.last_action = 0
        self.frames = np.repeat(self._frame()[None], self.stack, axis=0)
        return self.frames.copy(), {}

    def step(self, action: int):
        if self.sticky_action and self.rng.random() <= self.action_prob:
            action = self.last_action
        self.last_action = action

        dy = {1: -1, 2: 1}.get(action, 0)
        dx = {3: -1, 4: 1}.get(action, 0)
        self.pos = (
            (self.pos[0] + dy) % self.grid,
            (self.pos[1] + dx) % self.grid,
        )
        room = self.pos[0] * self.grid + self.pos[1]
        reward = 1.0 if room not in self.visited else 0.0
        self.visited.add(room)
        self.episode_reward += reward

        self.frames = np.concatenate([self.frames[1:], self._frame()[None]], axis=0)
        self.steps += 1
        terminated = False
        truncated = self.steps >= self.max_episode_steps
        info = {"visited_rooms": set(self.visited)}
        if terminated or truncated:
            info["episode"] = {
                "r": self.episode_reward,
                "l": self.steps,
                "visited_rooms": set(self.visited),
            }
        return self.frames.copy(), reward, terminated, truncated, info


class SyntheticVectorEnv:
    """Natively vectorized fleet of :class:`SyntheticAtariEnv`.

    Replaces the reference's one-OS-process-per-env Pipe fleet
    (dist_utils.py:84-117) for tests and benchmarks: same per-env seeding
    convention ``seed + rank * num_env + idx`` (dist_utils.py:108-109),
    auto-reset on episode end (reference envs.py:333).
    """

    def __init__(
        self,
        num_envs: int,
        seed: int = 42,
        rank: int = 0,
        stack: int = 4,
        height: int = 84,
        width: int = 84,
        max_episode_steps: int = 128,
        sticky_action: bool = False,
        grid: int = 8,
    ):
        self.num_envs = num_envs
        self.envs = [
            SyntheticAtariEnv(
                seed=seed + rank * num_envs + i,
                stack=stack,
                height=height,
                width=width,
                grid=grid,
                max_episode_steps=max_episode_steps,
                sticky_action=sticky_action,
            )
            for i in range(num_envs)
        ]
        self.action_space_n = self.envs[0].action_space_n

    def sample_random_actions(self, rng: np.random.Generator) -> np.ndarray:
        return rng.integers(0, self.action_space_n, size=self.num_envs)

    def reset(self) -> np.ndarray:
        return np.stack([e.reset()[0] for e in self.envs])

    def step(self, actions: np.ndarray):
        return self.step_slice(0, self.num_envs, actions)

    def step_slice(self, lo: int, hi: int, actions: np.ndarray):
        """Step only envs [lo, hi) (rollout pipelining support)."""
        states, rewards, dones, truns, infos = [], [], [], [], []
        for env, a in zip(self.envs[lo:hi], actions):
            s, r, d, t, info = env.step(int(a))
            if d or t:
                s, _ = env.reset()
            states.append(s)
            rewards.append(r)
            dones.append(d)
            truns.append(t)
            infos.append(info)
        return (
            np.stack(states),
            np.asarray(rewards, np.float32),
            np.asarray(dones, np.bool_),
            np.asarray(truns, np.bool_),
            infos,
        )

    def close(self) -> None:
        pass
