"""Jittable on-device environment: the synthetic room-explorer as pure JAX.

A capability the reference architecture cannot express: with the env itself
a pure function, the ENTIRE rollout (act -> step -> buffer) compiles into a
single `lax.scan` — zero host involvement, zero host<->device transfers
until the update finishes. This is the gymnax/envpool-style path for
TPU-resident experiments and the framework's speed-of-light demonstration
(``EnvType = synthetic_device``).

Dynamics match :class:`eavit_tpu.envs.synthetic.SyntheticAtariEnv` without
sticky actions: a walk on a ``grid x grid`` torus of pre-rendered rooms;
+1 reward for each first visit; truncation at ``max_episode_steps`` with
auto-reset; observations are 4-frame uint8 stacks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceEnvParams(NamedTuple):
    frames: jnp.ndarray  # [W, G, G, V, H, W] uint8 pre-rendered room variants
    walls: jnp.ndarray  # [W, G, G, 4] bool — blocked (up, down, left, right)
    grid: int
    stack: int
    max_episode_steps: int
    # sparse-goal mode (None = dense first-visit rewards): [W] i32 room
    # index of the single rewarded cell per world. Reaching it pays +1 and
    # TERMINATES the episode — the Montezuma-shaped sparse regime
    # (reference envs.py:222-245 room semantics) where extrinsic-only PPO
    # flounders and intrinsic exploration is required to ever see reward.
    goal_rooms: jnp.ndarray | None = None
    # NOTE: the leading "world" dim W is num_envs for per-env worlds or 1
    # for shared_world (deduplicated — no N-fold HBM copy of one world)


class DeviceEnvState(NamedTuple):
    pos: jnp.ndarray  # [N, 2] int32
    steps: jnp.ndarray  # [N] int32
    visited: jnp.ndarray  # [N, G*G] bool (per-episode, reset on done)
    ever_visited: jnp.ndarray  # [N, G*G] bool (cumulative, never reset)
    episode_reward: jnp.ndarray  # [N] f32
    stack: jnp.ndarray  # [N, C, H, W] uint8
    # episode bookkeeping aggregates (device-side EpisodeStats)
    finished_episodes: jnp.ndarray  # [N] i32
    last_episode_return: jnp.ndarray  # [N] f32
    last_episode_rooms: jnp.ndarray  # [N] i32


def _maze_walls(grid: int, rng: np.random.Generator) -> np.ndarray:
    """DFS spanning-tree maze: [G, G, 4] blocked flags (up/down/left/right).

    Only corridors of the spanning tree are open, so random walks cover the
    map poorly — the regime where directed (RND) exploration separates from
    a random baseline.
    """
    walls = np.ones((grid, grid, 4), bool)
    visited = np.zeros((grid, grid), bool)
    stack = [(0, 0)]
    visited[0, 0] = True
    # (dy, dx, dir_index, opposite_dir_index)
    moves = [(-1, 0, 0, 1), (1, 0, 1, 0), (0, -1, 2, 3), (0, 1, 3, 2)]
    while stack:
        y, x = stack[-1]
        nbrs = []
        for dy, dx, d, od in moves:
            ny, nx = y + dy, x + dx
            if 0 <= ny < grid and 0 <= nx < grid and not visited[ny, nx]:
                nbrs.append((ny, nx, d, od))
        if not nbrs:
            stack.pop()
            continue
        ny, nx, d, od = nbrs[rng.integers(len(nbrs))]
        walls[y, x, d] = False
        walls[ny, nx, od] = False
        visited[ny, nx] = True
        stack.append((ny, nx))
    return walls


def _bfs_distances(walls: np.ndarray) -> np.ndarray:
    """[G, G, 4] blocked flags -> [G, G] BFS distance from (0, 0).

    Honors walls; moves wrap on the torus (matching device_env_step's
    modulo arithmetic). Unreachable cells get -1 (cannot happen for a DFS
    spanning-tree maze, which is connected by construction)."""
    g = walls.shape[0]
    dist = np.full((g, g), -1, np.int64)
    dist[0, 0] = 0
    frontier = [(0, 0)]
    moves = [(-1, 0, 0), (1, 0, 1), (0, -1, 2), (0, 1, 3)]
    while frontier:
        nxt = []
        for y, x in frontier:
            for dy, dx, d in moves:
                if walls[y, x, d]:
                    continue
                ny, nx = (y + dy) % g, (x + dx) % g
                if dist[ny, nx] < 0:
                    dist[ny, nx] = dist[y, x] + 1
                    nxt.append((ny, nx))
        frontier = nxt
    return dist


def goal_room_for_depth(walls: np.ndarray, goal_depth: int) -> int:
    """Flat room index of the sparse-goal cell for one world's walls.

    goal_depth=0: the BFS-farthest cell from the (0, 0) spawn (round-3
    semantics — the deepest leaf of the spanning tree). goal_depth>0: the
    reachable cell whose BFS depth is CLOSEST to the target, ties broken
    toward the deeper cell (lexicographic argmin of (|d - target|, -d)).
    Single source of truth shared by make_device_env and the regime
    calibration script (scripts/sparse_calibrate.py), so the calibration
    can never desynchronize from the env it measures."""
    dist = _bfs_distances(walls)
    if goal_depth > 0:
        grid = walls.shape[0]
        d = np.where(dist >= 0, dist, -(10 ** 9))
        score = np.abs(d - goal_depth) * (2 * grid * grid) - d
        return int(np.argmin(score))
    return int(np.argmax(dist))


def make_device_env(
    num_envs: int,
    seed: int = 42,
    grid: int = 8,
    stack: int = 4,
    height: int = 84,
    width: int = 84,
    max_episode_steps: int = 128,
    maze: bool = False,
    texture: str = "sine",
    shared_world: bool = False,
    variants: int = 1,
    sparse_goal: bool = False,
    goal_depth: int = 0,
) -> Tuple[DeviceEnvParams, DeviceEnvState]:
    """Build per-env room frames (host, once) and the initial device state.

    With ``maze=True`` movement is restricted to a DFS spanning-tree maze
    (per-env layout) and the torus wrap is disabled — a bottlenecked map
    where random walks stall.

    ``texture`` picks the room-frame family:
    - ``"sine"``: smooth 2-phase sinusoid per room (bit-exact pair of the
      host SyntheticAtariEnv). A 3-parameter family — an RND predictor
      GENERALIZES across rooms (measured ~100x frontier/visited error
      ratio after memorizing 20 rooms).
    - ``"noise"``: independent uniform-random texture per room — rooms are
      mutually unpredictable, so unvisited rooms keep full novelty
      (measured ~6000x frontier/visited ratio). The Montezuma-like regime
      for exploration studies.

    ``shared_world=True`` gives every env THE SAME textures and maze layout
    (env 0's), like N parallel actors in one Atari game — the reference's
    actual setting (64 workers, one Montezuma). Per-env worlds split the
    experience N ways: the policy must memorize N separate mazes and each
    room is seen N-times less often. Stored deduplicated (world dim 1).

    ``variants > 1`` pre-renders V frame variants per room and shows variant
    ``steps % V`` — Montezuma-like frame variety (sprites move, timers tick):
    an RND predictor needs ~V visits to extinguish a room's novelty, so
    prediction error decays with VISITATION COUNT instead of dying on first
    sight. The continual-novelty regime for exploration studies.
    """
    n_worlds = 1 if shared_world else num_envs
    cells = np.empty(
        (n_worlds, grid, grid, variants, height, width), np.uint8
    )
    if texture == "noise":
        for i in range(n_worlds):
            pat_rng = np.random.default_rng((seed + i) * 7919 + 13)
            cells[i] = pat_rng.integers(
                0, 256, (grid, grid, variants, height, width), dtype=np.uint8
            )
    elif texture == "sine":
        yy = np.linspace(0, 4 * np.pi, height)[:, None]
        xx = np.linspace(0, 4 * np.pi, width)[None, :]
        idx = np.arange(grid * grid).reshape(grid, grid)
        for i in range(n_worlds):
            pat_rng = np.random.default_rng((seed + i) * 7919 + 13)
            phase = pat_rng.uniform(0, 2 * np.pi, size=(grid, grid, variants, 2))
            c = 127.5 * (
                1
                + np.sin(yy[None, None, None] + phase[..., 0:1, None])
                * np.cos(xx[None, None, None] + phase[..., 1:2, None])
            )
            c += 40.0 * (idx[..., None, None, None] / (grid * grid))
            cells[i] = np.clip(c, 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"unknown texture: {texture!r}")

    if maze:
        walls = np.stack(
            [
                _maze_walls(grid, np.random.default_rng((seed + i) * 104729 + 7))
                for i in range(n_worlds)
            ]
        )
    else:
        walls = np.zeros((n_worlds, grid, grid, 4), bool)

    goal_rooms = None
    if sparse_goal:
        # goal placement by BFS depth from the spawn. goal_depth=0 (default)
        # keeps the round-3 semantics: the BFS-farthest cell — the deepest
        # leaf of the maze's spanning tree (or the torus antipode when
        # maze=False), the longest corridor a random walk must thread before
        # EVER seeing extrinsic reward. goal_depth>0 instead picks the
        # reachable cell whose depth is CLOSEST to the target (ties -> the
        # deeper cell): direct control of sparse-reward difficulty, used by
        # the round-4 middle-regime A/B (the round-3 extremes — depth 46
        # single-variant and depth 231 flooded-novelty — bracketed the
        # learnable band without landing in it).
        goals = [
            goal_room_for_depth(walls[i], goal_depth) for i in range(n_worlds)
        ]
        goal_rooms = jnp.asarray(goals, jnp.int32)

    params = DeviceEnvParams(
        frames=jnp.asarray(cells),
        walls=jnp.asarray(walls),
        grid=grid,
        stack=stack,
        max_episode_steps=max_episode_steps,
        goal_rooms=goal_rooms,
    )
    state = device_env_reset(params, num_envs)
    return params, state


def _world_idx(params: DeviceEnvParams, n: int) -> jnp.ndarray:
    """Per-env world index: identity for per-env worlds, all-0 when the
    world table is deduplicated (shared_world)."""
    return jnp.arange(n) % params.frames.shape[0]


def _frame_at(
    params: DeviceEnvParams, pos: jnp.ndarray, steps: jnp.ndarray
) -> jnp.ndarray:
    """([N, 2], [N]) -> [N, H, W] room frames (variant = steps % V)."""
    n = pos.shape[0]
    v = steps % params.frames.shape[3]
    return params.frames[_world_idx(params, n), pos[:, 0], pos[:, 1], v]


def device_env_reset(params: DeviceEnvParams, num_envs: int) -> DeviceEnvState:
    g = params.grid
    pos = jnp.zeros((num_envs, 2), jnp.int32)
    visited = jnp.zeros((num_envs, g * g), bool).at[:, 0].set(True)
    frame = _frame_at(params, pos, jnp.zeros(num_envs, jnp.int32))
    return DeviceEnvState(
        pos=pos,
        steps=jnp.zeros(num_envs, jnp.int32),
        visited=visited,
        # distinct buffer (same values): aliasing the visited array would
        # make donated env-state pytrees donate one buffer twice
        ever_visited=jnp.zeros((num_envs, g * g), bool).at[:, 0].set(True),
        episode_reward=jnp.zeros(num_envs, jnp.float32),
        stack=jnp.repeat(frame[:, None], params.stack, axis=1),
        finished_episodes=jnp.zeros(num_envs, jnp.int32),
        last_episode_return=jnp.zeros(num_envs, jnp.float32),
        last_episode_rooms=jnp.zeros(num_envs, jnp.int32),
    )


def device_env_step(
    params: DeviceEnvParams, state: DeviceEnvState, actions: jnp.ndarray
) -> Tuple[DeviceEnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One vectorized step. Returns (state', rewards, dones, truncated).

    Action semantics match SyntheticAtariEnv.step: 0 noop, 1 up, 2 down,
    3 left, 4 right on a torus; +1 for first visit; truncate at the cap;
    auto-reset (FrameStack reset fill) — all branch-free.
    """
    g = params.grid
    n = actions.shape[0]
    dy = jnp.where(actions == 1, -1, 0) + jnp.where(actions == 2, 1, 0)
    dx = jnp.where(actions == 3, -1, 0) + jnp.where(actions == 4, 1, 0)
    # direction index: 0 up, 1 down, 2 left, 3 right (noop mapped to 0 but
    # gated by moved); blocked moves keep the current position
    dir_idx = jnp.clip(actions - 1, 0, 3)
    moved = actions > 0
    blocked = params.walls[
        _world_idx(params, n), state.pos[:, 0], state.pos[:, 1], dir_idx
    ]
    allow = moved & ~blocked
    dy = jnp.where(allow, dy, 0)
    dx = jnp.where(allow, dx, 0)
    pos = jnp.stack(
        [(state.pos[:, 0] + dy) % g, (state.pos[:, 1] + dx) % g], axis=1
    )
    room = pos[:, 0] * g + pos[:, 1]
    first_visit = ~state.visited[jnp.arange(n), room]
    visited = state.visited.at[jnp.arange(n), room].set(True)
    ever_visited = state.ever_visited.at[jnp.arange(n), room].set(True)
    if params.goal_rooms is None:
        # dense mode: +1 per first visit, episodes end only by truncation
        reward = first_visit.astype(jnp.float32)
        dones = jnp.zeros(n, bool)
    else:
        # sparse mode: +1 ONLY at the goal room, which terminates the
        # episode (Montezuma-shaped — visited/ever_visited still track
        # coverage for diagnostics)
        at_goal = room == params.goal_rooms[_world_idx(params, n)]
        reward = at_goal.astype(jnp.float32)
        dones = at_goal
    episode_reward = state.episode_reward + reward
    steps = state.steps + 1

    truncated = (steps >= params.max_episode_steps) & ~dones
    reset = dones | truncated

    frame = _frame_at(params, pos, steps)
    shifted = jnp.concatenate([state.stack[:, 1:], frame[:, None]], axis=1)

    # auto-reset: back to room (0, 0), fresh visit set, reset-filled stack
    pos0 = jnp.zeros_like(pos)
    frame0 = _frame_at(params, pos0, jnp.zeros_like(steps))
    stack0 = jnp.repeat(frame0[:, None], params.stack, axis=1)
    visited0 = jnp.zeros_like(visited).at[:, 0].set(True)

    r = reset[:, None]
    new_state = DeviceEnvState(
        pos=jnp.where(r, pos0, pos),
        steps=jnp.where(reset, 0, steps),
        visited=jnp.where(r, visited0, visited),
        ever_visited=ever_visited,  # cumulative discovery — survives resets
        episode_reward=jnp.where(reset, 0.0, episode_reward),
        stack=jnp.where(reset[:, None, None, None], stack0, shifted),
        finished_episodes=state.finished_episodes + reset.astype(jnp.int32),
        last_episode_return=jnp.where(
            reset, episode_reward, state.last_episode_return
        ),
        last_episode_rooms=jnp.where(
            reset, jnp.sum(visited, axis=1).astype(jnp.int32),
            state.last_episode_rooms,
        ),
    )
    return new_state, reward, dones, truncated
