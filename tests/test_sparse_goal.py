"""Sparse-goal device env (envs/device_env.py): reward ONLY at the
BFS-farthest room, which terminates the episode — the Montezuma-shaped
regime (reference envs.py:222-245 room structure + sparse extrinsic
reward) for the exploration A/B."""

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.envs.device_env import (
    _bfs_distances,
    device_env_step,
    make_device_env,
)


def _bfs_path(walls, goal, grid):
    """Action sequence (1=up 2=down 3=left 4=right) from (0,0) to goal."""
    dist = _bfs_distances(walls)
    gy, gx = divmod(goal, grid)
    path = []
    y, x = gy, gx
    moves = [(-1, 0, 0, 2), (1, 0, 1, 1), (0, -1, 2, 4), (0, 1, 3, 3)]
    # walk the distance field backwards from the goal
    while dist[y, x] > 0:
        for dy, dx, d, back_action in moves:
            if walls[y, x, d]:
                continue
            ny, nx = (y + dy) % grid, (x + dx) % grid
            if dist[ny, nx] == dist[y, x] - 1:
                path.append(back_action)
                y, x = ny, nx
                break
        else:
            raise AssertionError("broken distance field")
    return list(reversed(path))


def test_goal_is_reachable_and_pays_exactly_once():
    grid = 6
    params, state = make_device_env(
        3, seed=7, grid=grid, maze=True, shared_world=True,
        max_episode_steps=200, sparse_goal=True,
    )
    walls = np.asarray(params.walls[0])
    goal = int(params.goal_rooms[0])
    dist = _bfs_distances(walls)
    assert dist[divmod(goal, grid)] == dist.max() > 0

    step = jax.jit(lambda s, a: device_env_step(params, s, a))
    path = _bfs_path(walls, goal, grid)
    total = np.zeros(3)
    for i, a in enumerate(path):
        state, r, done, trunc = step(state, jnp.full(3, a, jnp.int32))
        total += np.asarray(r)
        if i < len(path) - 1:
            # no reward anywhere but the goal (visits many fresh rooms
            # en route — dense mode would have paid every one)
            np.testing.assert_array_equal(np.asarray(r), 0.0)
            assert not bool(np.any(np.asarray(done)))
    np.testing.assert_array_equal(total, 1.0)
    assert bool(np.all(np.asarray(done)))  # goal TERMINATES
    # auto-reset happened: back at spawn with zeroed episode state
    np.testing.assert_array_equal(np.asarray(state.pos), 0)
    np.testing.assert_array_equal(np.asarray(state.episode_reward), 0.0)
    np.testing.assert_array_equal(np.asarray(state.finished_episodes), 1)
    np.testing.assert_array_equal(np.asarray(state.last_episode_return), 1.0)


def test_truncation_still_applies_without_goal():
    params, state = make_device_env(
        2, seed=3, grid=6, maze=True, shared_world=True,
        max_episode_steps=4, sparse_goal=True,
    )
    step = jax.jit(lambda s, a: device_env_step(params, s, a))
    for _ in range(4):
        state, r, done, trunc = step(state, jnp.zeros(2, jnp.int32))
    assert bool(np.all(np.asarray(trunc)))
    np.testing.assert_array_equal(np.asarray(r), 0.0)


def test_dense_mode_unchanged():
    params, _ = make_device_env(2, seed=3, grid=6, maze=True)
    assert params.goal_rooms is None
