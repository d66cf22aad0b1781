"""Round-4 middle-regime sparse-goal knobs (VERDICT r3 item 2): goal
placement by BFS-depth target and linear int_coef annealing.

The round-3 sparse extremes (depth 46 / variants 1 and depth 231 /
variants 16) bracketed the learnable band; these knobs let the A/B land
inside it. Reference context: RND on sparse Montezuma (model.py:357-461,
train.py:126-130) and its constant IntCoef (agents.py:472) — the anneal is
a TPU-side extension, default-off."""

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.envs.device_env import (
    _bfs_distances,
    _maze_walls,
    make_device_env,
)
from eavit_tpu.rl.agent import RNDAgent


def test_goal_depth_places_goal_at_target_depth():
    params, _ = make_device_env(
        2, seed=42, grid=8, maze=True, shared_world=True,
        sparse_goal=True, goal_depth=24,
    )
    walls = np.asarray(params.walls[0])
    dist = _bfs_distances(walls).reshape(-1)
    goal = int(params.goal_rooms[0])
    assert dist[goal] == 24  # depth 24 exists in the seed-42 8x8 maze
    # depth target beyond the tree's max falls back to the deepest cell
    params2, _ = make_device_env(
        2, seed=42, grid=8, maze=True, shared_world=True,
        sparse_goal=True, goal_depth=10 ** 6,
    )
    assert dist[int(params2.goal_rooms[0])] == dist.max()


def test_goal_depth_zero_keeps_farthest_semantics():
    for seed in (7, 42):
        walls = _maze_walls(8, np.random.default_rng(seed * 104729 + 7))
        dist = _bfs_distances(walls).reshape(-1)
        params, _ = make_device_env(
            1, seed=seed, grid=8, maze=True, shared_world=True,
            sparse_goal=True,
        )
        assert dist[int(params.goal_rooms[0])] == dist.max()


def _tiny_cfg(**kw):
    from eavit_tpu.config import ViTConfig

    return Config(
        train_method=TrainMethod.ORIGINAL_RND,
        num_env_per_process=2,
        num_step=8,
        epoch=1,
        mini_batch=2,
        pre_proc_height=36,
        pre_proc_width=36,
        vit=ViTConfig(dim=32, patch_size=12, depth=1, heads=2,
                      mlp_dim=64, dim_head=16),
        extracted_feature_embedding_dim=32,
        **kw,
    )


def _run_update(agent, state, key):
    from eavit_tpu.rl.agent import Rollout

    T, N = agent.cfg.num_step, agent.cfg.num_env_per_process
    H = W = agent.cfg.pre_proc_height
    C = agent.cfg.state_stack_size
    k1, k2 = jax.random.split(key)
    obs = jax.random.randint(k1, (T, N, C, H, W), 0, 255, jnp.int32)
    ro = Rollout(
        states=obs.astype(jnp.uint8),
        actions=jnp.zeros((T, N), jnp.int32),
        rewards=jnp.zeros((T, N), jnp.float32),
        dones=jnp.zeros((T, N), bool),
        next_obs=obs[:, :, -1:].astype(jnp.uint8),
        value_ext=jnp.zeros((T + 1, N), jnp.float32),
        value_int=jnp.zeros((T + 1, N), jnp.float32),
        policy=jnp.zeros((T, N, agent.output_size), jnp.float32),
    )
    return agent.update(state, ro, k2)


def test_int_coef_anneals_with_global_update():
    cfg = _tiny_cfg(int_coef=4.0, int_coef_decay_updates=4)
    agent = RNDAgent(cfg, 3)
    state = agent.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    coefs = []
    for i in range(5):
        key, k = jax.random.split(key)
        state, metrics = _run_update(agent, state, k)
        coefs.append(float(metrics["train/int_coef"]))
    # linear 4.0 * (1 - u/4) evaluated at u = 0, 1, 2, 3, 4
    np.testing.assert_allclose(coefs, [4.0, 3.0, 2.0, 1.0, 0.0], atol=1e-6)


def test_int_coef_constant_by_default():
    cfg = _tiny_cfg(int_coef=2.0)
    agent = RNDAgent(cfg, 3)
    state = agent.init_state(jax.random.PRNGKey(0))
    state, metrics = _run_update(agent, state, jax.random.PRNGKey(1))
    assert "train/int_coef" not in metrics  # reference behavior: constant
