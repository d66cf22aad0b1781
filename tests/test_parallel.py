"""Data-parallel SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.envs.synthetic import SyntheticVectorEnv
from eavit_tpu.parallel.dp import DataParallelAgent, make_mesh
from eavit_tpu.rl.rollout import RolloutCollector


def tiny_cfg(n_envs=8):
    return Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=4,
        num_env_per_process=n_envs,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        compute_dtype="float32",
        use_pallas_attention=False,
    )


def test_dp_update_runs_and_replicas_agree():
    mesh = make_mesh(8)
    cfg = tiny_cfg(8)
    env = SyntheticVectorEnv(8, seed=0, max_episode_steps=16)
    dp = DataParallelAgent(cfg, env.action_space_n, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))

    collector = RolloutCollector(cfg, dp, env)
    states = env.reset()
    state, states = collector.warmup_obs_rms(state, states, jax.random.PRNGKey(1))
    rollout, states = collector.collect(state.params, states, jax.random.PRNGKey(2))
    state, metrics = dp.update(state, rollout, jax.random.PRNGKey(3))

    assert np.isfinite(float(metrics["train/loss"]))
    assert int(state.global_update) == 1
    # params replicated: every shard identical
    leaf = jax.tree_util.tree_leaves(state.params["policy"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # rewems stays per-env
    assert state.reward_filter.rewems.shape == (8,)


def test_dp_matches_single_device_math():
    """A DP update over 8 shards must match the single-device update on the
    same rollout (same total batch; pooled moments; pmean grads ~ same as
    full-batch grads when every device sees its slice and minibatches are
    aligned). We check the normalizer statistics agree exactly and params
    stay finite/replicated — bitwise optimizer equality is not expected
    because minibatch permutations differ."""
    from eavit_tpu.rl.agent import RNDAgent

    cfg = tiny_cfg(8)
    env = SyntheticVectorEnv(8, seed=0, max_episode_steps=16)

    mesh = make_mesh(8)
    dp = DataParallelAgent(cfg, env.action_space_n, mesh)
    state_dp = dp.init_state(jax.random.PRNGKey(0))

    single = RNDAgent(cfg, env.action_space_n)
    state_1 = single.init_state(jax.random.PRNGKey(0))

    collector = RolloutCollector(cfg, single, env)
    states = env.reset()
    rollout, _ = collector.collect(state_1.params, states, jax.random.PRNGKey(2))

    state_dp2, _ = dp.update(state_dp, rollout, jax.random.PRNGKey(3))
    state_12, _ = single.update(state_1, rollout, jax.random.PRNGKey(3))

    # obs_rms pooled over devices == global single-device moments
    np.testing.assert_allclose(
        np.asarray(state_dp2.obs_rms.mean),
        np.asarray(state_12.obs_rms.mean),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        float(state_dp2.obs_rms.count), float(state_12.obs_rms.count), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(state_dp2.reward_rms.mean), float(state_12.reward_rms.mean),
        rtol=1e-3, atol=1e-5,
    )


def test_dp_with_dual_query_backbone():
    """Data parallelism composes with the fused dual-query shared-KV mode:
    one update over the 8-device mesh, finite loss, replicas agree."""
    mesh = make_mesh(8)
    cfg = tiny_cfg(8).replace(shared_patch_stream=True)
    env = SyntheticVectorEnv(8, seed=0, max_episode_steps=16)
    dp = DataParallelAgent(cfg, env.action_space_n, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))
    collector = RolloutCollector(cfg, dp, env)
    states = env.reset()
    state, states = collector.warmup_obs_rms(state, states, jax.random.PRNGKey(1))
    rollout, states = collector.collect(state.params, states, jax.random.PRNGKey(2))
    state, metrics = dp.update(state, rollout, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train/loss"]))
    leaf = jax.tree_util.tree_leaves(state.params["policy"])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    env.close()
