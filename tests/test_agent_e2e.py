"""End-to-end slice: rollout -> one-big-jit PPO/RND update on synthetic envs.

Covers reference behavior train.py:580-870 + agents.py:263-535 at debug scale
(the reference's --debug_params smoke contract: 4 envs, NumStep=16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.envs.synthetic import SyntheticVectorEnv
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.rollout import RolloutCollector


def tiny_cfg(**kw) -> Config:
    base = dict(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        num_step=8,
        num_env_per_process=4,
        mini_batch=2,
        epoch=2,
        obs_norm_step=2,
        compute_dtype="float32",
        use_pallas_attention=False,
        max_step_per_episode=24,
    )
    base.update(kw)
    return Config(**base)


def run_updates(cfg, n_updates=2):
    env = SyntheticVectorEnv(
        cfg.num_env_per_process, seed=cfg.seed, max_episode_steps=24
    )
    agent = RNDAgent(cfg, env.action_space_n)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    state = agent.init_state(k_init)
    collector = RolloutCollector(cfg, agent, env)

    states = env.reset()
    rng, k_warm = jax.random.split(rng)
    state, states = collector.warmup_obs_rms(state, states, k_warm)

    all_metrics = []
    for _ in range(n_updates):
        rng, k_roll, k_upd = jax.random.split(rng, 3)
        rollout, states = collector.collect(state.params, states, k_roll)
        state, metrics = agent.update(state, rollout, k_upd)
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    return agent, state, all_metrics, collector


def test_original_rnd_e2e():
    cfg = tiny_cfg(train_method=TrainMethod.ORIGINAL_RND)
    agent, state, metrics, collector = run_updates(cfg)

    assert int(state.global_update) == 2
    from eavit_tpu.rl.agent import global_step_value
    assert global_step_value(state) == 2 * cfg.num_step * cfg.num_env_per_process
    for m in metrics:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
    # RND pieces actually ran
    assert metrics[0]["train/rnd_loss"] > 0
    assert metrics[0]["data/int_reward_per_rollout"] != 0
    # obs_rms warm-up moved the stats off init
    assert float(jnp.max(state.obs_rms.mean)) > 1.0  # raw-pixel scale
    assert float(state.obs_rms.count) > 100
    # reward_rms got updated
    assert float(state.reward_rms.count) > 1e-4
    # episode stats flowed
    assert collector.stats.num_episodes > 0
    assert collector.stats.total_visited_rooms


def test_ppo_only_e2e():
    cfg = tiny_cfg(train_method=TrainMethod.PPO)
    agent, state, metrics, _ = run_updates(cfg)
    assert state.obs_rms is None
    assert metrics[0]["train/rnd_loss"] == 0
    assert metrics[0]["train/critic_int_loss"] == 0
    assert np.isfinite(metrics[0]["train/loss"])


def test_modified_rnd_e2e():
    cfg = tiny_cfg(train_method=TrainMethod.MODIFIED_RND)
    agent, state, metrics, _ = run_updates(cfg)
    # obs_rms tracks embedding statistics [1, backbone_dim]
    assert state.obs_rms.mean.shape == (1, cfg.backbone_dim)
    assert metrics[0]["train/rnd_loss"] > 0


def test_params_change_and_target_frozen():
    cfg = tiny_cfg(train_method=TrainMethod.ORIGINAL_RND)
    env = SyntheticVectorEnv(cfg.num_env_per_process, seed=0, max_episode_steps=24)
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    target_before = jax.tree_util.tree_map(np.asarray, state.rnd_target)
    policy_before = jax.tree_util.tree_map(np.asarray, state.params["policy"])

    collector = RolloutCollector(cfg, agent, env)
    states = env.reset()
    rollout, states = collector.collect(state.params, states, jax.random.PRNGKey(1))
    state, _ = agent.update(state, rollout, jax.random.PRNGKey(2))

    # policy moved
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
        state.params["policy"],
        policy_before,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # RND target is bit-identical (frozen)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.rnd_target),
        jax.tree_util.tree_leaves(target_before),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_first_epoch_ratio_is_one():
    """On the first pass the new policy equals the old one, so PPO's ratio
    must be ~1 and approx_kl ~0 (reference asserts this mentally at
    agents.py:477). Requires deterministic forwards (no dropout) and a
    single epoch so no updates precede the measurement."""
    cfg = tiny_cfg(train_method=TrainMethod.PPO, epoch=1)
    env = SyntheticVectorEnv(cfg.num_env_per_process, seed=3, max_episode_steps=24)
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = RolloutCollector(cfg, agent, env)
    states = env.reset()
    rollout, _ = collector.collect(state.params, states, jax.random.PRNGKey(1))
    _, metrics = agent.update(state, rollout, jax.random.PRNGKey(2))
    # first-epoch mean over minibatches: the FIRST minibatch has ratio exactly
    # 1; later minibatches in the same epoch already saw updates, so the
    # epoch-mean KL is small but nonzero.
    assert abs(float(metrics["train/approx_kl"])) < 0.05


def test_global_step_pair_no_overflow():
    """[hi, lo] base-2**30 counter survives past int32 range."""
    from eavit_tpu.rl.agent import GLOBAL_STEP_BASE, _step_add, global_step_value

    class S:
        pass

    hi_lo = jnp.asarray([0, GLOBAL_STEP_BASE - 5], jnp.int32)
    hi_lo = _step_add(hi_lo, 8192)
    s = S()
    s.global_step = hi_lo
    assert global_step_value(s) == GLOBAL_STEP_BASE - 5 + 8192
    # march far past 2**31 frames
    for _ in range(4):
        hi_lo = _step_add(hi_lo, GLOBAL_STEP_BASE - 1)
    s.global_step = hi_lo
    assert global_step_value(s) == GLOBAL_STEP_BASE - 5 + 8192 + 4 * (
        GLOBAL_STEP_BASE - 1
    )
    assert global_step_value(s) > 2**31


def _adam_count(opt_state) -> int:
    """Largest integer 'count' leaf in the optax state (optimizer steps)."""
    counts = [
        int(leaf)
        for leaf in jax.tree_util.tree_leaves(opt_state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.integer)
        and jnp.ndim(leaf) == 0
    ]
    assert counts
    return max(counts)


def test_minibatch_merge_schedule():
    """MiniBatchMerge=m: same epoch/sample budget, mini_batch/m optimizer
    steps of m*batch_size samples (TPU-efficiency schedule, config.py).
    Documented divergence from the reference's fixed 4x32x256 schedule
    (train.py:111) — OFF by default."""
    _, state_ref, m_ref, _ = run_updates(tiny_cfg(mini_batch=4), n_updates=1)
    _, state_mrg, m_mrg, _ = run_updates(
        tiny_cfg(mini_batch=4, minibatch_merge=2), n_updates=1
    )
    # 2 epochs x 4 minibatches vs 2 epochs x 2 merged steps
    assert _adam_count(state_ref.opt_state) == 8
    assert _adam_count(state_mrg.opt_state) == 4
    for m in (m_ref[0], m_mrg[0]):
        assert np.isfinite(m["train/loss"])
    # merged steps still learn: params moved from init
    assert state_mrg.global_update == 1
