"""REAL-environment validation: gymnasium classic-control is installed in
this image, so the classic_control builder path (reference envs.py:489-578)
runs against an actual physics env — pixels-from-render, the reference's
wrapper stack (no sticky/skip, envs.py:513-517), auto-reset, PPO update.

(ALE and nes-py are NOT installed and cannot be added — the Atari/Mario
builders are code-complete but environment-gated; see BASELINE.md.)
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

import jax

from eavit_tpu.config import Config, EnvType, TrainMethod, ViTConfig
from eavit_tpu.envs.builders import make_vector_env


def cfg(**kw):
    base = dict(
        env_type=EnvType.CLASSIC_CONTROL,
        env_id="CartPole-v1",
        train_method=TrainMethod.PPO,
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        num_step=8,
        num_env_per_process=2,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        compute_dtype="float32",
        use_pallas_attention=False,
        max_step_per_episode=50,
        sticky_action=False,
    )
    base.update(kw)
    return Config(**base)


def test_real_cartpole_wrapper_stack():
    c = cfg()
    env = make_vector_env(c, rank=0)
    s = env.reset()
    assert s.shape == (2, 4, 84, 84) and s.dtype == np.uint8
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.integers(0, env.action_space_n, size=2)
        s, r, d, t, infos = env.step(a)
        assert s.shape == (2, 4, 84, 84)
        assert np.isfinite(r).all()
    env.close()


def test_real_cartpole_trains_end_to_end():
    from eavit_tpu.rl.agent import RNDAgent
    from eavit_tpu.rl.device_rollout import DeviceRolloutCollector

    c = cfg()
    env = make_vector_env(c, rank=0)
    agent = RNDAgent(c, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = DeviceRolloutCollector(c, agent, env)
    states = env.reset()
    rollout, states = collector.collect(state.params, states, jax.random.PRNGKey(1))
    state, metrics = agent.update(state, rollout, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["train/loss"]))
    assert collector.stats.num_episodes >= 0
    env.close()
