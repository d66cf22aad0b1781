"""Continuous action space end-to-end (reference agents.py:197-203,
292-324; model.py:97-101, 226-238): tanh-mu + learnable log_std Normal
policy, log-prob storage instead of logits."""

import numpy as np
import jax
import jax.numpy as jnp

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.models.policy import ActionSpaceType
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.rollout import RolloutCollector


class ContinuousSyntheticEnv:
    """Vectorized continuous-action env: action in R^2 moves a point; frames
    encode the position; reward = -|action|."""

    def __init__(self, num_envs, seed=0, stack=4, size=84, max_steps=16):
        self.num_envs = num_envs
        self.stack, self.size, self.max_steps = stack, size, max_steps
        self.action_space_n = None  # continuous
        self.action_dim = 2
        self.rng = np.random.default_rng(seed)
        self.pos = np.zeros((num_envs, 2), np.float32)
        self.steps = np.zeros(num_envs, np.int32)

    def _frames(self):
        yy = np.linspace(0, 2 * np.pi, self.size)
        f = 127.5 * (
            1
            + np.sin(yy[None, :, None] + self.pos[:, 0, None, None])
            * np.cos(yy[None, None, :] + self.pos[:, 1, None, None])
        )
        return np.clip(f, 0, 255).astype(np.uint8)

    def reset(self):
        self.pos[:] = 0
        self.steps[:] = 0
        f = self._frames()
        return np.repeat(f[:, None], self.stack, axis=1)

    def step(self, actions):
        actions = np.asarray(actions, np.float32)
        self.pos = self.pos + 0.1 * actions
        self.steps += 1
        rewards = -np.linalg.norm(actions, axis=-1).astype(np.float32)
        truns = self.steps >= self.max_steps
        dones = np.zeros(self.num_envs, np.bool_)
        f = self._frames()
        states = np.repeat(f[:, None], self.stack, axis=1)  # simplified stack
        infos = [
            {"episode": {"r": 0.0, "l": int(self.steps[i])}} if truns[i] else {}
            for i in range(self.num_envs)
        ]
        self.steps[truns] = 0
        return states, rewards, dones, truns, infos

    def close(self):
        pass


def test_continuous_trainer_pendulum(tmp_path):
    """Full driver on a REAL continuous-action env (Pendulum-v1 via the
    classic-control rgb-array stack): warm-up + 1 update."""
    import pytest

    pytest.importorskip("gymnasium")
    from eavit_tpu.config import EnvType
    from eavit_tpu.train import train

    cfg = Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        env_type=EnvType.CLASSIC_CONTROL,
        env_id="Pendulum-v1",
        sticky_action=False,
        num_step=8,
        num_env_per_process=2,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        max_step_per_episode=12,
        compute_dtype="float32",
        use_pallas_attention=False,
        async_env_pool=False,
        save_model_path=str(tmp_path / "ckpt"),
        save_ckpt_every=1,
        data_axis_size=1,
    )
    metrics = train(cfg, total_updates=1, log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])


def test_continuous_ppo_rnd_e2e():
    cfg = Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=8,
        num_env_per_process=4,
        mini_batch=2,
        epoch=2,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    env = ContinuousSyntheticEnv(4, max_steps=12)
    agent = RNDAgent(cfg, env.action_dim, action_space=ActionSpaceType.CONTINUOUS)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = RolloutCollector(cfg, agent, env)
    states = env.reset()

    # act returns continuous actions in [-1-ish] range and per-sample logp
    a, ve, vi, logp = agent.act(state.params, jnp.asarray(states), jax.random.PRNGKey(1))
    assert np.asarray(a).shape == (4, 2)
    assert np.asarray(logp).shape == (4, 1)

    rollout, states = collector.collect(state.params, states, jax.random.PRNGKey(2))
    assert np.asarray(rollout.actions).shape == (8, 4, 2)
    assert np.asarray(rollout.policy).shape == (8, 4, 1)
    state, metrics = agent.update(state, rollout, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train/loss"]))
    assert np.isfinite(float(metrics["train/entropy"]))
    # log_std is learnable: present in params
    assert "log_std" in state.params["policy"]


class _TargetEnv:
    """Constant-obs continuous env whose reward depends ONLY on the action:
    reward = -(a - 0.7)^2. The optimal tanh-mu is 0.7, so a correct PPO
    continuous path must move mu from ~0 toward +0.7 — a LEARNING check of
    the Normal log-prob/entropy gradients, not just their shapes
    (reference agents.py:197-203, 292-324)."""

    def __init__(self, num_envs, stack=4, size=84, max_steps=16):
        self.num_envs = num_envs
        self.stack, self.size, self.max_steps = stack, size, max_steps
        self.action_space_n = None
        self.action_dim = 1
        self.steps = np.zeros(num_envs, np.int32)

    def _stacked(self):
        f = np.full((self.num_envs, self.size, self.size), 128, np.uint8)
        return np.repeat(f[:, None], self.stack, axis=1)

    def reset(self):
        self.steps[:] = 0
        return self._stacked()

    def step(self, actions):
        actions = np.asarray(actions, np.float32)
        self.steps += 1
        rewards = -np.sum((actions - 0.7) ** 2, axis=-1).astype(np.float32)
        truns = self.steps >= self.max_steps
        dones = np.zeros(self.num_envs, np.bool_)
        infos = [
            {"episode": {"r": 0.0, "l": int(self.steps[i])}} if truns[i] else {}
            for i in range(self.num_envs)
        ]
        self.steps[truns] = 0
        return self._stacked(), rewards, dones, truns, infos

    def close(self):
        pass


def test_continuous_ppo_learns():
    """25 updates of plain PPO move tanh-mu from ~0 to >= +0.3 and improve
    the mean reward by >= 0.25 on the action-target env (calibrated on the
    round-5 CPU probe: mu ~+0.50, reward -0.80 -> -0.34 at update 24)."""
    cfg = Config(
        vit=ViTConfig(
            dim=64, patch_size=12, depth=1, heads=2, dim_head=32, mlp_dim=128,
            num_classes=-1, use_explorative_attn=True, dropout=0.0,
            emb_dropout=0.0,
        ),
        train_method=TrainMethod.PPO,
        num_step=16,
        num_env_per_process=8,
        epoch=4,
        mini_batch=4,
        obs_norm_step=0,
        int_coef=0.0,
        ext_coef=1.0,
        learning_rate=1e-3,
        entropy_coef=0.0,
        extracted_feature_embedding_dim=64,
    )
    env = _TargetEnv(8)
    agent = RNDAgent(cfg, 1, action_space=ActionSpaceType.CONTINUOUS)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    col = RolloutCollector(cfg, agent, env)
    states = env.reset()
    state = agent.update_obs_rms(state, jnp.asarray(col._next_obs_of(states)))
    first_reward = None
    last_reward = None
    for u in range(25):
        rng, k1, k2 = jax.random.split(rng, 3)
        ro, states = col.collect(state.params, states, k1)
        state, _ = agent.update(state, ro, k2)
        mean_r = float(np.mean(np.asarray(ro.rewards)))
        if first_reward is None:
            first_reward = mean_r
        last_reward = mean_r
    out = agent.network.apply(
        {"params": state.params["policy"]},
        jnp.asarray(col._next_obs_of(states), jnp.float32)[:1] / 255.0,
        True,
    )
    mu = float(out.policy[0, 0])
    assert mu >= 0.3, f"tanh-mu did not move toward the optimum: {mu:+.3f}"
    assert last_reward - first_reward >= 0.25, (
        f"reward did not improve: {first_reward:+.3f} -> {last_reward:+.3f}"
    )
