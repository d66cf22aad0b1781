"""Device-resident rollout must reproduce the host pool's states exactly:
the on-device frame-stack mirror (shift/append + reset broadcast) is
lock-step with FrameStack semantics in the env."""

import jax
import numpy as np

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.envs.synthetic import SyntheticVectorEnv
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.device_rollout import DeviceRolloutCollector


class RecordingEnv:
    """Wraps a vector env, recording every state it returns."""

    def __init__(self, env):
        self.env = env
        self.recorded_states = []
        self.num_envs = env.num_envs
        self.action_space_n = env.action_space_n

    def reset(self):
        s = self.env.reset()
        self.recorded_states = [s.copy()]
        return s

    def step(self, actions):
        out = self.env.step(actions)
        self.recorded_states.append(out[0].copy())
        return out


def tiny_cfg():
    return Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=10,
        num_env_per_process=3,
        mini_batch=2,
        epoch=1,
        compute_dtype="float32",
        use_pallas_attention=False,
    )


def test_device_stack_matches_host_states():
    cfg = tiny_cfg()
    # short episodes force mid-rollout resets, exercising the broadcast path
    env = RecordingEnv(
        SyntheticVectorEnv(cfg.num_env_per_process, seed=7, max_episode_steps=4)
    )
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = DeviceRolloutCollector(cfg, agent, env)

    states = env.reset()
    rollout, final_states = collector.collect(
        state.params, states, jax.random.PRNGKey(1)
    )

    dev_states = np.asarray(rollout.states)  # [T, N, C, H, W]
    for t in range(cfg.num_step):
        np.testing.assert_array_equal(
            dev_states[t],
            env.recorded_states[t],
            err_msg=f"device stack diverged from env state at step {t}",
        )
    # next_obs[t] is the last frame of the state AFTER action t
    dev_next = np.asarray(rollout.next_obs)  # [T, N, 1, H, W]
    for t in range(cfg.num_step):
        np.testing.assert_array_equal(
            dev_next[t][:, 0], env.recorded_states[t + 1][:, -1]
        )
    # resets occurred (episode cap 4 < num_step 10)
    assert collector.stats.num_episodes > 0


def test_device_rollout_feeds_update():
    cfg = tiny_cfg()
    env = SyntheticVectorEnv(cfg.num_env_per_process, seed=3, max_episode_steps=6)
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = DeviceRolloutCollector(cfg, agent, env)
    states = env.reset()
    for u in range(2):
        rollout, states = collector.collect(
            state.params, states, jax.random.PRNGKey(10 + u)
        )
        state, metrics = agent.update(state, rollout, jax.random.PRNGKey(20 + u))
        assert np.isfinite(float(metrics["train/loss"]))
    assert int(state.global_update) == 2


class RecordingSliceEnv:
    """Wraps a vector env with step_slice, recording per-half states."""

    def __init__(self, env):
        self.env = env
        self.num_envs = env.num_envs
        self.action_space_n = env.action_space_n
        self.rec = {}

    def reset(self):
        s = self.env.reset()
        self.rec = {}
        self._initial = s.copy()
        return s

    def step_slice(self, lo, hi, actions):
        out = self.env.step_slice(lo, hi, actions)
        self.rec.setdefault(lo, [self._initial[lo:hi].copy()]).append(
            out[0].copy()
        )
        return out


def test_pipelined_rollout_matches_env_lockstep():
    """Half-fleet pipelined rollout: device stacks stay lock-step with the
    env per half, including mid-rollout resets."""
    cfg = tiny_cfg().replace(num_env_per_process=4, async_env_pool=True)
    env = RecordingSliceEnv(
        SyntheticVectorEnv(cfg.num_env_per_process, seed=7, max_episode_steps=4)
    )
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = DeviceRolloutCollector(cfg, agent, env)
    assert collector._pipelined

    states = env.reset()
    rollout, final_states = collector.collect(
        state.params, states, jax.random.PRNGKey(1)
    )
    dev_states = np.asarray(rollout.states)  # [T, N, C, H, W]
    dev_next = np.asarray(rollout.next_obs)
    h = cfg.num_env_per_process // 2
    for lo in (0, h):
        recorded = env.rec[lo]
        for t in range(cfg.num_step):
            np.testing.assert_array_equal(
                dev_states[t, lo : lo + h],
                recorded[t],
                err_msg=f"half {lo} diverged at step {t}",
            )
            np.testing.assert_array_equal(
                dev_next[t, lo : lo + h][:, 0], recorded[t + 1][:, -1]
            )
    assert np.array_equal(
        final_states, np.concatenate([env.rec[0][-1], env.rec[h][-1]])
    )
    assert collector.stats.num_episodes > 0


def test_pipelined_rollout_feeds_update():
    cfg = tiny_cfg().replace(num_env_per_process=4, async_env_pool=True)
    env = SyntheticVectorEnv(cfg.num_env_per_process, seed=3, max_episode_steps=6)
    agent = RNDAgent(cfg, env.action_space_n)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = DeviceRolloutCollector(cfg, agent, env)
    assert collector._pipelined
    states = env.reset()
    for u in range(2):
        rollout, states = collector.collect(
            state.params, states, jax.random.PRNGKey(10 + u)
        )
        state, metrics = agent.update(state, rollout, jax.random.PRNGKey(20 + u))
        assert np.isfinite(float(metrics["train/loss"]))
    assert int(state.global_update) == 2


def test_row_mode_matches_buffered_protocol():
    """The row-mode rollout (single packed u8 upload per step, per-step-row
    outputs, one on-device stack at rollout end) must be bit-identical to
    the buffered five-array tuple protocol."""
    cfg = tiny_cfg()
    rollouts = []
    for force_unpacked in (False, True):
        env = SyntheticVectorEnv(
            cfg.num_env_per_process, seed=11, max_episode_steps=4
        )
        agent = RNDAgent(cfg, env.action_space_n)
        state = agent.init_state(jax.random.PRNGKey(0))
        collector = DeviceRolloutCollector(cfg, agent, env)
        collector._force_unpacked = force_unpacked
        states = env.reset()
        # two collects: the second exercises _reseed + a reused _paybuf
        ro, states = collector.collect(state.params, states, jax.random.PRNGKey(1))
        ro, _ = collector.collect(state.params, states, jax.random.PRNGKey(2))
        rollouts.append(ro)
    row_mode, buffered = rollouts
    for name in row_mode._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(row_mode, name)),
            np.asarray(getattr(buffered, name)),
            err_msg=f"field {name} diverged between row-mode and buffered",
        )


def test_row_mode_matches_buffered_continuous():
    """Row mode must also be bit-identical for the continuous action path
    (tanh-mu Normal sampling, log-prob policy rows)."""
    from eavit_tpu.models.policy import ActionSpaceType
    from tests.test_continuous import ContinuousSyntheticEnv

    cfg = tiny_cfg()
    rollouts = []
    for force_unpacked in (False, True):
        env = ContinuousSyntheticEnv(cfg.num_env_per_process, seed=5)
        agent = RNDAgent(
            cfg, env.action_dim, action_space=ActionSpaceType.CONTINUOUS
        )
        state = agent.init_state(jax.random.PRNGKey(0))
        collector = DeviceRolloutCollector(cfg, agent, env)
        collector._force_unpacked = force_unpacked
        states = env.reset()
        ro, _ = collector.collect(state.params, states, jax.random.PRNGKey(1))
        rollouts.append(ro)
    row_mode, buffered = rollouts
    assert row_mode.actions.dtype == buffered.actions.dtype
    for name in row_mode._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(row_mode, name)),
            np.asarray(getattr(buffered, name)),
            err_msg=f"field {name} diverged (continuous)",
        )
