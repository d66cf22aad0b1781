"""Wrapper-stack unit tests, upgrading the reference's manual test.py
(SURVEY.md §4) to deterministic pytest without emulators. A scripted fake
gym env provides exact oracles for skip/max/stack/sticky semantics; one test
drives real gymnasium CartPole through the classic-control stack."""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from eavit_tpu.config import Config, EnvType
from eavit_tpu.envs import wrappers as W
from eavit_tpu.envs.builders import make_classic_control_env, make_vector_env


class ScriptedEnv(gym.Env):
    """Frame t is uint8 full of (t % 251); reward = t; never terminates."""

    def __init__(self, shape=(10, 12)):
        self.shape = shape
        self.observation_space = gym.spaces.Box(0, 255, shape, np.uint8)
        self.action_space = gym.spaces.Discrete(4)
        self.t = 0
        self.actions_seen = []

    def _frame(self):
        return np.full(self.shape, self.t % 251, np.uint8)

    def reset(self, **kw):
        self.t = 0
        self.actions_seen = []
        return self._frame(), {}

    def step(self, action):
        self.actions_seen.append(int(action))
        self.t += 1
        return self._frame(), float(self.t), False, False, {}


def test_max_and_skip():
    env = W.MaxAndSkipWrapper(ScriptedEnv(), skip=4)
    env.reset()
    obs, reward, d, t, _ = env.step(0)
    # 4 frames (t=1..4); obs = max of frames 3 and 4 = frame 4
    assert np.all(obs == 4)
    assert reward == 1 + 2 + 3 + 4  # summed rewards (reference envs.py:100)
    obs, reward, _, _, _ = env.step(0)
    assert np.all(obs == 8) and reward == 5 + 6 + 7 + 8


def test_max_and_skip_takes_pixelwise_max():
    class Alternating(ScriptedEnv):
        def _frame(self):
            v = 200 if self.t % 2 else 10
            return np.full(self.shape, v, np.uint8)

    env = W.MaxAndSkipWrapper(Alternating(), skip=4)
    env.reset()
    obs, _, _, _, _ = env.step(0)
    # frames t=3 (200) and t=4 (10): pixelwise max = 200
    assert np.all(obs == 200)


def test_sticky_action_p1_and_p0():
    # p=1: always repeats the previous action (first action -> initial 0)
    env = W.StickyActionWrapper(ScriptedEnv(), p=1.0, seed=0)
    env.reset()
    for a in [3, 2, 1]:
        env.step(a)
    assert env.env.actions_seen == [0, 0, 0]  # reference test.py:161-186

    env = W.StickyActionWrapper(ScriptedEnv(), p=0.0, seed=0)
    env.reset()
    for a in [3, 2, 1]:
        env.step(a)
    assert env.env.actions_seen == [3, 2, 1]


def test_resize_and_grayscale():
    class RGB(ScriptedEnv):
        def __init__(self):
            super().__init__((30, 40, 3))

        def _frame(self):
            f = np.zeros((30, 40, 3), np.uint8)
            f[..., 0] = 100  # red only
            return f

    env = W.ResizeAndGrayScaleWrapper(RGB(), 84, 84)
    obs, _ = env.reset()
    assert obs.shape == (84, 84) and obs.dtype == np.uint8
    # luma of pure red 100 = 29.9 -> 29
    assert abs(int(obs[40, 40]) - 29) <= 1


def test_frame_stack_reset_and_roll():
    env = W.FrameStackWrapper(W.ResizeAndGrayScaleWrapper(ScriptedEnv(), 8, 8), 4)
    obs, _ = env.reset()
    assert obs.shape == (4, 8, 8)
    assert np.all(obs == obs[0])  # reset fills all slots with frame 0
    obs, _, _, _, _ = env.step(0)
    assert np.all(obs[-1] == 1) and np.all(obs[-2] == 0)
    obs, _, _, _, _ = env.step(0)
    assert np.all(obs[-1] == 2) and np.all(obs[-2] == 1) and np.all(obs[0] == 0)


def test_max_step_truncation():
    env = W.MaxStepPerEpisodeWrapper(ScriptedEnv(), max_step=3)
    env.reset()
    for i in range(2):
        _, _, d, t, _ = env.step(0)
        assert not t
    _, _, d, t, _ = env.step(0)
    assert t and not d  # reference test.py:16-42


def test_monitor_bookkeeping():
    env = W.MonitorWrapper(W.MaxStepPerEpisodeWrapper(ScriptedEnv(), 3))
    env.reset()
    env.step(0)
    env.step(0)
    _, _, _, t, info = env.step(0)
    assert t
    ep = info["episode"]
    assert ep["l"] == 3 and ep["r"] == 1 + 2 + 3
    assert ep["num_finished_episodes"] == 1


def test_action_offset():
    env = W.ActionOffsetWrapper(ScriptedEnv(), offset=1)
    env.reset()
    env.step(0)
    assert env.env.actions_seen == [1]  # Breakout NOOP removal
    assert env.action_space.n == 3


def test_mario_reward_scaling():
    class RewardEnv(ScriptedEnv):
        def step(self, action):
            obs, r, d, t, info = super().step(action)
            return obs, 30.0, d, t, {"life": 2}

    env = W.MarioRewardWrapper(RewardEnv(), life_done=False)
    env.reset()
    _, r, _, _, _ = env.step(0)
    assert r == 2.0  # 30 / 15 (reference envs.py:421)


def test_reward_scale():
    env = W.RewardScaleWrapper(ScriptedEnv(), scale=0.0625)
    env.reset()
    _, r, _, _, _ = env.step(0)
    assert r == 1 * 0.0625  # pre-clip scaling (see wrappers.py docstring)


def test_action_scale_maps_unit_interval_to_box():
    class BoxEnv(ScriptedEnv):
        def __init__(self):
            super().__init__()
            self.action_space = gym.spaces.Box(-2.0, 2.0, (1,), np.float32)

        def step(self, action):
            self.actions_seen.append(np.asarray(action, np.float32).copy())
            self.t += 1
            return self._frame(), 0.0, False, False, {}

    env = W.ActionScaleWrapper(BoxEnv())
    assert np.allclose(env.action_space.low, -1.0)
    assert np.allclose(env.action_space.high, 1.0)
    env.reset()
    env.step(np.array([0.5], np.float32))
    env.step(np.array([-1.0], np.float32))
    env.step(np.array([3.0], np.float32))  # out-of-range: clipped first
    seen = env.env.actions_seen
    assert np.allclose(seen[0], [1.0])  # 0.5 in [-1,1] -> 1.0 in [-2,2]
    assert np.allclose(seen[1], [-2.0])
    assert np.allclose(seen[2], [2.0])


def test_pendulum_continuous_stack_end_to_end():
    """Pendulum-v1 through the classic-control builder: Box action space
    rescaled to [-1,1], RewardScale applied pre-clip, pixel obs stacked."""
    cfg = Config(
        env_type=EnvType.CLASSIC_CONTROL,
        env_id="Pendulum-v1",
        sticky_action=False,
        max_step_per_episode=20,
        num_env_per_process=2,
        async_env_pool=False,
        reward_scale=0.0625,
    )
    env = make_vector_env(cfg, rank=0)
    states = env.reset()
    assert states.shape == (2, 4, 84, 84) and states.dtype == np.uint8
    assert env.action_space_n is None and env.action_dim == 1
    rng = np.random.default_rng(0)
    a = env.sample_random_actions(rng)
    assert a.shape == (2, 1) and np.all(np.abs(a) <= 1.0)
    for _ in range(3):
        states, rewards, dones, truns, infos = env.step(a)
    # Pendulum reward in [-16.27, 0] scaled by 1/16 -> within the clip range
    assert np.all(rewards <= 0.0) and np.all(rewards >= -1.02)
    env.close()


def test_classic_control_stack_end_to_end():
    cfg = Config(
        env_type=EnvType.CLASSIC_CONTROL,
        env_id="CartPole-v1",
        sticky_action=False,
        max_step_per_episode=20,
        num_env_per_process=2,
        async_env_pool=False,
    )
    env = make_vector_env(cfg, rank=0)
    states = env.reset()
    assert states.shape == (2, 4, 84, 84) and states.dtype == np.uint8
    for _ in range(3):
        states, rewards, dones, truns, infos = env.step(np.zeros(2, np.int64))
    assert states.shape == (2, 4, 84, 84)
    assert np.isfinite(rewards).all()
    env.close()
