"""Environment builders per EnvType (reference envs.py:248-578).

Each builder assembles the reference's wrapper stack for one env; the
vector-env factory seeds env ``idx`` with ``seed + rank * num_env + idx``
(reference dist_utils.py:108-109). Emulator-backed env types are gated on
their optional dependencies (ALE / nes-py are not in this image; the
synthetic env covers tests and benchmarks).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np

from eavit_tpu.config import Config, EnvType
from eavit_tpu.envs.pool import SyncVectorEnv, ThreadVectorEnv
from eavit_tpu.envs.synthetic import SyntheticVectorEnv


def _wrap_common(env, cfg: Config, seed: int, *, montezuma: bool):
    from eavit_tpu.envs import wrappers as W

    if cfg.sticky_action:
        env = W.StickyActionWrapper(env, cfg.action_prob, seed)
    env = W.MaxAndSkipWrapper(env, skip=4)
    env = W.ResizeAndGrayScaleWrapper(env, cfg.pre_proc_height, cfg.pre_proc_width)
    env = W.FrameStackWrapper(env, cfg.state_stack_size)
    env = W.MaxStepPerEpisodeWrapper(env, cfg.max_step_per_episode)
    env = W.MonitorWrapper(env)
    if montezuma:
        env = W.MontezumaInfoWrapper(env, room_address=3)
    return env


def make_atari_env(cfg: Config, seed: int, render: bool = False) -> Callable[[], Any]:
    def thunk():
        import gymnasium as gym

        try:
            import ale_py

            gym.register_envs(ale_py)
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "Atari requires ale_py, which is not installed in this image. "
                "Use EnvType=synthetic for emulator-free runs."
            ) from e
        env = gym.make(cfg.env_id, render_mode="rgb_array" if render else None)
        env.reset(seed=seed)
        env = _wrap_common(env, cfg, seed, montezuma="Montezuma" in cfg.env_id)
        if cfg.env_id.startswith("Breakout"):
            from eavit_tpu.envs.wrappers import ActionOffsetWrapper

            env = ActionOffsetWrapper(env, 1)  # NOOP removal (train.py:91-92)
        return env

    return thunk


def make_mario_env(cfg: Config, seed: int, render: bool = False) -> Callable[[], Any]:
    def thunk():  # pragma: no cover - nes-py not in this image
        try:
            import gym_super_mario_bros
            from gym_super_mario_bros.actions import COMPLEX_MOVEMENT
            from nes_py.wrappers import JoypadSpace
        except ImportError as e:
            raise ImportError(
                "Mario requires gym-super-mario-bros/nes-py, not installed "
                "in this image."
            ) from e
        from eavit_tpu.envs import wrappers as W

        env = gym_super_mario_bros.make(cfg.env_id)
        env = JoypadSpace(env, COMPLEX_MOVEMENT)
        env = W.MarioRewardWrapper(env, life_done=cfg.life_done)
        return _wrap_common(env, cfg, seed, montezuma=False)

    return thunk


def make_classic_control_env(
    cfg: Config, seed: int, render: bool = False
) -> Callable[[], Any]:
    def thunk():
        import gymnasium as gym

        from eavit_tpu.envs import wrappers as W

        env = gym.make(cfg.env_id, render_mode="rgb_array")
        # Host-throughput: classic-control envs render at fixed native
        # resolutions (Pendulum 500x500, CartPole 600x400) that are
        # immediately resized down to cfg.pre_proc_* anyway; rendering at
        # ~2x the target size cuts per-step host time ~4x on this image's
        # single vCPU (measured: 3.65 -> 0.97 ms/frame for Pendulum).
        target = 2 * max(cfg.pre_proc_height, cfg.pre_proc_width)
        u = env.unwrapped
        if hasattr(u, "screen_dim") and u.screen_dim > target:
            u.screen_dim = target
        elif hasattr(u, "screen_width") and u.screen_width > target:
            scale = target / u.screen_width
            u.screen_width = target
            u.screen_height = max(1, int(u.screen_height * scale))
        env.reset(seed=seed)
        # classic-control stack omits StickyAction and MaxAndSkip — the
        # reference comments both out (envs.py:513-517):
        # rgb-render -> gray/resize -> stack -> step cap -> monitor
        if cfg.reward_scale != 1.0:
            env = W.RewardScaleWrapper(env, cfg.reward_scale)
        if hasattr(env.action_space, "low"):
            # continuous Box env: policy emits tanh-mu in [-1,1]
            env = W.ActionScaleWrapper(env)
        env = W.RGBArrayAsObservationWrapper(env)
        env = W.ResizeAndGrayScaleWrapper(
            env, cfg.pre_proc_height, cfg.pre_proc_width
        )
        env = W.FrameStackWrapper(env, cfg.state_stack_size)
        env = W.MaxStepPerEpisodeWrapper(env, cfg.max_step_per_episode)
        env = W.MonitorWrapper(env)
        return env

    return thunk


def make_vector_env(cfg: Config, rank: int = 0, render: bool = False):
    """Build the per-process env fleet (reference
    create_parallel_env_processes, dist_utils.py:84-117)."""
    n = cfg.num_env_per_process
    seeds = [cfg.seed + rank * n + i for i in range(n)]

    if cfg.env_type == EnvType.SYNTHETIC:
        return SyntheticVectorEnv(
            n,
            seed=cfg.seed,
            rank=rank,
            stack=cfg.state_stack_size,
            height=cfg.pre_proc_height,
            width=cfg.pre_proc_width,
            max_episode_steps=cfg.max_step_per_episode,
            sticky_action=cfg.sticky_action,
            grid=cfg.synthetic_grid,
        )

    maker = {
        EnvType.ATARI: make_atari_env,
        EnvType.MARIO: make_mario_env,
        EnvType.CLASSIC_CONTROL: make_classic_control_env,
    }[cfg.env_type]
    fns = [maker(cfg, s, render) for s in seeds]
    pool_cls = ThreadVectorEnv if cfg.async_env_pool else SyncVectorEnv
    return pool_cls(fns)
