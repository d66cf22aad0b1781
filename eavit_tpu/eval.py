"""Evaluation driver (reference eval.py:16-302): deterministic single-env
playback of a checkpoint with optional rendering and intrinsic-reward
display. (The reference's eval has bit-rotted call signatures —
eval.py:20,112 — the intent implemented here is greedy single-env rollout
in eval mode.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod, config_from_args
from eavit_tpu.envs.builders import make_vector_env
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.utils.checkpoint import load_checkpoint
from eavit_tpu.utils.logger import Logger


def evaluate(
    cfg: Config,
    num_episodes: int = 1,
    render: bool = False,
    save_intrinsic_trace: Optional[str] = None,
    greedy: bool = False,
) -> Dict[str, Any]:
    from eavit_tpu.config import EnvType
    from eavit_tpu.train import setup_jax

    setup_jax(cfg)
    if cfg.env_type == EnvType.SYNTHETIC_DEVICE:
        # playback on the host synthetic env — bit-exact same dynamics
        cfg = cfg.replace(env_type=EnvType.SYNTHETIC)
    cfg = cfg.replace(num_env_per_process=1)  # single env (eval.py:23)
    logger = Logger(cfg.log_name + "_eval", use_tensorboard=False)
    env = make_vector_env(cfg, rank=0, render=render)
    from eavit_tpu.train import _detect_action_space

    action_space = _detect_action_space(env)
    output_size = env.action_space_n or getattr(env, "action_dim", 1) or 1
    agent = RNDAgent(cfg, output_size, action_space=action_space)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    if cfg.load_model_path:
        state, _ = load_checkpoint(cfg.load_model_path, state)
        logger.log(f"loaded checkpoint {cfg.load_model_path}")

    renderer = None
    if render:
        from eavit_tpu.utils.renderer import ParallelizedEnvironmentRenderer

        renderer = ParallelizedEnvironmentRenderer(1)

    states = env.reset()
    episodes = 0
    steps = 0
    returns, intrinsic_trace = [], []
    ep_return = 0.0
    # num_episodes < 0 = run forever (reference eval.py:198 plays back
    # until killed)
    while num_episodes < 0 or episodes < num_episodes:
        rng, k = jax.random.split(rng)
        # eval mode: deterministic forwards (set_mode("eval"), eval.py:191).
        # NOTE the reference's eval still SAMPLES from the softmax
        # (eval.py:198-299); ``greedy`` argmax playback is a TPU-build
        # addition behind --greedy.
        actions, v_ext, v_int, _ = agent.act(
            state.params, jnp.asarray(states), k,
            deterministic_model=True, greedy=greedy,
        )
        actions = np.asarray(actions)
        states, rewards, dones, truns, infos = env.step(actions)
        ep_return += float(rewards[0])
        steps += 1

        if agent.use_rnd:
            next_obs = states[:, -1:] if agent.pixel_rnd else states
            int_r = agent.compute_intrinsic_reward(state, jnp.asarray(next_obs))
            intrinsic_trace.append(float(int_r[0]))

        if renderer is not None:
            renderer.render(states[:, -1:])

        if dones[0] or truns[0]:
            episodes += 1
            logger.log(
                f"episode {episodes}: return={ep_return:.2f} length={steps}"
            )
            returns.append(ep_return)
            ep_return, steps = 0.0, 0

    if renderer is not None:
        renderer.close()
    if save_intrinsic_trace and intrinsic_trace:
        # producer for make_animation (reference eval.py:286-290)
        import pickle

        with open(save_intrinsic_trace, "wb") as f:
            pickle.dump(intrinsic_trace, f)
    env.close()
    logger.close()
    return {
        "mean_return": float(np.mean(returns)) if returns else 0.0,
        "episodes": episodes,
        "intrinsic_trace_len": len(intrinsic_trace),
    }


def main(args) -> None:
    cfg = config_from_args(args)
    # episode budget has its own knob (--num_episodes / EvalEpisodes);
    # -1 matches the reference's run-forever playback (eval.py:198)
    out = evaluate(
        cfg,
        num_episodes=cfg.eval_episodes,
        render=cfg.render,
        save_intrinsic_trace=getattr(args, "save_intrinsic_trace", None),
        greedy=getattr(args, "greedy", False),
    )
    print(out)
