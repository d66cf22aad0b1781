"""Training driver (reference train.py:21-878).

Phases, in reference order: logger + distributed init; env fleet; agent
build; checkpoint resume; optional SSL pretraining; obs-norm warm-up
(skipped on resume, train.py:503); then the rollout -> update loop with
scheduled/best checkpointing, metric logging, and a profile-N-updates-then-
exit mode. The loop runs forever unless ``total_updates`` is set (the
reference is killed externally, train.py:580).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import (
    Config,
    RepresentationMethod,
    TrainMethod,
    config_from_args,
)
from eavit_tpu.envs.builders import make_vector_env
from eavit_tpu.models.policy import ActionSpaceType
from eavit_tpu.rl.agent import RNDAgent, global_step_value
from eavit_tpu.rl.device_rollout import DeviceRolloutCollector
from eavit_tpu.utils.checkpoint import CheckpointManager, load_checkpoint
from eavit_tpu.utils.logger import Logger


def _detect_action_space(env) -> ActionSpaceType:
    return (
        ActionSpaceType.DISCRETE
        if getattr(env, "action_space_n", None)
        else ActionSpaceType.CONTINUOUS
    )


def build_agent(cfg: Config, output_size: int,
                action_space: ActionSpaceType = ActionSpaceType.DISCRETE):
    """Single-chip agent, or data-parallel over all local devices when more
    than one is available (replaces torchrun rank fan-out)."""
    n_dev = len(jax.devices())
    want = cfg.data_axis_size if cfg.data_axis_size > 0 else n_dev
    if want > 1 and n_dev >= want:
        from eavit_tpu.parallel.dp import DataParallelAgent, make_mesh

        return DataParallelAgent(
            cfg, output_size, make_mesh(want), action_space=action_space
        )
    return RNDAgent(cfg, output_size, action_space=action_space)


def ssl_pretrain(
    cfg: Config,
    agent: RNDAgent,
    state,
    env,
    collector,
    logger: Logger,
    ckpt: CheckpointManager,
    rng: jax.Array,
    num_epochs: int,
):
    """SSL pretraining (reference train.py:292-499): random-action rollouts
    become training epochs; the first rollout is held out for evaluation;
    best eval loss is checkpointed with the SSL suffix."""
    from eavit_tpu.rl.ssl_pretrain import make_ssl_pretrainer

    if num_epochs < 0:
        # the reference's SSL loop is a while-True killed externally
        # (train.py:342); make the contract loud so a bounded
        # --total_updates run isn't mistaken for a hang
        logger.log(
            "SSLEpochs < 0: SSL pretraining runs FOREVER (reference "
            "while-True semantics); PPO never starts. Set SSLEpochs to "
            "bound it."
        )
    pretrainer = make_ssl_pretrainer(cfg, agent)
    n = env.num_envs
    rng_np = np.random.default_rng(cfg.seed)

    def random_rollout(states):
        frames = []
        for _ in range(cfg.num_step):
            if hasattr(env, "sample_random_actions"):
                actions = env.sample_random_actions(rng_np)
            else:
                actions = rng_np.integers(0, env.action_space_n, size=n)
            states, _, _, _, _ = env.step(actions)
            frames.append(states.copy())
        return np.concatenate(frames), states

    states = env.reset()
    eval_states, states = random_rollout(states)
    eval_states = jnp.asarray(eval_states)

    ssl_opt_state = pretrainer.init_opt(state)
    epoch = 0
    while num_epochs < 0 or epoch < num_epochs:
        train_states, states = random_rollout(states)
        train_states = jnp.asarray(train_states)
        # Epoch passes over each collected rollout (reference train.py:404
        # runs `for k in range(epoch)` over the dataset before collecting
        # the next)
        for _ in range(max(1, cfg.epoch)):
            rng, k = jax.random.split(rng)
            state, ssl_opt_state, train_loss, eval_loss = pretrainer.epoch(
                state, ssl_opt_state, train_states, eval_states, k
            )
        train_loss, eval_loss = float(train_loss), float(eval_loss)
        logger.log_scalars(
            {
                f"SSL_pretraining/Representation_loss({cfg.representation_lr_method.value})(training dataset) vs epoch": train_loss,
                f"SSL_pretraining/Representation_loss({cfg.representation_lr_method.value})(evaluation dataset) vs epoch": eval_loss,
            }
        )
        logger.log(
            f"SSL_pretraining_epoch: {epoch}, training_representation_loss: "
            f"{train_loss:.6f}, evaluation_representation_loss: {eval_loss:.6f}"
        )
        ckpt.maybe_save(
            state, epoch + 1, {"phase": "ssl_pretraining", "epoch": epoch},
            ssl_loss=eval_loss,
        )
        epoch += 1
    return state, states


def setup_jax(cfg: Config) -> None:
    """Apply framework-level jax config (call before the first PRNG use)."""
    try:
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    except Exception:  # already-initialized or unknown impl: keep default
        pass
    try:
        # persistent XLA compilation cache: the big epoch x minibatch update
        # program compiles once per machine, not once per process
        cache_dir = os.path.expanduser("~/.cache/eavit_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


class _DeviceEnvHostAdapter:
    """Minimal host-facing view of the jittable device env (reset / step /
    sample_random_actions with the vector-env 5-tuple protocol) so the
    SSL-pretraining loop — which the reference runs unconditionally on the
    env type (train.py:292-499) — works under ``EnvType=synthetic_device``
    too: random-action device rollouts feed the pretrainer."""

    def __init__(self, env_params, num_envs: int):
        from eavit_tpu.envs.device_env import device_env_reset, device_env_step

        self.num_envs = num_envs
        self.action_space_n = 5
        self._reset = lambda: device_env_reset(env_params, num_envs)
        self._step = jax.jit(lambda s, a: device_env_step(env_params, s, a))
        self._state = None

    def reset(self) -> np.ndarray:
        self._state = self._reset()
        return np.asarray(self._state.stack)

    def step(self, actions):
        self._state, r, d, t = self._step(self._state, jnp.asarray(actions))
        return np.asarray(self._state.stack), np.asarray(r), np.asarray(d), np.asarray(t), []

    def sample_random_actions(self, rng: np.random.Generator) -> np.ndarray:
        return rng.integers(0, self.action_space_n, size=self.num_envs)


def _device_env_stats_meta(env_state) -> Dict[str, Any]:
    """Episode bookkeeping of the device env as a JSON-able dict (the
    host path persists collector.stats the same way; reference
    train.py:926-956 pickles metric deques + room sets)."""
    ev = np.asarray(jax.device_get(env_state.ever_visited)).astype(bool)
    return {
        "finished_episodes": np.asarray(env_state.finished_episodes).tolist(),
        "last_episode_return": np.asarray(env_state.last_episode_return).tolist(),
        "last_episode_rooms": np.asarray(env_state.last_episode_rooms).tolist(),
        "ever_visited_hex": np.packbits(ev, axis=None).tobytes().hex(),
        "ever_visited_shape": list(ev.shape),
    }


def _restore_device_env_stats(env_state, metadata: Dict[str, Any]):
    """Resume the device env's episode bookkeeping (the cumulative
    ever-visited frontier and last-episode aggregates) from a checkpoint
    sidecar; positions/stacks restart fresh, like the reference's env
    workers on resume (train.py:198-238)."""
    d = metadata.get("device_env_stats")
    if not d:
        return env_state
    shape = tuple(d["ever_visited_shape"])
    n_bits = int(np.prod(shape))
    bits = np.unpackbits(
        np.frombuffer(bytes.fromhex(d["ever_visited_hex"]), np.uint8)
    )[:n_bits].reshape(shape).astype(bool)
    return env_state._replace(
        finished_episodes=jnp.asarray(d["finished_episodes"], jnp.int32),
        last_episode_return=jnp.asarray(d["last_episode_return"], jnp.float32),
        last_episode_rooms=jnp.asarray(d["last_episode_rooms"], jnp.int32),
        ever_visited=jnp.asarray(bits),
    )


def _train_device_env(cfg: Config, logger: Logger,
                      total_updates: Optional[int],
                      profile_updates: int) -> Dict[str, Any]:
    """Zero-host training loop over the jittable device env: one dispatch
    for the whole rollout, one for the whole update."""
    from eavit_tpu.envs.device_env import make_device_env
    from eavit_tpu.rl.scan_rollout import ScanRolloutCollector

    env_params, env_state = make_device_env(
        cfg.num_env_per_process,
        seed=cfg.seed,
        grid=cfg.synthetic_grid,
        stack=cfg.state_stack_size,
        height=cfg.pre_proc_height,
        width=cfg.pre_proc_width,
        max_episode_steps=cfg.max_step_per_episode,
        maze=cfg.synthetic_maze,
        texture=cfg.synthetic_texture,
        shared_world=cfg.synthetic_shared_world,
        variants=cfg.synthetic_variants,
        sparse_goal=cfg.synthetic_sparse_goal,
        goal_depth=cfg.synthetic_goal_depth,
    )
    # device env action set is 5; multi-device runs get the DP agent and a
    # shard_mapped scan rollout (zero-host pipeline scales over the mesh)
    agent = build_agent(cfg, 5)
    mesh = getattr(agent, "mesh", None)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    collector = ScanRolloutCollector(cfg, agent, env_params, mesh=mesh)
    ckpt = CheckpointManager(cfg.save_model_path, cfg.log_name, cfg.save_ckpt_every)

    start_update = 0
    if cfg.load_model and cfg.load_model_path:
        # full resume: params, opt state, normalizers, counters AND the env's
        # episode bookkeeping (mirrors the host-env path below; reference
        # train.py:198-238, 926-956)
        state, meta = load_checkpoint(cfg.load_model_path, state)
        start_update = int(meta.get("global_update", int(state.global_update)))
        ckpt.restore_best(meta)
        env_state = _restore_device_env_stats(env_state, meta)
        logger.log(f"resumed from {cfg.load_model_path} @ update {start_update}")
    if mesh is not None:
        env_state = collector.shard_env_state(env_state)

    if cfg.ssl_pretraining and cfg.representation_lr_method != RepresentationMethod.NONE:
        # the reference's SSL-pretraining phase is unconditional on env type
        # (train.py:292-499): run it here over random-action device rollouts
        base_agent = agent.agent if hasattr(agent, "agent") else agent
        rng, k = jax.random.split(rng)
        state, _ = ssl_pretrain(
            cfg, base_agent, state,
            _DeviceEnvHostAdapter(env_params, cfg.num_env_per_process),
            collector, logger, ckpt, k, cfg.ssl_pretrain_epochs,
        )

    # warm-up: random-policy rollouts feed obs_rms (train.py:502-569)
    if agent.use_rnd and not cfg.load_model:
        for _ in range(max(1, cfg.obs_norm_step)):
            rng, k = jax.random.split(rng)
            ro, env_state, _ = collector.collect(state.params, env_state, k)
            flat = jnp.reshape(ro.next_obs, (-1,) + ro.next_obs.shape[2:])
            state = agent.update_obs_rms(state, flat)

    if profile_updates:
        logger.start_profiling(profile_updates)
    update, last = start_update, {}
    while total_updates is None or total_updates < 0 or update < total_updates:
        rng, k1, k2 = jax.random.split(rng, 3)
        rollout, env_state, env_metrics = collector.collect(
            state.params, env_state, k1
        )
        state, metrics = agent.update(state, rollout, k2)
        update += 1
        grads = metrics.pop("_grads", None)
        if grads is not None:
            logger.log_params_histograms(grads["policy"], "PPO_grads")
        metrics = {k_: float(v) for k_, v in {**metrics, **env_metrics}.items()}
        logger.log_scalars(metrics, step=update)
        last = metrics
        logger.log(
            f"update {update} | loss {metrics['train/loss']:.4f} | "
            f"return {metrics.get('data/mean_undiscounted_episode_return', 0):.2f}"
        )
        ckpt.maybe_save(
            state, update,
            # lazy: the device_get + packbits bookkeeping only runs on
            # updates that actually write a checkpoint (review r4)
            lambda u=update, es=env_state: {
                "global_update": u,
                "device_env_stats": _device_env_stats_meta(es),
            },
            mean_episode_return=metrics.get("data/mean_undiscounted_episode_return"),
        )
        if logger.step_profiler():
            break
    logger.close()
    return last


def train(cfg: Config, total_updates: Optional[int] = None,
          profile_updates: int = 0, log_dir: str = "logs") -> Dict[str, Any]:
    from eavit_tpu.parallel.dp import get_dist_info, init_distributed

    if total_updates is None and cfg.total_updates >= 0:
        # direct train(cfg) callers get cfg.total_updates, same as the CLI
        total_updates = cfg.total_updates

    # multi-host rendezvous BEFORE the first device query (replaces torchrun
    # c10d, reference dist_utils.py:61-77); no-op on a single host
    init_distributed()
    setup_jax(cfg)
    world_size, rank, _, _ = get_dist_info()
    logger = Logger(cfg.log_name, log_dir=log_dir, use_wandb=cfg.use_wandb,
                    verbose=cfg.verbose_logging,
                    rank=rank)
    logger.log(f"devices: {jax.devices()} (process {rank}/{world_size})")
    logger.log(f"config: {cfg}")

    from eavit_tpu.config import EnvType
    from eavit_tpu.utils.seed import set_seed

    set_seed(cfg.seed)
    if cfg.env_type == EnvType.SYNTHETIC_DEVICE:
        return _train_device_env(cfg, logger, total_updates, profile_updates)
    # per-host env fleet seeded by the GLOBAL rank so no two hosts build
    # identically-seeded envs (reference dist_utils.py:108-109)
    env = make_vector_env(cfg, rank=rank, render=cfg.render)
    action_space = _detect_action_space(env)
    output_size = env.action_space_n or getattr(env, "action_dim", 1) or 1

    agent = build_agent(cfg, output_size, action_space)
    base_agent = agent.agent if hasattr(agent, "agent") else agent
    if cfg.verbose_logging:
        # model graph/summary export (reference agents.py:627-661)
        import flax.linen as nn

        dummy = jnp.zeros(
            (1, cfg.state_stack_size, cfg.pre_proc_height, cfg.pre_proc_width),
            jnp.float32,
        )
        logger.log(
            nn.tabulate(base_agent.network, jax.random.PRNGKey(0))(dummy),
            only_rank_0=True,
        )

    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    state = agent.init_state(k_init)

    ckpt = CheckpointManager(cfg.save_model_path, cfg.log_name, cfg.save_ckpt_every)
    start_update = 0
    if cfg.load_model and cfg.load_model_path:
        state, meta = load_checkpoint(cfg.load_model_path, state)
        start_update = int(meta.get("global_update", int(state.global_update)))
        ckpt.restore_best(meta)
        logger.log(f"resumed from {cfg.load_model_path} @ update {start_update}")

    renderer = None
    if cfg.render:
        from eavit_tpu.utils.renderer import ParallelizedEnvironmentRenderer

        renderer = ParallelizedEnvironmentRenderer(cfg.num_env_per_process)

    # collector acts with the (possibly DP-wrapped) agent: its
    # update_obs_rms/use_rnd go through the mesh-aware wrapper
    collector = DeviceRolloutCollector(cfg, agent, env, renderer=renderer)
    if cfg.load_model and cfg.load_model_path:
        # restore episode bookkeeping (reference train.py:926-956)
        import json as _json

        meta_path = cfg.load_model_path + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta_json = _json.load(f)
            if "episode_stats" in meta_json:
                collector.stats.load_state(meta_json["episode_stats"])
    states = env.reset()

    if cfg.ssl_pretraining and cfg.representation_lr_method != RepresentationMethod.NONE:
        rng, k = jax.random.split(rng)
        # dedicated SSL epoch budget, independent of the PPO update budget
        # (reference's SSL loop is its own while-True, train.py:292-499);
        # -1 means run forever, exactly as documented on SSLEpochs
        state, states = ssl_pretrain(
            cfg, base_agent, state, env, collector, logger, ckpt, k,
            cfg.ssl_pretrain_epochs,
        )

    if not cfg.load_model:
        rng, k = jax.random.split(rng)
        logger.log("obs-norm warm-up...")
        state, states = collector.warmup_obs_rms(state, states, k)

    if profile_updates:
        logger.start_profiling(profile_updates)

    logger.log("entering training loop")
    update = start_update
    last_metrics: Dict[str, Any] = {}
    while total_updates is None or total_updates < 0 or update < total_updates:
        rng, k_roll, k_upd = jax.random.split(rng, 3)
        rollout, states = collector.collect(state.params, states, k_roll)
        state, metrics = agent.update(state, rollout, k_upd)
        update += 1

        grads = metrics.pop("_grads", None)
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics.update(collector.stats.summary())
        logger.log_scalars(metrics, step=update)
        if cfg.verbose_logging:
            # parameter + gradient histogram dumps (reference
            # utils.py:345-419, agents.py:500-506)
            logger.log_params_histograms(state.params["policy"], "PPO")
            if grads is not None:
                logger.log_params_histograms(grads["policy"], "PPO_grads")
            if base_agent.use_rnd:
                logger.log_params_histograms(state.params["rnd_pred"], "RND")
                if grads is not None:
                    logger.log_params_histograms(grads["rnd_pred"], "RND_grads")
        last_metrics = metrics
        ret = metrics.get("data/mean_undiscounted_episode_return")
        logger.log(
            f"update {update} | global_step {global_step_value(state)} | "
            f"loss {metrics.get('train/loss', float('nan')):.4f} | "
            f"return {f'{ret:.2f}' if ret is not None else '-'} | "
            f"rooms {metrics.get('data/total_number_of_visited_rooms', 0):.0f}"
        )

        ckpt.maybe_save(
            state,
            update,
            {"global_update": update, "global_step": global_step_value(state),
             "stats": collector.stats.summary(),
             "episode_stats": collector.stats.to_state(), "config": cfg},
            mean_rollout_reward=metrics.get("data/ext_reward_per_rollout_mean"),
            mean_episode_return=metrics.get(
                "data/mean_undiscounted_episode_return"
            ),
        )
        if logger.step_profiler():
            break

    env.close()
    logger.close()
    return last_metrics


def main(args) -> None:
    cfg = config_from_args(args)
    total = cfg.total_updates if cfg.total_updates >= 0 else None
    train(cfg, total_updates=total, profile_updates=args.profile_updates)
