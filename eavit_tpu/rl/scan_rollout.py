"""Whole-rollout-in-one-scan: act + env step + buffering as ONE compiled
program over a jittable device environment (`envs/device_env.py`).

This is the framework's zero-host rollout path: a full n-step rollout is a
single `lax.scan`, so an entire PPO iteration (rollout + update) is exactly
two device dispatches. Nothing the reference's process-per-env architecture
can approach — there the host crosses the device boundary 2x per env step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.envs.device_env import (
    DeviceEnvParams,
    DeviceEnvState,
    device_env_step,
)
from eavit_tpu.models.policy import ActionSpaceType
from eavit_tpu.rl.agent import RNDAgent, Rollout
from eavit_tpu.rl.ppo import sample_categorical, sample_normal


class ScanRolloutCollector:
    """Fully-jitted rollout over a device env. API mirrors the host
    collectors minus host states (env state is a device pytree).

    With ``mesh`` set (pass the DataParallelAgent's mesh), the WHOLE scan
    rollout is shard_mapped over the ``data`` axis: per-env frames, walls,
    env state, and every rollout buffer live sharded across chips, episode
    metrics are pooled with psum/pmean — the zero-host pipeline scales the
    same way the update does. Agents must then be mesh-aware
    (``DataParallelAgent``) so the rollout feeds `update` without a resharde.
    """

    def __init__(
        self,
        cfg: Config,
        agent: RNDAgent,
        env_params: DeviceEnvParams,
        mesh=None,
    ):
        self.cfg = cfg
        self.agent = agent
        base = agent.agent if hasattr(agent, "agent") else agent
        self._network = base.network
        self.env_params = env_params
        self.mesh = mesh
        self._pixel_rnd = cfg.train_method == TrainMethod.ORIGINAL_RND
        self._discrete = base.action_space == ActionSpaceType.DISCRETE
        if mesh is None:
            self._collect = jax.jit(self._collect_impl, donate_argnums=(1,))
        else:
            self._build_sharded(mesh)

    def _build_sharded(self, mesh) -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        env0 = P("data")
        rep = P()
        state_spec = DeviceEnvState(
            pos=env0, steps=env0, visited=env0, ever_visited=env0,
            episode_reward=env0, stack=env0, finished_episodes=env0,
            last_episode_return=env0, last_episode_rooms=env0,
        )
        rollout_spec = Rollout(
            states=P(None, "data"), actions=P(None, "data"),
            rewards=P(None, "data"), dones=P(None, "data"),
            next_obs=P(None, "data"), value_ext=P(None, "data"),
            value_int=P(None, "data"), policy=P(None, "data"),
        )
        # grid/stack/episode-cap are STATIC shape-determining ints — close
        # over them; only the per-env frame/wall tables go through shard_map.
        # shared_world stores ONE deduplicated world (leading dim 1):
        # replicate it instead of sharding over envs
        statics = self.env_params
        n_envs = self.cfg.num_env_per_process
        world_spec = env0 if statics.frames.shape[0] == n_envs else rep

        def sharded(params, frames, walls, env_state, rng):
            ep = statics._replace(frames=frames, walls=walls)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            ro, st, metrics = self._collect_impl(params, env_state, rng, ep)
            metrics["data/num_episodes"] = jax.lax.psum(
                metrics["data/num_episodes"], "data"
            )
            # fleet-union discovery: OR across shards = max of 0/1 vectors
            metrics["data/total_rooms_discovered"] = jnp.sum(
                jax.lax.pmax(
                    jnp.any(st.ever_visited, axis=0).astype(jnp.float32), "data"
                )
            )
            metrics = {
                k: (
                    v
                    if k in ("data/num_episodes", "data/total_rooms_discovered")
                    else jax.lax.pmean(v, "data")
                )
                for k, v in metrics.items()
            }
            return ro, st, metrics

        f = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(rep, world_spec, world_spec, state_spec, rep),
            out_specs=(rollout_spec, state_spec, rep),
            check_vma=False,
        )
        jitted = jax.jit(f, donate_argnums=(3,))
        # place the world tables on the mesh once
        world_sharding = NamedSharding(mesh, world_spec)
        self._frames = jax.device_put(self.env_params.frames, world_sharding)
        self._walls = jax.device_put(self.env_params.walls, world_sharding)
        self._state_shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(mesh, spec), state_spec
        )

        def collect(params, env_state, rng):
            return jitted(params, self._frames, self._walls, env_state, rng)

        self._collect = collect

    def shard_env_state(self, env_state: DeviceEnvState) -> DeviceEnvState:
        """Place a freshly-built env state onto the mesh (sharded over envs)."""
        assert self.mesh is not None
        return jax.device_put(env_state, self._state_shardings)

    def collect(
        self, params: Any, env_state: DeviceEnvState, rng: jax.Array
    ) -> Tuple[Rollout, DeviceEnvState, Dict[str, jnp.ndarray]]:
        return self._collect(params, env_state, rng)

    def _collect_impl(self, params, env_state: DeviceEnvState, rng,
                      env_params: DeviceEnvParams = None):
        cfg = self.cfg
        ep = env_params if env_params is not None else self.env_params

        def act(stack, key):
            k_s, k_d, k_n = jax.random.split(key, 3)
            obs = stack.astype(jnp.float32) / 255.0
            out = self._network.apply(
                {"params": params["policy"]},
                obs,
                False,
                rngs={"dropout": k_d, "noise": k_n},
            )
            if self._discrete:
                action = sample_categorical(k_s, out.policy)
                pol = out.policy
            else:
                action, logp = sample_normal(k_s, out.policy, out.std)
                pol = logp[:, None]
            return action, pol, out.value_ext[:, 0], out.value_int[:, 0]

        def step(carry, key):
            env_state = carry
            stack = env_state.stack
            action, pol, v_ext, v_int = act(stack, key)
            env_state, reward, done, trunc = device_env_step(ep, env_state, action)
            next_obs = (
                env_state.stack[:, -1:] if self._pixel_rnd else env_state.stack
            )
            ys = dict(
                states=stack,
                actions=action,
                rewards=reward,
                dones=done,
                next_obs=next_obs,
                policy=pol,
                value_ext=v_ext,
                value_int=v_int,
            )
            return env_state, ys

        keys = jax.random.split(rng, cfg.num_step + 1)
        env_state, ys = jax.lax.scan(step, env_state, keys[: cfg.num_step])

        # bootstrap value (reference train.py:701-704)
        _, _, v_ext_T, v_int_T = act(env_state.stack, keys[-1])
        rollout = Rollout(
            states=ys["states"],
            actions=ys["actions"],
            rewards=ys["rewards"],
            dones=ys["dones"],
            next_obs=ys["next_obs"],
            value_ext=jnp.concatenate([ys["value_ext"], v_ext_T[None]], axis=0),
            value_int=jnp.concatenate([ys["value_int"], v_int_T[None]], axis=0),
            policy=ys["policy"],
        )
        metrics = {
            "data/num_episodes": jnp.sum(env_state.finished_episodes).astype(
                jnp.float32
            ),
            "data/mean_undiscounted_episode_return": jnp.mean(
                env_state.last_episode_return
            ),
            "data/mean_number_of_visited_rooms": jnp.mean(
                env_state.last_episode_rooms.astype(jnp.float32)
            ),
            # cumulative exploration: rooms ever visited (per-env mean and
            # fleet union) — the monotone frontier-pushing signal the
            # per-episode metric can't show
            "data/mean_rooms_discovered": jnp.mean(
                jnp.sum(env_state.ever_visited, axis=1).astype(jnp.float32)
            ),
            "data/total_rooms_discovered": jnp.sum(
                jnp.any(env_state.ever_visited, axis=0)
            ).astype(jnp.float32),
        }
        return rollout, env_state, metrics
