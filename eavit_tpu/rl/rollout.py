"""Host-side rollout collection feeding the device-side agent.

Replaces the reference's per-step Pipe fan-out/fan-in over N worker
processes (train.py:604-698) with a vectorized env pool and one jitted
``act`` call per step. Frames stay uint8 end-to-end (the reference ships
float64 over pipes — 8x the bytes, envs.py:153); conversion to float happens
on device inside the jitted programs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.rl.agent import RNDAgent, Rollout


class EpisodeStats:
    """Rolling episode bookkeeping (reference train.py:570-578, 651-654)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.returns: List[float] = []
        self.lengths: List[int] = []
        self.rooms_per_episode: List[int] = []
        self.total_visited_rooms: set = set()
        self.num_episodes = 0

    def add(self, info: Dict[str, Any]) -> None:
        ep = info.get("episode")
        if not ep:
            return
        self.num_episodes += 1
        self.returns.append(float(ep["r"]))
        self.lengths.append(int(ep["l"]))
        rooms = ep.get("visited_rooms")
        if rooms is not None:
            self.rooms_per_episode.append(len(rooms))
            self.total_visited_rooms |= set(rooms)
        self.returns = self.returns[-self.window :]
        self.lengths = self.lengths[-self.window :]
        self.rooms_per_episode = self.rooms_per_episode[-self.window :]

    def to_state(self) -> Dict[str, Any]:
        """Serializable snapshot (checkpointed like the reference's metric
        deques + room sets, train.py:926-956)."""
        return {
            "returns": list(self.returns),
            "lengths": list(self.lengths),
            "rooms_per_episode": list(self.rooms_per_episode),
            "total_visited_rooms": sorted(self.total_visited_rooms),
            "num_episodes": self.num_episodes,
        }

    def load_state(self, state: Dict[str, Any]) -> None:
        self.returns = [float(x) for x in state.get("returns", [])]
        self.lengths = [int(x) for x in state.get("lengths", [])]
        self.rooms_per_episode = [int(x) for x in state.get("rooms_per_episode", [])]
        self.total_visited_rooms = set(state.get("total_visited_rooms", []))
        self.num_episodes = int(state.get("num_episodes", 0))

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {"data/num_episodes": float(self.num_episodes)}
        if self.returns:
            out["data/mean_undiscounted_episode_return"] = float(
                np.mean(self.returns)
            )
            out["data/mean_episode_length"] = float(np.mean(self.lengths))
        if self.rooms_per_episode:
            out["data/mean_number_of_visited_rooms"] = float(
                np.mean(self.rooms_per_episode)
            )
            out["data/total_number_of_visited_rooms"] = float(
                len(self.total_visited_rooms)
            )
        return out


class RolloutCollector:
    def __init__(self, cfg: Config, agent: RNDAgent, env: Any):
        self.cfg = cfg
        self.agent = agent
        self.env = env
        self.stats = EpisodeStats()
        self._pixel_rnd = cfg.train_method == TrainMethod.ORIGINAL_RND

    def _next_obs_of(self, states: np.ndarray) -> np.ndarray:
        """RND observation source: last frame (original) or full stack
        (modified) — reference train.py:636-641."""
        if self._pixel_rnd:
            return states[:, -1:, :, :]
        return states

    def warmup_obs_rms(
        self, state, states_u8: np.ndarray, rng: jax.Array
    ) -> Tuple[Any, np.ndarray]:
        """Random-action obs-normalization warm-up
        (reference train.py:502-569): ``ObsNormStep`` batches of ``NumStep``
        random steps, folding raw next-obs into obs_rms."""
        cfg = self.cfg
        if not self.agent.use_rnd or cfg.load_model:
            return state, states_u8
        n = self.env.num_envs
        rng_np = np.random.default_rng(int(jax.random.randint(rng, (), 0, 2**31 - 1)))

        def random_actions():
            if hasattr(self.env, "sample_random_actions"):
                return self.env.sample_random_actions(rng_np)
            return rng_np.integers(0, self.env.action_space_n, size=n)

        for _ in range(cfg.obs_norm_step):
            batch = []
            for _ in range(cfg.num_step):
                states_u8, _, _, _, _ = self.env.step(random_actions())
                batch.append(self._next_obs_of(states_u8))
            state = self.agent.update_obs_rms(
                state, jnp.asarray(np.concatenate(batch))
            )
        return state, states_u8

    def collect(
        self,
        params: Any,
        states_u8: np.ndarray,  # [N, C, H, W] uint8
        rng: jax.Array,
    ) -> Tuple[Rollout, np.ndarray]:
        """One n-step rollout (reference train.py:604-704). Returns the
        device-resident time-major Rollout and the final host states."""
        cfg = self.cfg
        T, N = cfg.num_step, self.env.num_envs

        states_buf = np.empty(
            (T, N) + states_u8.shape[1:], np.uint8
        )
        next_obs_buf = np.empty(
            (T, N) + self._next_obs_of(states_u8).shape[1:], np.uint8
        )
        rewards_buf = np.empty((T, N), np.float32)
        dones_buf = np.empty((T, N), np.bool_)
        discrete = self.agent.action_space.value == "discrete"
        if discrete:
            actions_buf = np.empty((T, N), np.int32)
            policy_buf = np.empty((T, N, self.agent.output_size), np.float32)
        else:
            actions_buf = np.empty((T, N, self.agent.output_size), np.float32)
            policy_buf = np.empty((T, N, 1), np.float32)
        value_ext_buf = np.empty((T + 1, N), np.float32)
        value_int_buf = np.empty((T + 1, N), np.float32)

        keys = jax.random.split(rng, T + 1)
        for t in range(T):
            actions, v_ext, v_int, policy = self.agent.act(
                params, jnp.asarray(states_u8), keys[t]
            )
            actions = np.asarray(actions)
            states_buf[t] = states_u8
            value_ext_buf[t] = np.asarray(v_ext)
            value_int_buf[t] = np.asarray(v_int)
            actions_buf[t] = actions
            policy_buf[t] = np.asarray(policy)

            states_u8, rewards, dones, truns, infos = self.env.step(actions)
            rewards_buf[t] = rewards
            dones_buf[t] = dones
            next_obs_buf[t] = self._next_obs_of(states_u8)
            for info in infos:
                self.stats.add(info)

        # bootstrap value (reference train.py:701-704)
        _, v_ext, v_int, _ = self.agent.act(
            params, jnp.asarray(states_u8), keys[T]
        )
        value_ext_buf[T] = np.asarray(v_ext)
        value_int_buf[T] = np.asarray(v_int)

        rollout = Rollout(
            states=jnp.asarray(states_buf),
            actions=jnp.asarray(actions_buf),
            rewards=jnp.asarray(rewards_buf),
            dones=jnp.asarray(dones_buf),
            next_obs=jnp.asarray(next_obs_buf),
            value_ext=jnp.asarray(value_ext_buf),
            value_int=jnp.asarray(value_int_buf),
            policy=jnp.asarray(policy_buf),
        )
        return rollout, states_u8
