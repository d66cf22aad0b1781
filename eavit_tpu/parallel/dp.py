"""Data-parallel training over a `jax.sharding.Mesh`.

Replaces the reference's torchrun + DistributedDataParallel stack
(dist_utils.py:17-81, train.py:240-247): one agent process per GPU with
NCCL gradient all-reduce becomes SPMD `shard_map` over a 1-D ``data`` mesh
axis, with `pmean` on gradients inside the jitted update and exact pooled
normalizer moments via `psum` (fixing the reference's per-rank RMS drift,
SURVEY.md §5). Collectives ride ICI within a slice; multi-host extends the
same mesh over DCN via `jax.distributed.initialize` (see ``init_distributed``).

Sharding layout:
- params / optimizer state / RMS stats: replicated (every chip keeps the
  full model — it is tiny; DP is the right parallelism at this scale, as in
  the reference).
- rollout arrays [T, N, ...]: sharded along the env axis N — each chip
  updates from its own envs' experience, like each reference rank trains on
  its own workers' rollouts.
- ``reward_filter.rewems`` [N]: sharded along N (per-env state).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eavit_tpu.config import Config
from eavit_tpu.rl.agent import AgentState, RNDAgent, Rollout

AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]), (axis,))


def get_dist_info():
    """(world_size, rank, local_world_size, local_rank) — reference
    dist_utils.py:9-14 read torchrun env vars; here they come from the JAX
    runtime (process = host in SPMD)."""
    return (
        jax.process_count(),
        jax.process_index(),
        jax.local_device_count(),
        jax.process_index(),
    )


def _cluster_hinted() -> bool:
    """True when a standard multi-process launcher set us up: Cloud TPU pod
    slices, Slurm, Open MPI, or JAX's own explicit vars — i.e.
    `jax.distributed.initialize()` can auto-detect the coordinator (the
    reference equivalently trusts torchrun's env vars, dist_utils.py:9-14).

    Size-carrying hints must imply MORE THAN ONE process: the single-chip
    image sets ``TPU_WORKER_HOSTNAMES=localhost``, which is a 1-host setup
    where initialization is pointless and auto-detection has no coordinator
    to find.
    """
    import os

    env = os.environ
    for var in (
        "COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",  # legacy spelling kept for round-1/2 runs
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        if env.get(var):
            return True
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host rendezvous (replaces torchrun c10d, reference
    dist_utils.py:61-77). No-op on a single host.

    With explicit arguments it initializes directly (the 2-process CPU
    integration test drives this path, tests/test_two_process.py);
    otherwise it initializes whenever a standard launcher hint is present
    and lets JAX auto-detect the coordinator.
    """
    if jax.distributed.is_initialized():
        return  # already initialized (idempotent, like torch's init guard)
    if coordinator_address or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if _cluster_hinted():  # pragma: no cover
        jax.distributed.initialize()


class DataParallelAgent:
    """Shard-mapped wrapper around :class:`RNDAgent` for an N-chip mesh.

    The wrapped agent is constructed with ``axis_name="data"`` so its update
    already contains `pmean`/`psum` collectives; this class supplies the
    mesh, in/out specs, and host-side convenience API.
    """

    def __init__(self, cfg: Config, output_size: int, mesh: Mesh, **agent_kw):
        self.cfg = cfg
        self.mesh = mesh
        self.n = mesh.devices.size
        assert cfg.num_env_per_process % self.n == 0, (
            f"num_env_per_process={cfg.num_env_per_process} must divide over "
            f"{self.n} devices"
        )
        self.agent = RNDAgent(cfg, output_size, axis_name=AXIS, **agent_kw)

        rep = P()
        env_sharded = P(None, AXIS)  # [T, N, ...]
        self._state_spec = None  # built after init_state (depends on pytree)

        shard_map = jax.shard_map

        def state_spec(state: AgentState):
            spec = jax.tree_util.tree_map(lambda _: rep, state)
            spec = spec._replace(
                reward_filter=state.reward_filter.__class__(rewems=P(AXIS))
            )
            return spec

        self._state_spec_fn = state_spec
        # jitted programs are memoized so every call after the first hits
        # jit's cache (a fresh shard_map closure per call would retrace)
        self._jitted: Dict[str, Any] = {}

        def update(state, rollout, rng):
            if "update" not in self._jitted:
                sspec = self._state_spec_fn(state)
                rspec = Rollout(
                    states=env_sharded,
                    actions=env_sharded,
                    rewards=env_sharded,
                    dones=env_sharded,
                    next_obs=env_sharded,
                    value_ext=env_sharded,
                    value_int=env_sharded,
                    policy=env_sharded,
                )
                f = shard_map(
                    self.agent._update_impl,
                    mesh=self.mesh,
                    in_specs=(sspec, rspec, rep),
                    out_specs=(sspec, rep),
                    check_vma=False,
                )
                self._jitted["update"] = jax.jit(f, donate_argnums=(0,))
            return self._jitted["update"](state, rollout, rng)

        self._dp_update = update

        def act(params, obs_u8, rng):
            if "act" not in self._jitted:
                def sharded_act(params, obs_u8, rng):
                    # decorrelate sampling noise across env shards
                    rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
                    return self.agent._act_impl(
                        params, obs_u8, rng, deterministic=False
                    )

                f = shard_map(
                    sharded_act,
                    mesh=self.mesh,
                    in_specs=(rep, P(AXIS), rep),
                    out_specs=P(AXIS),
                    check_vma=False,
                )
                self._jitted["act"] = jax.jit(f)
            return self._jitted["act"](params, obs_u8, rng)

        self._dp_act = act

        def obs_rms_update(state, next_obs_u8):
            if "obs_rms" not in self._jitted:
                sspec = self._state_spec_fn(state)
                f = shard_map(
                    self.agent._obs_rms_update_impl,
                    mesh=self.mesh,
                    in_specs=(sspec, P(AXIS)),
                    out_specs=sspec,
                    check_vma=False,
                )
                self._jitted["obs_rms"] = jax.jit(f, donate_argnums=(0,))
            return self._jitted["obs_rms"](state, next_obs_u8)

        self._dp_obs_rms = obs_rms_update

    # -- host API -------------------------------------------------------
    def init_state(self, rng: jax.Array) -> AgentState:
        state = self.agent.init_state(rng)
        # place according to spec: replicate everything, shard rewems
        sspec = self._state_spec_fn(state)
        shardings = jax.tree_util.tree_map(
            lambda spec: NamedSharding(self.mesh, spec), sspec
        )
        return jax.device_put(state, shardings)

    def act(self, params, obs_u8, rng):
        return self._dp_act(params, jnp.asarray(obs_u8), rng)

    def update(self, state, rollout: Rollout, rng):
        return self._dp_update(state, rollout, rng)

    def update_obs_rms(self, state, next_obs_u8):
        if not self.agent.use_rnd:
            return state
        return self._dp_obs_rms(state, jnp.asarray(next_obs_u8))

    # pass-throughs used by the rollout collectors
    @property
    def network(self):
        return self.agent.network

    @property
    def use_rnd(self):
        return self.agent.use_rnd

    @property
    def action_space(self):
        return self.agent.action_space

    @property
    def output_size(self):
        return self.agent.output_size
