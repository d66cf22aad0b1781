"""Device-resident rollout: the frame stack and every rollout buffer live in
HBM; the host ships only each step's NEW preprocessed frame.

Why: the act loop is host→device bandwidth-bound. Shipping the full 4-frame
stack per step (like handing the reference's pipe payloads to the chip)
moves ~4x more bytes than the environment actually produces — consecutive
stacks share 3 of 4 frames. Here the device maintains the stack itself
(`shift+append`, or `broadcast` on env reset — mirroring FrameStackWrapper,
reference envs.py:148-169) and appends states/values/log-probs straight into
donated HBM buffers, so the later PPO update reads rollout data with ZERO
host transfers.

Per step on the wire: [N, H, W] uint8 frames + [N] rewards + [N] done flags
up; [N] actions down. Nothing else, ever.

Single-chip wire protocol (round 4): two measured pathologies of the
tunneled runtime shape this path (scripts/rollout_probe.py,
/tmp/step_variants.py findings recorded in BASELINE.md):

1. Each separate host->device array upload costs ~a full round trip even
   when dispatched asynchronously (3 blocked flag uploads = 83.6 ms vs a
   29.5 ms RTT floor). Fix: the five per-step arrays (frame, reward, done,
   reset, t) are PACKED into one contiguous uint8 buffer and unpacked
   on-device with slices + bitcasts inside the jitted step.
2. Executable OUTPUT buffers materialize at ~5 GB/s regardless of donation
   (donate_argnums is not honored: a donated in-place row write into the
   [T=128,...] 290 MB DeviceBuffers costs ~65 ms/step dispatch-only, vs
   ~18 ms with T=16 buffers and ~31 ms for a trivial pass-through jit).
   Fix: ROW MODE — the per-step jit returns only the new frame stack and
   the per-step rows (~2 MB); the host keeps the returned device handles
   and stacks them on-device ONCE at rollout end. Rewards/dones never
   visit the device during the rollout at all (the host already has them
   from env.step; they upload once with the final stack).

The mesh-sharded path keeps the buffered tuple protocol (a flat packed
buffer has no clean env-axis PartitionSpec, per-step host chatter is not
the bottleneck on co-located multi-chip hosts, and buffered in-place row
writes are the RIGHT shape when donation works).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.models.policy import ActionSpaceType
from eavit_tpu.rl.agent import RNDAgent, Rollout
from eavit_tpu.rl.ppo import sample_categorical, sample_normal
from eavit_tpu.rl.rollout import EpisodeStats


class DeviceBuffers(NamedTuple):
    base_key: jax.Array  # rollout PRNG key
    stack: jnp.ndarray  # [N, C, H, W] u8 — current frame stack
    states: jnp.ndarray  # [T, N, C, H, W] u8
    actions: jnp.ndarray  # [T, N] i32 | [T, N, A] f32
    rewards: jnp.ndarray  # [T, N] f32
    dones: jnp.ndarray  # [T, N] bool
    next_obs: jnp.ndarray  # [T, N, 1|C, H, W] u8
    value_ext: jnp.ndarray  # [T+1, N] f32
    value_int: jnp.ndarray  # [T+1, N] f32
    policy: jnp.ndarray  # [T, N, A] | [T, N, 1] f32


class DeviceRolloutCollector:
    """Drop-in alternative to RolloutCollector with device-resident state."""

    def __init__(self, cfg: Config, agent: RNDAgent, env: Any, renderer: Any = None):
        self.cfg = cfg
        self.agent = agent
        self.env = env
        self.renderer = renderer  # live frame grid (reference train.py:693-698)
        self.stats = EpisodeStats()
        self._pixel_rnd = cfg.train_method == TrainMethod.ORIGINAL_RND
        self._discrete = agent.action_space == ActionSpaceType.DISCRETE
        self._buf: Optional[DeviceBuffers] = None
        self._half_bufs: Optional[list] = None

        # a DataParallelAgent carries a mesh: shard the act/step program over
        # the env axis so rollouts use every chip, not just device 0
        self.mesh = getattr(agent, "mesh", None)
        # double-buffered half-fleet pipelining (SURVEY §7 hard-part #1):
        # dispatch the device act for one half, host-step the other half's
        # envs while the TPU computes — JAX async dispatch provides the
        # overlap, no threads. Single-chip, no-renderer path only.
        self._pipelined = (
            cfg.async_env_pool
            and self.mesh is None
            and renderer is None
            and hasattr(env, "step_slice")
            and cfg.num_env_per_process % 2 == 0
        )
        if self.mesh is None:
            self._step = jax.jit(
                self._step_impl,
                static_argnames=("first", "last"),
                donate_argnums=(1,),
            )
            self._row_step = jax.jit(
                self._row_step_impl, static_argnames=("first", "last")
            )
            self._reseed = jax.jit(self._reseed_impl, donate_argnums=(0,))
            self._paybuf: Optional[np.ndarray] = None
            self._row_stack: Optional[jnp.ndarray] = None
            # test hook: force the buffered tuple protocol so equivalence
            # tests can diff row-mode vs buffered rollouts bit-for-bit
            self._force_unpacked = False
        else:
            self._build_sharded_step()

    # ------------------------------------------------------------------
    def _buffer_specs(self):
        """PartitionSpecs for DeviceBuffers: env axis sharded over the mesh."""
        from jax.sharding import PartitionSpec as P

        env0 = P("data")  # [N, ...]
        env1 = P(None, "data")  # [T, N, ...]
        return DeviceBuffers(
            base_key=P(),
            stack=env0,
            states=env1,
            actions=env1,
            rewards=env1,
            dones=env1,
            next_obs=env1,
            value_ext=env1,
            value_int=env1,
            policy=env1,
        )

    def _build_sharded_step(self) -> None:
        import functools

        from jax.sharding import PartitionSpec as P

        buf_spec = self._buffer_specs()
        env0, rep = P("data"), P()

        def make(first: bool, last: bool):
            f = functools.partial(self._step_impl, first=first, last=last)
            sm = jax.shard_map(
                f,
                mesh=self.mesh,
                in_specs=(rep, buf_spec, env0, env0, env0, env0, rep),
                out_specs=(buf_spec, env0),
                check_vma=False,
            )
            return jax.jit(sm, donate_argnums=(1,))

        variants = {
            (f_, l_): make(f_, l_) for f_ in (True, False) for l_ in (True, False)
        }

        def step(params, buf, frame, reward, done, reset, t, first, last):
            return variants[(first, last)](
                params, buf, frame, reward, done, reset, t
            )

        self._step = step

        sm_reseed = jax.shard_map(
            self._reseed_impl,
            mesh=self.mesh,
            in_specs=(buf_spec, rep),
            out_specs=buf_spec,
            check_vma=False,
        )
        self._reseed = jax.jit(sm_reseed, donate_argnums=(0,))

    def _make_buffers(
        self, initial_states: np.ndarray, rng: jax.Array
    ) -> DeviceBuffers:
        cfg = self.cfg
        T = cfg.num_step
        N, C, H, W = initial_states.shape
        A = self.agent.output_size
        nob_c = 1 if self._pixel_rnd else C
        if self._discrete:
            actions = jnp.zeros((T, N), jnp.int32)
            policy = jnp.zeros((T, N, A), jnp.float32)
        else:
            actions = jnp.zeros((T, N, A), jnp.float32)
            policy = jnp.zeros((T, N, 1), jnp.float32)
        return DeviceBuffers(
            base_key=rng,
            stack=jnp.asarray(initial_states),
            states=jnp.zeros((T, N, C, H, W), jnp.uint8),
            actions=actions,
            rewards=jnp.zeros((T, N), jnp.float32),
            dones=jnp.zeros((T, N), jnp.bool_),
            next_obs=jnp.zeros((T, N, nob_c, H, W), jnp.uint8),
            value_ext=jnp.zeros((T + 1, N), jnp.float32),
            value_int=jnp.zeros((T + 1, N), jnp.float32),
            policy=policy,
        )

    def init_buffers(self, initial_states: np.ndarray, rng: jax.Array) -> None:
        buf = self._make_buffers(initial_states, rng)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            shardings = jax.tree_util.tree_map(
                lambda spec: NamedSharding(self.mesh, spec), self._buffer_specs()
            )
            buf = jax.device_put(buf, shardings)
        self._buf = buf

    def _reseed_impl(self, buf: DeviceBuffers, rng: jax.Array) -> DeviceBuffers:
        return buf._replace(base_key=rng)

    # ------------------------------------------------------------------
    def _step_impl(
        self,
        params: Any,
        buf: DeviceBuffers,
        frame: jnp.ndarray,  # [N, H, W] u8 (newest frame; garbage when first)
        reward: jnp.ndarray,  # [N] f32 (outcome of step t-1)
        done: jnp.ndarray,  # [N] bool (terminal flag of step t-1)
        reset: jnp.ndarray,  # [N] bool (done | truncated of step t-1)
        t: jnp.ndarray,  # i32 scalar
        first: bool,
        last: bool,
    ):
        C = buf.stack.shape[1]
        if not first:
            # fold in the outcome of step t-1 and advance the frame stack
            tm1 = t - 1
            new_stack = jnp.where(
                reset[:, None, None, None],
                jnp.repeat(frame[:, None], C, axis=1),  # FrameStack reset fill
                jnp.concatenate([buf.stack[:, 1:], frame[:, None]], axis=1),
            )
            next_obs = new_stack[:, -1:] if self._pixel_rnd else new_stack
            buf = buf._replace(
                stack=new_stack,
                rewards=jax.lax.dynamic_update_index_in_dim(
                    buf.rewards, reward, tm1, 0
                ),
                dones=jax.lax.dynamic_update_index_in_dim(buf.dones, done, tm1, 0),
                next_obs=jax.lax.dynamic_update_index_in_dim(
                    buf.next_obs, next_obs, tm1, 0
                ),
            )

        # act on the current stack (also the bootstrap pass when last)
        key = jax.random.fold_in(buf.base_key, t)
        if self.mesh is not None:
            # decorrelate sampling noise across env shards
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        k_sample, k_drop, k_noise = jax.random.split(key, 3)
        obs = buf.stack.astype(jnp.float32) / 255.0
        out = self.agent.network.apply(
            {"params": params["policy"]},
            obs,
            False,
            rngs={"dropout": k_drop, "noise": k_noise},
        )
        buf = buf._replace(
            value_ext=jax.lax.dynamic_update_index_in_dim(
                buf.value_ext, out.value_ext[:, 0], t, 0
            ),
            value_int=jax.lax.dynamic_update_index_in_dim(
                buf.value_int, out.value_int[:, 0], t, 0
            ),
        )
        if last:
            return buf, buf.actions[0]  # dummy actions, unused

        if self._discrete:
            action = sample_categorical(k_sample, out.policy)
            pol = out.policy
        else:
            action, logp = sample_normal(k_sample, out.policy, out.std)
            pol = logp[:, None]
        buf = buf._replace(
            states=jax.lax.dynamic_update_index_in_dim(buf.states, buf.stack, t, 0),
            actions=jax.lax.dynamic_update_index_in_dim(buf.actions, action, t, 0),
            policy=jax.lax.dynamic_update_index_in_dim(buf.policy, pol, t, 0),
        )
        return buf, action

    # ------------------------------------------------------------------
    # Row-mode wire protocol (single-chip): one small uint8 upload per step,
    # layout [N*H*W frame bytes | N reset | 4 t i32 bytes], and only
    # per-step-row outputs (new stack, action, value/policy rows). The host
    # buffer is reused across steps — safe because the blocking action
    # fetch for step t forces the payload transfer of step t to complete
    # before the host repacks for step t+1.
    # ------------------------------------------------------------------
    def _pack(self, frame: np.ndarray, reset: np.ndarray, t: int) -> np.ndarray:
        N, H, W = frame.shape
        F = N * H * W
        if self._paybuf is None or self._paybuf.shape[0] != F + N + 4:
            self._paybuf = np.empty(F + N + 4, np.uint8)
        pay = self._paybuf
        pay[:F] = frame.reshape(-1)
        pay[F : F + N] = reset
        pay[F + N :] = np.array([t], "<i4").view(np.uint8)
        return pay

    def _row_step_impl(
        self,
        params: Any,
        base_key: jax.Array,
        stack: jnp.ndarray,  # [N, C, H, W] u8
        payload: jnp.ndarray,  # [N*H*W + N + 4] u8, layout above
        first: bool,
        last: bool,
    ):
        N, C, H, W = stack.shape
        F = N * H * W
        frame = payload[:F].reshape(N, H, W)
        reset = payload[F : F + N].astype(jnp.bool_)
        t = jax.lax.bitcast_convert_type(
            payload[F + N :].reshape(1, 4), jnp.int32
        )[0]
        if not first:
            # fold in step t-1's frame and advance the stack (same math as
            # the buffered _step_impl)
            stack = jnp.where(
                reset[:, None, None, None],
                jnp.repeat(frame[:, None], C, axis=1),
                jnp.concatenate([stack[:, 1:], frame[:, None]], axis=1),
            )
        next_obs_row = stack[:, -1:] if self._pixel_rnd else stack

        key = jax.random.fold_in(base_key, t)
        k_sample, k_drop, k_noise = jax.random.split(key, 3)
        obs = stack.astype(jnp.float32) / 255.0
        out = self.agent.network.apply(
            {"params": params["policy"]},
            obs,
            False,
            rngs={"dropout": k_drop, "noise": k_noise},
        )
        v_ext, v_int = out.value_ext[:, 0], out.value_int[:, 0]
        if last:
            return stack, v_ext, v_int, next_obs_row
        if self._discrete:
            action = sample_categorical(k_sample, out.policy)
            pol = out.policy
        else:
            action, logp = sample_normal(k_sample, out.policy, out.std)
            pol = logp[:, None]
        return stack, action, pol, v_ext, v_int, next_obs_row

    def _collect_rows(
        self, params: Any, states_u8: np.ndarray, rng: jax.Array
    ) -> Tuple[Rollout, np.ndarray]:
        cfg = self.cfg
        T = cfg.num_step
        N, _, H, W = states_u8.shape
        if self._row_stack is None:
            self._row_stack = jnp.asarray(states_u8)
        stack = self._row_stack

        states_rows, action_rows, pol_rows = [], [], []
        vext_rows, vint_rows, nobs_rows = [], [], []
        rewards_np = np.empty((T, N), np.float32)
        dones_np = np.empty((T, N), np.bool_)

        frame = np.zeros((N, H, W), np.uint8)
        reset = np.zeros(N, np.bool_)
        for t in range(T):
            stack, action, pol, v_ext, v_int, nobs = self._row_step(
                params,
                rng,
                stack,
                jnp.asarray(self._pack(frame, reset, t)),
                first=(t == 0),
                last=False,
            )
            actions = np.asarray(action)
            states_rows.append(stack)
            action_rows.append(action)
            pol_rows.append(pol)
            vext_rows.append(v_ext)
            vint_rows.append(v_int)
            if t > 0:
                nobs_rows.append(nobs)  # next_obs of step t-1

            states_u8, rewards, dones, truns, infos = self.env.step(actions)
            frame = states_u8[:, -1]
            rewards_np[t] = rewards
            dones_np[t] = dones
            reset = dones | truns
            for info in infos:
                self.stats.add(info)
            if self.renderer is not None:
                self.renderer.render(states_u8[:, -1:])

        # final call: fold last outcome + bootstrap value (train.py:701-704)
        stack, v_ext, v_int, nobs = self._row_step(
            params,
            rng,
            stack,
            jnp.asarray(self._pack(frame, reset, T)),
            first=False,
            last=True,
        )
        vext_rows.append(v_ext)
        vint_rows.append(v_int)
        nobs_rows.append(nobs)
        self._row_stack = stack

        # ONE on-device stack per field at rollout end (the per-step rows
        # are device handles; nothing re-crosses the wire here)
        rollout = Rollout(
            states=jnp.stack(states_rows),
            actions=jnp.stack(action_rows),
            rewards=jnp.asarray(rewards_np),
            dones=jnp.asarray(dones_np),
            next_obs=jnp.stack(nobs_rows),
            value_ext=jnp.stack(vext_rows),
            value_int=jnp.stack(vint_rows),
            policy=jnp.stack(pol_rows),
        )
        return rollout, states_u8

    # ------------------------------------------------------------------
    def collect(
        self, params: Any, states_u8: np.ndarray, rng: jax.Array
    ) -> Tuple[Rollout, np.ndarray]:
        """One n-step rollout. ``states_u8`` is only used to (re)initialize
        the device stack on the first call; afterwards the device mirror is
        authoritative and stays in lock-step with the host pool."""
        if self._pipelined:
            return self._collect_pipelined(params, states_u8, rng)
        if self.mesh is None and not self._force_unpacked:
            return self._collect_rows(params, states_u8, rng)
        cfg = self.cfg
        T = cfg.num_step
        N = states_u8.shape[0]
        if self._buf is None:
            self.init_buffers(states_u8, rng)
        else:
            self._buf = self._reseed(self._buf, rng)

        zero_f = np.zeros((N, states_u8.shape[2], states_u8.shape[3]), np.uint8)
        zero_r = np.zeros(N, np.float32)
        zero_b = np.zeros(N, np.bool_)

        frame, reward, done, reset = zero_f, zero_r, zero_b, zero_b
        for t in range(T):
            self._buf, action_dev = self._step(
                params,
                self._buf,
                jnp.asarray(frame),
                jnp.asarray(reward),
                jnp.asarray(done),
                jnp.asarray(reset),
                jnp.asarray(t, jnp.int32),
                first=(t == 0),
                last=False,
            )
            actions = np.asarray(action_dev)
            states_u8, rewards, dones, truns, infos = self.env.step(actions)
            frame = states_u8[:, -1]
            reward, done, reset = (
                rewards.astype(np.float32),
                dones,
                dones | truns,
            )
            for info in infos:
                self.stats.add(info)
            if self.renderer is not None:
                self.renderer.render(states_u8[:, -1:])

        # final call: fold last outcome + bootstrap value (train.py:701-704)
        self._buf, _ = self._step(
            params,
            self._buf,
            jnp.asarray(frame),
            jnp.asarray(reward),
            jnp.asarray(done),
            jnp.asarray(reset),
            jnp.asarray(T, jnp.int32),
            first=False,
            last=True,
        )

        b = self._buf
        rollout = Rollout(
            states=b.states,
            actions=b.actions,
            rewards=b.rewards,
            dones=b.dones,
            next_obs=b.next_obs,
            value_ext=b.value_ext,
            value_int=b.value_int,
            policy=b.policy,
        )
        return rollout, states_u8

    # ------------------------------------------------------------------
    def _collect_pipelined(
        self, params: Any, states_u8: np.ndarray, rng: jax.Array
    ) -> Tuple[Rollout, np.ndarray]:
        """Half-fleet double-buffered rollout: while the device computes half
        X's action, the host steps half Y's envs — the action a half acts on
        is always fresh (no staleness), so the math is identical to the
        serial path; only the wall-clock interleaving changes.

        Timeline per step t (after the t=0 prologue)::

            dispatch device A(t)   |  host: env.step_slice(B, act_B(t-1))
            block on act_A(t)      |
            dispatch device B(t)   |  host: env.step_slice(A, act_A(t))
            block on act_B(t)      |
        """
        cfg = self.cfg
        T = cfg.num_step
        N = states_u8.shape[0]
        h = N // 2
        lo = [0, h]
        if self._half_bufs is None:
            self._half_bufs = [
                self._make_buffers(
                    states_u8[lo[i] : lo[i] + h], jax.random.fold_in(rng, i)
                )
                for i in (0, 1)
            ]
        else:
            self._half_bufs = [
                self._reseed(b, jax.random.fold_in(rng, i))
                for i, b in enumerate(self._half_bufs)
            ]

        H, W = states_u8.shape[2], states_u8.shape[3]
        zero_f = np.zeros((h, H, W), np.uint8)
        zero_r = np.zeros(h, np.float32)
        zero_b = np.zeros(h, np.bool_)
        # per-half (frame, reward, done, reset) pending fold-ins
        pend = [
            [zero_f, zero_r, zero_b, zero_b],
            [zero_f, zero_r, zero_b, zero_b],
        ]
        act_host = [None, None]  # actions awaiting env stepping

        def dispatch(i, t, first, last):
            f, r, d, rs = pend[i]
            self._half_bufs[i], a = self._step(
                params,
                self._half_bufs[i],
                jnp.asarray(f),
                jnp.asarray(r),
                jnp.asarray(d),
                jnp.asarray(rs),
                jnp.asarray(t, jnp.int32),
                first=first,
                last=last,
            )
            return a

        def host_step(i):
            if act_host[i] is None:
                return
            s, r, d, tr, infos = self.env.step_slice(
                lo[i], lo[i] + h, act_host[i]
            )
            pend[i] = [s[:, -1], r.astype(np.float32), d, d | tr]
            self._half_states[i] = s
            for info in infos:
                self.stats.add(info)
            act_host[i] = None

        self._half_states = [states_u8[:h], states_u8[h:]]
        for t in range(T):
            a_dev = dispatch(0, t, first=(t == 0), last=False)
            host_step(1)  # overlaps device half-A compute
            act_host[0] = np.asarray(a_dev)
            a_dev = dispatch(1, t, first=(t == 0), last=False)
            host_step(0)  # overlaps device half-B compute
            act_host[1] = np.asarray(a_dev)

        # epilogue: final env steps + bootstrap passes
        host_step(0)
        _ = dispatch(0, T, first=False, last=True)
        host_step(1)
        _ = dispatch(1, T, first=False, last=True)

        bA, bB = self._half_bufs
        cat = lambda a, b, ax: jnp.concatenate([a, b], axis=ax)
        rollout = Rollout(
            states=cat(bA.states, bB.states, 1),
            actions=cat(bA.actions, bB.actions, 1),
            rewards=cat(bA.rewards, bB.rewards, 1),
            dones=cat(bA.dones, bB.dones, 1),
            next_obs=cat(bA.next_obs, bB.next_obs, 1),
            value_ext=cat(bA.value_ext, bB.value_ext, 1),
            value_int=cat(bA.value_int, bB.value_int, 1),
            policy=cat(bA.policy, bB.policy, 1),
        )
        states_out = np.concatenate(self._half_states, axis=0)
        return rollout, states_out

    # reuse the host collector's warm-up implementation
    def warmup_obs_rms(self, state, states_u8, rng):
        from eavit_tpu.rl.rollout import RolloutCollector

        return RolloutCollector.warmup_obs_rms(self, state, states_u8, rng)

    def _next_obs_of(self, states: np.ndarray) -> np.ndarray:
        if self._pixel_rnd:
            return states[:, -1:, :, :]
        return states
