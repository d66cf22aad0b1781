"""Decompose the host-env rollout's per-step wall cost on the tunneled chip.

The optimized bench arm spends ~12.6 s of a 15.8 s update cycle in the
host-driven rollout (~98 ms per env step at 64 envs), while the jitted
act forward at that batch is a few ms — so the per-step cost is wire
protocol, not compute. This probe times each component in isolation:

  rtt            tiny device_put + fetch (one round trip floor)
  up_frame       [N,H,W]u8 upload, blocked (the real payload)
  up_flags_x3    reward/done/reset as three separate uploads, blocked
  up_scalar      the per-step `t` scalar upload, blocked
  step_full      DeviceRolloutCollector._step dispatch + action fetch
  env_step       host SyntheticVectorEnv.step
  act_only       bare jitted policy forward + sample, dispatch->fetch

Run: timeout 600 python scripts/rollout_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.envs.synthetic import SyntheticVectorEnv
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.device_rollout import DeviceRolloutCollector
from eavit_tpu.train import setup_jax

N, T = int(os.environ.get("PROBE_N", 64)), int(os.environ.get("PROBE_T", 16))
REPS = 16


def med(ts):
    return float(np.median(ts) * 1000)


def timeit(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return med(ts)


def main():
    cfg = Config(
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=T,
        num_env_per_process=N,
        epoch=4,
        mini_batch=32,
        obs_norm_step=0,
        max_step_per_episode=4500,
        shared_patch_stream=True,
        attention_impl="pallas_qkv",
        fused_ffn=True,
    )
    setup_jax(cfg)
    env = SyntheticVectorEnv(N, seed=42, max_episode_steps=4500)
    agent = RNDAgent(cfg, env.action_space_n)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    col = DeviceRolloutCollector(cfg, agent, env)
    states = env.reset()

    # warm everything (compiles). NOTE: collect() folds the key into the
    # donated DeviceBuffers, so never reuse a key after passing it in.
    rng, k = jax.random.split(rng)
    ro, states = col.collect(state.params, states, k)
    jax.block_until_ready(ro.states)

    dev = jax.devices()[0]
    tiny = np.zeros(8, np.float32)
    frame = states[:, -1].copy()
    flags = [np.zeros(N, np.float32), np.zeros(N, np.bool_), np.zeros(N, np.bool_)]

    print(f"rtt            {timeit(lambda: np.asarray(jax.device_put(tiny, dev))):8.2f} ms")
    print(f"up_frame       {timeit(lambda: jax.device_put(frame, dev).block_until_ready()):8.2f} ms")

    def up3():
        xs = [jax.device_put(f, dev) for f in flags]
        for x in xs:
            x.block_until_ready()

    print(f"up_flags_x3    {timeit(up3):8.2f} ms")
    print(f"up_scalar      {timeit(lambda: jax.device_put(np.int32(3), dev).block_until_ready()):8.2f} ms")

    # bare act: policy forward + sample, minimal wire (obs already on device)
    stack_dev = jax.device_put(states, dev)

    @jax.jit
    def act_only(params, stack, key):
        k1, k2, k3 = jax.random.split(key, 3)
        obs = stack.astype(jnp.float32) / 255.0
        out = agent.network.apply(
            {"params": params["policy"]}, obs, False,
            rngs={"dropout": k2, "noise": k3},
        )
        from eavit_tpu.rl.ppo import sample_categorical
        a = sample_categorical(k1, out.policy)
        return a

    rng, k_act = jax.random.split(rng)
    a = act_only(state.params, stack_dev, k_act)
    np.asarray(a)
    print(f"act_only       {timeit(lambda: np.asarray(act_only(state.params, stack_dev, k_act))):8.2f} ms")

    # full row-mode step as the collector drives it (packed payload upload
    # + dispatch + action fetch; only per-step rows come back)
    zero_b = np.zeros(N, np.bool_)

    def step_full():
        _stk, act, *_rows = col._row_step(
            state.params, jax.random.PRNGKey(5), col._row_stack,
            jnp.asarray(col._pack(frame, zero_b, 3)),
            first=False, last=False,
        )
        np.asarray(act)

    step_full()
    print(f"step_row       {timeit(step_full):8.2f} ms")

    actions = np.zeros(N, np.int64)
    print(f"env_step       {timeit(lambda: env.step(actions)):8.2f} ms")

    # end-to-end per-step from timed collects. The first post-warmup
    # collect compiles _reseed (init_buffers was used in warmup), so time
    # several and report each.
    for i in range(4):
        rng, k2 = jax.random.split(rng)
        t0 = time.perf_counter()
        ro, states = col.collect(state.params, states, k2)
        jax.block_until_ready(ro.states)
        dt = time.perf_counter() - t0
        print(f"collect[{i}] {T} steps: {dt*1000:.0f} ms -> {dt/T*1000:.1f} ms/step")


if __name__ == "__main__":
    main()
