"""Measure the flagship PPO/RND update in isolation, across backbone modes.

Matrix: {exact stacked, shared-patch-stream (dual-query)} x {xla, pallas}.
Prints seconds/update for each combination plus rollout (scan) timing, so
BASELINE.md numbers are regenerable. Run on the real TPU:

    python scripts/update_bench.py [--updates 3]

A jax.profiler trace of one update can be dumped with --trace DIR.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod
from eavit_tpu.rl.agent import RNDAgent, Rollout
from eavit_tpu.train import setup_jax


def make_rollout(cfg: Config, seed: int = 0) -> Rollout:
    rng = np.random.default_rng(seed)
    T, N = cfg.num_step, cfg.num_env_per_process
    h = w = cfg.pre_proc_height
    c = cfg.state_stack_size
    return Rollout(
        states=jnp.asarray(rng.integers(0, 256, (T, N, c, h, w)), jnp.uint8),
        actions=jnp.asarray(rng.integers(0, 18, (T, N)), jnp.int32),
        rewards=jnp.asarray(rng.normal(size=(T, N)), jnp.float32),
        dones=jnp.zeros((T, N), jnp.bool_),
        next_obs=jnp.asarray(rng.integers(0, 256, (T, N, 1, h, w)), jnp.uint8),
        value_ext=jnp.asarray(rng.normal(size=(T + 1, N)), jnp.float32),
        value_int=jnp.asarray(rng.normal(size=(T + 1, N)), jnp.float32),
        policy=jnp.asarray(rng.normal(size=(T, N, 18)), jnp.float32),
    )


def time_update(cfg: Config, updates: int, trace_dir: str | None = None) -> float:
    agent = RNDAgent(cfg, 18)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    ro = make_rollout(cfg)
    # compile + warm
    state, m = agent.update(state, ro, jax.random.PRNGKey(1))
    float(m["train/loss"])
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(updates):
        state, m = agent.update(state, ro, jax.random.PRNGKey(2 + i))
        float(m["train/loss"])  # fetch: block_until_ready unreliable on axon
    dt = (time.perf_counter() - t0) / updates
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"# trace -> {trace_dir}")
    return dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=3)
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--num_step", type=int, default=128)
    p.add_argument("--dim", type=int, default=0, help="override ViT dim (0=flagship)")
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--modes", type=str,
                   default="exact/xla,exact/pallas,exact/pallas_stream,"
                           "shared/xla,shared/pallas,shared/pallas_stream")
    a = p.parse_args()

    base = Config(
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=a.num_step,
        num_env_per_process=a.num_envs,
        epoch=4,
        mini_batch=32,
        max_step_per_episode=4500,
    )
    if a.dim:
        from eavit_tpu.config import ViTConfig

        base = base.replace(
            vit=ViTConfig(dim=a.dim, patch_size=6, depth=3, heads=8,
                          dim_head=a.dim // 8, mlp_dim=4 * a.dim)
        )
    setup_jax(base)
    frames = base.num_step * base.num_env_per_process
    for mode in a.modes.split(","):
        stream, impl = mode.split("/")
        cfg = base.replace(
            shared_patch_stream=(stream == "shared"),
            attention_impl=impl,
        )
        trace = a.trace and os.path.join(a.trace, mode.replace("/", "_"))
        dt = time_update(cfg, a.updates, trace)
        print(
            f"{mode:16s} {dt:7.2f}s/update  "
            f"{frames / dt:8.1f} update-frames/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
