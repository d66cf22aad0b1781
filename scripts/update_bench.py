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


# ---------------------------------------------------------------------------
# analytic FLOPs model (MAC = 2 FLOPs); used for the MFU column
# ---------------------------------------------------------------------------

# bf16 peak of the target chip; override for other parts
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))  # v5e


def policy_fwd_flops(cfg: Config, output_size: int = 18) -> float:
    """Matmul FLOPs of ONE ActorCritic forward on one sample."""
    v = cfg.vit
    D, L, M = v.dim, v.depth, v.mlp_dim
    inner = v.heads * v.dim_head
    n_p = (cfg.pre_proc_height // v.patch_size) * (cfg.pre_proc_width // v.patch_size)
    # exact mode stacks two (n_p + 1)-token streams; shared-patch-stream is
    # one (n_p + 2)-token pass (models/vit.py)
    n, streams = (n_p + 2, 1) if cfg.shared_patch_stream else (n_p + 1, 2)
    per_tok_layer = (
        2 * D * 3 * inner      # qkv projection
        + 2 * inner * D        # output projection
        + 2 * 2 * D * M        # MLP up + down
    )
    attn_per_tok_layer = 2 * 2 * n * inner  # QK^T + PV
    embed_per_tok = 2 * (v.patch_size ** 2 * cfg.state_stack_size) * D
    backbone = streams * n * (
        L * (per_tok_layer + attn_per_tok_layer) + embed_per_tok
    )
    heads = 2 * D * (D + output_size) + 2 * 2 * (D * D + D)  # actor + 2 critics
    return float(backbone + heads)


def rnd_fwd_flops(cfg: Config) -> tuple:
    """(predictor_fwd, target_fwd) matmul FLOPs on one sample
    (original_RND conv trunks, models/rnd.py)."""
    h = cfg.pre_proc_height
    trunk = 0.0
    c_in = 1
    for c_out, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
        h = (h - k) // s + 1
        trunk += 2 * k * k * c_in * c_out * h * h
        c_in = c_out
    flat = h * h * c_in
    pred = trunk + 2 * (flat * 512 + 512 * 512 + 512 * 512)
    targ = trunk + 2 * flat * 512
    return float(pred), float(targ)


def flops_per_update(cfg: Config, output_size: int = 18) -> float:
    """Total matmul FLOPs of one agent.update() call (rl/agent.py):
    intrinsic pass over the rollout + Epoch x MiniBatch SGD where each
    sample costs fwd+bwd (~3x fwd) on policy and RND predictor plus a
    frozen-target forward."""
    samples = cfg.num_step * cfg.num_env_per_process
    pol = policy_fwd_flops(cfg, output_size)
    pred, targ = rnd_fwd_flops(cfg)
    intrinsic = samples * (pred + targ)
    sgd = cfg.epoch * samples * (3 * pol + 3 * pred + targ)
    return intrinsic + sgd


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
    p.add_argument(
        "--merge", type=int, default=1,
        help="MiniBatchMerge: fuse m consecutive minibatches into one "
        "optimizer step (same samples/epochs, higher arithmetic intensity; "
        "a documented schedule divergence — config.py minibatch_merge)",
    )
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--modes", type=str,
                   default="exact/xla,exact/pallas,exact/pallas_stream,"
                           "shared/xla,shared/pallas,shared/pallas_stream")
    p.add_argument("--remat", type=str, default="none",
                   help="encoder_remat: none|full|dots (config.py)")
    p.add_argument("--qkv_impl", type=str, default=None,
                   help="flash_qkv head-loop strategy: unroll|fori|split")
    p.add_argument("--qkv_budget", type=int, default=0,
                   help="flash_qkv per-cell score budget bytes (0=default)")
    a = p.parse_args()
    if a.qkv_impl or a.qkv_budget:
        from eavit_tpu.ops import flash_qkv as _fq

        if a.qkv_impl:
            _fq.set_impl(a.qkv_impl)
        if a.qkv_budget:
            _fq.set_budget(a.qkv_budget)
        print(f"# flash_qkv impl={_fq._IMPL} budget={_fq._budget()}")

    base = Config(
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=a.num_step,
        num_env_per_process=a.num_envs,
        epoch=4,
        mini_batch=32,
        minibatch_merge=a.merge,
        max_step_per_episode=4500,
        encoder_remat=a.remat,
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
        # "<stream>/<attn_impl>[+ffn]": +ffn enables the fused FFN kernel
        stream, impl = mode.split("/")
        fused_ffn = impl.endswith("+ffn")
        impl = impl.removesuffix("+ffn")
        cfg = base.replace(
            shared_patch_stream=(stream == "shared"),
            attention_impl=impl,
            fused_ffn=fused_ffn,
        )
        trace = a.trace and os.path.join(a.trace, mode.replace("/", "_"))
        dt = time_update(cfg, a.updates, trace)
        fl = flops_per_update(cfg)
        mfu = fl / dt / (PEAK_TFLOPS * 1e12)
        print(
            f"{mode:16s} {dt:7.2f}s/update  "
            f"{frames / dt:8.1f} update-frames/s  "
            f"{fl / 1e12:6.1f} TFLOP  {fl / dt / 1e12:5.1f} TFLOP/s  "
            f"MFU {100 * mfu:4.1f}% (peak {PEAK_TFLOPS:.0f} bf16)",
            flush=True,
        )


if __name__ == "__main__":
    main()
