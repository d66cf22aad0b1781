"""Worker/oracle for the 2-OS-process DataParallelAgent.update test.

Modes (argv[1]):
  worker <pid> <port> — one of two ranks (1 CPU device each): rendezvous via
      ``init_distributed``, build the 2-device global mesh, run ONE full DP
      update (psum-pooled RMS moments + pmean'd gradients, the program the
      reference's DDP all-reduce performs across real ranks,
      dist_utils.py:61-77, train.py:240-247) on a deterministic rollout
      sharded across the PROCESS boundary.
  oracle — single process, 2 virtual CPU devices, same mesh/update/data.

Both print ``FP <sum|param|> <rewems0> <rewems1>`` — the test asserts the
cross-process result equals the single-process one.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
MODE = sys.argv[1]
if MODE == "worker":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
else:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the TPU image's sitecustomize writes jax.config.jax_platforms directly
# ("axon,cpu"), outranking the env var — same override as tests/conftest.py
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from eavit_tpu.config import Config, TrainMethod, ViTConfig  # noqa: E402
from eavit_tpu.parallel.dp import DataParallelAgent, init_distributed  # noqa: E402
from eavit_tpu.rl.agent import Rollout  # noqa: E402

T, N_GLOBAL, ACTIONS = 8, 4, 3


def build_cfg() -> Config:
    return Config(
        train_method=TrainMethod.ORIGINAL_RND,
        num_env_per_process=N_GLOBAL,
        num_step=T,
        epoch=1,
        mini_batch=2,
        pre_proc_height=36,
        pre_proc_width=36,
        vit=ViTConfig(dim=32, patch_size=12, depth=1, heads=2,
                      mlp_dim=64, dim_head=16),
        extracted_feature_embedding_dim=32,
        seed=7,
    )


def build_rollout(cfg: Config) -> Rollout:
    """Deterministic GLOBAL rollout, identical in every process."""
    r = np.random.default_rng(123)
    C, H, W = cfg.state_stack_size, cfg.pre_proc_height, cfg.pre_proc_width
    return Rollout(
        states=r.integers(0, 255, (T, N_GLOBAL, C, H, W)).astype(np.uint8),
        actions=r.integers(0, ACTIONS, (T, N_GLOBAL)).astype(np.int32),
        rewards=r.normal(size=(T, N_GLOBAL)).astype(np.float32),
        dones=(r.random((T, N_GLOBAL)) < 0.1),
        next_obs=r.integers(0, 255, (T, N_GLOBAL, 1, H, W)).astype(np.uint8),
        value_ext=r.normal(size=(T + 1, N_GLOBAL)).astype(np.float32),
        value_int=r.normal(size=(T + 1, N_GLOBAL)).astype(np.float32),
        policy=r.normal(size=(T, N_GLOBAL, ACTIONS)).astype(np.float32),
    )


def fingerprint(state) -> str:
    """Params are replicated -> one scalar; rewems is env-sharded -> print
    the LOCAL shard(s) in device order (the test aligns worker pid k with
    the oracle's k-th half)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(state.params):
        total += float(np.sum(np.abs(np.asarray(leaf.addressable_data(0),
                                                np.float64))))
    rewems = np.concatenate([
        np.asarray(shard.data).reshape(-1)
        for shard in state.reward_filter.rewems.addressable_shards
    ])
    vals = " ".join(f"{v:.9f}" for v in rewems)
    return f"FP {total:.6f} {vals}"


def main():
    if MODE == "worker":
        pid, port = int(sys.argv[2]), sys.argv[3]
        init_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2,
            process_id=pid,
        )
        assert jax.process_count() == 2 and jax.device_count() == 2
    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    cfg = build_cfg()
    agent = DataParallelAgent(cfg, ACTIONS, mesh)
    state = agent.init_state(jax.random.PRNGKey(cfg.seed))

    ro_global = build_rollout(cfg)
    env_sharding = NamedSharding(mesh, P(None, "data"))
    if MODE == "worker":
        lo = pid * (N_GLOBAL // 2)
        hi = lo + N_GLOBAL // 2

        def place(x):
            return jax.make_array_from_process_local_data(
                env_sharding, np.asarray(x)[:, lo:hi]
            )
    else:
        def place(x):
            return jax.device_put(np.asarray(x), env_sharding)

    ro = Rollout(*(place(x) for x in ro_global))

    # obs-RMS warm-up takes a FLAT [B, 1, H, W] batch sharded on dim 0
    # (train.py's host path flattens before update_obs_rms). RMS moments
    # are permutation-invariant and psum-pooled, so local flatten order
    # doesn't affect the pooled result.
    flat_sharding = NamedSharding(mesh, P("data"))
    no = np.asarray(ro_global.next_obs)
    if MODE == "worker":
        local = no[:, lo:hi].reshape((-1,) + no.shape[2:])
        flat = jax.make_array_from_process_local_data(flat_sharding, local)
    else:
        full = np.concatenate(
            [no[:, :2].reshape((-1,) + no.shape[2:]),
             no[:, 2:].reshape((-1,) + no.shape[2:])]
        )
        flat = jax.device_put(full, flat_sharding)
    state = agent.update_obs_rms(state, flat)
    state, metrics = agent.update(state, ro, jax.random.PRNGKey(99))
    print(fingerprint(state), float(metrics["train/loss"]), flush=True)
    if MODE == "worker":
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
