"""Multi-host wiring: env fleets on different process ranks must be
seeded disjointly (reference dist_utils.py:108-109: seed + GLOBAL_RANK *
num_env + idx) and train() must derive rank from the JAX runtime."""

import numpy as np

from eavit_tpu.config import Config, EnvType
from eavit_tpu.envs.builders import make_vector_env


def _cfg(**kw):
    base = dict(
        env_type=EnvType.SYNTHETIC,
        num_env_per_process=4,
        max_step_per_episode=32,
        synthetic_grid=4,
    )
    base.update(kw)
    return Config(**base)


def test_rank_fleets_are_disjointly_seeded():
    cfg = _cfg()
    env0 = make_vector_env(cfg, rank=0)
    env1 = make_vector_env(cfg, rank=1)
    s0, s1 = env0.reset(), env1.reset()
    rng = np.random.default_rng(0)
    diff = False
    for _ in range(8):
        a = rng.integers(0, env0.action_space_n, size=cfg.num_env_per_process)
        s0 = env0.step(a)[0]
        s1 = env1.step(a)[0]
        if not np.array_equal(s0, s1):
            diff = True
            break
    assert diff, "rank-0 and rank-1 fleets produced identical trajectories"
    env0.close(), env1.close()


def test_rank_overlap_matches_reference_arithmetic():
    """rank-1's env 0 must equal rank-0's env num_env (same global seed)."""
    cfg = _cfg()
    env0 = make_vector_env(cfg.replace(num_env_per_process=8), rank=0)
    env1 = make_vector_env(cfg, rank=1)  # global seeds 42+4..42+7
    s0, s1 = env0.reset(), env1.reset()
    # envs 4..7 of the rank-0 fleet share seeds with envs 0..3 of rank-1
    assert np.array_equal(s0[4:8], s1)
    env0.close(), env1.close()


def test_train_uses_process_rank(monkeypatch):
    """train() passes jax.process_index() into the env fleet builder."""
    import eavit_tpu.train as T

    captured = {}
    real = T.make_vector_env

    def spy(cfg, rank=0, render=False):
        captured["rank"] = rank
        return real(cfg, rank=rank, render=render)

    monkeypatch.setattr(T, "make_vector_env", spy)
    monkeypatch.setattr(
        "eavit_tpu.parallel.dp.get_dist_info", lambda: (4, 3, 1, 3)
    )
    cfg = _cfg(
        num_env_per_process=2, num_step=4, mini_batch=2, epoch=1,
        obs_norm_step=1, compute_dtype="float32",
        vit=__import__("eavit_tpu.config", fromlist=["ViTConfig"]).ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
    )
    T.train(cfg, total_updates=1)
    assert captured["rank"] == 3
