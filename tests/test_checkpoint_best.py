"""Best-metric watermark persistence across resume (reference train.py:904-923)
and device-env-path checkpoint resume."""

import jax
import numpy as np

from eavit_tpu.config import Config, EnvType, TrainMethod, ViTConfig
from eavit_tpu.utils.checkpoint import CheckpointManager, load_checkpoint


def tiny_cfg(**kw):
    base = dict(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        num_step=4,
        num_env_per_process=2,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        compute_dtype="float32",
        use_pallas_attention=False,
        max_step_per_episode=16,
        save_ckpt_every=1,
    )
    base.update(kw)
    return Config(**base)


def test_best_watermarks_survive_resume(tmp_path):
    from eavit_tpu.rl.agent import RNDAgent

    cfg = tiny_cfg()
    agent = RNDAgent(cfg, 5)
    state = agent.init_state(jax.random.PRNGKey(0))

    ckpt = CheckpointManager(str(tmp_path), "run", save_every=1)
    w1 = ckpt.maybe_save(state, 1, {"global_update": 1}, mean_episode_return=10.0)
    assert "episode_return" in w1
    # lower metric: no best save
    w2 = ckpt.maybe_save(state, 2, {"global_update": 2}, mean_episode_return=5.0)
    assert "episode_return" not in w2

    # resume into a fresh manager: best watermark restored from sidecar
    _, meta = load_checkpoint(w1["scheduled"], state)
    ckpt2 = CheckpointManager(str(tmp_path), "run", save_every=1)
    ckpt2.restore_best(meta)
    assert ckpt2.best["episode_return"] == 10.0
    w3 = ckpt2.maybe_save(state, 3, {"global_update": 3}, mean_episode_return=7.0)
    assert "episode_return" not in w3  # 7 < 10: must NOT overwrite best file
    w4 = ckpt2.maybe_save(state, 4, {"global_update": 4}, mean_episode_return=11.0)
    assert "episode_return" in w4


def test_device_env_train_resumes_from_checkpoint(tmp_path):
    """_train_device_env honors load_model: params AND update counter resume
    (round-1 gap: it silently restarted from fresh params)."""
    from eavit_tpu.train import train

    cfg = tiny_cfg(
        env_type=EnvType.SYNTHETIC_DEVICE,
        train_method=TrainMethod.ORIGINAL_RND,
        save_model_path=str(tmp_path),
        log_name="devresume",
        synthetic_grid=4,
    )
    train(cfg, total_updates=2)
    ckpt_path = str(tmp_path / "devresume")

    cfg2 = cfg.replace(load_model=True, load_model_path=ckpt_path)
    metrics = train(cfg2, total_updates=3)  # resumes at 2, runs 1 more
    assert metrics  # ran exactly the one remaining update without error
