"""Full train driver with data_axis_size > 1: the auto-built
DataParallelAgent must train end-to-end on the virtual CPU mesh."""

import numpy as np

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.train import train


def test_trainer_data_parallel(tmp_path):
    cfg = Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        env_type="synthetic",
        num_step=4,
        num_env_per_process=4,  # 2 envs per device
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        max_step_per_episode=16,
        compute_dtype="float32",
        use_pallas_attention=False,
        data_axis_size=2,
        save_model_path=str(tmp_path / "ckpt"),
        save_ckpt_every=1,
    )
    metrics = train(cfg, total_updates=2, log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])


def test_trainer_dp_with_minibatch_merge(tmp_path):
    """MiniBatchMerge under the shard_map DP path: merged optimizer steps
    with pmean'd gradients must train end-to-end (flagship confs default
    to DataAxisSize=0, so the merge knob has to compose with DP)."""
    cfg = Config(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        env_type="synthetic",
        num_step=4,
        num_env_per_process=4,
        mini_batch=2,
        minibatch_merge=2,  # one optimizer step per epoch
        epoch=2,
        obs_norm_step=1,
        max_step_per_episode=16,
        compute_dtype="float32",
        use_pallas_attention=False,
        data_axis_size=2,
        save_model_path=str(tmp_path / "ckpt"),
    )
    metrics = train(cfg, total_updates=1, log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])
