"""HG-flavor backbone end-to-end (reference vit_hg.py:227-402 +
model.py:310-348): the HF-style dual-token ViT must TRAIN, not just pass
golden-parity forwards (tests/test_hg_hf_parity.py covers those). Covers
the single-agent update loop and the 8-device DP mesh."""

import numpy as np

from eavit_tpu.config import (
    Config,
    TrainMethod,
    ViTHGConfig,
    ViTImplementation,
)
from eavit_tpu.train import train


def hg_cfg(tmp_path, **kw) -> Config:
    base = dict(
        vit_implementation_type=ViTImplementation.HG,
        vit_hg=ViTHGConfig(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, patch_size=21,
        ),
        extracted_feature_embedding_dim=32,
        train_method=TrainMethod.ORIGINAL_RND,
        env_type="synthetic",
        num_step=4,
        num_env_per_process=4,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        max_step_per_episode=16,
        compute_dtype="float32",
        save_model_path=str(tmp_path / "ckpt"),
        save_ckpt_every=100,
    )
    base.update(kw)
    return Config(**base)


def test_hg_trains_end_to_end(tmp_path):
    metrics = train(hg_cfg(tmp_path), total_updates=2,
                    log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])
    assert np.isfinite(metrics["train/rnd_loss"])


def test_hg_trains_on_dp_mesh(tmp_path):
    metrics = train(
        hg_cfg(tmp_path, data_axis_size=2),
        total_updates=2,
        log_dir=str(tmp_path / "logs"),
    )
    assert np.isfinite(metrics["train/loss"])
