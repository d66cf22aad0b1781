"""Device-env training-path feature parity with the host path (VERDICT r3
item 5): the SSL-pretraining phase — which the reference runs
unconditionally on env type (reference train.py:292-499) — must execute
under ``EnvType=synthetic_device`` too, and resume must restore the env's
episode bookkeeping like the host path restores collector.stats
(reference train.py:926-956)."""

import json
import os

import numpy as np

from eavit_tpu.config import EnvType, RepresentationMethod, load_config
from eavit_tpu.train import (
    _device_env_stats_meta,
    _restore_device_env_stats,
    train,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(REPO, "configs", "synthetic_demo.conf")


def device_cfg(tmp_path, **kw):
    cfg = load_config(CONF)
    return cfg.replace(
        env_type=EnvType.SYNTHETIC_DEVICE,
        num_env_per_process=2,
        num_step=8,
        obs_norm_step=1,
        data_axis_size=1,  # single-device: the feature is path-, not mesh-, specific
        save_model_path=str(tmp_path / "ckpt"),
        save_ckpt_every=1,
        **kw,
    )


def test_ssl_pretraining_runs_on_device_env(tmp_path, capsys):
    """EnvType=synthetic_device + SSL_pretraining no longer silently skips
    the SSL phase: the pretrainer runs its epochs, checkpoints the SSL-best
    model, then PPO starts."""
    cfg = device_cfg(
        tmp_path,
        ssl_pretraining=True,
        representation_lr_method=RepresentationMethod.BYOL,
        ssl_pretrain_epochs=2,
        log_name="dev_ssl",
    )
    metrics = train(cfg, total_updates=1, log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])  # PPO ran after the SSL phase
    # the SSL-best checkpoint is the proof the pretraining loop executed
    # (ssl_loss watermark only moves inside ssl_pretrain)
    ssl_best = str(
        tmp_path / "ckpt" / "dev_ssl__BestModelForSSLEvaluationEpochLoss.json"
    )
    assert os.path.exists(ssl_best)
    with open(ssl_best) as f:
        meta = json.load(f)
    assert meta.get("phase") == "ssl_pretraining"


def test_device_env_stats_meta_roundtrip():
    """The sidecar encoding of the env bookkeeping is lossless."""
    from eavit_tpu.envs.device_env import make_device_env

    _, state = make_device_env(3, seed=11, grid=5)
    state = state._replace(
        finished_episodes=np.asarray([4, 0, 7], np.int32),
        last_episode_return=np.asarray([1.5, 0.0, -2.0], np.float32),
        last_episode_rooms=np.asarray([3, 1, 9], np.int32),
        ever_visited=np.asarray(
            np.arange(3 * 25).reshape(3, 25) % 3 == 0, bool
        ),
    )
    meta = {"device_env_stats": json.loads(json.dumps(_device_env_stats_meta(state)))}
    _, fresh = make_device_env(3, seed=11, grid=5)
    restored = _restore_device_env_stats(fresh, meta)
    np.testing.assert_array_equal(
        np.asarray(restored.finished_episodes), np.asarray(state.finished_episodes)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.last_episode_return), np.asarray(state.last_episode_return)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.last_episode_rooms), np.asarray(state.last_episode_rooms)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.ever_visited), np.asarray(state.ever_visited)
    )
    # absent stats (old checkpoints) leave the fresh state untouched
    untouched = _restore_device_env_stats(fresh, {})
    assert untouched is fresh


def test_device_env_resume_restores_episode_bookkeeping(tmp_path):
    """Train 3 updates, resume from the checkpoint: the cumulative
    exploration frontier (ever_visited -> data/mean_rooms_discovered) must
    carry across the restart instead of resetting to 1."""
    cfg = device_cfg(tmp_path, log_name="dev_resume", synthetic_maze=True)
    m1 = train(cfg, total_updates=3, log_dir=str(tmp_path / "logs"))
    rooms_before = m1["data/mean_rooms_discovered"]
    assert rooms_before > 1.0  # explored beyond the start room

    ckpt = str(tmp_path / "ckpt" / "dev_resume")
    with open(ckpt + ".json") as f:
        meta = json.load(f)
    assert "device_env_stats" in meta

    cfg2 = cfg.replace(load_model=True, load_model_path=ckpt)
    m2 = train(cfg2, total_updates=4, log_dir=str(tmp_path / "logs2"))
    # one post-resume rollout can only grow the restored frontier
    assert m2["data/mean_rooms_discovered"] >= rooms_before
