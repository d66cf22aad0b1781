"""Trainer driver + CLI + checkpoint round-trip tests (synthetic env)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from eavit_tpu.config import Config, RepresentationMethod, TrainMethod, load_config
from eavit_tpu.train import train
from eavit_tpu.utils.checkpoint import (
    BEST_SUFFIXES,
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(REPO, "configs", "synthetic_demo.conf")


def demo_cfg(tmp_path, **kw):
    cfg = load_config(CONF)
    return cfg.replace(
        num_env_per_process=2,
        num_step=8,
        obs_norm_step=1,
        save_model_path=str(tmp_path / "ckpt"),
        save_ckpt_every=1,
        **kw,
    )


def test_train_runs_updates(tmp_path):
    cfg = demo_cfg(tmp_path)
    metrics = train(cfg, total_updates=2, log_dir=str(tmp_path / "logs"))
    assert np.isfinite(metrics["train/loss"])
    assert metrics["data/num_episodes"] >= 0
    # scheduled checkpoint written
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), cfg.log_name + ".msgpack"))


def test_checkpoint_roundtrip(tmp_path):
    from eavit_tpu.rl.agent import RNDAgent

    cfg = demo_cfg(tmp_path)
    agent = RNDAgent(cfg, 5)
    state = agent.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "x")
    save_checkpoint(path, state, {"global_update": 7, "rooms": {1, 2}})

    agent2 = RNDAgent(cfg, 5)
    template = agent2.init_state(jax.random.PRNGKey(1))
    restored, meta = load_checkpoint(path, template)
    assert meta["global_update"] == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(restored.obs_rms.mean), np.asarray(state.obs_rms.mean)
    )


def test_resume_skips_warmup_and_continues(tmp_path):
    cfg = demo_cfg(tmp_path)
    train(cfg, total_updates=1, log_dir=str(tmp_path / "logs"))
    ckpt_path = os.path.join(str(tmp_path / "ckpt"), cfg.log_name)
    cfg2 = cfg.replace(load_model=True, load_model_path=ckpt_path)
    metrics = train(cfg2, total_updates=2, log_dir=str(tmp_path / "logs2"))
    assert np.isfinite(metrics["train/loss"])


def test_best_model_suffixes(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "run", save_every=100)
    state = {"w": np.zeros(2)}
    w = mgr.maybe_save(state, 1, {}, mean_rollout_reward=1.0, mean_episode_return=5.0)
    assert set(w) == {"rollout_reward", "episode_return"}
    assert w["rollout_reward"].endswith(BEST_SUFFIXES["rollout_reward"])
    # worse values do not save
    w = mgr.maybe_save(state, 2, {}, mean_rollout_reward=0.5, mean_episode_return=4.0)
    assert not w
    # better values do
    w = mgr.maybe_save(state, 3, {}, mean_rollout_reward=2.0)
    assert "rollout_reward" in w


def test_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "eavit_tpu",
            "--train",
            "--config_path", CONF,
            "--num_env_per_process", "2",
            "--total_updates", "1",
            "--log_name", "cli_smoke",
            "--save_model_path", str(tmp_path / "ckpt"),
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "entering training loop" in out.stdout + out.stderr


def test_cli_config_options():
    out = subprocess.run(
        [sys.executable, "-m", "eavit_tpu", "--config_options"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0
    assert "TrainMethod" in out.stdout


def test_eval_episode_budget(tmp_path):
    """evaluate() plays exactly EvalEpisodes episodes (reference plays
    forever; eval_episodes=-1 reproduces that, a positive budget stops)."""
    from eavit_tpu.eval import evaluate

    cfg = demo_cfg(tmp_path, max_step_per_episode=12)
    # train 1 update and save a checkpoint to play back
    train(cfg, total_updates=1, log_dir=str(tmp_path / "logs"))
    ckpt = os.path.join(str(tmp_path / "ckpt"), cfg.log_name)
    cfg2 = cfg.replace(load_model=True, load_model_path=ckpt, eval_episodes=2)
    out = evaluate(cfg2, num_episodes=cfg2.eval_episodes)
    assert out["episodes"] == 2
    assert np.isfinite(out["mean_return"])
