"""Round-3 truth-in-labeling + multi-chip-default coverage:

- greedy act: argmax (discrete) / mean action (continuous) playback, added
  because the reference's eval SAMPLES from the softmax (eval.py:198-299)
  while calling itself greedy.
- flagship configs ship ``DataAxisSize = 0`` (= all local devices), so
  ``build_agent`` uses every chip on a multi-chip host without a launcher
  flag (the reference needs one torchrun rank per GPU, dist_utils.py:17-81).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod, ViTConfig, load_config
from eavit_tpu.models.policy import ActionSpaceType
from eavit_tpu.rl.agent import RNDAgent

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg(**kw) -> Config:
    base = dict(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        num_step=8,
        num_env_per_process=4,
        mini_batch=2,
        epoch=1,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    base.update(kw)
    return Config(**base)


def test_greedy_discrete_is_argmax_and_rng_invariant():
    cfg = tiny_cfg()
    agent = RNDAgent(cfg, 5)
    state = agent.init_state(jax.random.PRNGKey(0))
    obs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 4, 84, 84), np.uint8)
    )
    a1, _, _, logits = agent.act(
        state.params, obs, jax.random.PRNGKey(1),
        deterministic_model=True, greedy=True,
    )
    a2, _, _, _ = agent.act(
        state.params, obs, jax.random.PRNGKey(999),
        deterministic_model=True, greedy=True,
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(
        np.asarray(a1), np.argmax(np.asarray(logits), axis=-1)
    )


def test_greedy_continuous_is_mean_action():
    cfg = tiny_cfg()
    agent = RNDAgent(cfg, 2, action_space=ActionSpaceType.CONTINUOUS)
    state = agent.init_state(jax.random.PRNGKey(0))
    obs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 4, 84, 84), np.uint8)
    )
    a1, _, _, _ = agent.act(
        state.params, obs, jax.random.PRNGKey(1),
        deterministic_model=True, greedy=True,
    )
    a2, _, _, _ = agent.act(
        state.params, obs, jax.random.PRNGKey(2),
        deterministic_model=True, greedy=True,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=0, atol=0)
    # sampled actions with different keys DO differ (sanity: greedy is the
    # thing that removed the randomness, not a constant policy)
    s1, _, _, _ = agent.act(state.params, obs, jax.random.PRNGKey(1))
    s2, _, _, _ = agent.act(state.params, obs, jax.random.PRNGKey(2))
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 0


def test_flagship_confs_default_to_all_devices():
    confs = glob.glob(os.path.join(REPO, "configs", "*_flagship.conf"))
    assert confs, "no flagship configs found"
    for path in confs:
        cfg = load_config(path)
        assert cfg.data_axis_size == 0, (
            f"{os.path.basename(path)} sets DataAxisSize={cfg.data_axis_size}; "
            "flagships must ship 0 (= all local devices)"
        )


def test_build_agent_uses_all_devices_when_axis_size_zero():
    from eavit_tpu.parallel.dp import DataParallelAgent
    from eavit_tpu.train import build_agent

    n = len(jax.devices())
    assert n == 8, "suite runs on the virtual 8-device CPU mesh"
    cfg = tiny_cfg(
        data_axis_size=0, num_env_per_process=8,
        train_method=TrainMethod.ORIGINAL_RND,
    )
    agent = build_agent(cfg, 5)
    assert isinstance(agent, DataParallelAgent)
    assert agent.mesh.devices.size == n
