"""On-device env + whole-rollout-in-one-scan tests."""

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.envs.device_env import (
    device_env_reset,
    device_env_step,
    make_device_env,
)
from eavit_tpu.envs.synthetic import SyntheticAtariEnv
from eavit_tpu.rl.agent import RNDAgent
from eavit_tpu.rl.scan_rollout import ScanRolloutCollector


def test_device_env_matches_host_env():
    """Same actions => identical frames/rewards as the host synthetic env
    (sticky off)."""
    params, state = make_device_env(
        2, seed=42, grid=8, max_episode_steps=6
    )
    hosts = [
        SyntheticAtariEnv(seed=42 + i, max_episode_steps=6, sticky_action=False)
        for i in range(2)
    ]
    host_states = np.stack([h.reset()[0] for h in hosts])
    np.testing.assert_array_equal(np.asarray(state.stack), host_states)

    rng = np.random.default_rng(0)
    step = jax.jit(lambda s, a: device_env_step(params, s, a))
    for t in range(14):  # crosses the 6-step truncation -> reset paths
        actions = rng.integers(0, 5, size=2)
        state, reward, done, trunc = step(state, jnp.asarray(actions))
        hs, hr = [], []
        for h, a in zip(hosts, actions):
            s, r, d, tr, _ = h.step(int(a))
            if d or tr:
                s, _ = h.reset()
            hs.append(s)
            hr.append(r)
        np.testing.assert_array_equal(
            np.asarray(state.stack), np.stack(hs), err_msg=f"step {t}"
        )
        np.testing.assert_allclose(np.asarray(reward), np.asarray(hr, np.float32))


def tiny_cfg(**kw) -> Config:
    base = dict(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=1, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        train_method=TrainMethod.ORIGINAL_RND,
        num_step=8,
        num_env_per_process=4,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        max_step_per_episode=8,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    base.update(kw)
    return Config(**base)


def test_scan_rollout_trains():
    cfg = tiny_cfg()
    env_params, env_state = make_device_env(4, seed=1, max_episode_steps=6)
    agent = RNDAgent(cfg, 5)
    state = agent.init_state(jax.random.PRNGKey(0))
    collector = ScanRolloutCollector(cfg, agent, env_params)

    for u in range(2):
        rollout, env_state, env_metrics = collector.collect(
            state.params, env_state, jax.random.PRNGKey(10 + u)
        )
        assert rollout.states.shape == (8, 4, 4, 84, 84)
        state, metrics = agent.update(state, rollout, jax.random.PRNGKey(20 + u))
        assert np.isfinite(float(metrics["train/loss"]))
    assert float(env_metrics["data/num_episodes"]) > 0
    assert int(state.global_update) == 2


def test_sharded_scan_rollout_dp():
    """Zero-host pipeline over the 8-device mesh: shard_mapped scan rollout
    feeds the DP update; per-shard episode metrics pool correctly."""
    import jax
    import numpy as np

    from eavit_tpu.envs.device_env import make_device_env
    from eavit_tpu.parallel.dp import DataParallelAgent, make_mesh
    from eavit_tpu.rl.scan_rollout import ScanRolloutCollector

    cfg = tiny_cfg().replace(num_env_per_process=8, data_axis_size=8)
    mesh = make_mesh(8)
    env_params, env_state = make_device_env(
        cfg.num_env_per_process,
        seed=cfg.seed,
        grid=cfg.synthetic_grid,
        max_episode_steps=8,
    )
    dp = DataParallelAgent(cfg, 5, mesh)
    state = dp.init_state(jax.random.PRNGKey(0))
    col = ScanRolloutCollector(cfg, dp, env_params, mesh=mesh)
    env_state = col.shard_env_state(env_state)

    ro, env_state, metrics = col.collect(
        state.params, env_state, jax.random.PRNGKey(1)
    )
    assert ro.states.shape[1] == 8
    # metrics replicated across the mesh (psum/pmean applied)
    assert np.isfinite(float(metrics["data/mean_undiscounted_episode_return"]))
    # every env truncates at 8 steps within the rollout => episodes counted
    # across ALL shards (psum), not just shard 0
    assert float(metrics["data/num_episodes"]) == 8.0

    state, m = dp.update(state, ro, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["train/loss"]))


def test_device_env_train_entry_dp():
    """train() drives the sharded zero-host path when DataAxisSize>1."""
    from eavit_tpu.config import EnvType
    from eavit_tpu.train import train

    cfg = tiny_cfg().replace(
        num_env_per_process=8,
        data_axis_size=8,
        env_type=EnvType.SYNTHETIC_DEVICE,
        log_name="devdp",
    )
    metrics = train(cfg, total_updates=2)
    assert metrics and all(
        __import__("numpy").isfinite(v) for v in metrics.values()
    )


def test_shared_world_and_texture_config_threading(tmp_path):
    """SyntheticMaze/SyntheticTexture/SyntheticSharedWorld reach the device
    env from a .conf file through the train entry."""
    from eavit_tpu.config import load_config

    conf = tmp_path / "m.conf"
    conf.write_text(
        "[DEFAULT]\nEnvType = synthetic_device\nSyntheticMaze = True\n"
        "SyntheticTexture = noise\nSyntheticSharedWorld = True\n"
        "SyntheticGrid = 4\nSyntheticVariants = 3\n"
    )
    cfg = load_config(str(conf))
    assert cfg.synthetic_maze and cfg.synthetic_shared_world
    assert cfg.synthetic_texture == "noise"
    assert cfg.synthetic_variants == 3

    from eavit_tpu.envs.device_env import make_device_env

    p, _ = make_device_env(
        3, seed=cfg.seed, grid=cfg.synthetic_grid,
        maze=cfg.synthetic_maze, texture=cfg.synthetic_texture,
        shared_world=cfg.synthetic_shared_world,
        variants=cfg.synthetic_variants,
    )
    f = np.asarray(p.frames)
    w = np.asarray(p.walls)
    # shared world is DEDUPLICATED: one world entry serves every env
    assert f.shape[0] == 1 and w.shape[0] == 1
    assert f.shape[3] == 3  # variant dim
    # maze mode: at least one wall blocked somewhere
    assert w.any()


def test_variants_cycle_with_steps():
    """variants=V shows room variant steps %% V; V=1 is the bit-exact
    single-frame world (continual-novelty regime, envs/device_env.py)."""
    params, state = make_device_env(
        1, seed=3, grid=4, max_episode_steps=50, variants=3, texture="noise"
    )
    step = jax.jit(lambda s, a: device_env_step(params, s, a))
    frames = []
    for _ in range(4):
        state, _, _, _ = step(state, jnp.asarray([0]))  # noop: same room
        frames.append(np.asarray(state.stack[0, -1]))
    # steps 1,2,0,1 (mod 3): frame cycles with period 3 in one room
    assert not (frames[0] == frames[1]).all()
    assert (frames[0] == frames[3]).all()
    assert not (frames[1] == frames[2]).all()


def test_ever_visited_survives_resets():
    """Cumulative discovery: ever_visited accumulates across episode resets
    while the per-episode visited set clears (exploration A/B headline
    metric, scripts/maze_ab.py)."""
    params, state = make_device_env(2, seed=1, grid=4, max_episode_steps=3)
    step = jax.jit(lambda s, a: device_env_step(params, s, a))
    # walk right twice (rooms (0,1), (0,2)), then hit the 3-step truncation
    for a in (4, 4, 0):
        state, _, _, trunc = step(state, jnp.asarray([a, a]))
    assert bool(trunc[0])
    # per-episode set reset to just the start room; cumulative keeps 3 rooms
    assert int(jnp.sum(state.visited[0])) == 1
    assert int(jnp.sum(state.ever_visited[0])) == 3
    # next episode adds a NEW room (down) to the cumulative set
    state, _, _, _ = step(state, jnp.asarray([2, 2]))
    assert int(jnp.sum(state.ever_visited[0])) == 4
    assert int(jnp.sum(state.visited[0])) == 2
