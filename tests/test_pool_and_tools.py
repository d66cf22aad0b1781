"""Vector pools, renderer, and the intrinsic-trace animation tool."""

import os
import pickle

import numpy as np
import pytest

from eavit_tpu.envs.pool import SyncVectorEnv, ThreadVectorEnv
from eavit_tpu.envs.synthetic import SyntheticAtariEnv


def make_env(seed):
    def thunk():
        class GymLike:
            """Adapter giving SyntheticAtariEnv a gym-style action_space."""

            def __init__(self):
                self.env = SyntheticAtariEnv(seed=seed, max_episode_steps=5)

                class Space:
                    n = self.env.action_space_n

                self.action_space = Space()

            def reset(self, **kw):
                return self.env.reset()

            def step(self, a):
                return self.env.step(int(a))

        return GymLike()

    return thunk


@pytest.mark.parametrize("pool_cls", [SyncVectorEnv, ThreadVectorEnv])
def test_pool_step_and_autoreset(pool_cls):
    pool = pool_cls([make_env(i) for i in range(3)])
    states = pool.reset()
    assert states.shape == (3, 4, 84, 84)
    ep_seen = 0
    for t in range(7):  # crosses the 5-step episode cap -> auto-reset
        states, rewards, dones, truns, infos = pool.step(np.ones(3, np.int64))
        assert states.shape == (3, 4, 84, 84)
        ep_seen += sum("episode" in i for i in infos)
    assert ep_seen >= 3  # every env finished at least one episode
    pool.close()


def test_thread_pool_matches_sync_pool():
    """Same seeds + same actions => identical frame streams from both pools."""
    a = SyncVectorEnv([make_env(i) for i in range(2)])
    b = ThreadVectorEnv([make_env(i) for i in range(2)])
    sa, sb = a.reset(), b.reset()
    np.testing.assert_array_equal(sa, sb)
    rng = np.random.default_rng(0)
    for _ in range(6):
        acts = rng.integers(0, 5, size=2)
        sa, ra, da, ta, _ = a.step(acts)
        sb, rb, db, tb, _ = b.step(acts)
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ra, rb)
    a.close()
    b.close()


def test_renderer_headless():
    import matplotlib

    matplotlib.use("Agg")
    from eavit_tpu.utils.renderer import ParallelizedEnvironmentRenderer

    r = ParallelizedEnvironmentRenderer(4)
    obs = np.random.default_rng(0).integers(0, 256, (4, 1, 84, 84), np.uint8)
    r.render(obs)
    r.render(obs // 2)
    r.close()


def test_make_animation_roundtrip(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from eavit_tpu.utils.renderer import make_animation

    trace = list(np.random.default_rng(1).random(50))
    p = tmp_path / "trace.pkl"
    with open(p, "wb") as f:
        pickle.dump(trace, f)
    anim = make_animation(str(p))
    assert anim is not None
