"""Numerical parity of GAE / RunningMeanStd / RewardForwardFilter against
independent numpy oracles implementing the reference semantics
(reference utils.py:42-128)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eavit_tpu.ops.gae import make_train_data
from eavit_tpu.rl.normalizer import (
    reward_filter_init,
    reward_filter_scan,
    reward_filter_update,
    rms_init,
    rms_normalize,
    rms_update,
    rms_update_from_moments,
)


# --- numpy oracles (hand-derived from the reference's documented math) -----


def np_gae(reward, done, value, gamma, lam):
    N, T = reward.shape
    target = np.empty((N, T))
    gae = np.zeros(N)
    for t in range(T - 1, -1, -1):
        delta = reward[:, t] + gamma * value[:, t + 1] * (1 - done[:, t]) - value[:, t]
        gae = delta + gamma * lam * (1 - done[:, t]) * gae
        target[:, t] = gae + value[:, t]
    return target, target - value[:, :-1]


def np_returns(reward, done, value, gamma):
    N, T = reward.shape
    target = np.empty((N, T))
    running = value[:, -1].copy()
    for t in range(T - 1, -1, -1):
        running = reward[:, t] + gamma * running * (1 - done[:, t])
        target[:, t] = running
    return target, target - value[:, :-1]


class NpRMS:
    def __init__(self, shape=(), eps=1e-4):
        self.mean = np.zeros(shape)
        self.var = np.ones(shape)
        self.count = eps

    def update_from_moments(self, bm, bv, bc):
        delta = bm - self.mean
        tot = self.count + bc
        new_mean = self.mean + delta * bc / tot
        m2 = self.var * self.count + bv * bc + delta**2 * self.count * bc / tot
        self.mean, self.var, self.count = new_mean, m2 / tot, tot


def test_gae_matches_oracle():
    rng = np.random.default_rng(0)
    N, T = 5, 17
    reward = rng.normal(size=(N, T)).astype(np.float32)
    done = (rng.random((N, T)) < 0.15).astype(np.float32)
    value = rng.normal(size=(N, T + 1)).astype(np.float32)
    tgt, adv = make_train_data(reward, done, value, 0.999, 0.95, use_gae=True)
    tgt_np, adv_np = np_gae(reward, done, value, 0.999, 0.95)
    np.testing.assert_allclose(np.asarray(tgt), tgt_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)


def test_plain_returns_matches_oracle():
    rng = np.random.default_rng(1)
    N, T = 3, 9
    reward = rng.normal(size=(N, T)).astype(np.float32)
    done = (rng.random((N, T)) < 0.2).astype(np.float32)
    value = rng.normal(size=(N, T + 1)).astype(np.float32)
    tgt, adv = make_train_data(reward, done, value, 0.99, use_gae=False)
    tgt_np, adv_np = np_returns(reward, done, value, 0.99)
    np.testing.assert_allclose(np.asarray(tgt), tgt_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)


def test_gae_nonepisodic_intrinsic_is_done_free():
    # Intrinsic targets pass done=0 (reference train.py:756-763): a done flag
    # in the extrinsic stream must not affect a done=0 computation.
    rng = np.random.default_rng(2)
    N, T = 4, 8
    reward = rng.normal(size=(N, T)).astype(np.float32)
    value = rng.normal(size=(N, T + 1)).astype(np.float32)
    zeros = np.zeros((N, T), np.float32)
    tgt, _ = make_train_data(reward, zeros, value, 0.99, 0.95, use_gae=True)
    tgt_np, _ = np_gae(reward, zeros, value, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(tgt), tgt_np, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shape,xshape",
    [
        ((1, 8, 8), (32, 1, 8, 8)),  # original_RND pixel obs
        ((1, 16), (32, 16)),  # modified_RND embeddings (keepdims)
        ((), (40,)),  # reward_rms scalar
    ],
)
def test_rms_matches_oracle(shape, xshape):
    rng = np.random.default_rng(3)
    state = rms_init(shape)
    oracle = NpRMS(shape)
    for _ in range(5):
        x = rng.normal(loc=2.0, scale=3.0, size=xshape)
        state = rms_update(state, x)
        if len(xshape) == len(shape):  # keepdims case ([B, D] -> [1, D])
            bm = x.mean(axis=0, keepdims=True)
            bv = x.var(axis=0, keepdims=True)
        else:  # one extra batch axis ([B, *shape] -> [*shape])
            bm, bv = x.mean(axis=0), x.var(axis=0)
        oracle.update_from_moments(bm, bv, xshape[0])
    np.testing.assert_allclose(np.asarray(state.mean), oracle.mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.var), oracle.var, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(state.count), oracle.count, rtol=1e-5)


def test_rms_update_from_moments_scalar():
    # reward_rms path: update_from_moments(mean, std**2, count) with scalars
    # (reference train.py:739-740)
    state = rms_init(())
    oracle = NpRMS(())
    for m, v, c in [(1.0, 4.0, 16), (0.5, 2.0, 16), (-1.0, 1.0, 16)]:
        state = rms_update_from_moments(state, jnp.float32(m), jnp.float32(v), c)
        oracle.update_from_moments(m, v, c)
    np.testing.assert_allclose(float(state.mean), oracle.mean, rtol=1e-5)
    np.testing.assert_allclose(float(state.var), oracle.var, rtol=1e-5)


def test_rms_normalize_clips():
    state = rms_init((1, 4))
    state = rms_update(state, np.random.default_rng(4).normal(size=(64, 4)))
    out = rms_normalize(state, np.full((2, 4), 1e9, np.float32))
    assert np.all(np.asarray(out) == 5.0)


def test_reward_filter_matches_sequential():
    rng = np.random.default_rng(5)
    N, T, gamma = 6, 11, 0.99
    rews = rng.normal(size=(N, T)).astype(np.float32)

    # sequential (reference-style: one update per step column)
    state = reward_filter_init(N)
    seq_rows = []
    for t in range(T):
        state, row = reward_filter_update(state, rews[:, t], gamma)
        seq_rows.append(np.asarray(row))
    seq = np.stack(seq_rows)  # [T, N]

    # scan version used inside the jitted update
    state2 = reward_filter_init(N)
    state2, per_step = reward_filter_scan(state2, rews, gamma)
    np.testing.assert_allclose(np.asarray(per_step), seq, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.rewems), np.asarray(state.rewems), rtol=1e-6)

    # oracle recurrence
    rewems = np.zeros(N)
    for t in range(T):
        rewems = rewems * gamma + rews[:, t]
    np.testing.assert_allclose(np.asarray(state2.rewems), rewems, rtol=1e-5)


def test_rms_cross_device_pmean_sync():
    # With axis_name, all devices converge to identical pooled statistics.
    import functools
    from jax.sharding import Mesh, PartitionSpec as P
    shard_map = jax.shard_map

    devs = jax.devices()
    assert len(devs) == 8, f"conftest should give 8 cpu devices, got {len(devs)}"
    mesh = Mesh(np.array(devs), ("data",))
    x = np.random.default_rng(6).normal(loc=1.5, scale=2.0, size=(8 * 16, 4)).astype(np.float32)
    state = rms_init((1, 4))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=P(),
    )
    def upd(state, x_local):
        return rms_update(state, x_local, axis_name="data")

    out = upd(state, x)
    # pooled moments == global moments
    np.testing.assert_allclose(
        np.asarray(out.mean)[0], x.mean(axis=0), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.var)[0], x.var(axis=0), rtol=1e-3, atol=1e-3
    )
