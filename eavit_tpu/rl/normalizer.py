"""Running normalization statistics as functional pytree state.

The reference mutates pickled Python objects on host
(`RunningMeanStd`, reference utils.py:70-115; `RewardForwardFilter`,
utils.py:118-128) and — a documented bug we fix — never synchronizes them
across DDP ranks (SURVEY.md §5). Here both are immutable NamedTuple pytrees
updated inside jitted functions; cross-device agreement comes from computing
batch moments with `psum` over the data mesh axis, so every replica holds
identical statistics by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class RMSState(NamedTuple):
    """Welford parallel-moments running mean/var (reference utils.py:70-115)."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # f64-ish scalar (f32 here; epsilon-initialized)


def rms_init(shape: Sequence[int] = (), epsilon: float = 1e-4) -> RMSState:
    return RMSState(
        mean=jnp.zeros(shape, jnp.float32),
        var=jnp.ones(shape, jnp.float32),
        count=jnp.asarray(epsilon, jnp.float32),
    )


def rms_update_from_moments(
    state: RMSState,
    batch_mean: jnp.ndarray,
    batch_var: jnp.ndarray,
    batch_count: jnp.ndarray,
) -> RMSState:
    """Chan et al. parallel-moments merge (reference utils.py:102-115)."""
    batch_count = jnp.asarray(batch_count, jnp.float32)
    delta = batch_mean - state.mean
    tot_count = state.count + batch_count

    new_mean = state.mean + delta * batch_count / tot_count
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + jnp.square(delta) * state.count * batch_count / tot_count
    return RMSState(mean=new_mean, var=m2 / tot_count, count=tot_count)


def rms_update(
    state: RMSState,
    x: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> RMSState:
    """Fold a batch (moments over axis 0) into the running statistics.

    Matches reference `RunningMeanStd.update` (utils.py:84-100): pixel
    observations reduce [B, 1, H, W] -> [1, H, W]; embeddings reduce with
    keepdims to [1, D]; scalar reward stats reduce to (). The state's own
    shape decides — the batch moments are reduced until they broadcast to it.

    With ``axis_name`` the batch moments are computed across all devices on
    that mesh axis (exact pooled moments via psum of sum / sumsq / count),
    fixing the reference's per-rank statistic drift.
    """
    x = x.astype(jnp.float32)
    if x.ndim == state.mean.ndim + 1:
        # one extra leading batch axis: [B, *shape] -> [*shape]
        # (original_RND pixel obs [B,1,H,W] -> [1,H,W]; reward scalars [B] -> ())
        batch_sum = jnp.sum(x, axis=0)
        batch_sumsq = jnp.sum(jnp.square(x), axis=0)
    elif x.ndim == state.mean.ndim and state.mean.shape[:1] == (1,):
        # keepdims-style reduction: [B, D] -> [1, D] (modified_RND embeddings)
        batch_sum = jnp.sum(x, axis=0, keepdims=True)
        batch_sumsq = jnp.sum(jnp.square(x), axis=0, keepdims=True)
    else:
        raise ValueError(
            f"cannot reduce batch of shape {x.shape} into RMS of shape "
            f"{state.mean.shape}"
        )
    batch_count = jnp.asarray(x.shape[0], jnp.float32)

    if axis_name is not None:
        batch_sum = jax.lax.psum(batch_sum, axis_name)
        batch_sumsq = jax.lax.psum(batch_sumsq, axis_name)
        batch_count = jax.lax.psum(batch_count, axis_name)

    batch_mean = batch_sum / batch_count
    batch_var = batch_sumsq / batch_count - jnp.square(batch_mean)
    return rms_update_from_moments(state, batch_mean, batch_var, batch_count)


def rms_normalize(
    state: RMSState, x: jnp.ndarray, clip: float = 5.0
) -> jnp.ndarray:
    """``((x - mean) / sqrt(var)).clip(-clip, clip)`` (reference train.py:665)."""
    return jnp.clip(
        (x.astype(jnp.float32) - state.mean) / jnp.sqrt(state.var), -clip, clip
    )


class RewardFilterState(NamedTuple):
    """Discounted running intrinsic-return estimator
    (reference utils.py:118-128). ``rewems`` starts at zeros, which is
    exactly equivalent to the reference's lazy-None init since the first
    update computes ``0 * gamma + rews = rews``."""

    rewems: jnp.ndarray  # [N]


def reward_filter_init(num_env: int) -> RewardFilterState:
    return RewardFilterState(rewems=jnp.zeros(num_env, jnp.float32))


def reward_filter_update(
    state: RewardFilterState, rews: jnp.ndarray, gamma: float
) -> Tuple[RewardFilterState, jnp.ndarray]:
    rewems = state.rewems * gamma + rews.astype(jnp.float32)
    return RewardFilterState(rewems=rewems), rewems


def reward_filter_scan(
    state: RewardFilterState, int_reward: jnp.ndarray, gamma: float
) -> Tuple[RewardFilterState, jnp.ndarray]:
    """Apply the filter over a whole rollout ``[N, T]`` in one scan.

    Returns the new state and the per-step filtered returns ``[T, N]``
    (the reference stacks exactly these rows, train.py:736-738).
    """

    def step(rewems, r_t):
        rewems = rewems * gamma + r_t
        return rewems, rewems

    rewems, per_step = jax.lax.scan(step, state.rewems, int_reward.T.astype(jnp.float32))
    return RewardFilterState(rewems=rewems), per_step
