"""Generalized Advantage Estimation as a compiled `lax.scan`.

Semantics match the reference's host-side numpy loop
(reference utils.py:42-67, `make_train_data`):

- with GAE: ``delta_t = r_t + gamma * V_{t+1} * (1 - d_t) - V_t``,
  ``gae_t = delta_t + gamma * lambda * (1 - d_t) * gae_{t+1}``,
  ``target_t = gae_t + V_t``, ``adv = target - V[:, :-1]``
- without GAE: plain discounted returns bootstrapped from ``V_T``,
  ``target_t = r_t + gamma * (1 - d_t) * target_{t+1}`` (init ``V_T``).

Intrinsic returns are non-episodic: the caller passes ``done = 0``
(reference train.py:756-763).

The reference runs this per-update on host numpy; here it is a reverse
`lax.scan` inside the jitted update, so the rollout never leaves HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("use_gae",))
def make_train_data(
    reward: jnp.ndarray,  # [N, T]
    done: jnp.ndarray,  # [N, T] (0/1 or bool)
    value: jnp.ndarray,  # [N, T+1] (bootstrap in last column)
    gamma: float,
    gae_lambda: float = 0.95,
    use_gae: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(target, adv)``, each ``[N, T]``.

    The caller flattens to ``[N * T]`` (env-major) exactly like the
    reference's ``.reshape([-1])`` on ``[num_worker, num_step]`` arrays.
    """
    reward = reward.astype(jnp.float32)
    not_done = 1.0 - done.astype(jnp.float32)
    value = value.astype(jnp.float32)

    v_t = value[:, :-1]  # [N, T]
    v_tp1 = value[:, 1:]  # [N, T]

    if use_gae:
        delta = reward + gamma * v_tp1 * not_done - v_t  # [N, T]

        def step(gae, xs):
            d_t, nd_t = xs
            gae = d_t + gamma * gae_lambda * nd_t * gae
            return gae, gae

        # scan over time reversed; arrays are time-major inside the scan
        _, gae_rev = jax.lax.scan(
            step,
            jnp.zeros(reward.shape[0], jnp.float32),
            (delta.T, not_done.T),
            reverse=True,
        )
        gae = gae_rev.T  # [N, T]
        target = gae + v_t
    else:

        def step(running, xs):
            r_t, nd_t = xs
            running = r_t + gamma * running * nd_t
            return running, running

        _, tgt_rev = jax.lax.scan(
            step, value[:, -1], (reward.T, not_done.T), reverse=True
        )
        target = tgt_rev.T

    adv = target - v_t
    return target, adv
