"""PPO loss math (reference agents.py:454-493), action distributions, and
sampling — pure functions over arrays.

Combined objective per minibatch (reference agents.py:493)::

    loss = actor_loss + 0.5 * critic_loss - ent_coef * entropy
           + rnd_loss + representation_loss_coef * representation_loss

with ``actor_loss = -mean(min(ratio * adv, clip(ratio) * adv))``,
``critic_loss = MSE(v_ext, target_ext) + MSE(v_int, target_int)``, and
diagnostic ``approx_kl`` / ``max_kl`` / ``clipfrac`` (agents.py:485-489).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# --- discrete ---------------------------------------------------------------


def categorical_log_prob(logits: jnp.ndarray, actions: jnp.ndarray) -> jnp.ndarray:
    """log pi(a|s) from raw logits; [B, A], [B] -> [B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, actions[:, None].astype(jnp.int32), axis=-1)[:, 0]


def categorical_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def sample_categorical(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Sample actions; distributionally identical to the reference's
    inverse-CDF numpy trick (agents.py:205-208)."""
    return jax.random.categorical(key, logits, axis=-1)


# --- continuous (diagonal Normal over tanh-mu, reference agents.py:197-203) --


def normal_log_prob(
    mu: jnp.ndarray, std: jnp.ndarray, actions: jnp.ndarray
) -> jnp.ndarray:
    """Sum of per-dim Normal log-probs; [B, A], [A], [B, A] -> [B]."""
    var = jnp.square(std)
    logp = -0.5 * (jnp.square(actions - mu) / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(logp, axis=-1)


def normal_entropy(std: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Per-dim MEAN of Normal entropies: the reference's entropy bonus is
    ``m.entropy().mean()`` (agents.py:462), which averages over both the
    batch AND the action dims — summing dims would scale the bonus by A."""
    ent = jnp.mean(0.5 * jnp.log(2 * jnp.pi * jnp.e * jnp.square(std)))
    return jnp.full((batch,), ent)


def sample_normal(
    key: jax.Array, mu: jnp.ndarray, std: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a = mu + std * jax.random.normal(key, mu.shape)
    return a, normal_log_prob(mu, std, a)


# --- PPO surrogate -----------------------------------------------------------


class PPOLossOut(NamedTuple):
    actor_loss: jnp.ndarray
    critic_ext_loss: jnp.ndarray
    critic_int_loss: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    max_kl: jnp.ndarray
    clipfrac: jnp.ndarray


def ppo_surrogate(
    log_prob: jnp.ndarray,  # [B]
    log_prob_old: jnp.ndarray,  # [B]
    adv: jnp.ndarray,  # [B]
    value_ext: jnp.ndarray,  # [B, 1]
    target_ext: jnp.ndarray,  # [B]
    entropy: jnp.ndarray,  # [B]
    ppo_eps: float,
    value_int: Optional[jnp.ndarray] = None,  # [B, 1]
    target_int: Optional[jnp.ndarray] = None,  # [B]
) -> PPOLossOut:
    ratio = jnp.exp(log_prob - log_prob_old)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - ppo_eps, 1.0 + ppo_eps) * adv
    actor_loss = -jnp.mean(jnp.minimum(surr1, surr2))

    critic_ext_loss = jnp.mean(jnp.square(jnp.sum(value_ext, axis=1) - target_ext))
    if value_int is not None and target_int is not None:
        critic_int_loss = jnp.mean(
            jnp.square(jnp.sum(value_int, axis=1) - target_int)
        )
    else:
        critic_int_loss = jnp.zeros(())

    kl = log_prob_old - log_prob
    clipped = (ratio > 1.0 + ppo_eps) | (ratio < 1.0 - ppo_eps)
    return PPOLossOut(
        actor_loss=actor_loss,
        critic_ext_loss=critic_ext_loss,
        critic_int_loss=critic_int_loss,
        entropy=jnp.mean(entropy),
        approx_kl=jnp.mean(kl),
        max_kl=jnp.max(kl),
        clipfrac=jnp.mean(clipped.astype(jnp.float32)),
    )


def global_grad_norm(tree) -> jnp.ndarray:
    """sqrt(sum of squared elements) over a pytree (reference utils.py:141-170)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))
