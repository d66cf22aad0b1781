"""Golden parity vs torch: the PPO loss pieces computed with
torch.distributions on identical inputs must match our JAX math within
tolerance (the reference's formulas, agents.py:454-493, expressed through
torch's own primitives — not copied code)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from eavit_tpu.rl.ppo import (
    categorical_entropy,
    categorical_log_prob,
    normal_entropy,
    normal_log_prob,
    ppo_surrogate,
)


def test_categorical_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 18)).astype(np.float32)
    actions = rng.integers(0, 18, size=32)

    m = torch.distributions.Categorical(
        torch.softmax(torch.tensor(logits), dim=-1)
    )
    lp_t = m.log_prob(torch.tensor(actions)).numpy()
    ent_t = m.entropy().numpy()

    lp_j = np.asarray(categorical_log_prob(jnp.asarray(logits), jnp.asarray(actions)))
    ent_j = np.asarray(categorical_entropy(jnp.asarray(logits)))
    np.testing.assert_allclose(lp_j, lp_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ent_j, ent_t, rtol=1e-5, atol=1e-5)


def test_normal_matches_torch():
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(16, 3)).astype(np.float32)
    std = np.exp(rng.normal(size=3).astype(np.float32) * 0.3)
    actions = rng.normal(size=(16, 3)).astype(np.float32)

    m = torch.distributions.Normal(torch.tensor(mu), torch.tensor(std))
    lp_t = m.log_prob(torch.tensor(actions)).sum(-1).numpy()
    # reference entropy bonus is m.entropy().mean() (agents.py:462),
    # i.e. the per-sample entropy is the MEAN over action dims
    ent_t = m.entropy().mean(-1).numpy()

    lp_j = np.asarray(
        normal_log_prob(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(actions))
    )
    ent_j = np.asarray(normal_entropy(jnp.asarray(std), 16))
    np.testing.assert_allclose(lp_j, lp_t, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ent_j, ent_t, rtol=1e-5, atol=1e-5)


def test_full_ppo_loss_matches_torch():
    """Combined loss on identical inputs: torch implementation of the
    reference's exact formula vs our jitted pieces."""
    rng = np.random.default_rng(2)
    B, A = 64, 6
    logits = rng.normal(size=(B, A)).astype(np.float32)
    old_logits = logits + 0.1 * rng.normal(size=(B, A)).astype(np.float32)
    actions = rng.integers(0, A, size=B)
    adv = rng.normal(size=B).astype(np.float32)
    v_ext = rng.normal(size=(B, 1)).astype(np.float32)
    v_int = rng.normal(size=(B, 1)).astype(np.float32)
    tgt_ext = rng.normal(size=B).astype(np.float32)
    tgt_int = rng.normal(size=B).astype(np.float32)
    eps, ent_coef = 0.1, 0.001

    # --- torch (reference formula agents.py:454-493) ---
    tl = torch.tensor(logits)
    tol = torch.tensor(old_logits)
    ta = torch.tensor(actions)
    m = torch.distributions.Categorical(torch.softmax(tl, -1))
    m_old = torch.distributions.Categorical(torch.softmax(tol, -1))
    log_prob = m.log_prob(ta)
    log_prob_old = m_old.log_prob(ta)
    ratio = torch.exp(log_prob - log_prob_old)
    surr1 = ratio * torch.tensor(adv)
    surr2 = torch.clamp(ratio, 1 - eps, 1 + eps) * torch.tensor(adv)
    actor_loss = -torch.min(surr1, surr2).mean()
    critic_ext = torch.nn.functional.mse_loss(
        torch.tensor(v_ext).sum(1), torch.tensor(tgt_ext)
    )
    critic_int = torch.nn.functional.mse_loss(
        torch.tensor(v_int).sum(1), torch.tensor(tgt_int)
    )
    entropy = m.entropy().mean()
    loss_t = actor_loss + 0.5 * (critic_ext + critic_int) - ent_coef * entropy
    kl_t = (log_prob_old - log_prob).mean()
    clipfrac_t = ((ratio > 1 + eps) | (ratio < 1 - eps)).float().mean()

    # --- ours ---
    lp = categorical_log_prob(jnp.asarray(logits), jnp.asarray(actions))
    lp_old = categorical_log_prob(jnp.asarray(old_logits), jnp.asarray(actions))
    out = ppo_surrogate(
        lp, lp_old, jnp.asarray(adv), jnp.asarray(v_ext), jnp.asarray(tgt_ext),
        categorical_entropy(jnp.asarray(logits)), eps,
        jnp.asarray(v_int), jnp.asarray(tgt_int),
    )
    loss_j = (
        out.actor_loss
        + 0.5 * (out.critic_ext_loss + out.critic_int_loss)
        - ent_coef * out.entropy
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out.approx_kl), float(kl_t), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(out.clipfrac), float(clipfrac_t), rtol=1e-6)


def test_rnd_masked_loss_matches_torch():
    """Masked RND predictor loss (reference agents.py:331-338)."""
    from eavit_tpu.models.rnd import rnd_loss

    rng = np.random.default_rng(3)
    B, F = 32, 8
    pred = rng.normal(size=(B, F)).astype(np.float32)
    targ = rng.normal(size=(B, F)).astype(np.float32)
    mask_u = rng.random(B).astype(np.float32)
    prop = 0.25

    fm = torch.nn.MSELoss(reduction="none")
    per = fm(torch.tensor(pred), torch.tensor(targ)).mean(-1)
    mask = (torch.tensor(mask_u) < prop).float()
    loss_t = (per * mask).sum() / torch.max(mask.sum(), torch.tensor(1.0))

    loss_j = rnd_loss(jnp.asarray(targ), jnp.asarray(pred), jnp.asarray(mask_u), prop)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-7)
