"""Fused dual-query shared-KV attention (SURVEY §5).

Three layers of evidence:

1. The masked single-sequence formulation equals running each token's
   virtual stream separately under the same patches-don't-read-the-token
   rule (the fusion is exact, per-token).
2. The Pallas kernel (interpreter mode on CPU) matches the XLA masked
   attention — forward and gradients.
3. The full ViT in shared_patch_stream mode trains end-to-end and its two
   output streams differ (both tokens contribute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.config import Config, TrainMethod, ViTConfig
from eavit_tpu.ops.attention import dual_query_allowed, mha


def _rand_qkv(key, b=2, h=3, n=9, d=8):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, n, d), jnp.float32) for k in ks)


def _masked_reference(q, k, v, num_special):
    """Straightforward masked softmax attention (oracle)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    allowed = dual_query_allowed(q.shape[2], k.shape[2], num_special)
    s = jnp.where(allowed, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def test_fused_equals_per_token_streams():
    """Row i (< S) of the fused output == token-0 row of a separate
    [token_i, patches] sequence where patches don't attend to the token;
    patch rows == patches-only self-attention."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    S = 2
    fused = _masked_reference(q, k, v, S)

    def stream(i):
        # virtual stream: [token_i, patches]; patches must not read token_i
        idx = jnp.asarray([i] + list(range(S, q.shape[2])))
        qs, ks, vs = (t[:, :, idx] for t in (q, k, v))
        return _masked_reference(qs, ks, vs, 1)

    s0, s1 = stream(0), stream(1)
    np.testing.assert_allclose(fused[:, :, 0], s0[:, :, 0], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fused[:, :, 1], s1[:, :, 0], rtol=1e-6, atol=1e-6)
    # patch rows identical in every stream (shared trunk)
    np.testing.assert_allclose(fused[:, :, 2:], s0[:, :, 1:], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fused[:, :, 2:], s1[:, :, 1:], rtol=1e-6, atol=1e-6)


def test_xla_mha_applies_dual_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    out = mha(q, k, v, impl="xla", num_special=2)
    ref = _masked_reference(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [9, 197])
def test_pallas_dual_mask_matches_xla(n):
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), b=2, h=2, n=n, d=16)
    out_p = mha(q, k, v, impl="pallas", num_special=2)  # interpret on CPU
    out_x = mha(q, k, v, impl="xla", num_special=2)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )


def test_pallas_dual_mask_gradients_match_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, h=2, n=9, d=8)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(jnp.square(mha(q, k, v, impl=f, num_special=2)))
        return inner

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
    # gradient structure: special-token K/V columns receive gradient only
    # from their own row (they are masked out of every patch row)
    assert np.all(np.isfinite(np.asarray(gp[0])))


def _tiny_cfg(**kw):
    base = dict(
        vit=ViTConfig(
            dim=32, patch_size=21, depth=2, heads=2, dim_head=16, mlp_dim=64,
            dropout=0.0, emb_dropout=0.0,
        ),
        num_step=8,
        num_env_per_process=4,
        mini_batch=2,
        epoch=1,
        obs_norm_step=1,
        compute_dtype="float32",
        use_pallas_attention=False,
        max_step_per_episode=24,
        shared_patch_stream=True,
    )
    base.update(kw)
    return Config(**base)


def test_vit_shared_stream_forward_and_params_match_exact_mode():
    """Shared mode uses the IDENTICAL parameter pytree as exact mode and
    produces two distinct, finite streams."""
    from eavit_tpu.models.policy import ActorCritic

    cfg_exact = _tiny_cfg(shared_patch_stream=False)
    cfg_fused = _tiny_cfg()
    net_e = ActorCritic(cfg=cfg_exact, output_size=5)
    net_f = ActorCritic(cfg=cfg_fused, output_size=5)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (3, 4, 84, 84))
    p_e = net_e.init(jax.random.PRNGKey(1), obs)
    p_f = net_f.init(jax.random.PRNGKey(1), obs)
    # identical parameter structure AND values: checkpoints transfer
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(a, b), p_e, p_f
        )
    )
    assert chex
    out = net_f.apply(p_f, obs)
    assert np.all(np.isfinite(np.asarray(out.policy)))
    assert np.all(np.isfinite(np.asarray(out.value_ext)))
    # the two streams must differ (exploration vs exploitation token)
    assert not np.allclose(
        np.asarray(out.value_ext), np.asarray(out.value_int)
    )


def test_shared_stream_trains_e2e():
    from eavit_tpu.envs.synthetic import SyntheticVectorEnv
    from eavit_tpu.rl.agent import RNDAgent
    from eavit_tpu.rl.rollout import RolloutCollector

    cfg = _tiny_cfg(train_method=TrainMethod.ORIGINAL_RND)
    env = SyntheticVectorEnv(
        cfg.num_env_per_process, seed=cfg.seed, max_episode_steps=24
    )
    agent = RNDAgent(cfg, env.action_space_n)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    state = agent.init_state(k)
    collector = RolloutCollector(cfg, agent, env)
    states = env.reset()
    rng, k = jax.random.split(rng)
    state, states = collector.warmup_obs_rms(state, states, k)
    for _ in range(2):
        rng, k1, k2 = jax.random.split(rng, 3)
        rollout, states = collector.collect(state.params, states, k1)
        state, metrics = agent.update(state, rollout, k2)
    for key, val in metrics.items():
        assert np.isfinite(float(val)), key
    env.close()


def test_xla_attention_prob_dropout():
    """Attention-probability dropout (reference vit.py:68): stochastic
    under different rngs, exact (scaled) identity at rate 0 / eval."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(5))
    base = mha(q, k, v, impl="xla")
    d1 = mha(q, k, v, impl="xla", dropout_rate=0.5,
             dropout_rng=jax.random.PRNGKey(1))
    d2 = mha(q, k, v, impl="xla", dropout_rate=0.5,
             dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(base))
    # expectation preserved: mean over many rngs approaches the base output
    outs = np.mean(
        [
            np.asarray(
                mha(q, k, v, impl="xla", dropout_rate=0.5,
                    dropout_rng=jax.random.PRNGKey(100 + i))
            )
            for i in range(500)
        ],
        axis=0,
    )
    np.testing.assert_allclose(outs, np.asarray(base), atol=0.2)
