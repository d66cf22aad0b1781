"""Model shape/semantics tests: dual-token ViT, heads, RND, NoisyNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.config import Config, ViTImplementation
from eavit_tpu.models.policy import ActionSpaceType, ActorCritic
from eavit_tpu.models.rnd import (
    RNDPredictor,
    RNDTarget,
    intrinsic_reward,
    rnd_loss,
)
from eavit_tpu.models.vit import DualTokenViT, patchify


CFG = Config().replace(compute_dtype="float32")  # f32 on CPU tests


def small_cfg(**kw):
    cfg = CFG.replace(**kw) if kw else CFG
    return cfg.replace(
        vit=cfg.vit.__class__(
            use_explorative_attn=cfg.vit.use_explorative_attn,
            dim=64, patch_size=14, depth=2, heads=4, dim_head=16,
            mlp_dim=128, dropout=0.0, emb_dropout=0.0,
        ),
        use_pallas_attention=False,
    )


def test_patchify_matches_einops_order():
    # oracle: einops 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
    import einops

    x = np.random.default_rng(0).normal(size=(2, 3, 8, 8)).astype(np.float32)
    ours = np.asarray(patchify(jnp.asarray(x), 4))
    theirs = einops.rearrange(x, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=4, p2=4)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_dual_token_vit_shapes_and_divergence():
    cfg = small_cfg()
    vit = DualTokenViT(cfg=cfg.vit, image_size=84, channels=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).random((3, 4, 84, 84)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    x_explore, x_exploit = vit.apply(params, x)
    assert x_explore.shape == (3, 64) and x_exploit.shape == (3, 64)
    # the two streams must differ (different tokens), proving both run
    assert not np.allclose(np.asarray(x_explore), np.asarray(x_exploit))


def test_stacked_pass_equals_two_passes():
    """The 2B-stacked single encoder pass must equal running each token's
    sequence separately (the reference's two-pass semantics)."""
    cfg = small_cfg()
    vit = DualTokenViT(cfg=cfg.vit, image_size=84, channels=4, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(2).random((2, 4, 84, 84)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    xe, xx = vit.apply(params, x)

    # single-image batches: stacking over batch can't mix them
    xe0, xx0 = vit.apply(params, x[:1])
    xe1, xx1 = vit.apply(params, x[1:])
    np.testing.assert_allclose(np.asarray(xe), np.vstack([xe0, xe1]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xx), np.vstack([xx0, xx1]), rtol=2e-4, atol=2e-5)


def test_cls_vit():
    cfg = small_cfg()
    vit_cfg = cfg.vit.__class__(**{**cfg.vit.__dict__, "use_explorative_attn": False})
    vit = DualTokenViT(cfg=vit_cfg, image_size=84, channels=4, dtype=jnp.float32)
    x = jnp.ones((2, 4, 84, 84), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x)
    (out,) = vit.apply(params, x)
    assert out.shape == (2, 64)
    assert "cls_token" in params["params"]
    assert "exploration_token" not in params["params"]


def test_actor_critic_discrete():
    cfg = small_cfg()
    net = ActorCritic(cfg=cfg, output_size=18)
    x = jnp.asarray(np.random.default_rng(3).random((5, 4, 84, 84)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.policy.shape == (5, 18)
    assert out.value_ext.shape == (5, 1) and out.value_int.shape == (5, 1)
    assert out.std is None
    assert out.features.shape == (5, 64)
    # value heads are distinct streams under explorative attention
    assert not np.allclose(np.asarray(out.value_ext), np.asarray(out.value_int))


def test_actor_critic_continuous():
    cfg = small_cfg()
    net = ActorCritic(
        cfg=cfg, output_size=2, action_space=ActionSpaceType.CONTINUOUS
    )
    x = jnp.ones((3, 4, 84, 84), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.policy.shape == (3, 2)
    assert np.all(np.abs(np.asarray(out.policy)) <= 1.0)  # tanh mu
    np.testing.assert_allclose(np.asarray(out.std), np.exp(-0.5) * np.ones(2), rtol=1e-6)


def test_head_init_statistics():
    cfg = small_cfg()
    net = ActorCritic(cfg=cfg, output_size=6)
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 84, 84)))["params"]
    # orthogonal gains: critic 0.01, extra 0.1 (reference model.py:249-263)
    w_critic = np.asarray(params["critic_ext"]["kernel"])
    s = np.linalg.svd(w_critic, compute_uv=False)
    np.testing.assert_allclose(s[0], 0.01, rtol=1e-4)
    w_extra = np.asarray(params["extra_fc"]["kernel"])
    s = np.linalg.svd(w_extra, compute_uv=False)
    np.testing.assert_allclose(s, 0.1 * np.ones_like(s), rtol=1e-4)
    assert np.all(np.asarray(params["critic_ext"]["bias"]) == 0)


def test_noisy_net_paths():
    cfg = small_cfg(use_noisy_net=True)
    net = ActorCritic(cfg=cfg, output_size=4)
    x = jnp.ones((2, 4, 84, 84), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    det = net.apply(params, x, True)
    n1 = net.apply(params, x, False, rngs={"noise": jax.random.PRNGKey(1)})
    n2 = net.apply(params, x, False, rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(n1.policy), np.asarray(n2.policy))
    assert not np.allclose(np.asarray(det.policy), np.asarray(n1.policy))


@pytest.mark.parametrize("pixel", [True, False])
def test_rnd_shapes(pixel):
    pred = RNDPredictor(pixel_input=pixel)
    targ = RNDTarget(pixel_input=pixel)
    x = (
        jnp.ones((4, 1, 84, 84), jnp.float32)
        if pixel
        else jnp.ones((4, 64), jnp.float32)
    )
    p_params = pred.init(jax.random.PRNGKey(0), x)
    t_params = targ.init(jax.random.PRNGKey(1), x)
    pf = pred.apply(p_params, x)
    tf = targ.apply(t_params, x)
    assert pf.shape == (4, 512) and tf.shape == (4, 512)
    r = intrinsic_reward(tf, pf)
    assert r.shape == (4,)
    assert np.all(np.asarray(r) >= 0)


def test_rnd_conv_feature_size():
    # 84x84 -> conv stack -> 7x7x64 flatten (reference model.py:366)
    from eavit_tpu.models.rnd import ConvTrunk

    trunk = ConvTrunk()
    x = jnp.ones((2, 1, 84, 84), jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)
    out = trunk.apply(params, x)
    assert out.shape == (2, 7 * 7 * 64)


def test_rnd_loss_masking():
    tf = jnp.ones((8, 4))
    pf = jnp.zeros((8, 4))
    # proportion 1.0: all samples -> mean MSE = 1.0
    full = rnd_loss(tf, pf, jnp.linspace(0, 0.99, 8), 1.0)
    np.testing.assert_allclose(float(full), 1.0, rtol=1e-6)
    # proportion 0: no samples -> 0/max(0,1) = 0
    none = rnd_loss(tf, pf, jnp.linspace(0.01, 0.99, 8), 0.0)
    np.testing.assert_allclose(float(none), 0.0)


def test_hg_flavor_forward():
    cfg = CFG.replace(
        vit_implementation_type=ViTImplementation.HG,
        use_pallas_attention=False,
    )
    hg = cfg.vit_hg.__class__(
        use_explorative_attn=True, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, patch_size=14,
    )
    cfg = cfg.replace(vit_hg=hg)
    net = ActorCritic(cfg=cfg, output_size=5)
    x = jnp.ones((2, 4, 84, 84), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.policy.shape == (2, 5)
    assert out.value_ext.shape == (2, 1)
