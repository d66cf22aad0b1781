"""Pallas flash-attention vs XLA reference: forward and gradient parity.

Runs in Pallas interpreter mode on CPU; the same kernels compile on TPU
(exercised by bench.py and the driver's compile check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.ops.attention import mha
from eavit_tpu.ops.flash import flash_attention


def make_qkv(b=2, h=3, n=197, d=32, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, n, d)
    return tuple(
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )


@pytest.mark.parametrize("n", [197, 128, 50])
def test_forward_matches_xla(n):
    q, k, v = make_qkv(n=n)
    out_flash = flash_attention(q, k, v)
    out_xla = mha(q, k, v, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_xla():
    q, k, v = make_qkv(b=1, h=2, n=65, d=32, seed=1)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(mha(q, k, v, impl="xla")))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_scale_argument():
    q, k, v = make_qkv(b=1, h=1, n=16, d=32)
    out1 = flash_attention(q, k, v, scale=0.5)
    out2 = mha(q, k, v, scale=0.5, impl="xla")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=2e-5, atol=2e-5)


def test_vit_with_pallas_attention_forward_and_grad():
    """The dual-token ViT end-to-end with impl='pallas' must match impl='xla'."""
    from eavit_tpu.config import ViTConfig
    from eavit_tpu.models.vit import DualTokenViT

    cfg = ViTConfig(
        dim=64, patch_size=12, depth=2, heads=4, dim_head=16, mlp_dim=128,
        dropout=0.0, emb_dropout=0.0,
    )
    x = jnp.asarray(np.random.default_rng(2).random((2, 4, 84, 84)), jnp.float32)
    vit_x = DualTokenViT(cfg=cfg, image_size=84, channels=4, attention_impl="xla", dtype=jnp.float32)
    vit_p = DualTokenViT(cfg=cfg, image_size=84, channels=4, attention_impl="pallas", dtype=jnp.float32)
    params = vit_x.init(jax.random.PRNGKey(0), x)

    ex, xx = vit_x.apply(params, x)
    ep, xp = vit_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(ep), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(xx), np.asarray(xp), rtol=2e-4, atol=2e-4)

    def loss(params, module):
        a, b_ = module.apply(params, x)
        return jnp.mean(jnp.square(a)) + jnp.mean(jnp.square(b_))

    gx = jax.grad(loss)(params, vit_x)
    gp = jax.grad(loss)(params, vit_p)
    for a, b_ in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=1e-4
        )
