"""Encoder rematerialization knob (config.py encoder_remat).

nn.remat must preserve the parameter tree (checkpoints transfer) and the
update gradients must match the non-remat path exactly — remat changes
WHEN activations are (re)computed, never WHAT is computed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.config import Config, ViTConfig
from eavit_tpu.models.policy import ActorCritic


def _cfg(remat: str) -> Config:
    return Config(
        encoder_remat=remat,
        compute_dtype="float32",
        pre_proc_height=36,
        pre_proc_width=36,
        state_stack_size=4,
        vit=ViTConfig(dim=64, patch_size=6, depth=2, heads=4, dim_head=16,
                      mlp_dim=128, dropout=0.1, emb_dropout=0.1),
    )


@pytest.mark.parametrize("remat", ["full", "dots"])
def test_remat_param_tree_and_grads_match(remat):
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 4, 36, 36))

    def grads_for(mode):
        net = ActorCritic(_cfg(mode), output_size=5)
        params = net.init(
            {"params": rng, "dropout": rng, "noise": rng}, x, True
        )["params"]

        def loss(p):
            out = net.apply(
                {"params": p}, x, False,
                rngs={"dropout": jax.random.PRNGKey(7),
                      "noise": jax.random.PRNGKey(8)},
            )
            return (
                jnp.sum(out.policy ** 2)
                + jnp.sum(out.value_ext ** 2)
                + jnp.sum(out.value_int ** 2)
            )

        return params, jax.grad(loss)(params)

    p0, g0 = grads_for("none")
    p1, g1 = grads_for(remat)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
