"""Streaming (KV-blocked online-softmax) flash kernel parity vs XLA.

Interpreter mode on CPU: forward and full gradients, with and without the
dual-query shared-KV mask, at sizes spanning one block, exact multiples,
and ragged (padded) sequence lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.ops.attention import mha


def _qkv(key, b=1, h=2, n=197, d=16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, h, n, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("n", [64, 128, 197, 256, 300])
def test_stream_forward_matches_xla(n):
    q, k, v = _qkv(jax.random.PRNGKey(0), n=n)
    out_s = mha(q, k, v, impl="pallas_stream")
    out_x = mha(q, k, v, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("n", [130, 197])
def test_stream_forward_dual_mask(n):
    q, k, v = _qkv(jax.random.PRNGKey(1), n=n)
    out_s = mha(q, k, v, impl="pallas_stream", num_special=2)
    out_x = mha(q, k, v, impl="xla", num_special=2)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("num_special", [0, 2])
def test_stream_gradients_match_xla(num_special):
    q, k, v = _qkv(jax.random.PRNGKey(2), b=1, h=1, n=150, d=8)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(
                jnp.square(mha(q, k, v, impl=f, num_special=num_special))
            )
        return inner

    gs = jax.grad(loss("pallas_stream"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("q k v".split(), gs, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_stream_matches_batchblocked_kernel():
    """Both Pallas kernels agree with each other (and XLA) bit-closely."""
    q, k, v = _qkv(jax.random.PRNGKey(3), n=197)
    out_s = mha(q, k, v, impl="pallas_stream")
    out_b = mha(q, k, v, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_b), rtol=2e-4, atol=2e-4
    )
