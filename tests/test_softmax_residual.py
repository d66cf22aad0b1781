"""_softmax_cast (ops.attention): softmax with the VJP residual stored in
the value path's output dtype. In f32 it must be bit-equivalent to stock
jax.nn.softmax fwd AND bwd; in bf16 the gradient must match the stock f32
gradient to bf16 quantization order. The round-3 motivation is bandwidth
(BASELINE.md roofline: the f32 softmax residual was ~0.5 TB/update), so
correctness here is the whole ballgame."""

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.ops.attention import _softmax_cast, mha


def _stock(dots, dtype):
    return jax.nn.softmax(dots, axis=-1).astype(dtype)


def test_f32_exact_fwd_and_grad():
    dots = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 17, 17)) * 4.0
    out = _softmax_cast(dots, jnp.float32)
    ref = _stock(dots, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def loss_new(d):
        return jnp.sum(_softmax_cast(d, jnp.float32) ** 2)

    def loss_ref(d):
        return jnp.sum(_stock(d, jnp.float32) ** 2)

    g_new = np.asarray(jax.grad(loss_new)(dots), np.float64)
    g_ref = np.asarray(jax.grad(loss_ref)(dots), np.float64)
    # the two VJP formulations (s*(g - sum(g*s)) vs differentiating
    # exp(x - logsumexp)) are algebraically equal; each must sit in the
    # same f32-rounding band around the f64 oracle (measured: new 5.7e-7,
    # stock 6.2e-7)
    d64 = np.asarray(dots, np.float64)
    e = np.exp(d64 - d64.max(-1, keepdims=True))
    s = e / e.sum(-1, keepdims=True)
    g = 2 * s
    oracle = s * (g - (g * s).sum(-1, keepdims=True))
    err_new = np.abs(g_new - oracle).max()
    err_ref = np.abs(g_ref - oracle).max()
    assert err_new < max(2 * err_ref, 1e-6), (err_new, err_ref)


def test_bf16_grad_matches_to_quantization():
    dots = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 33, 33)) * 3.0

    def loss_new(d):
        return jnp.sum(_softmax_cast(d, jnp.bfloat16).astype(jnp.float32) ** 2)

    def loss_ref(d):
        return jnp.sum(_stock(d, jnp.float32) ** 2)

    g_new = np.asarray(jax.grad(loss_new)(dots), np.float64)
    g_ref = np.asarray(jax.grad(loss_ref)(dots), np.float64)
    # bf16 probability quantization: relative error ~2^-8 of the gradient
    # scale; rows sum to ~0 in both (softmax gradient property)
    denom = np.abs(g_ref).max()
    assert np.abs(g_new - g_ref).max() / denom < 0.05
    np.testing.assert_allclose(g_new.sum(-1), 0.0, atol=1e-2)


def test_mha_grads_still_match_stock_composition():
    """End-to-end: mha's q/k/v grads with the custom softmax vs a literal
    stock-softmax composition, f32 (exact path)."""
    k = jax.random.PRNGKey(2)
    q, kk, v = (jax.random.normal(jax.random.fold_in(k, i), (2, 2, 9, 8))
                for i in range(3))

    def loss_new(q, kk, v):
        return jnp.sum(mha(q, kk, v) ** 2)

    def loss_ref(q, kk, v):
        scale = q.shape[-1] ** -0.5
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, kk,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        return jnp.sum(jnp.einsum("bhnm,bhmd->bhnd", attn, v) ** 2)

    for gn, gr in zip(jax.grad(loss_new, (0, 1, 2))(q, kk, v),
                      jax.grad(loss_ref, (0, 1, 2))(q, kk, v)):
        np.testing.assert_allclose(
            np.asarray(gn), np.asarray(gr), rtol=1e-5, atol=1e-6
        )

def test_f32_residual_escape_hatch_bitexact_after_cache_clear():
    """ADVICE r3 escape hatch: with F32_RESIDUAL on, the bf16-output VJP
    must use the UN-quantized f32 probabilities — matching the stock
    composition's gradient to f32 rounding (the two VJP formulations are
    algebraically equal; see test_f32_exact_fwd_and_grad). The flag is
    trace-time-only, so the in-process toggle requires jax.clear_caches()
    (ops/attention docstring contract)."""
    from eavit_tpu.ops import attention

    dots = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 19, 19)) * 3.0

    def loss_new(d):
        return jnp.sum(_softmax_cast(d, jnp.bfloat16).astype(jnp.float32) ** 2)

    def loss_stock(d):
        s = jax.nn.softmax(d, axis=-1)
        return jnp.sum(s.astype(jnp.bfloat16).astype(jnp.float32) ** 2)

    g_bf16res = np.asarray(jax.grad(loss_new)(dots))
    old = attention.F32_RESIDUAL
    try:
        attention.F32_RESIDUAL = True
        jax.clear_caches()
        g_f32res = np.asarray(jax.grad(loss_new)(dots))
    finally:
        attention.F32_RESIDUAL = old
        jax.clear_caches()
    # upstream-of-softmax grads differ: stock saves f32 probs, our default
    # saves the bf16 cast. With the hatch ON we must match stock to f32
    # rounding (measured max diff 3.9e-7)...
    g_stock = np.asarray(jax.grad(loss_stock)(dots))
    f32_band = 1e-6
    assert np.abs(g_f32res - g_stock).max() < f32_band
    # ...and the hatch must move the gradient by MORE than that band vs the
    # bf16 residual (quantization error ~2^-8 relative >> f32 rounding).
    assert np.abs(g_f32res - g_bf16res).max() > f32_band
