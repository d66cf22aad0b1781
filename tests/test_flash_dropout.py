"""Tests for the fused in-kernel-dropout flash attention (ops/flash_dropout).

The Pallas kernels need the on-core TPU PRNG (``pltpu.prng_seed`` /
``prng_random_bits``), which the CPU interpreter cannot lower — so on CPU
these tests exercise the public entry's documented fallback path and the
pure-Python pieces (threshold quantization, seed derivation, dispatch
through `mha` and the ViT attention module). The kernels' numerics are
verified bit-exactly ON-CHIP by scripts/tpu_kernel_check.py (pallas_drop
cases: mask replay via `dropout_raw_bits` + full dq/dk/dv comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.ops import flash_dropout as fd
from eavit_tpu.ops.attention import mha


SHAPE = (3, 4, 37, 16)


def _qkv(dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, SHAPE, dtype) for k in ks)


def test_keep_threshold_quantization():
    assert fd.keep_threshold(0.0) == 1 << 24
    assert fd.keep_threshold(1.0) == 0
    t = fd.keep_threshold(0.1)
    # exact quantized keep probability within 2^-24 of the request
    assert abs(t / (1 << 24) - 0.9) <= 2 ** -24


def test_seeds_from_rng_shape_and_determinism():
    rng = jax.random.PRNGKey(7)
    s1 = fd._seeds_from_rng(rng)
    s2 = fd._seeds_from_rng(rng)
    assert s1.shape == (2,) and s1.dtype == jnp.int32
    assert (np.asarray(s1) == np.asarray(s2)).all()
    s3 = fd._seeds_from_rng(jax.random.PRNGKey(8))
    assert (np.asarray(s1) != np.asarray(s3)).any()


def test_rate_zero_delegates_to_plain_flash():
    q, k, v = _qkv()
    out = fd.flash_attention_dropout(q, k, v, jax.random.PRNGKey(1), 0.0)
    ref = mha(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cpu_fallback_matches_xla_dropout_path():
    # on non-TPU backends the entry delegates to mha's XLA dropout path —
    # identical bits given the same rng key
    q, k, v = _qkv()
    rng = jax.random.PRNGKey(2)
    out = fd.flash_attention_dropout(q, k, v, rng, 0.25)
    ref = mha(q, k, v, impl="xla", dropout_rate=0.25, dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mha_routes_pallas_dropout():
    q, k, v = _qkv()
    rng = jax.random.PRNGKey(3)
    out = mha(q, k, v, impl="pallas", dropout_rate=0.25, dropout_rng=rng)
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()
    # same key -> deterministic
    out2 = mha(q, k, v, impl="pallas", dropout_rate=0.25, dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_dropout_is_unbiased_in_expectation():
    q, k, v = _qkv()
    clean = np.asarray(mha(q, k, v, impl="xla"), np.float32)
    acc = np.zeros_like(clean)
    n_draws = 64
    f = jax.jit(
        lambda rng: fd.flash_attention_dropout(q, k, v, rng, 0.3)
    )
    for i in range(n_draws):
        acc += np.asarray(f(jax.random.PRNGKey(100 + i)), np.float32)
    err = np.abs(acc / n_draws - clean).max() / max(1e-6, np.abs(clean).max())
    assert err < 0.25  # 64-draw Monte-Carlo noise bound


def test_grads_flow_through_dropout_path():
    q, k, v = _qkv()
    rng = jax.random.PRNGKey(4)

    def loss(q, k, v):
        o = fd.flash_attention_dropout(q, k, v, rng, 0.2)
        return jnp.sum(o ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_vit_attention_uses_prob_dropout_for_pallas():
    # the ViT attention module routes pallas + dropout through mha's
    # probability-dropout path (no double output dropout)
    from eavit_tpu.models.vit import MultiHeadAttention

    m = MultiHeadAttention(
        dim=32, heads=4, dim_head=8, dropout=0.3, attention_impl="pallas"
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 37, 32))
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=False,
    )
    out_det = m.apply(params, x, deterministic=True)
    out_a = m.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(10)},
    )
    out_b = m.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(11)},
    )
    assert out_det.shape == out_a.shape == (2, 37, 32)
    # training-mode outputs vary with the dropout key; deterministic doesn't
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-6
    out_det2 = m.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs real TPU")
def test_onchip_mask_replay_matches():  # pragma: no cover - chip only
    from scripts.tpu_kernel_check import run_case_dropout

    err = run_case_dropout((4, 4, 130, 32), jnp.float32, 0, rate=0.1)
    assert err < 2e-4


def test_supports_and_budget_restore():
    """VMEM guard thresholds follow the MEASURED boundary
    (logs/attn_microbench_drop.out): n_pad=896 compiles and wins 3.2x;
    n_pad=1792 dies with a JaxRuntimeError -> XLA fallback instead.
    set_budget(None) restores the default."""
    assert fd.supports(197)    # flagship: 256-pad
    assert fd.supports(785)    # 896-pad, ~19 MB working set: measured WIN
    assert not fd.supports(1765)  # 1792-pad, ~77 MB: measured compile death
    assert not fd.supports(3137)
    fd.set_budget(4 * 1024 * 1024)  # raising the budget raises the floor
    assert fd._SCORE_BUDGET == 4 * 1024 * 1024
    fd.set_budget(None)
    assert fd._SCORE_BUDGET == fd._DEFAULT_SCORE_BUDGET


def test_rate_one_inv_keep_guard():
    """rate=1.0 -> thresh 0 -> inv_keep 0.0 (no ZeroDivisionError); all
    activations dropped."""
    from eavit_tpu.ops.kernel_prng import inv_keep_scale

    assert inv_keep_scale(0) == 0.0
    q = jnp.ones((1, 2, 8, 4), jnp.float32)
    out = fd.flash_attention_dropout(q, q, q, jax.random.PRNGKey(0), rate=1.0)
    assert np.allclose(np.asarray(out), 0.0)


def test_ffn_row_block_restore():
    from eavit_tpu.ops import fused_ffn as ff

    ff.set_row_block(256)
    assert ff._ROW_BLOCK == 256
    ff.set_row_block(None)
    assert ff._ROW_BLOCK == ff._DEFAULT_ROW_BLOCK
