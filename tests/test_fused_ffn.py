"""Tests for the fused FFN kernel (ops/fused_ffn) and its FeedForward wiring.

On CPU the public entry takes the documented XLA fallback (identical
semantics, host-PRNG dropout bits); the Pallas kernels themselves are
verified bit-exactly ON-CHIP by scripts/tpu_kernel_check.py (fused_ffn
cases: PRNG mask replay + forward + input AND parameter gradients,
covering the sequential-grid weight-gradient accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.models.vit import FeedForward
from eavit_tpu.ops.fused_ffn import fused_ffn, keep_threshold


def _params(dim=32, hid=64):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    return (
        jax.random.normal(ks[0], (dim,)) * 0.2 + 1.0,
        jax.random.normal(ks[1], (dim,)) * 0.1,
        jax.random.normal(ks[2], (dim, hid)) / np.sqrt(dim),
        jax.random.normal(ks[3], (hid,)) * 0.1,
        jax.random.normal(ks[4], (hid, dim)) / np.sqrt(hid),
        jax.random.normal(ks[5], (dim,)) * 0.1,
    )


def test_deterministic_matches_module_math():
    # rate=0 fallback == the standard FeedForward chain with the same params
    dim, hid = 32, 64
    g1, b1, w1, c1, w2, c2 = _params(dim, hid)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 11, dim))

    y = fused_ffn(x, g1, b1, w1, c1, w2, c2, rate=0.0)

    import flax.linen as nn

    u = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": g1, "bias": b1}}, x
    )
    ref = nn.gelu(u @ w1 + c1, approximate=False) @ w2 + c2
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_dropout_unbiased_and_deterministic():
    dim, hid = 32, 64
    params = _params(dim, hid)
    x = jax.random.normal(jax.random.PRNGKey(2), (64, dim))
    clean = np.asarray(fused_ffn(x, *params, rate=0.0), np.float64)

    rng = jax.random.PRNGKey(3)
    a = fused_ffn(x, *params, rng=rng, rate=0.25)
    b = fused_ffn(x, *params, rng=rng, rate=0.25)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    acc = np.zeros_like(clean)
    n = 96
    f = jax.jit(lambda r: fused_ffn(x, *params, rng=r, rate=0.25))
    for i in range(n):
        acc += np.asarray(f(jax.random.PRNGKey(100 + i)), np.float64)
    err = np.abs(acc / n - clean).mean() / max(1e-6, np.abs(clean).mean())
    assert err < 0.2


def test_grads_flow_all_params():
    dim, hid = 32, 64
    params = _params(dim, hid)
    x = jax.random.normal(jax.random.PRNGKey(4), (16, dim))
    rng = jax.random.PRNGKey(5)

    def loss(x, *params):
        return jnp.sum(fused_ffn(x, *params, rng=rng, rate=0.2) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(7)))(x, *params)
    for g in grads:
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_feedforward_param_tree_is_impl_independent():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 9, 32))
    trees = {}
    for impl in ("xla", "pallas"):
        m = FeedForward(dim=32, hidden_dim=64, dropout=0.1, ffn_impl=impl)
        v = m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, deterministic=False,
        )
        trees[impl] = jax.tree.map(lambda a: (a.shape, str(a.dtype)),
                                   v["params"])
    assert trees["xla"] == trees["pallas"]


def test_feedforward_pallas_impl_matches_xla_with_same_params():
    # identical params -> identical deterministic output across impls
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 32))
    m_x = FeedForward(dim=32, hidden_dim=64, dropout=0.1, ffn_impl="xla")
    v = m_x.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    y_x = m_x.apply(v, x, deterministic=True)
    m_p = FeedForward(dim=32, hidden_dim=64, dropout=0.1, ffn_impl="pallas")
    y_p = m_p.apply(v, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(y_x), np.asarray(y_p), rtol=2e-5, atol=2e-5
    )


def test_keep_threshold_edges():
    assert keep_threshold(0.0) == 1 << 24
    assert abs(keep_threshold(0.37) / (1 << 24) - 0.63) <= 2 ** -24


def test_backbone_builds_with_fused_ffn():
    from eavit_tpu.config import Config
    from eavit_tpu.models.policy import build_backbone

    cfg = Config(fused_ffn=True)
    m = build_backbone(cfg)
    assert m.ffn_impl == "pallas"
    cfg = Config()
    assert build_backbone(cfg).ffn_impl == "xla"
