"""Boundary-free fused attention kernel (ops/flash_qkv) parity tests.

CPU runs exercise the real kernel in Pallas interpreter mode for the
rate=0 path (including batch/sequence overhang masking — no HBM padding
exists in this kernel) and the XLA fallback for the dropout path; the
on-chip dropout-bit replay checks live in scripts/tpu_kernel_check.py.
Reference semantics: attention math of reference vit.py:39-73 over the
raw qkv projection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eavit_tpu.ops.flash_qkv import _xla_reference, flash_mha_qkv, set_impl, supports


@pytest.fixture(params=["unroll", "fori", "split"])
def impl(request):
    """Every in-kernel head-loop strategy must agree with the XLA
    reference (fori adds roll-based head extraction + scratch
    accumulation; split adds the static head pre-split into head-keyed
    scratch; see flash_qkv module doc)."""
    set_impl(request.param)
    yield request.param
    set_impl("unroll")


def _qkv(key, b, n, heads, dim_head, dtype=jnp.float32):
    return jax.random.normal(key, (b, n, 3 * heads * dim_head), dtype)


@pytest.mark.parametrize("num_special", [0, 2])
@pytest.mark.parametrize(
    "b,n,heads,dim_head",
    [
        (5, 37, 4, 16),   # batch AND sequence overhang the blocks
        (8, 128, 2, 32),  # exact fit
    ],
)
def test_forward_matches_xla(b, n, heads, dim_head, num_special, impl):
    qkv = _qkv(jax.random.PRNGKey(0), b, n, heads, dim_head)
    out = flash_mha_qkv(qkv, heads, dim_head, num_special=num_special)
    ref = _xla_reference(
        qkv, heads, dim_head, None, 0.0, dim_head**-0.5, num_special
    )
    assert out.shape == (b, n, heads * dim_head)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("num_special", [0, 2])
def test_grad_matches_xla(num_special, impl):
    heads, dim_head = 4, 16
    qkv = _qkv(jax.random.PRNGKey(1), 5, 37, heads, dim_head)
    cot = jax.random.normal(jax.random.PRNGKey(2), (5, 37, heads * dim_head))

    g = jax.grad(
        lambda x: jnp.sum(
            flash_mha_qkv(x, heads, dim_head, num_special=num_special) * cot
        )
    )(qkv)
    gr = jax.grad(
        lambda x: jnp.sum(
            _xla_reference(x, heads, dim_head, None, 0.0, dim_head**-0.5, num_special)
            * cot
        )
    )(qkv)
    # recompute-from-lse backward: same error family as ops/flash
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=5e-3, atol=5e-3)


def test_bfloat16_path(impl):
    heads, dim_head = 2, 32
    qkv32 = _qkv(jax.random.PRNGKey(3), 4, 50, heads, dim_head)
    out = flash_mha_qkv(qkv32.astype(jnp.bfloat16), heads, dim_head)
    ref = _xla_reference(qkv32, heads, dim_head, None, 0.0, dim_head**-0.5, 0)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.0, atol=0.04
    )


def test_dropout_fallback_unbiased_and_differentiable():
    # rate>0 on CPU routes to the XLA fallback (interpret mode has no
    # on-core PRNG): check E[out] ~= rate-0 output and grads flow under jit
    heads, dim_head = 2, 16
    qkv = _qkv(jax.random.PRNGKey(4), 3, 20, heads, dim_head)
    base = flash_mha_qkv(qkv, heads, dim_head)

    @jax.jit
    def run(key):
        return flash_mha_qkv(qkv, heads, dim_head, rng=key, rate=0.3)

    outs = jnp.stack([run(jax.random.PRNGKey(i)) for i in range(64)])
    # statistical check: 64-sample mean, tolerance ~4 sigma of the estimator
    np.testing.assert_allclose(
        np.asarray(outs.mean(0)), np.asarray(base), atol=0.3
    )
    g = jax.grad(
        lambda x: jnp.sum(
            flash_mha_qkv(x, heads, dim_head, rng=jax.random.PRNGKey(9), rate=0.3)
        )
    )(qkv)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_rate_without_rng_raises():
    qkv = _qkv(jax.random.PRNGKey(5), 2, 10, 2, 8)
    with pytest.raises(ValueError, match="rng"):
        flash_mha_qkv(qkv, 2, 8, rate=0.5)


def test_supports_gate():
    assert supports(197)
    assert not supports(4096)


def test_mha_module_parity_and_param_tree():
    """MultiHeadAttention(impl=pallas_qkv) == impl=xla on identical params,
    for both plain and dual-query fused modes."""
    from eavit_tpu.models.vit import MultiHeadAttention

    for num_special in (0, 2):
        mods = {
            impl: MultiHeadAttention(
                dim=48, heads=4, dim_head=12, dropout=0.1,
                attention_impl=impl, num_special=num_special,
            )
            for impl in ("xla", "pallas_qkv")
        }
        x = jax.random.normal(jax.random.PRNGKey(6), (3, 21, 48))
        params = {
            impl: m.init(jax.random.PRNGKey(7), x) for impl, m in mods.items()
        }
        # identical parameter trees -> checkpoints interchangeable
        assert jax.tree_util.tree_structure(params["xla"]) == (
            jax.tree_util.tree_structure(params["pallas_qkv"])
        )
        chex = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: jnp.allclose(a, b), params["xla"], params["pallas_qkv"]
            )
        )
        assert bool(chex)
        outs = {
            impl: m.apply(params["xla"], x, True) for impl, m in mods.items()
        }
        np.testing.assert_allclose(
            np.asarray(outs["xla"]), np.asarray(outs["pallas_qkv"]),
            rtol=2e-5, atol=2e-5,
        )


def test_vit_end_to_end_parity():
    """Full DualTokenViT forward: pallas_qkv == xla in the fused
    shared-patch-stream mode (the flagship path this kernel targets)."""
    from eavit_tpu.config import Config, TrainMethod

    from eavit_tpu.models.policy import build_backbone

    cfg = Config(
        train_method=TrainMethod.ORIGINAL_RND,
        compute_dtype="float32",
        shared_patch_stream=True,
    )
    img = jax.random.uniform(
        jax.random.PRNGKey(8),
        (2, cfg.state_stack_size, cfg.pre_proc_height, cfg.pre_proc_width),
    )
    outs = {}
    for impl in ("xla", "pallas_qkv"):
        m = build_backbone(cfg, attention_impl=impl)
        p = m.init(jax.random.PRNGKey(9), img)
        outs[impl] = m.apply(p, img, True)
    for a, b in zip(outs["xla"], outs["pallas_qkv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5
        )


def test_effective_impl_dtype_routing():
    """split's gb>1 advantage only exists for 2-byte dtypes: at itemsize>=4
    the gb that fits the scoped-vmem cap makes split unroll's blocking with
    a ~19-min Mosaic compile (results/split_smoke_r5c.out), so
    _effective_impl must route wide dtypes to the proven unroll kernels —
    and the PRNG replay must key off the same routing so the
    grid-cell->batch-rows mapping is identical across fwd/bwd/replay."""
    from eavit_tpu.ops.flash_qkv import _batch_block, _effective_impl

    set_impl("split")
    try:
        assert _effective_impl(2) == "split"
        assert _effective_impl(4) == "unroll"
        # measured budgets: split 512 KB -> gb=2 at flagship n_pad=256;
        # the f32 route inherits unroll's 256 KB -> gb=1
        assert _batch_block(256, itemsize=2) == 2
        assert _batch_block(256, itemsize=4) == 1
    finally:
        set_impl("unroll")
    # unroll and fori are itemsize-invariant
    for impl_name in ("unroll", "fori"):
        set_impl(impl_name)
        try:
            assert _effective_impl(2) == impl_name
            assert _effective_impl(4) == impl_name
        finally:
            set_impl("unroll")


def test_supports_loop_impl_extends_head_range():
    """supports() models the backward's recompute stack: unroll keeps all
    heads' score temporaries live, the loop impls one head's — so at a
    sequence length where 8 live heads overflow the 16 MB scoped-vmem cap,
    split (2-byte operands) must still fit while unroll must not."""
    set_impl("unroll")
    assert not supports(512, heads=8, itemsize=2)  # 5*8*1MB = 40 MB > cap
    set_impl("split")
    try:
        assert supports(512, heads=8, itemsize=2)  # 5*1*1MB = 5 MB
        # the f32 route falls back to unroll's all-heads-live model
        assert not supports(512, heads=8, itemsize=4)
    finally:
        set_impl("unroll")
