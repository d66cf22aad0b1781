"""Fused flash attention with IN-KERNEL attention-probability dropout.

Training-path hot op. The reference applies dropout to the attention
probabilities (vit.py:68 ``self.dropout = nn.Dropout(dropout)`` applied to
``attn``); on the XLA path that costs three [B, H, N, N] HBM tensors per
layer per minibatch: the saved bf16 probabilities (softmax residual), the
u16 dropout mask (saved for the ``where`` VJP), and the post-dropout
probabilities (saved for the PV-matmul VJP) — ~1 GB of traffic per layer at
the flagship minibatch, on an update that is HBM-bandwidth-bound (86% of
the v5e roofline, BASELINE.md round 3).

This kernel keeps ALL of it in VMEM:

- forward: scores, softmax, dropout, and the PV matmul run in one grid
  cell; dropout bits come from the on-core PRNG
  (``pltpu.prng_random_bits``), so no mask is ever materialized to HBM.
  Only the output and the [B, H, N] logsumexp leave the chip registers.
- backward: recomputes the probabilities from the saved logsumexp (the
  standard flash trade) and REGENERATES the identical dropout bits by
  reseeding the PRNG with the same (seed, cell) tuple — possible because
  forward and backward share one row-blocking (``_SCORE_BUDGET``), so grid
  cell *i* covers the same fused rows with the same block shape in both
  passes.

Determinism contract: the mask depends only on (seed pair, grid cell index,
block shape). ``dropout_raw_bits`` replays the generator on an identical
grid and returns the raw threshold values so on-chip checks can verify the
fwd/bwd masks bit-exactly (scripts/tpu_kernel_check.py).

Dropout quantization: keep decisions threshold the top 24 of 32 PRNG bits
(keep probability quantized to 2^-24; the inverse scale uses the exact
quantized probability, so E[out] = softmax(s) v — unbiased).

Gradient math (dropout breaks the ``delta = sum(dO*O)`` flash trick):
``O = (D . sigma) V`` with ``D = keep/keep_p``, so
``dsigma = D . (dO V^T)`` and the softmax VJP needs
``rowsum = sum_j dsigma_ij sigma_ij`` computed directly — both matrices are
already live in VMEM, so this is a cheap fused reduction, and the O
residual is NOT saved at all.

On non-TPU backends the public entry falls back to the XLA path
(`ops/attention.mha` semantics) with host-PRNG dropout — same
distribution, different bits; the kernel itself is verified on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eavit_tpu.ops.kernel_prng import (
    inv_keep_scale,
    keep_mask_24 as _keep_mask,
    keep_threshold,
    pad_to as _pad_to,
    seeds_from_rng as _seeds_from_rng,
)

_LANE = 128
# One budget for BOTH passes: the backward must re-derive the identical
# (grid cell -> fused rows, block shape) mapping to regenerate the dropout
# bits, so forward cannot take a larger block than backward. Backward keeps
# ~5 N^2 fp32/u32 temporaries live (s, sigma, bits, dpd, ds).
_DEFAULT_SCORE_BUDGET = 1024 * 1024
_SCORE_BUDGET = _DEFAULT_SCORE_BUDGET


def set_budget(budget: int | None = None) -> None:
    """Override the per-cell score budget (bytes) for on-chip sweeps;
    ``None`` restores the tuned default."""
    global _SCORE_BUDGET
    _SCORE_BUDGET = _DEFAULT_SCORE_BUDGET if budget is None else budget


def _rows_block(n_pad: int, budget: int) -> int:
    per_row = n_pad * n_pad * 4
    return max(1, budget // per_row)


# Backward working-set cap. The backward keeps ~6 score-sized f32 VMEM
# temporaries (s, sigma, bits, pd, dpd, ds) of g*n_pad^2*4 B each.
# Measured on v5e (logs/attn_microbench_drop.out): n_pad=896 (ws ~19 MB)
# compiles and WINS 3.2x over XLA; n_pad=1792 (ws ~77 MB) dies with a
# JaxRuntimeError at compile. 40 MB keeps every measured-working shape
# inside and every measured-failing shape out, with margin for the
# [G,Np,D] i/o blocks.
_VMEM_CAP = 40 * 1024 * 1024


def supports(n: int) -> bool:
    """True when the backward's recompute working set fits VMEM.

    ``_rows_block`` clamps to >= 1 row-block, so one grid cell holds
    ``max(_SCORE_BUDGET, n_pad^2 * 4)`` bytes per score temporary; the
    public entry falls back to the XLA path (true dropout, host PRNG)
    for sequence lengths past the cap instead of crashing at compile.
    """
    n_pad = _pad_to(n, _LANE)
    per_temp = max(_SCORE_BUDGET, n_pad * n_pad * 4)
    return 6 * per_temp <= _VMEM_CAP


def _masked_scores(q, k, scale, n, num_special):
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Np, Np]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n, s, -jnp.inf)
    if num_special:
        # dual-query shared-KV mask (ops/attention.py module doc)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        allowed = ((row >= num_special) & (col >= num_special)) | (
            (row < num_special) & ((col == row) | (col >= num_special))
        )
        s = jnp.where(allowed, s, -jnp.inf)
    return s


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, scale: float, n: int, num_special: int, thresh: int, inv_keep: float,
):
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    s = _masked_scores(q, k, scale, n, num_special)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    sigma = p / l

    keep = _keep_mask(s.shape, thresh)
    pd = jnp.where(keep, sigma * inv_keep, 0.0)

    o = jax.lax.dot_general(
        pd, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)
    lse_ref[...] = m + jnp.log(l)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale: float, n: int, num_special: int, thresh: int, inv_keep: float,
):
    # Identical seeding + identical block shape -> identical keep mask.
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...]

    s = _masked_scores(q, k, scale, n, num_special)
    sigma = jnp.exp(s - lse)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    sigma = jnp.where((row < n) & (col < n), sigma, 0.0)

    keep = _keep_mask(s.shape, thresh)
    pd = jnp.where(keep, sigma * inv_keep, 0.0)

    dv = jax.lax.dot_general(  # Pd^T dO
        pd, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dpd = jax.lax.dot_general(  # dO V^T
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dsigma = jnp.where(keep, dpd * inv_keep, 0.0)
    rowsum = jnp.sum(dsigma * sigma, axis=-1, keepdims=True)
    ds = sigma * (dsigma - rowsum) * scale
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _grid_geom(b, h, n):
    bh = b * h
    n_pad = _pad_to(n, _LANE)
    g = _rows_block(n_pad, _SCORE_BUDGET)
    bh_pad = _pad_to(bh, g)
    return bh, n_pad, g, bh_pad


def _specs(g, n_pad, d):
    block = pl.BlockSpec(
        (g, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    lse_block = pl.BlockSpec(
        (g, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return block, lse_block, seed_spec


def _fwd(q, k, v, seeds, scale, num_special, rate):
    b, h, n, d = q.shape
    bh, n_pad, g, bh_pad = _grid_geom(b, h, n)
    pad = [(0, bh_pad - bh), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(t.reshape(bh, n, d), pad) for t in (q, k, v))

    thresh = keep_threshold(rate)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, num_special=num_special,
        thresh=thresh, inv_keep=inv_keep_scale(thresh),
    )
    block, lse_block, seed_spec = _specs(g, n_pad, d)
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh_pad // g,),
        in_specs=[seed_spec, block, block, block],
        out_specs=[block, lse_block],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, 1), jnp.float32),
        ],
    )(seeds, qp, kp, vp)
    return o[:bh, :n].reshape(b, h, n, d), lse


def _bwd(scale, num_special, rate, res, cot):
    q, k, v, lse, seeds = res
    do = cot
    b, h, n, d = q.shape
    bh, n_pad, g, bh_pad = _grid_geom(b, h, n)
    pad = [(0, bh_pad - bh), (0, n_pad - n), (0, 0)]
    qp, kp, vp, dop = (
        jnp.pad(t.reshape(bh, n, d), pad) for t in (q, k, v, do)
    )

    thresh = keep_threshold(rate)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, num_special=num_special,
        thresh=thresh, inv_keep=inv_keep_scale(thresh),
    )
    block, lse_block, seed_spec = _specs(g, n_pad, d)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh_pad // g,),
        in_specs=[seed_spec, block, block, block, lse_block, block],
        out_specs=[block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), v.dtype),
        ],
    )(seeds, qp, kp, vp, lse, dop)
    cut = lambda t: t[:bh, :n].reshape(b, h, n, d)
    return cut(dq), cut(dk), cut(dv), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_drop(q, k, v, seeds, scale: float, num_special: int, rate: float):
    o, _ = _fwd(q, k, v, seeds, scale, num_special, rate)
    return o


def _flash_drop_fwd(q, k, v, seeds, scale, num_special, rate):
    o, lse = _fwd(q, k, v, seeds, scale, num_special, rate)
    return o, (q, k, v, lse, seeds)


_flash_drop.defvjp(_flash_drop_fwd, _bwd)


def flash_attention_dropout(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    rng: jax.Array,
    rate: float,
    scale: float | None = None,
    num_special: int = 0,
) -> jnp.ndarray:
    """``dropout(softmax(q k^T * scale)) v`` fully fused in VMEM.

    TPU: one Pallas kernel per pass, dropout bits from the on-core PRNG,
    mask regenerated (never stored) in the backward. Non-TPU backends fall
    back to the XLA path with host-PRNG dropout (same distribution,
    different bits) so CPU tests exercise identical semantics.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if rate <= 0.0:
        from eavit_tpu.ops.flash import flash_attention

        return flash_attention(q, k, v, scale=scale, num_special=num_special)
    if jax.default_backend() != "tpu" or not supports(q.shape[2]):
        # non-TPU backends, and sequence lengths whose shared fwd/bwd
        # row-blocking would overflow scoped VMEM (see ``supports``), run
        # the XLA path with host-PRNG dropout — same distribution/scaling,
        # different bits
        from eavit_tpu.ops.attention import mha

        return mha(
            q, k, v, scale=scale, impl="xla", num_special=num_special,
            dropout_rate=rate, dropout_rng=rng,
        )
    seeds = _seeds_from_rng(rng)
    return _flash_drop(
        q, k, v, seeds, float(scale), int(num_special), float(rate)
    ).astype(v.dtype)


# ---------------------------------------------------------------------------
# on-chip verification support
# ---------------------------------------------------------------------------


def _bits_kernel(seed_ref, o_ref):
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    bits = pltpu.prng_random_bits(o_ref.shape)
    o_ref[...] = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    ).astype(jnp.int32)


def dropout_raw_bits(b: int, h: int, n: int, seeds: jax.Array) -> jnp.ndarray:
    """Replay the kernel's PRNG stream on an identical grid.

    Returns the raw 24-bit threshold values as int32 [B, H, N, N]; the keep
    mask the fwd/bwd kernels used is ``bits < keep_threshold(rate)``.
    Enables bit-exact on-chip verification of the fused kernels against an
    XLA reference using the SAME mask (scripts/tpu_kernel_check.py).
    """
    bh, n_pad, g, bh_pad = _grid_geom(b, h, n)
    spec = pl.BlockSpec(
        (g, n_pad, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bits = pl.pallas_call(
        _bits_kernel,
        grid=(bh_pad // g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh_pad, n_pad, n_pad), jnp.int32),
    )(seeds)
    return bits[:bh, :n, :n].reshape(b, h, n, n)
