"""Fused pre-norm transformer FFN Pallas kernel (TPU training hot op).

Computes ``drop2(fc2(drop1(gelu(fc1(LN(x))))))`` — the lucidrains
FeedForward (reference vit.py:24-37, models/vit.py FeedForward) — in ONE
kernel per pass, blocked over the flattened (batch x token) row axis.

Why: the PPO/RND update is HBM-bandwidth-bound (BASELINE.md round-3
roofline: 86% of v5e's 819 GB/s). On the XLA path the FFN's 1024-wide
intermediate is materialized between the two matmuls in the forward AND
saved (pre-GELU h, post-dropout hd) for the backward — several hundred MB
per layer per flagship minibatch. Here every intermediate lives in VMEM:

- forward reads x and the weights, writes only y (plus nothing else);
- backward reads x, dy and the weights, RECOMPUTES LN/h/GELU/dropout in
  VMEM (flash-style FLOPs-for-bytes trade), and writes dx plus the
  parameter gradients;
- dropout masks come from the on-core PRNG (`pltpu.prng_seed` keyed by
  (seed, grid cell)) and are REGENERATED in the backward — never stored.
  Draw order per cell is fixed (mask1 then mask2), so forward and
  backward see identical bits provided both passes share one row-blocking
  (enforced: single `_ROW_BLOCK`).

Parameter gradients: TPU Pallas grid cells execute SEQUENTIALLY on a
core, so dW/db/dgamma/dbeta are accumulated in-place across cells into
constant-index output blocks (initialized at cell 0).

Weights are passed through constant-index BlockSpecs; Mosaic's block
revisiting skips the re-fetch when the block index is unchanged between
grid iterations, so W1/W2 stream into VMEM once, not once per cell.

Round-5 revisions (mirroring ops/flash_qkv):

- **Native-dtype MXU operands**: the four dot-generals consume operands
  in the INPUT dtype with f32 accumulation via ``preferred_element_type``
  (weights are cast to the input dtype first, exactly what the non-fused
  ``nn.Dense(dtype=bf16)`` path does) — bf16 configs run the MXU at its
  bf16 rate; LN/GELU/dropout math stays f32.
- **rate==0 draws no PRNG bits at all** (``thresh=None``): the act/eval
  forward skips both mask draws, and the dropout-free kernel runs in
  interpreter mode on non-TPU backends so CPU tests exercise the REAL
  kernels (incl. the backward's sequential-grid parameter-gradient
  accumulation), not just the fallback.

Non-TPU backends with ``rate > 0`` fall back to an XLA implementation of
identical semantics (host-PRNG dropout16 masks — same distribution,
different bits); the dropout kernels are verified on-chip by
scripts/tpu_kernel_check.py (fused_ffn cases: mask replay + full
input/parameter gradient check).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of the flattened (batch*token) axis per grid cell; ONE constant for
# fwd+bwd so the dropout PRNG streams line up (see module doc). The
# backward keeps ~8 [R,1024] + ~6 [R,256] f32 temporaries plus both
# weight blocks (4 MB) live: R=128 lands ~9 MB, safely inside the 16 MB
# scoped-VMEM limit (R=256 measured too close; sweep via set_row_block).
_DEFAULT_ROW_BLOCK = 128
_ROW_BLOCK = _DEFAULT_ROW_BLOCK

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def set_row_block(r: int | None = None) -> None:
    """Override the row block (rows/cell) for on-chip sweeps; ``None``
    restores the tuned default."""
    global _ROW_BLOCK
    _ROW_BLOCK = _DEFAULT_ROW_BLOCK if r is None else r


# dropout PRNG/quantization contract shared with ops/flash_dropout
from eavit_tpu.ops.kernel_prng import (  # noqa: E402
    inv_keep_scale,
    keep_mask_24 as _keep,
    keep_threshold,
    pad_to as _pad_to,
    seeds_from_rng as _seeds_from_rng,
)


def _layernorm(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |error| <= 1.5e-7.

    Mosaic has no erf lowering (NotImplementedError on TPU kernels); this
    polynomial uses only mul/add/exp, runs on the VPU, and its absolute
    error is ~100x below the f32 kernel-check tolerance. Used on the XLA
    fallback path too so every impl computes the same formula.
    """
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0.0, -e, e)


def _gelu_exact(h):
    return 0.5 * h * (1.0 + _erf(h * _INV_SQRT2))


def _gelu_grad(h):
    phi = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(h * _INV_SQRT2))
    return cdf + h * phi


def _recompute_fwd(x, g1, b1, w1, c1, w2, c2, dt, *, eps, thresh, inv_keep):
    """Shared fwd chain. LN/GELU/dropout math is f32 in VMEM, but the MXU
    dot operands are ``dt`` (the input dtype, round-5 native-dtype change
    mirroring ops/flash_qkv: bf16 inputs run the MXU at its bf16 rate with
    f32 accumulation via preferred_element_type — semantics-matched to the
    non-fused nn.Dense(dtype=bf16) path, which casts params the same way).
    Returns every intermediate the backward needs (``u``/``gd`` already in
    ``dt`` — they are dot operands there too). Draws TWO PRNG masks in a
    fixed order."""
    u, xhat, rstd = _layernorm(x, g1, b1, eps)
    u = u.astype(dt)
    h = jax.lax.dot_general(
        u, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + c1
    g = _gelu_exact(h)
    if thresh is None:  # rate==0: no PRNG draws at all (flash_qkv contract)
        m1 = m2 = None
        gd = g.astype(dt)
        y = jax.lax.dot_general(
            gd, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + c2
        return y, (u, xhat, rstd, h, m1, gd, m2)
    m1 = _keep(g.shape, thresh)
    gd = jnp.where(m1, g * inv_keep, 0.0).astype(dt)
    y0 = jax.lax.dot_general(
        gd, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + c2
    m2 = _keep(y0.shape, thresh)
    y = jnp.where(m2, y0 * inv_keep, 0.0)
    return y, (u, xhat, rstd, h, m1, gd, m2)


def _fwd_kernel(
    seed_ref, x_ref, g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref,
    y_ref, *, eps: float, thresh: int, inv_keep: float,
):
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    if thresh is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    dt = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    y, _ = _recompute_fwd(
        x,
        g1_ref[...].astype(jnp.float32), b1_ref[...].astype(jnp.float32),
        w1_ref[...].astype(dt), c1_ref[...].astype(jnp.float32),
        w2_ref[...].astype(dt), c2_ref[...].astype(jnp.float32),
        dt, eps=eps, thresh=thresh, inv_keep=inv_keep,
    )
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(
    seed_ref, x_ref, g1_ref, b1_ref, w1_ref, c1_ref, w2_ref, c2_ref, dy_ref,
    dx_ref, dg1_ref, db1_ref, dw1_ref, dc1_ref, dw2_ref, dc2_ref,
    *, eps: float, thresh: int, inv_keep: float,
):
    # identical seeding + identical block shape -> identical masks
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    if thresh is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    dt = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    g1 = g1_ref[...].astype(jnp.float32)
    w1 = w1_ref[...].astype(dt)
    w2 = w2_ref[...].astype(dt)
    dy = dy_ref[...].astype(jnp.float32)

    _, (u, xhat, rstd, h, m1, gd, m2) = _recompute_fwd(
        x, g1, b1_ref[...].astype(jnp.float32),
        w1, c1_ref[...].astype(jnp.float32),
        w2, c2_ref[...].astype(jnp.float32),
        dt, eps=eps, thresh=thresh, inv_keep=inv_keep,
    )

    # dropout/GELU/LN math stays f32; MXU operands are dt (module doc)
    dy0 = dy if m2 is None else jnp.where(m2, dy * inv_keep, 0.0)
    dy0d = dy0.astype(dt)
    dw2 = jax.lax.dot_general(  # gd^T dy0
        gd, dy0d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dc2 = jnp.sum(dy0, axis=0, keepdims=True)
    dgd = jax.lax.dot_general(  # dy0 W2^T
        dy0d, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dg = dgd if m1 is None else jnp.where(m1, dgd * inv_keep, 0.0)
    dh = _gelu_grad(h) * dg
    dhd = dh.astype(dt)
    dw1 = jax.lax.dot_general(  # u^T dh
        u, dhd, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dc1 = jnp.sum(dh, axis=0, keepdims=True)
    du = jax.lax.dot_general(  # dh W1^T
        dhd, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # LayerNorm backward (row-wise over the feature axis)
    dgamma = jnp.sum(du * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(du, axis=0, keepdims=True)
    t = du * g1
    dx = (
        t
        - jnp.mean(t, axis=-1, keepdims=True)
        - xhat * jnp.mean(t * xhat, axis=-1, keepdims=True)
    ) * rstd

    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg1_ref[...] = jnp.zeros_like(dg1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dc1_ref[...] = jnp.zeros_like(dc1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dc2_ref[...] = jnp.zeros_like(dc2_ref)

    # grid cells run sequentially on a TPU core: accumulate in place
    dg1_ref[...] += dgamma.astype(dg1_ref.dtype)
    db1_ref[...] += dbeta.astype(db1_ref.dtype)
    dw1_ref[...] += dw1.astype(dw1_ref.dtype)
    dc1_ref[...] += dc1.astype(dc1_ref.dtype)
    dw2_ref[...] += dw2.astype(dw2_ref.dtype)
    dc2_ref[...] += dc2.astype(dc2_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _geom(rows: int) -> Tuple[int, int]:
    r = _ROW_BLOCK
    return r, _pad_to(rows, r)


def _const_spec(shape):
    # 1-D parameters are passed as [1, n] so every VMEM block is 2-D
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda i: (0,) * nd), memory_space=pltpu.VMEM
    )


def _r2(v):
    return v.reshape(1, -1)


def _fwd(x2, params, seeds, eps, rate):
    g1, b1, w1, c1, w2, c2 = params
    rows, dim = x2.shape
    hid = w1.shape[1]
    r, rows_pad = _geom(rows)
    xp = jnp.pad(x2, [(0, rows_pad - rows), (0, 0)])

    thresh = keep_threshold(rate) if rate > 0.0 else None
    kernel = functools.partial(
        _fwd_kernel, eps=eps, thresh=thresh,
        inv_keep=inv_keep_scale(thresh) if thresh is not None else 1.0,
    )
    row_spec = pl.BlockSpec((r, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(rows_pad // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            _const_spec((1, dim)), _const_spec((1, dim)),
            _const_spec((dim, hid)), _const_spec((1, hid)),
            _const_spec((hid, dim)), _const_spec((1, dim)),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, dim), x2.dtype),
        interpret=_interpret(),
    )(seeds, xp, _r2(g1), _r2(b1), w1, _r2(c1), w2, _r2(c2))
    return y[:rows]


def _bwd(eps, rate, res, dy2):
    x2, params, seeds = res
    g1, b1, w1, c1, w2, c2 = params
    rows, dim = x2.shape
    hid = w1.shape[1]
    r, rows_pad = _geom(rows)
    xp = jnp.pad(x2, [(0, rows_pad - rows), (0, 0)])
    dyp = jnp.pad(dy2, [(0, rows_pad - rows), (0, 0)])

    thresh = keep_threshold(rate) if rate > 0.0 else None
    kernel = functools.partial(
        _bwd_kernel, eps=eps, thresh=thresh,
        inv_keep=inv_keep_scale(thresh) if thresh is not None else 1.0,
    )
    row_spec = pl.BlockSpec((r, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dg1, db1, dw1, dc1, dw2, dc2 = pl.pallas_call(
        kernel,
        grid=(rows_pad // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec,
            _const_spec((1, dim)), _const_spec((1, dim)),
            _const_spec((dim, hid)), _const_spec((1, hid)),
            _const_spec((hid, dim)), _const_spec((1, dim)),
            row_spec,
        ],
        out_specs=[
            row_spec,
            _const_spec((1, dim)), _const_spec((1, dim)),
            _const_spec((dim, hid)), _const_spec((1, hid)),
            _const_spec((hid, dim)), _const_spec((1, dim)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, dim), x2.dtype),
            jax.ShapeDtypeStruct((1, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
            jax.ShapeDtypeStruct((dim, hid), f32),
            jax.ShapeDtypeStruct((1, hid), f32),
            jax.ShapeDtypeStruct((hid, dim), f32),
            jax.ShapeDtypeStruct((1, dim), f32),
        ],
        interpret=_interpret(),
    )(seeds, xp, _r2(g1), _r2(b1), w1, _r2(c1), w2, _r2(c2), dyp)
    cast = lambda g, p: g.reshape(p.shape).astype(p.dtype)
    return (
        dx[:rows],
        (cast(dg1, g1), cast(db1, b1), cast(dw1, w1),
         cast(dc1, c1), cast(dw2, w2), cast(dc2, c2)),
        None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ffn(x2, params, seeds, eps: float, rate: float):
    return _fwd(x2, params, seeds, eps, rate)


def _ffn_fwd(x2, params, seeds, eps, rate):
    return _fwd(x2, params, seeds, eps, rate), (x2, params, seeds)


_ffn.defvjp(_ffn_fwd, _bwd)


def _xla_reference(x, params, rng, eps, rate):
    """Identical semantics on the XLA path (non-TPU fallback; also the
    oracle for the on-chip check, which substitutes replayed masks)."""
    from eavit_tpu.ops.attention import dropout16

    g1, b1, w1, c1, w2, c2 = (p.astype(jnp.float32) for p in params)
    xf = x.astype(jnp.float32)
    u, _, _ = _layernorm(xf, g1, b1, eps)
    h = u @ w1 + c1
    g = _gelu_exact(h)
    if rate > 0.0:
        k1, k2 = jax.random.split(rng)
        g = dropout16(k1, g, rate)
    y = g @ w2 + c2
    if rate > 0.0:
        y = dropout16(k2, y, rate)
    return y.astype(x.dtype)


def fused_ffn(
    x: jnp.ndarray,  # [..., dim]
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,  # [dim, hidden]
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [hidden, dim]
    b2: jnp.ndarray,
    rng: jax.Array | None = None,
    rate: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """``drop(fc2(drop(gelu(fc1(LN(x))))))`` fused in VMEM; see module doc.

    ``rng`` may be None when ``rate == 0`` (deterministic eval path).
    """
    if rate > 0.0 and rng is None:
        # checked before the backend dispatch so CPU/GPU fail with the
        # same error instead of jax.random.split(None) deep in the
        # reference path (ADVICE r3)
        raise ValueError("dropout rate > 0 requires an rng")
    lead = x.shape[:-1]
    dim = x.shape[-1]
    x2 = x.reshape(-1, dim)
    params = (ln_scale, ln_bias, w1, b1, w2, b2)
    if rate > 0.0 and jax.default_backend() != "tpu":
        # interpreter mode has no on-core PRNG; the rate==0 path runs the
        # real kernel in interpreter mode on CPU (flash_qkv contract)
        y = _xla_reference(x2, params, rng, eps, rate)
        return y.reshape(*lead, dim)
    if rate > 0.0:
        seeds = _seeds_from_rng(rng)
    else:
        seeds = jnp.zeros((2,), jnp.int32)
    return _ffn(x2, params, seeds, float(eps), float(rate)).reshape(
        *lead, dim
    )


# ---------------------------------------------------------------------------
# on-chip verification support
# ---------------------------------------------------------------------------


def _masks_kernel(seed_ref, m1_ref, m2_ref):
    # Mosaic accepts at most TWO seed words: fold the grid cell into
    # word 0 (int32 wraparound is deterministic in both passes)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
    # EXACT draw order of the compute kernels: mask1 (hidden) then mask2
    def raw(shape):
        bits = pltpu.prng_random_bits(shape)
        return jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
        ).astype(jnp.int32)

    m1_ref[...] = raw(m1_ref.shape)
    m2_ref[...] = raw(m2_ref.shape)


def dropout_raw_bits(
    rows: int, dim: int, hidden: int, seeds: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replay the kernel PRNG streams on an identical grid: raw 24-bit
    values for (mask1 [rows, hidden], mask2 [rows, dim]); the kernels'
    keep masks are ``bits < keep_threshold(rate)``."""
    r, rows_pad = _geom(rows)
    m1, m2 = pl.pallas_call(
        _masks_kernel,
        grid=(rows_pad // r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((r, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, hidden), jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, dim), jnp.int32),
        ],
    )(seeds)
    return m1[:rows], m2[:rows]
