"""Fused Pallas flash-attention for the dual-token ViT (TPU hot op).

Workload shape (flagship config): 197-token sequences (196 patches + 1
exploration/exploitation token), 8 heads of dim 32, batch = 2B stacked token
streams. Each grid cell processes a BLOCK of batch elements with ALL their
heads as one batched MXU contraction — scores, numerically-stable softmax,
and the PV matmul stay in VMEM with no [B, H, N, N] HBM materialization.
The batch block size is chosen so the fp32 score tensor fits a VMEM budget.

Both forward and backward are Pallas kernels wired through `jax.custom_vjp`
(backward recomputes the probability matrix from the saved logsumexp — the
standard flash-attention trade of FLOPs for HBM traffic).

Sequence padding: N is padded to a multiple of 128 lanes outside the kernel;
padded KEY columns are masked to -inf before the softmax (padded QUERY rows
produce garbage that is sliced away by the caller). Batch is padded to a
multiple of the batch block. All masks are compile-time iota comparisons —
no dynamic shapes anywhere.

On non-TPU backends (CPU tests) the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# fp32 score tensor budget per grid cell; the probability tensor of the same
# size coexists with it, plus q/k/v/o blocks — keep the pair under ~1/3 of
# the 16MB VMEM so the compiler has headroom for double-buffering.
_SCORE_VMEM_BUDGET = 2 * 1024 * 1024


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _batch_block(bh_heads: int, n_pad: int) -> int:
    """Batch elements per grid cell, sized to the VMEM score budget."""
    per_elem = bh_heads * n_pad * n_pad * 4  # fp32 scores for one batch elem
    return max(1, _SCORE_VMEM_BUDGET // per_elem)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n: int, num_special: int
):
    bb, h, n_pad, d = q_ref.shape
    # fold (BB, H) into ONE batch dim (Mosaic matmul supports a single one)
    q = q_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    k = k_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    v = v_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [BB*H, Np, Np]

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n, s, -jnp.inf)
    if num_special:
        # dual-query shared-KV mask (ops/attention.py): patch rows attend
        # only to patch cols; special row i attends to itself + patches
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        allowed = ((row >= num_special) & (col >= num_special)) | (
            (row < num_special) & ((col == row) | (col >= num_special))
        )
        s = jnp.where(allowed, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) / l
    o_ref[...] = o.reshape(bb, h, n_pad, d).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(l)).reshape(bb, h, n_pad, 1)


def _fwd(q, k, v, scale: float, num_special: int):
    b, h, n, d = q.shape
    n_pad = _pad_to(n, _LANE)
    bb = _batch_block(h, n_pad)
    b_pad = _pad_to(b, bb)
    pad = [(0, b_pad - b), (0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, num_special=num_special
    )
    block = pl.BlockSpec(
        (bb, h, n_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    lse_block = pl.BlockSpec(
        (bb, h, n_pad, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[block, block, block],
        out_specs=[block, lse_block],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b_pad, h, n_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp)
    return o[:b, :, :n], lse[:b, :, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, n: int, num_special: int,
):
    bb, h, n_pad, d = q_ref.shape
    q = q_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    k = k_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    v = v_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    o = o_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    do = do_ref[...].astype(jnp.float32).reshape(bb * h, n_pad, d)
    lse = lse_ref[...].reshape(bb * h, n_pad, 1)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [BB*H, Np, Np]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n, s, -jnp.inf)
    if num_special:
        allowed = ((row >= num_special) & (col >= num_special)) | (
            (row < num_special) & ((col == row) | (col >= num_special))
        )
        s = jnp.where(allowed, s, -jnp.inf)
    p = jnp.exp(s - lse)
    p = jnp.where((row < n) & (col < n), p, 0.0)

    dv = jax.lax.dot_general(  # P^T dO
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(  # dO V^T
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[...] = dq.reshape(bb, h, n_pad, d).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(bb, h, n_pad, d).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(bb, h, n_pad, d).astype(dv_ref.dtype)


def _bwd(scale: float, num_special: int, res, g):
    q, k, v, o, lse = res
    do = g
    b, h, n, d = q.shape
    n_pad = _pad_to(n, _LANE)
    bb = _batch_block(h, n_pad)
    b_pad = _pad_to(b, bb)
    pad = [(0, b_pad - b), (0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp, op, dop = (jnp.pad(t, pad) for t in (q, k, v, o, do))
    lsep = jnp.pad(lse, [(0, b_pad - b), (0, 0), (0, n_pad - n)])[..., None]

    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, num_special=num_special
    )
    block = pl.BlockSpec(
        (bb, h, n_pad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    lse_block = pl.BlockSpec(
        (bb, h, n_pad, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[block, block, block, block, lse_block, block],
        out_specs=[block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b_pad, h, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b_pad, h, n_pad, d), v.dtype),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, op, lsep, dop)
    return dq[:b, :, :n], dk[:b, :, :n], dv[:b, :, :n]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale: float, num_special: int):
    o, _ = _fwd(q, k, v, scale, num_special)
    return o


def _flash_fwd(q, k, v, scale: float, num_special: int):
    o, lse = _fwd(q, k, v, scale, num_special)
    return o, (q, k, v, o, lse)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    num_special: int = 0,
) -> jnp.ndarray:
    """Fused softmax(q k^T * scale) v with flash backward. [B, H, N, D].

    ``num_special > 0`` applies the dual-query shared-KV mask in-kernel
    (ops/attention.py module doc): one pass computes every special-token
    query against the shared patch K/V — the SURVEY §5 fused dual-query
    attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale), int(num_special)).astype(v.dtype)
