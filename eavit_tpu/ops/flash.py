"""Fused Pallas flash-attention for the dual-token ViT (TPU hot op).

Workload shape (flagship config): 197-token sequences (196 patches + 1
exploration/exploitation token), 8 heads of dim 32, batch = 2B stacked token
streams. (batch, heads) are flattened into one row axis and each grid cell
processes a BLOCK of fused rows as one batched MXU contraction — scores,
numerically-stable softmax, and the PV matmul stay in VMEM with no
[B, H, N, N] HBM materialization. The row-block size is chosen so the fp32
score tensor fits a VMEM budget (backward gets a smaller budget: it keeps
twice as many N^2 temporaries live).

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
# fp32 score-tensor budget per grid cell. (batch, heads) are flattened into
# ONE row axis and blocked over it, so the grid can subdivide heads when a
# single batch element's scores would blow VMEM. The backward kernel keeps
# ~4 N^2-sized fp32 temporaries live (s, p, dp, ds) vs the forward's 2, so
# it gets half the score budget — measured on v5e: the old per-batch-element
# blocking OOMed scoped VMEM (18M > 16M limit) at the flagship f32 shape.
_FWD_SCORE_BUDGET = 2 * 1024 * 1024
_BWD_SCORE_BUDGET = 1024 * 1024


def set_budgets(fwd: int | None = None, bwd: int | None = None) -> None:
    """Override the per-cell score budgets (bytes) for on-chip sweeps."""
    global _FWD_SCORE_BUDGET, _BWD_SCORE_BUDGET
    if fwd is not None:
        _FWD_SCORE_BUDGET = fwd
    if bwd is not None:
        _BWD_SCORE_BUDGET = bwd


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rows_block(n_pad: int, budget: int) -> int:
    """(batch*head) rows per grid cell, sized to the VMEM score budget."""
    per_row = n_pad * n_pad * 4  # fp32 scores for one fused row
    return max(1, budget // per_row)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n: int, num_special: int
):
    # refs are [G, Np, D]: G fused (batch*head) rows per grid cell
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Np, Np]

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
    o_ref[...] = o.astype(o_ref.dtype)
    lse_ref[...] = m + jnp.log(l)


def _fwd(q, k, v, scale: float, num_special: int):
    b, h, n, d = q.shape
    bh = b * h
    n_pad = _pad_to(n, _LANE)
    g = _rows_block(n_pad, _FWD_SCORE_BUDGET)
    bh_pad = _pad_to(bh, g)
    pad = [(0, bh_pad - bh), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(t.reshape(bh, n, d), pad) for t in (q, k, v))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, num_special=num_special
    )
    block = pl.BlockSpec(
        (g, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    lse_block = pl.BlockSpec(
        (g, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh_pad // g,),
        in_specs=[block, block, block],
        out_specs=[block, lse_block],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp)
    return (
        o[:bh, :n].reshape(b, h, n, d),
        lse[:bh, :n, 0].reshape(b, h, n),
    )


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, n: int, num_special: int,
):
    # refs are [G, Np, D] / [G, Np, 1]: G fused (batch*head) rows per cell
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    o = o_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Np, Np]
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
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _bwd(scale: float, num_special: int, res, cot):
    q, k, v, o, lse = res
    do = cot
    b, h, n, d = q.shape
    bh = b * h
    n_pad = _pad_to(n, _LANE)
    g = _rows_block(n_pad, _BWD_SCORE_BUDGET)
    bh_pad = _pad_to(bh, g)
    pad = [(0, bh_pad - bh), (0, n_pad - n), (0, 0)]
    qp, kp, vp, op, dop = (
        jnp.pad(t.reshape(bh, n, d), pad) for t in (q, k, v, o, do)
    )
    lsep = jnp.pad(
        lse.reshape(bh, n), [(0, bh_pad - bh), (0, n_pad - n)]
    )[..., None]

    kernel = functools.partial(
        _bwd_kernel, scale=scale, n=n, num_special=num_special
    )
    block = pl.BlockSpec(
        (g, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    lse_block = pl.BlockSpec(
        (g, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh_pad // g,),
        in_specs=[block, block, block, block, lse_block, block],
        out_specs=[block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh_pad, n_pad, d), v.dtype),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, op, lsep, dop)
    cut = lambda t: t[:bh, :n].reshape(b, h, n, d)
    return cut(dq), cut(dk), cut(dv)


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
