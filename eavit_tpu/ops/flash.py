"""Fused Pallas flash-attention for the dual-token ViT (TPU hot op).

Workload shape (flagship config): 197-token sequences (196 patches + 1
exploration/exploitation token), 8 heads of dim 32, batch = 2B stacked token
streams. The whole softmax(QK^T)V for one (batch, head) fits comfortably in
VMEM, so the kernel is a single-block fusion per (b, h) grid cell: scores,
numerically-stable softmax, and the PV matmul never touch HBM — unlike the
XLA path, which materializes [B, H, N, N] probabilities to HBM between
fusions at larger batches.

Both forward and backward are Pallas kernels wired through `jax.custom_vjp`
(backward recomputes the probability matrix from the saved logsumexp — the
standard flash-attention trade of FLOPs for HBM traffic).

Sequence padding: N is padded to a multiple of 128 lanes outside the kernel;
padded KEY columns are masked to -inf before the softmax (padded QUERY rows
produce garbage that is sliced away by the caller). Masking uses a
compile-time iota comparison, so there is no dynamic shape anywhere.

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


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n: int):
    q = q_ref[0].astype(jnp.float32)  # [Np, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Np, Np]

    n_pad = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)  # [Np, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # [Np, 1]


def _fwd(q, k, v, scale: float):
    bh, n, d = q.shape
    n_pad = _pad_to(n, _LANE)
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))

    kernel = functools.partial(_fwd_kernel, scale=scale, n=n)
    block = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[block, block, block],
        out_specs=[
            block,
            pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp)
    return o[:, :n], lse[:, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, n: int,
):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [Np, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    n_pad = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n, s, -jnp.inf)
    p = jnp.exp(s - lse)  # rows beyond n have lse=0 -> garbage, masked below
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    p = jnp.where((row < n) & (col < n), p, 0.0)

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Np, D] = P^T dO
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Np, Np]
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # rowsum(dP * P) == dO.O
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale: float, res, g):
    q, k, v, o, lse = res
    do = g
    bh, n, d = q.shape
    n_pad = _pad_to(n, _LANE)
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp, op, dop = (jnp.pad(t, pad) for t in (q, k, v, o, do))
    lsep = jnp.pad(lse, [(0, 0), (0, n_pad - n)])[..., None]  # [BH, Np, 1]

    kernel = functools.partial(_bwd_kernel, scale=scale, n=n)
    block = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_block = pl.BlockSpec((1, n_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[block, block, block, block, lse_block, block],
        out_specs=[block, block, block],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, op, lsep, dop)
    return dq[:, :n], dk[:, :n], dv[:, :n]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash3(q, k, v, scale: float):
    o, _ = _fwd(q, k, v, scale)
    return o


def _flash3_fwd(q, k, v, scale: float):
    o, lse = _fwd(q, k, v, scale)
    return o, (q, k, v, o, lse)


_flash3.defvjp(_flash3_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
) -> jnp.ndarray:
    """Fused softmax(q k^T * scale) v with flash backward. [B, H, N, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape

    def fold(t):
        return t.reshape(b * h, n, d)

    out = _flash3(fold(q), fold(k), fold(v), float(scale))
    return out.reshape(b, h, n, d).astype(v.dtype)
