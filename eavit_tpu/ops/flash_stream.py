"""Streaming flash attention: KV-blocked online-softmax Pallas kernels.

The batch-blocked kernel in `ops/flash.py` holds a full [N, N] score tile in
VMEM — right-sized for the flagship 197-token sequences but not a scalable
flash design. This module is the scalable variant: scores never exceed a
[BLOCK_Q, BLOCK_K] tile, K/V are streamed block-by-block with the standard
online-softmax recurrence (running max ``m``, normalizer ``l``, accumulator
``acc``), so sequence length is bounded by HBM, not VMEM.

Grid layout (TPU grids execute the LAST axis sequentially, which makes
cross-step VMEM scratch accumulation legal):

- forward:   (BH, nQ, nK) — for each query block, stream the key blocks.
- backward dq: same layout, accumulating dq across key blocks.
- backward dk/dv: (BH, nK, nQ) — for each key block, stream query blocks.

The backward uses the saved logsumexp and the precomputed row dot
``delta = sum(dO * O)`` (computed in XLA outside the kernel), following the
standard flash-attention-2 recomputation scheme.

Supports the dual-query shared-KV mask (``num_special``; see
`ops/attention.py`) via absolute row/column index tests — compile-time
iota comparisons, no dynamic shapes.

Selectable as ``attention impl="pallas_stream"``; parity-tested against the
XLA path in interpreter mode (tests/test_flash_stream.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: auto = min(512, padded N) per axis. Bigger tiles cut
# grid-cell count — per-cell fixed costs and DMA pipeline bubbles dominate
# at 128x128 (measured on v5e: 512x512 is 2.3-2.8x faster and takes the
# kernel PAST XLA at N=3137, 47 vs 59 ms fwd+bwd; BASELINE.md round 2).
# [BLOCK_Q, BLOCK_K] f32 score tiles stay well under VMEM at 512x512 (1MB).
# set_blocks() pins explicit sizes for sweeps; set_blocks(None, None) = auto.
BLOCK_Q: int | None = None
BLOCK_K: int | None = None
_MAX_BLOCK = 512
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def set_blocks(bq: int | None, bk: int | None) -> None:
    """Override tile sizes (bench sweeps; lane multiples), None = auto."""
    global BLOCK_Q, BLOCK_K
    assert bq is None or bq % 128 == 0, bq
    assert bk is None or bk % 128 == 0, bk
    BLOCK_Q, BLOCK_K = bq, bk


def _blocks(n: int) -> tuple:
    auto = min(_MAX_BLOCK, _pad_to(n, 128))
    return (BLOCK_Q or auto, BLOCK_K or auto)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_len(n: int, blk_q: int, blk_k: int) -> int:
    """Padded sequence length divisible by BOTH tile sizes. Padding to
    max(blk_q, blk_k) alone silently under-covers the sequence when the
    larger tile is not a multiple of the smaller (e.g. 256/384)."""
    import math

    lcm = blk_q * blk_k // math.gcd(blk_q, blk_k)
    n_pad = _pad_to(n, lcm)
    assert n_pad % blk_q == 0 and n_pad % blk_k == 0, (n_pad, blk_q, blk_k)
    return n_pad


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mask(iq, ik, bq: int, bk: int, n: int, num_special: int, shape):
    """[bq, bk] bool of allowed edges for query block iq / key block ik."""
    row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = ik * bk + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ok = col < n
    if num_special:
        s = num_special
        ok &= ((row >= s) & (col >= s)) | ((row < s) & ((col == row) | (col >= s)))
    return ok


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, n: int, num_special: int, n_k: int,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    bq, d = q_ref.shape[1], q_ref.shape[2]
    bk = k_ref.shape[1]

    @pl.when(ik == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [bq, d]
    k = k_ref[0].astype(jnp.float32)  # [bk, d]
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    s = jnp.where(_mask(iq, ik, bq, bk, n, num_special, s.shape), s, _NEG_INF)

    m_prev = m_ref[...]  # [bq, 1]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # [bq, bk]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = m_cur

    @pl.when(ik == n_k - 1)
    def _finish():
        l = l_ref[...]
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[...] + jnp.log(l)).astype(lse_ref.dtype)


def _fwd(q, k, v, scale: float, num_special: int):
    bh, n, d = q.shape
    blk_q, blk_k = _blocks(n)
    n_pad = _pad_len(n, blk_q, blk_k)
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
    n_q, n_k = n_pad // blk_q, n_pad // blk_k

    kernel = functools.partial(
        _fwd_kernel, scale=scale, n=n, num_special=num_special, n_k=n_k
    )
    q_spec = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, blk_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[o_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),  # acc
            pltpu.VMEM((blk_q, 1), jnp.float32),  # m
            pltpu.VMEM((blk_q, 1), jnp.float32),  # l
        ],
        interpret=_interpret(),
    )(qp, kp, vp)
    return o[:, :n], lse[:, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref, dq_ref, acc_ref,
    *, scale: float, n: int, num_special: int, n_k: int,
):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1]
    delta = delta_ref[0]  # [bq, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    ok = _mask(iq, ik, bq, bk, n, num_special, s.shape)
    p = jnp.where(ok, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale: float, n: int, num_special: int, n_q: int,
):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    ok = _mask(iq, ik, bq, bk, n, num_special, s.shape)
    p = jnp.where(ok, jnp.exp(s - lse), 0.0)  # [bq, bk]
    dv_acc[...] += jax.lax.dot_general(  # P^T dO
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale  # [bq, bk]
    dk_acc[...] += jax.lax.dot_general(  # dS^T Q
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(scale: float, num_special: int, res, g):
    q, k, v, o, lse = res
    do = g
    bh, n, d = q.shape
    blk_q, blk_k = _blocks(n)
    n_pad = _pad_len(n, blk_q, blk_k)
    pad = [(0, 0), (0, n_pad - n), (0, 0)]
    qp, kp, vp, dop = (jnp.pad(t, pad) for t in (q, k, v, do))
    # delta = rowsum(dO * O), computed in XLA (cheap elementwise+reduce)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    deltap = jnp.pad(delta, [(0, 0), (0, n_pad - n)])[..., None]
    lsep = jnp.pad(lse, [(0, 0), (0, n_pad - n)])[..., None]
    n_q, n_k = n_pad // blk_q, n_pad // blk_k

    q_spec = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec_q = pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, blk_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, n=n, num_special=num_special, n_k=n_k
        ),
        grid=(bh, n_q, n_k),
        in_specs=[q_spec, kv_spec_q, kv_spec_q, row_spec, row_spec, q_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        interpret=_interpret(),
    )(qp, kp, vp, lsep, deltap, dop)

    # dk/dv: key blocks on grid axis 1, query blocks streamed on axis 2
    q_spec2 = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, blk_q, 1), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, n=n, num_special=num_special, n_q=n_q
        ),
        grid=(bh, n_k, n_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, row_spec2, row_spec2, q_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk_k, d), jnp.float32),
            pltpu.VMEM((blk_k, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, lsep, deltap, dop)
    return dq[:, :n], dk[:, :n], dv[:, :n]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_stream(q, k, v, scale: float, num_special: int):
    o, _ = _fwd(q, k, v, scale, num_special)
    return o


def _flash_stream_fwd(q, k, v, scale: float, num_special: int):
    o, lse = _fwd(q, k, v, scale, num_special)
    return o, (q, k, v, o, lse)


_flash_stream.defvjp(_flash_stream_fwd, _bwd)


def flash_attention_stream(
    q: jnp.ndarray,  # [B, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    num_special: int = 0,
) -> jnp.ndarray:
    """Streaming flash attention with flash backward. [B, H, N, D]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape
    fold = lambda t: t.reshape(b * h, n, d)
    out = _flash_stream(
        fold(q), fold(k), fold(v), float(scale), int(num_special)
    )
    return out.reshape(b, h, n, d).astype(v.dtype)
