"""Boundary-free fused flash attention: consumes the RAW qkv projection.

Round-3 measurement (BASELINE.md round 3b): the fused dropout flash kernel
(`ops/flash_dropout`) wins 1.29-3.2x in ISOLATION but loses IN-CONTEXT at
the flagship shape (N=197, D=32) — not on kernel math, but on the layout
work `pallas_call` forces at its boundary. The standard call path
materializes, per layer per minibatch, in HBM:

  [B, N, 3I] --split--> 3x[B, N, I] --reshape+transpose--> 3x[B, H, N, D]
  --pad--> 3x[BH_pad, N_pad, D]   (kernel)   [BH_pad, N_pad, D]
  --slice+transpose+reshape--> [B, N, I]

Six-plus whole-tensor copies that XLA cannot fuse away because
``pallas_call`` pins its operands to default layouts. This kernel deletes
ALL of them (VERDICT r3 item 4):

- **Input** is the raw ``[B, N, 3*I]`` output of the qkv Dense — exactly
  the layout the MXU matmul produces. One block per grid cell
  ``(gb, N_pad, 3I)``; 3I = 768 lanes is 128-aligned at the flagship dim.
- **Head split happens in VMEM**: the kernel statically loops over heads,
  lane-slicing ``q_h = qkv[:, :, hD:(h+1)D]`` etc. — a register relayout,
  not an HBM pass.
- **Output merge happens in VMEM**: head ``h``'s context vectors are
  written to lane slice ``o[:, :, hD:(h+1)D]`` of ONE ``[B, N, I]``
  output — already the layout the ``to_out`` Dense consumes.
- **No HBM padding**: the grid ceil-divides the batch and the single
  N-block overhangs the sequence; out-of-bounds garbage is zero-masked
  once per block after load (garbage in a dot-general operand would
  otherwise poison valid rows through 0*NaN).
- **Backward emits the merged ``d_qkv`` cotangent directly** — dq/dk/dv
  are lane-slices of one output block, so the backward boundary copies
  (and the 3-way concat XLA would need to reach the Dense VJP) vanish too.

Dropout (attention-probability dropout, reference vit.py:68) follows the
`ops/flash_dropout` contract exactly: on-core PRNG
(``pltpu.prng_random_bits``), 24-bit keep threshold, mask REGENERATED in
the backward from the same (seed, grid cell, head) tuple — never stored.
``dropout_raw_bits_qkv`` replays the stream for bit-exact on-chip
verification (scripts/tpu_kernel_check.py).

Grid-cell PRNG contract: cell ``i`` seeds ``seed0 + i*heads + h`` before
head ``h``'s draw; forward and backward share one batch-blocking
(``_SCORE_BUDGET``), so the masks match bit-exactly across passes.

Round-5 revisions (VERDICT r4 weak #6):

- **Native-dtype MXU operands**: q/k/v (and the backward's dO, sigma, ds)
  feed the dot-generals in the INPUT dtype with f32 accumulation via
  ``preferred_element_type`` — bf16 inputs are no longer upcast to f32
  first, so the MXU runs at its bf16 rate on the flagship config; softmax
  / lse / dsoftmax math stays f32.
- **"fori" head-loop impl** (selectable via :func:`set_impl`): the head
  loop runs as ``lax.fori_loop`` so Mosaic reuses ONE head's score-sized
  temporaries across all heads (the unrolled loop keeps them live per
  head — the round-4 measured constraint that pinned the batch block to
  gb=1). Dynamic lane slicing is unsupported, so head extraction is a
  dynamic lane ROTATE (``pltpu.roll``) + static slices, and per-head
  outputs accumulate in small VMEM scratch written back with static lane
  slices after the loop. Default budget 1 MB -> gb=4 at flagship n_pad.
- **"split" head-loop impl**: same loop-scoped-temporaries idea as
  "fori" but WITHOUT the dynamic lane rotate whose Mosaic lowering made
  the fori compile blow past 7 min at the flagship shape
  (results/fori_smoke_r5.out). A static unrolled loop pre-splits every
  head's q/k/v (and dO/lse in the backward) into head-keyed VMEM scratch
  with static lane slices; the fori compute loop then indexes scratch on
  the LEADING dim only (supported, cheap) and keeps one head's score
  temporaries loop-scoped. Same gb scaling as "fori".

Fallbacks: non-TPU backends run the kernel in interpreter mode when
``rate == 0`` (CPU tests cover the masking/overhang math for ALL impls)
and the XLA path (`ops/attention.mha` semantics, host-PRNG dropout — same
distribution, different bits) when ``rate > 0``; sequence lengths whose
working set would overflow VMEM (`supports`) also take the XLA path.

Reference hot spot this (together with the shared-patch-stream mode)
replaces: the double encoder pass vit_hg.py:322-366 / model.py:273-280.
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
# One budget for BOTH passes (backward must re-derive the identical
# grid-cell -> batch-rows mapping to regenerate the dropout bits).
#
# "unroll" impl — MEASURED CONSTRAINT (v5e, logs/kernel_check_qkv.out round
# 4): Mosaic does NOT reuse stack allocations across the unrolled in-kernel
# head loop — the backward's ~5 score-sized f32 temporaries stay live PER
# HEAD, so the per-cell stack is ~5 * heads * (gb * n_pad^2 * 4) bytes
# against a 16 MB scoped-vmem limit. gb=4 (budget 1 MB) OOMed at 37.18 MB
# with 8 heads; 256 KB keeps gb=1 at the flagship n_pad=256.
#
# "fori" impl (round 5, VERDICT r4 weak #6): the head loop runs as a
# lax.fori_loop, so the score temporaries are loop-body-scoped and Mosaic
# reuses ONE head's worth across all heads; per-head q/k/v extraction uses
# a dynamic lane rotate (pltpu.roll) + static slices, and per-head outputs
# accumulate in small VMEM scratch written back with static lane slices
# after the loop. Per-cell stack ~5 * (gb * n_pad^2 * 4) + the resident
# qkv/do blocks, so gb scales to 4-8 at the flagship n_pad=256.
# "split" impl (round 5b): the fori impl's Mosaic compile blew past 7 min
# at the flagship shape (results/fori_smoke_r5.out) — the suspected cost is
# the per-iteration dynamic lane ROTATE (tpu.DynamicRotate on 768-lane
# blocks). "split" removes roll entirely: a STATIC unrolled loop first
# copies every head's q/k/v (and dO / lse in the backward) into VMEM
# scratch keyed by head — [heads, gb, n_pad, D] buffers, static lane
# slices, no score-sized temporaries — then a lax.fori_loop over heads
# reads scratch with dynamic LEADING-dim indexing (the cheap, supported
# kind) and keeps one head's score temporaries loop-scoped, exactly like
# "fori". Same gb scaling, no DynamicRotate in the lowering.
# split budget: MEASURED (v5e, results/split_smoke_r5.out take 2) — the
# backward's true per-cell stack at gb=4/n_pad=256 is 18.07 MB vs the 16 MB
# scoped-vmem limit (the loop-scoped score temporaries shrink, but the 8
# head-keyed scratch buffers + qkv/do blocks grow with gb). 512 KB -> gb=2.
_DEFAULT_BUDGETS = {"unroll": 256 * 1024, "fori": 1024 * 1024,
                    "split": 512 * 1024}
# default stays "unroll" until the chip proves a loop impl (kernel check
# 24/24 + update-bench win); flip via set_impl or by editing this constant
_IMPL = "unroll"
_SCORE_BUDGET: int | None = None  # None -> impl default

# scoped-vmem stack limit the backward must fit (XLA default, see the
# compile error text in logs/kernel_check_qkv.out)
_STACK_CAP = 16 * 1024 * 1024


def set_budget(budget: int | None = None) -> None:
    """Override the per-cell score budget (bytes) for on-chip sweeps;
    ``None`` restores the impl-specific tuned default."""
    global _SCORE_BUDGET
    _SCORE_BUDGET = budget


def set_impl(impl: str = "split") -> None:
    """Select the in-kernel head-loop strategy: "unroll" (the round-4
    kernel), "fori" (loop-scoped temps via roll-based head extraction), or
    "split" (loop-scoped temps via static pre-split into head-keyed VMEM
    scratch — no DynamicRotate; see the module constants)."""
    global _IMPL
    if impl not in ("fori", "unroll", "split"):
        raise ValueError(f"unknown flash_qkv impl {impl!r}")
    _IMPL = impl


def _effective_impl(itemsize: int = 2) -> str:
    """The impl actually used for a given operand width.

    split's gb>1 advantage only exists for 2-byte dtypes: at f32 the
    backward's stack measured 18.05 MB over the 16 MB scoped-vmem cap at
    gb=2 (results/split_smoke_r5b.out), and at the gb=1 that fits, split
    is the same blocking as unroll with a ~19-minute Mosaic compile
    (results/split_smoke_r5c.out: correct, rel_err 1.8e-5, but no upside).
    So 4-byte dtypes under "split" route to the proven unroll kernels —
    the PRNG replay (dropout_raw_bits_qkv) takes the same itemsize so the
    grid-cell -> batch-rows mapping the seeds key off stays identical."""
    if _IMPL == "split" and itemsize >= 4:
        return "unroll"
    return _IMPL


def _budget(itemsize: int = 2) -> int:
    if _SCORE_BUDGET is not None:
        return _SCORE_BUDGET
    return _DEFAULT_BUDGETS[_effective_impl(itemsize)]


def _batch_block(n_pad: int, itemsize: int = 2) -> int:
    per_row = n_pad * n_pad * 4  # one batch row's f32 scores for one head
    return max(1, _budget(itemsize) // per_row)


def supports(n: int, heads: int = 8, itemsize: int = 2) -> bool:
    """True when the backward's recompute stack fits the scoped-vmem limit
    (module-constant provenance). The "unroll" impl keeps all heads'
    temporaries live; the loop impls keep one head's."""
    n_pad = _pad_to(n, _LANE)
    per_temp = max(_budget(itemsize), n_pad * n_pad * 4)
    live_heads = heads if _effective_impl(itemsize) == "unroll" else 1
    return 5 * live_heads * per_temp <= _STACK_CAP


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _masked_scores(q, k, scale, n, num_special):
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [gb, Np, Np]
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


def _zero_overhang(x, n):
    """Zero rows >= n of a [gb, Np, *] block: the single N-block overhangs
    the real sequence, and out-of-bounds reads are undefined (a NaN there
    would poison valid rows via 0*NaN in the dot-generals)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(row < n, x, 0.0)


def _head_fwd(q, k, v, dt, *, scale, n, num_special, thresh, inv_keep):
    """One head's flash forward from native-dtype q/k/v slices (MXU runs at
    the input dtype's rate — bf16 operands are NOT upcast; accumulation is
    f32 via preferred_element_type). Returns (o [gb,Np,D] f32, lse)."""
    s = _masked_scores(q, k, scale, n, num_special)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    sigma = p / l
    if thresh is not None:
        keep = _keep_mask(s.shape, thresh)
        sigma = jnp.where(keep, sigma * inv_keep, 0.0)
    o = jax.lax.dot_general(
        sigma.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return o, (m + jnp.log(l))[:, :, 0]


def _fwd_kernel(
    seed_ref, qkv_ref, o_ref, lse_ref,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    dt = qkv.dtype
    for h in range(heads):
        if thresh is not None:
            # per-(cell, head) seed; int32 wraparound is deterministic and
            # identical in the backward
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        lo = h * dim_head
        q = jax.lax.slice_in_dim(qkv, lo, lo + dim_head, axis=2)
        k = jax.lax.slice_in_dim(qkv, inner + lo, inner + lo + dim_head, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * inner + lo, 2 * inner + lo + dim_head, axis=2)
        o, lse = _head_fwd(
            q, k, v, dt, scale=scale, n=n, num_special=num_special,
            thresh=thresh, inv_keep=inv_keep,
        )
        o_ref[:, :, lo:lo + dim_head] = o.astype(o_ref.dtype)
        lse_ref[:, h, :] = lse


def _head_bwd(q, k, v, do, lse, dt, *, scale, n, num_special, thresh, inv_keep):
    """One head's flash backward from native-dtype slices. Returns
    (dq, dk, dv) in f32; score math stays f32, MXU operands stay ``dt``."""
    s = _masked_scores(q, k, scale, n, num_special)
    sigma = jnp.exp(s - lse)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    sigma = jnp.where((row < n) & (col < n), sigma, 0.0)

    if thresh is not None:
        keep = _keep_mask(s.shape, thresh)
        pd = jnp.where(keep, sigma * inv_keep, 0.0)
    else:
        pd = sigma
    dv = jax.lax.dot_general(  # Pd^T dO
        pd.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dpd = jax.lax.dot_general(  # dO V^T
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if thresh is not None:
        dsigma = jnp.where(keep, dpd * inv_keep, 0.0)
    else:
        dsigma = dpd
    rowsum = jnp.sum(dsigma * sigma, axis=-1, keepdims=True)
    ds = (sigma * (dsigma - rowsum) * scale).astype(dt)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _bwd_kernel(
    seed_ref, qkv_ref, lse_ref, do_ref, dqkv_ref,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    do_all = _zero_overhang(do_ref[...], n)
    dt = qkv.dtype
    for h in range(heads):
        if thresh is not None:
            # identical seeding + identical block shape -> identical mask
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        lo = h * dim_head
        q = jax.lax.slice_in_dim(qkv, lo, lo + dim_head, axis=2)
        k = jax.lax.slice_in_dim(qkv, inner + lo, inner + lo + dim_head, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * inner + lo, 2 * inner + lo + dim_head, axis=2)
        do = jax.lax.slice_in_dim(do_all, lo, lo + dim_head, axis=2)
        lse = lse_ref[:, h, :][:, :, None]
        dq, dk, dv = _head_bwd(
            q, k, v, do, lse, dt, scale=scale, n=n,
            num_special=num_special, thresh=thresh, inv_keep=inv_keep,
        )
        ot = dqkv_ref.dtype
        dqkv_ref[:, :, lo:lo + dim_head] = dq.astype(ot)
        dqkv_ref[:, :, inner + lo:inner + lo + dim_head] = dk.astype(ot)
        dqkv_ref[:, :, 2 * inner + lo:2 * inner + lo + dim_head] = dv.astype(ot)


def _rolled_head(x, h, dim_head):
    """Rotate head ``h``'s lanes to position 0. Mosaic does not support
    dynamic LANE-dim slicing, but it does support a dynamic lane rotate
    (tpu.DynamicRotate via pltpu.roll); static slices then read q/k/v."""
    width = x.shape[-1]
    return pltpu.roll(x, jax.lax.rem(width - h * dim_head, width), axis=2)


def _fwd_kernel_fori(
    seed_ref, qkv_ref, o_ref, lse_ref, o_scr, lse_scr,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    """Forward with the head loop as lax.fori_loop: score-sized temporaries
    are loop-body-scoped (reused across heads), so the batch block scales
    (module doc). Per-head outputs land in VMEM scratch keyed by the
    (dynamic) head index; the static copy loop below merges them into the
    lane-sliced output block."""
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    dt = qkv.dtype

    def body(h, carry):
        if thresh is not None:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        rolled = _rolled_head(qkv, h, dim_head)
        q = jax.lax.slice_in_dim(rolled, 0, dim_head, axis=2)
        k = jax.lax.slice_in_dim(rolled, inner, inner + dim_head, axis=2)
        v = jax.lax.slice_in_dim(rolled, 2 * inner, 2 * inner + dim_head, axis=2)
        o, lse = _head_fwd(
            q, k, v, dt, scale=scale, n=n, num_special=num_special,
            thresh=thresh, inv_keep=inv_keep,
        )
        o_scr[h] = o.astype(o_ref.dtype)
        lse_scr[h] = lse
        return carry

    jax.lax.fori_loop(0, heads, body, 0)
    for h in range(heads):
        lo = h * dim_head
        o_ref[:, :, lo:lo + dim_head] = o_scr[h]
        lse_ref[:, h, :] = lse_scr[h]


def _bwd_kernel_fori(
    seed_ref, qkv_ref, lse_ref, do_ref, dqkv_ref, dq_scr, dk_scr, dv_scr,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    do_all = _zero_overhang(do_ref[...], n)
    lse_all = lse_ref[...]  # [gb, heads, Np] f32
    dt = qkv.dtype
    ot = dqkv_ref.dtype

    def body(h, carry):
        if thresh is not None:
            # identical seeding + identical block shape -> identical mask
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        rolled = _rolled_head(qkv, h, dim_head)
        q = jax.lax.slice_in_dim(rolled, 0, dim_head, axis=2)
        k = jax.lax.slice_in_dim(rolled, inner, inner + dim_head, axis=2)
        v = jax.lax.slice_in_dim(rolled, 2 * inner, 2 * inner + dim_head, axis=2)
        do = jax.lax.slice_in_dim(
            _rolled_head(do_all, h, dim_head), 0, dim_head, axis=2
        )
        # [gb,1,Np] -> [gb,Np,1]: same element order, relayout only
        lse = jax.lax.dynamic_slice_in_dim(lse_all, h, 1, axis=1).reshape(
            qkv.shape[0], -1, 1
        )
        dq, dk, dv = _head_bwd(
            q, k, v, do, lse, dt, scale=scale, n=n,
            num_special=num_special, thresh=thresh, inv_keep=inv_keep,
        )
        dq_scr[h] = dq.astype(ot)
        dk_scr[h] = dk.astype(ot)
        dv_scr[h] = dv.astype(ot)
        return carry

    jax.lax.fori_loop(0, heads, body, 0)
    for h in range(heads):
        lo = h * dim_head
        dqkv_ref[:, :, lo:lo + dim_head] = dq_scr[h]
        dqkv_ref[:, :, inner + lo:inner + lo + dim_head] = dk_scr[h]
        dqkv_ref[:, :, 2 * inner + lo:2 * inner + lo + dim_head] = dv_scr[h]


def _fwd_kernel_split(
    seed_ref, qkv_ref, o_ref, lse_ref, q_scr, k_scr, v_scr, o_scr, lse_scr,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    """Forward with a static head pre-split + fori compute loop: the
    unrolled copy loops touch only [gb, Np, D] blocks (no score-sized
    temporaries live per head), and the fori body's score temporaries are
    loop-scoped so Mosaic reuses one head's worth (module constants)."""
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    dt = qkv.dtype
    for h in range(heads):  # static lane slices -> head-keyed scratch
        lo = h * dim_head
        q_scr[h] = jax.lax.slice_in_dim(qkv, lo, lo + dim_head, axis=2)
        k_scr[h] = jax.lax.slice_in_dim(
            qkv, inner + lo, inner + lo + dim_head, axis=2
        )
        v_scr[h] = jax.lax.slice_in_dim(
            qkv, 2 * inner + lo, 2 * inner + lo + dim_head, axis=2
        )

    def body(h, carry):
        if thresh is not None:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        o, lse = _head_fwd(
            q_scr[h], k_scr[h], v_scr[h], dt, scale=scale, n=n,
            num_special=num_special, thresh=thresh, inv_keep=inv_keep,
        )
        o_scr[h] = o.astype(o_ref.dtype)
        lse_scr[h] = lse
        return carry

    jax.lax.fori_loop(0, heads, body, 0)
    for h in range(heads):  # static merge back to lane-sliced outputs
        lo = h * dim_head
        o_ref[:, :, lo:lo + dim_head] = o_scr[h]
        lse_ref[:, h, :] = lse_scr[h]


def _bwd_kernel_split(
    seed_ref, qkv_ref, lse_ref, do_ref, dqkv_ref,
    q_scr, k_scr, v_scr, do_scr, lse_scr, dq_scr, dk_scr, dv_scr,
    *, scale, n, heads, dim_head, num_special, thresh, inv_keep,
):
    inner = heads * dim_head
    qkv = _zero_overhang(qkv_ref[...], n)
    do_all = _zero_overhang(do_ref[...], n)
    dt = qkv.dtype
    ot = dqkv_ref.dtype
    for h in range(heads):  # static lane slices -> head-keyed scratch
        lo = h * dim_head
        q_scr[h] = jax.lax.slice_in_dim(qkv, lo, lo + dim_head, axis=2)
        k_scr[h] = jax.lax.slice_in_dim(
            qkv, inner + lo, inner + lo + dim_head, axis=2
        )
        v_scr[h] = jax.lax.slice_in_dim(
            qkv, 2 * inner + lo, 2 * inner + lo + dim_head, axis=2
        )
        do_scr[h] = jax.lax.slice_in_dim(do_all, lo, lo + dim_head, axis=2)
        lse_scr[h] = lse_ref[:, h, :]

    def body(h, carry):
        if thresh is not None:
            # identical seeding + identical block shape -> identical mask
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        lse = lse_scr[h][:, :, None]  # [gb, Np] -> [gb, Np, 1]
        dq, dk, dv = _head_bwd(
            q_scr[h], k_scr[h], v_scr[h], do_scr[h], lse, dt, scale=scale,
            n=n, num_special=num_special, thresh=thresh, inv_keep=inv_keep,
        )
        dq_scr[h] = dq.astype(ot)
        dk_scr[h] = dk.astype(ot)
        dv_scr[h] = dv.astype(ot)
        return carry

    jax.lax.fori_loop(0, heads, body, 0)
    for h in range(heads):  # static merge: dq/dk/dv -> one d_qkv block
        lo = h * dim_head
        dqkv_ref[:, :, lo:lo + dim_head] = dq_scr[h]
        dqkv_ref[:, :, inner + lo:inner + lo + dim_head] = dk_scr[h]
        dqkv_ref[:, :, 2 * inner + lo:2 * inner + lo + dim_head] = dv_scr[h]


def _geom(b: int, n: int, itemsize: int = 2):
    n_pad = _pad_to(n, _LANE)
    gb = _batch_block(n_pad, itemsize)
    nb = -(-b // gb)  # cdiv: the last block overhangs; kernel masks
    return n_pad, gb, nb


def _fwd(qkv, seeds, scale, heads, dim_head, num_special, thresh):
    b, n, three_i = qkv.shape
    inner = three_i // 3
    n_pad, gb, nb = _geom(b, n, qkv.dtype.itemsize)
    impl = _effective_impl(qkv.dtype.itemsize)
    fwd_kernels = {
        "unroll": _fwd_kernel, "fori": _fwd_kernel_fori,
        "split": _fwd_kernel_split,
    }
    kernel = functools.partial(
        fwd_kernels[impl],
        scale=scale, n=n, heads=heads, dim_head=dim_head,
        num_special=num_special, thresh=thresh,
        inv_keep=inv_keep_scale(thresh) if thresh is not None else 1.0,
    )
    head_block = pltpu.VMEM((heads, gb, n_pad, dim_head), qkv.dtype)
    lse_block = pltpu.VMEM((heads, gb, n_pad), jnp.float32)
    scratch = {
        "unroll": [],
        "fori": [head_block, lse_block],  # o_scr, lse_scr
        "split": [head_block] * 3 + [head_block, lse_block],  # q/k/v + o/lse
    }[impl]
    o, lse = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, n_pad, three_i), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, n_pad, inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * gb, n_pad, inner), qkv.dtype),
            jax.ShapeDtypeStruct((nb * gb, heads, n_pad), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(seeds, qkv)
    return o[:b, :n], lse


def _bwd(heads, dim_head, scale, num_special, thresh, res, cot):
    qkv, lse, seeds = res
    b, n, three_i = qkv.shape
    n_pad, gb, nb = _geom(b, n, qkv.dtype.itemsize)
    impl = _effective_impl(qkv.dtype.itemsize)
    bwd_kernels = {
        "unroll": _bwd_kernel, "fori": _bwd_kernel_fori,
        "split": _bwd_kernel_split,
    }
    kernel = functools.partial(
        bwd_kernels[impl],
        scale=scale, n=n, heads=heads, dim_head=dim_head,
        num_special=num_special, thresh=thresh,
        inv_keep=inv_keep_scale(thresh) if thresh is not None else 1.0,
    )
    inner = three_i // 3
    head_block = pltpu.VMEM((heads, gb, n_pad, dim_head), qkv.dtype)
    scratch = {
        "unroll": [],
        "fori": [head_block] * 3,  # dq/dk/dv
        # q/k/v/do + lse + dq/dk/dv
        "split": [head_block] * 4
        + [pltpu.VMEM((heads, gb, n_pad), jnp.float32)]
        + [head_block] * 3,
    }[impl]
    dqkv = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, n_pad, three_i), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, heads, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, n_pad, inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, n_pad, three_i), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * gb, n_pad, three_i), qkv.dtype),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(seeds, qkv, lse, cot)
    return dqkv[:b, :n], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _flash_qkv(qkv, seeds, heads, dim_head, scale, num_special, thresh):
    o, _ = _fwd(qkv, seeds, scale, heads, dim_head, num_special, thresh)
    return o


def _flash_qkv_fwd(qkv, seeds, heads, dim_head, scale, num_special, thresh):
    o, lse = _fwd(qkv, seeds, scale, heads, dim_head, num_special, thresh)
    return o, (qkv, lse, seeds)


def _flash_qkv_bwd(heads, dim_head, scale, num_special, thresh, res, cot):
    return _bwd(heads, dim_head, scale, num_special, thresh, res, cot)


_flash_qkv.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def _xla_reference(qkv, heads, dim_head, rng, rate, scale, num_special):
    """Split/transpose + `ops.attention.mha` (identical math; host-PRNG
    dropout bits when rate > 0 — same distribution, different bits)."""
    from eavit_tpu.ops.attention import mha

    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)

    out = mha(
        heads_split(q), heads_split(k), heads_split(v),
        scale=scale, impl="xla", num_special=num_special,
        dropout_rate=rate, dropout_rng=rng,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)


def flash_mha_qkv(
    qkv: jnp.ndarray,  # [B, N, 3*heads*dim_head]: raw qkv Dense output
    heads: int,
    dim_head: int,
    rng: jax.Array | None = None,
    rate: float = 0.0,
    scale: float | None = None,
    num_special: int = 0,
) -> jnp.ndarray:
    """Multi-head ``dropout(softmax(q k^T * scale)) v`` -> [B, N, I], fused
    from the raw qkv projection with zero boundary layout work (module doc).
    """
    if qkv.shape[-1] != 3 * heads * dim_head:
        raise ValueError(
            f"qkv last dim {qkv.shape[-1]} != 3*heads*dim_head "
            f"({3 * heads * dim_head})"
        )
    if scale is None:
        scale = dim_head ** -0.5
    if rate > 0.0 and rng is None:
        raise ValueError("rate > 0 requires an rng")
    on_tpu = jax.default_backend() == "tpu"
    if (rate > 0.0 and not on_tpu) or not supports(
        qkv.shape[1], heads, qkv.dtype.itemsize
    ):
        # interpreter mode has no on-core PRNG; oversize sequences would
        # overflow the per-cell VMEM working set
        return _xla_reference(qkv, heads, dim_head, rng, rate, scale, num_special)
    if rate > 0.0:
        seeds = _seeds_from_rng(rng)
        thresh = keep_threshold(rate)
    else:
        seeds = jnp.zeros((2,), jnp.int32)
        thresh = None
    return _flash_qkv(
        qkv, seeds, int(heads), int(dim_head), float(scale),
        int(num_special), thresh,
    )


# ---------------------------------------------------------------------------
# on-chip verification support
# ---------------------------------------------------------------------------


def _bits_kernel(seed_ref, o_ref, scr, *, heads):
    # o_ref: [gb, heads, Np, Np]; replay head h's stream with its exact
    # seed. fori + scratch for the same reason as the main kernels: the
    # unrolled loop's bits temporaries would stay live per head.
    gb, _, n_pad, _ = o_ref.shape

    def body(h, carry):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + h, seed_ref[1])
        bits = pltpu.prng_random_bits((gb, n_pad, n_pad))
        scr[h] = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
        ).astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, heads, body, 0)
    for h in range(heads):
        o_ref[:, h, :, :] = scr[h]


def dropout_raw_bits_qkv(
    b: int, heads: int, n: int, seeds: jax.Array, itemsize: int = 2
) -> jnp.ndarray:
    """Replay the kernel's PRNG streams on an identical grid.

    ``itemsize`` must be the qkv dtype's (the batch block — and therefore
    the grid-cell -> batch-rows mapping the seeds key off — is
    dtype-dependent for the split impl, _batch_block).

    Returns the raw 24-bit threshold values as int32 [B, H, N, N]; the keep
    mask the fwd/bwd kernels used is ``bits < keep_threshold(rate)``.
    """
    n_pad, gb, nb = _geom(b, n, itemsize)
    bits = pl.pallas_call(
        functools.partial(_bits_kernel, heads=heads),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (gb, heads, n_pad, n_pad), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb * gb, heads, n_pad, n_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((heads, gb, n_pad, n_pad), jnp.int32)],
    )(seeds)
    return bits[:b, :, :n, :n]
