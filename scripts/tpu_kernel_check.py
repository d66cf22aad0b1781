"""On-chip numerics check: Pallas attention kernels vs the XLA reference.

The pytest parity tests run the kernels in interpreter mode on CPU
(ops/flash.py:44-46); this script runs them on the REAL TPU (Mosaic
compilation) and compares forward outputs and input gradients against the
XLA implementation at the flagship shape and a non-aligned shape, in both
f32 and bf16, exact and dual-query shared-KV modes.

Usage (needs the chip free): python scripts/tpu_kernel_check.py
Prints one PASS/FAIL line per case; exit code 1 on any FAIL.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from eavit_tpu.ops.attention import mha

# (B, H, N, Dh): flagship = 512 stacked streams x 8 heads x 197 tokens x 32;
# plus a deliberately lane/step-misaligned small case. The KV-streaming
# kernel gets its own shape set in its own regime — long sequences, modest
# batch (checking it at B512 under highest-precision f32 compiles for tens
# of minutes and proves nothing about its target workload).
SHAPES = {
    "pallas": [(512, 8, 197, 32), (7, 8, 197, 32), (16, 4, 130, 64)],
    "pallas_stream": [(7, 8, 197, 32), (16, 4, 130, 64), (4, 4, 640, 64)],
}
DTYPES = [jnp.float32, jnp.bfloat16]
IMPLS = ["pallas", "pallas_stream"]
SPECIALS = [0, 2]

# fwd/grad agreement thresholds vs XLA, same dtype inputs; f32 disagreement
# is kernel-order noise, bf16 adds cast noise on both sides
TOL = {jnp.float32: 2e-4, jnp.bfloat16: 2e-2}


def run_case(impl: str, shape, dtype, num_special: int) -> float:
    b, h, n, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, dtype)
    k = jax.random.normal(ks[1], shape, dtype)
    v = jax.random.normal(ks[2], shape, dtype)

    def loss(q, k, v, impl):
        o = mha(q, k, v, impl=impl, num_special=num_special)
        # weighted sum -> non-trivial cotangents
        w = jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape) % 7
        return jnp.sum(o.astype(jnp.float32) * w)

    # differentiate wrt ALL of (q, k, v): dk/dv run through a separate
    # pallas_call in the streaming backward, so a q-only grad check would
    # leave those kernels unvalidated on-chip
    f_ref = jax.jit(
        jax.value_and_grad(lambda q, k, v: loss(q, k, v, "xla"), argnums=(0, 1, 2))
    )
    f_ker = jax.jit(
        jax.value_and_grad(lambda q, k, v: loss(q, k, v, impl), argnums=(0, 1, 2))
    )
    # f32 cases force true-f32 matmuls on the MXU: at DEFAULT precision both
    # paths multiply in bf16 with different blocking/summation order, which
    # shows up as ~5e-3 mutual "error" that says nothing about kernel
    # correctness (measured on v5e). bf16 cases keep production precision.
    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        val_r, grads_r = f_ref(q, k, v)
        val_k, grads_k = f_ker(q, k, v)
    rel = abs(float(val_k) - float(val_r)) / max(1.0, abs(float(val_r)))
    for g_r, g_k in zip(grads_r, grads_k):
        g_r = np.asarray(g_r, np.float32)
        g_k = np.asarray(g_k, np.float32)
        rel = max(
            rel,
            float(np.max(np.abs(g_k - g_r)) / max(1e-6, float(np.max(np.abs(g_r))))),
        )
    return rel


def run_case_dropout(shape, dtype, num_special: int, rate: float) -> float:
    """Exact-mask check of the fused-dropout kernel (ops/flash_dropout).

    Replays the kernel's PRNG stream (`dropout_raw_bits`, identical grid +
    seeding) to extract the keep mask, builds an XLA reference that applies
    THAT mask, and compares forward output and (dq, dk, dv). A bwd pass
    that failed to regenerate the forward's bits, or any error in the
    dropout-aware gradient math, shows up as a mismatch here.
    """
    from eavit_tpu.ops import flash_dropout as fd
    from eavit_tpu.ops.attention import dual_query_allowed, _NEG_INF

    b, h, n, d = shape
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], shape, dtype)
    k = jax.random.normal(ks[1], shape, dtype)
    v = jax.random.normal(ks[2], shape, dtype)
    scale = d ** -0.5
    seeds = fd._seeds_from_rng(ks[3])

    bits = jax.jit(fd.dropout_raw_bits, static_argnums=(0, 1, 2))(
        b, h, n, seeds
    )
    thresh = fd.keep_threshold(rate)
    keep = np.asarray(bits) < thresh
    inv_keep = float((1 << 24) / thresh)
    assert 0.0 < keep.mean() < 1.0, "degenerate mask"

    w = (jnp.arange(b * h * n * d, dtype=jnp.float32).reshape(shape) % 7)

    def loss_ref(q, k, v, keep):
        s = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        if num_special:
            allowed = dual_query_allowed(n, n, num_special)
            s = jnp.where(allowed, s, _NEG_INF)
        sigma = jax.nn.softmax(s, axis=-1)
        pd = jnp.where(keep, sigma * inv_keep, 0.0)
        o = jnp.einsum("bhnm,bhmd->bhnd", pd, v.astype(jnp.float32))
        return jnp.sum(o * w)

    def loss_ker(q, k, v):
        o = fd._flash_drop(q, k, v, seeds, scale, num_special, rate)
        return jnp.sum(o.astype(jnp.float32) * w)

    f_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))
    f_ker = jax.jit(jax.value_and_grad(loss_ker, argnums=(0, 1, 2)))
    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        val_r, grads_r = f_ref(q, k, v, jnp.asarray(keep))
        val_k, grads_k = f_ker(q, k, v)
    rel = abs(float(val_k) - float(val_r)) / max(1.0, abs(float(val_r)))
    for g_r, g_k in zip(grads_r, grads_k):
        g_r = np.asarray(g_r, np.float32)
        g_k = np.asarray(g_k, np.float32)
        rel = max(
            rel,
            float(np.max(np.abs(g_k - g_r)) / max(1e-6, float(np.max(np.abs(g_r))))),
        )
    return rel


def run_case_qkv(
    b: int, heads: int, n: int, d: int, dtype, num_special: int, rate: float
) -> float:
    """Exact-mask check of the boundary-free qkv kernel (ops/flash_qkv).

    Replays the per-(cell, head) PRNG streams (`dropout_raw_bits_qkv`,
    identical grid + seeding), builds an XLA reference over the SAME raw
    [B, N, 3I] projection applying THAT mask, and compares forward output
    and the merged d_qkv cotangent. rate=0 checks the dropout-free path
    (act/eval) through the same kernel."""
    from eavit_tpu.ops import flash_qkv as fq
    from eavit_tpu.ops.attention import dual_query_allowed, _NEG_INF

    inner = heads * d
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    qkv = jax.random.normal(ks[0], (b, n, 3 * inner), dtype)
    scale = d ** -0.5
    seeds = fq._seeds_from_rng(ks[1])
    thresh = fq.keep_threshold(rate) if rate > 0.0 else None
    if thresh is not None:
        bits = jax.jit(fq.dropout_raw_bits_qkv, static_argnums=(0, 1, 2, 4))(
            b, heads, n, seeds, jnp.dtype(dtype).itemsize
        )
        keep = jnp.asarray(np.asarray(bits) < thresh)  # [B, H, N, N]
        inv_keep = float((1 << 24) / thresh)
        assert 0.0 < float(keep.mean()) < 1.0, "degenerate mask"

    w = (jnp.arange(b * n * inner, dtype=jnp.float32).reshape(b, n, inner) % 7)

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hs = lambda t: t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        q, k, v = hs(q), hs(k), hs(v)
        s = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        if num_special:
            allowed = dual_query_allowed(n, n, num_special)
            s = jnp.where(allowed, s, _NEG_INF)
        sigma = jax.nn.softmax(s, axis=-1)
        if thresh is not None:
            sigma = jnp.where(keep, sigma * inv_keep, 0.0)
        o = jnp.einsum("bhnm,bhmd->bhnd", sigma, v.astype(jnp.float32))
        o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return jnp.sum(o * w)

    def loss_ker(qkv):
        o = fq._flash_qkv(qkv, seeds, heads, d, scale, num_special, thresh)
        return jnp.sum(o.astype(jnp.float32) * w)

    f_ref = jax.jit(jax.value_and_grad(loss_ref))
    f_ker = jax.jit(jax.value_and_grad(loss_ker))
    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        val_r, g_r = f_ref(qkv)
        val_k, g_k = f_ker(qkv)
    rel = abs(float(val_k) - float(val_r)) / max(1.0, abs(float(val_r)))
    g_r = np.asarray(g_r, np.float32)
    g_k = np.asarray(g_k, np.float32)
    rel = max(
        rel,
        float(np.max(np.abs(g_k - g_r)) / max(1e-6, float(np.max(np.abs(g_r))))),
    )
    return rel


def run_case_ffn(rows: int, dim: int, hid: int, dtype, rate: float) -> float:
    """Exact-mask check of the fused FFN kernel (ops/fused_ffn).

    Replays both PRNG streams (`dropout_raw_bits`, identical grid/order),
    rebuilds the chain LN -> fc1 -> GELU -> drop1 -> fc2 -> drop2 in XLA
    with THOSE masks, and compares forward + gradients wrt x AND every
    parameter (the weight grads exercise the sequential-grid accumulation
    path in the backward kernel).
    """
    from eavit_tpu.ops import fused_ffn as ff

    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(ks[0], (rows, dim), dtype)
    g1 = jax.random.normal(ks[1], (dim,), jnp.float32) * 0.2 + 1.0
    b1 = jax.random.normal(ks[2], (dim,), jnp.float32) * 0.1
    w1 = jax.random.normal(ks[3], (dim, hid), jnp.float32) / np.sqrt(dim)
    c1 = jax.random.normal(ks[4], (hid,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[5], (hid, dim), jnp.float32) / np.sqrt(hid)
    c2 = jax.random.normal(ks[6], (dim,), jnp.float32) * 0.1
    params = (g1, b1, w1, c1, w2, c2)
    eps = 1e-5
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(ks[7], (2,), dtype=jnp.uint32), jnp.int32
    )

    m1b, m2b = jax.jit(ff.dropout_raw_bits, static_argnums=(0, 1, 2))(
        rows, dim, hid, seeds
    )
    thresh = ff.keep_threshold(rate)
    keep1 = jnp.asarray(np.asarray(m1b) < thresh)
    keep2 = jnp.asarray(np.asarray(m2b) < thresh)
    inv = float((1 << 24) / thresh)

    w = (jnp.arange(rows * dim, dtype=jnp.float32).reshape(rows, dim) % 5)

    def loss_ref(x, params):
        g1, b1, w1, c1, w2, c2 = (p.astype(jnp.float32) for p in params)
        u, _, _ = ff._layernorm(x.astype(jnp.float32), g1, b1, eps)
        h = u @ w1 + c1
        g = ff._gelu_exact(h)
        gd = jnp.where(keep1, g * inv, 0.0)
        y0 = gd @ w2 + c2
        y = jnp.where(keep2, y0 * inv, 0.0)
        return jnp.sum(y * w)

    def loss_ker(x, params):
        y = ff._ffn(x, params, seeds, eps, rate)
        return jnp.sum(y.astype(jnp.float32) * w)

    f_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))
    f_ker = jax.jit(jax.value_and_grad(loss_ker, argnums=(0, 1)))
    prec = "highest" if dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(prec):
        val_r, (dx_r, dp_r) = f_ref(x, params)
        val_k, (dx_k, dp_k) = f_ker(x, params)
    rel = abs(float(val_k) - float(val_r)) / max(1.0, abs(float(val_r)))
    for g_r, g_k in zip((dx_r, *dp_r), (dx_k, *dp_k)):
        g_r = np.asarray(g_r, np.float32)
        g_k = np.asarray(g_k, np.float32)
        rel = max(
            rel,
            float(np.max(np.abs(g_k - g_r)) / max(1e-6, float(np.max(np.abs(g_r))))),
        )
    return rel


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--impls", type=str,
                   default=",".join(IMPLS) + ",pallas_drop,fused_ffn,pallas_qkv",
                   help="comma-separated subset of kernels to check")
    p.add_argument("--qkv_impl", type=str, default=None,
                   help="flash_qkv head-loop strategy: unroll|fori|split")
    p.add_argument("--qkv_budget", type=int, default=0,
                   help="flash_qkv per-cell score budget bytes (0=default)")
    args = p.parse_args()
    if args.qkv_impl or args.qkv_budget:
        from eavit_tpu.ops import flash_qkv as _fq

        if args.qkv_impl:
            _fq.set_impl(args.qkv_impl)
        if args.qkv_budget:
            _fq.set_budget(args.qkv_budget)
        print(f"# flash_qkv impl={_fq._IMPL} budget={_fq._budget()}")
    impls = args.impls.split(",")
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    failures = 0
    for impl in impls:
        if impl == "fused_ffn":
            # (rows, dim, hid): flagship minibatch rows = 512*197 is checked
            # at reduced rows (grid accumulation is rows-independent);
            # misaligned rows exercise padding
            for rows, dim, hid in [(2048, 256, 1024), (777, 256, 1024),
                                   (512, 128, 512)]:
                for dtype in DTYPES:
                    for rate in (0.0, 0.1):
                        err = run_case_ffn(rows, dim, hid, dtype, rate)
                        tol = TOL[dtype]
                        ok = err <= tol
                        failures += not ok
                        print(
                            f"{'PASS' if ok else 'FAIL'} fused_ffn      "
                            f"R{rows}xD{dim}xH{hid} "
                            f"{jnp.dtype(dtype).name:9s} rate={rate} "
                            f"rel_err={err:.2e} (tol {tol:.0e})",
                            flush=True,
                        )
            continue
        if impl == "pallas_qkv":
            # (B, heads, N, D): flagship shared mode = 256x8x199x32,
            # exact stacked = 512x8x197x32; plus misaligned small case
            for b, heads, n, d in [(256, 8, 199, 32), (512, 8, 197, 32),
                                   (7, 4, 130, 64)]:
                for dtype in DTYPES:
                    for sp in SPECIALS:
                        for rate in (0.0, 0.1):
                            err = run_case_qkv(b, heads, n, d, dtype, sp, rate)
                            tol = TOL[dtype]
                            ok = err <= tol
                            failures += not ok
                            print(
                                f"{'PASS' if ok else 'FAIL'} pallas_qkv     "
                                f"B{b}xH{heads}xN{n}xD{d} "
                                f"{jnp.dtype(dtype).name:9s} special={sp} "
                                f"rate={rate} "
                                f"rel_err={err:.2e} (tol {tol:.0e})",
                                flush=True,
                            )
            continue
        if impl == "pallas_drop":
            for shape in [(64, 8, 197, 32), (7, 8, 197, 32), (16, 4, 130, 64)]:
                for dtype in DTYPES:
                    for sp in SPECIALS:
                        err = run_case_dropout(shape, dtype, sp, rate=0.1)
                        tol = TOL[dtype]
                        ok = err <= tol
                        failures += not ok
                        print(
                            f"{'PASS' if ok else 'FAIL'} pallas_drop    "
                            f"B{shape[0]}xH{shape[1]}xN{shape[2]}xD{shape[3]} "
                            f"{jnp.dtype(dtype).name:9s} special={sp} "
                            f"rel_err={err:.2e} (tol {tol:.0e})",
                            flush=True,
                        )
            continue
        for shape in SHAPES[impl]:
            for dtype in DTYPES:
                for sp in SPECIALS:
                    err = run_case(impl, shape, dtype, sp)
                    tol = TOL[dtype]
                    ok = err <= tol
                    failures += not ok
                    print(
                        f"{'PASS' if ok else 'FAIL'} {impl:14s} "
                        f"B{shape[0]}xH{shape[1]}xN{shape[2]}xD{shape[3]} "
                        f"{jnp.dtype(dtype).name:9s} special={sp} "
                        f"rel_err={err:.2e} (tol {tol:.0e})",
                        flush=True,
                    )
    if failures:
        print(f"{failures} case(s) FAILED")
        sys.exit(1)
    print("all kernel cases match XLA on-chip")


if __name__ == "__main__":
    main()
