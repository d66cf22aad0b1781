"""Attention fwd+bwd microbenchmark: XLA vs Pallas kernels across seq lens.

The flagship ViT runs at N=197 where XLA's fused attention wins (BASELINE.md
round 2). This sweep measures where the Pallas kernels take over as the
sequence grows (bigger images / smaller patches => more tokens): XLA
materializes [B, H, N, N] probabilities to HBM in the backward, while the
flash kernels keep scores in VMEM (batch-blocked) or stream KV blocks with
online softmax (pallas_stream), so their advantage scales with N^2 HBM
traffic saved.

Run on the real TPU: python scripts/attn_microbench.py [--dtype bfloat16]
Prints ms per fwd+bwd step per impl per shape, plus the winner.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from eavit_tpu.ops.attention import mha

# (B, H, N, Dh): token count N grows as patch size shrinks / image grows.
# B scaled down with N to keep memory sane; heads/dim_head flagship-like.
SHAPES = [
    (512, 8, 197, 32),   # flagship: 84x84, patch 6 (+1 token)
    (128, 8, 442, 32),   # 84x84, patch 4
    (64, 8, 785, 64),    # 112x112, patch 4
    (32, 8, 1765, 64),   # 168x168, patch 4
    (16, 8, 3137, 64),   # 224x224, patch 4 (ViT-Base-like grid)
]
IMPLS = ["xla", "pallas", "pallas_stream"]


def bench_case(
    impl: str, shape, dtype, iters: int = 10, dropout: float = 0.0
) -> float:
    """fwd+bwd ms/step; ``dropout > 0`` benches the TRAINING path
    (attention-probability dropout: XLA = host-PRNG u16 mask,
    pallas = fused in-kernel PRNG — ops/flash_dropout)."""
    b, h, n, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], shape, dtype)
    k = jax.random.normal(ks[1], shape, dtype)
    v = jax.random.normal(ks[2], shape, dtype)
    rng = ks[3]

    @jax.jit
    def step(q, k, v):
        def loss(q, k, v):
            o = mha(q, k, v, impl=impl, num_special=2,
                    dropout_rate=dropout,
                    dropout_rng=rng if dropout > 0 else None)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return l, grads

    l, g = step(q, k, v)  # compile + warm
    float(l)
    t0 = time.perf_counter()
    for _ in range(iters):
        l, g = step(q, k, v)
    float(l)
    return (time.perf_counter() - t0) / iters * 1e3


def sweep_stream(dtype, iters: int) -> None:
    """Tile-size sweep for the KV-streaming kernel (grid-cell overhead vs
    VMEM pressure) at a mid and a long sequence length."""
    from eavit_tpu.ops import flash_stream

    try:
        for shape in [(64, 8, 785, 64), (16, 8, 3137, 64)]:
            xla_ms = bench_case("xla", shape, dtype, iters)
            print(f"{shape}: xla={xla_ms:.2f}ms", flush=True)
            for bq in (128, 256, 512):
                for bk in (128, 256, 512):
                    flash_stream.set_blocks(bq, bk)
                    try:
                        ms = bench_case("pallas_stream", shape, dtype, iters)
                        print(f"  bq={bq:3d} bk={bk:3d}: {ms:8.2f}ms", flush=True)
                    except Exception as e:
                        print(f"  bq={bq:3d} bk={bk:3d}: {type(e).__name__}",
                              flush=True)
    finally:
        # back to the tuned auto tiling, not a pinned sweep value
        flash_stream.set_blocks(None, None)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--sweep_stream", action="store_true",
                   help="tile-size sweep for the streaming kernel")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="bench the TRAINING path (prob dropout at this "
                        "rate); pallas routes to ops/flash_dropout")
    a = p.parse_args()
    if a.sweep_stream:
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[a.dtype]
        print(f"backend: {jax.default_backend()}  dtype: {a.dtype}")
        sweep_stream(dtype, a.iters)
        return
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[a.dtype]
    print(f"backend: {jax.default_backend()}  dtype: {a.dtype}")
    impls = IMPLS if a.dropout == 0.0 else ["xla", "pallas"]
    for shape in SHAPES:
        if a.dropout > 0.0:
            from eavit_tpu.ops import flash_dropout

            if not flash_dropout.supports(shape[2]):
                # the VMEM guard routes these shapes to XLA — a "pallas"
                # timing here would silently measure XLA vs XLA
                print(f"  (pallas falls back to xla at N={shape[2]}: "
                      "flash_dropout VMEM guard)", flush=True)
        row = {}
        for impl in impls:
            try:
                row[impl] = bench_case(impl, shape, dtype, a.iters,
                                       dropout=a.dropout)
            except Exception as e:  # OOM at big N for the non-streaming paths
                row[impl] = None
                print(f"  ({impl} failed at {shape}: {type(e).__name__})",
                      flush=True)
        ok = {k: v for k, v in row.items() if v is not None}
        best = min(ok, key=ok.get)
        cells = "  ".join(
            f"{k}={v:8.2f}ms" if v is not None else f"{k}=   OOM  "
            for k, v in row.items()
        )
        b, h, n, d = shape
        print(f"B{b:4d} H{h} N{n:5d} D{d}:  {cells}  -> {best}", flush=True)


if __name__ == "__main__":
    main()
