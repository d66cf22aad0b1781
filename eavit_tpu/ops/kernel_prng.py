"""Shared on-core dropout PRNG contract for the fused Pallas kernels.

Both training-path kernels (`ops/flash_dropout`, `ops/fused_ffn`) derive
their dropout masks from the SAME recipe so a fix to the quantization or
seed folding lands once:

- 24-bit keep threshold: keep probability is exactly ``thresh / 2^24``,
  and the inverse-keep scale uses the same quantized probability so the
  estimator stays unbiased (the 16-bit XLA-path variant lives in
  ``ops/attention.dropout16`` — different width, same construction).
- Two int32 seed words from a JAX PRNG key (Mosaic's
  ``pltpu.prng_seed`` accepts at most two words; kernels fold their grid
  cell index into word 0 with deterministic int32 wraparound).
- ``keep_mask_24``: one draw per kernel invocation, immediately after
  seeding, so forward and backward regenerate identical bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def keep_threshold(rate: float) -> int:
    """24-bit keep threshold; keep probability = thresh / 2^24 exactly."""
    return min(1 << 24, int(round((1.0 - rate) * (1 << 24))))


def inv_keep_scale(thresh: int) -> float:
    """Unbiased inverse-keep scale; 0.0 at rate=1.0 (thresh=0: everything
    is dropped, the scale is never applied — guard avoids a
    ZeroDivisionError at trace time)."""
    return float((1 << 24) / thresh) if thresh else 0.0


def keep_mask_24(shape, thresh: int):
    """Draw the keep mask from the seeded on-core PRNG. Call order matters:
    exactly one draw per kernel invocation, immediately after seeding."""
    bits = pltpu.prng_random_bits(shape)  # int32-patterned random bits
    r24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    ).astype(jnp.int32)  # uniform in [0, 2^24)
    return r24 < thresh


def seeds_from_rng(rng: jax.Array) -> jax.Array:
    """Two int32 seed words derived from a JAX PRNG key."""
    return jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (2,), dtype=jnp.uint32), jnp.int32
    )
