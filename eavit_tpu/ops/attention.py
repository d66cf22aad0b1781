"""Multi-head attention op with XLA and fused-Pallas implementations.

This is the hot op of the framework: the dual-token ViT runs both the
exploration-token and exploitation-token sequences through it as one
stacked batch (the reference instead runs the whole encoder twice —
vit_hg.py:322-366, model.py:273-280 — paying 2x kernel launches).

Two implementations behind one interface:

- ``xla``: `jnp.einsum` softmax attention; XLA fuses this well at the
  reference's tiny sequence length (197 tokens).
- ``pallas``: a fused flash-attention kernel (`eavit_tpu.ops.flash`) that
  keeps the whole softmax(QK^T)V in VMEM with no [B, h, N, N] HBM
  materialization; selectable via ``Config.use_pallas_attention``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha(
    q: jnp.ndarray,  # [B, H, N, Dh]
    k: jnp.ndarray,  # [B, H, N, Dh]
    v: jnp.ndarray,  # [B, H, N, Dh]
    scale: Optional[float] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Softmax attention ``softmax(q k^T * scale) v`` -> [B, H, N, Dh]."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas":
        from eavit_tpu.ops.flash import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl != "xla":
        raise ValueError(f"unknown attention impl: {impl!r}")

    dots = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)
