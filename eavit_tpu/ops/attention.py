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

Dual-query shared-KV mode (``num_special > 0``, SURVEY.md §5): the sequence
is laid out as ``[special tokens..., patches...]`` and a static mask
restricts attention so that

- patch rows attend ONLY to patch columns (the shared perception trunk is
  token-independent),
- special-token row ``i`` attends to itself and all patches — NOT to the
  other special tokens.

With two special tokens this computes the exploration-query and the
exploitation-query attention over SHARED patch K/V in a single pass: both
streams cost ``B x (N+2)`` rows instead of the exact stacked mode's
``2B x (N+1)`` — half the attention, qkv, and MLP work of the whole
encoder. (Each token's stream is what a separate ``[token_i, patches]``
sequence would compute under the same patches-don't-read-the-token rule;
see tests/test_dual_query.py for the equivalence oracle.)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def dual_query_allowed(n_rows: int, n_cols: int, num_special: int) -> jnp.ndarray:
    """[n_rows, n_cols] bool mask of allowed attention edges (see module doc)."""
    r = jnp.arange(n_rows)[:, None]
    c = jnp.arange(n_cols)[None, :]
    s = num_special
    patch_patch = (r >= s) & (c >= s)
    token_rows = (r < s) & ((c == r) | (c >= s))
    return patch_patch | token_rows


def mha(
    q: jnp.ndarray,  # [B, H, N, Dh]
    k: jnp.ndarray,  # [B, H, N, Dh]
    v: jnp.ndarray,  # [B, H, N, Dh]
    scale: Optional[float] = None,
    impl: str = "xla",
    num_special: int = 0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Softmax attention ``softmax(q k^T * scale) v`` -> [B, H, N, Dh].

    ``num_special > 0`` applies the dual-query shared-KV mask (module doc).
    ``dropout_rate`` with a ``dropout_rng`` applies attention-PROBABILITY
    dropout (reference vit.py:68): the XLA path thresholds a host-PRNG u16
    mask (`dropout16`), the ``pallas`` path fuses dropout into the flash
    kernel with the on-core PRNG (`ops/flash_dropout`, zero mask HBM
    traffic). The KV-streaming kernel cannot drop individual
    probabilities; its callers apply output dropout instead (documented
    divergence).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "pallas":
        if dropout_rate > 0.0 and dropout_rng is not None:
            from eavit_tpu.ops.flash_dropout import flash_attention_dropout

            return flash_attention_dropout(
                q, k, v, dropout_rng, dropout_rate,
                scale=scale, num_special=num_special,
            )
        from eavit_tpu.ops.flash import flash_attention

        return flash_attention(q, k, v, scale=scale, num_special=num_special)
    if impl == "pallas_stream":
        from eavit_tpu.ops.flash_stream import flash_attention_stream

        return flash_attention_stream(
            q, k, v, scale=scale, num_special=num_special
        )
    if impl != "xla":
        raise ValueError(f"unknown attention impl: {impl!r}")

    dots = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if num_special:
        allowed = dual_query_allowed(q.shape[2], k.shape[2], num_special)
        dots = jnp.where(allowed, dots, _NEG_INF)
    attn = _softmax_cast(dots, v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        attn = dropout16(dropout_rng, attn, dropout_rate)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _softmax_cast(dots: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """``softmax(dots, axis=-1).astype(out_dtype)`` with the RESIDUAL stored
    in ``out_dtype``.

    The stock ``jax.nn.softmax`` VJP saves its f32 output — at the flagship
    minibatch a 636 MB f32[512,8,197,197] tensor per layer, written in fwd
    and re-read in bwd, even though the value path immediately casts the
    probabilities to bf16 for the PV matmul. Since the update is
    HBM-bandwidth-bound (84% of the v5e roofline, BASELINE.md round 3),
    saving the ALREADY-MATERIALIZED bf16 probabilities instead removes that
    f32 tensor entirely. The VJP math ``s * (g - sum(g * s))`` runs with the
    bf16-quantized probabilities upcast to f32 — probability quantization
    error ~2^-8 relative, the same order as the bf16 PV matmul the value
    path already performs.

    Escape hatch (ADVICE r3): set ``EAVIT_SOFTMAX_F32_RESIDUAL=1`` in the
    environment BEFORE the process starts to save the f32 probabilities
    instead — bit-closer gradients for parity debugging, at the reference's
    HBM cost. The flag is read at trace time and is NOT part of any jit
    cache key: toggling ``F32_RESIDUAL`` mid-process silently keeps reusing
    already-compiled executables; call ``jax.clear_caches()`` after any
    in-process toggle (tests do).
    """
    return jax.nn.softmax(dots, axis=-1).astype(out_dtype)


F32_RESIDUAL = os.environ.get("EAVIT_SOFTMAX_F32_RESIDUAL", "0") == "1"


def _softmax_cast_fwd(dots, out_dtype):
    p = jax.nn.softmax(dots, axis=-1)
    s = p.astype(out_dtype)
    return s, (p if F32_RESIDUAL else s)


def _softmax_cast_bwd(out_dtype, s, g):
    sf = s.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    d = sf * (gf - jnp.sum(gf * sf, axis=-1, keepdims=True))
    return (d,)


_softmax_cast.defvjp(_softmax_cast_fwd, _softmax_cast_bwd)


def dropout16(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Elementwise dropout from 16-bit random integers, zero saved residual.

    ``jax.random.bernoulli`` draws 32 random bits per mask element — for the
    flagship minibatch the attention-probability mask alone is a 1.27 GB
    u32[512,8,197,197] tensor whose generation + layout copy + compare
    measured ~20% of the whole PPO/RND update on v5e (round-3 profile).
    Thresholding u16 bits halves every one of those costs. The keep
    probability is quantized to 1/65536 (error <= 2^-17); the inverse-scale
    uses the EXACT quantized probability so the mask is unbiased:
    E[out] = x.

    Two HBM-traffic properties (the update is bandwidth-bound —
    BASELINE.md round-3 roofline):

    - The bits are generated FLAT and reshaped: with an N-D output shape,
      XLA's rng-bit-generator picks a generation-friendly layout
      ({0,1,3,2} on the 4-D attention mask) that mismatches the consumer's
      {2,3,1,0}, inserting a physical transpose of the whole mask tensor —
      3×3.4 ms per flagship minibatch on v5e (round-3 trace,
      copy.583/588/593). A 1-D output has one layout, and the reshape to
      the consumer's standard layout is a bitcast.
    - A custom VJP REGENERATES the bits in the backward pass from the same
      PRNG key instead of saving the keep mask: autodiff of the ``where``
      would otherwise write the bool mask in the forward and re-read it in
      the backward (159 MB per flagship attention mask) — `random.bits` is
      deterministic given the key, so the backward recomputes an identical
      mask for free generation cost instead of a round-trip through HBM.
    """
    thresh = int(round((1.0 - rate) * 65536))
    if thresh >= 65536:
        return x
    return _dropout16_regen(rng, x, thresh)


def _mask16_apply(rng: jax.Array, x: jnp.ndarray, thresh: int) -> jnp.ndarray:
    keep_p = thresh / 65536.0
    bits = jax.random.bits(rng, (x.size,), dtype=jnp.uint16).reshape(x.shape)
    keep = bits < jnp.asarray(thresh, jnp.uint16)
    return jnp.where(keep, x / keep_p, 0.0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout16_regen(rng, x, thresh: int):
    return _mask16_apply(rng, x, thresh)


def _dropout16_regen_fwd(rng, x, thresh: int):
    # residual = the key alone; the mask is NOT saved
    return _mask16_apply(rng, x, thresh), rng


def _dropout16_regen_bwd(thresh: int, rng, g):
    import numpy as np

    # identical key + identical generation shape -> identical mask
    dx = _mask16_apply(rng, g, thresh)
    return (np.zeros(rng.shape, jax.dtypes.float0), dx)


_dropout16_regen.defvjp(_dropout16_regen_fwd, _dropout16_regen_bwd)
