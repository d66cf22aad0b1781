"""Random Network Distillation predictor/target pair (reference model.py:357-461).

Two variants, selected by ``TrainMethod``:

- ``original_RND``: conv predictor/target over the raw last frame
  [B, 1, 84, 84] — 3 convs (8x8/4, 4x4/2, 3x3/1) + LeakyReLU, flatten
  7*7*64, then predictor MLP 512x3 (ReLU between) vs target single linear.
- ``modified_RND``: MLP predictor/target over backbone embeddings [B, D] —
  64/128/256 LeakyReLU trunk, then the same 512-head split.

All weights orthogonal(sqrt(2))-initialized with zero bias (reference
model.py:445-452). The target is never trained: its params live in a
separate pytree that the optimizer never sees (the functional equivalent of
``requires_grad=False``, reference model.py:454-455).

Intrinsic reward is ``mean((target - predictor)^2, axis=-1)`` over the
feature dim (reference agents.py:210-218).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from eavit_tpu.models.layers import orthogonal

_ortho = orthogonal(float(np.sqrt(2)))
_zeros = nn.initializers.zeros


def _conv(features: int, kernel: int, stride: int, name: str, dtype: Any) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="VALID",
        kernel_init=_ortho,
        bias_init=_zeros,
        dtype=dtype,
        name=name,
    )


def _dense(features: int, name: str, dtype: Any) -> nn.Dense:
    return nn.Dense(
        features, kernel_init=_ortho, bias_init=_zeros, dtype=dtype, name=name
    )


class ConvTrunk(nn.Module):
    """RND conv feature trunk: [B, 1, H, W] -> [B, 7*7*64] at H=W=84."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype or jnp.float32).transpose(0, 2, 3, 1)  # NHWC
        x = nn.leaky_relu(_conv(32, 8, 4, "conv1", self.dtype)(x), 0.01)
        x = nn.leaky_relu(_conv(64, 4, 2, "conv2", self.dtype)(x), 0.01)
        x = nn.leaky_relu(_conv(64, 3, 1, "conv3", self.dtype)(x), 0.01)
        return x.reshape(x.shape[0], -1)


class MlpTrunk(nn.Module):
    """RND MLP feature trunk for embedding inputs: [B, D] -> [B, 256]."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype or jnp.float32)
        x = nn.leaky_relu(_dense(64, "fc1", self.dtype)(x), 0.01)
        x = nn.leaky_relu(_dense(128, "fc2", self.dtype)(x), 0.01)
        x = nn.leaky_relu(_dense(256, "fc3", self.dtype)(x), 0.01)
        return x


class RNDPredictor(nn.Module):
    """Trainable predictor: trunk -> 3-layer 512 MLP head."""

    pixel_input: bool  # True => original_RND conv trunk
    output_size: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        trunk = ConvTrunk(self.dtype) if self.pixel_input else MlpTrunk(self.dtype)
        h = trunk(x)
        h = nn.relu(_dense(self.output_size, "head1", self.dtype)(h))
        h = nn.relu(_dense(self.output_size, "head2", self.dtype)(h))
        return _dense(self.output_size, "head3", self.dtype)(h).astype(jnp.float32)


class RNDTarget(nn.Module):
    """Frozen random target: trunk -> single linear."""

    pixel_input: bool
    output_size: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        trunk = ConvTrunk(self.dtype) if self.pixel_input else MlpTrunk(self.dtype)
        h = trunk(x)
        return _dense(self.output_size, "head", self.dtype)(h).astype(jnp.float32)


def intrinsic_reward(
    target_feat: jnp.ndarray, pred_feat: jnp.ndarray
) -> jnp.ndarray:
    """[B, F] x2 -> [B]; MSE over feature dim (reference agents.py:216)."""
    return jnp.mean(jnp.square(target_feat - pred_feat), axis=-1)


def rnd_loss(
    target_feat: jnp.ndarray,
    pred_feat: jnp.ndarray,
    mask_uniform: jnp.ndarray,  # U[0,1) per sample
    update_proportion: float,
) -> jnp.ndarray:
    """Masked predictor MSE (reference agents.py:331-338).

    Only ~``update_proportion`` of samples contribute; the sum is divided by
    ``max(num_selected, 1)``.
    """
    per_sample = jnp.mean(
        jnp.square(pred_feat - jax.lax.stop_gradient(target_feat)), axis=-1
    )
    mask = (mask_uniform < update_proportion).astype(jnp.float32)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
