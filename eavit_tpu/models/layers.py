"""Shared layers: torch-compatible initializers and the NoisyNet linear.

Weight-init distributions follow the reference so learning curves stay
comparable: torch ``nn.Linear`` defaults are U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for both kernel and bias; heads get orthogonal inits with explicit gains
(reference model.py:249-263).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Initializer = Callable[..., jnp.ndarray]


def torch_linear_kernel_init() -> Initializer:
    """torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal(gain: float) -> Initializer:
    """Orthogonal init (reference uses torch init.orthogonal_).

    flax's orthogonal initializer operates on the 2D kernel [in, out]; torch
    orthogonalizes [out, in] — the two are transposes of each other and both
    yield orthonormal rows/columns, matching statistics either way.
    """
    return nn.initializers.orthogonal(scale=gain)


class Dropout16(nn.Module):
    """Drop-in nn.Dropout replacement using 16-bit random integers.

    flax's Dropout draws 32 random bits per element via bernoulli; at the
    flagship minibatch the MLP/projection masks total multiple GB of u32
    bits per step. This halves the random-bit traffic (see
    ops.attention.dropout16 for the quantization argument: keep-prob error
    <= 2^-17, exact-probability inverse scale, unbiased)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate <= 0.0:
            return x
        from eavit_tpu.ops.attention import dropout16

        return dropout16(self.make_rng("dropout"), x, self.rate)


def make_dense(features: int, *, kernel_gain: float | None = None,
               zero_bias: bool = False, name: str | None = None,
               use_bias: bool = True, dtype: Any = None) -> nn.Dense:
    """Dense layer factory: orthogonal(gain)+zero-bias for heads, torch
    default otherwise."""
    if kernel_gain is not None:
        kinit = orthogonal(kernel_gain)
    else:
        kinit = torch_linear_kernel_init()
    binit = nn.initializers.zeros if zero_bias else torch_linear_kernel_init()
    return nn.Dense(
        features,
        kernel_init=kinit,
        bias_init=binit,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


class NoisyLinear(nn.Module):
    """Gaussian NoisyNet linear layer (reference model.py:21-77).

    ``y = (W + W_noisy * outer(eps_out, eps_in)) x + (b + b_noisy * eps_out)``
    with ``eps ~ N(0, sigma0/sqrt(fan_in))`` resampled every training
    forward via the ``noise`` RNG stream (identical in distribution to the
    reference, which resamples every training forward, model.py:65-67).

    Documented divergence: eval forwards here are NOISE-FREE (only the
    deterministic ``W x + b`` term). The reference applies whatever noise
    buffer was last sampled during training at eval time (model.py:60-72) —
    a stale-buffer artifact of stateful modules, not a design choice; the
    functional build drops it.
    """

    features: int
    sigma0: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        fan_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(fan_in)
        uinit = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -bound, bound
        )
        w = self.param("kernel", uinit, (fan_in, self.features))
        b = self.param("bias", uinit, (self.features,))
        w_noisy = self.param("noisy_kernel", uinit, (fan_in, self.features))
        b_noisy = self.param("noisy_bias", uinit, (self.features,))

        y = x @ w.astype(x.dtype) + b.astype(x.dtype)
        if deterministic:
            return y

        noise_std = self.sigma0 / jnp.sqrt(fan_in)
        key = self.make_rng("noise")
        k_in, k_out = jax.random.split(key)
        eps_in = jax.random.normal(k_in, (fan_in,)) * noise_std
        eps_out = jax.random.normal(k_out, (self.features,)) * noise_std
        noisy_w = w_noisy * jnp.outer(eps_in, eps_out)
        noisy_y = x @ noisy_w.astype(x.dtype) + (b_noisy * eps_out).astype(x.dtype)
        return y + noisy_y
