"""Batched, jittable image augmentations for the SSL heads.

Replaces the reference's torchvision/kornia pipelines (BYOL.py:19-58,
BarlowTwins.py:89-167) with pure-JAX transforms that run on device inside
the jitted update: RandomResizedCrop, RandomHorizontalFlip(0.5), and
RandomGaussianBlur(3x3, sigma~U(0.1, 2.0)) applied with probability p.

Semantics notes:
- ``same_on_batch=False`` (the shipped configs' default) samples one
  transform per batch element, applied identically across that element's
  stacked frames (kornia treats the stack as channels) — reproduced here.
- ``same_on_batch=True`` broadcasts a single sampled transform to the whole
  batch.
- RandomResizedCrop samples area scale U(0.08, 1) and log-aspect
  U(log 3/4, log 4/3) in one attempt with clamping to the image (torchvision
  retries up to 10x then center-crops; single-attempt sampling is
  distributionally close and keeps the op branch-free for XLA).
- Crop + resize is one fused `jax.image.scale_and_translate` per sample —
  no dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_crop_params(key: jax.Array, n: int, h: int, w: int):
    """Sample (top, left, crop_h, crop_w) per element, float coords."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k_area, (n,), minval=0.08, maxval=1.0)
    log_ratio = jax.random.uniform(
        k_ratio, (n,), minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_ratio)
    crop_w = jnp.clip(jnp.sqrt(area * ratio), 1.0, w)
    crop_h = jnp.clip(jnp.sqrt(area / ratio), 1.0, h)
    top = jax.random.uniform(k_top, (n,)) * (h - crop_h)
    left = jax.random.uniform(k_left, (n,)) * (w - crop_w)
    return top, left, crop_h, crop_w


def random_resized_crop(
    key: jax.Array, imgs: jnp.ndarray, same_on_batch: bool = False
) -> jnp.ndarray:
    """imgs: [B, C, H, W] float -> randomly cropped+resized back to [H, W]."""
    b, c, h, w = imgs.shape
    n = 1 if same_on_batch else b
    top, left, ch, cw = _sample_crop_params(key, n, h, w)
    if same_on_batch:
        top, left, ch, cw = (
            jnp.broadcast_to(v, (b,)) for v in (top, left, ch, cw)
        )

    def one(img, t, l, ch_, cw_):
        scale = jnp.stack([h / ch_, w / cw_])
        translation = jnp.stack([-t * h / ch_, -l * w / cw_])
        return jax.image.scale_and_translate(
            img,
            shape=(c, h, w),
            spatial_dims=(1, 2),
            scale=scale,
            translation=translation,
            method="bilinear",
        )

    return jax.vmap(one)(imgs, top, left, ch, cw)


def random_hflip(
    key: jax.Array, imgs: jnp.ndarray, p: float = 0.5, same_on_batch: bool = False
) -> jnp.ndarray:
    b = imgs.shape[0]
    n = 1 if same_on_batch else b
    flip = jax.random.uniform(key, (n,)) < p
    if same_on_batch:
        flip = jnp.broadcast_to(flip, (b,))
    flipped = imgs[..., ::-1]
    return jnp.where(flip[:, None, None, None], flipped, imgs)


def random_gaussian_blur(
    key: jax.Array,
    imgs: jnp.ndarray,
    p: float = 0.5,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
    same_on_batch: bool = False,
) -> jnp.ndarray:
    """3x3 separable Gaussian blur with per-element sigma, applied w.p. p."""
    b, c, h, w = imgs.shape
    k_p, k_sigma = jax.random.split(key)
    n = 1 if same_on_batch else b
    apply = jax.random.uniform(k_p, (n,)) < p
    sigma = jax.random.uniform(
        k_sigma, (n,), minval=sigma_range[0], maxval=sigma_range[1]
    )
    if same_on_batch:
        apply = jnp.broadcast_to(apply, (b,))
        sigma = jnp.broadcast_to(sigma, (b,))

    # 3-tap kernel [exp(-1/2s^2), 1, exp(-1/2s^2)] normalized, per element
    e = jnp.exp(-0.5 / jnp.square(sigma))  # [B]
    taps = jnp.stack([e, jnp.ones_like(e), e], axis=-1)
    taps = taps / jnp.sum(taps, axis=-1, keepdims=True)  # [B, 3]

    def one(img, t):
        # separable blur along H then W with edge padding (replicate)
        pad_h = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
        blur_h = (
            t[0] * pad_h[:, :-2, :] + t[1] * pad_h[:, 1:-1, :] + t[2] * pad_h[:, 2:, :]
        )
        pad_w = jnp.pad(blur_h, ((0, 0), (0, 0), (1, 1)), mode="edge")
        return (
            t[0] * pad_w[:, :, :-2] + t[1] * pad_w[:, :, 1:-1] + t[2] * pad_w[:, :, 2:]
        )

    blurred = jax.vmap(one)(imgs, taps)
    return jnp.where(apply[:, None, None, None], blurred, imgs)


def ssl_augment(
    key: jax.Array,
    imgs: jnp.ndarray,  # [B, C, H, W] float (already /255)
    blur_p: float,
    same_on_batch: bool = False,
) -> jnp.ndarray:
    """One stochastic view: crop -> hflip -> blur(p)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = random_resized_crop(k1, imgs, same_on_batch)
    x = random_hflip(k2, x, 0.5, same_on_batch)
    return random_gaussian_blur(k3, x, blur_p, (0.1, 2.0), same_on_batch)


def ssl_augment_pair(
    key: jax.Array, imgs: jnp.ndarray, blur_p: float, same_on_batch: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two correlated stochastic views (reference Augment.__call__)."""
    k1, k2 = jax.random.split(key)
    return (
        ssl_augment(k1, imgs, blur_p, same_on_batch),
        ssl_augment(k2, imgs, blur_p, same_on_batch),
    )
