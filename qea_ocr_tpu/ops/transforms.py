"""On-device image transforms.

Counterparts of reference `transform_helper.py`:
  * `AddGaussianNoice` (`transform_helper.py:26-45`) -> `add_gaussian_noise`:
    subtractive gaussian jitter with optional per-image stochastic std,
    vectorized over the batch under jit (the reference loops per image on
    host).
  * `PadWhite` (`transform_helper.py:6-23`) -> host-side resize+pad lives in
    the data layer; `pad_white_array` here handles the pure pad case for
    already-loaded arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("stochastic", "std"))
def add_gaussian_noise(
    key: jax.Array,
    images: jax.Array,
    std: int = 5,
    *,
    stochastic: bool = True,
    noise_coef: float = 1.0,
    mean: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Subtract gaussian noise and clamp to [0, 1].

    Parity with reference semantics: `out = clamp(img - coef * N(mean, std'))`
    where `std' = randint(0, std+1)/100` per image when stochastic else
    `std/100` (`transform_helper.py:33-45`).

    Args:
      images: (B, ...) float batch.
    Returns: (noisy_images, noise) — the reference's `return_noise=True` pair.
    """
    B = images.shape[0]
    k_std, k_noise = jax.random.split(key)
    if stochastic:
        r_std = jax.random.randint(k_std, (B,), 0, std + 1).astype(jnp.float32) / 100.0
    else:
        r_std = jnp.full((B,), float(std) / 100.0, dtype=jnp.float32)
    r_std = r_std + 1e-13  # reference adds an epsilon for std==0
    shape = images.shape
    bshape = (B,) + (1,) * (len(shape) - 1)
    noise = mean + jax.random.normal(k_noise, shape, dtype=jnp.float32) * r_std.reshape(bshape)
    out = jnp.clip(images - noise_coef * noise, 0.0, 1.0)
    return out, noise


def pad_white_array(img: jax.Array, height: int, width: int) -> jax.Array:
    """Center-pad a (H, W) array to (height, width) with white (1.0).

    Images larger than the target must be resized by the host data layer
    first (reference uses PIL `thumbnail`, an aspect-preserving reduction).
    """
    h, w = img.shape
    pad_h = height - h
    pad_w = width - w
    top = pad_h // 2
    left = pad_w // 2
    return jnp.pad(
        img,
        ((top, pad_h - top), (left, pad_w - left)),
        constant_values=1.0,
    )
