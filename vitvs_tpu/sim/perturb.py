"""Scene-perturbation augmentations as jax image ops.

The reference pre-generates 500 corrupted poster textures with torchvision
RandomErasing(p=0.5) + ColorJitter(0.6, 0.4) + Gaussian noise sigma=0.05
(`generate_perturbed_models.py:28-77`, seed 489) and swaps the Gazebo model
per episode (`manage_gazebo_models`, vitvs_v2.py:1192-1250).  Here the same
augmentation family is a pure function of a PRNG key, applied to the scene
texture on-device — one `vmap` produces all 500 perturbed scenes at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _color_jitter(key: jax.Array, img: jnp.ndarray,
                  brightness: float = 0.6, contrast: float = 0.4) -> jnp.ndarray:
    """torchvision ColorJitter(brightness, contrast) semantics: factors drawn
    U[max(0, 1-b), 1+b] / U[1-c, 1+c], ops applied in random order."""
    kb, kc, korder = jax.random.split(key, 3)
    bf = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    cf = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)

    def apply_brightness(x):
        return jnp.clip(x * bf, 0.0, 1.0)

    def apply_contrast(x):
        gray = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        mean = jnp.mean(gray)
        return jnp.clip((x - mean) * cf + mean, 0.0, 1.0)

    brightness_first = jax.random.bernoulli(korder)
    return jax.lax.cond(
        brightness_first,
        lambda x: apply_contrast(apply_brightness(x)),
        lambda x: apply_brightness(apply_contrast(x)),
        img,
    )


def _random_erase(key: jax.Array, img: jnp.ndarray,
                  p: float = 0.5,
                  scale: tuple[float, float] = (0.02, 0.33),
                  ratio: tuple[float, float] = (0.3, 3.3),
                  value: float = 0.0) -> jnp.ndarray:
    """torchvision RandomErasing: with prob p erase a rectangle whose area
    fraction ~ U[scale] and aspect ~ exp(U[log ratio])."""
    h, w, _ = img.shape
    kp, ka, kr, ky, kx = jax.random.split(key, 5)
    area = jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1]) * h * w
    log_ratio = jax.random.uniform(
        kr, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1, w).astype(jnp.int32)
    # torchvision draws the origin from [0, h - eh] INCLUSIVE (randint there
    # is torch.randint(0, h - eh + 1)): the rectangle can touch the
    # bottom/right edge
    top = jax.random.randint(ky, (), 0, jnp.maximum(h - eh + 1, 1))
    left = jax.random.randint(kx, (), 0, jnp.maximum(w - ew + 1, 1))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inside = (rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew)
    erased = jnp.where(inside[..., None], value, img)
    do_it = jax.random.bernoulli(kp, p)
    return jnp.where(do_it, erased, img)


def perturb_texture(
    key: jax.Array,
    texture: jnp.ndarray,
    noise_sigma: float = 0.05,
    erase_p: float = 0.5,
    brightness: float = 0.6,
    contrast: float = 0.4,
) -> jnp.ndarray:
    """Full perturbation chain: erase -> color jitter -> gaussian noise,
    matching `create_perturbed_model` (generate_perturbed_models.py:36-50)."""
    ke, kj, kn = jax.random.split(key, 3)
    img = _random_erase(ke, texture, p=erase_p)
    img = _color_jitter(kj, img, brightness, contrast)
    noise = jax.random.normal(kn, img.shape) * noise_sigma
    return jnp.clip(img + noise, 0.0, 1.0)
