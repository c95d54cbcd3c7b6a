"""Tone-guidance luminance op (MSCN) — device-side.

Reference ``MultiviewRunner.mscn`` (``multiview_runner.py:597-608``):
RGB -> YUV luma -> GaussianBlur(kernel 17, sigma 17/6).  Used by the
``use_tone_guidance`` loss: mse(mscn(pred image), mscn(gt image)).
Implemented as two separable 1-D convs with reflect padding (the
torchvision GaussianBlur default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mscn_luminance"]

_YUV_Y = np.array([0.299, 0.587, 0.114], np.float32)


def _gaussian_kernel(ksize: int = 17, sigma: float = 17.0 / 6.0) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def mscn_luminance(
    rgb: jnp.ndarray,  # (..., H, W, 3) in [-1, 1]
    ksize: int = 17,
    sigma: float = 17.0 / 6.0,
) -> jnp.ndarray:
    """-> (..., H, W) blurred luma in [0, 1]."""
    x = rgb.astype(jnp.float32) * 0.5 + 0.5
    y = jnp.einsum("...c,c->...", x, jnp.asarray(_YUV_Y))  # (..., H, W)
    lead = y.shape[:-2]
    h, w = y.shape[-2:]
    y = y.reshape(-1, h, w)
    k = jnp.asarray(_gaussian_kernel(ksize, sigma))
    p = ksize // 2
    y = jnp.pad(y, ((0, 0), (p, p), (p, p)), mode="reflect")
    # separable blur: along H then W via conv_general_dilated
    y = jax.lax.conv_general_dilated(
        y[:, None], k.reshape(1, 1, ksize, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        y, k.reshape(1, 1, 1, ksize), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0].reshape(*lead, h, w)
