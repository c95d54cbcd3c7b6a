"""NeRF-style Fourier feature embedding + SD sinusoidal timestep embedding.

Matches the reference semantics exactly (reference
``magicdrive/networks/embedder.py:5-54``): output layout is
``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` concatenated on
the last axis, so ``out_dim = d * (1 + 2 * num_freqs)`` (camera: d=3,
num_freqs=4 -> 27; per-camera 3x7 params -> 189, see reference
``configs/model/SDv1.5mv_rawbox.yaml:27-29``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["fourier_embed", "fourier_out_dim", "timestep_embedding"]


def fourier_out_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * num_freqs)


def fourier_embed(
    x: jnp.ndarray,
    num_freqs: int = 4,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Embed the last axis. ``(..., d) -> (..., d * (1 + 2*num_freqs))``."""
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)
    outs = [x] if include_input else []
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics, used
    by both the UNet and the ControlNet time towers; SD v1.5 uses
    flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[..., None] * emb[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)
