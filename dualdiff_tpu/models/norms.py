"""Lane-preserving GroupNorm (drop-in for ``flax.linen.GroupNorm``).

Why this exists (measured on TPU v5e, r3): flax's GroupNorm reshapes the
FULL activation tensor to ``(..., groups, C // groups)`` before reducing.
On TPU that is a lane-splitting relayout of the minor-most (lane) dim, so
at image resolution XLA materializes full-size f32 copies plus layout
transposes instead of fusing the stats into the producing conv.  Profiling
the training step attributed 44 ms of a 202 ms step (22%) to the frozen
VAE encoder's ~16 GroupNorm sites for exactly this reason.

The math here is identical (``use_fast_variance`` semantics:
``var = E[x^2] - E[x]^2`` per group) but computed in two lane-preserving
steps:

1. per-CHANNEL moments ``E[x], E[x^2]`` over the spatial axes — a plain
   major-axis reduction XLA fuses into the neighboring conv epilogue;
2. group moments from the tiny ``(B, C)`` partials (channels within a
   group share the spatial element count, so the mean-of-means is exact).

The normalize pass is a per-channel affine ``x * a + b`` applied in
``dtype`` (bf16 in this codebase), with stats and the affine fold kept in
f32 — matching the r3 "bf16 normalize, f32 stats" convention used for the
UNet norms (RESULTS.md).  Parameter names/shapes (``scale``/``bias`` of
``(C,)``) match flax, so checkpoints and the diffusers weight importer
(reference ``magicdrive/runner/multiview_runner.py:146`` loads these
weights via ``from_pretrained``) are unaffected.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis with lane-preserving stats.

    Drop-in for ``nn.GroupNorm(num_groups, epsilon=..., dtype=...)`` on
    inputs shaped ``(B, *spatial, C)`` with ``C % num_groups == 0``.
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        if c % g:
            raise ValueError(f"channels {c} not divisible by groups {g}")
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        spatial = tuple(range(1, x.ndim - 1))
        # per-channel moments: lane-preserving reductions over spatial dims.
        # Reduce the bf16 input directly with f32 accumulation (exact: the
        # bf16->f32 convert is value-preserving) so the f32 cast has ONE
        # consumer (the square) and fuses into that reduce — a shared
        # `x.astype(f32)` made XLA emit every producing conv twice (bf16 +
        # f32 outputs), +50% write traffic at VAE image resolution.
        mu_c = jnp.mean(x, axis=spatial, dtype=jnp.float32)  # (B, C) f32
        m2_c = jnp.mean(jnp.square(x.astype(jnp.float32)),
                        axis=spatial)                        # (B, C) f32
        # combine the tiny partials into per-group stats (exact: equal counts)
        b_ = mu_c.shape[0]
        mu_g = mu_c.reshape(b_, g, c // g).mean(-1)          # (B, G)
        m2_g = m2_c.reshape(b_, g, c // g).mean(-1)
        # clamp like flax's use_fast_variance: E[x^2] - E[x]^2 can cancel
        # to a small NEGATIVE number (bf16 inputs, few spatial elements),
        # and rsqrt(var + eps) of a negative is NaN.  Observed for real on
        # TPU at 32x48 tiny-smoke scale (deep blocks reduce over 2-6
        # elements); XLA:CPU's reduction order happens not to go negative
        # on the same data, which is why only device runs tripped it.
        var_g = jnp.maximum(m2_g - jnp.square(mu_g), 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        # fold group stats + per-channel affine into one (B, C) scale/shift
        inv_c = jnp.repeat(inv_g, c // g, axis=-1)
        mu_bc = jnp.repeat(mu_g, c // g, axis=-1)
        a = inv_c * scale[None]                              # (B, C) f32
        b = bias[None] - mu_bc * a
        bshape = (b_,) + (1,) * (x.ndim - 2) + (c,)
        y = (x.astype(self.dtype) * a.reshape(bshape).astype(self.dtype)
             + b.reshape(bshape).astype(self.dtype))
        return y
