"""AutoencoderKL (SD v1.5 VAE) in Flax, NHWC.

Frozen in the reference (loaded via diffusers, ``multiview_runner.py:146``);
here a first-class Flax module so encode (training) and decode (generation)
run inside the same jit program as the UNet.  Architecture follows the SD
v1.5 ``vae/config.json`` (block_out_channels 128/256/512/512, 2 layers per
encoder block, 3 per decoder block, mid-block single-head attention,
GroupNorm eps 1e-6, scaling_factor 0.18215).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .norms import GroupNorm

Dtype = Any

SD_VAE_SCALING = 0.18215


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g = min(32, in_ch)
        h = GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm(min(32, self.out_channels), epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head spatial self-attention (diffusers ``Attention`` in VAE)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = GroupNorm(min(32, c), epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(v.dtype)
        y = jnp.einsum("bqk,bkc->bqc", probs, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return res + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        chs = list(self.block_out_channels)
        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                x = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(chs) - 1:
                # diffusers uses asymmetric (0,1) padding before the
                # stride-2 conv; express it as the conv's own padding config
                # so XLA folds it into the convolution instead of
                # materializing a padded image-resolution copy (a separate
                # jnp.pad showed up as ~15ms of f32 layout copies in the
                # train-step trace).
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)),
                            dtype=self.dtype,
                            name=f"down_blocks_{i}_downsamplers_0")(x)
        x = VAEResnetBlock(chs[-1], dtype=self.dtype, name="mid_resnets_0")(x)
        x = VAEAttentionBlock(chs[-1], dtype=self.dtype, name="mid_attn")(x)
        x = VAEResnetBlock(chs[-1], dtype=self.dtype, name="mid_resnets_1")(x)
        x = GroupNorm(min(32, x.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        chs = list(reversed(self.block_out_channels))  # [512, 512, 256, 128]
        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        x = VAEResnetBlock(chs[0], dtype=self.dtype, name="mid_resnets_0")(x)
        x = VAEAttentionBlock(chs[0], dtype=self.dtype, name="mid_attn")(x)
        x = VAEResnetBlock(chs[0], dtype=self.dtype, name="mid_resnets_1")(x)
        for i, ch in enumerate(chs):
            for j in range(self.layers_per_block):
                x = VAEResnetBlock(ch, dtype=self.dtype,
                                   name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(chs) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0")(x)
        x = GroupNorm(min(32, x.shape[-1]), epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = SD_VAE_SCALING
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block,
            self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block + 1,
            3, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, 8) mean||logvar."""
        return self.quant_conv(self.encoder(x))

    def encode(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Sample the posterior and apply the SD scaling factor."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return z * self.scaling_factor

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        mean, _ = jnp.split(self.encode_moments(x), 2, axis=-1)
        return mean * self.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latents (scaled) -> image in [-1, 1]."""
        z = z / self.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.decode(self.encode(x, rng))
