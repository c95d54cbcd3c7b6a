"""SD v1.5 conditional UNet with cross-view (and optional video) attention.

TPU-native re-design of the reference's ``UNet2DConditionModelMultiview``
(reference ``magicdrive/networks/unet_2d_condition_multiview.py:44-527``):
every transformer block carries the multiview attn4 path
(``blocks.py:35-238``), residuals from the ControlNet branch(es) are added to
the skip connections (``unet_2d_condition_multiview.py:464-488``).

Layout: NHWC; the leading batch dim folds ``(batch, cam[, frame])`` with
frame innermost.  Everything static-shaped; jit/pjit friendly.  Static
per-trace info (``n_cam``, upsample targets) travels as module attributes so
blocks can be wrapped in ``nn.remat`` (gradient checkpointing, the
``enable_unet_checkpointing`` / ``enable_controlnet_checkpointing`` flags,
reference ``unet_2d_condition_multiview.py:273-292``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .norms import GroupNorm

from .layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    get_timestep_embedding,
)

Dtype = Any


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    heads: int = 8
    cross_attention_dim: int = 768
    n_cam: int = 1
    multiview: bool = False
    neighboring_view_pair: Optional[Tuple[Tuple[int, ...], ...]] = None
    neighboring_attn_type: str = "add"
    zero_module_type: str = "zero_linear"
    st_attn: bool = False
    temporal: bool = False
    num_frames: int = 1
    box_adapter: bool = False
    num_box_tokens: int = 0
    lora_rank: int = 0
    dtype: Dtype = jnp.float32

    def _tx(self, i):
        return Transformer2DModel(
            self.out_channels, heads=self.heads,
            cross_attention_dim=self.cross_attention_dim, n_cam=self.n_cam,
            multiview=self.multiview,
            neighboring_view_pair=self.neighboring_view_pair,
            neighboring_attn_type=self.neighboring_attn_type,
            zero_module_type=self.zero_module_type,
            st_attn=self.st_attn, temporal=self.temporal,
            num_frames=self.num_frames, box_adapter=self.box_adapter,
            num_box_tokens=self.num_box_tokens, lora_rank=self.lora_rank,
            dtype=self.dtype,
            name=f"attentions_{i}")

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states):
        res = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            x = self._tx(i)(x, encoder_hidden_states)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res.append(x)
        return x, tuple(res)


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        res = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res.append(x)
        return x, tuple(res)


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    heads: int = 8
    cross_attention_dim: int = 768
    n_cam: int = 1
    multiview: bool = False
    neighboring_view_pair: Optional[Tuple[Tuple[int, ...], ...]] = None
    neighboring_attn_type: str = "add"
    zero_module_type: str = "zero_linear"
    st_attn: bool = False
    temporal: bool = False
    num_frames: int = 1
    box_adapter: bool = False
    num_box_tokens: int = 0
    lora_rank: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, encoder_hidden_states):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(
            self.channels, heads=self.heads,
            cross_attention_dim=self.cross_attention_dim, n_cam=self.n_cam,
            multiview=self.multiview,
            neighboring_view_pair=self.neighboring_view_pair,
            neighboring_attn_type=self.neighboring_attn_type,
            zero_module_type=self.zero_module_type,
            st_attn=self.st_attn, temporal=self.temporal,
            num_frames=self.num_frames, box_adapter=self.box_adapter,
            num_box_tokens=self.num_box_tokens, lora_rank=self.lora_rank,
            dtype=self.dtype,
            name="attentions_0",
        )(x, encoder_hidden_states)
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    upsample_target: Optional[Tuple[int, int]] = None  # None: no upsample
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, self.upsample_target)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    upsample_target: Optional[Tuple[int, int]] = None
    add_upsample: bool = True
    heads: int = 8
    cross_attention_dim: int = 768
    n_cam: int = 1
    multiview: bool = False
    neighboring_view_pair: Optional[Tuple[Tuple[int, ...], ...]] = None
    neighboring_attn_type: str = "add"
    zero_module_type: str = "zero_linear"
    st_attn: bool = False
    temporal: bool = False
    num_frames: int = 1
    box_adapter: bool = False
    num_box_tokens: int = 0
    lora_rank: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, encoder_hidden_states):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                self.out_channels, heads=self.heads,
                cross_attention_dim=self.cross_attention_dim, n_cam=self.n_cam,
                multiview=self.multiview,
                neighboring_view_pair=self.neighboring_view_pair,
                neighboring_attn_type=self.neighboring_attn_type,
                zero_module_type=self.zero_module_type,
                st_attn=self.st_attn, temporal=self.temporal,
                num_frames=self.num_frames, box_adapter=self.box_adapter,
                num_box_tokens=self.num_box_tokens, lora_rank=self.lora_rank,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, encoder_hidden_states)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, self.upsample_target)
        return x


class UNet2DConditionMultiview(nn.Module):
    """SD v1.5 UNet; transformer blocks are multiview when configured.

    ``trainable_state='only_new'`` (reference semantics) is implemented in
    the trainer by masking gradients to parameter paths containing
    ``attn4 / norm4 / connector / temporal`` — the module itself is a pure
    function of all params.
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: int = 8
    cross_attention_dim: int = 768
    multiview: bool = True
    neighboring_view_pair: Optional[Tuple[Tuple[int, ...], ...]] = (
        (5, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 0))
    neighboring_attn_type: str = "add"
    zero_module_type: str = "zero_linear"
    st_attn: bool = False
    temporal: bool = False
    num_frames: int = 1
    lora_rank: int = 0  # RGD stage-2 LoRA fine-tuning
    remat: bool = False  # gradient checkpointing per block
    # Skip remat for blocks whose spatial token count is below this: deep
    # low-res activations are small (positions shrink 4x per level while
    # channels only double), so storing them costs little HBM but saving
    # them skips that block's full forward replay in the backward pass.
    # 0 = remat every block (the always-fits default).
    remat_min_tokens: int = 0
    dtype: Dtype = jnp.float32

    def _tx_kwargs(self, n_cam: int):
        return dict(
            heads=self.heads, cross_attention_dim=self.cross_attention_dim,
            n_cam=n_cam, multiview=self.multiview,
            neighboring_view_pair=self.neighboring_view_pair,
            neighboring_attn_type=self.neighboring_attn_type,
            zero_module_type=self.zero_module_type,
            st_attn=self.st_attn, temporal=self.temporal,
            num_frames=self.num_frames, lora_rank=self.lora_rank,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B', H/8, W/8, 4)
        timesteps: jnp.ndarray,  # (B',)
        encoder_hidden_states: jnp.ndarray,  # (B', L, 768)
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        n_cam: int = 6,
    ) -> jnp.ndarray:
        chs = list(self.block_out_channels)
        tx = self._tx_kwargs(n_cam)
        def rm(cls, tokens):
            if self.remat and tokens >= self.remat_min_tokens:
                return nn.remat(cls, prevent_cse=False)
            return cls

        t_emb = get_timestep_embedding(timesteps, chs[0])
        temb = TimestepEmbedding(chs[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(t_emb)

        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        res_stack = [x]

        # down
        for i, ch in enumerate(chs):
            is_final = i == len(chs) - 1
            tok = x.shape[1] * x.shape[2]
            if not is_final:
                x, res = rm(CrossAttnDownBlock2D, tok)(
                    ch, num_layers=self.layers_per_block, add_downsample=True,
                    **tx, name=f"down_blocks_{i}",
                )(x, temb, encoder_hidden_states)
            else:
                x, res = rm(DownBlock2D, tok)(
                    ch, num_layers=self.layers_per_block, add_downsample=False,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(x, temb)
            res_stack += list(res)
            # per-block feature capture (tools/explore_unet.py; no-op
            # unless apply() runs with mutable=["intermediates"])
            self.sow("intermediates", f"down_block_{i}_out", x)

        if down_block_additional_residuals is not None:
            res_stack = [
                r + a.astype(r.dtype)
                for r, a in zip(res_stack, down_block_additional_residuals)
            ]

        # mid
        x = rm(UNetMidBlock2DCrossAttn, x.shape[1] * x.shape[2])(
            chs[-1], **tx, name="mid_block")(
            x, temb, encoder_hidden_states)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(x.dtype)
        self.sow("intermediates", "mid_block_out", x)

        # up
        rev = list(reversed(chs))  # [1280, 1280, 640, 320]
        n_lay = self.layers_per_block + 1
        for i, ch in enumerate(rev):
            is_final = i == len(rev) - 1
            skips = tuple(res_stack[-n_lay:][::-1])
            del res_stack[-n_lay:]
            target = res_stack[-1].shape[1:3] if res_stack else None
            tok = x.shape[1] * x.shape[2]
            if i == 0:
                x = rm(UpBlock2D, tok)(
                    ch, num_layers=n_lay, upsample_target=target,
                    add_upsample=not is_final, dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, skips, temb)
            else:
                x = rm(CrossAttnUpBlock2D, tok)(
                    ch, num_layers=n_lay, upsample_target=target,
                    add_upsample=not is_final, **tx,
                    name=f"up_blocks_{i}",
                )(x, skips, temb, encoder_hidden_states)
            self.sow("intermediates", f"up_block_{i}_out", x)

        x = GroupNorm(min(32, x.shape[-1]), epsilon=1e-5, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x


NEW_PARAM_MARKERS = ("attn4", "norm4", "connector", "temporal",
                     "attn_temporal", "lora")


def is_new_multiview_param(path: Tuple[str, ...]) -> bool:
    """True for params introduced by the multiview/video surgery — the set
    trained under ``trainable_state='only_new'`` (reference
    ``unet_2d_condition_multiview.py:237-252``) plus the RGD stage-2 LoRA
    adapters (absent from SD checkpoints; configs with ``only_new`` have
    lora_rank=0, so the marker never widens that trainable set)."""
    return any(any(m in part for m in NEW_PARAM_MARKERS) for part in path)
