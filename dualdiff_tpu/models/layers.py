"""Flax building blocks for the SD v1.5 UNet / ControlNet family.

TPU-first design notes:
* NHWC layout everywhere (XLA's native conv layout on TPU).
* Compute dtype (bf16 by default) is threaded via the ``dtype`` attribute;
  params stay fp32.  GroupNorm/softmax accumulate in fp32.
* Attention heads are fixed at 8 with head_dim = channels // 8 (diffusers
  SD v1.5 semantics: ``attention_head_dim=8`` is the head *count*).

Functional parity targets (semantics, not code): diffusers
``ResnetBlock2D``/``Transformer2DModel``/``BasicTransformerBlock`` as used by
the reference's UNet and BEVControlNet (reference
``magicdrive/networks/unet_addon_rawbox.py:217-295``,
``magicdrive/networks/blocks.py:35-238``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (attention_packed, attention_packed_neighbors,
                             multi_head_attention)
from ..ops.fourier import timestep_embedding
from .norms import GroupNorm

Dtype = Any


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear (diffusers ``TimestepEmbedding``)."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        # GN stays on XLA: it fuses conv + GN-stats + normalize + silu into
        # single deep fusions at these shapes; an opaque pallas GN kernel
        # breaks those chains and measured NET SLOWER end-to-end (r2:
        # 1.417 vs 1.371 s/frame) despite a fast kernel — see RESULTS.md
        g = min(self.groups, in_ch)
        h = GroupNorm(g, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb.astype(self.dtype)))
        h = h + t[:, None, None, :]
        h = GroupNorm(min(self.groups, self.out_channels), epsilon=self.eps,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 target_hw: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """Nearest 2x (or to ``target_hw`` — needed when the encoder produced
        odd spatial dims, diffusers' ``forward_upsample_size``)."""
        b, h, w, c = x.shape
        th, tw = target_hw if target_hw is not None else (h * 2, w * 2)
        x = jax.image.resize(x, (b, th, tw, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class Attention(nn.Module):
    """Multi-head attention with separate q/kv dims (diffusers ``Attention``).

    With ``box_adapter`` on (IP-Adapter-style decoupled cross-attn, reference
    ``box_adapter.py:177-396``): KV splits into [txt | box | cls] token
    groups; box K/V are enriched by attending to cls K/V, and the box
    attention output is added (scaled) to the text attention output."""

    query_dim: int
    heads: int = 8
    kv_dim: Optional[int] = None
    out_bias: bool = True
    box_adapter: bool = False
    num_box_tokens: int = 0
    box_scale: float = 1.0
    lora_rank: int = 0  # LoRA adapters on q/k/v/out (RGD stage-2 fine-tuning)
    dtype: Dtype = jnp.float32

    def _proj(self, name: str, x: jnp.ndarray, inner: int,
              use_bias: bool = False) -> jnp.ndarray:
        out = nn.Dense(inner, use_bias=use_bias, dtype=self.dtype,
                       name=name)(x)
        if self.lora_rank > 0:
            a = nn.Dense(self.lora_rank, use_bias=False, dtype=self.dtype,
                         name=f"{name}_lora_a")(x)
            delta = nn.Dense(inner, use_bias=False,
                             kernel_init=nn.initializers.zeros,
                             dtype=self.dtype, name=f"{name}_lora_b")(a)
            out = out + delta
        return out

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ring_views: int = 0,
    ) -> jnp.ndarray:
        kv = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        inner = self.query_dim
        head_dim = inner // self.heads
        b, lq = hidden_states.shape[:2]

        def heads_split(t):
            return t.reshape(b, -1, self.heads, head_dim)

        if ring_views:
            # attn4 camera-ring mode: hidden_states folds (batch, view); the
            # op sums attention against the left/right neighbor views, with
            # neighbor selection fused into the kernel (ops/attention.py::
            # attention_packed_neighbors) — K/V projections run ONCE per
            # view instead of once per stacked neighbor copy
            q = self._proj("to_q", hidden_states, inner)
            k = self._proj("to_k", hidden_states, inner)
            v = self._proj("to_v", hidden_states, inner)
            out = attention_packed_neighbors(q, k, v, self.heads, ring_views)
            return self._proj("to_out_0", out, inner, use_bias=self.out_bias)

        use_adapter = (self.box_adapter and self.num_box_tokens > 0
                       and encoder_hidden_states is not None)
        if use_adapter:
            n = self.num_box_tokens
            end = kv.shape[1] - n
            kv, cls_tok = kv[:, :end], kv[:, end:]
            end = kv.shape[1] - n
            kv, box_tok = kv[:, :end], kv[:, end:]

        q = self._proj("to_q", hidden_states, inner)
        k = self._proj("to_k", kv, inner)
        v = self._proj("to_v", kv, inner)
        if self.is_mutable_collection("intermediates"):
            # introspection path (reference explore pipeline /
            # tools/unet_modify.py:7-57): expose attention probabilities via
            # apply(..., mutable=["intermediates"])
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", heads_split(q), heads_split(k),
                preferred_element_type=jnp.float32) * (head_dim ** -0.5)
            probs = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", "attn_probs", probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype),
                             heads_split(v)).reshape(b, lq, inner)
        else:
            # channel-packed: no head split/merge relayouts on the flash path
            out = attention_packed(q, k, v, self.heads)

        if use_adapter:
            bk = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                          name="to_k_box")(box_tok)
            bv = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                          name="to_v_box")(box_tok)
            ck = heads_split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      name="to_k_cls")(cls_tok))
            cv = heads_split(nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      name="to_v_cls")(cls_tok))
            bk = heads_split(bk)
            bv = heads_split(bv)
            # enrich box K/V by attending to class K/V (reference :357-365)
            bk = bk + multi_head_attention(bk, ck, cv)
            bv = bv + multi_head_attention(bv, ck, cv)
            box_out = multi_head_attention(
                heads_split(q), bk, bv).reshape(b, lq, inner)
            out = out + self.box_scale * box_out

        return self._proj("to_out_0", out, inner, use_bias=self.out_bias)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate.astype(jnp.float32)).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class GatedConnector(nn.Module):
    """tanh(alpha) * x with zero-init alpha (reference blocks.py:24-32)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (self.dim,))
        return jnp.tanh(alpha).astype(self.dtype) * x


def _ln(name: str, dtype=jnp.float32):
    # stats stay f32 inside flax regardless of dtype (force_float32_reductions);
    # bf16 dtype only moves the normalize/affine pass to half precision
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> FF, with optional cross-view attn4 and
    optional video hooks (ST-Attn kv override on attn1, temporal attn).

    Cross-view semantics follow reference ``blocks.py:144-238``: attn4 runs
    per camera against its static neighbor ring, outputs summed over
    neighbors and gated through a zero-init connector.
    """

    dim: int
    heads: int = 8
    cross_attention_dim: int = 768
    n_cam: int = 1
    # multiview
    multiview: bool = False
    neighboring_view_pair: Optional[Tuple[Tuple[int, ...], ...]] = None
    neighboring_attn_type: str = "add"
    zero_module_type: str = "zero_linear"
    # video
    st_attn: bool = False
    temporal: bool = False
    num_frames: int = 1
    # box adapter (controlnet-only, reference box_adapter.py:414-444)
    box_adapter: bool = False
    num_box_tokens: int = 0
    lora_rank: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B', L, D) where B' folds batch/cam/frame
        encoder_hidden_states: jnp.ndarray,  # (B', L_kv, D_kv)
    ) -> jnp.ndarray:
        d = self.dim
        # 1. self attention (ST-Attn replaces KV with [first; prev] frames)
        norm_h = _ln("norm1", self.dtype)(hidden_states).astype(self.dtype)
        if self.st_attn and self.num_frames > 1:
            kv = self._st_attn_kv(norm_h)
        else:
            kv = None
        attn_out = Attention(d, self.heads, lora_rank=self.lora_rank,
                             dtype=self.dtype, name="attn1")(norm_h, kv)
        hidden_states = hidden_states + attn_out

        # 2. text cross attention
        norm_h = _ln("norm2", self.dtype)(hidden_states).astype(self.dtype)
        attn_out = Attention(
            d, self.heads, box_adapter=self.box_adapter,
            num_box_tokens=self.num_box_tokens, lora_rank=self.lora_rank,
            dtype=self.dtype,
            name="attn2")(norm_h, encoder_hidden_states.astype(self.dtype))
        hidden_states = hidden_states + attn_out

        # 2.5 multiview cross attention (attn4)
        if self.multiview:
            norm_h = _ln("norm4", self.dtype)(hidden_states).astype(self.dtype)
            attn_out = self._multiview_attn(norm_h, self.n_cam)
            if self.zero_module_type == "zero_linear":
                attn_out = nn.Dense(
                    d, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="connector")(attn_out)
            elif self.zero_module_type == "gated":
                attn_out = GatedConnector(d, dtype=self.dtype,
                                          name="connector")(attn_out)
            elif self.zero_module_type != "none":
                raise ValueError(self.zero_module_type)
            hidden_states = hidden_states + attn_out

        # 2.75 temporal attention (video): attend over the frame axis
        if self.temporal and self.num_frames > 1:
            norm_h = _ln("norm_temporal", self.dtype)(hidden_states).astype(self.dtype)
            attn_out = self._temporal_attn(norm_h)
            attn_out = nn.Dense(
                d, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="temporal_connector")(attn_out)
            hidden_states = hidden_states + attn_out

        # 3. feed forward
        norm_h = _ln("norm3", self.dtype)(hidden_states).astype(self.dtype)
        hidden_states = hidden_states + GEGLUFeedForward(
            d, dtype=self.dtype, name="ff")(norm_h)
        return hidden_states

    # -- helpers -----------------------------------------------------------
    def _multiview_attn(self, norm_h: jnp.ndarray, n_cam: int) -> jnp.ndarray:
        bn, l, d = norm_h.shape
        b = bn // n_cam
        h = norm_h.reshape(b, n_cam, l, d)
        pairs = self.neighboring_view_pair
        attn4 = Attention(d, self.heads, dtype=self.dtype, name="attn4")

        if self.neighboring_attn_type == "self":
            out = attn4(h.reshape(b, n_cam * l, d), None)
            return out.reshape(bn, l, d)

        ring = all(tuple(pairs[i]) == ((i - 1) % n_cam, (i + 1) % n_cam)
                   for i in range(n_cam))
        if (self.neighboring_attn_type == "add" and ring
                and not self.is_mutable_collection("intermediates")):
            # camera-ring neighbors: fused kernel path (no kv gather/stack;
            # explore/sow mode keeps the explicit formulation below)
            return attn4(norm_h, None, ring_views=n_cam)

        left = np.array([pairs[i][0] for i in range(n_cam)])
        right = np.array([pairs[i][1] for i in range(n_cam)])
        kv_left = jnp.take(h, left, axis=1).reshape(bn, l, d)
        kv_right = jnp.take(h, right, axis=1).reshape(bn, l, d)
        q = h.reshape(bn, l, d)
        if self.neighboring_attn_type == "add":
            # sum of per-neighbor attention outputs (reference blocks.py:
            # 209-217), computed as ONE batched attention over the stacked
            # neighbor axis — halves kernel launches on TPU
            q2 = jnp.concatenate([q, q], axis=0)
            kv2 = jnp.concatenate([kv_left, kv_right], axis=0)
            out2 = attn4(q2, kv2)
            out = out2[:bn] + out2[bn:]
        elif self.neighboring_attn_type == "concat":
            out = attn4(q, jnp.concatenate([kv_left, kv_right], axis=1))
        else:
            raise ValueError(self.neighboring_attn_type)
        return out

    def _st_attn_kv(self, norm_h: jnp.ndarray) -> jnp.ndarray:
        """ST-Attn: self-attn KV = concat(first frame, previous frame) of the
        same view (DualDiff+ stage 1, designed from arXiv 2503.03689; no
        reference code exists).

        Layout contract: leading dim folds (batch, frame, cam) — frame outer,
        cam inner — matching the ControlNet's (b f) batch output order."""
        bfn, l, d = norm_h.shape
        f, n = self.num_frames, self.n_cam
        h = norm_h.reshape(bfn // (f * n), f, n, l, d)
        first = jnp.broadcast_to(h[:, :1], h.shape)
        prev = jnp.concatenate([h[:, :1], h[:, :-1]], axis=1)
        kv = jnp.concatenate([first, prev], axis=3)  # (b, f, n, 2l, d)
        return kv.reshape(bfn, 2 * l, d)

    def _temporal_attn(self, norm_h: jnp.ndarray) -> jnp.ndarray:
        """Per-(view, pixel) attention over the frame axis."""
        bfn, l, d = norm_h.shape
        f, n = self.num_frames, self.n_cam
        b = bfn // (f * n)
        h = norm_h.reshape(b, f, n, l, d)
        h = jnp.transpose(h, (0, 2, 3, 1, 4)).reshape(-1, f, d)  # (b*n*l, f, d)
        out = Attention(d, self.heads, dtype=self.dtype, name="attn_temporal")(
            h, None
        )
        out = out.reshape(b, n, l, f, d)
        return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(bfn, l, d)


class Transformer2DModel(nn.Module):
    """GroupNorm -> 1x1 conv in -> transformer block(s) -> 1x1 conv out + res."""

    in_channels: int
    heads: int = 8
    cross_attention_dim: int = 768
    num_layers: int = 1
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
    def __call__(
        self,
        x: jnp.ndarray,  # (B', H, W, C)
        encoder_hidden_states: jnp.ndarray,
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        hs = GroupNorm(min(32, c), epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        hs = hs.astype(self.dtype)
        hs = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name="proj_in")(hs)
        hs = hs.reshape(b, h * w, c)
        for i in range(self.num_layers):
            hs = BasicTransformerBlock(
                dim=self.in_channels,
                heads=self.heads,
                cross_attention_dim=self.cross_attention_dim,
                n_cam=self.n_cam,
                multiview=self.multiview,
                neighboring_view_pair=self.neighboring_view_pair,
                neighboring_attn_type=self.neighboring_attn_type,
                zero_module_type=self.zero_module_type,
                st_attn=self.st_attn,
                temporal=self.temporal,
                num_frames=self.num_frames,
                box_adapter=self.box_adapter,
                num_box_tokens=self.num_box_tokens,
                lora_rank=self.lora_rank,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(hs, encoder_hidden_states)
        hs = hs.reshape(b, h, w, c)
        hs = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name="proj_out")(hs)
        return hs + residual


def get_timestep_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """SD v1.5 sinusoidal proj (flip_sin_to_cos=True, shift=0)."""
    return timestep_embedding(timesteps, dim, flip_sin_to_cos=True)
