"""Conditioning embedders: camera, 3D-bbox, BEV-map, occ-image; SFA fusion.

TPU-native re-designs of (reference citations):
* camera Fourier embedding + cam2token — ``unet_addon_rawbox.py:115,127,308-325``
* ``ContinuousBBoxWithTextEmbedding`` — ``bbox_embedder.py:29-203``
* ``BEVControlNetConditioningEmbedding`` (8ch 200x200 BEV map -> 320 x h/8 x w/8)
  — ``map_embedder.py:10-77``
* ``ControlNetConditioningEmbedding`` (6-view occ-projection panorama RGB)
  — ``map_embedder.py:81-138``
* SFA ``txt_con_XFormersAttn[_plus]`` — ``txt_con_fusion.py:18-337``

All modules are NHWC / token-last and shape-static.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.fourier import fourier_embed, fourier_out_dim

Dtype = Any

# reference bbox_embedder.py:10-11 (only used when minmax_normalize=True)
XYZ_MIN = (-200.0, -300.0, -20.0)
XYZ_RANGE = (350.0, 650.0, 80.0)


def embed_camera_param(camera_param: jnp.ndarray, num_freqs: int = 4) -> jnp.ndarray:
    """(B, N_cam, 3, 7) -> (B, N_cam, 189).

    Each of the 7 matrix columns (3 intrinsics cols + 4 cam2lidar cols) is a
    3-vector, Fourier-embedded to 27 dims, concatenated column-major
    (reference ``unet_addon_rawbox.py:308-325``)."""
    cols = jnp.swapaxes(camera_param, -1, -2)  # (B, N, 7, 3)
    emb = fourier_embed(cols, num_freqs=num_freqs)  # (B, N, 7, 27)
    return emb.reshape(*emb.shape[:-2], -1)


class BBoxEmbedder(nn.Module):
    """3D box corners + class -> 768-d tokens (one per box)."""

    n_classes: int = 10
    class_token_dim: int = 768
    trainable_class_token: bool = False
    embedder_num_freq: int = 4
    proj_dims: Sequence[int] = (768, 512, 512, 768)
    mode: str = "all-xyz"  # 'cxyz' (4 pts) | 'all-xyz' (8 pts) | map-vec 8/40 pts
    num_points: Optional[int] = None  # override (map vectors: 8 or 40)
    minmax_normalize: bool = False
    dtype: Dtype = jnp.float32

    @property
    def n_points(self) -> int:
        if self.num_points is not None:
            return self.num_points
        return {"cxyz": 4, "all-xyz": 8}[self.mode]

    def pos_dim(self) -> int:
        return fourier_out_dim(3, self.embedder_num_freq) * self.n_points

    @nn.compact
    def __call__(
        self,
        bboxes: jnp.ndarray,  # (B', N, n_points, 3)
        classes: jnp.ndarray,  # (B', N) int32, -1 for padding
        masks: Optional[jnp.ndarray] = None,  # (B', N) bool/float
        return_cls: bool = False,
    ) -> jnp.ndarray:
        b, n = classes.shape
        if masks is None:
            masks = jnp.ones((b, n), jnp.float32)
        masks = masks.astype(jnp.float32)[..., None]

        pts = bboxes
        if self.minmax_normalize:
            mins = jnp.asarray(XYZ_MIN)
            rng = jnp.asarray(XYZ_RANGE)
            pts = (pts - mins) / rng
        pos = fourier_embed(pts, num_freqs=self.embedder_num_freq)
        pos = pos.reshape(b, n, -1)

        null_pos = self.param("null_pos_feature", nn.initializers.zeros,
                              (self.pos_dim(),))
        null_cls = self.param("null_class_feature", nn.initializers.zeros,
                              (self.class_token_dim,))
        # class tokens: normally frozen, initialized from CLIP pooled text
        # embeddings of the class names (reference bbox_embedder.py:132-145);
        # set via weight import / prepare().
        class_tokens = self.param(
            "class_tokens", nn.initializers.normal(1.0),
            (self.n_classes, self.class_token_dim))

        pos = pos * masks + null_pos[None, None] * (1.0 - masks)
        cls = class_tokens[jnp.clip(classes, 0, self.n_classes - 1)]
        cls = cls * masks + null_cls[None, None] * (1.0 - masks)
        emb = self._forward_feature(pos.astype(self.dtype),
                                    cls.astype(self.dtype))
        if return_cls:  # raw class tokens for the box adapter (reference
            # bbox_embedder.py:199-203)
            return emb, cls.astype(emb.dtype)
        return emb

    def _forward_feature(self, pos: jnp.ndarray, cls: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.proj_dims[0], dtype=self.dtype, name="bbox_proj")(pos)
        emb = nn.silu(emb)
        emb = jnp.concatenate([emb, cls], axis=-1)
        emb = nn.Dense(self.proj_dims[1], dtype=self.dtype, name="second_linear_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.proj_dims[2], dtype=self.dtype, name="second_linear_2")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.proj_dims[3], dtype=self.dtype, name="second_linear_4")(emb)
        return emb

    # CFG uncond box tokens are produced by calling this module with
    # masks == 0: every token then equals forward_feature(null_pos, null_cls),
    # exactly the reference's add_n_uncond_tokens (bbox_embedder.py:147-153).


class BEVMapConditionEmbedder(nn.Module):
    """(B, 200, 200, C_map) BEV mask -> (B*6, 28, 50, 320); the map feature
    is shared by all 6 views (reference map_embedder.py:67)."""

    conditioning_embedding_channels: int = 320
    block_out_channels: Sequence[int] = (16, 32, 96, 256)
    n_cam: int = 6
    # conv-stack geometry is fixed for 200x200 -> 28x50 (224x400 latents,
    # reference map_embedder.py:27-29); other latent sizes get a bilinear
    # feature resize appended.
    target_hw: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        chs = list(self.block_out_channels)
        x = cond.astype(self.dtype)
        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = nn.silu(x)
        bi = 0
        for i in range(len(chs) - 2):
            x = nn.Conv(chs[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{bi}")(x); bi += 1
            x = nn.silu(x)
            x = nn.Conv(chs[i + 1], (3, 3), strides=(2, 2),
                        padding=((2, 2), (1, 1)), dtype=self.dtype,
                        name=f"blocks_{bi}")(x); bi += 1
            x = nn.silu(x)
        x = nn.Conv(chs[-2], (3, 3), padding=((2, 2), (1, 1)), dtype=self.dtype,
                    name=f"blocks_{bi}")(x); bi += 1
        x = nn.silu(x)
        x = nn.Conv(chs[-1], (3, 3), strides=(2, 1), padding=((2, 2), (1, 1)),
                    dtype=self.dtype, name=f"blocks_{bi}")(x); bi += 1
        x = nn.silu(x)
        x = nn.Conv(self.conditioning_embedding_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv_out")(x)
        if self.target_hw is not None and x.shape[1:3] != tuple(self.target_hw):
            import jax
            x = jax.image.resize(
                x, (x.shape[0], *self.target_hw, x.shape[-1]), "bilinear")
        # repeat per camera: (B, h, w, C) -> (B*n_cam, h, w, C)
        x = jnp.repeat(x, self.n_cam, axis=0)
        return x


class OccImageConditionEmbedder(nn.Module):
    """6-view occ-projection panorama (B, H, 6W, 3) -> (B*6, H/8, W/8, 320)."""

    conditioning_embedding_channels: int = 320
    block_out_channels: Sequence[int] = (16, 32, 96, 256)
    n_cam: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        b, h, w6, c = cond.shape
        w = w6 // self.n_cam
        # split panorama into views: (B, H, 6W, C) -> (B*6, H, W, C)
        x = cond.reshape(b, h, self.n_cam, w, c)
        x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b * self.n_cam, h, w, c)
        x = x.astype(self.dtype)
        chs = list(self.block_out_channels)
        x = nn.Conv(chs[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = nn.silu(x)
        bi = 0
        for i in range(len(chs) - 1):
            x = nn.Conv(chs[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{bi}")(x); bi += 1
            x = nn.silu(x)
            x = nn.Conv(chs[i + 1], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"blocks_{bi}")(x); bi += 1
            x = nn.silu(x)
        x = nn.Conv(self.conditioning_embedding_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="conv_out")(x)
        return x


class SFATxtCon(nn.Module):
    """Semantic Fusion Attention: Q = condition feature map, K/V = text(+cam)
    tokens, residual (reference txt_con_fusion.py:18-181)."""

    con_dim: int = 320
    txt_dim: int = 768
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray, txt: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = cond.shape
        x = cond.reshape(b, h * w, c).astype(self.dtype)
        q = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype, name="to_k")(
            txt.astype(self.dtype))
        v = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype, name="to_v")(
            txt.astype(self.dtype))
        hd = self.con_dim // self.heads
        out = multi_head_attention(
            q.reshape(b, -1, self.heads, hd),
            k.reshape(b, -1, self.heads, hd),
            v.reshape(b, -1, self.heads, hd),
        ).reshape(b, h * w, self.con_dim)
        out = nn.Dense(self.con_dim, dtype=self.dtype, name="to_out_0")(out)
        return cond + out.reshape(b, h, w, c)


class SFATxtConPlus(nn.Module):
    """Two-stage SFA+: occ_q <- attn(occ_q, txt); out <- attn(occ_q', occ_kv)
    (reference txt_con_fusion.py:184-337)."""

    con_dim: int = 320
    txt_dim: int = 768
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray, txt: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = cond.shape
        x = cond.reshape(b, h * w, c).astype(self.dtype)
        txt = txt.astype(self.dtype)
        hd = self.con_dim // self.heads

        def heads_split(t):
            return t.reshape(b, -1, self.heads, hd)

        occ_q = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype,
                         name="to_q_occ")(x)
        occ_k = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype,
                         name="to_k_occ")(x)
        occ_v = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype,
                         name="to_v_occ")(x)
        txt_k = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype,
                         name="to_k_txt")(txt)
        txt_v = nn.Dense(self.con_dim, use_bias=False, dtype=self.dtype,
                         name="to_v_txt")(txt)

        stage1 = multi_head_attention(
            heads_split(occ_q), heads_split(txt_k), heads_split(txt_v))
        out = multi_head_attention(
            stage1, heads_split(occ_k), heads_split(occ_v)
        ).reshape(b, h * w, self.con_dim)
        out = nn.Dense(self.con_dim, dtype=self.dtype, name="to_out_0")(out)
        return cond + out.reshape(b, h, w, c)
