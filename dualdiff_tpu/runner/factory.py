"""Model factory: build the module set from a composed config.

Centralizes what the reference spreads across ``_init_fixed_models`` /
``_init_trainable_models`` (reference ``multiview_runner.py:142-211``) and
``test_utils.build_pipe`` (``misc/test_utils.py:97-171``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp

from ..data.collate import BranchSpec, branch_specs_from_cfg
from ..models.clip_text import CLIPTextModel
from ..models.controlnet import BEVControlNet
from ..models.unet import UNet2DConditionMultiview
from ..models.vae import AutoencoderKL

__all__ = ["build_models", "branch_specs_from_cfg"]


def _dtype(cfg) -> jnp.dtype:
    return {"bf16": jnp.bfloat16, "fp32": jnp.float32,
            "fp16": jnp.float16}[str(cfg.runner.mixed_precision)]


def _remat_min_tokens(cfg, key: str) -> int:
    """Per-network remat threshold, falling back to the shared key.

    The UNet replays an up path under remat while the ControlNet has none,
    so their HBM/replay tradeoffs differ (ADVICE r3); `unet_remat_min_tokens`
    / `controlnet_remat_min_tokens` override the shared `remat_min_tokens`
    when non-null."""
    v = cfg.runner.get(key, None)
    if v is None:
        v = cfg.runner.get("remat_min_tokens", 0)
    return int(v)


def build_models(cfg, tiny: bool = False) -> Dict:
    """-> dict(unet, controlnets: list, vae, text_encoder, specs, dtype).

    ``tiny=True`` shrinks channels for tests/smoke while keeping every
    architectural feature on."""
    dtype = _dtype(cfg)
    specs: List[BranchSpec] = branch_specs_from_cfg(cfg)
    u = cfg.model.unet
    c = cfg.model.controlnet

    if tiny:
        chs, layers, heads, xdim = (32, 64, 64, 64), 1, 4, 96
        cond_chs = (4, 8, 8, 8)
        bbox_proj = (96, 64, 64, 96)
    else:
        chs = tuple(u.block_out_channels)
        layers = int(u.layers_per_block)
        heads = int(u.attention_head_dim)
        xdim = int(u.cross_attention_dim)
        cond_chs = tuple(c.conditioning_embedding_out_channels)
        bbox_proj = tuple(c.bbox_embedder_param.proj_dims)

    pairs = tuple(
        tuple(cfg.dataset.neighboring_view_pair[k])
        for k in sorted(cfg.dataset.neighboring_view_pair))
    video = cfg.get("use_video", False)
    nf = int(cfg.video.num_frames) if video else 1

    unet = UNet2DConditionMultiview(
        block_out_channels=chs,
        layers_per_block=layers,
        heads=heads,
        cross_attention_dim=xdim,
        multiview=True,
        neighboring_view_pair=pairs,
        neighboring_attn_type=str(u.neighboring_attn_type),
        zero_module_type=str(u.zero_module_type),
        st_attn=bool(video and cfg.video.use_st_attn),
        temporal=bool(video and cfg.video.use_temporal_attn),
        num_frames=nf,
        lora_rank=int(cfg.video.lora_rank)
        if (video and cfg.video.rgd.enable) else 0,
        remat=bool(cfg.runner.enable_unet_checkpointing),
        remat_min_tokens=_remat_min_tokens(cfg, "unet_remat_min_tokens"),
        dtype=dtype,
    )

    controlnets = []
    for spec in specs:
        controlnets.append(BEVControlNet(
            block_out_channels=chs,
            layers_per_block=layers,
            heads=heads,
            cross_attention_dim=xdim,
            camera_out_dim=xdim if tiny else int(c.camera_out_dim),
            uncond_cam_in_dim=tuple(c.uncond_cam_in_dim),
            cam_num_freqs=int(c.cam_embedder_param.num_freqs),
            cond_embedder=spec.cond_kind,
            map_channels=int(c.map_size[0]),
            conditioning_embedding_out_channels=cond_chs,
            use_txt_con_fusion=bool(c.use_txt_con_fusion),
            use_txt_con_fusionp=bool(c.use_txt_con_fusionp),
            use_cam_in_temb=bool(c.use_cam_in_temb),
            bbox_mode=str(cfg.model.bbox_mode),
            bbox_num_points=spec.map_vec_points if spec.use_map_vec else None,
            bbox_n_classes=int(c.bbox_embedder_param.n_classes),
            bbox_minmax_normalize=bool(c.bbox_embedder_param.minmax_normalize),
            bbox_proj_dims=bbox_proj,
            bbox_class_token_dim=xdim if tiny else int(
                c.bbox_embedder_param.class_token_dim),
            use_box_adapter=bool(cfg.use_box_adapter),
            remat=bool(cfg.runner.enable_controlnet_checkpointing),
            remat_min_tokens=_remat_min_tokens(
                cfg, "controlnet_remat_min_tokens"),
            dtype=dtype,
        ))

    if tiny:
        vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16),
                            layers_per_block=1, dtype=dtype)
        text = CLIPTextModel(num_layers=2, hidden_size=xdim, num_heads=4,
                             intermediate_size=4 * xdim, dtype=dtype)
    else:
        v = cfg.model.vae
        vae = AutoencoderKL(
            block_out_channels=tuple(v.block_out_channels),
            layers_per_block=int(v.layers_per_block),
            latent_channels=int(v.latent_channels),
            scaling_factor=float(v.scaling_factor),
            dtype=dtype,
        )
        t = cfg.model.text_encoder
        text = CLIPTextModel(
            vocab_size=int(t.vocab_size), hidden_size=int(t.hidden_size),
            num_layers=int(t.num_layers), num_heads=int(t.num_heads),
            max_position_embeddings=int(t.max_position_embeddings),
            intermediate_size=int(t.intermediate_size), dtype=dtype,
        )

    return {
        "unet": unet, "controlnets": controlnets, "vae": vae,
        "text_encoder": text, "specs": specs, "dtype": dtype,
    }
