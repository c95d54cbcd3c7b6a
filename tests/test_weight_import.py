"""Import/export roundtrip: our params <-> diffusers-style state dicts.

Real SD v1.5 assets are unavailable offline; the exporter encodes the known
diffusers naming scheme and the roundtrip pins the importer to it (plus all
transpose conventions)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiff_tpu.models.clip_text import CLIPTextModel
from dualdiff_tpu.models.controlnet import BEVControlNet
from dualdiff_tpu.models.unet import UNet2DConditionMultiview, is_new_multiview_param
from dualdiff_tpu.models.vae import AutoencoderKL
from dualdiff_tpu.runner.weight_import import (
    export_params,
    import_clip_text,
    import_controlnet,
    import_unet,
    import_vae,
    merge_imported,
)

TINY = dict(block_out_channels=(32, 64, 64, 64), layers_per_block=1, heads=4)


def _tree_eq(a, b):
    fa = flax.traverse_util.flatten_dict(a)
    fb = flax.traverse_util.flatten_dict(b)
    assert set(fa) == set(fb), (
        f"missing: {set(fb) - set(fa)}, extra: {set(fa) - set(fb)}")
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=str(k))


def test_unet_roundtrip():
    m = UNet2DConditionMultiview(multiview=True, cross_attention_dim=96, **TINY)
    x = jnp.zeros((6, 8, 16, 4))
    p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((6,), jnp.int32),
               jnp.zeros((6, 10, 96)), n_cam=6)["params"]
    # export only the SD-original subset (what a real ckpt would contain)
    flat = flax.traverse_util.flatten_dict(p)
    sd_subset = flax.traverse_util.unflatten_dict(
        {k: v for k, v in flat.items() if not is_new_multiview_param(k)})
    sd = export_params(sd_subset, "unet")
    assert all("attn4" not in k for k in sd)
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0")
               for k in sd)
    imported = import_unet(sd)
    merged, missing, unexpected = merge_imported(p, imported)
    assert not unexpected
    # only new multiview params missing from the checkpoint
    assert all(is_new_multiview_param(k) for k in missing)
    _tree_eq(merged, p)


def test_controlnet_roundtrip():
    m = BEVControlNet(
        block_out_channels=TINY["block_out_channels"], layers_per_block=1,
        heads=4, cross_attention_dim=96, camera_out_dim=96,
        conditioning_embedding_out_channels=(4, 8, 8, 8),
        cond_embedder="bev_map", use_txt_con_fusion=True,
        bbox_proj_dims=(96, 64, 64, 96), bbox_class_token_dim=96)
    B, N = 1, 6
    boxes = {"bboxes": jnp.zeros((B, N, 5, 8, 3)),
             "classes": jnp.zeros((B, N, 5), jnp.int32),
             "masks": jnp.ones((B, N, 5))}
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((B, N, 8, 16, 4)),
               jnp.zeros((B,), jnp.int32), jnp.ones((B, N, 3, 7)),
               jnp.zeros((B, 10, 96)), jnp.zeros((B, 200, 200, 8)),
               boxes)["params"]
    sd = export_params(p, "controlnet")
    assert "uncond_cam.weight" in sd
    assert "bbox_embedder._class_tokens" in sd
    assert "cam2token.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    imported = import_controlnet(sd)
    merged, missing, unexpected = merge_imported(p, imported)
    assert not missing and not unexpected
    _tree_eq(merged, p)


def test_vae_roundtrip():
    m = AutoencoderKL(block_out_channels=(8, 16, 16, 16), layers_per_block=1)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    sd = export_params(p, "vae")
    assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
    assert "decoder.mid_block.attentions.0.to_q.weight" in sd
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in sd
    assert "quant_conv.weight" in sd
    imported = import_vae(sd)
    merged, missing, unexpected = merge_imported(p, imported)
    assert not missing and not unexpected
    _tree_eq(merged, p)


def test_clip_roundtrip():
    m = CLIPTextModel(num_layers=2)
    ids = jnp.zeros((1, 77), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), ids)["params"]
    sd = export_params(p, "clip")
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_model.final_layer_norm.weight" in sd
    imported = import_clip_text(sd)
    merged, missing, unexpected = merge_imported(p, imported)
    assert not missing and not unexpected
    _tree_eq(merged, p)


def test_conv_transpose_convention():
    # torch OIHW -> flax HWIO and back
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    sd = {"conv_in.weight": w, "conv_in.bias": np.zeros(2, np.float32)}
    tree = import_unet(sd)
    assert tree["conv_in"]["kernel"].shape == (5, 7, 3, 2)
    back = export_params(tree, "unet")
    np.testing.assert_array_equal(back["conv_in.weight"], w)
