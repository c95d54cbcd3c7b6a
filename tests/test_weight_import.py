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


# ---------------------------------------------------------------------------
# Authoritative-key-list coverage (SURVEY.md hard-part #1, VERDICT r1 #7):
# the vendored sd15_keys specs enumerate every key of a real SD v1.5
# checkpoint; these tests fail if the importer would drop or mistranspose
# any of them on the FULL-SIZE models.
# ---------------------------------------------------------------------------

from dualdiff_tpu.runner.sd15_keys import (  # noqa: E402
    sd15_clip_keys, sd15_unet_keys, sd15_vae_keys)


def _fake_sd(spec):
    return {k: np.zeros(s, np.float32) for k, s in spec.items()}


def _flat_shapes(tree):
    return {k: tuple(v.shape) for k, v in
            flax.traverse_util.flatten_dict(tree).items()}


@pytest.fixture(scope="module")
def fullsize_trees():
    """Shape-only (eval_shape) param trees of the full-size models."""
    import os

    from dualdiff_tpu.runner.factory import build_models
    from dualdiff_tpu.utils.config import load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        overrides=["+exp=224x400", "runner=debug"])
    models = build_models(cfg, tiny=False)
    k = jax.random.PRNGKey(0)
    unet = jax.eval_shape(
        lambda r: models["unet"].init(
            r, jnp.zeros((6, 28, 50, 4)), jnp.zeros((6,), jnp.int32),
            jnp.zeros((6, 110, 768)), n_cam=6), k)["params"]
    vae = jax.eval_shape(
        lambda r: models["vae"].init(
            r, jnp.zeros((1, 64, 64, 3)), r), k)["params"]
    clip = jax.eval_shape(
        lambda r: models["text_encoder"].init(
            r, jnp.zeros((1, 77), jnp.int32)), k)["params"]
    return unet, vae, clip


def test_sd15_unet_full_key_coverage(fullsize_trees):
    tree, _, _ = fullsize_trees
    base = _flat_shapes(tree)
    imported = flax.traverse_util.flatten_dict(
        import_unet(_fake_sd(sd15_unet_keys())))
    for k, v in imported.items():
        assert k in base, f"importer produced unknown path {k}"
        assert base[k] == tuple(v.shape), \
            f"shape mismatch at {k}: model {base[k]} vs import {v.shape}"
    # everything the import leaves untouched must be a new multiview param
    leftover = [k for k in base if k not in imported]
    assert leftover, "multiview params should not come from SD checkpoints"
    bad = [k for k in leftover if not is_new_multiview_param(k)]
    assert not bad, f"SD-v1.5 params not covered by the importer: {bad[:10]}"


@pytest.mark.parametrize("legacy", [False, True])
def test_sd15_vae_full_key_coverage(fullsize_trees, legacy):
    _, tree, _ = fullsize_trees
    base = _flat_shapes(tree)
    imported = flax.traverse_util.flatten_dict(
        import_vae(_fake_sd(sd15_vae_keys(legacy_attn=legacy))))
    assert set(imported) == set(base), (
        f"missing: {sorted(set(base) - set(imported))[:6]}, "
        f"extra: {sorted(set(imported) - set(base))[:6]}")
    for k, v in imported.items():
        assert base[k] == tuple(v.shape), \
            f"shape mismatch at {k}: model {base[k]} vs import {v.shape}"


def test_sd15_clip_full_key_coverage(fullsize_trees):
    _, _, tree = fullsize_trees
    base = _flat_shapes(tree)
    imported = flax.traverse_util.flatten_dict(
        import_clip_text(_fake_sd(sd15_clip_keys(with_position_ids=True))))
    assert set(imported) == set(base), (
        f"missing: {sorted(set(base) - set(imported))[:6]}, "
        f"extra: {sorted(set(imported) - set(base))[:6]}")
    for k, v in imported.items():
        assert base[k] == tuple(v.shape), f"shape mismatch at {k}"


def test_sd15_clip_keys_match_live_transformers():
    """The vendored CLIP spec must equal the live transformers CLIPTextModel
    state dict (keys AND shapes) — proof the vendoring method is sound."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel as HFCLIPText

    config = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77)
    with torch.device("meta"):
        hf = HFCLIPText(config)
    hf_sd = {k: tuple(v.shape) for k, v in hf.state_dict().items()
             if "position_ids" not in k}
    spec = sd15_clip_keys()
    assert hf_sd == spec
