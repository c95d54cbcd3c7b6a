import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiff_tpu.models.clip_text import CLIPTextModel
from dualdiff_tpu.models.controlnet import BEVControlNet
from dualdiff_tpu.models.embedders import (
    BBoxEmbedder,
    BEVMapConditionEmbedder,
    OccImageConditionEmbedder,
    SFATxtCon,
    embed_camera_param,
)
from dualdiff_tpu.models.unet import UNet2DConditionMultiview, is_new_multiview_param
from dualdiff_tpu.models.vae import AutoencoderKL

# tiny configs: keep CPU test runtime sane while exercising every code path
TINY = dict(block_out_channels=(32, 64, 64, 64), layers_per_block=1, heads=4)
N_CAM = 6
H, W = 8, 16  # latent resolution


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_camera_embedding_shape():
    cam = jnp.ones((2, N_CAM, 3, 7))
    emb = embed_camera_param(cam)
    assert emb.shape == (2, N_CAM, 189)


def test_bbox_embedder_null_masks(keys):
    m = BBoxEmbedder()
    boxes = jax.random.normal(keys[0], (2, 5, 8, 3))
    classes = jnp.zeros((2, 5), jnp.int32)
    params = m.init(keys[1], boxes, classes, jnp.ones((2, 5)))
    out = m.apply(params, boxes, classes, jnp.ones((2, 5)))
    assert out.shape == (2, 5, 768)
    # masked rows must equal the null token (independent of box content)
    out0 = m.apply(params, boxes, classes, jnp.zeros((2, 5)))
    out0b = m.apply(params, boxes * 100 + 3, classes + 3, jnp.zeros((2, 5)))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out0b), atol=1e-6)


def test_map_embedder_output_geometry(keys):
    m = BEVMapConditionEmbedder(conditioning_embedding_channels=32,
                                block_out_channels=(4, 8, 8, 8))
    cond = jnp.ones((2, 200, 200, 8))
    params = m.init(keys[0], cond)
    out = m.apply(params, cond)
    # reference geometry: 200x200 map -> 28x50 latent grid, repeated 6x
    assert out.shape == (12, 28, 50, 32)
    # zero-init output conv => exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_occ_image_embedder_split(keys):
    m = OccImageConditionEmbedder(conditioning_embedding_channels=32,
                                  block_out_channels=(4, 8, 8, 8))
    cond = jnp.ones((2, 32, 6 * 64, 3))
    params = m.init(keys[0], cond)
    out = m.apply(params, cond)
    assert out.shape == (12, 4, 8, 32)


def test_sfa_residual_at_init(keys):
    m = SFATxtCon(con_dim=32)
    cond = jax.random.normal(keys[0], (2, 4, 6, 32))
    txt = jax.random.normal(keys[1], (2, 10, 768))
    params = m.init(keys[2], cond, txt)
    out = m.apply(params, cond, txt)
    assert out.shape == cond.shape


def _unet(multiview=True, **kw):
    return UNet2DConditionMultiview(
        multiview=multiview, cross_attention_dim=96, **TINY, **kw)


def _unet_inputs(keys, bn=2 * N_CAM):
    sample = jax.random.normal(keys[0], (bn, H, W, 4))
    t = jnp.full((bn,), 500, jnp.int32)
    ehs = jax.random.normal(keys[1], (bn, 20, 96))
    return sample, t, ehs


def test_unet_forward_and_multiview_zero_init(keys):
    sample, t, ehs = _unet_inputs(keys)
    mv = _unet(True)
    params_mv = mv.init(keys[2], sample, t, ehs, n_cam=N_CAM)
    out_mv = mv.apply(params_mv, sample, t, ehs, n_cam=N_CAM)
    assert out_mv.shape == sample.shape

    # zero-init connector => multiview block contributes nothing at init:
    # outputs must match the plain UNet using the shared param subset.
    plain = _unet(False)
    params_plain = plain.init(keys[2], sample, t, ehs, n_cam=N_CAM)

    def strip_new(tree, ref):
        # copy mv params into plain structure (shared names identical)
        import flax
        flat_mv = flax.traverse_util.flatten_dict(tree)
        flat_ref = flax.traverse_util.flatten_dict(ref)
        out = {k: flat_mv[k] for k in flat_ref}
        return flax.traverse_util.unflatten_dict(out)

    shared = jax.tree_util.tree_map(
        lambda x: x, strip_new(params_mv["params"], params_plain["params"]))
    out_plain = plain.apply({"params": shared}, sample, t, ehs, n_cam=N_CAM)
    np.testing.assert_allclose(
        np.asarray(out_mv), np.asarray(out_plain), atol=1e-5)


def test_unet_selective_remat_equivalence(keys):
    """remat_min_tokens changes only WHAT is rematerialized, never the math:
    loss and grads must match the full-remat graph exactly (same ops, same
    order — remat replays identical FLOPs)."""
    sample, t, ehs = _unet_inputs(keys)

    def loss_for(min_tokens):
        m = _unet(True, remat=True, remat_min_tokens=min_tokens)
        params = m.init(keys[2], sample, t, ehs, n_cam=N_CAM)

        def loss(p):
            return jnp.mean(m.apply(p, sample, t, ehs, n_cam=N_CAM) ** 2)

        # jitted: op-by-op value_and_grad of the full tiny UNet took ~3 min
        # on CPU (ADVICE r3); one compile is much cheaper
        val, grads = jax.jit(jax.value_and_grad(loss))(params)
        return val, grads

    # threshold above every level's token count => nothing remats
    v0, g0 = loss_for(0)
    v1, g1 = loss_for(10 ** 9)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g0, g1)


def test_unet_controlnet_residual_plumbing(keys):
    sample, t, ehs = _unet_inputs(keys)
    mv = _unet(True)
    params = mv.init(keys[2], sample, t, ehs, n_cam=N_CAM)
    chs = TINY["block_out_channels"]
    # residual shapes mirror the down path: conv_in + per-block outputs
    shapes = [(sample.shape[0], H, W, chs[0])]
    h, w = H, W
    for i, ch in enumerate(chs):
        for _ in range(TINY["layers_per_block"]):
            shapes.append((sample.shape[0], h, w, ch))
        if i < len(chs) - 1:
            h, w = (h + 1) // 2, (w + 1) // 2
            shapes.append((sample.shape[0], h, w, ch))
    downs = [jnp.ones(s) * 0.1 for s in shapes]
    mid = jnp.ones((sample.shape[0], h, w, chs[-1])) * 0.1
    out = mv.apply(params, sample, t, ehs,
                   down_block_additional_residuals=downs,
                   mid_block_additional_residual=mid, n_cam=N_CAM)
    base = mv.apply(params, sample, t, ehs, n_cam=N_CAM)
    assert out.shape == sample.shape
    assert float(jnp.max(jnp.abs(out - base))) > 1e-4  # residuals had effect


def test_new_param_marker():
    assert is_new_multiview_param(("down_blocks_0", "attentions_0",
                                   "transformer_blocks_0", "attn4", "to_q"))
    assert not is_new_multiview_param(("down_blocks_0", "attentions_0",
                                       "transformer_blocks_0", "attn1", "to_q"))


@pytest.fixture(scope="module")
def cn_setup(keys):
    m = BEVControlNet(
        block_out_channels=TINY["block_out_channels"],
        layers_per_block=1, heads=4, cross_attention_dim=96,
        camera_out_dim=96,
        conditioning_embedding_out_channels=(4, 8, 8, 8),
        cond_embedder="bev_map",
        bbox_proj_dims=(96, 64, 64, 96), bbox_class_token_dim=96,
    )
    B = 2
    sample = jax.random.normal(keys[0], (B, N_CAM, 28, 50, 4))
    t = jnp.full((B,), 100, jnp.int32)
    cam = jax.random.normal(keys[1], (B, N_CAM, 3, 7))
    ehs = jax.random.normal(keys[2], (B, 20, 96))
    cond = jax.random.normal(keys[3], (B, 200, 200, 8))
    boxes = {
        "bboxes": jax.random.normal(keys[4], (B, N_CAM, 7, 8, 3)),
        "classes": jnp.zeros((B, N_CAM, 7), jnp.int32),
        "masks": jnp.ones((B, N_CAM, 7)),
    }
    params = m.init(keys[5], sample, t, cam, ehs, cond, boxes)
    return m, params, (sample, t, cam, ehs, cond, boxes)


def test_controlnet_shapes_and_zero_init(cn_setup):
    m, params, (sample, t, cam, ehs, cond, boxes) = cn_setup
    downs, mid, kv = m.apply(params, sample, t, cam, ehs, cond, boxes)
    assert len(downs) == 1 + 4 * 1 + 3  # conv_in + per-layer + 3 downsamples
    # zero conv heads => all residuals exactly zero at init
    for d in downs:
        np.testing.assert_allclose(np.asarray(d), 0.0)
    np.testing.assert_allclose(np.asarray(mid), 0.0)
    # kv: cam token + 20 text + 7 box tokens
    assert kv.shape == (2 * N_CAM, 1 + 20 + 7, 96)


def test_controlnet_cond_drop_switch(cn_setup, keys):
    m, params, (sample, t, cam, ehs, cond, boxes) = cn_setup
    uncond = jax.random.normal(keys[6], (1, 20, 96))
    sw = jnp.zeros((2, N_CAM)).at[0, 0].set(1.0)
    _, _, kv = m.apply(params, sample, t, cam, ehs, cond, boxes,
                       encoder_hidden_states_uncond=uncond, uncond_switch=sw)
    _, _, kv_ref = m.apply(params, sample, t, cam, ehs, cond, boxes)
    kv = np.asarray(kv).reshape(2, N_CAM, 28, 96)
    kv_ref = np.asarray(kv_ref).reshape(2, N_CAM, 28, 96)
    # dropped view differs (text part replaced), others identical
    assert np.abs(kv[0, 0, :21] - kv_ref[0, 0, :21]).max() > 1e-3
    np.testing.assert_allclose(kv[0, 1], kv_ref[0, 1], atol=1e-6)
    np.testing.assert_allclose(kv[1], kv_ref[1], atol=1e-6)


def test_controlnet_view_shared_boxes(keys, cn_setup):
    m, params, (sample, t, cam, ehs, cond, _) = cn_setup
    boxes1 = {
        "bboxes": jax.random.normal(keys[7], (2, 1, 7, 8, 3)),
        "classes": jnp.zeros((2, 1, 7), jnp.int32),
        "masks": jnp.ones((2, 1, 7)),
    }
    downs, mid, kv = m.apply(params, sample, t, cam, ehs, cond, boxes1)
    assert kv.shape == (2 * N_CAM, 28, 96)


def test_controlnet_box_adapter_non77_text(keys):
    """The box/cls token split is derived from the actual text length, not a
    hardcoded 77 (reference CLIP model_max_length).  With the adapter on and
    L=20, the returned UNet KV must strip exactly the 7 cls tokens
    (reference unet_addon_rawbox.py:1066-1069)."""
    m = BEVControlNet(
        block_out_channels=TINY["block_out_channels"],
        layers_per_block=1, heads=4, cross_attention_dim=96,
        camera_out_dim=96,
        conditioning_embedding_out_channels=(4, 8, 8, 8),
        cond_embedder="bev_map",
        bbox_proj_dims=(96, 64, 64, 96), bbox_class_token_dim=96,
        use_box_adapter=True,
    )
    B, L, n_box = 2, 20, 7
    sample = jax.random.normal(keys[0], (B, N_CAM, 28, 50, 4))
    t = jnp.full((B,), 100, jnp.int32)
    cam = jax.random.normal(keys[1], (B, N_CAM, 3, 7))
    ehs = jax.random.normal(keys[2], (B, L, 96))
    cond = jax.random.normal(keys[3], (B, 200, 200, 8))
    boxes = {
        "bboxes": jax.random.normal(keys[4], (B, N_CAM, n_box, 8, 3)),
        "classes": jnp.zeros((B, N_CAM, n_box), jnp.int32),
        "masks": jnp.ones((B, N_CAM, n_box)),
    }
    params = m.init(keys[5], sample, t, cam, ehs, cond, boxes)
    downs, mid, kv = m.apply(params, sample, t, cam, ehs, cond, boxes)
    # UNet KV = cam + text + box (cls tokens stripped)
    assert kv.shape == (B * N_CAM, 1 + L + n_box, 96)
    # precomputed path agrees (the pipeline's step-constant hoist)
    pre = m.apply(params, sample, t, cam, ehs, cond, boxes,
                  precompute_only=True)
    assert pre["kv"].shape[1] == 1 + L + 2 * n_box  # internal KV keeps cls
    downs2, mid2, kv2 = m.apply(params, sample, t, cam, ehs, cond,
                                precomputed=pre)
    assert kv2.shape == kv.shape
    np.testing.assert_allclose(np.asarray(kv2), np.asarray(kv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid2), np.asarray(mid), atol=1e-6)


def test_vae_roundtrip_shapes(keys):
    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16), layers_per_block=1)
    x = jax.random.normal(keys[0], (2, 32, 32, 3))
    params = vae.init(keys[1], x, keys[2])
    z = vae.apply(params, x, keys[2], method=vae.encode)
    assert z.shape == (2, 4, 4, 4)
    img = vae.apply(params, z, method=vae.decode)
    assert img.shape == (2, 32, 32, 3)
    mode = vae.apply(params, x, method=vae.encode_mode)
    assert mode.shape == z.shape


def test_clip_text_shapes(keys):
    m = CLIPTextModel(num_layers=2)
    ids = jnp.array([[49406, 320, 1125, 49407] + [0] * 73], jnp.int32)
    params = m.init(keys[0], ids)
    hidden, pooled = m.apply(params, ids)
    assert hidden.shape == (1, 77, 768)
    assert pooled.shape == (1, 768)
    # pooled = hidden state at the argmax position (EOT id 49407 < 49406? no:
    # argmax picks position of max id = position 3 here... EOT=49407 > BOS)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[:, 3]),
                               atol=1e-6)
