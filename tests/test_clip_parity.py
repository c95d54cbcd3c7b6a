"""Activation-level importer validation against the REAL HuggingFace
``transformers.CLIPTextModel`` (the exact class the reference loads for SD
v1.5's text encoder, reference ``base_runner.py:116-123``).

This closes the "importer only validated against itself" gap for the CLIP
branch: a randomly-initialized torch CLIPTextModel with the SD v1.5 config
is exported to its native state_dict, imported through
``import_clip_text``, and the Flax model must reproduce the torch hidden
states and pooler output to fp32 tolerance.  (diffusers is not installed
in this image, so the UNet/VAE branches are pinned by the vendored
authoritative key lists in ``runner/sd15_keys.py`` instead.)
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def test_clip_text_activation_parity():
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel as TorchCLIP

    import jax.numpy as jnp
    from dualdiff_tpu.models.clip_text import CLIPTextModel
    from dualdiff_tpu.runner.weight_import import import_clip_text

    # SD v1.5 text encoder config (openai/clip-vit-large-patch14), shrunk
    # layers for test speed — key names and math are layer-count-invariant
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=3, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    tm = TorchCLIP(cfg).eval()

    ids = np.array([[49406, 320, 1125, 539, 602, 49407] + [49407] * 71,
                    [49406, 1125, 49407] + [49407] * 74], np.int64)
    with torch.no_grad():
        out = tm(input_ids=torch.from_numpy(ids))
    ref_h = out.last_hidden_state.numpy()
    ref_p = out.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = import_clip_text(sd)

    fm = CLIPTextModel(num_layers=3)
    got_h, got_p = fm.apply({"params": params}, jnp.asarray(ids, jnp.int32))

    np.testing.assert_allclose(np.asarray(got_h), ref_h, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_p), ref_p, atol=2e-4, rtol=1e-3)


def test_clip_text_importer_consumes_all_keys():
    """Every key of the real state_dict must be consumed (no silent drops)."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel as TorchCLIP

    import jax
    from dualdiff_tpu.runner.weight_import import import_clip_text

    cfg = CLIPTextConfig(num_hidden_layers=2, hidden_size=64,
                         intermediate_size=128, num_attention_heads=4)
    sd = {k: v.numpy() for k, v in TorchCLIP(cfg).state_dict().items()}
    params = import_clip_text(sd)
    n_in = sum(v.size for k, v in sd.items() if "position_ids" not in k)
    n_out = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n_in == n_out
