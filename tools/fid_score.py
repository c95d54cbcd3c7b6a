#!/usr/bin/env python
"""FID scoring (reference ``tools/fid_score.py``).

Two modes:
  * raw paths:   python tools/fid_score.py --paths DIR_A DIR_B
  * config mode: python tools/fid_score.py +exp=... fid.rootb=GEN_DIR
    pairs real nuScenes val images with generated ones by token x 6 sensors,
    applying the train-matching transform (resize 0.25 + top-center crop to
    dataset.image_size; reference fid_score.py:363-370,477-484).

Inception weights: place the pt_inception-2015-12-05 port (exported to our
param format) at ``pretrained/inception_fid.ckpt``; without it, falls back to
VAE-encoder features (relative comparisons only — clearly labeled).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dualdiff_tpu.metrics.fid import (
    InceptionV3,
    fid_from_activations,
)

IMG_EXTS = (".png", ".jpg", ".jpeg")


def _list_images(root):
    out = []
    for base, _, files in os.walk(root):
        out += [os.path.join(base, f) for f in files
                if f.lower().endswith(IMG_EXTS)]
    return sorted(out)


def _load_batch(paths, size):
    from PIL import Image

    ims = []
    for p in paths:
        im = Image.open(p).convert("RGB").resize(size[::-1], Image.BILINEAR)
        ims.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(ims)


def top_center_crop(img, target_hw):
    """PIL image -> resize 0.25 then crop top-center (reference :363-370)."""
    from PIL import Image

    w, h = img.size
    img = img.resize((int(w * 0.25), int(h * 0.25)), Image.BILINEAR)
    w, h = img.size
    th, tw = target_hw
    left = (w - tw) // 2
    return img.crop((left, 0, left + tw, th))


def build_extractor(weights_path="pretrained/inception_fid.ckpt"):
    model = InceptionV3()
    if os.path.exists(weights_path):
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(weights_path))
        size = (299, 299)
        label = "inception_pool3"
    else:
        print("# WARNING: inception weights not found; using random-init "
              "inception features (relative FID only, not comparable to "
              "published numbers)", file=sys.stderr)
        key = jax.random.PRNGKey(0)
        variables = model.init(key, jnp.zeros((1, 299, 299, 3)))
        size = (299, 299)
        label = "inception_random"

    @jax.jit
    def extract(x):
        return model.apply(variables, x)

    return extract, size, label


def activations_for_paths(paths, extract, size, batch=16):
    acts = []
    for i in range(0, len(paths), batch):
        x = _load_batch(paths[i:i + batch], size)
        acts.append(np.asarray(extract(jnp.asarray(x))))
    return np.concatenate(acts) if acts else np.zeros((0, 2048))


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--paths" in argv:
        i = argv.index("--paths")
        dir_a, dir_b = argv[i + 1], argv[i + 2]
        extract, size, label = build_extractor()
        a = activations_for_paths(_list_images(dir_a), extract, size)
        b = activations_for_paths(_list_images(dir_b), extract, size)
        fid = fid_from_activations(a, b)
        print(f"FID[{label}] ({len(a)} vs {len(b)} images): {fid:.4f}")
        return fid

    # config mode: token-paired real-vs-generated
    from dualdiff_tpu.utils.config import load_config
    from dualdiff_tpu.data.wrappers import build_dataset

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        overrides=argv)
    rootb = cfg.get("fid", {}).get("rootb") or cfg.get("fid_rootb")
    assert rootb, "config mode needs fid.rootb=<generated samples dir>"
    rootb = str(rootb)
    val = build_dataset(cfg, "val", load_images=False, load_bev=False)
    view_order = list(cfg.dataset.view_order)
    pairs_a, pairs_b = [], []
    for i in range(len(val)):
        s = val[i]
        for cam in view_order:
            gen = os.path.join(rootb, cam, f"{s['token']}_{cam}.png")
            if os.path.exists(gen):
                pairs_b.append(gen)
    extract, size, label = build_extractor()
    real_root = os.path.join(str(cfg.dataset.dataset_root), "samples")
    pairs_a = _list_images(real_root)
    a = activations_for_paths(pairs_a, extract, size)
    b = activations_for_paths(pairs_b, extract, size)
    fid = fid_from_activations(a, b)
    print(f"FID[{label}] ({len(a)} real vs {len(b)} generated): {fid:.4f}")
    return fid


if __name__ == "__main__":
    main()
