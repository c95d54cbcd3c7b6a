#!/usr/bin/env python
"""FID scoring (reference ``tools/fid_score.py``).

Two modes:
  * raw paths:   python tools/fid_score.py --paths DIR_A DIR_B
  * config mode: python tools/fid_score.py +exp=... fid.rootb=GEN_DIR
    pairs real nuScenes val images with generated ones by token x 6 sensors
    and applies the train-matching transform (bicubic resize by
    ``augment2d.resize`` mean + bottom-center crop to ``dataset.image_size``)
    to BOTH sides before Inception, exactly like the reference
    (``fid_score.py:297-340`` pairing, ``:363-370`` top_center_crop —
    which, despite the name, keeps the BOTTOM rows to match ImageAug3D —
    and ``:477-484`` the transform composition).

Inception weights: place the standard ``pt_inception-2015-12-05.pth`` at
``pretrained/pt_inception-2015-12-05.pth`` (imported on the fly via
``metrics/fid_import.py``), or an orbax export at
``pretrained/inception_fid.ckpt``.  Without either, falls back to
random-init inception features (relative comparisons only — clearly
labeled, never comparable to published numbers).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dualdiff_tpu.metrics.fid import InceptionV3, fid_from_activations

IMG_EXTS = (".png", ".jpg", ".jpeg")


def _list_images(root):
    out = []
    for base, _, files in os.walk(root):
        out += [os.path.join(base, f) for f in files
                if f.lower().endswith(IMG_EXTS)]
    return sorted(out)


def top_center_crop(img, target_hw):
    """Crop the horizontally-centered, BOTTOM-aligned ``target_hw`` window
    (reference ``top_center_crop``, fid_score.py:363-370: crop_h = H - fH —
    the same bottom crop ImageAug3D applies in training)."""
    w, h = img.size
    th, tw = target_hw
    left = max(0, (w - tw) // 2)
    top = max(0, h - th)
    return img.crop((left, top, left + tw, top + th))


def train_matching_transform(img, resize_ratio, target_hw):
    """Bicubic resize by the train ratio, then bottom-center crop
    (reference fid_score.py:477-484)."""
    from PIL import Image

    w, h = img.size
    img = img.resize((int(w * resize_ratio), int(h * resize_ratio)),
                     Image.BICUBIC)
    return top_center_crop(img, target_hw)


def _load_batch(paths, size, transform=None):
    from PIL import Image

    ims = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if transform is not None:
            im = transform(im)
        im = im.resize(size[::-1], Image.BILINEAR)  # inception input resize
        ims.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(ims)


def build_extractor(weights_dir="pretrained", require_real=False):
    model = InceptionV3()
    pth = os.path.join(weights_dir, "pt_inception-2015-12-05.pth")
    ckpt = os.path.join(weights_dir, "inception_fid.ckpt")
    if require_real and not (os.path.exists(pth) or os.path.exists(ckpt)):
        raise FileNotFoundError(
            f"FID inception weights not found under {weights_dir!r} "
            "(pt_inception-2015-12-05.pth or inception_fid.ckpt). A real-"
            "dataset FID on random-init features is meaningless; provide the "
            "asset or set allow_fallback_assets=true to proceed anyway.")
    if os.path.exists(pth):
        import torch

        from dualdiff_tpu.metrics.fid_import import import_pt_inception

        sd = torch.load(pth, map_location="cpu", weights_only=True)
        variables = import_pt_inception(
            {k: v.numpy() for k, v in sd.items()})
        label = "inception_pool3"
    elif os.path.exists(ckpt):
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        label = "inception_pool3"
    else:
        print("# WARNING: inception weights not found; using random-init "
              "inception features (relative FID only, not comparable to "
              "published numbers)", file=sys.stderr)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 299, 299, 3)))
        label = "inception_random"

    @jax.jit
    def extract(x):
        return model.apply(variables, x)

    return extract, (299, 299), label


def activations_for_paths(paths, extract, size, batch=16, transform=None):
    acts = []
    for i in range(0, len(paths), batch):
        x = _load_batch(paths[i:i + batch], size, transform)
        acts.append(np.asarray(extract(jnp.asarray(x))))
    return np.concatenate(acts) if acts else np.zeros((0, 2048))


def pair_real_generated(val, view_order, dataset_root, rootb,
                        require_all=False, token_flags=None):
    """Token x sensor pairing (reference fid_score.py:297-340): for every
    val sample and camera, the real file is the dataset image and the
    generated twin is looked up under ``rootb`` by token naming
    (``<CAM>/<token>_<CAM>.png``, tools/val_set_gen.py default) or by the
    original nuScenes filename (``gen_naming=original``).  Returns
    (real_paths, gen_paths) of equal length.

    ``token_flags`` (Dict[token, bool] from ``sample_tokens_by_scene``)
    restricts the pairing to the picked tokens — the reference's
    ``fid.ratio`` scene sub-sampling protocol (fid_score.py:474)."""
    reals, gens = [], []
    missing = 0
    for i in range(len(val)):
        s = val[i]
        if token_flags is not None and not token_flags.get(s["token"], False):
            continue
        for cam, fname in zip(view_order, s["filenames"]):
            cands = [
                os.path.join(rootb, cam, f"{s['token']}_{cam}.png"),
                os.path.join(rootb, os.path.splitext(fname)[0] + ".png"),
                os.path.join(rootb, fname),
            ]
            gen = next((c for c in cands if os.path.exists(c)), None)
            if gen is None:
                missing += 1
                if require_all:
                    raise FileNotFoundError(
                        f"no generated image for {s['token']}/{cam} "
                        f"under {rootb} (tried {cands})")
                continue
            real = fname if os.path.isabs(fname) else os.path.join(
                dataset_root, fname)
            reals.append(real)
            gens.append(gen)
    if missing:
        print(f"# WARNING: {missing} token x sensor pairs had no generated "
              "image and were skipped", file=sys.stderr)
    return reals, gens


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

    # config mode: token x sensor paired real-vs-generated
    from functools import partial

    from dualdiff_tpu.data.wrappers import build_dataset
    from dualdiff_tpu.utils.config import load_config, pop_config_name

    config_name, argv = pop_config_name(argv)
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        name=config_name, overrides=argv)
    fid_cfg = cfg.get("fid", {})
    rootb = fid_cfg.get("rootb") or cfg.get("fid_rootb")
    assert rootb, "config mode needs fid.rootb=<generated samples dir>"
    rootb = str(rootb)
    val = build_dataset(cfg, "val", load_images=False, load_bev=False)
    # scene-ratio token sub-sampling (reference fid.ratio protocol):
    # -1 = all, 0 = first frame/scene, <1 = ratio/scene, >=1 = count/scene
    from dualdiff_tpu.data.scenes import sample_tokens_by_scene

    flags = sample_tokens_by_scene(
        val, float(fid_cfg.get("ratio", -1)), int(cfg.seed))
    reals, gens = pair_real_generated(
        val, list(cfg.dataset.view_order), str(cfg.dataset.dataset_root),
        rootb, require_all=bool(fid_cfg.get("require_all", False)),
        token_flags=flags)
    assert reals, f"no real/generated pairs found under {rootb}"

    # the SAME train-matching transform goes on both sides (reference
    # applies `transforms` to roota and rootb alike, fid_score.py:330-340)
    resize_ratio = float(np.mean(np.asarray(
        cfg.dataset.augment2d.resize[0], np.float32)))
    transform = partial(train_matching_transform,
                        resize_ratio=resize_ratio,
                        target_hw=tuple(cfg.dataset.image_size))
    synthetic = str(cfg.dataset.get("dataset_type", "")) \
        == "SyntheticNuScenes"
    extract, size, label = build_extractor(
        require_real=not synthetic
        and not bool(cfg.get("allow_fallback_assets", False)))
    a = activations_for_paths(reals, extract, size, transform=transform)
    b = activations_for_paths(gens, extract, size, transform=transform)
    fid = fid_from_activations(a, b)
    print(f"FID[{label}] ({len(a)} real vs {len(b)} generated, "
          f"token x sensor paired): {fid:.4f}")
    return fid


if __name__ == "__main__":
    main()
