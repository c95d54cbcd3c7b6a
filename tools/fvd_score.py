#!/usr/bin/env python
"""FVD scoring for the video stage (reference evaluates DualDiff+ video
quality with Kinetics-400-I3D FVD; see BASELINE.md configs 4-5).

    python tools/fvd_score.py --real DIR_A --gen DIR_B [--frames 16]
                              [--feature logits|pool] [--size 224]

Each directory holds clips: either ``<clip>.npz`` (array ``frames`` of
(T, H, W, 3) uint8/float) or one subdirectory of ordered frame images per
clip.  With ``pretrained/i3d_pretrained_400.pt`` present this is canonical
FVD over I3D features (``dualdiff_tpu/metrics/i3d.py``); otherwise it falls
back to frame-feature statistics (labeled, relative comparisons only).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg")


def load_clips(root: str, frames: int, size: int) -> np.ndarray:
    """-> (N, frames, size, size, 3) in [-1, 1]."""
    from PIL import Image

    clips = []
    for entry in sorted(os.listdir(root)):
        path = os.path.join(root, entry)
        if entry.endswith(".npz"):
            arr = np.load(path)["frames"]
        elif os.path.isdir(path):
            fs = sorted(f for f in os.listdir(path)
                        if f.lower().endswith(IMG_EXTS))
            if not fs:
                continue
            arr = np.stack([np.asarray(Image.open(os.path.join(path, f))
                                       .convert("RGB")) for f in fs])
        else:
            continue
        if len(arr) < frames:
            continue
        arr = arr[:frames].astype(np.float32)
        if arr.max() > 1.5:  # uint8 range
            arr = arr / 255.0
        # resize each frame to size x size (I3D canonical input)
        t, h, w = arr.shape[:3]
        if (h, w) != (size, size):
            arr = np.stack([
                np.asarray(Image.fromarray(
                    (f * 255).astype(np.uint8)).resize(
                        (size, size), Image.BILINEAR), np.float32) / 255.0
                for f in arr])
        clips.append(arr * 2.0 - 1.0)
    if not clips:
        raise FileNotFoundError(f"no clips with >= {frames} frames in {root}")
    return np.stack(clips)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", required=True)
    ap.add_argument("--gen", required=True)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--feature", default="logits",
                    choices=["logits", "pool"])
    ap.add_argument("--i3d", default="pretrained/i3d_pretrained_400.pt")
    args = ap.parse_args(argv)

    from dualdiff_tpu.metrics.fvd import (
        build_i3d_extractor, clip_features_from_frames, fvd_from_features,
        i3d_features)

    real = load_clips(args.real, args.frames, args.size)
    gen = load_clips(args.gen, args.frames, args.size)

    extract, label = build_i3d_extractor(args.i3d, args.feature)
    if extract is not None:
        fr = i3d_features(real, extract)
        fg = i3d_features(gen, extract)
    else:  # labeled fallback: frame-level inception features -> clip stats
        import jax.numpy as jnp

        sys.path.insert(0, os.path.dirname(__file__))
        from fid_score import build_extractor

        fextract, fsize, flabel = build_extractor()
        label = f"fallback({flabel})"

        def frame_feats(clips):
            n, t = clips.shape[:2]
            flat = clips.reshape(n * t, *clips.shape[2:]) * 0.5 + 0.5
            feats = []
            for i in range(0, len(flat), 16):
                x = jnp.asarray(flat[i:i + 16])
                x = jnp.clip(
                    jnp.asarray(np.stack([_resize(f, fsize) for f in
                                          np.asarray(x)])), 0, 1)
                feats.append(np.asarray(fextract(x)))
            return np.concatenate(feats).reshape(n, t, -1)

        def _resize(f, hw):
            from PIL import Image

            return np.asarray(Image.fromarray(
                (f * 255).astype(np.uint8)).resize(
                    hw[::-1], Image.BILINEAR), np.float32) / 255.0

        fr = clip_features_from_frames(frame_feats(real))
        fg = clip_features_from_frames(frame_feats(gen))
        if fr.shape[1] > 1024:
            # fixed random projection: keeps the host-side sqrtm tractable
            # (6144^2 covariances take minutes); deterministic, fallback-only
            proj = np.random.default_rng(0).standard_normal(
                (fr.shape[1], 512)).astype(np.float32) / np.sqrt(fr.shape[1])
            fr, fg = fr @ proj, fg @ proj
            label += "+proj512"

    fvd = fvd_from_features(fr, fg)
    print(f"FVD[{label}] ({len(real)} real vs {len(gen)} generated clips, "
          f"{args.frames} frames): {fvd:.4f}")
    return fvd


if __name__ == "__main__":
    main()
