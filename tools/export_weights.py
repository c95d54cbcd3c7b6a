#!/usr/bin/env python
"""Export our orbax checkpoints back to torch/diffusers-named state dicts.

  python tools/export_weights.py --src <run_dir_or_import_dir> --out out_torch/

Keeps checkpoints consumable by torch stacks (the reference's deployable
``save_pretrained`` format, ``multiview_runner.py:359-374``): each submodel
dir becomes ``<name>/diffusion_pytorch_model.bin`` with diffusers names and
OIHW/OI tensor layouts (``runner/weight_import.export_params``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import orbax.checkpoint as ocp

from dualdiff_tpu.runner.weight_import import export_params

KIND_BY_NAME = {
    "unet": "unet", "vae": "vae", "text_encoder": "clip",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)
    import torch

    ckptr = ocp.StandardCheckpointer()
    for name in sorted(os.listdir(args.src)):
        sub = os.path.join(args.src, name)
        if not os.path.isdir(sub):
            continue
        kind = KIND_BY_NAME.get(
            name, "controlnet" if "controlnet" in name else None)
        if kind is None:
            continue
        try:
            params = ckptr.restore(os.path.abspath(sub))
        except Exception as e:
            print(f"-- {name}: not an orbax checkpoint ({e}); skipping")
            continue
        sd = export_params(params, kind)
        out_dir = os.path.join(args.out, name)
        os.makedirs(out_dir, exist_ok=True)
        torch_sd = {k: torch.from_numpy(np.asarray(v, np.float32))
                    for k, v in sd.items()}
        path = os.path.join(out_dir, "diffusion_pytorch_model.bin")
        torch.save(torch_sd, path)
        print(f"-- {name}: {len(sd)} tensors -> {path}")


if __name__ == "__main__":
    main()
