"""Full-cycle e2e of the weight CLIs (SURVEY.md hard-part #1):

synthetic diffusers-layout ``.bin`` tree (every key from the vendored
authoritative SD v1.5 lists, random values) -> ``tools/import_weights.py``
(real full-size init + overlay + orbax save) -> ``tools/export_weights.py``
(orbax -> torch ``.bin``) -> values must roundtrip bit-exactly for every
original key.  This drives the exact CLI path a user runs with the real
SD v1.5 assets."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dualdiff_tpu.runner.sd15_keys import (  # noqa: E402
    sd15_clip_keys, sd15_unet_keys, sd15_vae_keys)


def _write_tree(root):
    rng = np.random.default_rng(0)
    specs = {"unet": sd15_unet_keys(), "vae": sd15_vae_keys(),
             "text_encoder": sd15_clip_keys()}
    dicts = {}
    for name, spec in specs.items():
        sd = {k: rng.standard_normal(s).astype(np.float32) * 0.02
              for k, s in spec.items()}
        sub = os.path.join(root, name)
        os.makedirs(sub)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(sub, "diffusion_pytorch_model.bin"))
        dicts[name] = sd
    return dicts


@pytest.mark.slow
def test_import_export_cli_roundtrip(tmp_path):
    import tools.export_weights as ew
    import tools.import_weights as iw

    src = str(tmp_path / "sd15")
    os.makedirs(src)
    originals = _write_tree(src)

    imported = str(tmp_path / "flax")
    iw.main(["--src", src, "--out", imported, "+exp=224x400",
             "runner=debug"])
    for name in ("unet", "vae", "text_encoder"):
        assert os.path.isdir(os.path.join(imported, name)), name

    back = str(tmp_path / "torch")
    ew.main(["--src", imported, "--out", back])

    for name, sd in originals.items():
        out = torch.load(os.path.join(back, name,
                                      "diffusion_pytorch_model.bin"),
                         weights_only=True)
        missing = [k for k in sd if k not in out]
        assert not missing, (name, missing[:5])
        for k, v in sd.items():
            np.testing.assert_array_equal(
                out[k].numpy(), v,
                err_msg=f"{name}:{k} did not roundtrip")
