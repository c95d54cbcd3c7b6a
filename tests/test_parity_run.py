"""E2E dry-run of the asset-day parity runbook (VERDICT r2 task 5):
import -> coverage gates -> generation -> FID plumbing, one command, on
synthetic assets — so the real-asset run is a parameter change."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_parity_run_synthetic_end_to_end(tmp_path):
    import tools.parity_run as pr

    work = str(tmp_path / "parity")
    result = pr.main(["--synthetic", "--workdir", work, "--num-tokens", "1"])
    # all four stages completed and returned a finite (self-)FID
    assert np.isfinite(result["fid"]) and abs(result["fid"]) < 0.5
    rep = result["report"]
    for name in ("unet", "vae", "text_encoder"):
        assert rep[name] is not None
        assert not rep[name]["unexpected"], rep[name]["unexpected"][:3]
    # vae/text_encoder must be fully covered; unet missing = new modules only
    assert not rep["vae"]["missing"] and not rep["text_encoder"]["missing"]
    from dualdiff_tpu.models.unet import is_new_multiview_param

    assert all(is_new_multiview_param(tuple(m))
               for m in rep["unet"]["missing"])
    # generated images on disk under val_set_gen naming
    gen = result["gen_root"]
    pngs = [os.path.join(b, f) for b, _, fs in os.walk(gen) for f in fs
            if f.endswith(".png")]
    assert len(pngs) == 6  # 1 token x 6 views


def test_parity_run_fails_loudly_without_assets(tmp_path):
    import tools.parity_run as pr

    with pytest.raises(SystemExit):
        pr.main(["--workdir", str(tmp_path / "w")])  # no --sd, no --synthetic


@pytest.mark.slow
@pytest.mark.parametrize("exp,extra,n_pngs", [
    ("+exp=224x400", [], 6),
    ("+exp-hd=256x704", [], 6),
    ("+exp=video_16f", ["video.num_frames=2"], 12),   # 2 frames x 6 views
    ("+exp=rgd_stage2", ["video.num_frames=2"], 12),
])
def test_parity_dryrun_matrix(tmp_path, exp, extra, n_pngs):
    """Asset-day dry-run across the whole config matrix (VERDICT r4 #5):
    the runbook's import -> load -> generate -> FID plumbing works for the
    HD geometries and the video/RGD configs, not just the flagship image
    config.  Video configs generate per-frame PNGs under the same
    val_set_gen tree."""
    import tools.parity_run as pr

    work = str(tmp_path / "parity")
    result = pr.main(["--synthetic", "--exp", exp, "--workdir", work,
                      "--num-tokens", "1", *extra])
    assert np.isfinite(result["fid"]) and abs(result["fid"]) < 0.5
    gen = result["gen_root"]
    pngs = [os.path.join(b, f) for b, _, fs in os.walk(gen) for f in fs
            if f.endswith(".png")]
    assert len(pngs) == n_pngs
