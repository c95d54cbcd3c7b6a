import os
import numpy as np

def test_explore_attn_cli(tmp_path):
    """tools/explore_attn.py e2e: dumps per-layer attention maps from the
    sow-based introspection path (reference explore pipeline role)."""
    import tools.explore_attn as ea

    out = str(tmp_path / "maps")
    ea.main(["+exp=224x400", "runner=debug", "dataset=Nuscenes_synthetic",
             "dataset.image_size=[32,48]", "dataset.num_samples=2",
             "tiny_models=true", f"explore_out={out}",
             f"log_root={tmp_path / 'run'}"])
    files = os.listdir(out)
    assert files, "no attention maps written"
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(out, sorted(files)[0])))
    assert img.size > 0 and np.isfinite(img).all()
