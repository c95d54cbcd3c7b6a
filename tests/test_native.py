"""Native C++ data-path: bitpack codec + JPEG decode/resize pipeline."""

import os

import numpy as np
import pytest

from dualdiff_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (no compiler?)")


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    masks = (rng.random((18, 64, 48)) > 0.5).astype(np.uint8)
    packed = native.pack_masks(masks)
    assert packed.shape == (64, 48) and packed.dtype == np.uint32
    out = native.unpack_masks(packed, 18)
    np.testing.assert_array_equal(out, masks)
    # matches the numpy codec used as fallback
    bits = ((packed[None] >> np.arange(18)[:, None, None]) & 1).astype(np.uint8)
    np.testing.assert_array_equal(bits, masks)


def test_jpeg_decode_resize_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    # smooth image (JPEG is lossy; gradients compress faithfully)
    y, x = np.mgrid[0:900, 0:1600]
    img = np.stack([(x / 1600 * 255), (y / 900 * 255),
                    ((x + y) / 2500 * 255)], -1).astype(np.uint8)
    p = str(tmp_path / "cam.jpg")
    Image.fromarray(img).save(p, quality=95)

    out = native.load_images_batch([p] * 6, 0.25, 224, 400)
    assert out is not None and out.shape == (6, 224, 400, 3)
    np.testing.assert_array_equal(out[0], out[5])  # thread-safe determinism

    # PIL reference: resize 0.25 -> bottom crop
    ref = Image.open(p).resize((400, 225), Image.BILINEAR)
    ref = np.asarray(ref.crop((0, 1, 400, 225)), np.float32) / 127.5 - 1
    diff = np.abs(out[0] - ref)
    assert diff.mean() < 0.03, f"mean abs diff {diff.mean()}"


def test_missing_file_reports_failure(tmp_path):
    out = native.load_images_batch([str(tmp_path / "nope.jpg")], 0.25, 32, 32)
    assert out is None  # failure -> caller falls back
