import os

import numpy as np
import pytest

from dualdiff_tpu.data.collate import branch_specs_from_cfg, collate_fn
from dualdiff_tpu.data.synthetic import SyntheticNuScenes
from dualdiff_tpu.data.tokenizer import BOS, EOS, HashTokenizer, build_tokenizer
from dualdiff_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_hash_tokenizer_deterministic_and_shaped():
    tok = HashTokenizer()
    ids = tok(["a driving scene", "a driving scene", "another"])
    assert ids.shape == (3, 77)
    assert (ids[0] == ids[1]).all()
    assert ids[0, 0] == BOS
    assert EOS in ids[0]
    # pad is EOS; pooled-token argmax finds the first EOS
    first_eos = int(np.argmax(ids[0]))
    assert ids[0, first_eos] == EOS


def test_build_tokenizer_falls_back_with_warning(caplog):
    import logging

    with caplog.at_level(logging.WARNING, "dualdiff_tpu.data.tokenizer"):
        tok = build_tokenizer("/nonexistent/path")
    assert isinstance(tok, HashTokenizer)
    assert any("HashTokenizer fallback" in r.message for r in caplog.records)


def test_build_tokenizer_require_real_raises():
    with pytest.raises(FileNotFoundError, match="allow_fallback_assets"):
        build_tokenizer("/nonexistent/path", require_real=True)


def test_trainer_refuses_fallback_tokenizer_on_real_dataset():
    """Non-synthetic training with missing CLIP assets fails fast (before
    any model build) unless allow_fallback_assets=true."""
    from dualdiff_tpu.runner.trainer import MultiviewTrainer

    cfg = load_config(CONFIG_DIR, overrides=[
        "+exp=224x400", "dataset=Nuscenes",
        "model.pretrained_model_name_or_path=/nonexistent/sd15"])
    with pytest.raises(FileNotFoundError, match="allow_fallback_assets"):
        MultiviewTrainer(cfg, train_set=None, tiny=True)


def test_clip_split_pattern_parity():
    """CLIP's \\p{L}/\\p{N} split semantics (HF CLIPTokenizer pattern;
    reference magicdrive/dataset/utils.py:30-57) on contractions,
    punctuation, and non-ASCII letters."""
    from dualdiff_tpu.data.tokenizer import _PAT, _basic_clean

    cases = {
        # contraction suffixes split off
        "can't stop, won't stop!":
            ["can", "'t", "stop", ",", "won", "'t", "stop", "!"],
        # non-ASCII letters are ONE letter-run, not punctuation islands
        "café straße kyoto":
            ["café", "straße", "kyoto"],
        # digits split one at a time; punctuation runs group
        "exit 42 -- now":
            ["exit", "4", "2", "--", "now"],
        "it's we've i'll they'd i'm you're":
            ["it", "'s", "we", "'ve", "i", "'ll", "they", "'d",
             "i", "'m", "you", "'re"],
    }
    for text, want in cases.items():
        assert _PAT.findall(_basic_clean(text)) == want, text


def test_synthetic_schema():
    ds = SyntheticNuScenes(num_samples=4)
    s = ds[0]
    assert s["img"].shape == (6, 224, 400, 3)
    assert s["camera_intrinsics"].shape == (6, 4, 4)
    assert s["occ_labels"].shape == (200, 200, 16)
    assert s["gt_bboxes_3d"].shape[-1] == 7
    # deterministic
    s2 = SyntheticNuScenes(num_samples=4)[0]
    np.testing.assert_array_equal(s["img"], s2["img"])
    # lidar2image consistency
    np.testing.assert_allclose(
        s["lidar2image"], s["camera_intrinsics"] @ s["lidar2camera"],
        rtol=1e-4, atol=1e-3)


@pytest.fixture(scope="module")
def ds():
    return SyntheticNuScenes(num_samples=8)


def _collate(cfg, ds, n=2, **kw):
    tok = HashTokenizer()
    rng = np.random.default_rng(0)
    return collate_fn([ds[i] for i in range(n)], cfg, tok, rng=rng, **kw)


def test_branch_specs_single_vs_dual():
    cfg = load_config(CONFIG_DIR, overrides=["+exp=224x400"])
    specs = branch_specs_from_cfg(cfg)
    assert len(specs) == 1 and specs[0].cond_kind == "bev_map"

    cfg = load_config(CONFIG_DIR, overrides=["+exp=occ_bg"])
    assert branch_specs_from_cfg(cfg)[0].cond_kind == "occ_image"

    cfg = load_config(CONFIG_DIR, overrides=["+exp=dual_branch_augloss_fusion"])
    specs = branch_specs_from_cfg(cfg)
    assert len(specs) == 2
    assert specs[0].cond_kind == "occ_image" and not specs[0].use_map_vec
    assert specs[1].cond_kind == "occ_3d" and specs[1].use_map_vec
    assert specs[1].map_vec_points == 40 and specs[1].view_shared
    assert specs[1].occ_fg and not specs[1].occ_bg


def test_collate_vanilla(ds):
    cfg = load_config(CONFIG_DIR, overrides=["+exp=224x400"])
    batch = _collate(cfg, ds)
    assert batch["pixel_values"].shape == (2, 6, 224, 400, 3)
    assert batch["bev_map"].shape == (2, 200, 200, 8)
    assert batch["camera_param"].shape == (2, 6, 3, 7)
    assert batch["input_ids"].shape == (2, 77)
    assert batch["uncond_ids"].shape == (1, 77)
    (b,) = (batch["branches"] if False else [batch["branches"][0]])
    assert b["cond"].shape == (2, 200, 200, 8)
    boxes = b["bboxes_3d"]
    assert boxes["bboxes"].shape == (2, 6, 160, 8, 3)
    assert boxes["masks"].any()
    # caption template contains location
    assert "singapore" in batch["captions"][0] or "boston" in batch["captions"][0]


def test_collate_dual_branch_and_fgm(ds):
    cfg = load_config(CONFIG_DIR, overrides=["+exp=dual_branch_augloss_fusion"])
    batch = _collate(cfg, ds)
    assert len(batch["branches"]) == 2
    b0, b1 = batch["branches"]
    assert b0["cond"].shape == (2, 224, 400 * 6, 3)  # occ panorama
    assert b1["cond"] is None  # device-side ORS
    assert batch["occ_labels"].shape == (2, 200, 200, 16)
    assert b1["bboxes_3d"]["bboxes"].shape == (2, 1, 160, 40, 3)  # map-vec 40pt
    assert "fgm" in batch
    assert batch["fgm"]["bboxes"].shape == (2, 6, 160, 8, 3)
    assert batch["fgm"]["lidar2image"].shape == (2, 6, 4, 4)


def test_collate_aug_text(ds):
    cfg = load_config(CONFIG_DIR, overrides=["+exp=occ_bg_augtext"])
    batch = _collate(cfg, ds)
    assert len(batch["captions"]) == 2 * 6  # per-view captions
    assert batch["input_ids"].shape == (12, 77)


def test_collate_inference_without_images(ds):
    cfg = load_config(CONFIG_DIR, overrides=["+exp=occ_bg"])
    samples = []
    for i in range(2):
        s = dict(ds[i])
        del s["img"]
        samples.append(s)
    tok = HashTokenizer()
    batch = collate_fn(samples, cfg, tok, is_train=False)
    assert "pixel_values" not in batch
    assert batch["branches"][0]["cond"] is not None


def test_clip_bpe_tokenizer_with_mini_vocab(tmp_path):
    """Exercise the real BPE code path with a miniature vocab."""
    import json

    from dualdiff_tpu.data.tokenizer import CLIPBPETokenizer, build_tokenizer

    # byte-level symbols for ascii letters survive bytes_to_unicode unchanged
    words = ["a", "b", "c", "d", "r", "i", "v", "e", "n", "g",
             "a</w>", "b</w>", "c</w>", "d</w>", "r</w>", "i</w>", "v</w>",
             "e</w>", "n</w>", "g</w>", "dr", "dri", "driv", "drive</w>"]
    vocab = {w: i for i, w in enumerate(words)}
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    merges = "#version\nd r\ndr i\ndri v\ndriv e</w>\n"
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(merges)
    tok = CLIPBPETokenizer(str(tmp_path / "vocab.json"),
                           str(tmp_path / "merges.txt"))
    ids = tok.encode("drive")
    assert ids == [vocab["drive</w>"]]  # merges collapsed the word
    ids2 = tok.encode("vice")  # no merges -> per-char with end-of-word
    assert ids2 == [vocab["v"], vocab["i"], vocab["c"], vocab["e</w>"]]
    batch = tok(["drive"])
    assert batch.shape == (1, 77)
    assert batch[0, 0] == 49406 and batch[0, 2] == 49407

    found = build_tokenizer(str(tmp_path))
    assert isinstance(found, CLIPBPETokenizer)


def test_occ_panorama_size_adaptation():
    from dualdiff_tpu.data.collate import _fit_occ_panorama

    rng = np.random.default_rng(0)
    # 432x768 cache -> 256x704 (hd_crop path)
    pano = rng.random((432, 768 * 6, 3)).astype(np.float32)
    out = _fit_occ_panorama(pano, (256, 704))
    assert out.shape == (256, 704 * 6, 3)
    # view 0 content comes from the bottom-center of cache view 0
    np.testing.assert_allclose(out[:, :704],
                               pano[176:, 32:736])
    # 224x400 cache -> 192x384 (drive-wm path)
    pano2 = rng.random((224, 400 * 6, 3)).astype(np.float32)
    out2 = _fit_occ_panorama(pano2, (192, 384))
    assert out2.shape == (192, 384 * 6, 3)
    # same size passes through untouched
    np.testing.assert_array_equal(_fit_occ_panorama(pano2, (224, 400)), pano2)


def test_random_flip_applied_through_collate(ds):
    """Flip aug wired through the trainer's collate path (reference
    RandomFlip3DwithViews, pipeline.py:528-735)."""
    from dualdiff_tpu.data.augment import random_flip_3d_with_views

    s = ds[0]
    rng = np.random.default_rng(0)
    flipped = random_flip_3d_with_views(dict(s), rng, flip_ratio=1.0)
    # images mirrored + left/right views swapped
    np.testing.assert_allclose(flipped["img"][1], s["img"][1][:, ::-1])
    np.testing.assert_allclose(flipped["img"][0], s["img"][2][:, ::-1])
    # boxes y/yaw negated
    if len(s["gt_bboxes_3d"]):
        np.testing.assert_allclose(flipped["gt_bboxes_3d"][:, 1],
                                   -s["gt_bboxes_3d"][:, 1])
    # projection consistency survives the flip
    np.testing.assert_allclose(
        flipped["lidar2image"],
        flipped["camera_intrinsics"] @ flipped["lidar2camera"],
        rtol=1e-4, atol=1e-3)
    # ratio 0 is identity (the default-config path)
    same = random_flip_3d_with_views(dict(s), rng, flip_ratio=0.0)
    np.testing.assert_array_equal(same["img"], s["img"])
    # and the flipped sample still collates
    cfg = load_config(CONFIG_DIR, overrides=["+exp=224x400"])
    batch = collate_fn([flipped], cfg, HashTokenizer(),
                       rng=np.random.default_rng(0))
    assert batch["pixel_values"].shape[0] == 1


def test_trainer_collate_flip_wiring(ds):
    """cfg.dataset.augment3d.flip_ratio=1 actually flips inside
    _collate_items (was implemented-but-unwired in round 1)."""
    from dualdiff_tpu.data.tokenizer import HashTokenizer as HT

    from dualdiff_tpu.runner.trainer import MultiviewTrainer

    class Stub:  # trainer duck-type: only cfg + tokenizer are used
        _augment_items = MultiviewTrainer._augment_items

    stub = Stub()
    stub.cfg = load_config(
        CONFIG_DIR, overrides=["+exp=224x400",
                               "dataset.augment3d.flip_ratio=1.0"])
    stub.tokenizer = HT()
    rng = np.random.default_rng(0)
    batch = MultiviewTrainer._collate_items(stub, [ds[0]], rng)
    ref = collate_fn([ds[0]], stub.cfg, HT(), rng=np.random.default_rng(0))
    assert not np.allclose(batch["pixel_values"], ref["pixel_values"])


def test_object_range_filter():
    from dualdiff_tpu.data.augment import object_range_filter

    boxes = np.array([
        [10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.2],     # inside
        [60.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.2],     # x out
        [0.0, -55.0, -1.0, 4.0, 2.0, 1.5, 4.0],    # y out
        [-20.0, 20.0, -1.0, 4.0, 2.0, 1.5, 4.0],   # inside, yaw wraps
    ], np.float32)
    labels = np.arange(4)
    pcr = [-50, -50, -5, 50, 50, 3]
    fb, fl, keep = object_range_filter(boxes, labels, pcr)
    assert list(fl) == [0, 3]
    assert keep.tolist() == [True, False, False, True]
    # yaw normalized to [-pi, pi)
    assert (-np.pi <= fb[:, 6]).all() and (fb[:, 6] < np.pi).all()
    np.testing.assert_allclose(fb[1, 6], 4.0 - 2 * np.pi, rtol=1e-6)
    # empty input passes through
    eb, el, ek = object_range_filter(np.zeros((0, 7)), np.zeros((0,)), pcr)
    assert len(eb) == 0 and len(ek) == 0


def test_prefetch_map_order_and_overlap():
    """prefetch_map yields results in input order and actually overlaps
    work (role of the reference's DataLoader workers)."""
    import time

    from dualdiff_tpu.data.prefetch import prefetch_map

    # order + completeness, serial and parallel
    items = list(range(20))
    assert list(prefetch_map(lambda x: x * x, items, 0)) == \
        [x * x for x in items]
    assert list(prefetch_map(lambda x: x * x, items, 4, depth=3)) == \
        [x * x for x in items]

    # overlap: producer work (sleep in a GIL-releasing call) hides behind
    # consumer work.  serial ~ n*(a+b); prefetched ~ n*max(a,b)
    a = b = 0.03
    n = 8

    def produce(i):
        time.sleep(a)
        return i

    t0 = time.perf_counter()
    for _ in prefetch_map(produce, range(n), num_workers=1, depth=2):
        time.sleep(b)
    overlapped = time.perf_counter() - t0
    assert overlapped < n * (a + b) * 0.8, overlapped

    # exceptions surface to the consumer
    def boom(i):
        if i == 3:
            raise ValueError("x")
        return i

    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(prefetch_map(boom, range(6), num_workers=2))


def test_trainer_batch_plan_determinism():
    """The planned schedule + per-batch rng make prefetched training
    reproducible regardless of worker count."""
    from dualdiff_tpu.data.tokenizer import HashTokenizer
    from dualdiff_tpu.runner.trainer import MultiviewTrainer

    class Stub:
        _collate_items = MultiviewTrainer._collate_items
        _augment_items = MultiviewTrainer._augment_items
        cache_cond = None

    stub = Stub()
    stub.cfg = load_config(CONFIG_DIR, overrides=["+exp=224x400"])
    stub.cfg.runner.train_batch_size = 2
    stub.train_set = SyntheticNuScenes(num_samples=6)
    stub.tokenizer = HashTokenizer()

    plans = list(MultiviewTrainer._batch_plan(stub, epoch=0))
    assert len(plans) == 3
    assert plans == list(MultiviewTrainer._batch_plan(stub, epoch=0))
    b1 = MultiviewTrainer._build_host_batch(stub, plans[1])
    b1_again = MultiviewTrainer._build_host_batch(stub, plans[1])
    np.testing.assert_array_equal(np.asarray(b1["pixel_values"]),
                                  np.asarray(b1_again["pixel_values"]))
