import os

import pytest

from dualdiff_tpu.utils.config import ConfigNode, load_config, merge, to_dict

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_compose_root():
    cfg = load_config(CONFIG_DIR)
    assert cfg.model.name == "SDv1.5mv-rawbox"
    assert cfg.dataset.image_size == [224, 400]
    assert cfg.runner.train_batch_size == 3
    assert cfg.use_dual_controlnet is False


def test_interpolation_absolute_and_relative():
    cfg = load_config(CONFIG_DIR)
    # ${dataset.neighboring_view_pair} absolute
    assert cfg.model.unet.neighboring_view_pair[0] == [5, 1]
    # ${..crossview_attn_type} relative (one level up inside model/)
    assert cfg.model.unet.crossview_attn_type == "basic"
    # ${...bbox_mode} three levels up
    assert cfg.model.controlnet.bbox_embedder_param.mode == "all-xyz"
    # projname interpolates model.name
    assert cfg.projname == "SDv1.5mv-rawbox"


def test_exp_overlay():
    cfg = load_config(CONFIG_DIR, overrides=["+exp=dual_branch_augloss_fusion"])
    assert cfg.task_id == "dual_branch_augloss_fusion"
    assert cfg.use_dual_controlnet is True
    assert cfg.use_aug_loss is True
    assert cfg.use_map_vec == [False, True]
    assert cfg.model.controlnet.use_txt_con_fusion is True
    assert cfg.runner.learning_rate == 4.0e-5
    # inherited from 224x400 base overlay
    assert cfg.runner.num_train_epochs == 350


def test_dotted_override_and_group_swap():
    cfg = load_config(
        CONFIG_DIR,
        overrides=["runner=debug", "seed=7", "model.unet.layers_per_block=3"],
    )
    assert cfg.runner.max_train_steps == 2
    assert cfg.seed == 7
    assert cfg.model.unet.layers_per_block == 3


def test_every_exp_overlay_composes():
    # every overlay group (exp, exp-hd, exp-drive-wm, ...), not just exp/:
    # exp-hd chains a root-absolute default (`- /exp/...`, hydra semantics)
    # that the composer must resolve against the config root
    for group in sorted(d for d in os.listdir(CONFIG_DIR)
                        if d.startswith("exp")
                        and os.path.isdir(os.path.join(CONFIG_DIR, d))):
        for name in sorted(os.listdir(os.path.join(CONFIG_DIR, group))):
            stem = name[: -len(".yaml")]
            cfg = load_config(CONFIG_DIR, overrides=[f"+{group}={stem}"])
            assert cfg.task_id, f"{group}/{stem}"


def test_exp_hd_inherits_flagship_flags():
    """+exp-hd=256x704 composes the full dual-branch flagship via its
    root-absolute default, with the HD geometry on top."""
    cfg = load_config(CONFIG_DIR, overrides=["+exp-hd=256x704"])
    assert list(cfg.dataset.image_size) == [256, 704]
    assert bool(cfg.model.controlnet.use_txt_con_fusion)  # from flagship
    assert bool(cfg.use_aug_loss)
    assert list(cfg.dataset.back_resize) == [896, 1600]


def test_merge_semantics():
    base = ConfigNode({"a": {"b": 1, "c": 2}, "l": [1, 2]})
    merge(base, {"a": {"b": 9}, "l": [3]})
    assert to_dict(base) == {"a": {"b": 9, "c": 2}, "l": [3]}


def test_missing_interp_raises():
    cfg = ConfigNode({"x": "${nope.key}"})
    from dualdiff_tpu.utils.config import _resolve_tree

    with pytest.raises(KeyError):
        _resolve_tree(cfg, cfg, [])


def test_group_selection_does_not_clobber_exp_patches():
    """Hydra ordering: a group re-selection (part of the defaults list)
    applies BEFORE ``+exp=`` overlays regardless of CLI order, so an exp's
    patches inside that group (video_16f's runner.train_batch_size=1)
    survive a ``runner=default`` on the CLI."""
    for order in (["+exp=video_16f", "runner=default"],
                  ["runner=default", "+exp=video_16f"]):
        cfg = load_config(CONFIG_DIR, overrides=order)
        assert int(cfg.runner.train_batch_size) == 1, order  # exp patch wins
        # the re-selected group is otherwise in effect (default, not debug:
        # default leaves max_train_steps null and runs by epochs)
        assert cfg.runner.max_train_steps is None, order


def test_per_network_remat_min_tokens():
    """unet/controlnet_remat_min_tokens override the shared key when set,
    inherit it when null (ADVICE r3: the two networks' HBM/replay tradeoffs
    differ — the ControlNet has no up path to replay)."""
    from dualdiff_tpu.runner.factory import _remat_min_tokens

    cfg = load_config(CONFIG_DIR, overrides=["runner.remat_min_tokens=200"])
    assert _remat_min_tokens(cfg, "unet_remat_min_tokens") == 200
    assert _remat_min_tokens(cfg, "controlnet_remat_min_tokens") == 200

    cfg = load_config(CONFIG_DIR, overrides=[
        "runner.remat_min_tokens=200",
        "runner.unet_remat_min_tokens=0",
        "runner.controlnet_remat_min_tokens=5000"])
    assert _remat_min_tokens(cfg, "unet_remat_min_tokens") == 0
    assert _remat_min_tokens(cfg, "controlnet_remat_min_tokens") == 5000


def test_eval_preset_configs_load():
    """The three canned eval entry presets (reference configs/
    {test_config,test_fid,explore_config}.yaml — VERDICT r4 missing #2)
    compose on top of the root config and still accept overlays."""
    cfg = load_config(CONFIG_DIR, name="test_config",
                      overrides=["+exp=224x400"])
    assert int(cfg.runner.validation_batch_size) == 4
    assert bool(cfg.runner.validation_show_box)
    assert "test" in str(cfg.log_root_prefix)
    assert cfg.task_id == "224x400"  # exp overlay still applies

    cfg = load_config(CONFIG_DIR, name="test_fid")
    assert "fid" in cfg and cfg.fid.get("ratio") == -1
    assert "fid" in str(cfg.log_root_prefix)

    cfg = load_config(CONFIG_DIR, name="explore_config")
    assert int(cfg.runner.validation_batch_size) == 1
    assert int(cfg.runner.bbox_add_num) == 0
    assert cfg.runner.validation_index == [204, 912, 1828, 2253, 4467, 5543]
    assert cfg.explore_t == 500


def test_pop_config_name():
    """``--config-name`` parsing for the tool CLIs (all accepted hydra
    spellings; everything else passes through untouched)."""
    from dualdiff_tpu.utils.config import pop_config_name

    for argv in (["--config-name", "test_config", "+exp=224x400"],
                 ["--config-name=test_config", "+exp=224x400"],
                 ["-cn", "test_config", "+exp=224x400"],
                 ["+exp=224x400", "-cn=test_config"]):
        name, rest = pop_config_name(argv)
        assert name == "test_config" and rest == ["+exp=224x400"], argv
    name, rest = pop_config_name(["a.b=1"])
    assert name == "config" and rest == ["a.b=1"]


def test_rgd_stage2_is_lora_only():
    """+exp=rgd_stage2 must freeze everything except LoRA (arXiv
    2505.01857): the shipped overlay forgot trainable_state=lora_only
    through r4, silently training only_new + both ControlNets with
    8.5 GB of trainable/optimizer state (r5 OOM diagnosis)."""
    cfg = load_config(CONFIG_DIR, overrides=["+exp=rgd_stage2"])
    assert str(cfg.model.unet.trainable_state) == "lora_only"
    assert int(cfg.video.lora_rank) > 0 and bool(cfg.video.rgd.enable)
