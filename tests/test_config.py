import pytest

from panopticnerf_tpu.config import Config, load_config
from panopticnerf_tpu.config.config import merge_from_file, merge_from_list


def test_defaults():
    cfg = Config()
    assert cfg.model.trunk_depth == 8
    assert cfg.data.n_rays == 2048
    assert cfg.trained_model_dir.endswith("panopticnerf/default")


def test_dotted_overrides():
    cfg = load_config(opts=["train.lr", "1e-3", "data.n_rays", "1024", "model.skips", "2,5"])
    assert cfg.train.lr == pytest.approx(1e-3)
    assert cfg.data.n_rays == 1024
    assert cfg.model.skips == (2, 5)


def test_reference_style_aliases():
    # The published reference train command's override tail must parse.
    opts = [
        "pretrain", "nerf", "gpus", "0,", "use_stereo", "True",
        "use_pspnet", "True", "use_depth", "True",
        "pseudo_filter", "True", "weight_th", "0.05", "resume", "False",
    ]
    cfg = load_config(opts=opts)
    assert cfg.train.pretrain == "nerf"
    assert cfg.data.use_stereo is True
    assert cfg.loss.weight_th == pytest.approx(0.05)
    assert cfg.train.resume is False


def test_unknown_key_rejected():
    cfg = Config()
    with pytest.raises(KeyError):
        merge_from_list(cfg, ["data.nonexistent", "1"])


def test_yaml_merge(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        "task: panopticnerf\nexp_name: seq0\n"
        "data:\n  frame_start: 3353\n  frame_num: 64\n  use_stereo: false\n"
        "render:\n  n_samples: 32\n"
    )
    cfg = Config()
    merge_from_file(cfg, str(p))
    assert cfg.exp_name == "seq0"
    assert cfg.data.frame_start == 3353
    assert cfg.data.use_stereo is False
    assert cfg.render.n_samples == 32


def test_yaml_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("data:\n  bogus: 1\n")
    with pytest.raises(KeyError):
        merge_from_file(Config(), str(p))


def test_tuple_override_syntaxes():
    from panopticnerf_tpu.config import Config
    from panopticnerf_tpu.config.config import merge_from_list

    for spec in ("16,24", "(16, 24)", "[16,24]", "16 24"):
        cfg = merge_from_list(Config(), ["data.synthetic_image_hw", spec])
        assert cfg.data.synthetic_image_hw == (16, 24), spec
    cfg = merge_from_list(Config(), ["model.skips", "(2,5)"])
    assert cfg.model.skips == (2, 5)
