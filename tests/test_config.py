"""Config system: _base_ inheritance, merges, overrides, builders.

Covers the capability of the reference's mmcv Config usage
(/root/reference/tools/train.py:72-74 and configs/)."""

import os

import pytest

from raggesture_tpu.config import Config, deep_merge, parse_option_value
from raggesture_tpu.builders import (
    arch_config_from,
    beatx_config_from,
    optim_config_from,
    retrieval_config_from,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, "configs/raggesture_beatx/basegesture_len150_beat.py")
SPK2 = os.path.join(REPO, "configs/raggesture_beatx/basegesture_len150_beat_spk2.py")


def test_deep_merge_semantics():
    base = {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": 3}
    over = {"a": {"y": 5}, "b": [9]}
    out = deep_merge(base, over)
    assert out == {"a": {"x": 1, "y": 5}, "b": [9], "c": 3}
    # _delete_ replaces instead of merging
    out = deep_merge(base, {"a": {"_delete_": True, "z": 7}})
    assert out["a"] == {"z": 7}


def test_parse_option_value():
    assert parse_option_value("1") == 1
    assert parse_option_value("1.5") == 1.5
    assert parse_option_value("true") is True
    assert parse_option_value("none") is None
    assert parse_option_value("a,b") == ["a", "b"]
    assert parse_option_value("1,2") == [1, 2]
    assert parse_option_value("hello") == "hello"


def test_flagship_config_loads():
    cfg = Config.fromfile(FLAGSHIP)
    # dataset base was inherited
    assert cfg.data.samples_per_device == 128
    assert cfg.data.train.split == "train"
    # model hyperparameters (reference basegesture_len150_beat.py:32-158)
    assert cfg.model.model.latent_dim == 512
    assert cfg.model.diffusion_test.respace == "15,15,8,6,6"
    arch = arch_config_from(cfg.model)
    assert arch.denoiser.num_tokens == 43
    assert arch.denoiser.num_layers == 8
    assert arch.codec.lowertrans_num_heads == 8
    assert arch.scale_func.coarse_scale == 6.5
    d = beatx_config_from(cfg.data.train)
    assert d.pose_length == 150 and d.stride == 5
    r = retrieval_config_from(cfg.model.model)
    assert r.num_retrieval == 1 and r.topk == 2 and r.stratification_interval == 15
    o = optim_config_from(cfg, total_steps=100)
    assert o.lr == 1e-4 and o.grad_clip is None


def test_spk2_variant_overrides():
    cfg = Config.fromfile(SPK2)
    assert cfg.checkpoint_config.interval == 5
    assert arch_config_from(cfg.model).denoiser.num_speakers == 1
    assert list(cfg.data.train.training_speakers) == [2]
    # non-overridden keys still inherited from the flagship
    assert cfg.model.model.latent_dim == 512
    assert cfg.model.diffusion_test.num_inference_timesteps == 50


def test_cli_overrides_and_dump(tmp_path):
    cfg = Config.fromfile(FLAGSHIP)
    cfg.merge_option_strings([
        "model.diffusion_test.num_inference_timesteps=25",
        "runner.max_epochs=3",
        "data.train.tiny=true",
    ])
    assert cfg.model.diffusion_test.num_inference_timesteps == 25
    assert cfg.data.train.tiny is True
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.runner.max_epochs == 3
    assert cfg2.model.model.latent_dim == 512


def test_registry_build():
    from raggesture_tpu.registry import Registry, build_from_cfg

    R = Registry("test")

    @R.register_module()
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg({"type": "Thing", "a": 1}, R)
    assert (obj.a, obj.b) == (1, 2)
    with pytest.raises(KeyError):
        build_from_cfg({"type": "Missing"}, R)


def test_option_value_brackets_and_quotes():
    """mmcv DictAction parity: commas inside brackets/quotes stay part of
    one literal; top-level commas still make lists."""
    from raggesture_tpu.config import parse_option_value

    assert parse_option_value("[64,128]") == [64, 128]
    assert parse_option_value("(1,2)") == (1, 2)
    assert parse_option_value("[1,2],[3,4]") == [[1, 2], [3, 4]]
    assert parse_option_value("'x,y'") == "x,y"
    assert parse_option_value("1,2,3") == [1, 2, 3]
    assert parse_option_value("{'a': 1, 'b': 2}") == {"a": 1, "b": 2}


def test_merge_option_rejects_scalar_intermediate(tmp_path):
    """A typo'd dotted path must not silently clobber an existing scalar
    (mmcv merge_from_dict errors here too)."""
    import pytest

    from raggesture_tpu.config import Config

    cfg = Config.fromdict({"optimizer": {"lr": 1e-4}})
    with pytest.raises(KeyError, match="optimizer.lr"):
        cfg.merge_option_strings(["optimizer.lr.warmup=5"])
    assert cfg.optimizer.lr == 1e-4  # untouched


def test_annotated_config_assignments_stay_clean(tmp_path):
    """`lr: float = 1e-4` must not leak an __annotations__ key into the
    config (it would make dump() unloadable)."""
    from raggesture_tpu.config import Config

    p = tmp_path / "cfg.py"
    p.write_text("lr: float = 1e-4\nname = 'x'\n")
    cfg = Config.fromfile(str(p))
    assert "__annotations__" not in cfg.to_dict()
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.lr == 1e-4 and cfg2.name == "x"
