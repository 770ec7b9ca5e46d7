"""Config loader + DI builder tests."""

import os

import pytest
import yaml

from speaker3d_tpu.utils.builder import Builder, build, dynamic_import
from speaker3d_tpu.utils.config import Config, build_config, parse_overrides


def test_parse_overrides():
    out = parse_overrides(["--lr=0.1", "--exp_dir", "exp/foo",
                           "--flag=true", "--n=3"])
    assert out == {"lr": 0.1, "exp_dir": "exp/foo", "flag": True, "n": 3}


def test_build_config_snapshot(tmp_path):
    cfg_path = os.path.join(tmp_path, "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"exp_dir": os.path.join(tmp_path, "exp"),
                        "lr": 0.2}, f)
    cfg = build_config(cfg_path, ["--lr=0.5"], copy_to_exp_dir=True)
    assert cfg["lr"] == 0.5
    snap = os.path.join(tmp_path, "exp", "config.yaml")
    assert os.path.isfile(snap)
    assert yaml.safe_load(open(snap))["lr"] == 0.5


def test_dynamic_import():
    cls = dynamic_import("speaker3d_tpu.models.xvector.Xvector")
    assert cls.__name__ == "Xvector"


def test_builder_obj_and_refs():
    config = Config({
        "n_mels": 80,
        "fbank": {"obj": "speaker3d_tpu.ops.fbank.FBank",
                  "args": {"n_mels": "<n_mels>", "sample_rate": 16000}},
        "wrapper": {"obj": "speaker3d_tpu.utils.checkpoint.EpochCounter",
                    "args": {"limit": "<n_mels>"}},
        "path": "exp/<n_mels>/models",
    })
    b = Builder(config)
    fb = b.build("fbank")
    assert fb.n_mels == 80
    assert b.build("fbank") is fb  # cached
    assert b.build("wrapper").limit == 80
    assert b.build("path") == "exp/80/models"
    assert build("fbank", config).n_mels == 80


def test_builder_cycle_detection():
    config = Config({"a": "<b>", "b": "<a>"})
    with pytest.raises(ValueError, match="circular"):
        Builder(config).build("a")


def test_builder_nested_structures():
    config = Config({
        "inner": {"obj": "speaker3d_tpu.utils.checkpoint.EpochCounter",
                  "args": {"limit": 3}},
        "lst": ["<inner>", 5, {"k": "<inner>"}],
    })
    b = Builder(config)
    lst = b.build("lst")
    assert lst[0].limit == 3 and lst[1] == 5 and lst[2]["k"].limit == 3


def test_der_cli(tmp_path, capsys):
    from speaker3d_tpu.cli.compute_der import main as der_main

    ref = os.path.join(tmp_path, "ref.rttm")
    hyp = os.path.join(tmp_path, "hyp.rttm")
    with open(ref, "w") as f:
        f.write("SPEAKER f1 0 0.0 10.0 <NA> <NA> A <NA> <NA>\n")
        f.write("SPEAKER f1 0 10.0 10.0 <NA> <NA> B <NA> <NA>\n")
    with open(hyp, "w") as f:
        f.write("SPEAKER f1 0 0.0 10.0 <NA> <NA> 0 <NA> <NA>\n")
        f.write("SPEAKER f1 0 10.0 10.0 <NA> <NA> 1 <NA> <NA>\n")
    der_main(["--ref", ref, "--hyp", hyp, "--collar", "0.0"])
    out = capsys.readouterr().out
    assert "DER = 0.00%" in out
