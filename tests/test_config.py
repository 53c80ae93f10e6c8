"""Config system tests: defaults, YAML overlay, CLI opts, reference-key compat."""

import textwrap

import pytest

from faceformer_tpu.config import Config, config_from_dict, config_to_dict, load_config


def test_defaults_match_reference():
    cfg = Config()
    # reference faceformer/config.py:7-51
    assert cfg.model_class == "SurfaceFormer"
    assert cfg.dataset_class == "ABCDataset"
    assert cfg.batch_size_train == 64
    assert cfg.model.num_model == 512
    assert cfg.model.num_feedforward == 1024
    assert cfg.model.dropout == 0.2
    assert cfg.model.token.length == 4
    assert cfg.model.token.face_type_offset == 1
    assert cfg.trainer.lr == 1e-3
    assert cfg.post_process.enclosedness_tol == 2e-4
    assert cfg.post_process.is_coedge is True


def test_yaml_overlay_with_reference_keys(tmp_path):
    yml = tmp_path / "ours.yml"
    yml.write_text(textwrap.dedent("""
        model_class: 'SurfaceFormer_Parallel'
        dataset_class: 'ABCDataset_Parallel'
        batch_size_train: 4
        trainer:
          lr: 1.0e-4
          num_gpus: [0]
          precision: 16
        model:
          num_lines: 216
          max_face_length: 37
          token:
            PAD: 0
            face_type_offset: 1
            len: 4
    """))
    cfg = load_config(str(yml))
    assert cfg.model_class == "SurfaceFormer_Parallel"
    assert cfg.model.num_lines == 216
    assert cfg.model.max_face_length == 37
    assert cfg.model.token.length == 4
    assert cfg.trainer.lr == 1e-4
    assert cfg.trainer.num_devices == 1
    assert cfg.trainer.precision == "bf16"


def test_cli_opts_override():
    cfg = load_config(opts=["model.num_lines", "110", "trainer.lr", "5e-4",
                            "post_process.is_coedge", "False"])
    assert cfg.model.num_lines == 110
    assert cfg.trainer.lr == 5e-4
    assert cfg.post_process.is_coedge is False


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        load_config(opts=["model.bogus", "1"])


def test_tuple_field_from_cli_string():
    # a bare scalar wraps into a 1-tuple (a raw str would be iterated
    # character-by-character downstream), a python-literal list parses
    cfg = load_config(opts=["datasets_test", "other.txt"])
    assert cfg.datasets_test == ("other.txt",)
    cfg = load_config(opts=["datasets_test", "['a.txt', 'b.txt']"])
    assert cfg.datasets_test == ("a.txt", "b.txt")


def test_roundtrip_dict():
    cfg = load_config(opts=["model.num_lines", "216"])
    again = config_from_dict(config_to_dict(cfg))
    assert again == cfg


def test_config_is_hashable():
    hash(Config())  # required: configs are closed over by jit
