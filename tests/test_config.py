"""Config loader: !ref interpolation parity with HyperPyYAML subset."""

import textwrap
from argparse import Namespace

import pytest

from speakerverification_tpu.config import load_yaml, read_config


@pytest.fixture()
def cfg_file(tmp_path):
    text = textwrap.dedent("""\
        seed: 20220709
        output_folder: !ref backup/<seed>
        save_folder: !ref <output_folder>/save
        lr: 0.003
        max_lr: !ref <lr>
        nClasses: 400
        cohort_size: !ref <nClasses> * 3
        model:
          name: ECAPA_TDNN
          nOut: 192
        classifier:
          input_size: !ref <model[nOut]>
          out_neurons: !ref <nClasses>
        pretrained:
          path: !ref <save_folder>/<model[name]>/best_state.pt
        """)
    p = tmp_path / "c.yaml"
    p.write_text(text)
    return p


def test_ref_scalar(cfg_file):
    cfg = load_yaml(cfg_file)
    assert cfg["output_folder"] == "backup/20220709"
    assert cfg["save_folder"] == "backup/20220709/save"


def test_ref_native_value(cfg_file):
    cfg = load_yaml(cfg_file)
    assert cfg["max_lr"] == 0.003
    assert isinstance(cfg["max_lr"], float)


def test_ref_arithmetic(cfg_file):
    cfg = load_yaml(cfg_file)
    assert cfg["cohort_size"] == 1200


def test_ref_nested_index(cfg_file):
    cfg = load_yaml(cfg_file)
    assert cfg["classifier"]["input_size"] == 192
    assert cfg["classifier"]["out_neurons"] == 400
    assert cfg["pretrained"]["path"] == \
        "backup/20220709/save/ECAPA_TDNN/best_state.pt"


def test_cli_overlay(cfg_file):
    # CLI args overwrite YAML keys (reference: src/utils.py:196-200).
    args = Namespace(lr=0.01, device="tpu")
    cfg = read_config(cfg_file, args)
    assert cfg["lr"] == 0.01
    assert cfg["device"] == "tpu"
    assert cfg["nClasses"] == 400


def test_reference_yaml_schema_loads():
    """Our loader must accept the reference's full config schema."""
    cfg = load_yaml("/root/reference/yaml/configuration.yaml")
    assert cfg["cohort_size"] == cfg["nClasses"] * 3
    assert cfg["dataloader_options"]["batch_size"] == cfg["batch_size"]
    assert cfg["classifier"]["input_size"] == cfg["model"]["nOut"]
    assert cfg["initial_model_infer"] == cfg["pretrained"]["path"]
    assert cfg["audio_spec"]["sample_rate"] == 8000
