"""Config system tests: tags, refs, interpolation, overrides, CLI parsing."""

import io

import pytest

from speech_anonymization_tpu.config import load_config, parse_arguments
from speech_anonymization_tpu.ops.fbank import Fbank
from speech_anonymization_tpu.train.schedulers import ReduceLROnPlateau

YAML = """
seed: 42
folder: /tmp/exp
output_folder: !ref <folder>/<seed>
n_mels: 80
compute_features: !new:Fbank
    n_mels: !ref <n_mels>
lr_annealing: !name:ReduceLROnPlateau
    factor: 0.5
alias: !ref <compute_features>
weights: [1.0, 0.5]
"""


def test_tags_refs_interpolation():
    cfg = load_config(io.StringIO(YAML))
    assert cfg["output_folder"] == "/tmp/exp/42"
    assert isinstance(cfg["compute_features"], Fbank)
    assert cfg["compute_features"].config.n_mels == 80
    sched = cfg["lr_annealing"]()  # !name: gives a factory
    assert isinstance(sched, ReduceLROnPlateau) and sched.factor == 0.5
    assert cfg["alias"] is cfg["compute_features"]  # graph ref, not a copy
    assert cfg["weights"] == [1.0, 0.5]


def test_overrides():
    cfg = load_config(io.StringIO(YAML), overrides={"seed": 7, "n_mels": 40})
    assert cfg["output_folder"] == "/tmp/exp/7"
    assert cfg["compute_features"].config.n_mels == 40


def test_unknown_tag_rejected():
    bad = "x: !new:os.system 'echo pwned'"
    with pytest.raises(KeyError):
        load_config(io.StringIO(bad))


def test_parse_arguments():
    path, run_opts, overrides = parse_arguments(
        ["cfg.yaml", "--device", "tpu", "--model_type", "endtoend", "--batch_size", "4", "--eval_only"]
    )
    assert path == "cfg.yaml"
    assert run_opts == {"device": "tpu", "eval_only": True}
    assert overrides == {"model_type": "endtoend", "batch_size": 4}


def test_circular_ref_detected():
    with pytest.raises(ValueError):
        load_config(io.StringIO("a: !ref <b>\nb: !ref <a>\n"))
