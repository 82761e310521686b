"""End-to-end slice: gender-classifier recipe on the synthetic fixture.

Exercises config -> scanner -> manifests -> dataset pipelines -> fbank ->
normalizer -> x-vector -> classifier -> jitted adam steps -> plateau lr ->
checkpointing -> evaluation. The fixture's M/F classes differ by pitch, so
a working pipeline must reach low error quickly.
"""

import os

import numpy as np
import pytest

from speech_anonymization_tpu.recipes import gender_classifier as recipe
from tests.fixtures import make_fake_librispeech


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ls"))
    make_fake_librispeech(root, utts_per_speaker=6, duration_s=0.8)
    out = str(tmp_path_factory.mktemp("results"))
    argv = [
        os.path.join(os.path.dirname(__file__), "..", "configs", "gender_classifier.yaml"),
        "--data_folder", root,
        "--train_splits", '["train-clean"]',
        "--dev_splits", '["train-clean"]',
        "--test_splits", '["train-clean"]',
        "--train_csv", os.path.join(root, "train-clean.csv"),
        "--valid_csv", os.path.join(root, "train-clean.csv"),
        "--test_csv", os.path.join(root, "train-clean.csv"),
        "--output_folder", out,
        "--save_folder", os.path.join(out, "save"),
        "--train_log", os.path.join(out, "train_log.txt"),
        "--batch_size", "8",
        "--number_of_epochs", "6",
        "--emb_dim", "32",
    ]
    brain = recipe.main(argv)
    return brain, out


def test_recipe_learns_gender(trained):
    brain, out = trained
    assert brain.test_stats["error"] <= 0.25, f"gender error too high: {brain.test_stats}"


def test_recipe_artifacts(trained):
    brain, out = trained
    log = os.path.join(out, "train_log.txt")
    assert os.path.exists(log)
    lines = open(log).read().strip().splitlines()
    assert any(line.startswith("Epoch: 1") for line in lines)
    assert any("Epoch loaded" in line for line in lines)
    # label encoder persisted in reference format
    enc = open(os.path.join(out, "save", "label_encoder.txt")).read()
    assert "=>" in enc
    # checkpoints kept by min error
    ckpts = os.listdir(os.path.join(out, "save", "ckpts"))
    assert any(c.startswith("CKPT") for c in ckpts)
    # hyperparams snapshot + env log
    assert os.path.exists(os.path.join(out, "hyperparams.yaml"))
    assert os.path.exists(os.path.join(out, "env.log"))
