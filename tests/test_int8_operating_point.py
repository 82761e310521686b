"""int8 KV-cache WER parity at a REAL operating point (VERDICT r3 #4).

The recipe-level parity gate in tests/test_recipe_asr.py decodes an
overfit train split where WER sits at/near zero on both sides, so its
assertion has little room to fail. Here the tiny ASR trains on the
synthetic formant corpus (words ARE in the audio — data/synth.py) and
decodes DISJOINT held-out speakers, where WER is materially nonzero, then
re-decodes the same checkpoints with ``decode_cache_dtype: int8``. The
quantization (rel err ~6e-3 per position) may flip near-tie beams but
must not move the task metric.
"""

import os

import numpy as np
import pytest

from speech_anonymization_tpu.data.synth import build_corpus
from speech_anonymization_tpu.recipes import asr_train as recipe

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "transformer.yaml")

# small-but-real: 12 train + 6 held-out speakers, 12 utts each; enough
# decode words (6*12*4 = 288) that one flipped word is ~0.35% WER
TINY = [
    "--d_model", "64", "--nhead", "4", "--num_encoder_layers", "2",
    "--num_decoder_layers", "2", "--d_ffn", "128", "--output_neurons", "40",
    "--valid_beam_size", "2", "--test_beam_size", "4",
    "--valid_search_interval", "100",
    "--lr_adam", "0.35", "--n_warmup_steps", "60",
]


def _argv(root, out, extra):
    csv = os.path.join(root, "train-clean.csv")
    return [
        CFG,
        "--data_folder", root,
        "--train_splits", '["train-clean"]',
        "--dev_splits", '["train-clean"]',
        "--test_splits", '["test-clean"]',
        "--train_csv", csv,
        "--valid_csv", csv,
        "--test_csv", f'["{os.path.join(root, "test-clean.csv")}"]',
        "--output_folder", out,
        "--save_folder", os.path.join(out, "save"),
        "--train_log", os.path.join(out, "train_log.txt"),
        "--batch_size", "8",
        "--gradient_accumulation", "1",
    ] + TINY + extra


@pytest.fixture(scope="module")
def heldout_trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    build_corpus(root, n_train_spk=6, n_test_spk=3, utts=12, seed=11)
    out = str(tmp_path_factory.mktemp("asr_out"))
    brain = recipe.main(_argv(root, out, ["--number_of_epochs", "10"]))
    return brain, root, out


def test_int8_wer_parity_heldout(heldout_trained):
    brain, root, out = heldout_trained
    wer_f32 = float(brain.test_stats["WER"])
    # the gate is only meaningful at a non-degenerate operating point:
    # materially nonzero error, but far from all-garbage
    assert 2.0 < wer_f32 < 90.0, wer_f32

    brain8 = recipe.main(_argv(root, out, [
        "--number_of_epochs", "10",
        "--decode_cache_dtype", "int8",
        "--eval_only", "true",
    ]))
    wer_int8 = float(brain8.test_stats["WER"])
    assert np.isfinite(wer_int8)
    # 288 decode words -> 2.5% absolute = ~7 near-tie word flips of slack
    assert abs(wer_int8 - wer_f32) <= 2.5, (wer_f32, wer_int8)
