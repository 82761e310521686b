"""Full-pipeline integration: train evaluator + ASR, then run the
anonymizer with BOTH attached — external privacy ACC, ASR utility
retention, and beam-search WER on recon vs orig (the reference's complete
test-time flow, speechbrain_convae_train.py:130-192)."""

import os

import numpy as np
import pytest

from speech_anonymization_tpu.recipes import anonymizer, asr_train, gender_classifier, lm_train
from tests.fixtures import make_fake_librispeech

BASE = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ls"))
    make_fake_librispeech(root, utts_per_speaker=4, duration_s=0.8, seed=5)
    return root


def _common(root, out):
    csv = os.path.join(root, "train-clean.csv")
    return [
        "--data_folder", root,
        "--train_splits", '["train-clean"]',
        "--dev_splits", '["train-clean"]',
        "--test_splits", '["train-clean"]',
        "--train_csv", csv,
        "--valid_csv", csv,
        "--output_folder", out,
        "--save_folder", os.path.join(out, "save"),
        "--train_log", os.path.join(out, "train_log.txt"),
        "--gradient_accumulation", "1",
    ]


def test_full_chain(corpus, tmp_path_factory):
    csv = os.path.join(corpus, "train-clean.csv")

    # 1) privacy evaluator
    gout = str(tmp_path_factory.mktemp("gender"))
    gb = gender_classifier.main(
        [os.path.join(BASE, "gender_classifier.yaml")]
        + _common(corpus, gout)
        + ["--test_csv", csv, "--batch_size", "8", "--number_of_epochs", "5", "--emb_dim", "32"]
    )
    assert gb.test_stats["error"] <= 0.4

    # 2) tiny utility ASR
    aout = str(tmp_path_factory.mktemp("asr"))
    asr_args = (
        [os.path.join(BASE, "transformer.yaml")]
        + _common(corpus, aout)
        + [
            "--test_csv", f'["{csv}"]',
            "--batch_size", "6", "--number_of_epochs", "2",
            "--d_model", "32", "--nhead", "4", "--num_encoder_layers", "1",
            "--num_decoder_layers", "1", "--d_ffn", "64", "--output_neurons", "64",
            "--valid_beam_size", "2", "--test_beam_size", "2",
            "--valid_search_interval", "100", "--noam_annealing", "null",
            "--lr_adam", "0.005",
        ]
    )
    ab = asr_train.main(asr_args)
    assert "WER" in ab.test_stats

    # 2b) tiny shallow-fusion LM sharing the ASR tokenizer (reference test
    # decode fuses LM 0.6 — convae.yaml:226-240)
    lout = str(tmp_path_factory.mktemp("lm"))
    lm_train.main(
        [os.path.join(BASE, "lm.yaml")]
        + _common(corpus, lout)
        + [
            "--test_csv", f'["{csv}"]',
            "--tokenizer_path", os.path.join(aout, "save", "tokenizer.json"),
            "--number_of_epochs", "2", "--batch_size", "8",
            "--output_neurons", "64",
            "--lm_d_model", "32", "--lm_nhead", "4", "--lm_num_layers", "2",
            "--lm_d_ffn", "64", "--lm_token_buckets", "[16, 32]",
            "--noam_annealing", "null", "--lm_warmup_steps", "6",
            "--lr_adam", "1.0",
        ]
    )

    # 3) anonymizer with evaluator + ASR + LM attached (train 1 epoch + test)
    nout = str(tmp_path_factory.mktemp("anon"))
    nb = anonymizer.main(
        [os.path.join(BASE, "convae.yaml")]
        + _common(corpus, nout)
        + [
            "--test_csv", f'["{csv}"]',
            "--batch_size", "4", "--number_of_epochs", "1", "--model_type", "fcae",
            "--adversarial_schedule", "null", "--recon_loss_weight", "1.0",
            "--utility_loss_weight", "0.1",
            "--external_classifier_dir", os.path.join(gout, "save", "ckpts"),
            "--evaluator_emb_dim", "32",
            "--asr_checkpoint_dir", os.path.join(aout, "save", "ckpts"),
            "--tokenizer_path", os.path.join(aout, "save", "tokenizer.json"),
            "--lm_checkpoint_dir", os.path.join(lout, "save", "ckpts"),
            "--lm_d_model", "32", "--lm_nhead", "4", "--lm_num_layers", "2",
            "--lm_d_ffn", "64",
            "--d_model", "32", "--nhead", "4", "--num_encoder_layers", "1",
            "--num_decoder_layers", "1", "--d_ffn", "64", "--output_neurons", "64",
            "--test_beam_size", "2",
        ]
    )
    # LM fusion actually wired into the decode path (lm_weight 0.6 live)
    assert nb.asr_bundle is not None and nb.asr_bundle.lm is not None
    stats = nb.test_stats
    # all four reference metrics present and sane
    assert 0.0 <= stats["ACC"] <= 1.0
    assert 0.0 <= stats["ACC_external"] <= 1.0
    assert 0.0 <= stats["ACC_external_orig"] <= 1.0
    assert -1.0 <= stats["Utility_Retention"] <= 1.0
    assert "WER" in stats and np.isfinite(stats["WER"])
    # recon-WER report written like the reference's wer_*.txt
    wer_file = os.path.join(nout, "wer_train-clean.txt")
    assert os.path.exists(wer_file)
    assert open(wer_file).readline().startswith("%WER")
    # orig-features WER also tracked (wer_metric2)
    assert nb.wer_metric2.utts


def test_recon_retrain_variant(corpus, tmp_path_factory):
    """gender_classifier_train_recon: frozen anonymizer between normalize
    and the classifier."""
    csv = os.path.join(corpus, "train-clean.csv")
    # quick anonymizer checkpoint (recon-only fcae)
    nout = str(tmp_path_factory.mktemp("anon2"))
    anonymizer.main(
        [os.path.join(BASE, "convae.yaml")]
        + _common(corpus, nout)
        + ["--test_csv", f'["{csv}"]', "--batch_size", "4", "--number_of_epochs", "1",
           "--model_type", "fcae", "--adversarial_schedule", "null"]
    )
    rout = str(tmp_path_factory.mktemp("recon_gender"))
    brain = gender_classifier.main(
        [os.path.join(BASE, "gender_classifier_recon.yaml")]
        + _common(corpus, rout)
        + ["--test_csv", csv, "--batch_size", "8", "--number_of_epochs", "2",
           "--emb_dim", "32",
           "--trained_recon_model_dir", os.path.join(nout, "save", "ckpts"),
           "--recon_model_type", "fcae"]
    )
    assert brain.recon_model is not None
    assert 0.0 <= brain.test_stats["error"] <= 1.0
