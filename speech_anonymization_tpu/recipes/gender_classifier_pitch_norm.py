"""Pitch-normalized gender classifier recipe.

Reference: gender_classifier_train_pitch_norm.py — identical to the base
trainer except the audio pipeline pitch-normalizes every waveform (WORLD
analysis, shift voiced F0 mean to 500 Hz, resynthesis — :244-264) before
feature extraction, testing whether pitch alone carries the sex signal.

Host-side heavy lifting runs in the native C++ world_lite extension
(native/world_lite.cc) with an on-disk cache (the reference recomputed the
vocoder per utterance per epoch because its cache write was commented out —
SURVEY.md §3.1; the cache here is the conscious fix).
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

from ..data.audio import read_audio, write_wav
from ..data.pitch import pitch_normalize
from . import gender_classifier as base


def make_pitch_pipeline(cache_dir: str | None = None, target_f0: float = 500.0,
                        sample_rate: int = 16000, method: str = "world"):
    def audio_pipeline(wav_path):
        if cache_dir:
            key = hashlib.sha1((wav_path + ":" + method).encode()).hexdigest()[:16]
            cached = os.path.join(cache_dir, key + ".wav")
            if os.path.exists(cached):
                return read_audio(cached)
        sig, sr = read_audio(wav_path, return_sr=True)
        out = pitch_normalize(sig, sr, target_f0, method=method)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            write_wav(cached, out, sr)
        return out.astype(np.float32)

    return audio_pipeline


def main(argv=None):
    from ..config import load_config, parse_arguments
    from ..data import prepare_librispeech
    from ..parallel import run_on_main
    from ..train import Checkpointer
    from ..train.experiment import create_experiment_directory

    config_path, run_opts, overrides = parse_arguments(argv if argv is not None else sys.argv[1:])
    # multi-host entry: the ddp_init_group equivalent (no-op single-host)
    from ..parallel import initialize_distributed

    initialize_distributed()
    hparams = load_config(config_path, overrides)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    create_experiment_directory(hparams["output_folder"], config_path, overrides)
    run_on_main(
        prepare_librispeech,
        data_folder=hparams["data_folder"],
        tr_splits=hparams.get("train_splits", []),
        dev_splits=hparams.get("dev_splits", []),
        te_splits=hparams.get("test_splits", []),
        save_folder=hparams["data_folder"],
        merge_lst=hparams.get("train_splits", []),
        merge_name=hparams.get("train_csv"),
        skip_prep=hparams.get("skip_prep", False),
    )
    pipeline = make_pitch_pipeline(
        cache_dir=hparams.get("pitch_cache_dir") or os.path.join(hparams["save_folder"], "pitch_cache"),
        target_f0=float(hparams.get("pitch_target_f0", 500.0)),
        sample_rate=int(hparams.get("sample_rate", 16000)),
        # "world" (full vocoder, the reference's pw.wav2world/pw.synthesize
        # analogue) or "psola" (TD-PSOLA grains) — scripts/vocoder_ab.py
        # uses the switch to bound vocoder-implementation sensitivity
        method=str(hparams.get("pitch_method", "world")),
    )
    train_data, valid_data, test_data, _ = base.dataio_prepare(hparams, audio_pipeline=pipeline)
    train_loader, valid_loader, test_loader = base._loaders(hparams, train_data, valid_data, test_data)

    checkpointer = Checkpointer(
        hparams["save_folder"] + "/ckpts",
        async_writes=bool(hparams.get("async_checkpointing", True)),
    )
    brain = base.GenderBrain(hparams, checkpointer=checkpointer)
    brain.init_state(brain._device_batch(next(iter(valid_loader))))
    checkpointer.recover_if_possible()
    brain.fit(hparams["epoch_counter"], train_loader, valid_loader)
    brain.evaluate(test_loader, min_key="error")
    return brain


if __name__ == "__main__":
    main()
