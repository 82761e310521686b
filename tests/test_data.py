"""Data layer tests: scanner, manifests, dataset pipelines, padded batches."""

import os

import numpy as np
import pytest

from speech_anonymization_tpu.data import (
    CategoricalEncoder,
    DynamicItemDataset,
    PaddedBatch,
    SaveableDataLoader,
    prepare_librispeech,
    read_audio,
    write_wav,
)
from speech_anonymization_tpu.data.dataset import make_buckets
from tests.fixtures import make_fake_librispeech


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("LibriSpeech"))
    make_fake_librispeech(root)
    prepare_librispeech(
        root,
        tr_splits=["train-clean"],
        save_folder=root,
        merge_lst=["train-clean"],
        merge_name="train.csv",
    )
    return root


def test_wav_roundtrip(tmp_path):
    wav = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    path = str(tmp_path / "x.wav")
    write_wav(path, wav)
    back, sr = read_audio(path, return_sr=True)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1e-4)


def test_prepare_librispeech_csv(corpus):
    csv_path = os.path.join(corpus, "train-clean.csv")
    assert os.path.exists(csv_path)
    ds = DynamicItemDataset.from_csv(csv_path)
    assert len(ds) == 12  # 4 speakers x 3 utts
    item = ds[0]
    assert set(item) >= {"duration", "wav", "spk_id", "sex", "wrd", "id"}
    assert item["sex"] in ("M", "F")
    assert len(item["wrd"].split()) == 3


def test_dynamic_pipeline_and_padded_batch(corpus):
    ds = DynamicItemDataset.from_csv(os.path.join(corpus, "train.csv"))
    ds.add_dynamic_item(lambda wav: read_audio(wav), takes=["wav"], provides=["sig"])
    ds.set_output_keys(["id", "sig", "sex"])
    loader = SaveableDataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batch = next(iter(loader))
    wavs, lens = batch.sig
    assert wavs.shape[0] == 4 and wavs.ndim == 2
    assert lens.max() == 1.0 and lens.min() > 0.5
    assert len(batch) == 4


def test_filtered_sorted(corpus):
    ds = DynamicItemDataset.from_csv(os.path.join(corpus, "train.csv"))
    sorted_ds = ds.filtered_sorted(sort_key="duration")
    durs = [sorted_ds.data[i]["duration"] for i in sorted_ds.ids]
    assert durs == sorted(durs)
    top = ds.filtered_sorted(sort_key="duration", reverse=True, select_n=3)
    assert len(top) == 3


def test_bucketing_pads_to_grid(corpus):
    ds = DynamicItemDataset.from_csv(os.path.join(corpus, "train.csv"))
    ds.add_dynamic_item(lambda wav: read_audio(wav), takes=["wav"], provides=["sig"])
    ds.set_output_keys(["id", "sig"])
    buckets = make_buckets(8000, 32000, growth=1.3)
    loader = SaveableDataLoader(ds, batch_size=3, bucket_map={"sig": buckets})
    shapes = {next(iter(loader)).sig[0].shape[1] for _ in range(3)}
    assert shapes <= set(buckets)


def test_categorical_encoder_roundtrip(tmp_path):
    enc = CategoricalEncoder()
    enc.update_from_iterable(["M", "F", "M"])
    assert enc.encode_label("M") == 0 and enc.encode_label("F") == 1
    p = str(tmp_path / "label_encoder.txt")
    enc.save(p)
    enc2 = CategoricalEncoder()
    enc2.load(p)
    assert enc2.lab2ind == {"M": 0, "F": 1}


def test_label_encoder_reads_reference_format(tmp_path):
    p = str(tmp_path / "label_encoder.txt")
    with open(p, "w") as f:
        f.write("'M' => 0\n'F' => 1\n================\n")
    enc = CategoricalEncoder()
    enc.load(p)
    assert enc.decode_index(1) == "F"


def test_loader_position_checkpointing(corpus):
    ds = DynamicItemDataset.from_csv(os.path.join(corpus, "train.csv"))
    ds.set_output_keys(["id", "duration"])
    loader = SaveableDataLoader(ds, batch_size=2)
    it = iter(loader)
    next(it)
    next(it)
    state = loader.state_dict()
    loader2 = SaveableDataLoader(ds, batch_size=2)
    loader2.load_state_dict(state)
    remaining = sum(1 for _ in loader2)
    assert remaining == len(loader) - 2 + 1  # resumes AT saved position
