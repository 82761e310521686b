"""Trainer-infrastructure tests: schedulers, checkpointer, logger, metrics, WER."""

import io
import os

import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.eval import AccuracyStats, ErrorRateStats, SimilarityMetricsStats
from speech_anonymization_tpu.train import (
    Checkpointer,
    EpochCounter,
    FileTrainLogger,
    NoamScheduler,
    ReduceLROnPlateau,
)
from speech_anonymization_tpu.train.checkpoint import PytreeRecoverable, average_checkpoints


def test_noam_warmup_then_decay():
    s = NoamScheduler(lr_initial=1.0, n_warmup_steps=100, model_size=768)
    lrs = [s() for _ in range(300)]
    peak = max(lrs)
    assert abs(lrs.index(peak) + 1 - 100) <= 1  # peak at end of warmup
    assert lrs[-1] < peak
    assert s.n_steps == 300


def test_plateau_halves_after_patience():
    s = ReduceLROnPlateau(lr_initial=1e-3, factor=0.5, patience=2, dont_halve_until_epoch=2)
    s(1, 1.0)
    s(2, 1.1)
    s(3, 1.2)
    old, new = s(4, 1.3)  # 3rd bad epoch -> halve
    assert new == 5e-4 and old == 1e-3


def test_epoch_counter_resume():
    c = EpochCounter(5)
    it = iter(c)
    next(it)
    next(it)
    state = c.state_dict()
    c2 = EpochCounter(5)
    c2.load_state_dict(state)
    assert list(iter(c2)) == [3, 4, 5]


def test_checkpointer_keep_policy_and_averaging(tmp_path):
    params = {"w": jnp.ones((2, 2))}
    holder = {"params": params}
    ckptr = Checkpointer(
        str(tmp_path / "save"),
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: holder.update(params=p))},
    )
    for i, acc in enumerate([0.5, 0.9, 0.7]):
        holder["params"] = {"w": jnp.full((2, 2), float(i))}
        ckptr.save_and_keep_only({"ACC": acc, "epoch": i}, max_keys=["ACC"], num_to_keep=2)
    kept = ckptr.list_checkpoints()
    assert len(kept) == 2
    accs = sorted(c.meta["ACC"] for c in kept)
    assert accs == [0.7, 0.9]
    # averaging
    avg = average_checkpoints(ckptr.find_checkpoints(max_key="ACC"), "model", holder["params"])
    np.testing.assert_allclose(np.asarray(avg["w"]), np.full((2, 2), 1.5))  # (1+2)/2
    # recovery restores best
    best = ckptr.recover_if_possible(max_key="ACC")
    assert best.meta["ACC"] == 0.9
    np.testing.assert_allclose(np.asarray(holder["params"]["w"]), 1.0)


def test_logger_line_format(tmp_path):
    log = str(tmp_path / "train_log.txt")
    logger = FileTrainLogger(log)
    logger.log_stats(
        {"epoch": 2, "lr": 3.92e-4},
        train_stats={"loss": 0.963},
        valid_stats={"loss": 1.02, "ACC": 0.5},
        verbose=False,
    )
    line = open(log).read().strip()
    assert line.startswith("epoch: 2, lr: 3.92e-04 - train loss: 0.96 - valid loss: 1.02, valid ACC: 0.50")


def test_accuracy_stats():
    acc = AccuracyStats()
    lp = np.log(np.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]))
    acc.append(lp, np.asarray([0, 1, 1]))
    assert abs(acc.summarize() - 2 / 3) < 1e-9


def test_similarity_stats():
    s = SimilarityMetricsStats()
    s.append(np.asarray([0.5, 0.7]))
    s.append(np.asarray([0.9]))
    assert abs(s.peek() - 0.7) < 1e-9
    assert abs(s.summarize() - 0.7) < 1e-9


def test_wer_counts_and_report():
    wer = ErrorRateStats()
    wer.append(
        ids=["utt1", "utt2"],
        predicted=[["AND", "I", "TOLD"], ["YOU", "ARE", "A", "COOK"]],
        targets=[["HAVE", "I", "TOLD"], ["YOU", "ARE", "ACUTE"]],
    )
    s = wer.summarize()
    assert s["substitutions"] == 2 and s["insertions"] == 1 and s["deletions"] == 0
    assert abs(s["WER"] - 100.0 * 3 / 6) < 1e-9
    buf = io.StringIO()
    wer.write_stats(buf)
    text = buf.getvalue()
    assert text.startswith("%WER 50.00 [ 3 / 6, 1 ins, 0 del, 2 sub ]")
    assert "%SER 100.00 [ 2 / 2 ]" in text
    assert "<eps>" in text and "utt1, %WER" in text


def test_async_checkpointer_same_semantics(tmp_path):
    """Async mode: identical retention/averaging/recovery semantics; saves
    land via atomic rename so readers only ever see complete checkpoints."""
    holder = {"params": {"w": jnp.ones((2, 2))}}
    ckptr = Checkpointer(
        str(tmp_path / "save"),
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: holder.update(params=p))},
        async_writes=True,
    )
    for i, acc in enumerate([0.5, 0.9, 0.7]):
        holder["params"] = {"w": jnp.full((2, 2), float(i))}
        ckptr.save_and_keep_only({"ACC": acc, "epoch": i}, max_keys=["ACC"], num_to_keep=2)
    kept = ckptr.list_checkpoints()  # drains the writer
    assert len(kept) == 2
    assert sorted(c.meta["ACC"] for c in kept) == [0.7, 0.9]
    # no in-flight temp dirs left behind
    assert not [d for d in os.listdir(tmp_path / "save") if d.endswith(".tmp")]
    avg = average_checkpoints(ckptr.find_checkpoints(max_key="ACC"), "model", holder["params"])
    np.testing.assert_allclose(np.asarray(avg["w"]), np.full((2, 2), 1.5))
    best = ckptr.recover_if_possible(max_key="ACC")
    assert best.meta["ACC"] == 0.9
    np.testing.assert_allclose(np.asarray(holder["params"]["w"]), 1.0)


def test_async_checkpointer_does_not_block_on_slow_disk(tmp_path, monkeypatch):
    """The train thread must only pay for the host snapshot; serialization
    and disk writes happen on the writer thread."""
    import time as _time
    from speech_anonymization_tpu.train import checkpoint as ckpt_mod

    holder = {"params": {"w": jnp.ones((64, 64))}}
    ckptr = Checkpointer(
        str(tmp_path / "save"),
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: None)},
        async_writes=True,
    )
    slow = {"writes": 0}
    orig = ckpt_mod.Checkpointer._write_snapshot

    def slow_write(snap, tmp, path, meta):
        _time.sleep(0.5)
        slow["writes"] += 1
        orig(snap, tmp, path, meta)

    monkeypatch.setattr(ckpt_mod.Checkpointer, "_write_snapshot",
                        staticmethod(slow_write))
    t0 = _time.perf_counter()
    ckptr.save_checkpoint({"epoch": 1})
    submit_time = _time.perf_counter() - t0
    assert submit_time < 0.25, f"save blocked the caller for {submit_time:.2f}s"
    ckptr.wait()
    assert slow["writes"] == 1
    assert len(ckptr.list_checkpoints()) == 1


def test_async_checkpointer_mutation_after_save_is_safe(tmp_path):
    """The snapshot is taken at save time: mutating (or donating) the live
    state afterwards must not corrupt the checkpoint."""
    holder = {"params": {"w": jnp.full((2, 2), 7.0)}}
    ckptr = Checkpointer(
        str(tmp_path / "save"),
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: holder.update(params=p))},
        async_writes=True,
    )
    ckptr.save_checkpoint({"epoch": 0})
    holder["params"] = {"w": jnp.zeros((2, 2))}  # simulates donation/reuse
    ckpt = ckptr.list_checkpoints()[0]
    ckptr.load_checkpoint(ckpt)
    np.testing.assert_allclose(np.asarray(holder["params"]["w"]), 7.0)


def test_async_checkpointer_surfaces_writer_errors(tmp_path, monkeypatch):
    from speech_anonymization_tpu.train import checkpoint as ckpt_mod

    ckptr = Checkpointer(
        str(tmp_path / "save"),
        {"model": PytreeRecoverable(lambda: {"w": jnp.ones(2)}, lambda p: None)},
        async_writes=True,
    )

    def boom(snap, tmp, path, meta):
        raise RuntimeError("disk full")

    monkeypatch.setattr(ckpt_mod.Checkpointer, "_write_snapshot", staticmethod(boom))
    ckptr.save_checkpoint({"epoch": 0})
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="disk full"):
        ckptr.wait()
