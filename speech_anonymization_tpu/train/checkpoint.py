"""Checkpointing: metric-keyed retention, top-k averaging, resume.

Replaces speechbrain.utils.checkpoints.Checkpointer (convae.yaml:258-264,
gender_classifier.yaml:159-165). Behaviors reproduced:

  * ``save_and_keep_only(meta, min_keys, max_keys, num_to_keep)`` —
    metric-keyed retention (speechbrain_convae_train.py:338-343 keeps top-5
    by Utility_Retention/ACC_external; gender_classifier_train.py:216 keeps
    best by error)
  * ``recover_if_possible`` — resume from the latest checkpoint
    (speechbrain_train.py:294-296)
  * ``find_checkpoints(max_key/min_key)`` + ``average_checkpoints`` —
    top-k parameter averaging before evaluation
    (speechbrain_convae_train.py:404-416)
  * time-based ``ckpt_interval_minutes`` saving (convae.yaml:45)
  * on-disk layout ``save/CKPT+<timestamp>/{<name>.ckpt..., CKPT.yaml}``
    mirroring results/*/save/ in the reference artifacts.

Pytree state (params/opt_state/normalizer) serializes via
flax.serialization msgpack; host objects (schedulers, counters) via their
``state_dict``. Writes are host-gated by the caller (parallel.is_main_process).
"""

from __future__ import annotations

import atexit
import json
import os
import queue
import shutil
import threading
import time
from typing import Any, Callable, Mapping

import jax
import numpy as np
from flax import serialization

META_FILE = "CKPT.yaml"


class _AsyncWriter:
    """Single background writer thread: saves queue FIFO, so retention
    decisions always see every earlier save completed. Errors surface on
    the next submit()/wait() call."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self._err: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="ckpt-writer"
        )
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            try:
                if fn is not None:
                    fn()
            except BaseException as e:  # surfaced on the train thread later
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn: Callable[[], None]):
        self._raise_pending()
        self._q.put(fn)

    def wait(self):
        self._q.join()
        self._raise_pending()

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def _write_meta(path: str, meta: Mapping):
    with open(path, "w") as f:
        f.write("# checkpoint meta\n")
        for k, v in meta.items():
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            f.write(f"{k}: {json.dumps(v)}\n")


def _read_meta(path: str) -> dict:
    meta = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition(":")
            try:
                meta[k.strip()] = json.loads(v.strip())
            except json.JSONDecodeError:
                meta[k.strip()] = v.strip()
    return meta


class PytreeRecoverable:
    """Adapter giving pytree state (params, opt_state, ...) a
    state_dict/load interface via get/set callables."""

    def __init__(self, get: Callable[[], Any], set_: Callable[[Any], None]):
        self._get = get
        self._set = set_

    def save(self, path: str):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self._get()))

    def load(self, path: str):
        template = self._get()
        with open(path, "rb") as f:
            self._set(serialization.from_bytes(template, f.read()))


class Checkpoint:
    def __init__(self, path: str, meta: Mapping | None = None):
        self.path = path
        # async saves pass the meta directly (the files may not be on disk
        # yet when the handle is returned)
        self.meta = dict(meta) if meta is not None else _read_meta(
            os.path.join(path, META_FILE)
        )

    @property
    def name(self) -> str:
        return os.path.basename(self.path)


class Checkpointer:
    """``async_writes=True`` moves serialization + disk IO to a background
    thread (VERDICT r2 weak #4 / ROUND3_IDEAS #5): the train thread only
    snapshots state to host memory (``jax.device_get`` — required anyway
    for a consistent snapshot, and mandatory here because the jitted train
    step DONATES its state buffers, so device arrays held past the next
    step would be invalidated). Completeness is guaranteed by the
    write-to-tmp + atomic-rename protocol: readers never see a partial
    checkpoint directory. All read paths (find/recover/average) drain the
    writer first, so ordering semantics are unchanged."""

    def __init__(self, checkpoints_dir: str, recoverables: Mapping[str, Any] | None = None,
                 async_writes: bool = False):
        self.checkpoints_dir = checkpoints_dir
        self.recoverables: dict[str, Any] = dict(recoverables or {})
        self._last_save_time = time.time()
        self._reserved: set[str] = set()
        self._writer: _AsyncWriter | None = None
        if async_writes:
            self._writer = _AsyncWriter()
            atexit.register(self.wait)
        os.makedirs(checkpoints_dir, exist_ok=True)

    def wait(self):
        """Drain pending async saves (no-op in sync mode)."""
        if self._writer is not None:
            self._writer.wait()

    def add_recoverable(self, name: str, obj: Any):
        """Dynamic registration (speechbrain_train.py:271 adds the optimizer
        after the stage-2 switch)."""
        self.recoverables[name] = obj

    # -- save ---------------------------------------------------------------

    def _snapshot(self) -> list[tuple[str, str, Any]]:
        """Consistent host-side snapshot of every recoverable, taken on the
        CALLER thread (device arrays may be donated by the next train step,
        so they must leave the device before this returns)."""
        snap = []
        for rec_name, rec in self.recoverables.items():
            if isinstance(rec, PytreeRecoverable):
                snap.append(("pytree", rec_name, jax.device_get(rec._get())))
            elif hasattr(rec, "state_dict"):
                snap.append(("json", rec_name, json.dumps(rec.state_dict())))
            else:  # raw pytree snapshot
                snap.append(("pytree", rec_name, jax.device_get(rec)))
        return snap

    @staticmethod
    def _write_snapshot(snap, tmp: str, path: str, meta: Mapping):
        os.makedirs(tmp, exist_ok=True)
        for kind, rec_name, payload in snap:
            fpath = os.path.join(tmp, f"{rec_name}.ckpt")
            if kind == "json":
                with open(fpath, "w") as f:
                    f.write(payload)
            else:
                with open(fpath, "wb") as f:
                    f.write(serialization.to_bytes(payload))
        _write_meta(os.path.join(tmp, META_FILE), meta)
        if os.path.exists(path):  # explicit name collision: replace
            shutil.rmtree(path)
        os.replace(tmp, path)  # atomic: readers never see a partial ckpt

    def save_checkpoint(self, meta: Mapping | None = None, name: str | None = None) -> Checkpoint:
        meta = dict(meta or {})
        meta.setdefault("unixtime", time.time())
        if name is None:
            stamp = time.strftime("%Y-%m-%d+%H-%M-%S")
            seq = 0
            while True:
                name = f"CKPT+{stamp}+{seq:02d}"
                # the reserved set covers async saves not yet on disk
                if name not in self._reserved and not os.path.exists(
                    os.path.join(self.checkpoints_dir, name)
                ):
                    break
                seq += 1
        self._reserved.add(name)
        path = os.path.join(self.checkpoints_dir, name)
        tmp = path + ".tmp"
        snap = self._snapshot()
        if self._writer is not None:
            self._writer.submit(
                lambda: self._write_snapshot(snap, tmp, path, meta)
            )
        else:
            self._write_snapshot(snap, tmp, path, meta)
        self._last_save_time = time.time()
        return Checkpoint(path, meta)

    def save_and_keep_only(
        self,
        meta: Mapping | None = None,
        min_keys: list[str] | None = None,
        max_keys: list[str] | None = None,
        num_to_keep: int = 1,
    ) -> Checkpoint:
        ckpt = self.save_checkpoint(meta)
        if self._writer is not None:
            # retention runs IN the writer queue, after this save has
            # landed — it sees every earlier save (FIFO) and never races a
            # write (uses the no-drain listing: wait() here would deadlock)
            self._writer.submit(
                lambda: self._apply_retention(min_keys, max_keys, num_to_keep)
            )
        else:
            self._apply_retention(min_keys, max_keys, num_to_keep)
        return ckpt

    def _apply_retention(self, min_keys, max_keys, num_to_keep):
        keep = set()
        for key in max_keys or []:
            ranked = self._find_checkpoints_nodrain(max_key=key, n=num_to_keep)
            keep.update(c.path for c in ranked)
        for key in min_keys or []:
            ranked = self._find_checkpoints_nodrain(min_key=key, n=num_to_keep)
            keep.update(c.path for c in ranked)
        if not (min_keys or max_keys):
            ranked = self._find_checkpoints_nodrain(n=num_to_keep)
            keep.update(c.path for c in ranked)
        for c in self._list_checkpoints_nodrain():
            if c.path not in keep:
                self._reserved.discard(c.name)
                shutil.rmtree(c.path, ignore_errors=True)

    def maybe_save_interval(self, meta: Mapping | None = None, interval_minutes: float = 60.0):
        """Time-based checkpointing (ckpt_interval_minutes, convae.yaml:45)."""
        if time.time() - self._last_save_time >= interval_minutes * 60.0:
            return self.save_checkpoint(meta)
        return None

    # -- find / load ---------------------------------------------------------

    def _list_checkpoints_nodrain(self) -> list[Checkpoint]:
        out = []
        for entry in sorted(os.listdir(self.checkpoints_dir)):
            path = os.path.join(self.checkpoints_dir, entry)
            # .tmp dirs are in-flight writes — never a valid checkpoint
            if (
                entry.startswith("CKPT")
                and not entry.endswith(".tmp")
                and os.path.isdir(path)
                and os.path.exists(os.path.join(path, META_FILE))
            ):
                out.append(Checkpoint(path))
        return out

    def list_checkpoints(self) -> list[Checkpoint]:
        self.wait()  # async saves must land before any read decision
        return self._list_checkpoints_nodrain()

    def _find_checkpoints_nodrain(
        self, max_key: str | None = None, min_key: str | None = None, n: int | None = None
    ) -> list[Checkpoint]:
        ckpts = self._list_checkpoints_nodrain()
        if max_key:
            ckpts = [c for c in ckpts if max_key in c.meta]
            ckpts.sort(key=lambda c: c.meta[max_key], reverse=True)
        elif min_key:
            ckpts = [c for c in ckpts if min_key in c.meta]
            ckpts.sort(key=lambda c: c.meta[min_key])
        else:
            ckpts.sort(key=lambda c: c.meta.get("unixtime", 0), reverse=True)
        return ckpts[:n] if n else ckpts

    def find_checkpoints(
        self, max_key: str | None = None, min_key: str | None = None, n: int | None = None
    ) -> list[Checkpoint]:
        self.wait()
        return self._find_checkpoints_nodrain(max_key, min_key, n)

    def find_checkpoint(self, max_key=None, min_key=None) -> Checkpoint | None:
        found = self.find_checkpoints(max_key, min_key, n=1)
        return found[0] if found else None

    def load_checkpoint(self, ckpt: Checkpoint):
        for rec_name, rec in self.recoverables.items():
            fpath = os.path.join(ckpt.path, f"{rec_name}.ckpt")
            if not os.path.exists(fpath):
                continue
            if isinstance(rec, PytreeRecoverable):
                rec.load(fpath)
            elif hasattr(rec, "load_state_dict"):
                with open(fpath) as f:
                    rec.load_state_dict(json.load(f))

    def recover_if_possible(self, max_key=None, min_key=None) -> Checkpoint | None:
        ckpt = self.find_checkpoint(max_key, min_key)
        if ckpt is not None:
            self.load_checkpoint(ckpt)
        return ckpt


def average_checkpoints(ckpts: list[Checkpoint], recoverable_name: str, template: Any) -> Any:
    """Mean of a pytree recoverable across checkpoints.

    Reference: sb.utils.checkpoints.average_checkpoints used before
    evaluation (speechbrain_convae_train.py:404-416,
    speechbrain_train.py:298-310).
    """
    assert ckpts, "no checkpoints to average"
    total = None
    for c in ckpts:
        with open(os.path.join(c.path, f"{recoverable_name}.ckpt"), "rb") as f:
            tree = serialization.from_bytes(template, f.read())
        if total is None:
            total = tree
        else:
            total = jax.tree_util.tree_map(lambda a, b: a + b, total, tree)
    k = float(len(ckpts))
    return jax.tree_util.tree_map(lambda a: a / k, total)
