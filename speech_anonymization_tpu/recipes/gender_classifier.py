"""Gender (binary sex) classifier training recipe — the privacy evaluator.

Reference: gender_classifier_train.py (375 LoC recipe over SpeechBrain).
Pipeline per batch (reference compute_forward, :58-85): waveforms ->
[optional noise/speed augmentation] -> Fbank -> global normalization ->
Xvector embeddings -> classifier -> NLL loss; valid/test track
classification error; ReduceLROnPlateau anneals per epoch
(:205); best-by-error checkpointing (:216).

TPU-first: the whole batch step (fbank -> normalize -> x-vector ->
classifier -> loss -> grads -> adam) is ONE jitted, donate-friendly XLA
program; waveform batches are padded to a static bucket grid so the step
compiles a handful of shapes; data parallelism = sharding the batch over
the mesh ('data' axis) with XLA inserting the gradient all-reduce.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (
    CategoricalEncoder,
    DynamicItemDataset,
    SaveableDataLoader,
    prepare_librispeech,
    read_audio,
)
from ..data.dataset import make_buckets
from ..losses import classification_error, nll_loss
from ..models import Xvector, XvectorClassifier
from ..ops.fbank import Fbank
from ..ops.normalization import InputNormalizer
from ..parallel import is_main_process, run_on_main, make_mesh, shard_batch
from ..train import Brain, Checkpointer, EpochCounter, FileTrainLogger, ReduceLROnPlateau, Stage
from ..train.checkpoint import PytreeRecoverable
from ..train.experiment import create_experiment_directory
from ..train.state import TrainState, adam_like_reference, make_update_fn
from ..eval.metrics import AccuracyStats


class GenderBrain(Brain):
    """Jit-compiled trainer for the x-vector gender classifier.

    ``recon_model`` (optional): a frozen anonymizer applied between
    normalization and the classifier — the recon-retrain variant
    (gender_classifier_train_recon.py:58-93), measuring attack accuracy
    AFTER anonymization. Pass a pair (flax module, variables).
    """

    def __init__(self, hparams: dict, checkpointer=None, mesh=None, recon_model=None):
        super().__init__(hparams, checkpointer, hparams.get("ckpt_interval_minutes"))
        self.mesh = mesh
        self.fbank: Fbank = hparams["compute_features"]
        self.normalizer: InputNormalizer = hparams["mean_var_norm"]
        self.embedding_model: Xvector = hparams["embedding_model"]
        self.classifier: XvectorClassifier = hparams["classifier"]
        self.lr_annealing: ReduceLROnPlateau = hparams["lr_annealing"]
        self.train_logger: FileTrainLogger = hparams["train_logger"]
        self.epoch_counter: EpochCounter = hparams["epoch_counter"]
        self.optimizer = adam_like_reference(lr=hparams.get("lr_start", 1e-3))
        self.recon_model = recon_model
        # waveform augmentations (gender_classifier.yaml:72-84): env_corrupt
        # doubles the batch with noise-corrupted copies
        # (gender_classifier_train.py:103-110); augmentation = time-domain
        # specaugment (speed perturb + dropouts)
        self.env_corrupt = hparams.get("env_corrupt")
        self.augmentation = hparams.get("augmentation")
        self._rng = jax.random.PRNGKey(int(hparams.get("seed", 0)))
        self.state: TrainState | None = None
        self._build_steps()

    # -- pure compute ----------------------------------------------------------

    def _forward(self, params, model_state, norm_state, wavs, lens, epoch, train: bool, rng=None):
        if train and rng is not None:
            k1, k2 = jax.random.split(rng)
            if self.env_corrupt is not None:
                noisy = self.env_corrupt(k1, wavs, lens)
                wavs = jnp.concatenate([wavs, noisy], axis=0)
                lens = jnp.concatenate([lens, lens], axis=0)
            if self.augmentation is not None:
                wavs, lens = self.augmentation(k2, wavs, lens)
        feats = self.fbank(wavs)
        feats, new_norm = self.normalizer(norm_state, feats, lens, epoch, training=train)
        if self.recon_model is not None:
            # frozen anonymizer between normalize and the classifier
            # (gender_classifier_train_recon.py:87-93, under no_grad)
            module, variables = self.recon_model
            t = feats.shape[1]
            pad = (-t) % 36 if type(module).__name__ != "FullyConnectedAutoencoder" else 0
            padded = jnp.pad(feats, ((0, 0), (0, pad), (0, 0))) if pad else feats
            out = module.apply(variables, padded, train=False)
            recon = out[0] if isinstance(out, tuple) else out
            feats = jax.lax.stop_gradient(recon[:, :t])
        variables = {"params": params["embedding_model"], **model_state["embedding_model"]}
        if train:
            emb, mut = self.embedding_model.apply(
                variables, feats, lens, train=True, mutable=["batch_stats"]
            )
            emb_state = mut
        else:
            emb = self.embedding_model.apply(variables, feats, lens, train=False)
            emb_state = model_state["embedding_model"]
        cvars = {"params": params["classifier"], **model_state["classifier"]}
        if train:
            log_probs, cmut = self.classifier.apply(cvars, emb, train=True, mutable=["batch_stats"])
            clf_state = cmut
        else:
            log_probs = self.classifier.apply(cvars, emb, train=False)
            clf_state = model_state["classifier"]
        new_model_state = {"embedding_model": emb_state, "classifier": clf_state}
        return log_probs, new_model_state, new_norm

    def _loss_fn(self, params, model_state, norm_state, batch, epoch, rng):
        wavs, lens, labels = batch
        log_probs, new_model_state, new_norm = self._forward(
            params, model_state, norm_state, wavs, lens, epoch, train=True, rng=rng
        )
        if self.env_corrupt is not None:
            # labels double with the corrupted copies (reference :140-142)
            labels = jnp.concatenate([labels, labels], axis=0)
        loss = nll_loss(log_probs, labels)
        metrics = {"error": classification_error(log_probs, labels)}
        return loss, (new_model_state, new_norm, metrics)

    def _build_steps(self):
        update = make_update_fn(
            self._loss_fn,
            self.optimizer,
            accum_steps=int(self.hparams.get("gradient_accumulation", 1)),
            clip_norm=self.hparams.get("gradient_clipping"),
        )
        self._train_step = jax.jit(update, donate_argnums=(0,))

        def eval_step(params, model_state, norm_state, batch, epoch):
            wavs, lens, labels = batch
            log_probs, _, _ = self._forward(
                params, model_state, norm_state, wavs, lens, epoch, train=False
            )
            loss = nll_loss(log_probs, labels)
            err = classification_error(log_probs, labels)
            return loss, err, log_probs

        self._eval_step = jax.jit(eval_step)

    # -- state ------------------------------------------------------------------

    def init_state(self, example_batch, seed: int = 0):
        wavs, lens, _ = example_batch
        rng = jax.random.PRNGKey(seed)
        feats = self.fbank(wavs)
        ev = self.embedding_model.init(rng, feats, lens, train=False)
        emb = self.embedding_model.apply(ev, feats, lens, train=False)
        cv = self.classifier.init(rng, emb, train=False)
        params = {"embedding_model": ev["params"], "classifier": cv["params"]}
        model_state = {
            "embedding_model": {k: v for k, v in ev.items() if k != "params"},
            "classifier": {k: v for k, v in cv.items() if k != "params"},
        }
        self.state = TrainState.create(
            params,
            model_state,
            self.normalizer.init_state(),
            self.optimizer.init(params),
        )
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable(
                "embedding_model",
                PytreeRecoverable(
                    lambda: self.state.params["embedding_model"],
                    lambda p: self._set_param("embedding_model", p),
                ),
            )
            self.checkpointer.add_recoverable(
                "classifier",
                PytreeRecoverable(
                    lambda: self.state.params["classifier"],
                    lambda p: self._set_param("classifier", p),
                ),
            )
            self.checkpointer.add_recoverable(
                "normalizer",
                PytreeRecoverable(
                    lambda: self.state.norm_state,
                    lambda s: self._set_norm(s),
                ),
            )
            self.checkpointer.add_recoverable(
                "model_state",
                PytreeRecoverable(
                    lambda: self.state.model_state,
                    lambda s: self._set_model_state(s),
                ),
            )
            self.checkpointer.add_recoverable("counter", self.epoch_counter)
            self.checkpointer.add_recoverable("lr_annealing", self.lr_annealing)

    def _set_param(self, name, p):
        params = dict(self.state.params)
        params[name] = p
        self.state = self.state.replace(params=params)

    def _set_norm(self, s):
        self.state = self.state.replace(norm_state=jax.tree_util.tree_map(jnp.asarray, s))

    def _set_model_state(self, s):
        self.state = self.state.replace(model_state=jax.tree_util.tree_map(jnp.asarray, s))

    # -- batch adapters -----------------------------------------------------------

    def _device_batch(self, batch):
        wavs, lens = batch.sig
        labels = np.asarray(batch.gender_encoded, np.int32)
        arrs = (jnp.asarray(wavs), jnp.asarray(lens), jnp.asarray(labels))
        if self.mesh is not None:
            arrs = shard_batch(arrs, self.mesh)
        return arrs

    def fit_batch(self, batch, epoch):
        db = self._device_batch(batch)
        self._rng, key = jax.random.split(self._rng)
        self.state, metrics = self._train_step(
            self.state, db, jnp.asarray(self.lr_annealing.lr, jnp.float32),
            jnp.asarray(epoch), key,
        )
        return metrics["loss"]

    def evaluate_batch(self, batch, stage):
        db = self._device_batch(batch)
        loss, err, log_probs = self._eval_step(
            self.state.params,
            self.state.model_state,
            self.state.norm_state,
            db,
            jnp.asarray(self.epoch_counter.current),
        )
        self.error_metrics.append(np.asarray(log_probs), np.asarray(db[2]))
        return loss

    # -- hooks -------------------------------------------------------------------

    def on_stage_start(self, stage, epoch=None):
        if stage != Stage.TRAIN:
            self.error_metrics = AccuracyStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.TRAIN:
            return
        error = 1.0 - self.error_metrics.summarize()
        stats = {"loss": stage_loss, "error": error}
        if stage == Stage.VALID:
            old_lr, _ = self.lr_annealing(epoch, stage_loss)
            self.train_logger.log_stats(
                {"Epoch": epoch, "lr": old_lr},
                train_stats=self.train_stats,
                valid_stats=stats,
            )
            if self.checkpointer is not None and is_main_process():
                self.checkpointer.save_and_keep_only(
                    {"loss": stage_loss, "error": error, "epoch": epoch},
                    min_keys=["error"],
                )
        elif stage == Stage.TEST:
            self.train_logger.log_stats(
                {"Epoch loaded": self.epoch_counter.current}, test_stats=stats
            )
            self.test_stats = stats


def dataio_prepare(hparams, audio_pipeline=None):
    """Datasets + pipelines (reference dataio_prepare, :225-298)."""
    data_folder = hparams["data_folder"]
    datasets = {}
    for split, csv_key in (("train", "train_csv"), ("valid", "valid_csv"), ("test", "test_csv")):
        ds = DynamicItemDataset.from_csv(hparams[csv_key], {"data_root": data_folder})
        datasets[split] = ds

    if hparams.get("sorting", "random") == "ascending":
        datasets["train"] = datasets["train"].filtered_sorted(sort_key="duration")
    elif hparams.get("sorting") == "descending":
        datasets["train"] = datasets["train"].filtered_sorted(sort_key="duration", reverse=True)
    datasets["valid"] = datasets["valid"].filtered_sorted(sort_key="duration")
    datasets["test"] = datasets["test"].filtered_sorted(sort_key="duration")

    label_encoder = hparams.get("label_encoder") or CategoricalEncoder()

    if audio_pipeline is None:
        audio_pipeline = lambda wav: read_audio(wav)

    for ds in datasets.values():
        ds.add_dynamic_item(audio_pipeline, takes=["wav"], provides=["sig"])
        ds.add_dynamic_item(
            lambda sex: np.int64(label_encoder.encode_label(sex)),
            takes=["sex"],
            provides=["gender_encoded"],
        )
        ds.set_output_keys(["id", "sig", "gender_encoded"])

    lab_enc_file = os.path.join(hparams["save_folder"], "label_encoder.txt")
    label_encoder.load_or_create(
        lab_enc_file, from_iterables=[datasets["train"].raw_values("sex")]
    )
    return datasets["train"], datasets["valid"], datasets["test"], label_encoder


def _loaders(hparams, train_data, valid_data, test_data):
    batch_size = int(hparams.get("batch_size", 8))
    durations = [float(d) for d in train_data.raw_values("duration")] or [1.0]
    sr = int(hparams.get("sample_rate", 16000))
    buckets = make_buckets(
        max(int(min(durations) * sr), sr // 4), int(max(durations) * sr) + sr // 10
    )
    bucket_map = {"sig": buckets}
    mk = lambda ds, shuffle: SaveableDataLoader(
        ds, batch_size=batch_size, shuffle=shuffle, seed=int(hparams.get("seed", 0)),
        bucket_map=bucket_map, drop_last=shuffle,
    )
    return mk(train_data, True), mk(valid_data, False), mk(test_data, False)


def _is_torch_ckpt(path: str) -> bool:
    """Reference checkpoints are torch zip archives (magic 'PK\\x03\\x04');
    ours are flax msgpack."""
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"PK\x03\x04"
    except OSError:
        return False


def load_recon_model(ckpt_dir: str, model_type: str = "fcae", n_mels: int = 80,
                     ckpt_select: str = "max_utility",
                     min_utility: float = 0.85):
    """Load a frozen anonymizer (module, variables) from an anonymizer-recipe
    checkpoint directory for the recon-retrain variant.

    ``ckpt_select="valid_frontier"`` picks the SAME checkpoint the
    anonymizer's valid_frontier evaluation reports (valid ACC_external
    closest to chance subject to the utility floor — anonymizer.py
    on_evaluate_start), so a retrained attacker attacks the reported
    operating point rather than the default max-utility checkpoint.

    Also accepts the REFERENCE's shipped checkpoint layout (a ``save/`` dir
    of ``CKPT+*`` subdirs, or one such subdir, holding a torch ``model.ckpt``
    — gender_classifier_recon.yaml's ``trained_recon_model_path``), ported
    via utils/reference_ckpts.py so users can reuse the original trained
    FC-AE anonymizers directly."""
    import jax as _jax

    from ..train.checkpoint import Checkpointer as _Ckptr, PytreeRecoverable as _PR
    from .anonymizer import MODEL_TYPES, _pad_time_to_multiple

    direct = os.path.join(ckpt_dir, "model.ckpt")
    if model_type == "fcae":
        ref_model = None
        if _is_torch_ckpt(direct):
            ref_model = direct
        else:
            from ..utils.reference_ckpts import find_best_ckpt_dir

            try:
                cand = os.path.join(find_best_ckpt_dir(ckpt_dir), "model.ckpt")
                if _is_torch_ckpt(cand):
                    ref_model = cand
            except FileNotFoundError:
                pass
        if ref_model is not None:
            from ..utils.reference_ckpts import load_reference_fcae

            module, variables, _ = load_reference_fcae(ref_model)
            return module, variables

    module = MODEL_TYPES[model_type]()
    rng = _jax.random.PRNGKey(0)
    t0 = 36 if model_type != "fcae" else 8
    feats = jnp.zeros((1, t0, n_mels))
    variables = module.init({"params": rng, "dummy": rng}, feats, train=False)
    holder = {
        "params": variables["params"],
        "model_state": {k: v for k, v in variables.items() if k != "params"},
    }
    ckptr = _Ckptr(
        ckpt_dir,
        {
            "model": _PR(lambda: holder["params"], lambda p: holder.__setitem__("params", p)),
            "model_state": _PR(
                lambda: holder["model_state"], lambda s: holder.__setitem__("model_state", s)
            ),
        },
    )
    if ckpt_select == "valid_frontier":
        scored = [c for c in ckptr.find_checkpoints()
                  if "ACC_external" in c.meta and "Utility_Retention" in c.meta]
        if not scored:
            raise FileNotFoundError(
                f"no frontier-scored anonymizer checkpoint under {ckpt_dir}")
        ok = [c for c in scored if c.meta["Utility_Retention"] >= min_utility]
        pool = ok or [max(scored, key=lambda c: c.meta["Utility_Retention"])]
        pick = min(pool, key=lambda c: (abs(c.meta["ACC_external"] - 0.5),
                                        -c.meta["Utility_Retention"]))
        print(f"[recon ckpt_select=valid_frontier] epoch "
              f"{pick.meta.get('epoch')}: valid ACC_external="
              f"{pick.meta['ACC_external']:.3f} "
              f"Utility={pick.meta['Utility_Retention']:.3f}")
        ckptr.load_checkpoint(pick)
    elif ckptr.recover_if_possible(max_key="Utility_Retention") is None:
        raise FileNotFoundError(f"no anonymizer checkpoint under {ckpt_dir}")
    return module, {"params": holder["params"], **holder["model_state"]}


def main(argv=None):
    from ..config import load_config, parse_arguments

    config_path, run_opts, overrides = parse_arguments(argv if argv is not None else sys.argv[1:])
    # multi-host entry: the ddp_init_group equivalent (no-op single-host;
    # env-driven — see parallel/mesh.py). Must run before devices are used.
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
    train_data, valid_data, test_data, _ = dataio_prepare(hparams)
    train_loader, valid_loader, test_loader = _loaders(hparams, train_data, valid_data, test_data)

    # recon-retrain variant: frozen anonymizer from a trained checkpoint
    # (gender_classifier_train_recon.py:329-338 / gender_classifier_recon.yaml)
    recon_model = None
    recon_dir = hparams.get("trained_recon_model_dir")
    if recon_dir and os.path.isdir(recon_dir):
        recon_model = load_recon_model(
            recon_dir,
            model_type=hparams.get("recon_model_type", "fcae"),
            n_mels=int(hparams.get("n_mels", 80)),
            ckpt_select=str(hparams.get("recon_ckpt_select", "max_utility")),
            min_utility=float(hparams.get("eval_ckpt_min_utility", 0.85)),
        )

    checkpointer = Checkpointer(
        hparams["save_folder"] + "/ckpts",
        async_writes=bool(hparams.get("async_checkpointing", True)),
    )
    brain = GenderBrain(hparams, checkpointer=checkpointer, recon_model=recon_model)
    brain.init_state(brain._device_batch(next(iter(valid_loader))))
    checkpointer.recover_if_possible()

    brain.fit(hparams["epoch_counter"], train_loader, valid_loader)
    brain.evaluate(test_loader, min_key="error")
    return brain


if __name__ == "__main__":
    main()
