"""Baseline transformer-ASR training recipe (the utility evaluator).

Reference: speechbrain_train.py (467 LoC) — stock LibriSpeech transformer
recipe: Fbank -> normalize -> SpecAugment -> ConvolutionFrontEnd ->
TransformerASR; joint CTC(0.3) + label-smoothed KLdiv(0.7) loss
(:129-136); Noam warmup on Adam with a stage-2 SGD switch after
``stage_one_epochs`` (:159, :256-273); checkpoint averaging of the top-5
ACC checkpoints before evaluation (:298-310); WER via beam search + report
file (:244-245).

TPU design mirrors the anonymizer recipe: one jitted update (donated
state), static bucket shapes, device-side losses; the two-stage optimizer
switch swaps the optax transform and re-inits its state (the reference
re-creates torch SGD the same way).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import prepare_librispeech
from ..data.tokenizer import UnigramTokenizer
from ..decoding import BeamSearchConfig, beam_search
from ..decoding.beam_search import hyps_to_lists
from ..losses import ctc_loss as ctc_loss_fn
from ..losses import kldiv_loss
from ..models.asr import ASRModel
from ..models.transformer import TransformerLM
from ..ops.fbank import Fbank
from ..ops.normalization import InputNormalizer
from ..parallel import is_main_process, run_on_main, shard_batch
from ..train import Brain, Checkpointer, EpochCounter, FileTrainLogger, NoamScheduler, Stage
from ..train.checkpoint import PytreeRecoverable, average_checkpoints
from ..train.experiment import create_experiment_directory
from ..train.state import TrainState, clip_by_global_norm
from ..eval.wer import ErrorRateStats
from .anonymizer import dataio_prepare, make_loaders


class ASRBrain(Brain):
    def __init__(self, hparams: dict, tokenizer, checkpointer=None, mesh=None):
        super().__init__(hparams, checkpointer, hparams.get("ckpt_interval_minutes"))
        self.mesh = mesh
        self.tokenizer = tokenizer
        self.fbank: Fbank = hparams["compute_features"]
        self.normalizer: InputNormalizer = hparams["normalize"]
        self.model = ASRModel(
            input_feats=int(hparams.get("n_mels", 80)),
            d_model=int(hparams.get("d_model", 768)),
            nhead=int(hparams.get("nhead", 8)),
            num_encoder_layers=int(hparams.get("num_encoder_layers", 12)),
            num_decoder_layers=int(hparams.get("num_decoder_layers", 6)),
            d_ffn=int(hparams.get("d_ffn", 3072)),
            output_neurons=int(hparams.get("output_neurons", 5000)),
        )
        self.train_logger: FileTrainLogger = hparams["train_logger"]
        self.epoch_counter: EpochCounter = hparams["epoch_counter"]
        self.noam: NoamScheduler = hparams.get("noam_annealing") or NoamScheduler(
            lr_initial=float(hparams.get("lr_adam", 1.0)),
            n_warmup_steps=int(hparams.get("n_warmup_steps", 25000)),
            model_size=int(hparams.get("d_model", 768)),
        )
        self.ctc_weight = float(hparams.get("ctc_weight", 0.3))
        self.label_smoothing = float(hparams.get("label_smoothing", 0.1))
        self.grad_accum = int(hparams.get("gradient_accumulation", 1))
        self.clip = hparams.get("gradient_clipping", 5.0)
        self.stage_one_epochs = int(hparams.get("stage_one_epochs", 90))
        self.lr_sgd = float(hparams.get("lr_sgd", 2.5e-5))
        self.augmentation = hparams.get("augmentation")
        self._optimizer_name = "Adam"
        self.adam = optax.inject_hyperparams(optax.adam)(
            learning_rate=1e-3, b1=0.9, b2=0.98, eps=1e-9
        )
        self.sgd = optax.inject_hyperparams(optax.sgd)(
            learning_rate=self.lr_sgd, momentum=0.99, nesterov=True
        )
        self.optimizer = self.adam
        self._rng = jax.random.PRNGKey(int(hparams.get("seed", 0)))
        self._host_accum = 0  # host mirror of state.accum_count (no device sync)
        self.state: TrainState | None = None
        self._build_steps()

    # -- compute -----------------------------------------------------------------

    def _features(self, norm_state, wavs, lens, epoch, train, rng=None):
        feats = self.fbank(wavs)
        feats, new_norm = self.normalizer(norm_state, feats, lens, epoch, training=train)
        if train and self.augmentation is not None and rng is not None:
            feats = self.augmentation(rng, feats)
        return feats, new_norm

    def _loss_fn(self, params, model_state, norm_state, batch, epoch, rng):
        wavs, lens, tokens_bos, tokens_eos, tokens, tokens_eos_lens, tokens_lens = batch
        feats, new_norm = self._features(norm_state, wavs, lens, epoch, True, rng)
        variables = {"params": params, **model_state}
        enc, dec, p_ctc, p_seq = self.model.apply(variables, feats, tokens_bos, lens)
        loss_seq = kldiv_loss(p_seq, tokens_eos, tokens_eos_lens, self.label_smoothing)
        loss_ctc = ctc_loss_fn(p_ctc, tokens, lens, tokens_lens)
        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_seq
        metrics = {"loss_ctc": loss_ctc, "loss_seq": loss_seq}
        return loss, (model_state, new_norm, metrics)

    def _build_optimizer_update(self, optimizer):
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        accum_steps = self.grad_accum
        clip = self.clip

        def update(state: TrainState, batch, lr, epoch, rng):
            (loss, (new_ms, new_norm, metrics)), grads = grad_fn(
                state.params, state.model_state, state.norm_state, batch, epoch, rng
            )
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g / accum_steps, state.accum_grads, grads
            )
            count = state.accum_count + 1
            do_step = count >= accum_steps

            def apply(_):
                g, gnorm = clip_by_global_norm(accum, clip)
                finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
                opt_state = state.opt_state
                opt_state.hyperparams["learning_rate"] = lr
                updates, new_opt = optimizer.update(g, opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                new_params = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(finite, n, o), new_params, state.params
                )
                zeros = jax.tree_util.tree_map(jnp.zeros_like, accum)
                return new_params, new_opt, zeros, jnp.zeros((), jnp.int32)

            def skip(_):
                return state.params, state.opt_state, accum, count

            new_params, new_opt, new_accum, new_count = jax.lax.cond(do_step, apply, skip, None)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                model_state=new_ms,
                norm_state=new_norm,
                opt_state=new_opt,
                accum_grads=new_accum,
                accum_count=new_count,
            )
            metrics = dict(metrics)
            metrics["loss"] = loss
            return new_state, metrics

        return update

    def _build_steps(self):
        self._train_step = jax.jit(self._build_optimizer_update(self.optimizer), donate_argnums=(0,))

        def eval_loss(params, model_state, norm_state, batch, epoch):
            wavs, lens, tokens_bos, tokens_eos, tokens, tokens_eos_lens, tokens_lens = batch
            feats, _ = self._features(norm_state, wavs, lens, epoch, False)
            variables = {"params": params, **model_state}
            enc, dec, p_ctc, p_seq = self.model.apply(variables, feats, tokens_bos, lens)
            loss_seq = kldiv_loss(p_seq, tokens_eos, tokens_eos_lens, self.label_smoothing)
            loss_ctc = ctc_loss_fn(p_ctc, tokens, lens, tokens_lens)
            loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_seq
            return loss, enc, p_ctc

        self._eval_loss = jax.jit(eval_loss)

        def decode(params, model_state, norm_state, wavs, lens, epoch, beam_size, length_norm):
            from ..models.transformer import (
                beam_reorder_cache, make_kv_cache, use_paged_cache,
            )

            feats, _ = self._features(norm_state, wavs, lens, epoch, False)
            variables = {"params": params, **model_state}
            enc = self.model.apply(variables, feats, lens, method=ASRModel.encode)
            ctc_logits = self.model.apply(
                variables, enc, method=lambda m, e: m.heads.ctc_logits(e)
            )
            p_ctc = jax.nn.log_softmax(ctc_logits, -1)
            m = self.model
            # memory K/V stay at the batch level; decode_step groups beams
            cross = self.model.apply(variables, enc, method=ASRModel.cross_kv)
            # default float32 = bit-stable scores matching the reference's
            # f32 torch decode; serving/benchmarks opt into 'bfloat16' or
            # 'int8' via decode_cache_dtype (see recipes/asr_bundle.py)
            cache_dtype = {
                "bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8,
            }[self.hparams.get("decode_cache_dtype", "float32")]
            want_paged = bool(self.hparams.get("decode_paged_kv", True))
            att_cached = (
                lambda n, u_max: make_kv_cache(
                    n, u_max, m.num_decoder_layers, m.nhead, m.d_model // m.nhead,
                    dtype=cache_dtype,
                    paged=want_paged
                    and use_paged_cache(n, u_max, m.d_model, cache_dtype),
                ),
                lambda state, prev_tok, step: self.model.apply(
                    variables, prev_tok, enc, state, step, lens, cross,
                    method=ASRModel.decode_step_cached,
                ),
                beam_reorder_cache,
            )

            cfg = BeamSearchConfig(
                beam_size=beam_size,
                bos_index=int(self.hparams.get("bos_index", 1)),
                eos_index=int(self.hparams.get("eos_index", 2)),
                blank_index=int(self.hparams.get("blank_index", 0)),
                ctc_weight=float(self.hparams.get("ctc_weight_decode", 0.4)),
                lm_weight=0.0,
                length_normalization=length_norm,
            )
            return beam_search(None, enc, lens, p_ctc, cfg, att_cached=att_cached)

        self._decode_valid = jax.jit(
            lambda p, ms, ns, w, l, e: decode(
                p, ms, ns, w, l, e, int(self.hparams.get("valid_beam_size", 10)), False
            )
        )
        self._decode_test = jax.jit(
            lambda p, ms, ns, w, l, e: decode(
                p, ms, ns, w, l, e, int(self.hparams.get("test_beam_size", 10)), True
            )
        )

    # -- optimizer staging (reference :256-273, :380-402) -----------------------------

    def check_and_reset_optimizer(self, epoch):
        if self._optimizer_name == "SGD":
            return
        if epoch > self.stage_one_epochs:
            self.optimizer = self.sgd
            self._optimizer_name = "SGD"
            self.state = self.state.replace(opt_state=self.optimizer.init(self.state.params))
            self._train_step = jax.jit(
                self._build_optimizer_update(self.optimizer), donate_argnums=(0,)
            )
            if self.checkpointer is not None:
                self.checkpointer.add_recoverable("optimizer_name", _StrState(self))

    # -- state ------------------------------------------------------------------------

    def init_state(self, example_batch, seed: int = 0):
        wavs, lens, tokens_bos = example_batch[:3]
        rng = jax.random.PRNGKey(seed)
        feats = self.fbank(wavs)
        variables = self.model.init(rng, feats, tokens_bos, lens)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        self.state = TrainState.create(
            params, model_state, self.normalizer.init_state(), self.optimizer.init(params)
        )
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable(
                "model", PytreeRecoverable(lambda: self.state.params, lambda p: self._set(params=p))
            )
            self.checkpointer.add_recoverable(
                "normalizer",
                PytreeRecoverable(lambda: self.state.norm_state, lambda s: self._set(norm_state=s)),
            )
            self.checkpointer.add_recoverable("counter", self.epoch_counter)
            self.checkpointer.add_recoverable("noam_scheduler", self.noam)

    def _set(self, **kw):
        kw = {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in kw.items()}
        self.state = self.state.replace(**kw)

    # -- batches --------------------------------------------------------------------

    def _device_batch(self, batch):
        wavs, lens = batch.sig
        tokens_bos, bos_lens = batch.tokens_bos
        tokens_eos, eos_lens = batch.tokens_eos
        tokens, tokens_lens = batch.tokens
        arrs = (
            jnp.asarray(wavs),
            jnp.asarray(lens),
            jnp.asarray(tokens_bos, jnp.int32),
            jnp.asarray(tokens_eos, jnp.int32),
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(eos_lens),
            jnp.asarray(tokens_lens),
        )
        if self.mesh is not None:
            arrs = shard_batch(arrs, self.mesh)
        return arrs

    def fit_batch(self, batch, epoch):
        self.check_and_reset_optimizer(epoch)
        # host mirror of accum_count — avoids a device->host sync per step
        # (see anonymizer.fit_batch)
        will_step = (self._host_accum + 1) >= self.grad_accum
        self._host_accum = 0 if will_step else self._host_accum + 1
        lr = jnp.asarray(self.noam() if will_step else self.noam.current_lr, jnp.float32)
        if self._optimizer_name == "SGD":
            lr = jnp.asarray(self.lr_sgd, jnp.float32)
        self._rng, key = jax.random.split(self._rng)
        db = self._device_batch(batch)
        self.state, metrics = self._train_step(self.state, db, lr, jnp.asarray(epoch), key)
        return metrics["loss"]

    def evaluate_batch(self, batch, stage):
        db = self._device_batch(batch)
        loss, enc, p_ctc = self._eval_loss(
            self.state.params, self.state.model_state, self.state.norm_state,
            db, jnp.asarray(self.epoch_counter.current),
        )
        decode_now = stage == Stage.TEST or (
            stage == Stage.VALID
            and self.epoch_counter.current % int(self.hparams.get("valid_search_interval", 10)) == 0
        )
        if decode_now:
            fn = self._decode_test if stage == Stage.TEST else self._decode_valid
            tokens, lengths, _ = fn(
                self.state.params, self.state.model_state, self.state.norm_state,
                db[0], db[1], jnp.asarray(self.epoch_counter.current),
            )
            hyps = hyps_to_lists(tokens, lengths)
            predicted = [self.tokenizer.decode_ids(h).split(" ") for h in hyps]
            target = [w.split(" ") for w in batch.wrd]
            self.wer_metric.append(batch.id, predicted, target)
        return loss

    # -- hooks ---------------------------------------------------------------------------

    def on_stage_start(self, stage, epoch=None):
        if stage != Stage.TRAIN:
            self.wer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.TRAIN:
            return
        stats = {"loss": stage_loss}
        if self.wer_metric.utts:
            stats["WER"] = self.wer_metric.summarize("error_rate")
        stats["ACC"] = -stage_loss  # ranking key: lower loss = better
        if stage == Stage.VALID and is_main_process():
            self.train_logger.log_stats(
                {
                    "epoch": epoch,
                    "lr": self.noam.current_lr if self._optimizer_name == "Adam" else self.lr_sgd,
                    "steps": self.noam.n_steps,
                    "optimizer": self._optimizer_name,
                },
                train_stats=self.train_stats,
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    {"ACC": stats["ACC"], "epoch": epoch}, max_keys=["ACC"], num_to_keep=5
                )
        elif stage == Stage.TEST:
            self.train_logger.log_stats(
                {"Epoch loaded": self.epoch_counter.current}, test_stats=stats
            )
            wer_file = self.hparams.get("wer_file")
            if wer_file and self.wer_metric.utts:
                with open(wer_file, "w") as f:
                    self.wer_metric.write_stats(f)
            self.test_stats = stats

    def on_evaluate_start(self, max_key=None, min_key=None):
        if self.checkpointer is None:
            return
        ckpts = self.checkpointer.find_checkpoints(max_key=max_key or "ACC", n=5)
        if ckpts:
            avg = average_checkpoints(ckpts, "model", self.state.params)
            self._set(params=avg)


class _StrState:
    def __init__(self, brain):
        self.brain = brain

    def state_dict(self):
        return {"optimizer": self.brain._optimizer_name}

    def load_state_dict(self, d):
        if d.get("optimizer") == "SGD" and self.brain._optimizer_name != "SGD":
            self.brain.check_and_reset_optimizer(self.brain.stage_one_epochs + 1)


def train_tokenizer_if_needed(hparams, train_data) -> UnigramTokenizer:
    tok_path = hparams.get("tokenizer_path") or os.path.join(
        hparams["save_folder"], "tokenizer.json"
    )
    tok = UnigramTokenizer()
    if os.path.exists(tok_path):
        tok.Load(tok_path)
    else:
        sentences = train_data.raw_values("wrd")
        tok.train(sentences, vocab_size=int(hparams.get("output_neurons", 5000)))
        if is_main_process():
            tok.save(tok_path)
    return tok


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
    # tokenizer first (needs train transcripts), then datasets with pipelines
    bootstrap, _, _ = dataio_prepare(hparams, tokenizer=None)
    tokenizer = train_tokenizer_if_needed(hparams, bootstrap)
    train_data, valid_data, test_datasets = dataio_prepare(hparams, tokenizer=tokenizer)
    train_loader, valid_loader, test_loaders = make_loaders(
        hparams, train_data, valid_data, test_datasets
    )
    checkpointer = Checkpointer(
        os.path.join(hparams["save_folder"], "ckpts"),
        async_writes=bool(hparams.get("async_checkpointing", True)),
    )
    brain = ASRBrain(hparams, tokenizer, checkpointer)
    brain.init_state(brain._device_batch(next(iter(valid_loader))), int(hparams.get("seed", 0)))
    checkpointer.recover_if_possible()

    if not run_opts.get("eval_only", False):
        brain.fit(hparams["epoch_counter"], train_loader, valid_loader)

    for name, loader in test_loaders.items():
        brain.hparams["wer_file"] = os.path.join(hparams["output_folder"], f"wer_{name}.txt")
        brain.evaluate(loader, max_key="ACC")
    return brain


if __name__ == "__main__":
    main()
