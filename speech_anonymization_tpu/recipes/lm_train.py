"""Transformer-LM training recipe (shallow-fusion LM for test decoding).

The reference never trains its LM in-repo: convae.yaml:164-173 declares the
TransformerLM (d_model 768, 12 heads, 12 layers, ffn 3072, vocab 5000) and
the Pretrainer fetches a pretrained ``lm.ckpt`` from HF
(convae.yaml:306-317); test decoding fuses it at lm_weight 0.6
(convae.yaml:226-240). That checkpoint is not shipped, so this recipe is
the route to an LM checkpoint here: next-token NLL over transcript token
streams, Noam warmup, metric-keyed checkpointing — consumable by
``load_asr_bundle`` (recipes/asr_bundle.py) via ``lm_checkpoint_dir``.

TPU design: text-only input pipeline (no audio decode), static
power-of-two token buckets so XLA compiles a handful of shapes, one jitted
donated update.
"""

from __future__ import annotations

import csv
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.tokenizer import UnigramTokenizer
from ..losses import kldiv_loss
from ..models.transformer import TransformerLM
from ..parallel import is_main_process
from ..train import Brain, Checkpointer, EpochCounter, FileTrainLogger, NoamScheduler, Stage
from ..train.checkpoint import PytreeRecoverable, average_checkpoints
from ..train.experiment import create_experiment_directory
from ..train.state import clip_by_global_norm


def _read_transcripts(csv_path: str) -> list[str]:
    out = []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            wrd = row.get("wrd", "")
            if wrd:
                out.append(wrd)
    return out


def _bucket_len(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TextBatchLoader:
    """Tokenized transcripts -> (tokens_bos, tokens_eos, rel_lens) batches
    padded to static bucket lengths (pad = 0, masked by the LM and the
    loss)."""

    def __init__(self, sentences, tokenizer, batch_size: int, buckets,
                 bos: int = 1, eos: int = 2, shuffle: bool = False, seed: int = 0):
        self.buckets = sorted(buckets)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.items = []
        for s in sentences:
            ids = tokenizer.encode_as_ids(s)[: self.buckets[-1] - 1]
            if ids:
                self.items.append((np.asarray([bos] + ids, np.int32),
                                   np.asarray(ids + [eos], np.int32)))
        # group by bucket so every batch is one static shape
        self.items.sort(key=lambda p: len(p[0]))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return -(-len(self.items) // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.items))
        if self.shuffle:
            # shuffle within buckets: batches keep a single padded shape
            rng = np.random.default_rng(self.seed + self.epoch)
            starts = list(range(0, len(order), self.batch_size))
            rng.shuffle(starts)
            order = np.concatenate(
                [order[s : s + self.batch_size] for s in starts]
            ) if starts else order
            idx_groups = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
        else:
            idx_groups = [order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)]
        for idx in idx_groups:
            group = [self.items[int(i)] for i in idx]
            max_len = max(len(b) for b, _ in group)
            pad_to = _bucket_len(max_len, self.buckets)
            b_ = len(group)
            bos_arr = np.zeros((b_, pad_to), np.int32)
            eos_arr = np.zeros((b_, pad_to), np.int32)
            lens = np.zeros((b_,), np.float32)
            for j, (tb, te) in enumerate(group):
                bos_arr[j, : len(tb)] = tb
                eos_arr[j, : len(te)] = te
                lens[j] = len(tb) / pad_to
            yield bos_arr, eos_arr, lens


class LMBrain(Brain):
    def __init__(self, hparams: dict, tokenizer, checkpointer=None):
        super().__init__(hparams, checkpointer, hparams.get("ckpt_interval_minutes"))
        self.tokenizer = tokenizer
        self.model = TransformerLM(
            vocab=int(hparams.get("output_neurons", 5000)),
            d_model=int(hparams.get("lm_d_model", 768)),
            nhead=int(hparams.get("lm_nhead", 12)),
            num_layers=int(hparams.get("lm_num_layers", 12)),
            d_ffn=int(hparams.get("lm_d_ffn", 3072)),
            dropout=float(hparams.get("lm_dropout", 0.0)),
        )
        self.train_logger: FileTrainLogger = hparams["train_logger"]
        self.epoch_counter: EpochCounter = hparams["epoch_counter"]
        self.noam: NoamScheduler = hparams.get("noam_annealing") or NoamScheduler(
            lr_initial=float(hparams.get("lr_adam", 1.0)),
            n_warmup_steps=int(hparams.get("lm_warmup_steps", 25000)),
            model_size=int(hparams.get("lm_d_model", 768)),
        )
        self.label_smoothing = float(hparams.get("lm_label_smoothing", 0.0))
        self.clip = hparams.get("gradient_clipping", 5.0)
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=1e-3, b1=0.9, b2=0.98, eps=1e-9
        )
        self._rng = jax.random.PRNGKey(int(hparams.get("seed", 0)))
        self.params = None
        self.opt_state = None
        self._build_steps()

    def _loss(self, params, batch, rng):
        tokens_bos, tokens_eos, lens = batch
        logits = self.model.apply(
            {"params": params}, tokens_bos, True, rngs={"dropout": rng}
        )
        lp = jax.nn.log_softmax(logits, -1)
        return kldiv_loss(lp, tokens_eos, lens, self.label_smoothing)

    def _build_steps(self):
        clip = self.clip

        @jax.jit
        def train_step(params, opt_state, batch, lr, rng):
            loss, grads = jax.value_and_grad(self._loss)(params, batch, rng)
            g, gnorm = clip_by_global_norm(grads, clip)
            finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = self.optimizer.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_params, params
            )
            return new_params, new_opt, loss

        self._train_step = train_step
        self._eval_step = jax.jit(
            lambda params, batch: kldiv_loss(
                jax.nn.log_softmax(
                    self.model.apply({"params": params}, batch[0]), -1
                ),
                batch[1], batch[2], 0.0,
            )
        )

    def init_state(self, example_batch, seed: int = 0):
        variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.asarray(example_batch[0])
        )
        self.params = variables["params"]
        self.opt_state = self.optimizer.init(self.params)
        if self.checkpointer is not None:
            self.checkpointer.add_recoverable(
                "model",
                PytreeRecoverable(lambda: self.params, lambda p: self._set_params(p)),
            )
            self.checkpointer.add_recoverable("counter", self.epoch_counter)
            self.checkpointer.add_recoverable("noam_scheduler", self.noam)

    def _set_params(self, p):
        self.params = jax.tree_util.tree_map(jnp.asarray, p)

    def fit_batch(self, batch, epoch):
        lr = jnp.asarray(self.noam(), jnp.float32)
        self._rng, key = jax.random.split(self._rng)
        db = tuple(jnp.asarray(a) for a in batch)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, db, lr, key
        )
        return loss

    def evaluate_batch(self, batch, stage):
        db = tuple(jnp.asarray(a) for a in batch)
        return self._eval_step(self.params, db)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.VALID and is_main_process():
            stats = {"loss": stage_loss, "ppl": float(np.exp(min(stage_loss, 20.0)))}
            self.train_logger.log_stats(
                {"epoch": epoch, "lr": self.noam.current_lr, "steps": self.noam.n_steps},
                train_stats=self.train_stats,
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    {"loss": stage_loss, "epoch": epoch}, min_keys=["loss"], num_to_keep=5
                )
        elif stage == Stage.TEST:
            self.test_stats = {"loss": stage_loss, "ppl": float(np.exp(min(stage_loss, 20.0)))}
            self.train_logger.log_stats(
                {"Epoch loaded": self.epoch_counter.current}, test_stats=self.test_stats
            )

    def on_evaluate_start(self, max_key=None, min_key=None):
        if self.checkpointer is None:
            return
        ckpts = self.checkpointer.find_checkpoints(min_key=min_key or "loss", n=5)
        if ckpts:
            self._set_params(average_checkpoints(ckpts, "model", self.params))


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

    if hparams.get("data_folder") and hparams.get("train_splits"):
        from ..data import prepare_librispeech
        from ..parallel import run_on_main

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

    tok_path = hparams.get("tokenizer_path") or os.path.join(
        hparams["save_folder"], "tokenizer.json"
    )
    tokenizer = UnigramTokenizer()
    train_sents = _read_transcripts(hparams["train_csv"])
    if os.path.exists(tok_path):
        tokenizer.Load(tok_path)
    else:
        tokenizer.train(train_sents, vocab_size=int(hparams.get("output_neurons", 5000)))
        if is_main_process():
            tokenizer.save(tok_path)

    buckets = list(hparams.get("lm_token_buckets", [16, 32, 64, 128]))
    batch_size = int(hparams.get("batch_size", 32))
    valid_sents = _read_transcripts(hparams["valid_csv"])
    train_loader = TextBatchLoader(
        train_sents, tokenizer, batch_size, buckets, shuffle=True,
        seed=int(hparams.get("seed", 0)),
    )
    valid_loader = TextBatchLoader(valid_sents, tokenizer, batch_size, buckets)

    checkpointer = Checkpointer(
        os.path.join(hparams["save_folder"], "ckpts"),
        async_writes=bool(hparams.get("async_checkpointing", True)),
    )
    brain = LMBrain(hparams, tokenizer, checkpointer)
    brain.init_state(next(iter(valid_loader)), int(hparams.get("seed", 0)))
    checkpointer.recover_if_possible()

    if not run_opts.get("eval_only", False):
        brain.fit(hparams["epoch_counter"], train_loader, valid_loader)

    test_csvs = hparams.get("test_csv") or []
    if isinstance(test_csvs, str):
        test_csvs = [test_csvs]
    for path in test_csvs:
        loader = TextBatchLoader(_read_transcripts(path), tokenizer, batch_size, buckets)
        brain.evaluate(loader, min_key="loss")
    return brain


if __name__ == "__main__":
    main()
