"""Frozen ASR (+LM) attached to the anonymizer: utility loss + WER eval.

Reference behavior being reproduced (speechbrain_convae_train.py):
  * training utility loss: run the FROZEN pretrained ASR on original and
    reconstructed features and penalize divergence of the decoder outputs
    (``loss_utility(recon_prob, orig_prob)`` :97-103; MSE per convae.yaml:81,
    cosine per transformer.yaml:74) — gradients flow through the
    reconstruction into the anonymizer, not into the ASR;
  * VALID: cosine similarity of the two encoder outputs -> utility
    retention aggregator (:159-166);
  * TEST: full beam decode (CTC + optional LM fusion) of recon AND orig,
    WER vs reference transcripts for both (wer_metric / wer_metric2,
    :168-191), report written via write_stats (:350-351).

The ASR/LM parameters live OUTSIDE the anonymizer TrainState (frozen
constants closed over by the jitted functions), mirroring the reference's
separate, non-optimized asr_brain.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding import BeamSearchConfig, beam_search
from ..decoding.beam_search import hyps_to_lists
from ..losses import cosine_similarity_loss, mse_loss
from ..models.asr import ASRModel
from ..models.transformer import TransformerLM
from ..eval.wer import ErrorRateStats


class ASRBundle:
    def __init__(
        self,
        model: ASRModel,
        variables: dict,
        tokenizer,
        hparams: dict,
        lm: TransformerLM | None = None,
        lm_variables: dict | None = None,
        utility_kind: str = "mse",
    ):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.hparams = hparams
        self.lm = lm
        self.lm_variables = lm_variables
        self.utility_kind = utility_kind
        self._build()

    # -- pure fns ---------------------------------------------------------------

    def _forward_dec(self, feats, lens, tokens_bos):
        enc = self.model.apply(self.variables, feats, lens, method=ASRModel.encode)
        dec = self.model.apply(self.variables, tokens_bos, enc, lens, method=ASRModel.decode)
        return enc, dec

    def utility_loss(self, clean, recon, lens, batch):
        """Differentiable utility term for the anonymizer train step."""
        tokens_bos = batch[3]
        enc_o, dec_o = self._forward_dec(clean, lens, tokens_bos)
        enc_r, dec_r = self._forward_dec(recon, lens, tokens_bos)
        # frozen ASR: block gradients into the original branch, keep them
        # through the reconstruction (reference backprops through both ASR
        # passes but only the recon path reaches trainable params).
        dec_o = jax.lax.stop_gradient(dec_o)
        if self.utility_kind == "cosine":
            return cosine_similarity_loss(dec_r, dec_o)
        return mse_loss(dec_r, dec_o)

    def _build(self):
        # model/LM params enter the jitted graphs as ARGUMENTS — closing
        # over them would bake 100M+ weights into the HLO as constants
        # (breaks remote-compile payload limits and bloats the cache).
        def encode(variables, feats, lens):
            return self.model.apply(variables, feats, lens, method=ASRModel.encode)

        self._encode_jit = jax.jit(encode)

        def decode(variables, lm_variables, feats, lens, beam_size, length_norm, lm_weight):
            from ..models.transformer import (
                beam_reorder_cache, make_kv_cache, use_paged_cache,
            )

            enc = encode(variables, feats, lens)
            ctc_logits = self.model.apply(
                variables, enc, method=lambda m, e: m.heads.ctc_logits(e)
            )
            p_ctc = jax.nn.log_softmax(ctc_logits, -1)
            m = self.model
            d_head = m.d_model // m.nhead
            # cross-attention memory K/V projected ONCE per decode, at the
            # BATCH level — decode_step groups the B*beam query rows over
            # the shared (B, T, H, D) memory instead of repeating it per
            # beam (the repeat made each step read ~beam x more HBM)
            cross = self.model.apply(variables, enc, method=ASRModel.cross_kv)
            # default float32 = bit-stable scores, matching the reference's
            # f32 torch decode; serving/benchmarks opt into 'bfloat16'
            # (halves cache HBM traffic) or 'int8' (quantized serving,
            # halves again) via the decode_cache_dtype hparam — hypothesis
            # parity across dtypes is covered by tests/test_cached_decode.py
            cache_dtype = {
                "bfloat16": jnp.bfloat16, "float32": jnp.float32, "int8": jnp.int8,
            }[self.hparams.get("decode_cache_dtype", "float32")]

            # paged (lazy-beam-reorder) caches on TPU by default: the
            # physical per-step cache reorder disappears (see
            # beam_reorder_cache). `decode_paged_kv: false` opts out.
            want_paged = bool(self.hparams.get("decode_paged_kv", True))
            att_cached = (
                lambda n, u_max: make_kv_cache(
                    n, u_max, m.num_decoder_layers, m.nhead, d_head, dtype=cache_dtype,
                    paged=want_paged
                    and use_paged_cache(n, u_max, m.d_model, cache_dtype),
                ),
                lambda state, prev_tok, step: self.model.apply(
                    variables, prev_tok, enc, state, step, lens, cross,
                    method=ASRModel.decode_step_cached,
                ),
                beam_reorder_cache,
            )
            lm_cached = None
            if self.lm is not None and lm_weight > 0:
                lm_d_head = self.lm.d_model // self.lm.nhead
                # whole-LM-step megakernel weights, stacked ONCE per decode
                # (outside the beam-search scan): decode_step fuses all
                # layers into one pallas_call for fused-KV paged caches on
                # TPU (ops/pallas/lm_megastep.py; SATPU_LM_MEGA=0 opts out)
                lm_mega = (
                    self.lm.prepare_megastep(lm_variables["params"])
                    if self.lm.d_ffn % self.lm.d_model == 0 else None
                )
                lm_cached = (
                    lambda n, u_max: make_kv_cache(
                        n, u_max, self.lm.num_layers, self.lm.nhead, lm_d_head,
                        dtype=cache_dtype,
                        paged=want_paged
                        and use_paged_cache(n, u_max, self.lm.d_model, cache_dtype),
                    ),
                    lambda state, prev_tok, step: self.lm.apply(
                        lm_variables, prev_tok, state, step, lm_mega,
                        method=TransformerLM.decode_step,
                    ),
                    beam_reorder_cache,
                )

            cfg = BeamSearchConfig(
                beam_size=beam_size,
                bos_index=int(self.hparams.get("bos_index", 1)),
                eos_index=int(self.hparams.get("eos_index", 2)),
                blank_index=int(self.hparams.get("blank_index", 0)),
                ctc_weight=float(self.hparams.get("ctc_weight_decode", 0.4)),
                lm_weight=lm_weight,
                temperature=float(self.hparams.get("temperature", 1.15)),
                temperature_lm=float(self.hparams.get("temperature_lm", 1.15)),
                length_normalization=length_norm,
            )
            max_steps = self.hparams.get("max_decode_steps")
            return beam_search(
                None, enc, lens, p_ctc, cfg,
                max_steps=int(max_steps) if max_steps else None,
                att_cached=att_cached, lm_cached=lm_cached,
                # opt-in instrumentation: adds a stats dict (certified
                # top-k fallback count) as a 4th return element
                return_stats=bool(self.hparams.get("decode_return_stats")),
            )

        beam = int(self.hparams.get("test_beam_size", 66))
        lm_w = float(self.hparams.get("lm_weight", 0.6)) if self.lm is not None else 0.0
        self._decode_jit = jax.jit(
            lambda v, lmv, f, l: decode(v, lmv, f, l, beam, True, lm_w)
        )

    def _encode(self, feats, lens):
        return self._encode_jit(self.variables, feats, lens)

    def _decode_test(self, feats, lens):
        return self._decode_jit(self.variables, self.lm_variables or {}, feats, lens)

    # -- anonymizer eval hooks ------------------------------------------------------

    def start_test(self, brain):
        brain.wer_metric = ErrorRateStats()
        brain.wer_metric2 = ErrorRateStats()

    def eval_batch(self, brain, batch, stage, recon, clean, db):
        from ..train.brain import Stage

        lens = db[1]
        enc_r = self._encode(recon, lens)
        enc_o = self._encode(clean, lens)
        r = np.asarray(enc_r).reshape(len(enc_r), -1)
        o = np.asarray(enc_o).reshape(len(enc_o), -1)
        num = (r * o).sum(axis=1)
        den = np.linalg.norm(r, axis=1) * np.linalg.norm(o, axis=1)
        brain.utility_similarity_aggregator.append(num / np.maximum(den, 1e-8))

        if stage == Stage.TEST:
            # decode returns (tokens, lengths, scores[, stats]) — the stats
            # element appears when decode_return_stats is set in the config
            toks_r, len_r = self._decode_test(recon, lens)[:2]
            toks_o, len_o = self._decode_test(clean, lens)[:2]
            pred_r = [self.tokenizer.decode_ids(h).split(" ") for h in hyps_to_lists(toks_r, len_r)]
            pred_o = [self.tokenizer.decode_ids(h).split(" ") for h in hyps_to_lists(toks_o, len_o)]
            target = [w.split(" ") for w in batch.wrd]
            brain.wer_metric.append(batch.id, pred_r, target)
            brain.wer_metric2.append(batch.id, pred_o, target)

    def finish_test(self, brain) -> float:
        wer = brain.wer_metric.summarize("error_rate")
        wer_file = brain.hparams.get("wer_file")
        if wer_file:
            with open(wer_file, "w") as f:
                brain.wer_metric.write_stats(f)
        return wer


def load_lm(hparams) -> tuple[TransformerLM, dict] | None:
    """Load a shallow-fusion LM from an lm_train recipe checkpoint dir
    (``lm_checkpoint_dir``). The reference fetched a pretrained lm.ckpt via
    Pretrainer (convae.yaml:306-317) and fused it at lm_weight 0.6
    (convae.yaml:226-240); recipes/lm_train.py produces the equivalent
    checkpoint here. Returns (model, variables) or None when unset."""
    lm_dir = hparams.get("lm_checkpoint_dir")
    if not lm_dir or not os.path.isdir(lm_dir):
        return None
    from ..train.checkpoint import Checkpointer, PytreeRecoverable

    lm = TransformerLM(
        vocab=int(hparams.get("output_neurons", 5000)),
        d_model=int(hparams.get("lm_d_model", 768)),
        nhead=int(hparams.get("lm_nhead", 12)),
        num_layers=int(hparams.get("lm_num_layers", 12)),
        d_ffn=int(hparams.get("lm_d_ffn", 3072)),
    )
    variables = lm.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    holder = {"params": variables["params"]}
    ckptr = Checkpointer(
        lm_dir,
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: holder.__setitem__("params", p))},
    )
    if ckptr.recover_if_possible(min_key="loss") is None:
        raise FileNotFoundError(f"no LM checkpoint under {lm_dir}")
    return lm, {"params": holder["params"]}


def load_asr_bundle(hparams, tokenizer) -> ASRBundle | None:
    """Build the frozen bundle from an asr_train recipe checkpoint dir
    (``asr_checkpoint_dir``), or return None when not configured. When
    ``lm_checkpoint_dir`` is also set, the LM is attached and test decoding
    fuses it at ``lm_weight`` (reference: beam 66 + LM 0.6 + CTC 0.4,
    speechbrain_configs/convae.yaml:226-240)."""
    ckpt_dir = hparams.get("asr_checkpoint_dir")
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    from ..train.checkpoint import Checkpointer, PytreeRecoverable

    model = ASRModel(
        input_feats=int(hparams.get("n_mels", 80)),
        d_model=int(hparams.get("d_model", 768)),
        nhead=int(hparams.get("nhead", 8)),
        num_encoder_layers=int(hparams.get("num_encoder_layers", 12)),
        num_decoder_layers=int(hparams.get("num_decoder_layers", 6)),
        d_ffn=int(hparams.get("d_ffn", 3072)),
        output_neurons=int(hparams.get("output_neurons", 5000)),
    )
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((1, 8, int(hparams.get("n_mels", 80))))
    toks = jnp.zeros((1, 3), jnp.int32)
    variables = model.init(rng, feats, toks, jnp.ones((1,)))
    holder = {"params": variables["params"]}
    ckptr = Checkpointer(
        ckpt_dir,
        {"model": PytreeRecoverable(lambda: holder["params"], lambda p: holder.__setitem__("params", p))},
    )
    found = ckptr.recover_if_possible(max_key="ACC")
    if found is None:
        raise FileNotFoundError(f"no ASR checkpoint under {ckpt_dir}")
    new_vars = {"params": holder["params"], **{k: v for k, v in variables.items() if k != "params"}}
    utility_kind = hparams.get("utility_loss_kind", "mse")
    lm_pair = load_lm(hparams)
    lm, lm_variables = lm_pair if lm_pair is not None else (None, None)
    return ASRBundle(
        model, new_vars, tokenizer, hparams,
        lm=lm, lm_variables=lm_variables, utility_kind=utility_kind,
    )
