"""ASR model bundle: conv frontend + transformer + CTC/seq heads.

Replaces models/SpeechBrain_ASR.py's refactored Brain: the
``get_predictions(feats, wav_lens, tokens_bos, eval, do_ctc)`` surface
(models/SpeechBrain_ASR.py:101-103) becomes explicit pure functions:

  * ``encode``           — CNN -> transformer encoder (the utility-loss hot
                           path, run twice per training step in the
                           reference: speechbrain_convae_train.py:99-100)
  * ``forward``          — encoder + decoder log-probs for CTC/KLdiv losses
  * the beam-search decode lives in decoding/beam_search.py and consumes
    ``encode`` outputs plus the seq/ctc heads.

Note the reference BYPASSES feature normalization inside the ASR
(models/SpeechBrain_ASR.py:22 commented out) because the anonymizer has
already normalized — preserved here (the bundle takes normalized feats).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .transformer import ConvolutionFrontEnd, TransformerASR


class ASRHeads(nn.Module):
    d_model: int = 768
    output_neurons: int = 5000

    def setup(self):
        self.ctc_lin = nn.Dense(self.output_neurons)
        self.seq_lin = nn.Dense(self.output_neurons)

    def ctc_logits(self, enc_out):
        return self.ctc_lin(enc_out)

    def seq_logits(self, dec_out):
        return self.seq_lin(dec_out)

    def __call__(self, enc_out, dec_out):
        return (
            jax.nn.log_softmax(self.ctc_lin(enc_out), -1),
            jax.nn.log_softmax(self.seq_lin(dec_out), -1),
        )


class ASRModel(nn.Module):
    """CNN frontend + TransformerASR + ctc/seq linear heads as ONE module."""

    input_feats: int = 80
    d_model: int = 768
    nhead: int = 8
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    d_ffn: int = 3072
    output_neurons: int = 5000
    dropout: float = 0.0
    pad_index: int = 0
    # SpeechBrain-0.5 forward parity for checkpoints ported from the
    # reference's torch layout (utils/reference_ckpts.load_reference_asr):
    # SB-faithful conv frontend + final enc/dec LayerNorms + exact GELU.
    sb_compat: bool = False

    def setup(self):
        from .transformer import SBConvFrontEnd

        self.cnn = SBConvFrontEnd() if self.sb_compat else ConvolutionFrontEnd()
        freq_out = (self.input_feats + 1) // 2
        freq_out = (freq_out + 1) // 2  # two stride-2 convs: 80 -> 20
        self.transformer = TransformerASR(
            input_size=freq_out * 512,
            tgt_vocab=self.output_neurons,
            d_model=self.d_model,
            nhead=self.nhead,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            d_ffn=self.d_ffn,
            dropout=self.dropout,
            pad_index=self.pad_index,
            sb_compat=self.sb_compat,
        )
        self.heads = ASRHeads(self.d_model, self.output_neurons)

    def encode(self, feats, wav_lens=None, train: bool = False):
        """(B, T, F) normalized feats -> (B, T/4, d_model) encoder states."""
        src = self.cnn(feats, train=train)
        return self.transformer.encode(src, wav_lens, train=train)

    def decode(self, tokens_bos, enc_out, wav_lens=None, train: bool = False):
        return self.transformer.decode(tokens_bos, enc_out, wav_lens, train=train)

    def __call__(self, feats, tokens_bos, wav_lens=None, train: bool = False):
        """-> (enc_out, dec_out, p_ctc, p_seq) — the do_ctc=True surface of
        models/SpeechBrain_ASR.py:16-46 minus the beam search."""
        enc_out = self.encode(feats, wav_lens, train)
        dec_out = self.decode(tokens_bos, enc_out, wav_lens, train)
        p_ctc, p_seq = self.heads(enc_out, dec_out)
        return enc_out, dec_out, p_ctc, p_seq

    def cross_kv(self, enc_out):
        """Precompute per-layer cross-attention K/V once per decode."""
        return self.transformer.cross_kv(enc_out)

    def decode_step_cached(self, token, enc_out, cache, step, wav_lens=None, cross_kv=None):
        """KV-cached single-step decode: (B,) token -> ((B, V) logits, cache)."""
        hidden, new_cache = self.transformer.decode_step(
            token, enc_out, cache, step, wav_lens, cross_kv
        )
        return self.heads.seq_logits(hidden), new_cache

    def decode_one_step(self, tokens_prefix, enc_out, wav_lens=None, step=None):
        """RAW next-token logits for the beam search (which applies
        temperature + log_softmax itself): (B, U) prefix -> (B, V).
        ``step``: index of the last valid prefix column (the beam search
        passes the full static buffer); defaults to the final column.
        Recomputes the prefix (no KV cache) — documented O(U^2) tradeoff."""
        dec = self.transformer.decode(tokens_prefix, enc_out, wav_lens, train=False)
        logits = self.heads.seq_logits(dec)
        if step is None:
            return logits[:, -1]
        return logits[:, step]
