"""Data-parallel beam-search decode on the virtual 8-device CPU mesh.

The reference evaluates WER on a single GPU; here the eval path scales
like training: the batch (encoder states, lengths, CTC posteriors) shards
over the 1-D data mesh and the whole fixed-shape beam search — KV-cached
steps, CTC prefix scoring, top-k, finished pool — runs SPMD with no
cross-item communication (beam expansion is per-utterance). Invariant:
sharded hypotheses == unsharded hypotheses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.decoding.beam_search import BeamSearchConfig, beam_search
from speech_anonymization_tpu.models.asr import ASRModel
from speech_anonymization_tpu.models.transformer import beam_reorder_cache, make_kv_cache
from speech_anonymization_tpu.parallel import (
    data_sharding,
    make_mesh,
    replicated_sharding,
)

SMALL = dict(d_model=32, nhead=4, num_encoder_layers=1, num_decoder_layers=2,
             d_ffn=64, output_neurons=11)


def _decode_fn(model, variables):
    def decode(feats, lens):
        enc = model.apply(variables, feats, lens, method=ASRModel.encode)
        ctc_logits = model.apply(
            variables, enc, method=lambda m, e: m.heads.ctc_logits(e)
        )
        p_ctc = jax.nn.log_softmax(ctc_logits, -1)
        m = model
        cross = model.apply(variables, enc, method=ASRModel.cross_kv)
        att_cached = (
            lambda n, u_max: make_kv_cache(
                n, u_max, m.num_decoder_layers, m.nhead, m.d_model // m.nhead
            ),
            lambda state, prev_tok, step: model.apply(
                variables, prev_tok, enc, state, step, lens, cross,
                method=ASRModel.decode_step_cached,
            ),
            beam_reorder_cache,
        )
        cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.4, length_normalization=True)
        return beam_search(None, enc, lens, p_ctc, cfg, max_steps=6,
                           att_cached=att_cached)

    return decode


def test_sharded_decode_equals_unsharded():
    mesh = make_mesh()
    model = ASRModel(**SMALL)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (8, 20, 80))
    lens = jnp.ones((8,))
    variables = model.init(rng, feats[:1], jnp.zeros((1, 3), jnp.int32), lens[:1])

    decode = jax.jit(_decode_fn(model, variables))
    toks1, len1, score1 = decode(feats, lens)

    feats_s = jax.device_put(feats, data_sharding(mesh))
    lens_s = jax.device_put(lens, data_sharding(mesh))
    variables_r = jax.device_put(variables, replicated_sharding(mesh))
    decode_s = jax.jit(_decode_fn(model, variables_r))
    toks2, len2, score2 = decode_s(feats_s, lens_s)

    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(len1), np.asarray(len2))
    np.testing.assert_allclose(np.asarray(score1), np.asarray(score2), atol=1e-5)
