"""KV-cached decoding must match the full-prefix path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.decoding import BeamSearchConfig, beam_search
from speech_anonymization_tpu.decoding.beam_search import hyps_to_lists
from speech_anonymization_tpu.models.asr import ASRModel
from speech_anonymization_tpu.models.transformer import TransformerLM, make_kv_cache

KEY = jax.random.PRNGKey(0)
SMALL = dict(d_model=32, nhead=4, num_encoder_layers=1, num_decoder_layers=2,
             d_ffn=64, output_neurons=24)


def _setup():
    model = ASRModel(**SMALL)
    feats = jax.random.normal(KEY, (2, 24, 80))
    tokens = jnp.asarray([[1, 5, 6], [1, 7, 3]])
    lens = jnp.asarray([1.0, 0.75])
    variables = model.init(KEY, feats, tokens, lens)
    enc = model.apply(variables, feats, lens, method=ASRModel.encode)
    return model, variables, enc, lens


def test_decode_step_cached_matches_full_prefix():
    model, variables, enc, lens = _setup()
    b = enc.shape[0]
    u_max = 6
    tokens = jnp.asarray([[1, 5, 6, 9, 2, 0], [1, 7, 3, 4, 8, 2]], jnp.int32)
    cache = make_kv_cache(b, u_max, SMALL["num_decoder_layers"], SMALL["nhead"],
                          SMALL["d_model"] // SMALL["nhead"])
    for step in range(4):
        full = model.apply(
            variables, tokens, enc, lens, step, method=ASRModel.decode_one_step
        )
        cached, cache = model.apply(
            variables, tokens[:, step], enc, cache, step, lens,
            method=ASRModel.decode_step_cached,
        )
        np.testing.assert_allclose(np.asarray(cached), np.asarray(full), atol=2e-4), step


def test_beam_search_cached_equals_uncached():
    from speech_anonymization_tpu.models.transformer import beam_reorder_cache

    model, variables, enc, lens = _setup()
    b = enc.shape[0]
    ctc_logits = model.apply(variables, enc, method=lambda m, e: m.heads.ctc_logits(e))
    p_ctc = jax.nn.log_softmax(ctc_logits, -1)
    k = 3
    enc_k = jnp.repeat(enc, k, axis=0)
    lens_k = jnp.repeat(lens, k, axis=0)

    def att_step(flat_tokens, step):
        return model.apply(
            variables, flat_tokens, enc_k, lens_k, step, method=ASRModel.decode_one_step
        )

    # memory stays at the batch level; decode_step groups the K beams
    att_cached = (
        lambda n, u_max: make_kv_cache(n, u_max, SMALL["num_decoder_layers"], SMALL["nhead"],
                                       SMALL["d_model"] // SMALL["nhead"]),
        lambda state, prev, step: model.apply(
            variables, prev, enc, state, step, lens, method=ASRModel.decode_step_cached
        ),
        beam_reorder_cache,
    )
    cfg = BeamSearchConfig(beam_size=k, ctc_weight=0.4, length_normalization=True)
    t_u = beam_search(att_step, enc, lens, p_ctc, cfg, max_steps=5)
    t_c = beam_search(None, enc, lens, p_ctc, cfg, max_steps=5, att_cached=att_cached)
    assert hyps_to_lists(*t_u[:2]) == hyps_to_lists(*t_c[:2])
    np.testing.assert_allclose(np.asarray(t_u[2]), np.asarray(t_c[2]), atol=1e-4)


def test_beam_reorder_cache_matches_gather():
    """The Pallas DMA permute must be EXACT vs a row gather (pure copy),
    for f32 and bf16 caches (flat (L, N, U, M) layout, U multiple of 8)."""
    from speech_anonymization_tpu.models.transformer import beam_reorder_cache

    b, k, u = 2, 3, 8
    for dtype in (jnp.float32, jnp.bfloat16):
        cache = {
            "k": jax.random.normal(KEY, (2, b * k, u, 32)).astype(dtype),
            "v": jax.random.normal(jax.random.PRNGKey(1), (2, b * k, u, 32)).astype(dtype),
            "tokens": jax.random.randint(KEY, (b * k, u), 0, 9),
        }
        parent = jnp.asarray([[2, 0, 1], [1, 1, 0]], jnp.int32)
        flat_parent = (parent + jnp.arange(b)[:, None] * k).reshape(-1)
        got = jax.jit(beam_reorder_cache)(cache, parent)
        # k/v gather is along axis 1 (layer-stacked layout)
        want = {
            "k": cache["k"][:, flat_parent],
            "v": cache["v"][:, flat_parent],
            "tokens": cache["tokens"][flat_parent],
        }
        for key in ("k", "v", "tokens"):
            np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want[key]))


def test_beam_search_bf16_cache_matches_f32_on_toy_model():
    """bf16 decode caches (the production default) must reproduce the f32
    hypotheses on the toy model (scores may differ at bf16 resolution)."""
    model, variables, enc, lens = _setup()
    ctc_logits = model.apply(variables, enc, method=lambda m, e: m.heads.ctc_logits(e))
    p_ctc = jax.nn.log_softmax(ctc_logits, -1)
    k = 3
    cfg = BeamSearchConfig(beam_size=k, ctc_weight=0.4, length_normalization=True)
    from speech_anonymization_tpu.models.transformer import beam_reorder_cache

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        att_cached = (
            lambda n, u_max: make_kv_cache(
                n, u_max, SMALL["num_decoder_layers"], SMALL["nhead"],
                SMALL["d_model"] // SMALL["nhead"], dtype=dtype,
            ),
            lambda state, prev, step: model.apply(
                variables, prev, enc, state, step, lens, method=ASRModel.decode_step_cached
            ),
            beam_reorder_cache,
        )
        outs[dtype] = beam_search(None, enc, lens, p_ctc, cfg, max_steps=5,
                                  att_cached=att_cached)
    assert hyps_to_lists(*outs[jnp.float32][:2]) == hyps_to_lists(*outs[jnp.bfloat16][:2])
    np.testing.assert_allclose(
        np.asarray(outs[jnp.float32][2]), np.asarray(outs[jnp.bfloat16][2]), atol=5e-2
    )


def test_lm_decode_step_matches_full():
    lm = TransformerLM(vocab=24, d_model=32, nhead=4, num_layers=2, d_ffn=64)
    tokens = jnp.asarray([[1, 5, 6, 9]], jnp.int32)
    variables = lm.init(KEY, tokens)
    full = lm.apply(variables, tokens)
    cache = make_kv_cache(1, 4, 2, 4, 8)
    for step in range(4):
        logits, cache = lm.apply(
            variables, tokens[:, step], cache, step, method=TransformerLM.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, step]), atol=2e-4
        )


def test_beam_search_int8_cache_matches_f32_on_toy_model():
    """int8 decode caches (quantized serving mode) must reproduce the f32
    hypotheses on the toy model; scores shift by quantization noise."""
    model, variables, enc, lens = _setup()
    ctc_logits = model.apply(variables, enc, method=lambda m, e: m.heads.ctc_logits(e))
    p_ctc = jax.nn.log_softmax(ctc_logits, -1)
    cfg = BeamSearchConfig(beam_size=3, ctc_weight=0.4, length_normalization=True)
    from speech_anonymization_tpu.models.transformer import beam_reorder_cache

    outs = {}
    for dtype in (jnp.float32, jnp.int8):
        att_cached = (
            lambda n, u_max: make_kv_cache(
                n, u_max, SMALL["num_decoder_layers"], SMALL["nhead"],
                SMALL["d_model"] // SMALL["nhead"], dtype=dtype,
            ),
            lambda state, prev, step: model.apply(
                variables, prev, enc, state, step, lens, method=ASRModel.decode_step_cached
            ),
            beam_reorder_cache,
        )
        outs[dtype] = beam_search(None, enc, lens, p_ctc, cfg, max_steps=5,
                                  att_cached=att_cached)
    assert hyps_to_lists(*outs[jnp.float32][:2]) == hyps_to_lists(*outs[jnp.int8][:2])
    np.testing.assert_allclose(
        np.asarray(outs[jnp.float32][2]), np.asarray(outs[jnp.int8][2]), atol=0.15
    )


def test_attend_cached_tolerates_garbage_beyond_step():
    """Cache positions >= step are UNDEFINED after a beam reorder
    (beam_gather_rows copies only <= step). attend_cached must not let
    NaN/Inf garbage there poison the output: softmax zeros don't protect
    the value einsum (0 * NaN = NaN), so the value buffer is masked."""
    model, variables, enc, lens = _setup()
    b = enc.shape[0]
    u_max = 8
    tokens = jnp.asarray([[1, 5, 6, 9, 2, 0, 0, 0], [1, 7, 3, 4, 8, 2, 0, 0]],
                         jnp.int32)
    d_head = SMALL["d_model"] // SMALL["nhead"]
    cache = make_kv_cache(b, u_max, SMALL["num_decoder_layers"], SMALL["nhead"],
                          d_head)
    step = 3
    clean = dict(cache)
    # warm the cache through steps 0..2 so positions < step are real
    for s in range(step):
        _, clean = model.apply(
            variables, tokens[:, s], enc, clean, s, lens,
            method=ASRModel.decode_step_cached,
        )
    ref, _ = model.apply(
        variables, tokens[:, step], enc, dict(clean), step, lens,
        method=ASRModel.decode_step_cached,
    )
    # poison every cache position >= step with NaN and +/-inf
    pos = jnp.arange(u_max)[None, None, :, None]
    poison = {
        "k": jnp.where(pos >= step, jnp.nan, clean["k"]),
        "v": jnp.where(pos >= step, jnp.inf, clean["v"]),
        "tokens": clean["tokens"],
    }
    out, _ = model.apply(
        variables, tokens[:, step], enc, poison, step, lens,
        method=ASRModel.decode_step_cached,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
