"""Beam search + CTC prefix scorer correctness tests."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from speech_anonymization_tpu.decoding import (
    BeamSearchConfig,
    beam_search,
    ctc_init_state,
    ctc_score_candidates,
    ctc_advance_state,
)
from speech_anonymization_tpu.decoding.beam_search import hyps_to_lists

BLANK = 0


def _collapse(path):
    out = []
    prev = None
    for s in path:
        if s != prev and s != BLANK:
            out.append(s)
        prev = s
    return tuple(out)


def _brute_force_scores(x):
    """x: (T, V) log-probs. Returns dicts: prefix_prob and full_prob over
    collapsed sequences."""
    t, v = x.shape
    prefix = {}
    full = {}
    for path in itertools.product(range(v), repeat=t):
        p = float(np.exp(sum(x[i, s] for i, s in enumerate(path))))
        y = _collapse(path)
        full[y] = full.get(y, 0.0) + p
        for i in range(len(y) + 1):
            prefix[y[:i]] = prefix.get(y[:i], 0.0) + p
    return prefix, full


def test_ctc_prefix_scorer_matches_brute_force():
    rng = np.random.default_rng(0)
    t, v = 4, 3
    x = np.log(rng.dirichlet(np.ones(v), size=t)).astype(np.float32)  # (T, V)
    prefix, full = _brute_force_scores(x)

    xb = jnp.asarray(x)[None]  # (1, T, V)
    eos = v  # out-of-range id used only for the eos column; extend V by 1
    x_ext = jnp.concatenate([xb, jnp.full((1, t, 1), -1e30)], axis=-1)
    state = ctc_init_state(x_ext, BLANK)

    # psi for single-symbol extensions from the empty prefix
    psi = np.asarray(ctc_score_candidates(x_ext, state, eos_index=v, blank=BLANK))[0]
    for c in (1, 2):
        np.testing.assert_allclose(np.exp(psi[c]), prefix[(c,)], rtol=1e-3)
    # eos column = full prob of the empty output
    np.testing.assert_allclose(np.exp(psi[v]), full[()], rtol=1e-3)

    # advance with token 1, then score second extensions
    state1 = ctc_advance_state(x_ext, state, jnp.asarray([1]), BLANK)
    psi1 = np.asarray(ctc_score_candidates(x_ext, state1, eos_index=v, blank=BLANK))[0]
    for c in (1, 2):
        np.testing.assert_allclose(np.exp(psi1[c]), prefix[(1, c)], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(np.exp(psi1[v]), full[(1,)], rtol=1e-3)


def test_beam_k1_equals_greedy():
    """K=1, no ctc/lm: beam search must reproduce greedy decoding of a
    deterministic step function."""
    v = 8
    b = 2
    # transition table: next token = (last+2) % v, eos at step 3 for item 0
    table = np.full((b, 5, v), -10.0, np.float32)
    seqs = [[4, 6, 3], [5, 7, 4, 6]]
    eos = 2
    for i, s in enumerate(seqs):
        for step, tok in enumerate(s):
            table[i, step, tok] = 0.0
        table[i, len(s), eos] = 0.0

    table_j = jnp.asarray(table)

    def att_step(tokens, step):
        n = tokens.shape[0]
        rows = table_j[jnp.arange(n) % b]
        return rows[:, jnp.minimum(step, 4)]

    enc = jnp.zeros((b, 5, 4))
    lens = jnp.ones((b,))
    cfg = BeamSearchConfig(beam_size=1, eos_index=eos, ctc_weight=0.0)
    tokens, lengths, scores = beam_search(att_step, enc, lens, None, cfg)
    hyps = hyps_to_lists(tokens, lengths)
    assert hyps[0] == seqs[0]
    assert hyps[1] == seqs[1]


def test_beam_prefers_higher_total_score():
    """A path that looks worse at step 0 but much better afterwards must win
    with K>=2 (the defining property of beam search vs greedy)."""
    v, eos = 6, 2
    # step fns return LOGITS (normalized inside beam_search). Step 0
    # favours token 3 over 4 (~ -0.22 vs -1.62 after softmax); after 3 the
    # eos is weak (~ -3.05), after 4 it is strong (~ -0.05): total([4,eos])
    # ~= -1.67 beats total([3,eos]) ~= -3.27 only if the beam kept token 4.
    def att_step(tokens, step):
        n = tokens.shape[0]
        prev = tokens[jnp.arange(n), jnp.maximum(step, 0)]
        row0 = jnp.full((v,), -8.0).at[3].set(-0.2).at[4].set(-1.6)
        row_after3 = jnp.full((v,), -8.0).at[eos].set(-3.0).at[5].set(0.0)
        row_after4 = jnp.full((v,), -8.0).at[eos].set(0.0).at[5].set(-3.0)
        after = jnp.where((prev == 4)[:, None], row_after4[None], row_after3[None])
        return jnp.where((step == 0), row0[None], after)

    enc = jnp.zeros((1, 4, 4))
    lens = jnp.ones((1,))
    greedy = beam_search(att_step, enc, lens, None, BeamSearchConfig(beam_size=1, eos_index=eos, ctc_weight=0.0))
    wide = beam_search(att_step, enc, lens, None, BeamSearchConfig(beam_size=3, eos_index=eos, ctc_weight=0.0))
    assert hyps_to_lists(*greedy[:2])[0] == [3]
    assert hyps_to_lists(*wide[:2])[0] == [4]


def test_beam_with_ctc_and_lm_fusion_runs():
    rng = np.random.default_rng(1)
    b, t, v, eos = 2, 6, 10, 2
    enc = jnp.asarray(rng.standard_normal((b, t, 4)), jnp.float32)
    lens = jnp.asarray([1.0, 0.7])
    ctc_lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32))
    att_table = jnp.asarray(rng.standard_normal((v,)), jnp.float32)

    def att_step(tokens, step):
        return jnp.tile(att_table[None], (tokens.shape[0], 1))

    def lm_step(tokens, step):
        return jnp.tile(-att_table[None], (tokens.shape[0], 1))

    cfg = BeamSearchConfig(
        beam_size=4, eos_index=eos, ctc_weight=0.4, lm_weight=0.6,
        temperature=1.15, temperature_lm=1.15, length_normalization=True,
    )
    f = jax.jit(lambda e, l, c: beam_search(att_step, e, l, c, cfg, lm_step))
    tokens, lengths, scores = f(enc, lens, ctc_lp)
    assert tokens.shape[0] == b
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(lengths) <= t).all()
