"""Cross-check the scan beam search against an independent slow decoder.

The fast implementation (decoding/beam_search.py) is a single lax.scan with
matmul-based CTC prefix scoring. This file re-implements the intended
semantics — SpeechBrain 0.5 S2STransformerBeamSearch as configured at
reference speechbrain_configs/convae.yaml:226-240 (joint CTC/attention
Watanabe scoring, shallow LM fusion, temperature, length norm /(t+1),
blank blocked from joint scoring) — as an obviously-correct python beam:
explicit lists, per-hypothesis numpy float64 CTC forward variables computed
with the textbook frame recursion (no matmul trick, no associative scan).

Property test: identical hypotheses and matching scores over randomized toy
models, >=20 seeds, beam in {2, 4}, with/without LM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_anonymization_tpu.decoding import BeamSearchConfig, beam_search
from speech_anonymization_tpu.decoding.beam_search import hyps_to_lists
from speech_anonymization_tpu.decoding.ctc_prefix import mask_ctc_log_probs

NEG_INF = -1e30
BLANK, BOS, EOS = 0, 1, 2


# ---------------------------------------------------------------- slow CTC

def _lse(a, b):
    return np.logaddexp(a, b)


class SlowCTCState:
    """Forward variables for one prefix, textbook O(T) recursion."""

    def __init__(self, x):
        t = x.shape[0]
        self.x = x  # (T, V) float64 masked log-probs
        self.r_b = np.cumsum(x[:, BLANK])
        self.r_nb = np.full(t, NEG_INF)
        self.last = None  # empty prefix

    def psi(self, eos_index):
        """psi[c] = log P(prefix . c ...) for every candidate c."""
        t, v = self.x.shape
        phi = _lse(self.r_nb, self.r_b)
        init = 0.0 if self.last is None else NEG_INF
        psi = np.full(v, NEG_INF)
        for c in range(v):
            if c == BLANK or c == eos_index:
                continue
            ph = self.r_b if c == self.last else phi
            acc = NEG_INF
            prev = init
            for i in range(t):
                acc = _lse(acc, prev + self.x[i, c])
                prev = ph[i]
            psi[c] = acc
        psi[eos_index] = _lse(self.r_nb[-1], self.r_b[-1])
        return psi

    def advance(self, c):
        t = self.x.shape[0]
        child = SlowCTCState.__new__(SlowCTCState)
        child.x = self.x
        child.last = c
        phi = _lse(self.r_nb, self.r_b)
        if c == self.last:
            phi = self.r_b
        init = 0.0 if self.last is None else NEG_INF
        r_nb = np.full(t, NEG_INF)
        r_b = np.full(t, NEG_INF)
        prev_nb = NEG_INF
        prev_b = NEG_INF
        prev_phi = init
        for i in range(t):
            r_nb[i] = self.x[i, c] + _lse(prev_nb, prev_phi)
            r_b[i] = self.x[i, BLANK] + _lse(prev_nb, prev_b)
            prev_nb, prev_b, prev_phi = r_nb[i], r_b[i], phi[i]
        child.r_nb, child.r_b = r_nb, r_b
        return child


# --------------------------------------------------------------- slow beam

def _log_softmax(v):
    m = v.max()
    e = np.exp(v - m)
    return v - m - np.log(e.sum())


def slow_beam_decode(att_table, lm_table, x_ctc, cfg, max_steps):
    """att_table/lm_table: (V_prev, S, V) logits keyed by (last_token, step).

    x_ctc: (T, V) float64 masked ctc log-probs (or None). Returns
    (tokens list, score).
    """
    k = cfg.beam_size
    att_w = 1.0 - cfg.ctc_weight if x_ctc is not None else 1.0
    hyps = [([], 0.0, SlowCTCState(x_ctc) if x_ctc is not None else None)]
    fin_score, fin_tokens, fin_len = NEG_INF, [], 0
    v = att_table.shape[-1]

    for step in range(max_steps):
        cands = []  # (total, hyp_idx, token, new_acc)
        for hi, (toks, acc, ctc) in enumerate(hyps):
            last = toks[-1] if toks else BOS
            att_lp = _log_softmax(att_table[last, step] / cfg.temperature)
            additive = att_w * att_lp
            if lm_table is not None and cfg.lm_weight > 0:
                lm_lp = _log_softmax(lm_table[last, step] / cfg.temperature_lm)
                additive = additive + cfg.lm_weight * lm_lp
            psi = ctc.psi(cfg.eos_index) if ctc is not None else np.zeros(v)
            total = acc + additive + cfg.ctc_weight * psi if ctc is not None else acc + additive

            # eos -> finished pool (top-1), normalized by (step + 1)
            norm = (step + 1) if cfg.length_normalization else 1.0
            eos_score = total[cfg.eos_index] / norm
            if step >= cfg.min_decode_steps and eos_score > fin_score:
                fin_score, fin_tokens, fin_len = eos_score, list(toks), len(toks)

            for c in range(v):
                if c == cfg.eos_index:
                    continue
                cands.append((total[c], hi, c, acc + additive[c]))

        cands.sort(key=lambda e: -e[0])
        best_alive_total = cands[0][0]
        new_hyps = []
        for total, hi, c, new_acc in cands[:k]:
            toks, _, ctc = hyps[hi]
            new_hyps.append((toks + [c], new_acc, ctc.advance(c) if ctc is not None else None))
        hyps = new_hyps

    if fin_score <= NEG_INF / 2:
        norm = (max_steps + 1) if cfg.length_normalization else 1.0
        return hyps[0][0], best_alive_total / norm
    return fin_tokens, fin_score


# --------------------------------------------------------------- fast side

def _make_fast(k, lm_w, ln, max_steps, min_steps=0):
    cfg = BeamSearchConfig(
        beam_size=k, bos_index=BOS, eos_index=EOS, blank_index=BLANK,
        ctc_weight=0.4, lm_weight=lm_w, temperature=1.15,
        temperature_lm=1.15, length_normalization=ln,
        min_decode_steps=min_steps,
    )

    @jax.jit
    def run(att_table, lm_table, enc, lens, ctc_lp):
        def att_step(tokens, step):
            n = tokens.shape[0]
            last = tokens[jnp.arange(n), step]
            return att_table[last, step]

        def lm_step(tokens, step):
            n = tokens.shape[0]
            last = tokens[jnp.arange(n), step]
            return lm_table[last, step]

        return beam_search(
            att_step, enc, lens, ctc_lp, cfg,
            lm_step_fn=lm_step if lm_w > 0 else None, max_steps=max_steps,
        )

    return run, cfg


# (beam, lm_w, ln, vocab, batch, min_steps, seeds): the original 20-seed
# B=1/V=8 grid, plus wide cases (VERDICT r2 weak #6): batched decode,
# vocab 32 at the reference's beam widths (10 and 66-capped-by-vocab), and
# a min_decode_steps>0 case exercising the eos gate on both sides.
CASES = [(k, lm_w, True, 8, 1, 0, 20) for k in (2, 4) for lm_w in (0.0, 0.6)]
CASES += [
    (10, 0.6, True, 32, 2, 0, 8),
    (10, 0.0, True, 32, 3, 0, 8),
    (4, 0.6, True, 8, 2, 2, 12),
    (16, 0.6, True, 32, 2, 0, 4),
]


@pytest.mark.parametrize("k,lm_w,ln,v,batch,min_steps,seeds", CASES)
def test_fast_beam_matches_slow_reference(k, lm_w, ln, v, batch, min_steps, seeds):
    t_enc, max_steps = 5, 6
    fast, cfg = _make_fast(k, lm_w, ln, max_steps, min_steps)
    mismatches = []
    for seed in range(seeds):
        rng = np.random.default_rng(seed)
        att = rng.standard_normal((v, max_steps, v)).astype(np.float32) * 2.0
        lm = rng.standard_normal((v, max_steps, v)).astype(np.float32) * 2.0
        ctc_raw = np.log(
            rng.dirichlet(np.ones(v), size=(batch, t_enc))
        ).astype(np.float32)
        lens = rng.choice([0.6, 1.0], size=batch).astype(np.float32)
        x_masked = np.asarray(
            mask_ctc_log_probs(jnp.asarray(ctc_raw), jnp.asarray(lens), BLANK)
        )

        enc = jnp.zeros((batch, t_enc, 4))
        toks, lengths, scores = fast(
            jnp.asarray(att), jnp.asarray(lm), enc, jnp.asarray(lens),
            jnp.asarray(ctc_raw),
        )
        fast_hyps = hyps_to_lists(toks, lengths)
        fast_scores = np.asarray(scores)

        for b in range(batch):
            slow_hyp, slow_score = slow_beam_decode(
                att.astype(np.float64),
                lm.astype(np.float64) if lm_w > 0 else None,
                x_masked[b].astype(np.float64),
                cfg, max_steps,
            )
            if fast_hyps[b] != slow_hyp or abs(float(fast_scores[b]) - slow_score) > 1e-3:
                mismatches.append(
                    (seed, b, fast_hyps[b], slow_hyp, float(fast_scores[b]), slow_score)
                )
    assert not mismatches, f"fast != slow reference decoder: {mismatches}"


def test_blank_never_emitted_with_ctc():
    """Regression (ADVICE r1, high): unmasked psi[blank] let flat attention
    emit blank tokens into hypotheses."""
    t_enc, v = 6, 8

    def att_step(tokens, step):  # flat attention — CTC dominates
        return jnp.zeros((tokens.shape[0], v))

    rng = np.random.default_rng(3)
    ctc = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, t_enc, v)), jnp.float32) * 3.0
    )
    cfg = BeamSearchConfig(beam_size=4, bos_index=BOS, eos_index=EOS,
                           blank_index=BLANK, ctc_weight=0.4)
    toks, lengths, _ = beam_search(att_step, jnp.zeros((2, t_enc, 4)),
                                   jnp.ones((2,)), ctc, cfg)
    for hyp in hyps_to_lists(toks, lengths):
        assert BLANK not in hyp
