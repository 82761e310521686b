"""Fixed-shape batched S2S transformer beam search with joint CTC scoring
and shallow LM fusion.

Replaces speechbrain.decoders.S2STransformerBeamSearch (convae.yaml:213-240;
called at models/SpeechBrain_ASR.py:40 and speechbrain_train.py:106-108):
beam 10 (valid, no LM) / beam 66 + lm_weight 0.6 + ctc_weight_decode 0.4 +
temperature 1.15 + length normalization (test). The reference implementation
grows python lists per step — unusable under XLA; this one is a single
lax.scan with static shapes (SURVEY.md §7 hard part #1):

  * alive beams: (B, K) hypotheses in a (B, K, U_max) token buffer;
  * each step decodes ALL beams in one batched forward over the full
    static buffer (causal mask; step column read out) — no KV cache yet,
    documented O(U^2) tradeoff for compile simplicity;
  * candidate scores = (1-ctc_w)*attn + lm_w*lm (additive, accumulated)
    + ctc_w * psi_ctc (full-prefix, from decoding/ctc_prefix.py);
  * eos candidates update a per-batch finished pool (top-1, with optional
    length normalization); eos is masked out of alive expansion;
  * after the scan, the best finished hypothesis is returned (fallback to
    the best alive if nothing finished).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .ctc_prefix import (
    CTCPrefixState,
    ctc_advance_state_prepared,
    ctc_init_state,
    ctc_prepare,
    ctc_score_candidates_prepared,
    mask_ctc_log_probs,
    pad_ctc_frames,
)
from .topk import fast_top_k_counted

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 10
    bos_index: int = 1
    eos_index: int = 2
    blank_index: int = 0
    ctc_weight: float = 0.4
    lm_weight: float = 0.0
    temperature: float = 1.0
    temperature_lm: float = 1.0
    length_normalization: bool = False
    max_decode_ratio: float = 1.0
    min_decode_steps: int = 0


def beam_search(
    att_step_fn: Callable[[jax.Array, jax.Array], jax.Array] | None,
    enc_out: jax.Array,
    enc_lens: jax.Array,
    ctc_log_probs: jax.Array | None,
    cfg: BeamSearchConfig,
    lm_step_fn: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    max_steps: int | None = None,
    att_cached: tuple | None = None,
    lm_cached: tuple | None = None,
    return_stats: bool = False,
):
    """Decode. Returns (tokens (B, U_max), lengths (B,), scores (B,)); with
    ``return_stats`` a 4th element: {'topk_fallbacks': int32 scalar — decode
    steps whose certified-approx top-k certificate failed and ran the exact
    sort (decoding/topk.py), 'steps': total decode steps}.

    Two decoder interfaces:
      * full-prefix: ``att_step_fn(tokens (N, U_max), step) -> (N, V)``
        next-token LOGITS for the prefix tokens[:, :step+1] (static buffer,
        causal mask; logits at column ``step``) — O(U^2) total;
      * KV-cached: ``att_cached = (init_fn, step_fn[, reorder_fn])`` with
        ``init_fn(n, u_max) -> state``,
        ``step_fn(state, prev_token (N,), step) -> (logits (N, V), state)``
        — O(U) per step — and optional
        ``reorder_fn(state, parent (B, K), step) -> state`` to reorder the
        cache to new beam parents (e.g. models.transformer.
        beam_reorder_cache's Pallas DMA gather of positions <= step);
        without it the cache is row-gathered.
    ``lm_step_fn``/``lm_cached`` follow the same contracts.
    ``ctc_log_probs``: (B, T, V) from the ctc head, or None to disable
    joint scoring. Temperatures are applied here.
    """
    b, t_enc, _ = enc_out.shape
    k = cfg.beam_size
    if max_steps is None:
        max_steps = max(int(cfg.max_decode_ratio * t_enc), 1)
    u_max = max_steps + 1  # bos + emitted tokens

    use_ctc = ctc_log_probs is not None and cfg.ctc_weight > 0
    if use_ctc:
        v = ctc_log_probs.shape[-1]
        x_ctc = mask_ctc_log_probs(ctc_log_probs, enc_lens, cfg.blank_index)
        t_real = x_ctc.shape[1]
        x_ctc = pad_ctc_frames(x_ctc)
        prep = ctc_prepare(x_ctc, cfg.blank_index, k=k, t_real=t_real)
        ctc_state = ctc_init_state(x_ctc, cfg.blank_index, k=k)
    else:
        prep = None
        ctc_state = None

    tokens = jnp.full((b, k, u_max), cfg.blank_index, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.bos_index)
    # only beam 0 is live initially (identical prefixes would be duplicated)
    acc = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_INF) * jnp.ones((b, 1))
    fin_score = jnp.full((b,), NEG_INF)
    fin_tokens = jnp.zeros((b, u_max), jnp.int32)
    fin_len = jnp.zeros((b,), jnp.int32)

    att_w = 1.0 - cfg.ctc_weight if use_ctc else 1.0
    att_state0 = att_cached[0](b * k, u_max) if att_cached is not None else ()
    lm_state0 = lm_cached[0](b * k, u_max) if lm_cached is not None else ()

    def flatten(x):  # (B, K, ...) -> (B*K, ...)
        return x.reshape((b * k,) + x.shape[2:])

    def unflatten(x):
        return x.reshape((b, k) + x.shape[1:])

    def step_fn(carry, step):
        (tokens, acc, ctc_state, fin_score, fin_tokens, fin_len,
         best_total, n_fallback, att_state, lm_state) = carry
        flat_tokens = flatten(tokens)  # (B*K, U_max)
        prev_token = flat_tokens[jnp.arange(b * k), step]  # last committed

        if att_cached is not None:
            att_logits, att_state = att_cached[1](att_state, prev_token, step)
        else:
            att_logits = att_step_fn(flat_tokens, step)  # (B*K, V)
        att_lp = jax.nn.log_softmax(att_logits / cfg.temperature, -1)
        scores_step = att_w * att_lp
        if lm_cached is not None and cfg.lm_weight > 0:
            lm_logits, lm_state = lm_cached[1](lm_state, prev_token, step)
            lm_lp = jax.nn.log_softmax(lm_logits / cfg.temperature_lm, -1)
            scores_step = scores_step + cfg.lm_weight * lm_lp
        elif lm_step_fn is not None and cfg.lm_weight > 0:
            lm_logits = lm_step_fn(flat_tokens, step)
            lm_lp = jax.nn.log_softmax(lm_logits / cfg.temperature_lm, -1)
            scores_step = scores_step + cfg.lm_weight * lm_lp

        additive = unflatten(scores_step)  # (B, K, V)
        total = acc[:, :, None] + additive
        if use_ctc:
            psi = unflatten(
                ctc_score_candidates_prepared(prep, ctc_state, cfg.eos_index, cfg.blank_index)
            )
            total = total + cfg.ctc_weight * psi

        # finished pool update from the eos column
        eos_total = total[:, :, cfg.eos_index]  # (B, K)
        hyp_len = step  # tokens emitted before eos
        # reference norm: S2SBeamSearcher divides by (t + 1) — the token
        # count including the current (eos) step — not max(t, 1).
        norm = (step + 1).astype(jnp.float32) if cfg.length_normalization else 1.0
        eos_scores = eos_total / norm
        allow_eos = step >= cfg.min_decode_steps
        eos_scores = jnp.where(allow_eos, eos_scores, NEG_INF)
        best_eos = jnp.argmax(eos_scores, axis=1)  # (B,)
        best_eos_score = jnp.take_along_axis(eos_scores, best_eos[:, None], 1)[:, 0]
        improved = best_eos_score > fin_score
        new_fin_tokens = jnp.take_along_axis(
            tokens, best_eos[:, None, None], axis=1
        )[:, 0]
        fin_tokens = jnp.where(improved[:, None], new_fin_tokens, fin_tokens)
        fin_len = jnp.where(improved, hyp_len, fin_len)
        fin_score = jnp.where(improved, best_eos_score, fin_score)

        # alive expansion: mask eos, exact top-k over K*V via the certified
        # approx shortlist (decoding/topk.py — a plain lax.top_k lowers to
        # a monolithic sort, 1.9 ms/step at beam 66; a two-stage per-beam
        # top-k was tried and measured even slower, 2.8 ms/step).
        v = total.shape[-1]
        alive = total.at[:, :, cfg.eos_index].set(NEG_INF)
        flat = alive.reshape(b, k * v)
        top_val, top_idx, fell_back = fast_top_k_counted(flat, k)  # (B, K)
        n_fallback = n_fallback + fell_back
        parent = top_idx // v
        token = (top_idx % v).astype(jnp.int32)
        # full score (att+lm+ctc_weight*psi) of the best alive beam — used
        # by the nothing-finished fallback; acc alone omits the CTC term.
        best_total = top_val[:, 0]

        new_tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        new_tokens = new_tokens.at[:, :, step + 1].set(token)
        new_additive = jnp.take_along_axis(
            additive.reshape(b, k * v), top_idx, axis=1
        )
        parent_acc = jnp.take_along_axis(acc, parent, axis=1)
        new_acc = parent_acc + new_additive

        flat_parent = (parent + jnp.arange(b)[:, None] * k).reshape(-1)
        if use_ctc:
            gathered = CTCPrefixState(
                r_nb=ctc_state.r_nb[flat_parent],
                r_b=ctc_state.r_b[flat_parent],
                last_token=ctc_state.last_token[flat_parent],
                prefix_empty=ctc_state.prefix_empty[flat_parent],
            )
            new_ctc = ctc_advance_state_prepared(
                prep, gathered, token.reshape(-1), cfg.blank_index
            )
        else:
            new_ctc = ctc_state
        # reorder decoder caches to the new beam order (custom reorder_fn
        # when provided — Pallas DMA gather of positions <= step — else a
        # row gather). In the fallback the beam-row axis depends on leaf
        # rank: make_kv_cache stacks layers leading, so (L, N, U, M) k/v
        # and (L, N, U) scale leaves carry rows on axis 1, while 2-D
        # leaves (tokens, plain per-row state) carry rows on axis 0.
        def _gather_leaf(a):
            axis = 1 if a.ndim >= 3 else 0
            return jnp.take(a, flat_parent, axis=axis)

        reorder = lambda tree: jax.tree_util.tree_map(_gather_leaf, tree)
        if att_cached is not None:
            att_state = (
                att_cached[2](att_state, parent, step) if len(att_cached) > 2
                else reorder(att_state)
            )
        if lm_cached is not None:
            lm_state = (
                lm_cached[2](lm_state, parent, step) if len(lm_cached) > 2
                else reorder(lm_state)
            )

        return (
            new_tokens, new_acc, new_ctc, fin_score, fin_tokens, fin_len,
            best_total, n_fallback, att_state, lm_state
        ), None

    best_total0 = jnp.full((b,), NEG_INF)
    carry = (tokens, acc, ctc_state, fin_score, fin_tokens, fin_len,
             best_total0, jnp.zeros((), jnp.int32), att_state0, lm_state0)

    # two decode steps per scan iteration: XLA pins each while-loop carry
    # element to ONE buffer, so a cache that ping-pongs through the Pallas
    # reorder (whose output cannot alias its input) costs a full-cache
    # copy-back per step. With two steps per body the second reorder's
    # output lands back in the pinned buffer and both copies vanish
    # (measured: 2 x ~2.1 ms/step at the bench shape, BENCHMARKS.md r2).
    def double_step(carry, i):
        carry, _ = step_fn(carry, 2 * i)
        carry, _ = step_fn(carry, 2 * i + 1)
        return carry, None

    carry, _ = jax.lax.scan(double_step, carry, jnp.arange(max_steps // 2))
    if max_steps % 2:
        carry, _ = step_fn(carry, jnp.asarray(max_steps - 1, jnp.int32))
    tokens, acc, _, fin_score, fin_tokens, fin_len, best_total, n_fallback = carry[:8]

    # fall back to best alive when nothing finished — score uses the last
    # step's FULL total (incl. CTC) normalized by (max_steps + 1), matching
    # the reference's forced-eos fill at timestep max_decode_steps.
    norm = (
        jnp.full((b,), float(max_steps + 1)) if cfg.length_normalization else jnp.ones((b,))
    )
    best_alive_score = best_total / norm
    none_finished = fin_score <= NEG_INF / 2
    out_tokens = jnp.where(none_finished[:, None], tokens[:, 0], fin_tokens)
    out_len = jnp.where(none_finished, max_steps, fin_len)
    out_score = jnp.where(none_finished, best_alive_score, fin_score)
    # strip bos: emitted tokens start at column 1
    if return_stats:
        stats = {"topk_fallbacks": n_fallback, "steps": max_steps}
        return out_tokens[:, 1:], out_len, out_score, stats
    return out_tokens[:, 1:], out_len, out_score


def hyps_to_lists(tokens, lengths) -> list[list[int]]:
    """Device outputs -> python token id lists (host side)."""
    import numpy as np

    toks = np.asarray(tokens)
    lens = np.asarray(lengths)
    return [list(map(int, toks[i, : int(lens[i])])) for i in range(toks.shape[0])]
