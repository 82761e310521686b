"""Batched CTC prefix scoring for joint CTC/attention beam decoding.

The reference decodes with S2STransformerBeamSearch(ctc_weight=0.4)
(convae.yaml:226-240), whose CTC component is the Watanabe-style prefix
scorer (hybrid CTC/attention): for a hypothesis prefix g and every
candidate extension c, the prefix probability

    psi(g·c) = logsumexp_t( phi(t-1) + x[t, c] )
    phi(t)   = logaddexp(r_nb(g,t), r_b(g,t)),  or r_b(g,t) when c == last(g)

with the usual blank/non-blank forward variables r_b, r_nb.

TPU design — both per-step computations are PARALLEL over frames (no
sequential frame scan; a naive scan costs ~T sequential micro-kernels per
decode step and dominates decode latency):

  * scoring all V candidates: since x are log-probs (exp(x) <= 1),
    psi = log( exp(phi_shift - max) @ exp(x) ) + max — ONE batched matmul
    on the MXU against a cached exp(x) (N, T, V); the c == last(g) column
    and the eos column are patched with cheap vector reductions;
  * advancing the forward variables for the selected tokens: the coupled
    recursions
        p_nb[t] = (p_nb[t-1] + q[t-1]) * w[t]
        p_b[t]  = (p_b[t-1] + p_nb[t-1]) * blank[t]
    are a 2-d linear recurrence; in the log semiring they compose as 3x3
    homogeneous matrices, solved with jax.lax.associative_scan in
    O(log T) sequential stages.

Per-item length padding is neutralized by giving those frames blank
log-prob 0 and -inf elsewhere (:func:`mask_ctc_log_probs` — absorbs each
item's full score up to the shared static last frame); lane padding to
the 128 multiple uses ALL -inf rows plus a static last-real-frame index
(:func:`pad_ctc_frames` — see its docstring for why blank-neutral rows
are NOT safe there).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class CTCPrefixState(NamedTuple):
    r_nb: jax.Array      # (N, T) log prob prefix ends non-blank at frame t
    r_b: jax.Array       # (N, T) log prob prefix ends blank at frame t
    last_token: jax.Array  # (N,) last real token of the prefix (-1 if empty)
    prefix_empty: jax.Array  # (N,) bool


class PreparedCTC(NamedTuple):
    x: jax.Array        # (B, T, V) masked log-probs (shared by all beams)
    exp_x: jax.Array    # (B, T, V) = exp(x)
    blank_lp: jax.Array  # (B, T)
    k: int = 1          # beams per batch item; states have N = B*k rows
    t_real: int = -1    # pre-lane-pad frame count (static); -1 = x's own T


def mask_ctc_log_probs(x: jax.Array, enc_lens: jax.Array, blank: int = 0) -> jax.Array:
    """Neutralize padding frames: blank -> 0 logp, others -> -inf."""
    n, t, v = x.shape
    valid = jnp.arange(t)[None, :] < jnp.round(enc_lens * t)[:, None]
    pad_row = jnp.full((v,), NEG_INF).at[blank].set(0.0)
    return jnp.where(valid[:, :, None], x, pad_row[None, None, :])


def pad_ctc_frames(x: jax.Array, multiple: int = 128) -> jax.Array:
    """Pad the frame axis of (B, T, V) log-probs to a lane multiple with
    ALL -inf rows. Without this, XLA pads the (B, T, V) operand of the
    per-step scoring matmul INSIDE the decode loop: the traced 30 s
    decode showed a ~0.37 ms/step, ~120 MB `pad` there.

    Unlike :func:`mask_ctc_log_probs`' per-item length rows (blank logp
    0, which ABSORB each item's full score up to the shared last frame so
    the eos column can read one static index), lane-pad rows must be -inf
    in the blank column too: a blank-prob-1 frame is only neutral while
    no hypothesis token equals the blank. In the collapsed regime (prefix
    longer than the alignable frames, every candidate ~NEG_INF) the beam
    can commit the blank as an ordinary token, and blank-neutral pad rows
    then hand that prefix spurious continuation mass (l_nb[pad] = 0 +
    LSE(l_nb, q) keeps growing) — measured as fast/slow divergence in
    tests/test_beam_search_reference.py. All--inf rows contribute
    exp(-inf) = 0 to every scoring reduction and every advance recursion;
    callers pass the pre-pad frame count to :func:`ctc_prepare` as
    ``t_real`` so the eos column keeps reading the last REAL frame."""
    b, t, v = x.shape
    rem = (-t) % multiple
    if rem == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((b, rem, v), NEG_INF, x.dtype)], axis=1
    )


def ctc_prepare(
    x: jax.Array, blank: int = 0, k: int = 1, t_real: int | None = None
) -> PreparedCTC:
    """Cache exp(x) once per decode (x fixed across decode steps).

    ``x`` is (B, T, V); with ``k`` beams the prefix states carry N = B*k
    rows while x/exp_x stay un-replicated (beams of an item share its x).
    ``t_real`` is the frame count before :func:`pad_ctc_frames` (the eos
    column reads the forward variables at frame ``t_real - 1``; the -inf
    lane-pad rows beyond it carry no mass)."""
    return PreparedCTC(
        x=x, exp_x=jnp.exp(x), blank_lp=x[:, :, blank], k=k,
        t_real=x.shape[1] if t_real is None else t_real,
    )


def ctc_init_state(x: jax.Array, blank: int = 0, k: int = 1) -> CTCPrefixState:
    """State for the empty prefix: r_b = cumulative blank, r_nb = -inf.

    With ``k`` beams per item the state rows are ordered beam-major per
    item: row n = item (n // k), matching jnp.repeat(x, k, 0)."""
    b, t, v = x.shape
    r_b = jnp.repeat(jnp.cumsum(x[:, :, blank], axis=1), k, axis=0)
    n = b * k
    r_nb = jnp.full((n, t), NEG_INF)
    return CTCPrefixState(
        r_nb=r_nb,
        r_b=r_b,
        last_token=jnp.full((n,), -1, jnp.int32),
        prefix_empty=jnp.ones((n,), bool),
    )


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _phi_shift(values: jax.Array, init: jax.Array) -> jax.Array:
    """[init, values[0], ..., values[T-2]] along the frame axis."""
    return jnp.concatenate([init[:, None], values[:, :-1]], axis=1)


def _gather_x_per_beam(x: jax.Array, tokens: jax.Array, k: int) -> jax.Array:
    """x (B, T, V), tokens (N=B*k,) -> (N, T) columns of x per beam."""
    b, t, v = x.shape
    tok_bk = tokens.reshape(b, k)                               # (B, K)
    cols = jnp.take_along_axis(x, tok_bk[:, None, :], axis=2)   # (B, T, K)
    return jnp.moveaxis(cols, 2, 1).reshape(b * k, t)


def ctc_score_candidates_prepared(
    prep: PreparedCTC, state: CTCPrefixState, eos_index: int, blank: int = 0
) -> jax.Array:
    """psi (N, V) via one MXU matmul + column patches (see module doc)."""
    b, t, v = prep.x.shape
    k = prep.k
    n = b * k
    init_prev = jnp.where(state.prefix_empty, 0.0, NEG_INF)  # phi(-1)
    phi = _logaddexp(state.r_nb, state.r_b)                  # (N, T)
    a = _phi_shift(phi, init_prev)                           # (N, T)

    amax = jnp.max(a, axis=1, keepdims=True)                 # (N, 1)
    # guard fully -inf rows (empty prefixes have a[0]=0 so max >= 0 there)
    amax_safe = jnp.maximum(amax, NEG_INF / 2)
    exp_a = jnp.where(a > NEG_INF / 2, jnp.exp(a - amax_safe), 0.0)
    dots = jnp.einsum(
        "bkt,btv->bkv", exp_a.reshape(b, k, t), prep.exp_x,
        preferred_element_type=jnp.float32,
    ).reshape(n, v)
    psi = jnp.where(dots > 0, jnp.log(jnp.maximum(dots, 1e-38)) + amax_safe, NEG_INF)

    # c == last(g): phi column uses r_b instead of phi
    last = state.last_token
    a_last = _phi_shift(state.r_b, jnp.full((n,), NEG_INF))  # (N, T)
    x_last = _gather_x_per_beam(prep.x, jnp.maximum(last, 0), k)  # (N, T)
    psi_last = jax.nn.logsumexp(a_last + x_last, axis=1)
    has_last = last >= 0
    token_ids = jnp.arange(v)[None, :]
    is_last = (token_ids == last[:, None]) & has_last[:, None]
    psi = jnp.where(is_last, psi_last[:, None], psi)

    # eos: full-sequence score at the last REAL frame (mask_ctc_log_probs'
    # per-item rows absorb shorter items' scores up to it; -inf lane-pad
    # rows beyond it carry no mass, so index there, not at -1)
    tr = prep.t_real if prep.t_real > 0 else t
    full = _logaddexp(state.r_nb[:, tr - 1], state.r_b[:, tr - 1])
    psi = psi.at[:, eos_index].set(full)
    # block blank for joint scoring: the reference scorer masks the blank
    # column before fusing with attention/LM scores (SpeechBrain 0.5
    # CTCPrefixScorer / seq2seq "block blank token"); blank dominates CTC
    # posteriors and would otherwise be emitted into hypotheses.
    if blank != eos_index:
        psi = psi.at[:, blank].set(NEG_INF)
    return psi


def ctc_score_candidates(
    x: jax.Array, state: CTCPrefixState, eos_index: int, blank: int = 0
) -> jax.Array:
    """Convenience wrapper computing exp(x) on the fly (tests / one-shot)."""
    return ctc_score_candidates_prepared(ctc_prepare(x, blank), state, eos_index, blank)


def _logmatmul3(m2: jax.Array, m1: jax.Array) -> jax.Array:
    """(..., 3, 3) log-semiring matrix product: out_ij = LSE_k(m2_ik + m1_kj)."""
    return jax.nn.logsumexp(m2[..., :, :, None] + m1[..., None, :, :], axis=-2)


def ctc_advance_state_prepared(
    prep: PreparedCTC, state: CTCPrefixState, chosen: jax.Array, blank: int = 0
) -> CTCPrefixState:
    """Child forward variables via an O(log T) associative scan.

    Per frame, with w[t]=x[t,c], bl[t]=x[t,blank], q[t]=phi_col(parent):
        l_nb[t] = w[t] + LSE(l_nb[t-1], q[t-1])
        l_b[t]  = bl[t] + LSE(l_nb[t-1], l_b[t-1])
    As homogeneous 3x3 log-matrices over s=[l_nb, l_b, 0]:
        M[t] = [[w,  -inf, w + q[t-1]],
                [bl,  bl,  -inf     ],
                [-inf,-inf, 0       ]]
    The prefix products P[t] (associative_scan) give s[t] = P[t][:, :, 2].
    """
    b, t, v = prep.x.shape
    k = prep.k
    n = b * k
    x_sel = _gather_x_per_beam(prep.x, chosen, k)  # (N, T)
    blank_lp = jnp.repeat(prep.blank_lp, k, axis=0)  # (N, T)
    phi = _logaddexp(state.r_nb, state.r_b)
    phi = jnp.where((chosen == state.last_token)[:, None], state.r_b, phi)
    init_prev = jnp.where(state.prefix_empty, 0.0, NEG_INF)
    q_shift = _phi_shift(phi, init_prev)  # (N, T) = q[t-1]

    neg = jnp.full((n, t), NEG_INF)
    zero = jnp.zeros((n, t))
    # rows of M[t], shape (N, T, 3, 3)
    m = jnp.stack(
        [
            jnp.stack([x_sel, neg, x_sel + q_shift], axis=-1),
            jnp.stack([blank_lp, blank_lp, neg], axis=-1),
            jnp.stack([neg, neg, zero], axis=-1),
        ],
        axis=-2,
    )
    # s[t] = M[t] (x) s[t-1] => prefix product P[t] = M[t] ∘ ... ∘ M[0]
    # (newest on the LEFT); associative_scan combines (earlier, later), so
    # the operator must multiply the later element on the left.
    prefix = jax.lax.associative_scan(
        lambda a, b: _logmatmul3(b, a), m, axis=1
    )  # (N, T, 3, 3)
    r_nb = prefix[:, :, 0, 2]
    r_b = prefix[:, :, 1, 2]
    return CTCPrefixState(
        r_nb=r_nb,
        r_b=r_b,
        last_token=chosen.astype(jnp.int32),
        prefix_empty=jnp.zeros((n,), bool),
    )


def ctc_advance_state(
    x: jax.Array, state: CTCPrefixState, chosen: jax.Array, blank: int = 0
) -> CTCPrefixState:
    """Convenience wrapper (tests / one-shot)."""
    return ctc_advance_state_prepared(ctc_prepare(x, blank), state, chosen, blank)
