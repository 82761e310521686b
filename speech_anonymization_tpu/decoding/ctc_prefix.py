"""Batched CTC prefix scoring for joint CTC/attention beam decoding.

The reference decodes with S2STransformerBeamSearch(ctc_weight=0.4)
(convae.yaml:226-240), whose CTC component is the Watanabe-style prefix
scorer (hybrid CTC/attention): for a hypothesis prefix g and every
candidate extension c, the prefix probability

    psi(g·c) = logsumexp_t( phi(t-1) + x[t, c] )
    phi(t)   = logaddexp(r_nb(g,t), r_b(g,t)),  or r_b(g,t) when c == last(g)

with the usual blank/non-blank forward variables r_b, r_nb.

TPU design (all static shapes, lax.scan over frames):
  * scoring all V candidates carries only (N, V) accumulators through the
    frame scan — no (N, V, T) tensor is ever materialized;
  * the per-prefix forward variables r (N, T, 2) are recomputed ONLY for
    the selected extensions after top-k (O(T*K) instead of O(T*V*K) memory);
  * padding frames are neutralized by giving them blank log-prob 0 and
    -inf elsewhere, which leaves every recursion invariant.
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


def mask_ctc_log_probs(x: jax.Array, enc_lens: jax.Array, blank: int = 0) -> jax.Array:
    """Neutralize padding frames: blank -> 0 logp, others -> -inf."""
    n, t, v = x.shape
    valid = jnp.arange(t)[None, :] < jnp.round(enc_lens * t)[:, None]
    pad_row = jnp.full((v,), NEG_INF).at[blank].set(0.0)
    return jnp.where(valid[:, :, None], x, pad_row[None, None, :])


def ctc_init_state(x: jax.Array, blank: int = 0) -> CTCPrefixState:
    """State for the empty prefix: r_b = cumulative blank, r_nb = -inf."""
    n, t, v = x.shape
    r_b = jnp.cumsum(x[:, :, blank], axis=1)
    r_nb = jnp.full((n, t), NEG_INF)
    return CTCPrefixState(
        r_nb=r_nb,
        r_b=r_b,
        last_token=jnp.full((n,), -1, jnp.int32),
        prefix_empty=jnp.ones((n,), bool),
    )


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def ctc_score_candidates(
    x: jax.Array, state: CTCPrefixState, eos_index: int, blank: int = 0
) -> jax.Array:
    """psi (N, V): prefix score for every candidate extension.

    The eos column is overwritten with the COMPLETE-sequence score
    logaddexp(r_nb, r_b) at the final frame (padding-invariant).
    """
    n, t, v = x.shape
    phi = _logaddexp(state.r_nb, state.r_b)  # (N, T)

    # phi with the last-token correction is column-dependent only for
    # c == last_token; handle via a per-frame pair (phi, r_b) and a select.
    last = state.last_token
    init_prev = jnp.where(state.prefix_empty, 0.0, NEG_INF)  # phi(-1)

    token_ids = jnp.arange(v)[None, :]  # (1, V)
    is_last = token_ids == last[:, None]  # (N, V)

    def step(carry, frame):
        psi, phi_prev, rb_prev = carry
        x_t = frame["x"]        # (N, V)
        phi_t = frame["phi"]    # (N,)
        rb_t = frame["r_b"]     # (N,)
        phi_col = jnp.where(is_last, rb_prev[:, None], phi_prev[:, None])  # (N, V)
        psi = _logaddexp(psi, phi_col + x_t)
        return (psi, phi_t, rb_t), None

    frames = {
        "x": jnp.moveaxis(x, 1, 0),          # (T, N, V)
        "phi": jnp.moveaxis(phi, 1, 0),      # (T, N)
        "r_b": jnp.moveaxis(state.r_b, 1, 0),
    }
    psi0 = jnp.full((n, v), NEG_INF)
    rb_init = jnp.full((n,), NEG_INF)  # r_b(-1)
    (psi, _, _), _ = jax.lax.scan(step, (psi0, init_prev, rb_init), frames)
    # eos: full-sequence score (final frame; padding frames keep it constant)
    full = _logaddexp(state.r_nb[:, -1], state.r_b[:, -1])
    psi = psi.at[:, eos_index].set(full)
    return psi


def ctc_advance_state(
    x: jax.Array, state: CTCPrefixState, chosen: jax.Array, blank: int = 0
) -> CTCPrefixState:
    """Recompute forward variables for the selected extension tokens.

    x: (N, T, V); state: parent prefix state (already gathered to the new
    beam order); chosen: (N,) selected token ids. Returns the child state.
    """
    n, t, v = x.shape
    x_sel = jnp.take_along_axis(x, chosen[:, None, None], axis=2)[:, :, 0]  # (N, T)
    blank_lp = x[:, :, blank]
    phi = _logaddexp(state.r_nb, state.r_b)
    phi = jnp.where((chosen == state.last_token)[:, None], state.r_b, phi)  # (N, T)
    init_prev = jnp.where(state.prefix_empty, 0.0, NEG_INF)

    def step(carry, frame):
        r_nb_prev, r_b_prev, phi_prev = carry
        r_nb_t = _logaddexp(r_nb_prev, phi_prev) + frame["x_sel"]
        r_b_t = _logaddexp(r_b_prev, r_nb_prev) + frame["blank"]
        return (r_nb_t, r_b_t, frame["phi"]), (r_nb_t, r_b_t)

    frames = {
        "x_sel": jnp.moveaxis(x_sel, 1, 0),
        "blank": jnp.moveaxis(blank_lp, 1, 0),
        "phi": jnp.moveaxis(phi, 1, 0),
    }
    neg = jnp.full((n,), NEG_INF)
    (_, _, _), (r_nb, r_b) = jax.lax.scan(step, (neg, neg, init_prev), frames)
    return CTCPrefixState(
        r_nb=jnp.moveaxis(r_nb, 0, 1),
        r_b=jnp.moveaxis(r_b, 0, 1),
        last_token=chosen.astype(jnp.int32),
        prefix_empty=jnp.zeros((n,), bool),
    )
