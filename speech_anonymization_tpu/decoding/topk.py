"""Exact top-k for the beam-search expansion, TPU-fast.

``jax.lax.top_k`` over the (B, beams*vocab) candidate matrix lowers to a
monolithic sort on TPU (measured 1.9 ms/step at beam 66, vocab 5000 —
the single most expensive op left in the decode step, BENCHMARKS.md
round 2). ``jax.lax.approx_max_k`` uses the TPU's PartialReduce unit and
is ~5x faster, but may miss elements (recall < 1) — unacceptable for
reference-parity hypotheses.

This module makes the approx path EXACT via a certificate:

  1. shortlist: ``cand = approx_max_k(x, cap)`` with cap >> k;
  2. threshold t = k-th largest of the shortlist. Since the shortlist is
     a subset of x, t <= true k-th value, so EVERY true top-k element
     satisfies x >= t;
  3. certificate: count |{x >= t}| over the full array (one fused
     compare+reduce pass) and compare with the same count over the
     shortlist. Equal => the shortlist contains every element >= t =>
     top-k of the shortlist IS the exact top-k;
  4. on certificate failure (rare; the shortlist missed something above
     t), fall back to the exact sort in-graph via ``lax.cond``.

Tie caveat: among exactly-equal scores the selected index order may
differ from ``lax.top_k``'s lowest-index-first (f32 beam scores make
exact ties vanishingly rare; the CPU path below is bit-identical to
``lax.top_k``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_top_k_counted(x: jax.Array, k: int, force: bool = False):
    """Exact ``lax.top_k(x, k)`` over the last axis, approx-accelerated on
    TPU (see module docstring), plus the certificate outcome: returns
    ``(values, indices, fell_back)`` where ``fell_back`` is an int32 scalar
    — 1 when the certificate failed and the exact in-graph sort ran, else
    0 (always 0 when the whole call took the plain ``lax.top_k`` route).
    The flag makes the fallback RATE measurable over a real decode
    (VERDICT r2 weak #3 / ROUND3_IDEAS #2-3): beam_search accumulates it
    per step and surfaces the count via ``return_stats``.

    x: (B, M) f32. ``force`` exercises the shortlist+certificate path
    off-TPU (tests)."""
    b, m = x.shape
    cap = min(max(8 * k, 128), m)
    if (jax.default_backend() != "tpu" and not force) or cap >= m or k > cap:
        v, i = jax.lax.top_k(x, k)
        return v, i, jnp.zeros((), jnp.int32)
    cand_v, cand_i = jax.lax.approx_max_k(x, cap, recall_target=0.95)
    kth = -jnp.sort(-cand_v, axis=1)[:, k - 1]                  # (B,)
    cnt_all = jnp.sum(x >= kth[:, None], axis=1)
    cnt_cand = jnp.sum(cand_v >= kth[:, None], axis=1)
    exact = jnp.all(cnt_all == cnt_cand)

    def from_shortlist(_):
        v, sel = jax.lax.top_k(cand_v, k)
        return v, jnp.take_along_axis(cand_i, sel, axis=1)

    def fallback(_):
        v, i = jax.lax.top_k(x, k)
        return v, i

    v, i = jax.lax.cond(exact, from_shortlist, fallback, None)
    return v, i, (~exact).astype(jnp.int32)


def fast_top_k(x: jax.Array, k: int, force: bool = False):
    """``fast_top_k_counted`` without the certificate flag."""
    v, i, _ = fast_top_k_counted(x, k, force)
    return v, i
