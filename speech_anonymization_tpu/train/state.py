"""Functional train state + jitted update machinery.

Replaces the imperative parts of sb.Brain's fit_batch
(loss.backward / check_gradients / optimizer.step / zero_grad,
speechbrain_convae_train.py:241-255) with a pure, jit-compiled update:

  * gradient accumulation: grads are averaged into a buffer carried in the
    TrainState; the optimizer applies every ``accum_steps`` micro-batches
    (reference: gradient_accumulation=3, convae.yaml:69)
  * gradient clipping by global norm (gradient_clipping=5.0, convae.yaml:70)
  * non-finite guard: updates are skipped entirely when the loss or grads
    are not finite (reference check_gradients behavior)
  * the learning rate enters as a plain device scalar each step, so host
    schedulers (Noam per-update, plateau per-epoch) need no recompilation.

Everything is donate-friendly: the caller jits with donate_argnums on the
state for in-place buffer reuse on TPU.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    model_state: Any                 # flax mutable collections (batch_stats)
    norm_state: Any                  # InputNormalizer state or None
    opt_state: Any
    accum_grads: Any
    accum_count: jax.Array

    @classmethod
    def create(cls, params, model_state=None, norm_state=None, opt_state=None):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state if model_state is not None else {},
            norm_state=norm_state,
            opt_state=opt_state,
            accum_grads=zeros,
            accum_count=jnp.zeros((), jnp.int32),
        )


def clip_by_global_norm(grads, max_norm: float):
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


def make_update_fn(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    accum_steps: int = 1,
    clip_norm: float | None = 5.0,
):
    """Build ``update(state, batch, lr, *loss_args) -> (state, metrics)``.

    ``loss_fn(params, model_state, norm_state, batch, *loss_args)`` must
    return ``(loss, (new_model_state, new_norm_state, metrics))``.
    ``optimizer`` must be wrapped with optax.inject_hyperparams so its
    learning_rate can be set from the ``lr`` scalar.
    """

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def update(state: TrainState, batch, lr, *loss_args):
        (loss, (new_model_state, new_norm_state, metrics)), grads = grad_fn(
            state.params, state.model_state, state.norm_state, batch, *loss_args
        )
        # accumulate normalized grads (reference divides loss by accum)
        accum = jax.tree_util.tree_map(
            lambda a, g: a + g / accum_steps, state.accum_grads, grads
        )
        count = state.accum_count + 1
        do_step = count >= accum_steps

        def apply(_):
            g = accum
            if clip_norm is not None:
                g, gnorm = clip_by_global_norm(g, clip_norm)
            else:
                gnorm = optax.global_norm(g)
            finite = jnp.isfinite(gnorm) & jnp.isfinite(loss)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr  # inject_hyperparams
            updates, new_opt = optimizer.update(g, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            # skip the whole update if non-finite (check_gradients semantics)
            new_params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new_params, state.params
            )
            new_opt = jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o) if hasattr(n, "dtype") else n,
                new_opt,
                state.opt_state,
            )
            zeros = jax.tree_util.tree_map(jnp.zeros_like, accum)
            return new_params, new_opt, zeros, jnp.zeros((), jnp.int32)

        def skip(_):
            return state.params, state.opt_state, accum, count

        new_params, new_opt_state, new_accum, new_count = jax.lax.cond(
            do_step, apply, skip, None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            norm_state=new_norm_state,
            opt_state=new_opt_state,
            accum_grads=new_accum,
            accum_count=new_count,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return update


def adam_like_reference(lr: float = 1e-3, b1: float = 0.9, b2: float = 0.98, eps: float = 1e-9):
    """Adam with the reference's hyperparams (convae.yaml:203-206), wrapped
    so the lr can be injected per-step (Noam annealing)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2, eps=eps)


def sgd_like_reference(lr: float = 2.5e-5, momentum: float = 0.99):
    """Stage-2 SGD (convae.yaml:208-211, nesterov momentum 0.99)."""
    return optax.inject_hyperparams(optax.sgd)(learning_rate=lr, momentum=momentum, nesterov=True)
