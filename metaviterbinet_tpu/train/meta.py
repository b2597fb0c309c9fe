"""MAML meta-learning as nested `jax.grad` — no twin "meta detector" modules.

The reference needs dedicated functional clones (META_VNET/META_LSTM
detectors) to differentiate through the inner SGD update
(trainer.py:425-453). With param-pytree models the inner update is just a
tree_map, and second-order MAML is `jax.grad` through `jax.grad`; first-order
MAML is a `stop_gradient` on the inner gradients.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def sorted_unique_mask(j_hats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`torch.unique` semantics under static shapes (trainer.py:336-338,
    404-406): the reference dedupes the sampled query indices each meta
    iteration, so duplicate draws mean FEWER (support, query) updates — and
    iterates them in ascending order. Returns (sorted j_hats, first-occurrence
    mask); masked-out entries must perform no update."""
    j_sorted = jnp.sort(j_hats)
    fresh = jnp.concatenate(
        [jnp.ones((1,), bool), j_sorted[1:] != j_sorted[:-1]]
    )
    return j_sorted, fresh


def make_maml_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                   meta_lr: float, second_order: bool):
    """Returns step(params, opt_state, s_rx, s_tx, q_rx, q_tx) -> (params, opt_state, loss_q).

    Inner: theta' = theta - meta_lr * grad L(theta; support)
    Outer: gradient of L(theta'; query) w.r.t. theta, applied by `optimizer`.
    (reference trainer.py:432-452; create_graph=MAML <=> second_order here)
    """

    def outer_loss(params, s_rx, s_tx, q_rx, q_tx):
        inner_grads = jax.grad(loss_fn)(params, s_rx, s_tx)
        if not second_order:
            inner_grads = jax.tree_util.tree_map(jax.lax.stop_gradient, inner_grads)
        updated = jax.tree_util.tree_map(lambda p, g: p - meta_lr * g, params, inner_grads)
        return loss_fn(updated, q_rx, q_tx)

    @jax.jit
    def step(params, opt_state, s_rx, s_tx, q_rx, q_tx):
        loss_q, meta_grads = jax.value_and_grad(outer_loss)(params, s_rx, s_tx, q_rx, q_tx)
        updates, opt_state = optimizer.update(meta_grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_q

    return step
