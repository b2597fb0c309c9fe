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


def make_meta_adaptation(loss_fn: Callable, optimizer: optax.GradientTransformation,
                         meta_lr: float, second_order: bool,
                         meta_train_iterations: int, meta_j_num: int,
                         window_size: int):
    """Online meta-adaptation over a buffer: the reference's nested loops
    (trainer.py:334-342: meta_train_iterations x unique random (support,query)
    pairs) as one jitted scan. Buffer entries are fixed-capacity; `n_valid`
    masks the live region.
    """
    maml_inner = make_maml_step(loss_fn, optimizer, meta_lr, second_order)

    @jax.jit
    def adapt(params, opt_state, buffer_rx, buffer_tx, n_valid, key):
        """buffer_rx/tx must be in logical order (index 0 = oldest entry);
        only the first n_valid rows are live."""

        def iteration(carry, key_i):
            params, opt_state = carry
            # j_hat ~ randint(0, n_valid - 2); reference uses torch.unique but
            # duplicate pairs just repeat a step — statistically equivalent.
            j_hats = jax.random.randint(key_i, (meta_j_num,), 0,
                                        jnp.maximum(n_valid - 2, 1))

            def pair_step(carry, j_hat):
                params, opt_state = carry
                # support j_hat-window..j_hat-1; torch's negative indexing at
                # j_hat=0 wraps to the newest entry — replicate with mod n_valid
                supp = (j_hat + jnp.arange(-window_size - 1, -1) + 1) % jnp.maximum(n_valid, 1)
                query = j_hat[None]
                params, opt_state, _ = maml_inner(
                    params, opt_state,
                    buffer_rx[supp], buffer_tx[supp],
                    buffer_rx[query], buffer_tx[query],
                )
                return (params, opt_state), None

            (params, opt_state), _ = jax.lax.scan(pair_step, (params, opt_state), j_hats)
            return (params, opt_state), None

        keys = jax.random.split(key, meta_train_iterations)
        (params, opt_state), _ = jax.lax.scan(iteration, (params, opt_state), keys)
        return params, opt_state

    return adapt
