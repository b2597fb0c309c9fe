"""Offline supervised training: the reference's per-word SGD sweep as one
jitted `lax.scan` over words (reference trainer.py:455-505 runs a Python loop
of 300 single-word forward/backward steps per minibatch; here the whole sweep
is a single compiled program).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def make_word_sweep(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Returns sweep(params, opt_state, rx_words, tx_words, key) -> (params, opt_state, mean_loss).

    One sequential SGD step per word, identical update order to the reference
    training loop, compiled once.
    """

    @jax.jit
    def sweep(params, opt_state, rx_words, tx_words, key):
        n = rx_words.shape[0]
        keys = jax.random.split(key, n)

        def step(carry, inp):
            params, opt_state = carry
            rx, tx, k = inp
            loss, grads = jax.value_and_grad(loss_fn)(params, rx[None, :], tx[None, :], k)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (rx_words, tx_words, keys)
        )
        return params, opt_state, jnp.sum(losses)

    return sweep
