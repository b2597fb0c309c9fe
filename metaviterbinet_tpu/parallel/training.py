"""Data-parallel training step over a device mesh (N3/N5).

`shard_map` over the 'dp' axis: each device computes the loss/grads of its
shard of words; gradients are `psum`-ed over ICI and the optimizer update is
applied identically everywhere (params replicated). This is the standard
pure-dp recipe; the words axis is the natural batch axis of this workload
(independent transmission blocks, reference trainer.py:203's 300-word
batches).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_train_step(mesh: Mesh, loss_fn: Callable,
                       optimizer: optax.GradientTransformation):
    """Returns step(params, opt_state, rx [W,T], tx [W,B], key) with rx/tx
    sharded over 'dp' rows, params/opt_state replicated.

    loss_fn(params, rx, tx, key) -> scalar mean loss over its shard.
    """

    def local_step(params, opt_state, rx, tx, key):
        # per-device key: fold in the dp coordinate so shards subsample
        # independently
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        loss, grads = jax.value_and_grad(loss_fn)(params, rx, tx, key)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    repl = P()
    rows = P("dp")

    @jax.jit
    def step(params, opt_state, rx, tx, key):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(repl, repl, rows, rows, repl),
            out_specs=(repl, repl, repl),
            check_vma=False,
        )(params, opt_state, rx, tx, key)

    return step
