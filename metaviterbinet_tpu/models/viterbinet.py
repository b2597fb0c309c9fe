"""ViterbiNet: per-symbol DNN branch metrics plugged into the Viterbi ACS.

Architecture parity with reference detectors/VNET/vnet_detector.py:27-33
(1 -> 100 sigmoid -> 50 relu -> n_states), but as a pure param-pytree function.
The meta variant needs no twin module (reference META_VNET): gradients w.r.t.
params fall out of the functional form directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from metaviterbinet_tpu.ops.trellis import viterbi_decode

HIDDEN1 = 100
HIDDEN2 = 50


def _linear_init(key, out_dim: int, in_dim: int):
    """U(-sqrt(k), sqrt(k)) with k = 1/in_dim — same family as torch Linear."""
    kw, kb = jax.random.split(key)
    bound = (1.0 / in_dim) ** 0.5
    w = jax.random.uniform(kw, (out_dim, in_dim), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)
    return w, b


def init_params(key, n_states: int):
    k1, k2, k3 = jax.random.split(key, 3)
    w1, b1 = _linear_init(k1, HIDDEN1, 1)
    w2, b2 = _linear_init(k2, HIDDEN2, HIDDEN1)
    w3, b3 = _linear_init(k3, n_states, HIDDEN2)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def score(params, y: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Per-symbol state logits: y [words, T] -> [words, T, n_states].

    compute_dtype (e.g. jnp.bfloat16) runs the MLP matmuls in that dtype —
    halves HBM traffic on TPU; logits are returned in float32 so the ACS
    path metrics never round (see CLAUDE.md precision invariant)."""
    x = y.reshape(-1, 1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w1, b1, w2, b2, w3, b3 = (params[k].astype(compute_dtype) for k in
                                  ("w1", "b1", "w2", "b2", "w3", "b3"))
    else:
        w1, b1, w2, b2, w3, b3 = (params[k] for k in
                                  ("w1", "b1", "w2", "b2", "w3", "b3"))
    x = jax.nn.sigmoid(x @ w1.T + b1)
    x = jax.nn.relu(x @ w2.T + b2)
    logits = (x @ w3.T + b3).astype(jnp.float32)
    return logits.reshape(y.shape[0], y.shape[1], -1)


def detect(params, y: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Hard decode: ACS over negated logits (logits are max-good, ACS is min-sum;
    reference vnet_detector.py:51-61). ACS always runs float32."""
    return viterbi_decode(-score(params, y, compute_dtype)).astype(y.dtype)
