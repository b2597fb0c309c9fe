"""Sliding-window LSTM detector (model-free, no trellis).

Parity with reference detectors/LSTM/lstm_detector.py:14-59: a window of the
INPUT_SIZE most recent samples [y_{t-3}..y_t] (left -100 padding) feeds a
2-layer LSTM (hidden 256) + FC to 2 classes. The reference runs the LSTM one
batch item at a time in a Python loop; here the whole batch goes through a
single `lax.scan` over time — the per-step matmuls are batched onto the MXU.
The meta variant (reference META_LSTM's hand-unrolled cell) is unnecessary:
this function is already differentiable w.r.t. its param pytree to any order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INPUT_SIZE = 4
HIDDEN_SIZE = 256
NUM_LAYERS = 2
N_CLASSES = 2
START_VALUE_PADDING = -100.0


def _uniform_init(key, shape, k):
    bound = k ** 0.5
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_params(key):
    """Torch-LSTM-style init: all tensors U(-sqrt(1/H), sqrt(1/H))."""
    params = {}
    k = 1.0 / HIDDEN_SIZE
    keys = jax.random.split(key, 4 * NUM_LAYERS + 2)
    for layer in range(NUM_LAYERS):
        in_dim = INPUT_SIZE if layer == 0 else HIDDEN_SIZE
        params[f"w_ih{layer}"] = _uniform_init(keys[4 * layer], (4 * HIDDEN_SIZE, in_dim), k)
        params[f"w_hh{layer}"] = _uniform_init(keys[4 * layer + 1], (4 * HIDDEN_SIZE, HIDDEN_SIZE), k)
        params[f"b_ih{layer}"] = _uniform_init(keys[4 * layer + 2], (4 * HIDDEN_SIZE,), k)
        params[f"b_hh{layer}"] = _uniform_init(keys[4 * layer + 3], (4 * HIDDEN_SIZE,), k)
    params["w_fc"] = _uniform_init(keys[-2], (N_CLASSES, HIDDEN_SIZE), 1.0 / HIDDEN_SIZE)
    params["b_fc"] = _uniform_init(keys[-1], (N_CLASSES,), 1.0 / HIDDEN_SIZE)
    return params


def make_windows(y: jnp.ndarray) -> jnp.ndarray:
    """[B, T] -> [B, T, INPUT_SIZE] windows [y_{t-3}, y_{t-2}, y_{t-1}, y_t].

    Equivalent to the reference's circular-roll construction
    (lstm_detector.py:42-44): positions before t=0 read the -100 padding.
    """
    B, T = y.shape
    padded = jnp.concatenate(
        [jnp.full((B, INPUT_SIZE - 1), START_VALUE_PADDING, dtype=y.dtype), y], axis=1
    )
    return jnp.stack([padded[:, i : T + i] for i in range(INPUT_SIZE)], axis=-1)


def _cell(params, layer: int, x, h, c):
    """One LSTM cell step, torch gate order (i, f, g, o)."""
    gates = (
        x @ params[f"w_ih{layer}"].T
        + params[f"b_ih{layer}"]
        + h @ params[f"w_hh{layer}"].T
        + params[f"b_hh{layer}"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


# When True, `score` hoists each layer's input projection out of the time
# scan (one batched [T*B, in] @ [in, 4H] matmul per layer, two per-layer
# scans instead of one joint scan) — halving the serial matmul chain the
# latency-bound online engine pays 60k times per eval (300 blocks x 200
# SGD steps, B=1). Measured 1.66x on the lstm_online engine (10.49 ->
# 6.32 s/eval on-chip). The gate sum keeps the original association
# ((x@W_ih^T + b_ih) + h@W_hh^T) + b_hh; forward logits are bit-exact vs
# the joint scan ON TPU (0.0 deviation measured), float-tolerance-equal on
# CPU where XLA fuses the two programs differently (2.6e-8; 0 argmax
# flips) — tests/test_models.py pins the contract.
SPLIT_SCAN = True

# lax.scan unroll factor for the recurrence (both scan structures). >1 packs
# several cell steps into each compiled loop iteration — less loop overhead,
# more instruction-level overlap on the serial chain, at the cost of code
# size. Tuned on-chip by scripts/lstm_engine_profile.py.
SCAN_UNROLL = 1


def _score_split(params, y: jnp.ndarray, dt, unroll: int = None) -> jnp.ndarray:
    """Layer-by-layer recurrence with hoisted input projections.

    The reference runs one fused step per timestep (lstm_detector.py:48-50,
    via cuDNN); on TPU the serial chain is the bottleneck, so we precompute
    px = x @ W_ih^T + b_ih for ALL timesteps as one MXU-batched matmul and
    leave only h @ W_hh^T inside the scan — 2 serial matmuls per step
    instead of 4 across the two layers.
    """
    B, T = y.shape
    if unroll is None:
        unroll = SCAN_UNROLL
    inp = jnp.moveaxis(make_windows(y), 1, 0)  # [T, B, INPUT_SIZE]
    for layer in range(NUM_LAYERS):
        px = inp @ params[f"w_ih{layer}"].T + params[f"b_ih{layer}"]  # [T, B, 4H]
        w_hh = params[f"w_hh{layer}"].T
        b_hh = params[f"b_hh{layer}"]
        h0 = jnp.zeros((B, HIDDEN_SIZE), dtype=dt)
        c0 = jnp.zeros((B, HIDDEN_SIZE), dtype=dt)

        def step(carry, px_t, w_hh=w_hh, b_hh=b_hh):
            h, c = carry
            gates = px_t + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        _, inp = jax.lax.scan(step, (h0, c0), px, unroll=unroll)  # [T, B, H]
    return inp


def score(params, y: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Per-symbol class logits: y [B, T] -> [B, T, N_CLASSES].

    compute_dtype (e.g. jnp.bfloat16) runs the recurrence in that dtype;
    logits are returned float32."""
    B, T = y.shape
    dt = compute_dtype or y.dtype
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
        y = y.astype(compute_dtype)
    if SPLIT_SCAN:
        outs = _score_split(params, y, dt)
    else:
        xs = jnp.moveaxis(make_windows(y), 1, 0)  # [T, B, INPUT_SIZE]
        h0 = jnp.zeros((NUM_LAYERS, B, HIDDEN_SIZE), dtype=dt)
        c0 = jnp.zeros((NUM_LAYERS, B, HIDDEN_SIZE), dtype=dt)

        def step(carry, x_t):
            h, c = carry
            inp = x_t
            hs, cs = [], []
            for layer in range(NUM_LAYERS):
                h_new, c_new = _cell(params, layer, inp, h[layer], c[layer])
                hs.append(h_new)
                cs.append(c_new)
                inp = h_new
            return (jnp.stack(hs), jnp.stack(cs)), inp

        _, outs = jax.lax.scan(step, (h0, c0), xs,
                               unroll=SCAN_UNROLL)  # [T, B, H]
    logits = outs @ params["w_fc"].T + params["b_fc"]  # [T, B, 2]
    return jnp.moveaxis(logits, 0, 1).astype(jnp.float32)


def detect(params, y: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Hard decode: argmax over class logits (reference lstm_detector.py:55-57)."""
    return jnp.argmax(score(params, y, compute_dtype), axis=-1).astype(y.dtype)
