"""Loss functions and minibatch subsampling.

Parity notes:
  - ViterbiNet trains with CE between per-symbol state logits and trellis
    state labels (reference vnet_trainer.py:37-47); LSTM with CE between
    per-symbol class logits and bit labels (lstm_trainer.py:30-40).
  - `select_batch` reproduces the reference's index-proportional multinomial
    subsampling without replacement (trainer.py:534-544), including the quirk
    that index 0 is never selected (its weight is 0).
  - Meta losses use all symbols, no subsampling (metavnet_trainer.py:41-50).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from metaviterbinet_tpu.ops.trellis import calculate_states


def select_batch(key, n: int, batch_size: int) -> jnp.ndarray:
    """Indices of a minibatch: multinomial over arange weights, no replacement."""
    weights = jnp.arange(n, dtype=jnp.float32)
    return jax.random.choice(key, n, shape=(batch_size,), replace=False,
                             p=weights / jnp.sum(weights))


def cross_entropy(logits, labels):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def _criterion(loss_type: str, logits, labels):
    """The reference's three criterion choices (trainer.py:178-185).

    CE takes integer labels directly; BCE/MSE are applied against the
    one-hot target distribution (the only shape under which the reference's
    BCELoss/MSELoss options are coherent for logit-vs-label training).
    """
    if loss_type == "CrossEntropy":
        return cross_entropy(logits, labels)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    if loss_type == "BCE":
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, one_hot))
    if loss_type == "MSE":
        return jnp.mean((logits - one_hot) ** 2)
    raise NotImplementedError(f"No such loss function implemented: {loss_type}")


def make_loss_fn(score_fn, label_kind: str, memory_length: int,
                 subsample: bool, minibatch_size: int,
                 loss_type: str = "CrossEntropy"):
    """Build loss(params, rx, tx, key) for a detector's score function.

    label_kind: 'states' (ViterbiNet CE over trellis states) or 'bits'
    (LSTM CE over bit classes). When `subsample`, a select_batch of symbols is
    drawn per step (key required); otherwise all symbols contribute.
    loss_type selects the criterion (reference 'BCE'|'CrossEntropy'|'MSE').
    """

    def loss_fn(params, rx, tx, key=None):
        logits = score_fn(params, rx)
        n_classes = logits.shape[-1]
        flat_logits = logits.reshape(-1, n_classes)
        if label_kind == "states":
            labels = calculate_states(memory_length, tx)
        elif label_kind == "bits":
            labels = tx.reshape(-1).astype(jnp.int32)
        else:
            raise ValueError(f"unknown label kind {label_kind}")
        # tx may be the 120-bit info word while logits span the 136-symbol
        # codeword: the reference samples indices over the LABEL count and
        # indexes both (trainer.py:542-544 via vnet_trainer.py:45), so symbols
        # past the label range never contribute to the loss.
        if subsample:
            idx = select_batch(key, labels.shape[0], minibatch_size)
            flat_logits, labels = flat_logits[idx], labels[idx]
        else:
            flat_logits = flat_logits[: labels.shape[0]]
        return _criterion(loss_type, flat_logits, labels)

    return loss_fn
