"""Model-level invariants, chiefly the LSTM split-scan restructuring.

`models/lstm.py::_score_split` hoists each layer's input projection out of
the time scan (the cuDNN-style restructuring; one batched matmul per layer,
recurrent matmul only inside the scan). The gate sum keeps the reference
association ((x@W_ih^T + b_ih) + h@W_hh^T) + b_hh and the hoisted matmul is
row-for-row the same dot product (measured bit-identical in isolation), but
the two programs are NOT bit-exact end to end: XLA fuses the joint-scan body
differently (measured max abs deviation 2.6e-8 on f32 logits, ~5e-6
relative, 0/136 argmax flips). These tests pin that contract: logits agree
to float-tolerance, hard detections agree exactly on realistic inputs, and
training gradients agree to tolerance. The shipping default (SPLIT_SCAN =
True) is therefore the configuration the r5 parity matrix is measured
under.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaviterbinet_tpu.models import lstm


def _both_scores(params, y, compute_dtype=None):
    old = lstm.SPLIT_SCAN
    try:
        lstm.SPLIT_SCAN = False
        joint = lstm.score(params, y, compute_dtype)
        lstm.SPLIT_SCAN = True
        split = lstm.score(params, y, compute_dtype)
    finally:
        lstm.SPLIT_SCAN = old
    return np.asarray(joint), np.asarray(split)


@pytest.mark.parametrize("B,T", [(1, 136), (4, 37)])
def test_lstm_split_scan_matches_joint(B, T):
    key = jax.random.PRNGKey(0)
    params = lstm.init_params(key)
    y = jax.random.normal(jax.random.PRNGKey(1), (B, T), dtype=jnp.float32)
    joint, split = _both_scores(params, y)
    np.testing.assert_allclose(split, joint, rtol=1e-4, atol=1e-6)
    assert np.array_equal(joint.argmax(-1), split.argmax(-1)), \
        "hard detections diverged between scan structures"


def test_lstm_split_scan_grads_match():
    """The restructuring must not perturb training meaningfully: loss
    gradients w.r.t. every param tensor agree to float tolerance."""
    params = lstm.init_params(jax.random.PRNGKey(2))
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 64), dtype=jnp.float32)
    labels = jax.random.bernoulli(jax.random.PRNGKey(4), 0.5, (1, 64)).astype(jnp.int32)

    def loss(p, split):
        old = lstm.SPLIT_SCAN
        lstm.SPLIT_SCAN = split
        try:
            logits = lstm.score(p, y)
        finally:
            lstm.SPLIT_SCAN = old
        import optax
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    g_joint = jax.grad(lambda p: loss(p, False))(params)
    g_split = jax.grad(lambda p: loss(p, True))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_split[k]),
                                   np.asarray(g_joint[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)


def test_lstm_split_scan_bf16_matches():
    """bf16 recurrence: both paths agree in the low-precision regime too."""
    params = lstm.init_params(jax.random.PRNGKey(5))
    y = jax.random.normal(jax.random.PRNGKey(6), (2, 48), dtype=jnp.float32)
    joint, split = _both_scores(params, y, compute_dtype=jnp.bfloat16)
    assert np.array_equal(joint, split)
