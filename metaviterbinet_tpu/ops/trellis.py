"""Trellis primitives: transition structure, add-compare-select, state labeling.

Semantics match the reference (python_code/utils/trellis_utils.py:7-46) but the
implementation is TPU-first: the predecessor gather is algebraically collapsed
to a pairwise-min + tile (pure VPU ops, no gathers), and the T-step recursion is
a single `lax.scan` compiled once by XLA.

Trellis structure: with n states, the predecessors of state s are
(2s) mod n and (2s+1) mod n (reference trellis_utils.py:7-13).  For s < n/2 the
predecessor pair is (2s, 2s+1); for s >= n/2 it is the same pair as s - n/2.
Hence  new_metric = tile(pairwise_min(metric + branch), 2)  — a reshape-min.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def transition_table(n_states: int) -> np.ndarray:
    """[n_states, 2] array; row s holds the two predecessor states of s.

    Kept for API parity / explicit-gather reference paths; the scan below does
    not materialize it.
    """
    s = np.arange(n_states)
    return np.stack([(2 * s) % n_states, (2 * s + 1) % n_states], axis=1)


def acs_step(in_prob: jnp.ndarray, branch: jnp.ndarray) -> jnp.ndarray:
    """One Viterbi add-compare-select stage (min-sum over negative log-likelihoods).

    in_prob: [..., n_states] path metrics entering this stage.
    branch:  [..., n_states] branch metric attached to each *predecessor* state
             (reference acs_block adds llrs indexed by predecessor,
              trellis_utils.py:16-30).
    returns: [..., n_states] updated path metrics.
    """
    n_states = in_prob.shape[-1]
    total = in_prob + branch
    paired = total.reshape(*total.shape[:-1], n_states // 2, 2)
    m = jnp.min(paired, axis=-1)
    return jnp.concatenate([m, m], axis=-1)


def viterbi_decode(priors: jnp.ndarray) -> jnp.ndarray:
    """Greedy zero-delay Viterbi decode over a whole batch of words.

    priors: [batch, T, n_states] branch metrics (negative log-likelihood per
            predecessor state at each step).
    returns: [batch, T] hard bit decisions.

    Matches the reference readout exactly: at each step the emitted bit is the
    LSB of the current argmin state, *then* the ACS stage runs — no traceback
    exists anywhere in the reference (va_detector.py:89-97, vnet_detector.py:51-61).
    """
    batch, T, n_states = priors.shape
    in_prob0 = jnp.zeros((batch, n_states), dtype=priors.dtype)

    def step(in_prob, prior_t):
        bits = (jnp.argmin(in_prob, axis=-1) % 2).astype(priors.dtype)
        out_prob = acs_step(in_prob, prior_t)
        # renormalize so metrics don't drift to +inf over long streams
        # (argmin-invariant; the reference never runs long enough to need it)
        out_prob = out_prob - jnp.min(out_prob, axis=-1, keepdims=True)
        return out_prob, bits

    _, bits_t = jax.lax.scan(step, in_prob0, jnp.moveaxis(priors, 1, 0))
    return jnp.moveaxis(bits_t, 0, 1)


def viterbi_decode_with_metrics(priors: jnp.ndarray, in_prob0: jnp.ndarray):
    """As viterbi_decode but with explicit initial metrics; also returns finals.

    Used by the block-parallel (overlap-save) decoder, where boundary path
    metrics are exchanged between sequence shards.
    """
    def step(in_prob, prior_t):
        bits = (jnp.argmin(in_prob, axis=-1) % 2).astype(priors.dtype)
        out_prob = acs_step(in_prob, prior_t)
        out_prob = out_prob - jnp.min(out_prob, axis=-1, keepdims=True)
        return out_prob, bits

    final, bits_t = jax.lax.scan(step, in_prob0, jnp.moveaxis(priors, 1, 0))
    return jnp.moveaxis(bits_t, 0, 1), final


def viterbi_decode_lowlat(priors: jnp.ndarray) -> jnp.ndarray:
    """Log-depth greedy Viterbi via (min,+) parallel prefix.

    Semantics identical to `viterbi_decode` (greedy zero-delay readout), but
    the T-step recursion becomes a `lax.associative_scan` over per-step
    (min,+) transition matrices — O(log T) sequential depth instead of O(T).
    The trade: O(S^2 log T) work per symbol instead of O(S), so this is the
    *latency* path (single stream / small batch, e.g. one codeword in flight
    per receiver); `viterbi_decode` remains the throughput path.  Pattern from
    the tensor-core parallel Viterbi literature (PAPERS.md: arXiv 2011.13579 —
    ACS as matrix products in the tropical semiring).

    priors: [batch, T, n_states] branch metric attached to each predecessor
            state (same convention as viterbi_decode / reference acs_block).
    returns: [batch, T] hard bit decisions.

    Exactness: min-plus composition is associative; with exactly-representable
    metrics the result is bit-identical to the sequential scan. With float32
    branch metrics, different addition orders can flip exact near-ties (rare;
    statistically invisible in BER).
    """
    batch, T, n_states = priors.shape
    # per-step matrix M_t[p, s] = priors_t[p] if p ∈ pred(s) else +inf, where
    # pred(s) = {2s mod n, 2s+1 mod n}; m_{t+1} = min_p (m_t[p] + M_t[p, s])
    pred = transition_table(n_states)                     # [S, 2]
    mask = np.full((n_states, n_states), np.inf, np.float32)
    for s in range(n_states):
        mask[pred[s, 0], s] = 0.0
        mask[pred[s, 1], s] = 0.0
    mask = jnp.asarray(mask)
    mats = priors[..., None] + mask                        # [B, T, S, S]

    def compose(a, b):
        # (min,+) matrix product: (a ⊗ b)[i, j] = min_k a[i, k] + b[k, j]
        return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    prefixes = jax.lax.associative_scan(compose, mats, axis=1)  # C_1..C_T
    # metrics *entering* step t: m_0 = 0 (uniform), m_t = min_p C_t[p, ·]
    m = jnp.concatenate(
        [jnp.zeros((batch, 1, n_states), priors.dtype),
         jnp.min(prefixes[:, :-1], axis=2)], axis=1)       # [B, T, S]
    return (jnp.argmin(m, axis=-1) % 2).astype(priors.dtype)


def calculate_states(memory_length: int, words: jnp.ndarray) -> jnp.ndarray:
    """Per-time trellis state label of a bit word, for CE training targets.

    words: [batch, T] bits. State at time t is sum_i b_{t+i} * 2^i with zero
    padding past the end (reference trellis_utils.py:33-46).
    returns: [batch*T] int32 labels in [0, 2^memory_length).
    """
    batch, T = words.shape
    padded = jnp.concatenate(
        [words, jnp.zeros((batch, memory_length), dtype=words.dtype)], axis=1
    )
    windows = jnp.stack(
        [padded[:, i : T + i] for i in range(memory_length)], axis=-1
    )  # [batch, T, L]
    weights = (2 ** jnp.arange(memory_length)).astype(words.dtype)
    states = jnp.sum(windows * weights, axis=-1)
    return states.reshape(-1).astype(jnp.int32)
