"""Channel simulation: tap generation (time-decay / COST2100, fading) and
ISI-AWGN transmission.

Formula parity with the reference:
  - taps + fading: python_code/channel/channel_estimation.py:11-49
  - transmit:      python_code/channel/channel.py:11-35
The implementation is batched/vmappable over block indices and words, and the
COST2100 measured traces are loaded once host-side into a static table (using
the shipped file names h_{i}.mat — the reference loader's `combined_h_{i}`
name is a bug in the reference, see SURVEY.md quirk ledger).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from metaviterbinet_tpu.paths import COST2100_DIR

COST_LENGTH = 300

_FADING_PERIODS = np.array([51.0, 39.0, 33.0, 21.0])


@functools.lru_cache(maxsize=4)
def _cost2100_table(memory_length: int) -> np.ndarray:
    """[COST_LENGTH, memory_length] measured per-tap magnitudes."""
    import scipy.io

    table = np.empty([COST_LENGTH, memory_length])
    for i in range(memory_length):
        mat = scipy.io.loadmat(os.path.join(COST2100_DIR, f"h_{i}.mat"))
        table[:, i] = mat["h_channel_response_mag"].reshape(-1)
    return table


def _fading_factor(index, fading_taps_type: int, memory_length: int):
    """Multiplicative cosine fading on the taps, per block index."""
    periods = jnp.asarray(_FADING_PERIODS[:memory_length])
    if fading_taps_type == 1:
        return 0.8 + 0.2 * jnp.cos(2 * jnp.pi * index / periods)
    elif fading_taps_type == 2:
        taps = 5 * periods
        taps = jnp.maximum(taps - 1.5 * index, 10 * jnp.ones(memory_length)) - 1e-5
        return 0.8 + 0.2 * jnp.cos(jnp.pi * index / taps)
    else:
        raise ValueError("No such fading taps type")


def estimate_channel(
    memory_length: int,
    gamma: float,
    channel_coefficients: str = "time_decay",
    noisy_est_var: float = 0.0,
    fading: bool = False,
    index=0,
    fading_taps_type: int = 1,
    noise_key=None,
):
    """Channel taps h for a single block index; returns [memory_length].

    time_decay: h_l = exp(-gamma * l); cost2100: measured trace at `index`.
    Fading applies only to time_decay (as in the reference).
    """
    if channel_coefficients == "time_decay":
        h = jnp.exp(-gamma * jnp.arange(memory_length))
    elif channel_coefficients == "cost2100":
        table = jnp.asarray(_cost2100_table(memory_length))
        h = table[jnp.asarray(index) % COST_LENGTH]
    else:
        raise ValueError("No such channel_coefficients value")

    if noisy_est_var > 0:
        if noise_key is None:
            raise ValueError("noisy_est_var > 0 requires a PRNG key")
        noise = jnp.sqrt(noisy_est_var) * jax.random.normal(noise_key, (memory_length - 1,))
        h = h.at[1:].add(noise)

    if fading and channel_coefficients == "time_decay":
        h = h * _fading_factor(jnp.asarray(index, dtype=jnp.float32), fading_taps_type, memory_length)
    return h


def estimate_channel_batch(
    memory_length: int,
    gamma: float,
    indices,
    channel_coefficients: str = "time_decay",
    noisy_est_var: float = 0.0,
    fading: bool = False,
    fading_taps_type: int = 1,
    noise_key=None,
):
    """Taps for a batch of block indices; returns [len(indices), memory_length]."""
    indices = jnp.asarray(indices)
    keys = None
    if noisy_est_var > 0:
        if noise_key is None:
            raise ValueError("noisy_est_var > 0 requires a PRNG key")
        keys = jax.random.split(noise_key, indices.shape[0])

    def one(index, key):
        return estimate_channel(
            memory_length, gamma, channel_coefficients, noisy_est_var,
            fading, index, fading_taps_type, key,
        )

    if keys is None:
        return jax.vmap(lambda i: one(i, None))(indices)
    return jax.vmap(one)(indices, keys)


def isi_awgn_transmit(
    s: jnp.ndarray, h: jnp.ndarray, snr_db, key, memory_length: int
) -> jnp.ndarray:
    """Transmit symbols through an L-tap ISI channel with AWGN.

    s: [words, T + memory_length] modulated symbols (already zero-bit padded).
    h: [words, memory_length] per-word taps.
    returns y: [words, T] with y_t = sum_i h_{L-1-i} s_{t+i} + snr^{-1/2} w_t
    (reference channel.py:25-33: stacked-window matmul with reversed taps).
    """
    T = s.shape[1] - memory_length
    windows = jnp.stack([s[:, i : T + i] for i in range(memory_length)], axis=1)  # [W, L, T]
    conv = jnp.einsum("wl,wlt->wt", h[:, ::-1], windows)
    snr_value = 10.0 ** (jnp.asarray(snr_db) / 10.0)
    w = jax.random.normal(key, conv.shape)
    return conv + (snr_value ** -0.5) * w
