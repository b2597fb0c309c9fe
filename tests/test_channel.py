"""Channel math golden tests vs explicit NumPy formulas (reference parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaviterbinet_tpu.ops.channel import (
    COST_LENGTH,
    estimate_channel,
    estimate_channel_batch,
    isi_awgn_transmit,
)
from metaviterbinet_tpu.ops.modulation import bpsk_modulate


def _expected_taps(L, gamma, index, fading_type, fading):
    h = np.exp(-gamma * np.arange(L))
    if fading:
        if fading_type == 1:
            periods = np.array([51.0, 39.0, 33.0, 21.0])[:L]
            h = h * (0.8 + 0.2 * np.cos(2 * np.pi * index / periods))
        else:
            periods = 5 * np.array([51.0, 39.0, 33.0, 21.0])[:L]
            periods = np.maximum(periods - 1.5 * index, 10 * np.ones(L)) - 1e-5
            h = h * (0.8 + 0.2 * np.cos(np.pi * index / periods))
    return h


@pytest.mark.parametrize("fading_type", [1, 2])
@pytest.mark.parametrize("index", [0, 7, 150, 299])
def test_time_decay_taps_with_fading(fading_type, index):
    got = np.asarray(
        estimate_channel(4, 0.2, "time_decay", fading=True, index=index,
                         fading_taps_type=fading_type)
    )
    np.testing.assert_allclose(got, _expected_taps(4, 0.2, index, fading_type, True), rtol=1e-5)


def test_time_decay_no_fading():
    got = np.asarray(estimate_channel(4, 0.2, "time_decay", fading=False, index=55))
    np.testing.assert_allclose(got, np.exp(-0.2 * np.arange(4)), rtol=1e-5)


def test_batch_matches_single():
    idx = np.array([0, 3, 17, 250])
    batch = np.asarray(
        estimate_channel_batch(4, 0.2, idx, fading=True, fading_taps_type=2)
    )
    for k, i in enumerate(idx):
        single = np.asarray(
            estimate_channel(4, 0.2, "time_decay", fading=True, index=int(i),
                             fading_taps_type=2)
        )
        np.testing.assert_allclose(batch[k], single, rtol=1e-5)


def test_cost2100_taps_load():
    h0 = np.asarray(estimate_channel(4, 0.2, "cost2100", index=0))
    h100 = np.asarray(estimate_channel(4, 0.2, "cost2100", index=100))
    assert h0.shape == (4,)
    assert not np.allclose(h0, h100)
    batch = np.asarray(
        estimate_channel_batch(4, 0.2, np.arange(COST_LENGTH), channel_coefficients="cost2100")
    )
    assert batch.shape == (COST_LENGTH, 4)
    np.testing.assert_allclose(batch[100], h100, rtol=1e-5)


def test_transmit_formula():
    """y_t = sum_i h_{L-1-i} s_{t+i} + snr^{-1/2} w_t (reference channel.py:25-33)."""
    rng = np.random.default_rng(0)
    L, T, W = 4, 20, 3
    bits = rng.integers(0, 2, size=(W, T)).astype(np.float64)
    padded = np.concatenate([bits, np.zeros((W, L))], axis=1)
    s = bpsk_modulate(padded)
    h = rng.normal(size=(W, L))
    snr_db = 10.0
    key = jax.random.PRNGKey(0)
    y = np.asarray(isi_awgn_transmit(jnp.asarray(s), jnp.asarray(h), snr_db, key, L))

    expected_clean = np.zeros((W, T))
    for w in range(W):
        for t in range(T):
            expected_clean[w, t] = sum(h[w, L - 1 - i] * s[w, t + i] for i in range(L))
    noise = y - expected_clean
    snr_value = 10 ** (snr_db / 10)
    # noise power should be close to snr^-1
    assert abs(np.var(noise) - 1 / snr_value) < 0.5 / snr_value + 0.05
    # clean part check at absurdly high snr
    y_clean = np.asarray(isi_awgn_transmit(jnp.asarray(s), jnp.asarray(h), 300.0, key, L))
    np.testing.assert_allclose(y_clean, expected_clean, atol=1e-5)
