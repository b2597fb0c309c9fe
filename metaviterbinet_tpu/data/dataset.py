"""On-device channel dataset generation.

Protocol parity with reference channel/channel_dataset.py:15-107: per word
index i (starting at 0 — load-bearing for the fixed val fading trajectory,
reference :60-63), draw block_length random bits, RS-encode when ECC is on,
zero-pad memory_length bits, generate taps h(i) with the phase's fading flag,
BPSK-modulate and transmit through the ISI-AWGN channel.

TPU-first: the whole batch of words is generated in one jitted, vmapped
program from explicit PRNG keys (replacing the two host RandomStates); there
is no host round-trip and no serialized executor.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from metaviterbinet_tpu.config import Config
from metaviterbinet_tpu.ecc.rs import rs_encode_bits
from metaviterbinet_tpu.ops.channel import estimate_channel_batch, isi_awgn_transmit
from metaviterbinet_tpu.ops.modulation import bpsk_modulate


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_words", "block_length", "memory_length", "use_ecc", "n_symbols",
        "channel_coefficients", "fading", "fading_taps_type", "noisy_est_var",
    ),
)
def generate_words(
    word_key,
    noise_key,
    snr,
    gamma,
    n_words: int,
    block_length: int,
    memory_length: int,
    use_ecc: bool,
    n_symbols: int,
    channel_coefficients: str,
    fading: bool,
    fading_taps_type: int,
    noisy_est_var: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate a batch of (info bits, received samples).

    returns b [n_words, block_length] float32, y [n_words, transmission_length].
    """
    b = jax.random.randint(word_key, (n_words, block_length), 0, 2).astype(jnp.float32)
    if use_ecc:
        c = rs_encode_bits(b, n_symbols).astype(jnp.float32)
    else:
        c = b
    padded = jnp.concatenate([c, jnp.zeros((n_words, memory_length))], axis=1)

    indices = jnp.arange(n_words)
    est_key, tx_key = jax.random.split(noise_key)
    h = estimate_channel_batch(
        memory_length, gamma, indices,
        channel_coefficients=channel_coefficients,
        noisy_est_var=noisy_est_var,
        fading=fading,
        fading_taps_type=fading_taps_type,
        noise_key=est_key if noisy_est_var > 0 else None,
    )
    s = bpsk_modulate(padded)
    y = isi_awgn_transmit(s, h, snr, tx_key, memory_length)
    return b, y


class ChannelDataset:
    """Phase-bound dataset facade mirroring the reference ChannelModelDataset.

    get(snr, gamma, key_seq) returns a fresh batch; successive calls advance
    the PRNG stream (the reference advances its RandomStates the same way).
    """

    def __init__(self, cfg: Config, phase: str):
        self.cfg = cfg
        self.phase = phase
        self._word_key = jax.random.PRNGKey(cfg.word_seed)
        self._noise_key = jax.random.PRNGKey(cfg.noise_seed)
        # fading flag: val words fade per fading_in_channel; train words per
        # fading_in_decoder (reference channel_dataset.py:73-78)
        self.fading = cfg.fading_in_channel if phase == "val" else cfg.fading_in_decoder

    def next_keys(self):
        """Advance the word/noise PRNG streams one step (exactly what one
        `get` call consumes) and return the drawn (word_key, noise_key).
        Lets a caller pre-draw the keys for several batches in stream order
        and fold the generation into a larger jitted program (the fused
        multi-SNR eval sweep) without perturbing the sequence a plain
        per-SNR `get` loop would have produced."""
        self._word_key, wk = jax.random.split(self._word_key)
        self._noise_key, nk = jax.random.split(self._noise_key)
        return wk, nk

    def generate(self, word_key, noise_key, snr: float, gamma: float):
        """Pure generation from explicit keys (jit-inlinable)."""
        cfg, phase = self.cfg, self.phase
        return generate_words(
            word_key, noise_key, snr, gamma,
            n_words=cfg.n_words(phase),
            block_length=cfg.block_length(phase),
            memory_length=cfg.memory_length,
            use_ecc=cfg.use_ecc,
            n_symbols=cfg.n_symbols,
            channel_coefficients=cfg.coefficients_for_phase(phase),
            fading=self.fading,
            fading_taps_type=cfg.fading_taps_type,
            noisy_est_var=cfg.noisy_est_var,
        )

    def get(self, snr: float, gamma: float):
        wk, nk = self.next_keys()
        return self.generate(wk, nk, snr, gamma)
