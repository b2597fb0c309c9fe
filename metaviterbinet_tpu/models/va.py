"""Classical Viterbi detector with full CSI (analytic Gaussian branch metrics).

Parity with reference detectors/VA/va_detector.py:42-100. Pure functions: the
detector has no parameters; CSI enters as explicit per-word channel taps.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from metaviterbinet_tpu.ops.modulation import bpsk_modulate
from metaviterbinet_tpu.ops.trellis import viterbi_decode

_LOG_SQRT_2PI = math.log(math.sqrt(2 * math.pi))


def state_symbols(n_states: int, memory_length: int) -> np.ndarray:
    """[n_states, memory_length] BPSK symbols of each state's bit pattern.

    Column l holds the symbol of bit (L-1-l) of the state index — the MSB-first
    layout of the reference's np.unpackbits slice (va_detector.py:43-47).
    """
    s = np.arange(n_states).reshape(-1, 1)
    shifts = np.arange(memory_length - 1, -1, -1).reshape(1, -1)
    bits = (s >> shifts) & 1
    return bpsk_modulate(bits).astype(np.float32)


def branch_priors(y: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Gaussian negative log-likelihood branch metrics.

    y: [words, T] received samples; h: [words, L] per-word channel taps.
    returns [words, T, n_states]:  (y - mu_s)^2 / 2 - log sqrt(2 pi)
    with mu_s = sum_l sym(bit_{L-1-l}(s)) h_l  (reference va_detector.py:49,64-68).
    """
    L = h.shape[-1]
    sym = jnp.asarray(state_symbols(2 ** L, L))  # [n_states, L]
    mu = h @ sym.T  # [words, n_states]
    diff = y[:, :, None] - mu[:, None, :]
    return diff ** 2 / 2 - _LOG_SQRT_2PI


def detect(y: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full-CSI Viterbi decode: [words, T] samples + [words, L] taps -> bits."""
    return viterbi_decode(branch_priors(y, h))
