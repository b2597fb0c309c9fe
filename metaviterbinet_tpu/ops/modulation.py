"""Modulation (parity with reference channel/modulator.py:6-13)."""
import jax.numpy as jnp


def bpsk_modulate(c):
    """BPSK mapping 0 -> +1, 1 -> -1:  x = 1 - 2c."""
    return 1 - 2 * c
