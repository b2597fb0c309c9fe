"""Vectorized GF(2^8) arithmetic on int32 jnp arrays via static log/antilog LUTs.

Primitive polynomial 0x11d (same field as the reference RS codec,
python_code/ecc/polynomials_manipulation.py:85-110), but implemented as
branch-free table lookups suitable for jit/vmap on TPU rather than scalar
Python loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PRIM = 0x11D
FIELD = 256


@functools.lru_cache(maxsize=1)
def _tables():
    """(exp[512], log[256]) int32 numpy tables for alpha=2 over prim 0x11d."""
    exp = np.zeros(2 * FIELD, dtype=np.int32)
    log = np.zeros(FIELD, dtype=np.int32)
    x = 1
    for i in range(FIELD - 1):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= PRIM
    # oversize the antilog table so exp[a + b] needs no mod 255 for a, b < 255
    for i in range(FIELD - 1, 2 * FIELD):
        exp[i] = exp[i - (FIELD - 1)]
    return exp, log


def gf_tables():
    exp, log = _tables()
    return jnp.asarray(exp), jnp.asarray(log)


def gf_mul(x, y):
    """Elementwise GF(2^8) product of int32 arrays (broadcasting)."""
    exp, log = gf_tables()
    x = jnp.asarray(x, dtype=jnp.int32)
    y = jnp.asarray(y, dtype=jnp.int32)
    prod = exp[log[x] + log[y]]
    return jnp.where((x == 0) | (y == 0), 0, prod)


def gf_inverse(x):
    """Elementwise inverse; returns 0 for input 0 (caller guards)."""
    exp, log = gf_tables()
    x = jnp.asarray(x, dtype=jnp.int32)
    return jnp.where(x == 0, 0, exp[255 - log[x]])


def gf_div(x, y):
    return gf_mul(x, gf_inverse(y))


def alpha_pow(k):
    """alpha^k for non-negative int array k (alpha = 2)."""
    exp, _ = gf_tables()
    return exp[jnp.asarray(k, dtype=jnp.int32) % 255]


def xor_reduce(x, axis: int):
    """XOR-reduction (GF(2^8) sum) along an axis."""
    return jax.lax.reduce(
        jnp.asarray(x, dtype=jnp.int32),
        jnp.int32(0),
        lambda a, b: jax.lax.bitwise_xor(a, b),
        (axis,),
    )


# ---- host-side (numpy, trace-time) scalar helpers for static constants ----

def np_gf_mul(x: int, y: int) -> int:
    exp, log = _tables()
    if x == 0 or y == 0:
        return 0
    return int(exp[log[x] + log[y]])


def generator_poly(nsym: int) -> np.ndarray:
    """Monic RS generator polynomial, highest-degree-first, length nsym+1."""
    exp, _ = _tables()
    g = [1]
    for i in range(nsym):
        factor = [1, int(exp[i])]  # (x + alpha^i)
        out = [0] * (len(g) + 1)
        for a, ga in enumerate(g):
            for b, fb in enumerate(factor):
                out[a + b] ^= np_gf_mul(ga, fb)
        g = out
    return np.array(g, dtype=np.int32)
