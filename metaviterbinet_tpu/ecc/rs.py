"""Jittable, vmappable Reed-Solomon codec over GF(2^8).

Behavioral parity with the reference scalar-Python codec
(python_code/ecc/rs_encoder.py:7-37, rs_decoder.py:37-218, rs_main.py:9-37):
systematic encode via LFSR division by the generator polynomial, decode via
syndromes -> Berlekamp-Massey -> Chien root search -> Forney magnitudes, with
the same graceful fallback: if BM detects more errors than correctable, the
first n-nsym symbols are returned uncorrected.

TPU-first design: every polynomial lives in a fixed-size buffer with a tracked
effective length (static shapes under jit); BM runs exactly `nsym` masked
iterations; Chien search is one LUT-matmul-style XOR reduction over a static
power matrix; all of it vmaps over transmission blocks so ECC runs on-device
inside the online adaptation loop, with zero host round-trips.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from metaviterbinet_tpu.ecc.gf256 import (
    alpha_pow,
    generator_poly,
    gf_div,
    gf_inverse,
    gf_mul,
    gf_tables,
    xor_reduce,
)


# --------------------------------------------------------------------------
# bit <-> byte packing (reference polynomials_manipulation.py:120-125)
# --------------------------------------------------------------------------

def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 8k] {0,1} -> [..., k] int32 bytes, MSB-first (np.packbits order)."""
    bits = jnp.asarray(bits, dtype=jnp.int32)
    shape = bits.shape[:-1] + (bits.shape[-1] // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32)
    return jnp.sum(bits.reshape(shape) * weights, axis=-1)


def bytes_to_bits(by: jnp.ndarray) -> jnp.ndarray:
    """[..., k] int32 bytes -> [..., 8k] {0,1} bits, MSB-first."""
    by = jnp.asarray(by, dtype=jnp.int32)
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], dtype=jnp.int32)
    bits = (by[..., None] >> shifts) & 1
    return bits.reshape(*by.shape[:-1], by.shape[-1] * 8)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def rs_encode_bytes(msg: jnp.ndarray, nsym: int) -> jnp.ndarray:
    """Systematic RS encode of one message; msg [k] int32 -> codeword [k+nsym].

    LFSR view of extended synthetic division by the (monic) generator poly.
    """
    msg = jnp.asarray(msg, dtype=jnp.int32)
    if msg.shape[-1] + nsym > 255:
        raise ValueError(f"codeword too long: {msg.shape[-1] + nsym} > 255")
    g = jnp.asarray(generator_poly(nsym))  # [nsym+1], g[0] == 1

    def step(reg, m):
        feedback = m ^ reg[0]
        shifted = jnp.concatenate([reg[1:], jnp.zeros((1,), jnp.int32)])
        return shifted ^ gf_mul(g[1:], feedback), None

    reg0 = jnp.zeros((nsym,), dtype=jnp.int32)
    parity, _ = jax.lax.scan(step, reg0, msg)
    return jnp.concatenate([msg, parity])


def rs_encode_bits(bits: jnp.ndarray, nsym: int) -> jnp.ndarray:
    """Encode a binary word (or batch): [..., 8k] bits -> [..., 8(k+nsym)] bits."""
    msg = bits_to_bytes(bits)
    enc = rs_encode_bytes(msg, nsym) if msg.ndim == 1 else jax.vmap(
        lambda m: rs_encode_bytes(m, nsym)
    )(msg.reshape(-1, msg.shape[-1])).reshape(*msg.shape[:-1], msg.shape[-1] + nsym)
    return bytes_to_bits(enc)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _decode_consts_np(n: int, nsym: int):
    """Static matrices for syndrome and Chien evaluation at codeword length n.

    Cached as NUMPY arrays only: caching jax arrays here is a tracer-leak
    hazard — if the first call happens inside a jit/vmap trace, the cached
    value can be trace-local and poison later calls."""
    nb = nsym + 2  # BM buffer size (list lengths never exceed nsym+1)
    # syndrome: synd_i = XOR_j msg[j] * alpha^(i*(n-1-j)),  i = 0..nsym-1
    i_idx = np.arange(nsym)[:, None]
    j_idx = np.arange(n)[None, :]
    synd_pow = np.asarray(_tables_exp())[(i_idx * (n - 1 - j_idx)) % 255]
    # chien: val_i = XOR_m coef_m * alpha^(i*m),  i = 0..n-1, m = 0..nb-1
    ii = np.arange(n)[:, None]
    mm = np.arange(nb)[None, :]
    chien_pow = np.asarray(_tables_exp())[(ii * mm) % 255]
    return synd_pow.astype(np.int32), chien_pow.astype(np.int32)


def _decode_consts(n: int, nsym: int):
    synd_pow, chien_pow = _decode_consts_np(n, nsym)
    return jnp.asarray(synd_pow), jnp.asarray(chien_pow)


def _tables_exp():
    from metaviterbinet_tpu.ecc.gf256 import _tables
    return _tables()[0][:256]


@functools.partial(jax.jit, static_argnums=(1,))
def rs_decode_bytes(rx: jnp.ndarray, nsym: int):
    """Decode one received codeword [n] -> (message [n-nsym], uncorrectable flag).

    Fixed-shape Berlekamp-Massey + Chien + Forney; see module docstring.
    """
    rx = jnp.asarray(rx, dtype=jnp.int32)
    n = rx.shape[0]
    nb = nsym + 2
    maxe = nsym
    synd_pow, chien_pow = _decode_consts(n, nsym)

    # ---- syndromes (one XOR-reduction; reference rs_decoder.py:37-47) ----
    synd_core = xor_reduce(gf_mul(rx[None, :], synd_pow), axis=1)  # [nsym]
    synd = jnp.concatenate([jnp.zeros((1,), jnp.int32), synd_core])  # [nsym+1], shift pad

    # ---- Berlekamp-Massey with right-aligned fixed buffers ----
    # buffers hold list-form polynomials (highest-degree-first) right-aligned
    # in nb slots; (buf, length) pairs replace Python's growing lists.
    e0 = jnp.zeros((nb,), jnp.int32).at[nb - 1].set(1)  # err_loc = [1]
    o0 = jnp.zeros((nb,), jnp.int32).at[nb - 1].set(1)  # old_loc = [1]
    j_idx = jnp.arange(nb)

    def bm_step(carry, i):
        e_buf, e_len, o_buf, o_len = carry
        K = i + 1  # synd_shift = 1
        # delta = synd[K] ^ XOR_{j=1..e_len-1} err_loc[-(j+1)] * synd[K-j]
        terms = gf_mul(e_buf[nb - 1 - j_idx], synd[jnp.clip(K - j_idx, 0, nsym)])
        mask = (j_idx >= 1) & (j_idx < e_len) & (K - j_idx >= 0)
        delta = synd[K] ^ xor_reduce(jnp.where(mask, terms, 0), axis=0)
        # old_loc = old_loc + [0]  (append zero: shift left in right-aligned buf)
        o_buf = jnp.concatenate([o_buf[1:], jnp.zeros((1,), jnp.int32)])
        o_len = o_len + 1
        upd = delta != 0
        swap = upd & (o_len > e_len)
        new_e = gf_mul(o_buf, delta)
        o_buf2 = jnp.where(swap, gf_mul(e_buf, gf_inverse(delta)), o_buf)
        o_len2 = jnp.where(swap, e_len, o_len)
        e_buf2 = jnp.where(swap, new_e, e_buf)
        e_len2 = jnp.where(swap, o_len, e_len)
        e_buf3 = jnp.where(upd, e_buf2 ^ gf_mul(o_buf2, delta), e_buf2)
        e_len3 = jnp.where(upd, jnp.maximum(e_len2, o_len2), e_len2)
        return (e_buf3, e_len3, o_buf2, o_len2), None

    (e_buf, e_len, _, _), _ = jax.lax.scan(
        bm_step, (e0, jnp.int32(1), o0, jnp.int32(1)), jnp.arange(nsym)
    )

    # drop leading zeros (reference rs_decoder.py:199): first nonzero in the
    # active window [nb - e_len, nb)
    active = (j_idx >= nb - e_len) & (e_buf != 0)
    first_nz = jnp.argmax(active)  # constant term is always 1, so one exists
    act_len = nb - first_nz
    errs = act_len - 1
    uncorrectable = errs * 2 > nsym

    # ---- Chien search: roots of sum_m list[m] x^m at x = alpha^i ----
    coefs = jnp.where(j_idx < act_len, jnp.roll(e_buf, -first_nz), 0)  # [nb]
    vals = xor_reduce(gf_mul(coefs[None, :], chien_pow), axis=1)  # [n]
    root_mask = vals == 0
    i_all = jnp.arange(n)
    root_is = jnp.sort(jnp.where(root_mask, i_all, n))[:maxe]  # ascending i order
    count = jnp.minimum(jnp.sum(root_mask), maxe)
    k_idx = jnp.arange(maxe)
    valid = k_idx < count
    coef_pos = jnp.where(valid, root_is, 0)  # coef degree = root index i
    err_pos = jnp.where(valid, n - 1 - root_is, n)  # n => dropped in scatter

    # ---- errata locator in power form: prod_k (1 + alpha^{coef_pos_k} x) ----
    lam = jnp.zeros((maxe + 1,), jnp.int32).at[0].set(1)

    def lam_step(lam, k):
        a = alpha_pow(coef_pos[k])
        shifted = jnp.concatenate([jnp.zeros((1,), jnp.int32), lam[:-1]])
        return jnp.where(valid[k], lam ^ gf_mul(a, shifted), lam), None

    lam, _ = jax.lax.scan(lam_step, lam, jnp.arange(maxe))

    # ---- error evaluator Omega = [Synd_rev * Lambda] mod x^(count+1) ----
    # synd[::-1] in power form has coefficient of x^d equal to synd[d].
    d_idx = jnp.arange(maxe + 1)[:, None]
    kk = jnp.arange(maxe + 1)[None, :]
    s_at = synd[jnp.clip(d_idx - kk, 0, nsym)]
    conv_terms = jnp.where(kk <= d_idx, gf_mul(lam[None, :], s_at), 0)
    omega = xor_reduce(conv_terms, axis=1)  # [maxe+1], power-form coeffs

    # ---- Forney magnitudes ----
    X = alpha_pow(coef_pos)  # [maxe]
    Xinv = gf_inverse(X)
    # y_k = X_k * sum_{d<=count} omega_d Xinv_k^d
    d_pow = alpha_pow((255 - coef_pos[:, None]) * jnp.arange(maxe + 1)[None, :])
    y_terms = jnp.where(jnp.arange(maxe + 1)[None, :] <= count, gf_mul(omega[None, :], d_pow), 0)
    y = gf_mul(X, xor_reduce(y_terms, axis=1))
    # denominator: prod_{j != k, j valid} (1 ^ Xinv_k * X_j)
    cross = 1 ^ gf_mul(Xinv[:, None], X[None, :])  # [maxe, maxe]
    off_diag = (jnp.arange(maxe)[:, None] != jnp.arange(maxe)[None, :]) & valid[None, :]
    factors = jnp.where(off_diag, cross, 1)

    def prod_step(acc, j):
        return gf_mul(acc, factors[:, j]), None

    prime, _ = jax.lax.scan(prod_step, jnp.ones((maxe,), jnp.int32), jnp.arange(maxe))
    magnitude = jnp.where(valid & (prime != 0), gf_div(y, prime), 0)

    # ---- apply correction ----
    e_vec = jnp.zeros((n,), jnp.int32).at[err_pos].set(magnitude, mode="drop")
    corrected = rx ^ e_vec
    out = jnp.where(uncorrectable, rx[: n - nsym], corrected[: n - nsym])
    return out, uncorrectable


def rs_decode_bits(bits: jnp.ndarray, nsym: int):
    """Decode binary codeword(s): [..., 8n] bits -> [..., 8(n-nsym)] bits."""
    rx = bits_to_bytes(jnp.asarray(bits))
    if rx.ndim == 1:
        out, flag = rs_decode_bytes(rx, nsym)
    else:
        flat = rx.reshape(-1, rx.shape[-1])
        out, flag = jax.vmap(lambda r: rs_decode_bytes(r, nsym))(flat)
        out = out.reshape(*rx.shape[:-1], rx.shape[-1] - nsym)
        flag = flag.reshape(rx.shape[:-1])
    return bytes_to_bits(out), flag


def rs_decode_bits_host(bits, nsym: int):
    """Host-side batch decode for eval paths that already left the device.

    Prefers the native C++ batch codec (native/rs.py) — it skips this
    decoder's heavy XLA CPU compile entirely and decodes the protocol batch
    in microseconds — and falls back to the jittable path when the native
    library is unavailable. Both are bit-identical to the reference scalar
    decoder including silent miscorrection (tests/test_native_rs.py,
    tests/test_ecc.py; differential fuzz in
    resources/reference_baselines.json). Returns numpy
    (decoded_bits [..., n-8*nsym] float32, uncorrectable_flags [...]).
    """
    from metaviterbinet_tpu.native.rs import native_available, rs_decode_bytes_batch

    if not native_available():
        out, flag = rs_decode_bits(jnp.asarray(bits), nsym)
        return np.asarray(out, dtype=np.float32), np.asarray(flag)
    arr = np.asarray(bits)
    lead = arr.shape[:-1]
    flat = arr.reshape(-1, arr.shape[-1]).astype(np.uint8)
    by = np.packbits(flat, axis=-1)  # MSB-first, same order as bits_to_bytes
    dec_by, flags = rs_decode_bytes_batch(by, nsym)
    dec_bits = np.unpackbits(dec_by, axis=-1).astype(np.float32)
    return dec_bits.reshape(*lead, -1), flags.reshape(lead)
