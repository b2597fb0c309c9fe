"""Native C++ RS codec vs the jax codec: bit-identical on random batches."""
import numpy as np
import pytest

from metaviterbinet_tpu.native.rs import (
    native_available,
    rs_decode_bytes_batch,
    rs_encode_bytes_batch,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native codec unavailable (no g++?)")


def _jax_batch(fn, arr, nsym):
    import jax.numpy as jnp
    import jax

    return np.asarray(jax.vmap(lambda r: fn(jnp.asarray(r), nsym)[0]
                               if isinstance(fn(jnp.asarray(arr[0]), nsym), tuple)
                               else fn(jnp.asarray(r), nsym))(jnp.asarray(arr)))


def test_encode_matches_jax():
    from metaviterbinet_tpu.ecc.rs import rs_encode_bytes
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, size=(64, 15)).astype(np.uint8)
    native = rs_encode_bytes_batch(msgs, 2)
    ref = np.asarray(jax.vmap(lambda m: rs_encode_bytes(m, 2))(jnp.asarray(msgs, jnp.int32)))
    np.testing.assert_array_equal(native, ref.astype(np.uint8))


@pytest.mark.parametrize("nsym,max_errs", [(2, 3), (4, 5), (8, 7)])
def test_decode_matches_jax(nsym, max_errs):
    from metaviterbinet_tpu.ecc.rs import rs_decode_bytes
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 256, size=(128, 15)).astype(np.uint8)
    coded = rs_encode_bytes_batch(msgs, nsym)
    rxs = coded.copy()
    for i in range(rxs.shape[0]):
        k = rng.integers(0, max_errs + 1)
        pos = rng.choice(rxs.shape[1], size=k, replace=False)
        for p in pos:
            rxs[i, p] ^= rng.integers(1, 256)
    native_out, native_flags = rs_decode_bytes_batch(rxs, nsym)
    jout, jflags = jax.vmap(lambda r: rs_decode_bytes(r, nsym))(jnp.asarray(rxs, jnp.int32))
    np.testing.assert_array_equal(native_out, np.asarray(jout).astype(np.uint8))
    np.testing.assert_array_equal(native_flags.astype(bool), np.asarray(jflags))


def test_roundtrip_correctable():
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 256, size=(256, 15)).astype(np.uint8)
    coded = rs_encode_bytes_batch(msgs, 4)
    rxs = coded.copy()
    for i in range(rxs.shape[0]):
        pos = rng.choice(rxs.shape[1], size=2, replace=False)
        for p in pos:
            rxs[i, p] ^= rng.integers(1, 256)
    out, flags = rs_decode_bytes_batch(rxs, 4)
    assert not flags.any()
    np.testing.assert_array_equal(out, msgs)


def test_host_decode_wrapper_matches_jax_path():
    """ecc.rs.rs_decode_bits_host (the eval-path production wiring) must be
    bit-identical to the jittable rs_decode_bits on noisy codeword bits."""
    import jax, jax.numpy as jnp

    from metaviterbinet_tpu.ecc.rs import (
        rs_decode_bits, rs_decode_bits_host, rs_encode_bits,
    )

    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(32, 120)).astype(np.float32)
    coded = np.array(rs_encode_bits(jnp.asarray(bits), 2))  # writable copy
    # flip 0..12 random bits per word (both correctable and uncorrectable)
    for i in range(coded.shape[0]):
        k = rng.integers(0, 13)
        pos = rng.choice(coded.shape[1], size=k, replace=False)
        coded[i, pos] = 1 - coded[i, pos]
    host, hflags = rs_decode_bits_host(coded, 2)
    dev, dflags = rs_decode_bits(jnp.asarray(coded), 2)
    np.testing.assert_array_equal(host, np.asarray(dev))
    np.testing.assert_array_equal(hflags.astype(bool), np.asarray(dflags).astype(bool))
