"""Error-rate metrics (parity with reference utils/metrics.py:7-17).

Note the reference calls the bitwise rate "ser"; it is a BER on info bits and
the plots label it "Coded BER".
"""
import jax.numpy as jnp


def error_rates(prediction, target):
    """Returns (ber, fer, per-word error indicator).

    prediction/target: [words, bits]. ber = 1 - mean bit accuracy;
    fer = 1 - fraction of exactly-correct words; the third output is a
    [words] int vector of per-word error counts (nonzero => errored word).
    """
    pred = prediction.astype(jnp.int32)
    tgt = target.astype(jnp.int32)
    bits_acc = jnp.mean((pred == tgt).astype(jnp.float32))
    word_errors = jnp.sum(jnp.abs(pred - tgt), axis=1)
    frames_acc = jnp.mean((word_errors == 0).astype(jnp.float32))
    ber = jnp.maximum(1.0 - bits_acc, 0.0)
    fer = jnp.maximum(1.0 - frames_acc, 0.0)
    return ber, fer, word_errors
