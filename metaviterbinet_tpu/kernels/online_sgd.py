"""Fused on-device online-adaptation trainer kernel.

The self-supervised adaptation loop — `self_supervised_iterations` (200)
SGD/Adam steps on ONE pseudo-labeled word (reference
metavnet_trainer.py:52-64) — is the latency hot spot of the online
Meta-ViterbiNet workload. This kernel runs the ENTIRE loop inside one
`pallas_call`: weights, Adam moments, activations and gradients all live in
VMEM; each iteration is ~10 small MXU matmuls + VPU ops.

Measured on a v5e chip: 1.38 ms vs the XLA `lax.scan` path's 1.19 ms for
200 steps — XLA already compiles the whole loop into one program, so the
explicit kernel does NOT win at this model size and the online engine keeps
the scan path. Kept as the explicit-control variant (and the template for
models big enough that XLA's scheduling leaves VMEM residency on the
table), with equivalence pinned by tests/test_online_sgd_kernel.py.

Layout: features/states on sublanes, the T symbols on lanes (same transpose
as kernels/acs.py). The cross-entropy gradient needs no gathers: the state
labels are constant across iterations, so their one-hot [S, T] matrix is a
kernel input.

Scope: the no-subsampling CE-over-states loss of the META trainers
(metavnet_trainer.py:41-50 — all symbols, mean reduction) with the Adam
update of reference deep_learning_setup (trainer.py:163-169). Adam moments
and the step count are kernel I/O, matching the reference where one
optimizer instance persists across the whole 300-block online eval. The
subsampled VNET/LSTM losses keep the XLA path. Forward math is identical
to models/viterbinet.score; the update math to optax.adam.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGH = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(n_iters: int, lr: float, b1: float, b2: float, eps: float,
                 inv_T: float):
    def kernel(y_ref, onehot_ref, pow_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               *mom_and_out):
        mu_in = mom_and_out[0:6]
        nu_in = mom_and_out[6:12]
        p_out = mom_and_out[12:18]   # params out
        mu_out = mom_and_out[18:24]
        nu_out = mom_and_out[24:30]
        y = y_ref[:]            # [1, T]
        onehot = onehot_ref[:]  # [S, T]

        for src, dst in zip((w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref), p_out):
            dst[:] = src[:]
        for src, dst in zip(mu_in, mu_out):
            dst[:] = src[:]
        for src, dst in zip(nu_in, nu_out):
            dst[:] = src[:]

        def adam(idx, g, p, c1, c2):
            m = b1 * mu_out[idx][:] + (1.0 - b1) * g
            v = b2 * nu_out[idx][:] + (1.0 - b2) * g * g
            mu_out[idx][:] = m
            nu_out[idx][:] = v
            return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)

        def body(i, carry):
            pow1, pow2 = carry
            pow1 = pow1 * b1
            pow2 = pow2 * b2
            c1 = 1.0 - pow1
            c2 = 1.0 - pow2

            w1, bb1 = p_out[0][:], p_out[1][:]
            w2, bb2 = p_out[2][:], p_out[3][:]
            w3, bb3 = p_out[4][:], p_out[5][:]

            # ---- forward (== viterbinet.score in [feat, T] layout) ----
            h1 = jax.nn.sigmoid(w1 * y + bb1)                               # [H1,T]
            z2 = jnp.dot(w2, h1, preferred_element_type=jnp.float32,
                         precision=HIGH) + bb2                              # [H2,T]
            h2 = jnp.maximum(z2, 0.0)
            logits = jnp.dot(w3, h2, preferred_element_type=jnp.float32,
                             precision=HIGH) + bb3                          # [S,T]

            # ---- CE backward: dlogits = (softmax - onehot) / T ----
            mx = jnp.max(logits, axis=0, keepdims=True)
            e = jnp.exp(logits - mx)
            p = e / jnp.sum(e, axis=0, keepdims=True)
            dlogits = (p - onehot) * inv_T

            dw3 = jnp.dot(dlogits, h2.T, preferred_element_type=jnp.float32,
                          precision=HIGH)
            db3 = jnp.sum(dlogits, axis=1, keepdims=True)
            dh2 = jnp.dot(w3.T, dlogits, preferred_element_type=jnp.float32,
                          precision=HIGH)
            dz2 = jnp.where(z2 > 0.0, dh2, 0.0)
            dw2 = jnp.dot(dz2, h1.T, preferred_element_type=jnp.float32,
                          precision=HIGH)
            db2 = jnp.sum(dz2, axis=1, keepdims=True)
            dh1 = jnp.dot(w2.T, dz2, preferred_element_type=jnp.float32,
                          precision=HIGH)
            dz1 = dh1 * h1 * (1.0 - h1)
            dw1 = jnp.sum(dz1 * y, axis=1, keepdims=True)
            db1 = jnp.sum(dz1, axis=1, keepdims=True)

            p_out[0][:] = adam(0, dw1, w1, c1, c2)
            p_out[1][:] = adam(1, db1, bb1, c1, c2)
            p_out[2][:] = adam(2, dw2, w2, c1, c2)
            p_out[3][:] = adam(3, db2, bb2, c1, c2)
            p_out[4][:] = adam(4, dw3, w3, c1, c2)
            p_out[5][:] = adam(5, db3, bb3, c1, c2)
            return pow1, pow2

        jax.lax.fori_loop(0, n_iters, body, (pow_ref[0, 0], pow_ref[0, 1]))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_iters", "lr", "b1", "b2", "eps"))
def online_adapt_viterbinet(params, mu, nu, count, y, states, n_iters: int,
                            lr: float, b1: float = 0.9, b2: float = 0.999,
                            eps: float = 1e-8):
    """Run `n_iters` fused Adam steps of CE-over-states on one word.

    params/mu/nu: viterbinet-shaped pytrees (mu/nu are the Adam moments);
    count: int32 step counter so far; y: [T] samples; states: [T] int32
    trellis-state labels. Returns (new_params, new_mu, new_nu, new_count).
    """
    S = params["w3"].shape[0]
    H1 = params["w1"].shape[0]
    H2 = params["w2"].shape[0]
    T = y.shape[-1]
    onehot = jax.nn.one_hot(states, S, axis=0, dtype=jnp.float32)  # [S, T]
    powers = jnp.stack([
        jnp.power(jnp.float32(b1), count.astype(jnp.float32)),
        jnp.power(jnp.float32(b2), count.astype(jnp.float32)),
    ]).reshape(1, 2)
    kernel = _make_kernel(n_iters, lr, b1, b2, eps, 1.0 / T)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    shapes = [(H1, 1), (H1, 1), (H2, H1), (H2, 1), (S, H2), (S, 1)]
    sds = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes]

    def flat(tree):
        return [tree["w1"].reshape(H1, 1), tree["b1"].reshape(H1, 1),
                tree["w2"], tree["b2"].reshape(H2, 1),
                tree["w3"], tree["b3"].reshape(S, 1)]

    out = pl.pallas_call(
        kernel,
        in_specs=[vmem] * (3 + 6 + 12),
        out_specs=tuple([vmem] * 18),
        out_shape=tuple(sds * 3),
        interpret=_interpret(),
    )(y.reshape(1, T).astype(jnp.float32), onehot, powers,
      *flat(params), *flat(mu), *flat(nu))

    def unflat(six):
        return {"w1": six[0], "b1": six[1].reshape(H1), "w2": six[2],
                "b2": six[3].reshape(H2), "w3": six[4], "b3": six[5].reshape(S)}

    new_params = unflat(out[0:6])
    new_mu = unflat(out[6:12])
    new_nu = unflat(out[12:18])
    return new_params, new_mu, new_nu, count + n_iters
