"""Fused online-SGD kernel vs the optax reference path (interpret on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from metaviterbinet_tpu.kernels.online_sgd import online_adapt_viterbinet
from metaviterbinet_tpu.models import viterbinet
from metaviterbinet_tpu.ops.trellis import calculate_states

S, T, L = 16, 136, 4


def _loss_fn(p, y, states):
    logits = viterbinet.score(p, y[None, :]).reshape(-1, S)
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, states))


def test_kernel_matches_optax_adam():
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(T,)).astype(np.float32))
    bits = jnp.asarray(rng.integers(0, 2, size=(1, T)).astype(np.float32))
    states = calculate_states(L, bits)

    opt = optax.adam(1e-3)
    p_ref, opt_state = params, opt.init(params)
    N = 40
    for _ in range(N):
        grads = jax.grad(_loss_fn)(p_ref, y, states)
        updates, opt_state = opt.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)

    zeros = jax.tree.map(jnp.zeros_like, params)
    p_ker, mu, nu, count = online_adapt_viterbinet(
        params, zeros, zeros, jnp.int32(0), y, states, n_iters=N, lr=1e-3)
    assert int(count) == N
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_ker[k]), np.asarray(p_ref[k]),
                                   atol=5e-6)
    # moments must round-trip: continuing from returned state == one long run
    p_ker2, _, _, count2 = online_adapt_viterbinet(
        p_ker, mu, nu, count, y, states, n_iters=N, lr=1e-3)
    for _ in range(N):
        grads = jax.grad(_loss_fn)(p_ref, y, states)
        updates, opt_state = opt.update(grads, opt_state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
    assert int(count2) == 2 * N
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_ker2[k]), np.asarray(p_ref[k]),
                                   atol=2e-5)
