#!/usr/bin/env python
"""One rank of a REAL multi-process JAX run (VERDICT r2 item 3).

Launched by tests/test_multiprocess.py as N subprocesses (CPU platform,
4 virtual devices per process). Exercises the code paths that single-process
tests and the driver's dryrun cannot reach:

  - the real `jax.distributed.initialize` call inside
    parallel/mesh.py::init_distributed (not the single-process no-op);
  - the `n_proc > 1` hybrid-mesh branch of make_multihost_mesh
    (`create_hybrid_device_mesh`, hosts-major row layout);
  - a psum crossing process boundaries;
  - the dp train step's grad-pmean over the hosts ('dp') axis, checked
    against a single-device full-batch step;
  - 2D (words x time) sequence-parallel decode equality vs sequential
    decode, each rank asserting its addressable output shards.

Usage: multiproc_worker.py <rank> <nproc> <port>   (exit 0 + "OK rank r")
"""
import os
import sys

RANK, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
DEV_PER_PROC = 4
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={DEV_PER_PROC} "
    + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from metaviterbinet_tpu.parallel.mesh import (  # noqa: E402
    init_distributed, make_multihost_mesh)


def global_array(mesh, spec, host_np):
    """Replicated host value -> global jax.Array with the given sharding."""
    return jax.make_array_from_callback(
        host_np.shape, NamedSharding(mesh, spec), lambda idx: host_np[idx])


def main():
    # ---- the REAL initialize path (mesh.py:59-64) ---------------------------
    init_distributed(coordinator_address=f"localhost:{PORT}",
                     num_processes=NPROC, process_id=RANK)
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * DEV_PER_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC

    # ---- the n_proc > 1 hybrid-mesh branch (mesh.py:80-89) ------------------
    mesh = make_multihost_mesh()
    assert dict(mesh.shape) == {"dp": NPROC, "sp": DEV_PER_PROC}, mesh.shape
    # hosts-major: row i of the mesh must hold exactly process i's devices
    for i in range(NPROC):
        procs = {d.process_index for d in mesh.devices[i]}
        assert procs == {i}, f"row {i} spans processes {procs}"

    # ---- a collective that actually crosses the process boundary ------------
    import jax.numpy as jnp

    total = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(jax.lax.psum(x, "dp"), "sp"),
        mesh=mesh, in_specs=P(), out_specs=P()))(jnp.float32(1.0))
    assert float(total) == NPROC * DEV_PER_PROC, float(total)

    # ---- dp train step: grad pmean over the hosts axis ----------------------
    import optax

    from metaviterbinet_tpu.models import viterbinet
    from metaviterbinet_tpu.parallel.training import make_dp_train_step
    from metaviterbinet_tpu.train.losses import make_loss_fn

    loss_fn = make_loss_fn(viterbinet.score, "states", 4, False, 8)
    opt = optax.sgd(0.1)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    rx = rng.normal(size=(16, 40)).astype(np.float32)
    tx = rng.integers(0, 2, size=(16, 40)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    # single-device full-batch reference, computed locally on every rank
    loss_ref, grads = jax.value_and_grad(loss_fn)(params, rx, tx, None)
    updates, _ = opt.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    repl = lambda leaf: global_array(mesh, P(), np.asarray(leaf))  # noqa: E731
    step = make_dp_train_step(mesh, loss_fn, opt)
    p_dp, _, loss_dp = step(
        jax.tree_util.tree_map(repl, params),
        jax.tree_util.tree_map(repl, opt_state),
        global_array(mesh, P("dp"), rx),
        global_array(mesh, P("dp"), tx),
        repl(key))
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # ---- 2D decode: words over hosts (DCN), time over local chips (ICI) -----
    from metaviterbinet_tpu.models import va
    from metaviterbinet_tpu.ops.channel import isi_awgn_transmit
    from metaviterbinet_tpu.ops.modulation import bpsk_modulate
    from metaviterbinet_tpu.ops.trellis import viterbi_decode
    from metaviterbinet_tpu.parallel.decode import sequence_parallel_decode

    W, T, L = 2 * NPROC, 64 * DEV_PER_PROC, 4
    bits = np.random.default_rng(7).integers(0, 2, (W, T)).astype(np.float32)
    h = np.tile(np.exp(-0.2 * np.arange(L)), (W, 1)).astype(np.float32)
    padded = np.concatenate([bits, np.zeros((W, L))], axis=1)
    y = isi_awgn_transmit(jnp.asarray(bpsk_modulate(padded)), jnp.asarray(h),
                          12.0, jax.random.PRNGKey(7), L)
    priors = np.asarray(va.branch_priors(y, jnp.asarray(h)))
    seq = np.asarray(viterbi_decode(jnp.asarray(priors)))

    run = sequence_parallel_decode(mesh, overlap=32, words_axis="dp")
    out = run(global_array(mesh, P("dp", "sp", None), priors))
    for shard in out.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), seq[shard.index])

    print(f"OK rank {RANK}", flush=True)


if __name__ == "__main__":
    main()
