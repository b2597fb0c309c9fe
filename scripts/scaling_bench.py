#!/usr/bin/env python
"""Scaling-efficiency benchmark: decode throughput vs mesh size.

Measures the two parallel axes of the framework on whatever devices exist:
  dp  — words-axis sharded ViterbiNet detection (embarrassingly parallel)
  sp  — sequence-parallel block Viterbi with ppermute boundary exchange

On a real pod slice this reports the BASELINE.json scaling target
(>= 85% efficiency at N >= 2 hosts); on a single host it can exercise the
mechanics with virtual devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py
    (virtual CPU devices share cores, so CPU "efficiency" is mechanics
     validation only, not a hardware scaling claim)

Prints one JSON line per mesh size.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # the axon plugin overrides JAX_PLATFORMS after import; re-assert the
    # user's choice so virtual-device CPU runs work as documented
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from metaviterbinet_tpu.models import va, viterbinet
    from metaviterbinet_tpu.parallel.decode import (
        sequence_parallel_decode, shard_words_decode,
    )
    from metaviterbinet_tpu.parallel.mesh import make_mesh

    n_total = jax.device_count()
    W, T, L = 4096, 136, 4
    rng = np.random.default_rng(0)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 2 ** L)
    y = jnp.asarray(rng.normal(size=(W, T)).astype(np.float32))
    h = jnp.asarray(np.tile(np.exp(-0.2 * np.arange(L)), (W, 1)).astype(np.float32))
    priors = va.branch_priors(y, h)

    def timed(fn, *args, iters=16):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # sync fence
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / iters

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    base_dp = base_sp = None
    for n in sizes:
        mesh_dp = make_mesh((n,), ("dp",))
        run_dp = shard_words_decode(mesh_dp, lambda p, yy, hh: viterbinet.detect(p, yy))
        t_dp = timed(run_dp, params, y, h)
        thr_dp = W * T / t_dp

        from metaviterbinet_tpu.config import Config
        mesh_sp = make_mesh((n,), ("sp",))
        run_sp = sequence_parallel_decode(mesh_sp, overlap=Config().decode_overlap)
        # T must divide by n for the shard; tile the batch time-wise
        T_sp = 128 * n
        pr = jnp.tile(priors[:, :128, :], (1, n, 1))
        t_sp = timed(run_sp, pr)
        thr_sp = W * T_sp / t_sp

        if base_dp is None:
            base_dp, base_sp = thr_dp, thr_sp  # single-device baselines
        print(json.dumps({
            "devices": n,
            "dp_symbols_per_s": round(thr_dp),
            "dp_efficiency": round(thr_dp / (base_dp * n), 3),
            "sp_symbols_per_s": round(thr_sp),
            "sp_efficiency": round(thr_sp / (base_sp * n), 3),
        }))


if __name__ == "__main__":
    main()
