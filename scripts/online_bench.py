#!/usr/bin/env python
"""Online-adaptation engine benchmark: the paper's by-word workload on TPU.

Two measurements:
  1. single-stream latency — the full 300-block online self-supervised eval
     (detect -> RS decode -> confidence gate -> RS re-encode -> buffer ->
     200 Adam steps per confident block) as one fused on-device program;
  2. multi-stream serving throughput — N independent receiver streams, each
     with its own adapting parameters, run concurrently via `jax.vmap` over
     the same engine. The reference architecture (host-side Python loop with
     two GPU<->CPU crossings per block, trainer.py:267-354) cannot express
     this at all.

Prints one JSON line per measurement.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/online_bench.py \
        [--streams 64] [--detector vnet] [--mode online|meta]

`--mode meta --detector meta_lstm` times the crown-jewel workload: the full
by-word Meta-LSTM protocol (MAML every 5 subframes + 200 SGD steps per
confident block, second-order grads through the LSTM scan, nested in the
300-block scan). The reference runs this as a host-side loop in 4h20m on CPU
(resources/reference_baselines.json notes); here it is one fused program.
Reports compile seconds and steady-state s/eval separately — compile is a
one-off (persistent-cache-able), steady-state is the serving number.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=None,
                    help="multi-stream width (default: 64 for online mode; "
                         "meta mode skips multi-stream unless given — the "
                         "vmapped MAML engines are memory-hungry)")
    ap.add_argument("--detector", default="vnet")
    ap.add_argument("--mode", default="online", choices=["online", "meta"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=None,
                    help="steady-state repeats (default: 4 online, 2 meta)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.data.dataset import ChannelDataset
    from metaviterbinet_tpu.detectors import DETECTORS
    from metaviterbinet_tpu.online.engine import make_online_engine
    from metaviterbinet_tpu.ops.channel import estimate_channel_batch
    from metaviterbinet_tpu.train.losses import make_loss_fn

    meta = args.mode == "meta"
    cfg = Config(use_ecc=True, n_symbols=2, val_frames=12, eval_mode="by_word",
                 fading_taps_type=2, self_supervised=True,
                 online_meta=meta)
    spec = DETECTORS[args.detector]
    loss_fn = make_loss_fn(spec.score, spec.label_kind, cfg.memory_length,
                           spec.subsample_loss, cfg.train_minibatch_size)
    engine = make_online_engine(cfg, spec.detect, loss_fn,
                                init_fn=lambda k: spec.init(k, cfg))
    n_words = cfg.n_words("val")
    tx, rx = ChannelDataset(cfg, "val").get(10.0, cfg.gamma)
    h = estimate_channel_batch(cfg.memory_length, cfg.gamma, jnp.arange(n_words),
                               fading=cfg.fading_in_channel, fading_taps_type=2)
    params = spec.init(jax.random.PRNGKey(0), cfg)

    def fence(x):
        return float(jnp.sum(x))

    # ---- 1. single stream ---------------------------------------------------
    run1 = lambda p, k: engine(p, tx, rx, h, k)
    tc = time.perf_counter()
    fence(run1(params, jax.random.PRNGKey(1)).ser_by_word)  # compile + 1 run
    compile_s = time.perf_counter() - tc
    t0 = time.perf_counter()
    iters = args.iters or (2 if args.mode == "meta" else 4)
    for i in range(iters):
        out = run1(params, jax.random.PRNGKey(i))
    fence(out.ser_by_word)
    dt1 = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"{args.mode}_adaptation_single_stream_s",
        "detector": args.detector,
        "value": round(dt1, 4), "unit": "s / 300-block eval",
        "compile_plus_first_run_s": round(compile_s, 1),
        "blocks_per_s": round(n_words / dt1, 1),
    }))
    if args.mode == "meta" and args.streams is None:
        return  # the MAML engine's serving number is the single-stream one

    # ---- 2. N concurrent streams (per-stream adapting params) ---------------
    N = args.streams or 64
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    pstack = jax.vmap(lambda k: spec.init(k, cfg))(keys)
    # each stream sees its own noise realization: vary rx by reusing the
    # dataset at different seeds is host-side; for throughput purposes reuse
    # the same observations with per-stream params + rng keys
    runN = jax.jit(jax.vmap(lambda p, k: engine(p, tx, rx, h, k).ser_by_word))
    fence(runN(pstack, keys))  # compile
    t0 = time.perf_counter()
    for i in range(2):
        out = runN(pstack, keys)
    fence(out)
    dtN = (time.perf_counter() - t0) / 2
    print(json.dumps({
        "metric": f"{args.mode}_adaptation_multi_stream",
        "streams": N,
        "value": round(dtN, 4), "unit": "s / 300-block eval x N streams",
        "aggregate_blocks_per_s": round(N * n_words / dtN, 1),
        "scaling_vs_single": round(dt1 * N / dtN, 2),
    }))


if __name__ == "__main__":
    main()
