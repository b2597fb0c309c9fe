#!/usr/bin/env python
"""Profile + attack the LSTM-family online engines (VERDICT r4 items 3/4).

Round 4 recorded lstm_online at 7.40 s/eval and meta_lstm at 20.6 s/eval
with NO breakdown and no optimization attempt. Two flaws are fixed here:

1. **Breakdown by ablation.** The same engine harness is compiled at three
   plan levels — detect-only (joint), +self-supervised SGD, +MAML — so the
   deltas attribute wall time to (detect + RS tail) vs (200-step Adam loop)
   vs (MAML outer). Ablation beats timers-in-the-loop: the engine is ONE
   fused scan program, so internal timers would break fusion.

2. **Honest gating.** online_bench.py timed the engine with RANDOM initial
   params: detection sits at chance, `ser <= ser_thresh` almost never
   passes, and the `lax.cond`-guarded adaptation body is mostly SKIPPED —
   the r4 numbers underestimate the adaptation share. Here the engine runs
   with a TRAINED checkpoint (the r5 parity cells', --ckpt) under the
   paper's thresh, AND with ser_thresh=1.0 (adapt every block) as the
   worst-case serving bound.

Levers measured (models/lstm.py knobs):
  - SPLIT_SCAN: hoisted input projections (2 serial matmuls/step, not 4)
  - SCAN_UNROLL: lax.scan unroll of the recurrence
  - --dtype bfloat16: bf16 recurrence via detectors.with_compute_dtype

Usage (chip, serialized — see CLAUDE.md):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/lstm_engine_profile.py \
        --detector lstm --ckpt /tmp/ours_weights/parity_lstm_joint_cost2100_11.0_0.r5a \
        [--mode online|meta] [--quick]

Prints one JSON line per measurement; fold results into
resources/online_engine_bench.json (lstm_profile section).
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
    ap.add_argument("--detector", default="lstm",
                    choices=["lstm", "meta_lstm", "vnet", "meta_vnet"])
    ap.add_argument("--mode", default=None, choices=[None, "online", "meta"])
    ap.add_argument("--ckpt", default=None,
                    help="weights dir holding snr_11.0_gamma_0.2.msgpack")
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="skip the lever matrix, run breakdown only")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.data.dataset import ChannelDataset
    from metaviterbinet_tpu.detectors import DETECTORS, with_compute_dtype
    from metaviterbinet_tpu.models import lstm as lstm_mod
    from metaviterbinet_tpu.online.engine import make_online_engine
    from metaviterbinet_tpu.ops.channel import estimate_channel_batch
    from metaviterbinet_tpu.train.losses import make_loss_fn

    mode = args.mode or (
        "meta" if args.detector.startswith("meta_") else "online")

    def build(self_supervised, online_meta, thresh, dtype="float32"):
        cfg = Config(use_ecc=True, n_symbols=2, val_frames=12,
                     eval_mode="by_word", fading_taps_type=2,
                     self_supervised=self_supervised, online_meta=online_meta,
                     ser_thresh=thresh, weights_init="last_frame",
                     dtype=dtype)
        spec = with_compute_dtype(DETECTORS[args.detector], dtype)
        loss_fn = make_loss_fn(spec.score, spec.label_kind, cfg.memory_length,
                               spec.subsample_loss, cfg.train_minibatch_size)
        engine = make_online_engine(cfg, spec.detect, loss_fn,
                                    init_fn=lambda k: spec.init(k, cfg))
        return cfg, spec, engine

    cfg0, spec0, _ = build(False, False, 0.02)
    n_words = cfg0.n_words("val")
    tx, rx = ChannelDataset(cfg0, "val").get(args.snr, cfg0.gamma)
    h = estimate_channel_batch(cfg0.memory_length, cfg0.gamma,
                               jnp.arange(n_words),
                               fading=cfg0.fading_in_channel,
                               fading_taps_type=2)
    params = spec0.init(jax.random.PRNGKey(0), cfg0)
    params_src = "random_init"
    if args.ckpt:
        from metaviterbinet_tpu.train.checkpoint import load_params
        loaded = load_params(args.ckpt, args.snr, cfg0.gamma, params)
        if loaded is not None:
            params, params_src = loaded, f"trained ({args.ckpt})"
        else:
            print(f"WARNING: no ckpt in {args.ckpt}; random init", file=sys.stderr)

    def fence(x):
        return float(jnp.sum(x))

    def time_engine(engine, tag, extra=None):
        t0 = time.perf_counter()
        out = engine(params, tx, rx, h, jax.random.PRNGKey(1))
        mean_ser = fence(out.ser_by_word) / n_words
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = engine(params, tx, rx, h, jax.random.PRNGKey(i))
        fence(out.ser_by_word)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"metric": "lstm_engine_profile", "variant": tag,
               "detector": args.detector, "params": params_src,
               "steady_s_per_eval": round(dt, 4),
               "compile_plus_first_s": round(compile_s, 1),
               "mean_ser": round(mean_ser, 6),
               "split_scan": lstm_mod.SPLIT_SCAN,
               "scan_unroll": lstm_mod.SCAN_UNROLL}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return dt

    # ---- 1. breakdown by plan ablation (shipping knobs) ---------------------
    results = {}
    plans = [("detect_only", (False, False, 0.02)),
             ("detect_plus_sgd", (True, False, 0.02))]
    if mode == "meta":
        plans.append(("full_meta", (True, True, 0.02)))
        plans.append(("full_meta_adapt_every_block", (True, True, 1.0)))
    else:
        plans.append(("detect_plus_sgd_every_block", (True, False, 1.0)))
    for tag, (ss, om, th) in plans:
        _, _, engine = build(ss, om, th)
        results[tag] = time_engine(engine, tag, {"ser_thresh": th})

    if "detect_plus_sgd" in results:
        print(json.dumps({
            "metric": "lstm_engine_breakdown",
            "detect_plus_rs_tail_s": round(results["detect_only"], 4),
            "sgd_share_s_at_protocol_gate": round(
                results["detect_plus_sgd"] - results["detect_only"], 4),
            "maml_share_s_at_protocol_gate": round(
                results.get("full_meta", 0) - results["detect_plus_sgd"], 4)
            if mode == "meta" else None,
        }), flush=True)

    if args.quick or args.detector in ("vnet", "meta_vnet"):
        return  # the scan-structure/bf16 levers are LSTM-specific

    # ---- 2. lever matrix on the protocol engine -----------------------------
    ss, om, th = (True, mode == "meta", 0.02)
    for split, unroll in [(False, 1), (True, 1), (True, 4), (True, 8)]:
        lstm_mod.SPLIT_SCAN = split
        lstm_mod.SCAN_UNROLL = unroll
        _, _, engine = build(ss, om, th)
        time_engine(engine, f"lever_split={split}_unroll={unroll}")
    lstm_mod.SPLIT_SCAN = True
    lstm_mod.SCAN_UNROLL = 1

    # bf16 recurrence (f32 loss/logits): serving-accuracy tradeoff measured
    # via mean_ser on the same words
    _, _, engine = build(ss, om, th, dtype="bfloat16")
    time_engine(engine, "lever_bf16_recurrence")


if __name__ == "__main__":
    main()
