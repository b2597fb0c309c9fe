#!/usr/bin/env python
"""Headline benchmark: decoded symbols/sec/chip for ViterbiNet detection
(neural branch metrics + 16-state ACS, L=4 trellis).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "symbols/s", "vs_baseline": N}

`vs_baseline` is the speedup over the CPU reference implementation: a
torch float32 re-measurement of the reference's evaluation inner loop
(vnet_detector.py:35-61 — batched MLP priors, then a per-symbol Python loop
of gather-based add-compare-select over the word batch), run on this
machine's CPU and cached in resources/baseline_cpu.json. The reference
repo publishes no numbers (BASELINE.md), so the baseline is self-generated
per BASELINE.json's protocol.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_CACHE = os.path.join(REPO, "resources", "baseline_cpu.json")

# reference evaluation geometry: 300-word batches of 136-symbol codewords
REF_WORDS, T, L = 300, 136, 4
N_STATES = 2 ** L
# TPU-side batch: many independent blocks in flight (the words axis is the
# throughput axis; BASELINE.json's >=10x/chip target is at this granularity).
# The fused Pallas kernel keeps all MLP activations in VMEM (HBM traffic is
# just y in + bits out), so throughput keeps climbing with batch width.
TPU_WORDS = 65536


def measure_cpu_reference() -> float:
    """Reference-equivalent torch CPU decode throughput (symbols/s)."""
    import torch

    torch.manual_seed(0)
    net = torch.nn.Sequential(
        torch.nn.Linear(1, 100), torch.nn.Sigmoid(),
        torch.nn.Linear(100, 50), torch.nn.ReLU(),
        torch.nn.Linear(50, N_STATES),
    )
    s = torch.arange(N_STATES)
    transition_table = torch.cat([(2 * s) % N_STATES, (2 * s + 1) % N_STATES]).reshape(
        2, N_STATES).T  # [n_states, 2] predecessor states
    y = torch.randn(REF_WORDS, T)

    def run():
        with torch.no_grad():
            priors = -net(y.reshape(-1, 1)).reshape(REF_WORDS, T, N_STATES)
            in_prob = torch.zeros(REF_WORDS, N_STATES)
            out = torch.zeros(REF_WORDS, T)
            for i in range(T):
                out[:, i] = torch.argmin(in_prob, dim=1) % 2
                trellis = (in_prob + priors[:, i])[:, transition_table]
                in_prob, _ = torch.min(trellis, dim=2)
            return out

    run()  # warm-up
    n_iters, t0 = 3, time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters
    return REF_WORDS * T / dt


def get_cpu_baseline() -> float:
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["symbols_per_sec"]
    value = measure_cpu_reference()
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"symbols_per_sec": value,
                   "what": "torch CPU reference-equivalent ViterbiNet decode "
                           f"({REF_WORDS} words x {T} symbols, L={L})"}, f)
    return value


REPEATS, ITERS_PER_REPEAT = 5, 16


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect
    from metaviterbinet_tpu.models import viterbinet

    params = viterbinet.init_params(jax.random.PRNGKey(0), N_STATES)
    rng = np.random.default_rng(0)
    ys = [jnp.asarray(rng.normal(size=(TPU_WORDS, T)).astype(np.float32))
          for _ in range(2)]

    # NOTE: jax.block_until_ready does not reliably block under the axon
    # remote backend; force completion by pulling a scalar reduction to the
    # host (device execution is in-order, so the last result arriving
    # implies the whole chain ran).
    # The fused metric+ACS Pallas kernel is bit-identical to the scan path
    # (tests/test_kernels.py) and ~4x faster at wide batches.
    detect = jax.jit(lambda p, y: jnp.sum(fused_viterbinet_detect(p, y)))
    float(detect(params, ys[0]))  # compile + sync

    def once() -> float:
        t0 = time.perf_counter()
        for i in range(ITERS_PER_REPEAT):
            out = detect(params, ys[i % len(ys)])
        float(out)  # host pull = sync fence
        return TPU_WORDS * T * ITERS_PER_REPEAT / (time.perf_counter() - t0)

    # The axon tunnel adds run-to-run dispatch jitter at ms kernel sizes
    # (round-2 measurements of the SAME kernel/width moved 1.42 vs 1.75 B
    # sym/s between sessions). Headline = MEDIAN over repeats; best and
    # spread are reported alongside so numbers from different sessions can
    # be reconciled instead of silently disagreeing.
    vals = sorted(once() for _ in range(REPEATS))
    median = vals[len(vals) // 2]
    spread = (vals[-1] - vals[0]) / median if median else 0.0
    return {"median": median, "best": vals[-1], "worst": vals[0],
            "spread_pct": round(100 * spread, 1)}


def measure_e2e_eval() -> dict:
    """Protocol-level end-to-end aggregated eval on the chip: generate the
    300-word val batch, detect (auto Pallas dispatch), RS-decode (backend-
    dependent: fused on-device jax codec on TPU, native C++ host batch codec
    on CPU — the 'includes' field records which), score non-pilot words — the
    production `Trainer.single_eval_at_point` path, full-CSI VA detector
    (matching the reference_runtime va_eval_1000_words_coded_s = 0.65 s CPU
    figure)."""
    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    cfg = Config(use_ecc=True, n_symbols=2, val_block_length=120,
                 val_frames=12, eval_mode="aggregated",
                 val_SNR_start=10.0, val_SNR_end=10.0)
    t = Trainer(cfg, "va", weights_dir="/tmp/bench_e2e_weights", verbose=False)
    t.single_eval_at_point(t.params, 10.0, cfg.gamma)  # warm-up / compile
    words = cfg.n_words("val")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        t.single_eval_at_point(t.params, 10.0, cfg.gamma)
    per_1000 = (time.perf_counter() - t0) / reps / words * 1000.0
    ref = 0.65  # resources/reference_baselines.json: reference_runtime
    import jax

    decode = ("on-device-RS-decode" if jax.default_backend() == "tpu"
              else "native-host-RS-decode")

    # The production aggregated protocol is a multi-SNR sweep
    # (trainer.py:243-252 loops gamma_eval over the val range). Ours fuses
    # datagen+CSI+detect+decode+scoring for ALL points into ONE dispatch
    # (Trainer.sweep_eval_fused), amortizing the tunnel RTT that dominates
    # the single-point figure. Reference cost is linear in points, so the
    # per-1000-words comparison against the same 0.65 s figure is fair.
    sweep_cfg = Config(use_ecc=True, n_symbols=2, val_block_length=120,
                       val_frames=12, eval_mode="aggregated",
                       val_SNR_start=7.0, val_SNR_end=12.0)
    ts = Trainer(sweep_cfg, "va", weights_dir="/tmp/bench_e2e_weights",
                 verbose=False)
    snrs = [float(s) for s in sweep_cfg.snr_range("val")]
    none_params = tuple(None for _ in snrs)
    ts.sweep_eval_fused(snrs, none_params)  # warm-up / compile
    sweep_words = words * len(snrs)
    t0 = time.perf_counter()
    for _ in range(reps):
        ts.sweep_eval_fused(snrs, none_params)
    sweep_per_1000 = (time.perf_counter() - t0) / reps / sweep_words * 1000.0

    return {"seconds_per_1000_words": round(per_1000, 4),
            "vs_reference_cpu": round(ref / per_1000, 1),
            "includes": f"datagen+detect+{decode}+scoring",
            "words_per_eval": words, "repeats": reps,
            "sweep": {
                "seconds_per_1000_words": round(sweep_per_1000, 4),
                "vs_reference_cpu": round(ref / sweep_per_1000, 1),
                "snr_points": len(snrs), "words_per_sweep": sweep_words,
                "dispatches": 1, "repeats": reps,
            }}


def main():
    baseline = get_cpu_baseline()
    # the axon tunnel serves ONE client at a time: a straggling background
    # job (e.g. a parity-campaign cell) makes the backend raise
    # FAILED_PRECONDITION — wait and retry rather than report a bogus run
    last_err = None
    for attempt in range(5):
        try:
            stats = measure_tpu()
            e2e = measure_e2e_eval()
            break
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            last_err = e
            time.sleep(60)
    else:
        raise last_err
    print(json.dumps({
        "metric": "viterbinet_decoded_symbols_per_sec_per_chip",
        "value": round(stats["median"], 1),
        "unit": "symbols/s",
        "vs_baseline": round(stats["median"] / baseline, 2),
        "best": round(stats["best"], 1),
        "worst": round(stats["worst"], 1),
        "spread_pct": stats["spread_pct"],
        "methodology": {
            "stat": "median over repeats (best/worst alongside)",
            "repeats": REPEATS,
            "dispatches_per_sync": ITERS_PER_REPEAT,
            "batch_words": TPU_WORDS,
            "sync": "scalar host pull (block_until_ready unreliable on axon)",
        },
        "e2e_eval": e2e,
    }))


if __name__ == "__main__":
    main()
