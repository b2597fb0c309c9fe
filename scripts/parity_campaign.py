#!/usr/bin/env python
"""BER-parity campaign: run the PyTorch reference and this framework under
the same protocol and compare statistically.

Setup:
    cp -r /root/reference /tmp/ref_run && chmod -R u+w /tmp/ref_run
    mkdir -p /tmp/ref_run/results/weights

Orchestrator (default): runs a (detector x mode x seed) matrix, each cell in
its own subprocess (keeps torch / jax / RNG state isolated), and prints a
comparison table plus one JSON blob.

    python scripts/parity_campaign.py --detectors va vnet --modes joint online \
        --snr 10 --seeds 2

Worker (internal): one cell, one JSON line to --out.

    python scripts/parity_campaign.py --side ref --detector vnet --mode online \
        --snr 10 --seed 0 --out /tmp/x.json

Modes (all coded, nsym=2, 4-tap time_decay ISI AWGN, block 120):
    aggregated  eval_mode='aggregated', synthetic fading type 1
    joint       by_word on the type-2 test channel, no adaptation
                (plotter_main.py:24-45 'Joint' curves)
    online      + self_supervised=True, 200 SGD steps per confident block
                (plotter_main.py:48-69)
    meta        + online_meta=True, MAML every 5 subframes
                (plotter_main.py:72-93, the Meta-ViterbiNet/Meta-LSTM curves)

Statistical read: training is stochastic and RNG streams differ across
frameworks, so parity is judged on mean coded BER over data blocks with a
combined binomial + across-seed spread; qualitative ordering
(meta <= online <= joint, all >= full-CSI VA) is checked as well.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REF_RUN = "/tmp/ref_run"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = "/tmp/parity_campaign"

REF_TRAINERS = {
    "va": ("python_code.trainers.VA.va_trainer", "VATrainer"),
    "vnet": ("python_code.trainers.VNET.vnet_trainer", "VNETTrainer"),
    "meta_vnet": ("python_code.trainers.META_VNET.metavnet_trainer", "METAVNETTrainer"),
    "lstm": ("python_code.trainers.LSTM.lstm_trainer", "LSTMTrainer"),
    "meta_lstm": ("python_code.trainers.META_LSTM.meta_lstm_trainer", "MetaLSTMTrainer"),
}

# mode -> config overrides shared by both frameworks
MODE_KWARGS = {
    "aggregated": dict(eval_mode="aggregated", fading_taps_type=1),
    "joint": dict(eval_mode="by_word", fading_taps_type=2,
                  self_supervised=False, online_meta=False),
    "online": dict(eval_mode="by_word", fading_taps_type=2,
                   self_supervised=True, online_meta=False),
    "meta": dict(eval_mode="by_word", fading_taps_type=2,
                 self_supervised=True, online_meta=True,
                 weights_init="last_frame"),
}


def cell_kwargs(mode: str, snr: float, seed: int,
                channel: str = "time_decay") -> dict:
    kw = dict(MODE_KWARGS[mode])
    kw.update(
        use_ecc=True, n_symbols=2,
        val_SNR_start=snr, val_SNR_end=snr,
        train_SNR_start=snr, train_SNR_end=snr,
        val_frames=12,  # 300 blocks, the paper's eval horizon
        val_block_length=120, train_block_length=120,
        noise_seed=3450002 + 1000 * seed,
        word_seed=7860002 + 1000 * seed,
    )
    if channel == "cost2100":
        # plotter_main.py:124,137-138 protocol: measured taps, no extra
        # multiplicative fading on the val channel (train stays time_decay
        # type-1 via train-on-miss, trainer.py:195).
        kw.update(channel_coefficients="cost2100", fading_in_channel=False)
    return kw


def cell_name(detector: str, mode: str, snr: float, seed: int,
              channel: str) -> str:
    # time_decay keeps the round-1 name so cached cells stay valid
    tag = "" if channel == "time_decay" else f"_{channel}"
    return f"{detector}_{mode}{tag}_{snr}_{seed}"


def run_reference(detector: str, mode: str, snr: float, seed: int,
                  channel: str) -> dict:
    sys.path.insert(0, REF_RUN)
    import contextlib
    import importlib
    import shutil

    import numpy as np

    if channel == "cost2100":
        # the reference loader asks for combined_h_{i}.mat but the repo ships
        # h_{i}.mat (channel_estimation.py:28 quirk) — alias them in the copy
        cdir = os.path.join(REF_RUN, "resources", "cost2100_channel")
        for i in range(4):
            dst = os.path.join(cdir, f"combined_h_{i}.mat")
            if not os.path.isfile(dst):
                shutil.copyfile(os.path.join(cdir, f"h_{i}.mat"), dst)

    mod, cls = REF_TRAINERS[detector]
    trainer_cls = getattr(importlib.import_module(mod), cls)
    kw = cell_kwargs(mode, snr, seed, channel)
    kw["run_name"] = "parity_" + cell_name(detector, mode, snr, seed, channel)
    os.makedirs(os.path.join(REF_RUN, "results", "weights", kw["run_name"]),
                exist_ok=True)
    with open(os.devnull, "w") as devnull, contextlib.redirect_stdout(devnull):
        dec = trainer_cls(**kw)
        sers = np.asarray(dec.evaluate(), dtype=np.float64)
        data_idx = np.asarray(dec.data_indices)
    return summarize(sers, data_idx, mode)


def run_ours(detector: str, mode: str, snr: float, seed: int,
             channel: str) -> dict:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", os.environ.get("PARITY_PLATFORM", "cpu"))
    import numpy as np

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    kw = cell_kwargs(mode, snr, seed, channel)
    kw["run_name"] = "parity_" + cell_name(detector, mode, snr, seed, channel)
    cfg = Config(**kw)
    wdir = os.path.join("/tmp/ours_weights", kw["run_name"])
    t = Trainer(cfg, detector, weights_dir=wdir, verbose=False)
    sers = np.asarray(t.evaluate(), dtype=np.float64)
    data_idx = np.asarray(cfg.data_indices("val"))
    return summarize(sers, data_idx, mode)


def summarize(sers, data_idx, mode: str) -> dict:
    import numpy as np

    if mode == "aggregated":  # per-SNR vector of length 1
        return {"mean_data": float(np.mean(sers)), "n_blocks": int(len(sers))}
    return {
        "mean_all": float(np.mean(sers)),              # reference's 'Final ser'
        "mean_data": float(np.mean(sers[data_idx])),   # pilots excluded
        "n_blocks": int(len(sers)),
        "n_data": int(len(data_idx)),
        "tail_mean_data": float(np.mean(sers[data_idx[len(data_idx) // 2:]])),
    }


# --------------------------------------------------------------- orchestration
def spawn(side: str, detector: str, mode: str, snr: float, seed: int,
          channel: str):
    out = os.path.join(
        OUT_DIR, f"{side}_{cell_name(detector, mode, snr, seed, channel)}.json")
    if os.path.isfile(out):
        return None, out  # cached from an earlier invocation
    cmd = [sys.executable, os.path.abspath(__file__), "--side", side,
           "--detector", detector, "--mode", mode, "--snr", str(snr),
           "--seed", str(seed), "--channel", channel, "--out", out]
    env = dict(os.environ, OMP_NUM_THREADS="1", MKL_NUM_THREADS="1")
    log = open(out + ".log", "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)
    return proc, out


def orchestrate(args):
    import time

    os.makedirs(OUT_DIR, exist_ok=True)
    cells = [(side, d, m, args.snr, s)
             for d in args.detectors for m in args.modes
             for s in range(args.seeds) for side in args.sides]
    results: dict[str, dict] = {}
    running: list[tuple] = []
    queue = list(cells)

    def reap(block: bool):
        done = []
        for item in running:
            proc, side, d, m, s, out = item
            if proc.poll() is not None:
                done.append(item)
        if not done and block and running:
            time.sleep(2.0)
            return
        for item in done:
            running.remove(item)
            proc, side, d, m, s, out = item
            if proc.returncode != 0:
                print(f"FAILED {side} {d} {m} seed {s} (rc {proc.returncode}) "
                      f"— see {out}.log", flush=True)
                continue
            with open(out) as f:
                results[f"{side}_{d}_{m}_{s}"] = json.load(f)
            print(f"done {side} {d} {m} seed {s}", flush=True)

    while queue or running:
        while queue and len(running) < args.jobs:
            side, d, m, snr, s = queue.pop(0)
            if side == "ref" and not os.path.isdir(REF_RUN):
                raise SystemExit(f"reference copy missing: cp -r /root/reference {REF_RUN}")
            proc, out = spawn(side, d, m, snr, s, args.channel)
            if proc is None:  # cached
                with open(out) as f:
                    results[f"{side}_{d}_{m}_{s}"] = json.load(f)
            else:
                running.append((proc, side, d, m, s, out))
        reap(block=True)

    # ------------------------------------------------------------- comparison
    report = {}
    key = "mean_data"
    for d in args.detectors:
        for m in args.modes:
            refs = [results[f"ref_{d}_{m}_{s}"][key] for s in range(args.seeds)
                    if f"ref_{d}_{m}_{s}" in results]
            ours = [results[f"ours_{d}_{m}_{s}"][key] for s in range(args.seeds)
                    if f"ours_{d}_{m}_{s}" in results]
            if not refs or not ours:
                continue
            mr, mo = sum(refs) / len(refs), sum(ours) / len(ours)
            # binomial sigma on the mean over all data bits of all seeds
            n_bits = 288 * 120 * len(refs)
            sig_bin = math.sqrt(max(mr, 1e-9) * (1 - mr) / n_bits)
            # across-seed spread (training noise), pooled
            var_seed = 0.0
            if len(refs) > 1:
                var_seed += sum((x - mr) ** 2 for x in refs) / (len(refs) - 1) / len(refs)
            if len(ours) > 1:
                var_seed += sum((x - mo) ** 2 for x in ours) / (len(ours) - 1) / len(ours)
            sigma = math.sqrt(2 * sig_bin ** 2 + var_seed)
            z = abs(mo - mr) / sigma if sigma else float("inf")
            # symmetric test: a significant deviation is flagged in either
            # direction; "BETTER" (ours significantly lower) is still visible
            if z < 3:
                verdict = "PARITY"
            else:
                verdict = "BETTER" if mo < mr else "DIVERGENT"
            report[f"{d}_{m}"] = {
                "ref": refs, "ours": ours, "ref_mean": mr, "ours_mean": mo,
                "z": round(z, 2), "verdict": verdict,
            }
            print(f"{d:10s} {m:10s} ref {mr:.6f} ours {mo:.6f} z={z:5.2f} {verdict}")
    blob = os.path.join(OUT_DIR, "campaign_report.json")
    with open(blob, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    print(f"report -> {blob}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours"])
    ap.add_argument("--detector", type=str)
    ap.add_argument("--detectors", nargs="+",
                    default=["va", "vnet"],
                    choices=list(REF_TRAINERS))
    ap.add_argument("--mode", type=str)
    ap.add_argument("--modes", nargs="+", default=["joint", "online"],
                    choices=list(MODE_KWARGS))
    ap.add_argument("--snr", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--jobs", type=int, default=2)
    ap.add_argument("--channel", choices=["time_decay", "cost2100"],
                    default="time_decay")
    ap.add_argument("--sides", nargs="+", default=["ref", "ours"],
                    choices=["ref", "ours"])
    ap.add_argument("--out", type=str)
    args = ap.parse_args()

    if args.side:  # worker
        fn = run_reference if args.side == "ref" else run_ours
        res = fn(args.detector, args.mode, args.snr, args.seed, args.channel)
        with open(args.out, "w") as f:
            json.dump(res, f)
        print(json.dumps(res))
        return
    orchestrate(args)


if __name__ == "__main__":
    main()
