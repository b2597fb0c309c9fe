#!/usr/bin/env python
"""Diagnose the OnlineRNN (meta_lstm) 11 dB COST2100 outlier (VERDICT r1
item 2): the seven-curve sweep recorded mean coded BER 0.195 at 11 dB vs
0.028-0.083 at neighboring SNRs, and the round-2 parity rerun reproduced it
at a second seed (0.165) — so it is systematic, not a seed fluke.

Dumps the per-block SER trajectory of the full by-word meta protocol to show
WHERE the run degrades (sudden adaptation divergence vs gradual drift), and
re-runs the same cell with opt-in global-norm gradient clipping
(Config.clip_grad_norm, off by default to match the reference) to test the
LSTM-adaptation-blow-up hypothesis.

Run ON THE CHIP (the meta_lstm engine takes >40 min to compile on CPU XLA):

    PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
        python scripts/diagnose_meta_lstm_outlier.py --out /tmp/diag.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(seed: int, snr: float, clip: float) -> dict:
    import numpy as np

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    cfg = Config(
        eval_mode="by_word", fading_taps_type=2, self_supervised=True,
        online_meta=True, weights_init="last_frame",
        use_ecc=True, n_symbols=2, val_frames=12,
        val_SNR_start=snr, val_SNR_end=snr,
        train_SNR_start=snr, train_SNR_end=snr,
        val_block_length=120, train_block_length=120,
        noise_seed=3450002 + 1000 * seed, word_seed=7860002 + 1000 * seed,
        channel_coefficients="cost2100", fading_in_channel=False,
        clip_grad_norm=clip,
    )
    wdir = f"/tmp/diag_meta_lstm_weights_s{seed}"  # shared across variants:
    # train-on-miss happens once, both variants adapt from the same init
    t = Trainer(cfg, "meta_lstm", weights_dir=wdir, verbose=False)
    sers = np.asarray(t.evaluate(), dtype=np.float64)
    di = np.asarray(cfg.data_indices("val"))
    d = sers[di]
    return {
        "seed": seed, "snr": snr, "clip_grad_norm": clip,
        "mean_data": float(d.mean()),
        "quarter_means": [float(d[i * 72:(i + 1) * 72].mean()) for i in range(4)],
        "first_bad_block": int(di[np.argmax(d > 0.2)]) if (d > 0.2).any() else -1,
        "frac_blocks_over_0.1": float((d > 0.1).mean()),
        "ser_by_block": [round(float(x), 5) for x in sers],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/diag_meta_lstm.json")
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    results = []
    for seed in range(args.seeds):
        for clip in (0.0, 1.0):
            r = run_cell(seed, args.snr, clip)
            results.append(r)
            print(json.dumps({k: v for k, v in r.items()
                              if k != "ser_by_block"}), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
