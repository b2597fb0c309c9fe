#!/usr/bin/env python
"""BER-parity campaign: run the PyTorch reference and this framework under
the same protocol and compare statistically.

Usage:
    cp -r /root/reference /tmp/ref_run && chmod -R u+w /tmp/ref_run
    python scripts/parity_campaign.py [--snrs 10 13] [--frames 40]

The reference repo is never modified in place; results land in
resources/reference_baselines.json territory (update by hand after review).
Statistical read: with n data bits and BER p, sigma = sqrt(p(1-p)/n); call
parity when |ours - ref| < 3 sigma.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

REF_RUN = "/tmp/ref_run"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_reference(snr: float, frames: int, use_ecc: bool) -> float:
    sys.path.insert(0, REF_RUN)
    import numpy as np
    from python_code.trainers.VA.va_trainer import VATrainer

    dec = VATrainer(val_SNR_start=snr, val_SNR_end=snr, eval_mode="aggregated",
                    fading_taps_type=1, use_ecc=use_ecc, val_frames=frames)
    return float(np.mean(dec.evaluate()))


def run_ours(snr: float, frames: int, use_ecc: bool) -> float:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    cfg = Config(use_ecc=use_ecc, val_frames=frames, val_SNR_start=snr,
                 val_SNR_end=snr, fading_taps_type=1)
    t = Trainer(cfg, "va", verbose=False)
    return t.single_eval_at_point(None, snr, cfg.gamma)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snrs", type=float, nargs="+", default=[10.0, 13.0])
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--uncoded", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(REF_RUN):
        raise SystemExit(f"reference copy missing: cp -r /root/reference {REF_RUN}")

    use_ecc = not args.uncoded
    results = {}
    for snr in args.snrs:
        ref = run_reference(snr, args.frames, use_ecc)
        ours = run_ours(snr, args.frames, use_ecc)
        n_bits = args.frames * 24 * 120  # data words only
        sigma = math.sqrt(max(ref, 1e-9) * (1 - ref) / n_bits)
        z = abs(ours - ref) / sigma if sigma else float("inf")
        results[snr] = {"ref": ref, "ours": ours, "z_sigma": round(z, 2),
                        "parity": bool(z < 3)}
        print(f"SNR {snr}: ref {ref:.6f} ours {ours:.6f} z={z:.2f} "
              f"{'PARITY' if z < 3 else 'DIVERGENT'}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
