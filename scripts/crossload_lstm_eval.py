#!/usr/bin/env python
"""Cross-framework adjudication for the lstm_joint COST2100 11 dB cell:
load the REFERENCE-trained torch LSTM checkpoint (saved by the parity
campaign's train-on-miss run) into OUR detector's param pytree and run OUR
by-word joint eval. The torch nn.LSTM layout maps 1:1 onto our pytree
(same [4H, in] shapes, same i/f/g/o gate order — models/lstm.py).

If ref-weights-through-our-eval reproduces the reference's BER, the eval
machinery (dataset, windowing, argmax readout, RS decode, scoring) is
equivalent and any remaining gap at this cell is offline-training
stochasticity; if it does not, our eval path diverges. Either way the
result goes in resources/ as the adjudication record.

    python scripts/crossload_lstm_eval.py [--snr 11.0] [--seeds 0 1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def torch_to_pytree(pt_path: str):
    import numpy as np
    import torch

    sd = torch.load(pt_path, map_location="cpu")["model_state_dict"]
    params = {}
    for layer in range(2):
        for a, b in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                     ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
            params[f"{b}{layer}"] = np.asarray(
                sd[f"lstm.{a}_l{layer}"].numpy(), dtype=np.float32)
    params["w_fc"] = np.asarray(sd["fc.weight"].numpy(), dtype=np.float32)
    params["b_fc"] = np.asarray(sd["fc.bias"].numpy(), dtype=np.float32)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--channel", default="cost2100")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("PARITY_PLATFORM", "cpu"))
    import jax.numpy as jnp
    import numpy as np

    from parity_campaign import cell_kwargs, cell_name, summarize

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    out = {"what": (
        "reference-trained torch LSTM checkpoints evaluated through OUR "
        "by-word joint pipeline (scripts/crossload_lstm_eval.py)"),
        "cells": {}}
    for seed in args.seeds:
        name = cell_name("lstm", "joint", args.snr, seed, args.channel)
        pt = os.path.join("/tmp/ref_run/results/weights", f"parity_{name}",
                          f"snr_{args.snr}_gamma_0.2.pt")
        if not os.path.isfile(pt):
            print(f"missing ref checkpoint {pt}", file=sys.stderr)
            continue
        kw = cell_kwargs("joint", args.snr, seed, args.channel)
        kw["run_name"] = "crossload_" + name
        cfg = Config(**kw)
        t = Trainer(cfg, "lstm",
                    weights_dir=f"/tmp/ours_weights/crossload_{name}",
                    verbose=False)
        t.params = jax.tree.map(jnp.asarray, torch_to_pytree(pt))
        sers = t.eval_by_word(args.snr, cfg.gamma)
        cell = summarize(np.asarray(sers, dtype=np.float64),
                         np.asarray(cfg.data_indices("val")), "joint")
        ref_json = os.path.join("/tmp/parity_campaign", f"ref_{name}.json")
        if os.path.isfile(ref_json):
            cell["ref_own_eval_mean_data"] = json.load(
                open(ref_json))["mean_data"]
        out["cells"][name] = cell
        print(name, json.dumps(cell), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
