#!/usr/bin/env python
"""Capture the REFERENCE's lstm_joint training inputs for the transplant
bisection of the COST2100 11 dB divergence (VERDICT r4 item 1).

Records, from a faithful replay of the reference's train-on-miss run
(reference trainer.py:455-505 via load_weights :513-532, LSTM loss
lstm_trainer.py:30-40), everything its training consumes:

  - the fresh torch init state_dict (initialize_detector inside train());
  - the 25 minibatches of train words (tx [300,120] info bits, rx [300,136])
    exactly as ChannelModelDataset draws them — including the quirk that the
    dataset was built with the cell's fading_taps_type=2 and
    fading_in_decoder=True, so train words ARE type-2-faded (the
    load_weights flip to type 1 never reaches the pre-built dataset);
  - the per-word select_batch multinomial indices [25,300,32]
    (trainer.py:534-544 law: weights = arange(120), no replacement);
  - the 25 per-minibatch val batches used for best-checkpoint selection
    (single_eval_at_point draws fresh val words each call).

The heavy compute (LSTM forward/backward, eval forward) is stubbed out —
none of it consumes RNG (no dropout), so the captured streams are
law-identical to a real run's. Output: one .npz consumed by
scripts/transplant_replay_ours.py.

    python scripts/transplant_lstm_capture.py --snr 11 --seed 0 \
        --torch-seed 123 --out /tmp/transplant/ref_capture_s0.npz
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RUN = "/tmp/ref_run"
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REF_RUN)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--channel", default="cost2100")
    ap.add_argument("--torch-seed", type=int, default=123)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import numpy as np
    import torch

    from parity_campaign import cell_kwargs, cell_name

    torch.manual_seed(args.torch_seed)

    import shutil
    if args.channel == "cost2100":
        cdir = os.path.join(REF_RUN, "resources", "cost2100_channel")
        for i in range(4):
            dst = os.path.join(cdir, f"combined_h_{i}.mat")
            if not os.path.isfile(dst):
                shutil.copyfile(os.path.join(cdir, f"h_{i}.mat"), dst)

    from python_code.trainers.LSTM.lstm_trainer import LSTMTrainer
    from python_code.trainers.trainer import Trainer

    kw = cell_kwargs("joint", args.snr, args.seed, args.channel)
    kw["run_name"] = "transplant_" + cell_name(
        "lstm", "joint", args.snr, args.seed, args.channel)
    os.makedirs(os.path.join(REF_RUN, "results", "weights", kw["run_name"]),
                exist_ok=True)

    cap = {
        "train_tx": [], "train_rx": [], "sel_idx": [],
        "val_tx": [], "val_rx": [],
    }
    cur_sel = []  # per-minibatch accumulator of [300][32] index draws

    dec = LSTMTrainer(**kw)

    # ---- instrument: dataset draws -------------------------------------
    orig_getitem = type(dec.channel_dataset["train"]).__getitem__

    def capture_getitem(ds, snr_list, gamma):
        b, y = orig_getitem(ds, snr_list, gamma)
        dst = "train" if ds is dec.channel_dataset["train"] else "val"
        cap[f"{dst}_tx"].append(b.cpu().numpy().copy())
        cap[f"{dst}_rx"].append(y.cpu().numpy().copy())
        return b, y

    type(dec.channel_dataset["train"]).__getitem__ = capture_getitem

    # ---- instrument: init weights --------------------------------------
    init_sd = {}

    orig_init_det = dec.initialize_detector

    def capture_init():
        orig_init_det()
        for k, v in dec.detector.state_dict().items():
            init_sd[k] = v.cpu().numpy().copy()

    dec.initialize_detector = capture_init

    # ---- stub the compute, keep the RNG stream -------------------------
    # detector forward: real forward consumes no torch RNG (no dropout) and
    # its output never feeds RNG-consuming ops — replace with zeros.
    def stub_forward(self, y, phase, snr=None, gamma=None, count=None):
        return torch.zeros((1, y.shape[1], 2))

    type(dec.detector).forward = stub_forward

    # run_train_loop: the only RNG the real one consumes is select_batch's
    # multinomial (inside calc_loss) — draw it identically, record, skip
    # the backward/step.
    def stub_run_train_loop(self, soft_estimation, transmitted_words):
        rand_ind = torch.multinomial(
            torch.arange(transmitted_words.reshape(-1).shape[0]).float(),
            self.train_minibatch_size).long()
        cur_sel.append(rand_ind.numpy().copy())
        return 0.0

    Trainer.run_train_loop = stub_run_train_loop

    # single_eval_at_point: draw the val words (recorded via capture_getitem)
    # exactly as the real eval would, skip the detection.
    def stub_eval(self, snr, gamma):
        self.channel_dataset["val"].__getitem__([snr], gamma)
        cap["sel_idx"].append(np.stack(cur_sel))
        cur_sel.clear()
        return 1.0

    Trainer.single_eval_at_point = stub_eval

    dec.train()

    out = {
        "train_tx": np.stack(cap["train_tx"]),   # [25, 300, 120]
        "train_rx": np.stack(cap["train_rx"]),   # [25, 300, 136]
        "sel_idx": np.stack(cap["sel_idx"]),     # [25, 300, 32]
        "val_tx": np.stack(cap["val_tx"]),       # [25, 300, 120]
        "val_rx": np.stack(cap["val_rx"]),       # [25, 300, 136]
    }
    for k, v in init_sd.items():
        out[f"init__{k}"] = v
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print({k: tuple(v.shape) for k, v in out.items() if not k.startswith("init__")})
    print("init keys:", sorted(init_sd))
    print("saved ->", args.out)


if __name__ == "__main__":
    main()
