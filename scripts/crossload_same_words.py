#!/usr/bin/env python
"""Same-words cross-load probe: feed BOTH frameworks' eval paths the SAME
received words and the SAME weights, and count bit-level disagreement.

The round-4 cross-load probe (scripts/crossload_lstm_eval.py) evaluated the
reference's checkpoints through our pipeline on independently-drawn noise
realizations, so "eval machinery equivalent" rested on statistically-close
BER (0.0365 vs 0.0400). This probe removes the noise realization from the
comparison: one val batch is generated once (our dataset, the lstm_joint
COST2100 11 dB protocol), one set of weights is transplanted into the
reference's torch module (ours jnp pytree -> torch state_dict; same layout,
same gate order), and both frameworks' full eval tails run on those exact
words:

    detector forward 'val'  -> hard bits          (ref lstm_detector.py:24-59
                                                    / vnet_detector.py:35-63)
    RS decode per word      -> info bits          (ref rs_main.py:21-37)
    mean coded BER on data indices                (ref trainer.py:222-241)

Every stage is compared elementwise. Residual detected-bit flips can come
only from f32 numerics (torch oneDNN vs XLA matmul orders) at near-tie
logits — the probe quantifies exactly that, turning round-4's "close" into
"identical or not" (VERDICT r4 item 5).

Usage (CPU, ~2 min):  python scripts/crossload_same_words.py \
        [--ckpt /tmp/ours_weights/parity_lstm_joint_cost2100_11.0_0] \
        [--out resources/crossload_same_words.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RUN = "/tmp/ref_run"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

from parity_campaign import cell_kwargs

from metaviterbinet_tpu.config import Config
from metaviterbinet_tpu.data.dataset import ChannelDataset
from metaviterbinet_tpu.detectors import DETECTORS
from metaviterbinet_tpu.ecc.rs import rs_decode_bits
from metaviterbinet_tpu.models import lstm as lstm_model
from metaviterbinet_tpu.models import viterbinet as vnet_model


def ref_modules():
    sys.path.insert(0, REF_RUN)
    from python_code.detectors.LSTM.lstm_detector import LSTMDetector
    from python_code.detectors.VNET.vnet_detector import VNETDetector
    from python_code.ecc.rs_main import decode as ref_rs_decode
    return LSTMDetector, VNETDetector, ref_rs_decode


def lstm_state_dict(params) -> dict:
    """Ours param pytree -> torch nn.LSTM/Linear state_dict (same [4H, in]
    layout, same torch i/f/g/o gate order — models/lstm.py:57-68)."""
    sd = {}
    for layer in range(lstm_model.NUM_LAYERS):
        sd[f"lstm.weight_ih_l{layer}"] = torch.from_numpy(np.asarray(params[f"w_ih{layer}"]))
        sd[f"lstm.weight_hh_l{layer}"] = torch.from_numpy(np.asarray(params[f"w_hh{layer}"]))
        sd[f"lstm.bias_ih_l{layer}"] = torch.from_numpy(np.asarray(params[f"b_ih{layer}"]))
        sd[f"lstm.bias_hh_l{layer}"] = torch.from_numpy(np.asarray(params[f"b_hh{layer}"]))
    sd["fc.weight"] = torch.from_numpy(np.asarray(params["w_fc"]))
    sd["fc.bias"] = torch.from_numpy(np.asarray(params["b_fc"]))
    return sd


def vnet_state_dict(params) -> dict:
    """Ours param pytree -> the reference's nn.Sequential(0: 1->100, 2:
    100->50, 4: 50->n_states) state_dict (vnet_detector.py:27-33)."""
    return {
        "net.0.weight": torch.from_numpy(np.asarray(params["w1"])),
        "net.0.bias": torch.from_numpy(np.asarray(params["b1"])),
        "net.2.weight": torch.from_numpy(np.asarray(params["w2"])),
        "net.2.bias": torch.from_numpy(np.asarray(params["b2"])),
        "net.4.weight": torch.from_numpy(np.asarray(params["w3"])),
        "net.4.bias": torch.from_numpy(np.asarray(params["b3"])),
    }


def eval_tails(name, detected_ref, detected_ours, tx, data_idx, nsym,
               ref_rs_decode):
    """Compare the two eval tails stage by stage on this batch."""
    n_sym_total = detected_ref.size
    det_mismatch = int(np.sum(detected_ref != detected_ours))

    dec_ref = np.stack([np.asarray(ref_rs_decode(w, nsym))
                        for w in detected_ref])
    dec_ours = np.asarray(rs_decode_bits(
        np.asarray(detected_ours, dtype=np.float32), nsym)[0])
    # cross-check the decoders on identical input where detections agree
    dec_ours_of_ref = np.asarray(rs_decode_bits(
        np.asarray(detected_ref, dtype=np.float32), nsym)[0])
    decoder_mismatch_same_input = int(np.sum(dec_ref != dec_ours_of_ref))

    ber_ref = float(np.mean(dec_ref[data_idx] != tx[data_idx]))
    ber_ours = float(np.mean(dec_ours[data_idx] != tx[data_idx]))
    out = {
        "n_words": int(detected_ref.shape[0]),
        "n_detected_symbols": int(n_sym_total),
        "detected_bit_mismatches": det_mismatch,
        "rs_decoder_mismatches_on_identical_input": decoder_mismatch_same_input,
        "decoded_bit_mismatches": int(np.sum(dec_ref != dec_ours)),
        "mean_data_ber_ref_tail": ber_ref,
        "mean_data_ber_ours_tail": ber_ours,
        "ber_identical": bool(ber_ref == ber_ours),
    }
    print(f"[{name}] detected flips {det_mismatch}/{n_sym_total}  "
          f"decoder-on-same-input flips {decoder_mismatch_same_input}  "
          f"BER ref-tail {ber_ref:.6f} ours-tail {ber_ours:.6f}  "
          f"identical={out['ber_identical']}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="ours weights dir with snr_11.0_gamma_0.2.msgpack "
                         "(random init when absent)")
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--out", default=os.path.join(
        REPO, "resources", "crossload_same_words.json"))
    args = ap.parse_args()

    LSTMDetector, VNETDetector, ref_rs_decode = ref_modules()

    kw = cell_kwargs("joint", args.snr, 0, "cost2100")
    kw.pop("run_name", None)
    cfg = Config(**kw)
    ds = ChannelDataset(cfg, "val")
    tx, rx = ds.get(args.snr, cfg.gamma)
    tx = np.asarray(tx)
    rx_np = np.asarray(rx, dtype=np.float32)
    data_idx = np.asarray(cfg.data_indices("val"))
    rx_t = torch.from_numpy(rx_np)

    report = {
        "description": __doc__.split("\n\n")[0],
        "protocol": {"channel": "cost2100", "snr": args.snr,
                     "n_words": int(tx.shape[0]),
                     "block_length": int(tx.shape[1]),
                     "nsym": cfg.n_symbols,
                     "batch_source": "ours ChannelDataset val, seed 0"},
        "weight_sets": {},
    }

    # ---- LSTM ----
    weight_sets = {"random_init": lstm_model.init_params(jax.random.PRNGKey(7))}
    if args.ckpt:
        from metaviterbinet_tpu.train.checkpoint import load_params
        trained = load_params(args.ckpt, args.snr, cfg.gamma,
                              lstm_model.init_params(jax.random.PRNGKey(0)))
        if trained is not None:
            weight_sets["trained_ours_ckpt"] = trained
        else:
            print(f"WARNING: no checkpoint under {args.ckpt}, "
                  "running random-init only")

    for tag, params in weight_sets.items():
        ref_det = LSTMDetector()
        ref_det.load_state_dict(lstm_state_dict(params))
        ref_det.eval()
        with torch.no_grad():
            det_ref = ref_det(rx_t, "val").numpy().astype(np.int64)
        det_ours = np.asarray(
            DETECTORS["lstm"].detect(params, rx, None)).astype(np.int64)
        report["weight_sets"][f"lstm_{tag}"] = eval_tails(
            f"lstm/{tag}", det_ref, det_ours, tx, data_idx, cfg.n_symbols,
            ref_rs_decode)

    # ---- ViterbiNet ----
    vparams = vnet_model.init_params(jax.random.PRNGKey(7), cfg.n_states)
    ref_vnet = VNETDetector(n_states=cfg.n_states,
                            transmission_lengths={"val": rx_np.shape[1]})
    ref_vnet.load_state_dict(vnet_state_dict(vparams), strict=False)
    ref_vnet.eval()
    with torch.no_grad():
        det_ref = ref_vnet(rx_t, "val").numpy().astype(np.int64)
    det_ours = np.asarray(
        DETECTORS["vnet"].detect(vparams, rx, None)).astype(np.int64)
    report["weight_sets"]["vnet_random_init"] = eval_tails(
        "vnet/random", det_ref, det_ours, tx, data_idx, cfg.n_symbols,
        ref_rs_decode)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
