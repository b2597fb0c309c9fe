#!/usr/bin/env python
"""Fold completed parity-matrix cells (/tmp/parity_campaign/{ref,ours}_*.json,
written by the run_r{2,3,4}_* runner scripts) into
resources/reference_baselines.json under "r4_parity_matrix" (additive:
r3_parity_matrix is left intact — its cell cache is gone, so the committed
section is the only record of those 25 compared cells).

Cells are keyed (detector, mode, channel, snr); each side holds a seed->BER
map. Where both sides exist the same combined binomial + across-seed z test
as scripts/parity_campaign.py is applied (symmetric: |z|>=3 flags deviation
in either direction; significantly-lower-ours is labeled BETTER, not PARITY).
Cells with ours runs but no ref cell file are joined against the round-1
reference values archived in "by_word_campaign_snr10" when the protocol
matches (10 dB, time_decay) — those pairs carry ref_source AND are counted
separately from the headline same-round pairs (the archived side comes from
a different campaign era, so the pairing is statistically weaker). Safe to
re-run as more cells land — it rewrites the whole section from the cell
files each time.

    python scripts/harvest_parity_matrix.py [--dir /tmp/parity_campaign]
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINES = os.path.join(REPO, "resources", "reference_baselines.json")

# ours_meta_lstm_meta_cost2100_11.0_0.json / ref_vnet_joint_8.0_1.json
CELL_RE = re.compile(
    r"^(ref|ours)_(va|vnet|meta_vnet|lstm|meta_lstm)_"
    r"(aggregated|joint|online|meta)(?:_(cost2100))?_([0-9.]+)_(\d+)\.json$")


def collect(cell_dir: str) -> dict:
    cells: dict[tuple, dict] = {}
    for path in sorted(glob.glob(os.path.join(cell_dir, "*.json"))):
        m = CELL_RE.match(os.path.basename(path))
        if not m:
            continue
        side, det, mode, ch, snr, seed = m.groups()
        with open(path) as f:
            try:
                blob = json.load(f)
            except json.JSONDecodeError:
                continue  # cell still being written
        if "mean_data" not in blob:
            continue
        key = (det, mode, ch or "time_decay", float(snr))
        cells.setdefault(key, {"ref": {}, "ours": {}})
        cells[key][side][int(seed)] = blob["mean_data"]
    return cells


def z_verdict(refs: list[float], ours: list[float], n_blocks: int = 288,
              block_bits: int = 120) -> dict:
    mr, mo = sum(refs) / len(refs), sum(ours) / len(ours)
    n_bits = n_blocks * block_bits * len(refs)
    sig_bin = math.sqrt(max(mr, 1e-9) * (1 - mr) / n_bits)
    var_seed = 0.0
    if len(refs) > 1:
        var_seed += sum((x - mr) ** 2 for x in refs) / (len(refs) - 1) / len(refs)
    if len(ours) > 1:
        var_seed += sum((x - mo) ** 2 for x in ours) / (len(ours) - 1) / len(ours)
    sigma = math.sqrt(2 * sig_bin ** 2 + var_seed)
    z = abs(mo - mr) / sigma if sigma else float("inf")
    verdict = "PARITY" if z < 3 else ("BETTER" if mo < mr else "DIVERGENT")
    return {"ref_mean": round(mr, 6), "ours_mean": round(mo, 6),
            "z": round(z, 2), "verdict": verdict}


# (det, mode) -> curve key in the round-1 "by_word_campaign_snr10" archive;
# that campaign ran the same by-word protocol at 10 dB on time_decay, so its
# ref values are valid join partners for ours-only 10 dB cells.
R1_SNR10_KEYS = {
    ("va", "joint"): "va_joint",
    ("vnet", "joint"): "vnet_joint",
    ("vnet", "online"): "vnet_online",
    ("lstm", "joint"): "lstm_joint",
    ("lstm", "online"): "lstm_online",
    ("meta_vnet", "meta"): "meta_vnet",
    ("meta_lstm", "meta"): "meta_lstm",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/parity_campaign")
    args = ap.parse_args()

    with open(BASELINES) as f:
        base = json.load(f)
    r1_snr10 = base.get("by_word_campaign_snr10", {}).get("mean_data_ber", {})

    cells = collect(args.dir)
    section: dict[str, dict] = {}
    n_pairs = 0
    n_joined = 0
    for (det, mode, ch, snr), sides in sorted(cells.items()):
        name = f"{det}_{mode}" + ("" if ch == "time_decay" else f"_{ch}")
        entry = section.setdefault(name, {"channel": ch, "points": {}})
        pt: dict = {}
        for side in ("ref", "ours"):
            if sides[side]:
                pt[side] = [sides[side][s] for s in sorted(sides[side])]
        joined = False
        if sides["ours"] and not sides["ref"] and ch == "time_decay" \
                and snr == 10.0 and (det, mode) in R1_SNR10_KEYS:
            r1 = [x for x in r1_snr10.get(R1_SNR10_KEYS[det, mode], {})
                  .get("ref", []) if x is not None]
            if r1:
                pt["ref"] = r1
                pt["ref_source"] = "by_word_campaign_snr10 (round-1 archive)"
                joined = True
        if pt.get("ref") and pt.get("ours"):
            pt.update(z_verdict(pt["ref"], pt["ours"]))
            if joined:
                n_joined += 1  # cross-era join: provenance-tagged, not headline
            else:
                n_pairs += 1
        entry["points"][str(snr)] = pt

    # r3_parity_matrix stays: its 25 compared cells were run from a /tmp cell
    # cache that no longer exists, so the committed section is their only
    # record. r4 is purely additive (new cells this round); consumers
    # (render_parity_overlay) merge both, r4 winning at overlapping keys.
    base["r4_parity_matrix"] = {
        "description": (
            "Round-4 parity matrix — NEW cells this round, extending "
            "r3_parity_matrix (VERDICT r3 items 1/3/7): COST2100 anchors for "
            "the three previously-unpaired flagship curves (vnet_joint, "
            "lstm_joint, lstm_online), meta_lstm time_decay band edges "
            "8/14 dB, and the 7 dB band edge for va/vnet_online/meta_vnet: "
            "full by-word protocol (300 blocks, nsym=2, type-2 test "
            "channel / COST2100 measured taps, train-on-miss on the type-1 "
            "synthetic channel), reference (torch CPU) vs this framework, "
            "per-seed mean coded BER on data blocks. z: combined binomial + "
            "across-seed sigma, symmetric 3-sigma test "
            "(scripts/harvest_parity_matrix.py). Headline pair counts use "
            "same-round runs only; pairs joined against the round-1 archive "
            "carry ref_source and are tallied separately."),
        "cells": section,
        "n_pairs_same_round": n_pairs,
        "n_pairs_joined_r1_archive": n_joined,
    }
    with open(BASELINES, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")

    done_ref = sum(len(v["ref"]) for v in cells.values())
    done_ours = sum(len(v["ours"]) for v in cells.values())
    print(f"harvested {len(cells)} (det,mode,ch,snr) cells "
          f"({done_ref} ref runs, {done_ours} ours runs, {n_pairs} compared "
          f"same-round + {n_joined} joined-vs-r1-archive)")
    for name, entry in section.items():
        for snr, pt in entry["points"].items():
            if "verdict" in pt:
                print(f"  {name:28s} {snr:>5s} dB ref {pt['ref_mean']:.6f} "
                      f"ours {pt['ours_mean']:.6f} z={pt['z']:5.2f} {pt['verdict']}")


if __name__ == "__main__":
    main()
