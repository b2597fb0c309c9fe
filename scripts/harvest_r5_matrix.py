#!/usr/bin/env python
"""Fold round-5 parity cells into resources/reference_baselines.json as
"r5_parity_matrix" (additive over r3/r4 — their committed sections remain
the only record of those rounds' cell caches).

Round-5 cell sources:
  - ours side: /tmp/parity_r5/ours_*.json — re-runs at HEAD (corrected
    train-on-miss law, LSTM split-scan default) from run_r5_tpu_queue.sh +
    run_r5_refresh_queue.sh;
  - ref side: /tmp/parity_campaign/ref_*.json — NEW reference seeds this
    round (the meta_lstm band-edge/10 dB second seeds, VERDICT r4 item 2),
    MERGED with the committed r4/r3 reference values for the same cell
    (identical protocol and reference code; the reference side has no law
    or code change this round, so cross-round ref seeds are the same
    distribution). Each point records where its ref values came from.

The z test is the campaign's combined binomial + across-seed formula
(scripts/harvest_parity_matrix.py::z_verdict). Safe to re-run as cells
land.

    python scripts/harvest_r5_matrix.py [--ours-dir /tmp/parity_r5]
        [--ref-dir /tmp/parity_campaign]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
BASELINES = os.path.join(REPO, "resources", "reference_baselines.json")

from harvest_parity_matrix import CELL_RE, z_verdict


def collect(cell_dir: str, side_want: str) -> dict:
    cells: dict[tuple, dict] = {}
    for path in sorted(glob.glob(os.path.join(cell_dir, "*.json"))):
        m = CELL_RE.match(os.path.basename(path))
        if not m:
            continue
        side, det, mode, ch, snr, seed = m.groups()
        if side != side_want:
            continue
        with open(path) as f:
            try:
                blob = json.load(f)
            except json.JSONDecodeError:
                continue
        if "mean_data" not in blob:
            continue
        key = (det, mode, ch or "time_decay", float(snr))
        cells.setdefault(key, {})[int(seed)] = blob["mean_data"]
    return cells


def committed_ref(base: dict, det: str, mode: str, ch: str, snr: float):
    """Reference values for this cell from the committed r4 (preferred,
    newest same-round pairs) else r3 matrix."""
    name = f"{det}_{mode}" + ("" if ch == "time_decay" else f"_{ch}")
    for mk in ("r4_parity_matrix", "r3_parity_matrix"):
        pt = base.get(mk, {}).get("cells", {}).get(name, {}) \
                 .get("points", {}).get(str(snr), {})
        if pt.get("ref"):
            return list(pt["ref"]), mk
    return [], None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours-dir", default="/tmp/parity_r5")
    ap.add_argument("--ref-dir", default="/tmp/parity_campaign")
    args = ap.parse_args()

    with open(BASELINES) as f:
        base = json.load(f)

    ours_cells = collect(args.ours_dir, "ours")
    new_ref_cells = collect(args.ref_dir, "ref")

    section: dict[str, dict] = {}
    n_pairs = 0
    keys = sorted(set(ours_cells) | set(new_ref_cells))
    for key in keys:
        det, mode, ch, snr = key
        name = f"{det}_{mode}" + ("" if ch == "time_decay" else f"_{ch}")
        entry = section.setdefault(name, {"channel": ch, "points": {}})
        pt: dict = {}
        ours = ours_cells.get(key, {})
        if ours:
            pt["ours"] = [ours[s] for s in sorted(ours)]
        refs, src = committed_ref(base, det, mode, ch, snr)
        sources = [src] if refs else []
        new_refs = new_ref_cells.get(key, {})
        if new_refs:
            refs = refs + [new_refs[s] for s in sorted(new_refs)]
            sources.append("same-round (/tmp/parity_campaign)")
        if refs:
            pt["ref"] = refs
            pt["ref_source"] = " + ".join(sources)
        if not ours and new_refs:
            # new ref seeds without an r5 ours re-run: pair against the
            # committed ours values (r4 census etc.), provenance-tagged
            for mk in ("r4_parity_matrix", "r3_parity_matrix"):
                prev = base.get(mk, {}).get("cells", {}).get(name, {}) \
                           .get("points", {}).get(str(snr), {})
                if prev.get("ours"):
                    pt["ours"] = list(prev["ours"])
                    pt["ours_source"] = mk
                    break
        if pt.get("ref") and pt.get("ours"):
            pt.update(z_verdict(pt["ref"], pt["ours"]))
            n_pairs += 1
        entry["points"][str(snr)] = pt

    base["r5_parity_matrix"] = {
        "description": (
            "Round-5 parity matrix: ours cells re-run at HEAD under (1) the "
            "corrected train-on-miss law — the reference's fading-type flip "
            "is a functional no-op, so training keeps the configured type "
            "(SURVEY.md quirk ledger, commit 81ddcb2) — and (2) the LSTM "
            "split-scan recurrence (models/lstm.py). Reference side: "
            "committed r3/r4 values (same protocol and reference code — no "
            "reference-side change this round) merged with the new round-5 "
            "reference seeds that close every n=1 reference cell "
            "(meta_lstm 8/10/14 dB). Cells NOT re-run here remain valid in "
            "r3/r4 under the old ours law (35/36 were PARITY under it; the "
            "law fix moves ours TOWARD the reference's effective behavior). "
            "z: combined binomial + across-seed sigma, symmetric 3-sigma "
            "(scripts/harvest_r5_matrix.py)."),
        "cells": section,
        "n_pairs": n_pairs,
    }
    with open(BASELINES, "w") as f:
        json.dump(base, f, indent=1)
        f.write("\n")

    print(f"harvested {len(keys)} cells, {n_pairs} compared pairs")
    worst = None
    for name, entry in sorted(section.items()):
        for snr, pt in sorted(entry["points"].items(), key=lambda kv: float(kv[0])):
            if "verdict" in pt:
                print(f"  {name:28s} {snr:>5s} dB ref {pt['ref_mean']:.6f} "
                      f"(n={len(pt['ref'])}) ours {pt['ours_mean']:.6f} "
                      f"(n={len(pt['ours'])}) z={pt['z']:5.2f} {pt['verdict']}")
                if worst is None or pt["z"] > worst[1]:
                    worst = (f"{name}@{snr}", pt["z"])
    if worst:
        print(f"worst cell: {worst[0]} z={worst[1]:.2f}")


if __name__ == "__main__":
    main()
