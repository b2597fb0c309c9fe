#!/usr/bin/env python
"""Render the ref-vs-ours flagship overlay figures (VERDICT r3 item 2).

One BER-vs-SNR figure per channel: the regenerated ours sweep
(resources/sweep_{channel}.json, the seven curves of the reference's
headline figure, plotter_main.py:143-149 / plotter_utils.py:107-140)
drawn as lines, with every harvested reference parity point
(resources/reference_baselines.json r3/r4_parity_matrix) overlaid as an
open marker with error bars spanning the across-seed spread.

Outputs docs/figures/parity_overlay_{cost2100,time_decay}.png and prints
a compact markdown table (ref mean vs ours mean per compared cell) for
the README.

Run anywhere (CPU, no jax needed):
    python scripts/render_parity_overlay.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RES = os.path.join(REPO, "resources")
OUT_DIR = os.path.join(REPO, "docs", "figures")

# (det, mode) -> curve name in sweep_{channel}.json (reference display order)
CURVE_OF = {
    ("va", "joint"): "Viterbi - Full CSI",
    ("vnet", "joint"): "Joint ViterbiNet",
    ("lstm", "joint"): "JointRNN",
    ("vnet", "online"): "ViterbiNet",
    ("lstm", "online"): "LSTM",
    ("meta_vnet", "meta"): "OnlineMetaViterbiNet",
    ("meta_lstm", "meta"): "OnlineRNN",
}
# curve name -> style key in plotters/style.py (reference plotter_utils.py:14-44)
STYLE_KEY = {
    "Viterbi - Full CSI": "Viterbi",
    "Joint ViterbiNet": "Joint",
    "JointRNN": "JointRNN",
    "ViterbiNet": "ViterbiNet",
    "LSTM": "LSTM",
    "OnlineMetaViterbiNet": "OnlineMetaViterbiNet",
    "OnlineRNN": "OnlineRNN",
}


def load_cells() -> dict:
    """Merge r3 + r4 + r5 parity matrices (later rounds win at overlapping
    cells — r5 cells are re-runs at HEAD): {(det,mode,channel,snr): point}."""
    with open(os.path.join(RES, "reference_baselines.json")) as f:
        base = json.load(f)
    merged = {}
    for mat in ("r3_parity_matrix", "r4_parity_matrix", "r5_parity_matrix"):
        for name, cell in base.get(mat, {}).get("cells", {}).items():
            ch = cell["channel"]
            det_mode = name[: -len(f"_{ch}")] if name.endswith(f"_{ch}") else name
            det, mode = det_mode.rsplit("_", 1)
            for snr, pt in cell["points"].items():
                # r4 supersedes r3 at the same cell (it has >= the seeds)
                merged[(det, mode, ch, float(snr))] = pt
    return merged


def render(channel: str, cells: dict) -> list:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from metaviterbinet_tpu.plotters.style import (
        COLORS, DISPLAY_NAMES, LINESTYLES, MARKERS, apply_style)

    with open(os.path.join(RES, f"sweep_{channel}.json")) as f:
        sweep = json.load(f)
    snrs = np.asarray(sweep["snrs_db"], dtype=float)

    apply_style()
    plt.figure()
    rows = []
    for (det, mode), curve in CURVE_OF.items():
        key = STYLE_KEY[curve]
        vals = np.asarray(sweep["mean_coded_ber"][curve], dtype=float)
        plt.plot(snrs, np.maximum(vals, 1e-5), label=DISPLAY_NAMES[key],
                 color=COLORS[key], marker=MARKERS[key],
                 linestyle=LINESTYLES[key], linewidth=2.2, markersize=9)
        for (d, m, ch, snr), pt in sorted(cells.items()):
            if (d, m) != (det, mode) or ch != channel or "ref" not in pt:
                continue
            ref = np.asarray(pt["ref"], dtype=float)
            mean = float(np.mean(ref))
            lo, hi = mean - float(np.min(ref)), float(np.max(ref)) - mean
            plt.errorbar([snr], [max(mean, 1e-5)],
                         yerr=[[lo], [hi]], color=COLORS[key],
                         marker="s", markersize=13, markerfacecolor="none",
                         markeredgewidth=2.4, capsize=6, elinewidth=2,
                         linestyle="none", zorder=5)
            ours = np.asarray(pt["ours"], dtype=float)
            om = float(np.mean(ours))
            olo, ohi = om - float(np.min(ours)), float(np.max(ours)) - om
            plt.errorbar([snr + 0.12], [max(om, 1e-5)],
                         yerr=[[olo], [ohi]], color=COLORS[key],
                         marker="^", markersize=9, capsize=4,
                         elinewidth=1.4, linestyle="none", zorder=5)
            rows.append((channel, DISPLAY_NAMES[key], snr, mean, len(ref),
                         om, len(ours), pt.get("verdict", "")))
    plt.yscale("log")
    plt.xlabel("SNR [dB]")
    plt.ylabel("Coded BER")
    title = {"cost2100": "COST2100", "time_decay": "Synthetic (time decay)"}
    plt.title(f"{title[channel]} — ours sweep (lines), reference seeds "
              "(squares), ours parity seeds (triangles)", fontsize=15)
    plt.legend(loc="lower left", prop={"size": 13}, ncol=2)
    plt.grid(True, which="both", alpha=0.25)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"parity_overlay_{channel}.png")
    plt.savefig(path, dpi=130)
    plt.close()
    print("wrote", path)
    return rows


def main():
    cells = load_cells()
    n_ref = sum(1 for pt in cells.values() if "ref" in pt)
    print(f"{len(cells)} harvested cells, {n_ref} with reference sides")
    rows = []
    for ch in ("cost2100", "time_decay"):
        rows += render(ch, cells)
    # compact README table
    print("\n| Channel | Curve | SNR | Ref BER (seeds) | Ours BER (seeds) | Verdict |")
    print("|---|---|---|---|---|---|")
    for ch, name, snr, rm, rn, om, on, v in rows:
        print(f"| {ch} | {name} | {snr:g} | {rm:.4f} ({rn}) "
              f"| {om:.4f} ({on}) | {v} |")


if __name__ == "__main__":
    main()
