"""SER-curve result cache (parity with reference plotter_utils.get_ser_plot,
plotter_utils.py:47-65): each method's SER vector is pkl-memoized per
method+params key so sweeps resume for free; `run_over=True` recomputes."""
from __future__ import annotations

import os
import pickle

import numpy as np

from metaviterbinet_tpu.paths import PLOTS_DIR


def save_pkl(path: str, obj):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pkl(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def get_ser_curve(trainer, run_over: bool, method_name: str) -> np.ndarray:
    os.makedirs(PLOTS_DIR, exist_ok=True)
    file_name = "_".join([method_name, str(trainer.cfg.channel_type)])
    plots_path = os.path.join(PLOTS_DIR, file_name + ".pkl")
    if os.path.isfile(plots_path) and not run_over:
        return np.asarray(load_pkl(plots_path))
    ser = np.asarray(trainer.evaluate())
    save_pkl(plots_path, ser)
    return ser
