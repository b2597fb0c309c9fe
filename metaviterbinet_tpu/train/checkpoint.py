"""Checkpointing keyed by (snr, gamma) with the reference's naming scheme
(reference trainer.py:507-532: snr_{snr}_gamma_{gamma}.pt; ours .msgpack).

Train-on-miss semantics live in the Trainer (switch to the synthetic channel,
train, switch back).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def ckpt_path(weights_dir: str, snr: float, gamma: float) -> str:
    return os.path.join(weights_dir, f"snr_{snr}_gamma_{gamma}.msgpack")


def save_params(weights_dir: str, snr: float, gamma: float, params: Any,
                loss: float = 0.0) -> str:
    os.makedirs(weights_dir, exist_ok=True)
    path = ckpt_path(weights_dir, snr, gamma)
    payload = {"params": params, "loss": loss}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return path


def load_params(weights_dir: str, snr: float, gamma: float,
                template: Any) -> Optional[Any]:
    """Returns params restored into the template's pytree structure, or None."""
    path = ckpt_path(weights_dir, snr, gamma)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        payload = serialization.from_bytes({"params": template, "loss": 0.0}, f.read())
    return jax.tree_util.tree_map(lambda x: x, payload["params"])
