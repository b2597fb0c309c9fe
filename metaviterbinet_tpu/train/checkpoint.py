"""Checkpointing keyed by (snr, gamma) with the reference's naming scheme
(reference trainer.py:507-532: snr_{snr}_gamma_{gamma}.pt; ours .msgpack).

The payload mirrors the reference artifact shape {model_state_dict,
optimizer_state_dict, loss} (trainer.py:507-511): params + loss + optimizer
state. Like the reference (trainer.py:526-528 restores the model only),
evaluation paths restore params alone; `load_opt_state` exists for
resume-mid-train fidelity.

Train-on-miss semantics live in the Trainer (switch to the synthetic channel,
train, switch back).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import yaml
from flax import serialization


def ckpt_path(weights_dir: str, snr: float, gamma: float) -> str:
    return os.path.join(weights_dir, f"snr_{snr}_gamma_{gamma}.msgpack")


def save_config_provenance(weights_dir: str, cfg: Any) -> str:
    """Write the RESOLVED config into the weights dir so every checkpoint
    directory is self-describing (the reference copies its config.yaml there,
    trainer.py:132). Written once; an existing file is left untouched so the
    provenance reflects the config that produced the first checkpoint."""
    os.makedirs(weights_dir, exist_ok=True)
    path = os.path.join(weights_dir, "config.yaml")
    if not os.path.isfile(path):
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
    return path


def save_params(weights_dir: str, snr: float, gamma: float, params: Any,
                loss: float = 0.0, opt_state: Any = None) -> str:
    os.makedirs(weights_dir, exist_ok=True)
    path = ckpt_path(weights_dir, snr, gamma)
    payload = {"params": serialization.to_state_dict(params), "loss": loss}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(opt_state)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def _restore(weights_dir: str, snr: float, gamma: float) -> Optional[dict]:
    path = ckpt_path(weights_dir, snr, gamma)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params(weights_dir: str, snr: float, gamma: float,
                template: Any) -> Optional[Any]:
    """Returns params restored into the template's pytree structure, or None."""
    raw = _restore(weights_dir, snr, gamma)
    if raw is None:
        return None
    return serialization.from_state_dict(template, raw["params"])


def load_opt_state(weights_dir: str, snr: float, gamma: float,
                   template: Any) -> Optional[Any]:
    """Restore the optimizer state (e.g. Adam moments) into `template`
    (typically `optimizer.init(params)`). Returns None when the checkpoint
    is missing or predates opt-state payloads."""
    raw = _restore(weights_dir, snr, gamma)
    if raw is None or "opt_state" not in raw:
        return None
    return serialization.from_state_dict(template, raw["opt_state"])
