"""Device mesh construction.

The reference has no parallelism of any kind (SURVEY.md §2 parallelism
statement); these are new first-class components (N3-N5). Two mesh axes make
sense for this workload:
  - 'dp': data parallel over independent transmission blocks (words axis);
  - 'sp': sequence parallel over the symbol/time axis of a single long
    stream (block-parallel Viterbi with boundary warm-up, overlap-save).
Collectives ride ICI via XLA (`psum`, `ppermute`) inside `shard_map`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("dp", "sp")) -> Mesh:
    """Build a mesh over all (or the first prod(shape)) devices.

    shape None -> all devices on one 'dp' axis.
    """
    devices = np.asarray(jax.devices())
    if shape is None:
        return Mesh(devices, ("dp",))
    n = int(np.prod(shape))
    if n > devices.size:
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {devices.size}")
    return Mesh(devices[:n].reshape(shape), axis_names[: len(shape)])
