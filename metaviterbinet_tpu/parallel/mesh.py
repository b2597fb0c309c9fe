"""Device mesh construction: single-host, and multi-host over ICI + DCN.

The reference has no parallelism of any kind (SURVEY.md §2 parallelism
statement); these are new first-class components (N3-N5). Two mesh axes make
sense for this workload:
  - 'dp': data parallel over independent transmission blocks (words axis);
  - 'sp': sequence parallel over the symbol/time axis of a single long
    stream (block-parallel Viterbi with boundary warm-up, overlap-save).

Multi-host layout: independent transmission blocks need no cross-word
communication, so 'dp' spans the HOSTS axis (its only collective is the
psum-of-grads in training — one small pytree per step, fine over DCN), while
'sp' spans each host's local chips (its per-step ppermute boundary exchange
is latency-sensitive and rides ICI). `make_multihost_mesh` builds exactly
that (hosts, chips_per_host) mesh; collectives ride the right fabric because
XLA maps the mesh's minor axis onto the slice's ICI topology
(jax-ml.github.io/scaling-book recipe: pick the mesh, annotate shardings,
let XLA insert collectives).
"""
from __future__ import annotations

import os
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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-process entry: call once per host BEFORE any other jax use.

    On Cloud TPU pods all arguments auto-detect from the metadata server /
    environment; on other clusters pass them explicitly (one coordinator,
    ranks 0..num_processes-1). Safe to call when already initialized or in a
    deliberately single-process run (both are no-ops).
    """
    if num_processes in (None, 1) and coordinator_address is None \
            and jax.process_count() == 1 \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # plain single-process run: nothing to initialize
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def make_multihost_mesh(chips_per_host: Optional[int] = None,
                        axis_names: Sequence[str] = ("dp", "sp")) -> Mesh:
    """(hosts, chips_per_host) mesh: axis 0 spans processes — collectives on
    it cross DCN — and axis 1 spans each host's local chips (ICI).

    Multi-process runs take the topology from the runtime (device order is
    host-major via `create_hybrid_device_mesh`, so mesh rows == hosts).
    Single-process runs emulate an (n_devices / chips_per_host,
    chips_per_host) hosts x chips grid — the shape the driver's
    `dryrun_multichip` validates on virtual CPU devices.
    """
    devices = jax.devices()
    n_proc = jax.process_count()
    if n_proc > 1:
        from jax.experimental import mesh_utils

        per = len(devices) // n_proc
        if chips_per_host is not None and chips_per_host != per:
            raise ValueError(
                f"chips_per_host={chips_per_host} but each of the {n_proc} "
                f"processes owns {per} devices")
        # process_is_granule: the outer ('hosts') axis groups by PROCESS.
        # The default groups by slice_index, which is the same for every
        # host of a single TPU slice (and for all multi-process CPU devices)
        # — it would reject any single-slice multi-host run. Caught by the
        # real 2-process run in tests/test_multiprocess.py.
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per), dcn_mesh_shape=(n_proc, 1), devices=devices,
            process_is_granule=True)
    else:
        per = chips_per_host or len(devices)
        if len(devices) % per:
            raise ValueError(
                f"{len(devices)} devices do not split into hosts of {per}")
        arr = np.asarray(devices).reshape(len(devices) // per, per)
    return Mesh(arr, axis_names)
