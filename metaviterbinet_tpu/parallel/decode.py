"""Distributed Viterbi decoding: words-axis sharding and block-parallel
sequence decode with boundary warm-up (overlap-save).

N3/N4 of the component inventory (SURVEY.md §2b) — no reference counterpart;
the reference decodes strictly sequentially in T on one device
(va_detector.py:91-97).

Sequence parallelism exploits the trellis forgetting property: Viterbi path
metrics forget their initial condition after ~5·L symbols (the standard
truncation/overlap-save argument, cf. PAPERS.md block-based GPU Viterbi
decoders). Each device decodes its T/n_sp chunk prefixed by `overlap` symbols
of its left neighbor's tail (received via `lax.ppermute` over ICI), starting
from uniform metrics; the warm-up bits are discarded. Device 0 warm-s up on
zero branch metrics, which keep the metrics exactly uniform — identical to
starting fresh at the true stream head.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metaviterbinet_tpu.ops.trellis import viterbi_decode, viterbi_decode_with_metrics


def shard_words_decode(mesh: Mesh, detect_fn, via_shard_map: bool = False):
    """Data-parallel detection: shard the words axis over the 'dp' mesh axis.

    detect_fn(params, y, h) -> bits; params replicated, y/h words-sharded.
    Independent transmission blocks are embarrassingly parallel — XLA needs
    no collectives, just the sharding annotations.

    via_shard_map=True runs detect_fn per-shard under `jax.shard_map` instead
    of GSPMD-partitioning its body — required when detect_fn contains a
    `pallas_call` (Pallas kernels don't partition under bare GSPMD; inside
    shard_map each device sees only its local words block).
    """
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("dp"))
    n_dp = mesh.shape["dp"]

    if via_shard_map:
        # check_vma=False: pallas_call's output avals carry no varying-mesh
        # annotation, which the default vma check rejects
        run_sharded = jax.jit(jax.shard_map(
            detect_fn, mesh=mesh,
            in_specs=(P(), P("dp"), P("dp")), out_specs=P("dp"),
            check_vma=False,
        ))
    else:
        @functools.partial(
            jax.jit,
            in_shardings=(repl, rows, rows),
            out_shardings=rows,
        )
        def run_sharded(params, y, h):
            return detect_fn(params, y, h)

    def run(params, y, h):
        # pad the words axis to a dp multiple (sharded dims must divide)
        W = y.shape[0]
        Wp = -(-W // n_dp) * n_dp
        if Wp != W:
            y = jnp.concatenate([y, jnp.tile(y[-1:], (Wp - W, 1))])
            h = jnp.concatenate([h, jnp.tile(h[-1:], (Wp - W, 1))])
        return run_sharded(params, y, h)[:W]

    return run


def sequence_parallel_decode(mesh: Mesh, overlap: int,
                             words_axis: str | None = None):
    """Block-parallel greedy Viterbi over the time axis.

    Returns run(priors [W, T, S]) -> bits [W, T], with T sharded over the
    'sp' mesh axis. Exact equality with sequential decode holds when
    `overlap` exceeds the trellis forgetting depth (enforced statistically by
    tests; use >= 8·memory_length in production).

    words_axis: optionally also shard the words axis over another mesh axis
    (e.g. 'dp') for 2D hosts x chips parallelism — words across hosts (no
    communication), time across each host's ICI chips (the ppermute boundary
    exchange stays intra-host).
    """

    def local_decode(priors):
        # priors: [W, T_loc, S] local shard
        n_sp = jax.lax.axis_size("sp")
        idx = jax.lax.axis_index("sp")
        tail = priors[:, -overlap:, :]
        # left neighbor's tail (device i receives from i-1); device 0 receives
        # junk from device n-1 and masks it to zero branch metrics, which keep
        # path metrics uniform through its warm-up — a fresh start.
        prev_tail = jax.lax.ppermute(
            tail, "sp", [(i, (i + 1) % n_sp) for i in range(n_sp)]
        )
        prev_tail = jnp.where(idx == 0, jnp.zeros_like(prev_tail), prev_tail)
        ext = jnp.concatenate([prev_tail, priors], axis=1)
        # derive the zero initial metrics from the sharded input so the scan
        # carry has the same device-varying type as the scanned values
        zero0 = jnp.zeros_like(ext[:, 0, :])
        bits, _ = viterbi_decode_with_metrics(ext, zero0)
        return bits[:, overlap:]

    @jax.jit
    def run(priors):
        return jax.shard_map(
            local_decode, mesh=mesh,
            in_specs=P(words_axis, "sp", None), out_specs=P(words_axis, "sp"),
        )(priors)

    return run


def chunked_decode_reference(priors: jnp.ndarray, n_chunks: int, overlap: int):
    """Single-device emulation of the block-parallel decode (for testing and
    for batching long streams through the kernel without a mesh): reshape the
    time axis into chunks with overlap warm-up and decode all chunks as a
    batch — the same math the sharded version distributes."""
    W, T, S = priors.shape
    Tc = T // n_chunks
    chunks = priors.reshape(W, n_chunks, Tc, S)
    warm = jnp.concatenate(
        [jnp.zeros((W, 1, overlap, S), priors.dtype),
         chunks[:, :-1, -overlap:, :]], axis=1
    )
    ext = jnp.concatenate([warm, chunks], axis=2)  # [W, C, overlap+Tc, S]
    flat = ext.reshape(W * n_chunks, overlap + Tc, S)
    bits = viterbi_decode(flat)[:, overlap:]
    return bits.reshape(W, n_chunks * Tc)
