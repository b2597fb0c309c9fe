#!/usr/bin/env python
"""Two-step ACS compaction benchmark (VERDICT r3 item 5): measure the
pair-composed (min,+) fused kernel against the plain and time-chunked
variants at the protocol's small eval widths, on the real chip.

two_step=True composes consecutive trellis steps into one routing matmul
(the viterbi_decode_lowlat algebra from ops/trellis.py:109-129 applied
pairwise inside the kernel), halving the serial ACS chain 136 -> 68 with
no overlap-save warm-up waste. This script records medians + bit-exactness
into resources/kernel_dispatch.json under "two_step_compaction".

Run (chip must be otherwise idle — single-client tunnel):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/two_step_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "resources", "kernel_dispatch.json")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from metaviterbinet_tpu.kernels.acs import (  # noqa: E402
    fused_viterbinet_detect, fused_viterbinet_detect_chunked)
from metaviterbinet_tpu.models import viterbinet  # noqa: E402

T, S, OVERLAP = 136, 16, 32
REPEATS, ITERS = 5, 32


def rate(fn, y, words) -> dict:
    """Median symbols/s over REPEATS, ITERS dispatches per sync (scalar host
    pull — block_until_ready is unreliable under axon)."""
    run = jax.jit(lambda p, yy: jnp.sum(fn(p, yy)))
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    float(run(params, y))  # compile + sync
    vals = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = run(params, y)
        float(out)
        vals.append(words * T * ITERS / (time.perf_counter() - t0))
    vals.sort()
    return {"median_msym_s": round(vals[len(vals) // 2] / 1e6, 1),
            "best_msym_s": round(vals[-1] / 1e6, 1)}


def main():
    rng = np.random.default_rng(0)
    from metaviterbinet_tpu.ops.channel import isi_awgn_transmit
    from metaviterbinet_tpu.ops.modulation import bpsk_modulate

    results = []
    for W in (384, 512):
        bits = rng.integers(0, 2, size=(W, T)).astype(np.float32)
        h = np.tile(np.exp(-0.2 * np.arange(4)), (W, 1)).astype(np.float32)
        padded = np.concatenate([bits, np.zeros((W, 4))], axis=1)
        y = isi_awgn_transmit(jnp.asarray(bpsk_modulate(padded)),
                              jnp.asarray(h), 10.0, jax.random.PRNGKey(0), 4)[:, :T]
        params = viterbinet.init_params(jax.random.PRNGKey(0), S)

        plain = np.asarray(fused_viterbinet_detect(params, y))
        mism = {"two_step": int(np.sum(np.asarray(
            fused_viterbinet_detect(params, y, two_step=True)) != plain))}
        for c in (2, 4):
            mism[f"chunked_c{c}_two_step"] = int(np.sum(np.asarray(
                fused_viterbinet_detect_chunked(
                    params, y, c, OVERLAP, two_step=True)) != plain))

        row = {"words": W, "T": T, "overlap": OVERLAP,
               "mismatch_bits_vs_plain": mism,
               "plain": rate(fused_viterbinet_detect, y, W),
               "two_step": rate(
                   lambda p, yy: fused_viterbinet_detect(p, yy, two_step=True),
                   y, W)}
        for c in (2, 4):
            row[f"chunked_c{c}"] = rate(
                lambda p, yy, c=c: fused_viterbinet_detect_chunked(
                    p, yy, c, OVERLAP), y, W)
            row[f"chunked_c{c}_two_step"] = rate(
                lambda p, yy, c=c: fused_viterbinet_detect_chunked(
                    p, yy, c, OVERLAP, two_step=True), y, W)
        base = row["plain"]["median_msym_s"]
        row["speedups_vs_plain"] = {
            k: round(row[k]["median_msym_s"] / base, 2)
            for k in ("two_step", "chunked_c2", "chunked_c4",
                      "chunked_c2_two_step", "chunked_c4_two_step")}
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(OUT) as f:
        d = json.load(f)
    d["two_step_compaction"] = {
        "description": (
            "Round-4 two-step ACS compaction (VERDICT r3 item 5): consecutive "
            "trellis steps composed into one (min,+) routing matmul inside the "
            "fused kernel, serial chain 136 -> 68, bit-exact vs the plain "
            "kernel by construction (per-step renorm commutes; "
            "tests/test_kernels.py::test_two_step_bit_exact). Measured alone "
            "and composed with the time-chunked overlap-save variant. Median "
            f"over {REPEATS} repeats, {ITERS} dispatches/sync, real chip."),
        "points": results,
    }
    with open(OUT, "w") as f:
        json.dump(d, f, indent=1)
        f.write("\n")
    print("written ->", OUT)


if __name__ == "__main__":
    main()
