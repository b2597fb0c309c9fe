#!/usr/bin/env python
"""Device-side probe for the two-step compaction (companion to
scripts/two_step_bench.py): 8 kernel launches chained inside ONE jit per
dispatch (a scalar data dependency between launches prevents CSE while
leaving the input bit-identical in fp32), amortizing the axon tunnel's
per-dispatch RTT that flattens the dispatched-rate comparison. Appends a
"device_side_probe" block to kernel_dispatch.json's two_step_compaction.

Run alone on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/two_step_device_probe.py
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

T, S, OVERLAP, W = 136, 16, 32, 384
CHAIN, REPEATS, DISPATCHES = 8, 5, 4


def chained_rate(fn) -> float:
    """Median symbols/s with CHAIN serialized launches per dispatch."""
    def prog(p, y):
        acc = jnp.float32(0.0)
        for _ in range(CHAIN):
            # acc*1e-20 rounds to 0 ulp vs y in fp32 (bit-identical input)
            # but makes launch i+1 data-depend on launch i: no CSE, serial.
            bits = fn(p, y + acc * jnp.float32(1e-20))
            acc = acc + jnp.sum(bits)
        return acc

    run = jax.jit(prog)
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(W, T)).astype(np.float32))
    float(run(params, y))  # compile + sync
    vals = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(DISPATCHES):
            out = run(params, y)
        float(out)
        vals.append(W * T * CHAIN * DISPATCHES / (time.perf_counter() - t0))
    vals.sort()
    return round(vals[len(vals) // 2] / 1e6, 1)


def main():
    probes = {"plain_msym_s": chained_rate(fused_viterbinet_detect)}
    probes["two_step_msym_s"] = chained_rate(
        lambda p, y: fused_viterbinet_detect(p, y, two_step=True))
    for c in (2, 4):
        probes[f"chunk{c}_msym_s"] = chained_rate(
            lambda p, y, c=c: fused_viterbinet_detect_chunked(p, y, c, OVERLAP))
        probes[f"chunk{c}_two_step_msym_s"] = chained_rate(
            lambda p, y, c=c: fused_viterbinet_detect_chunked(
                p, y, c, OVERLAP, two_step=True))
    probes["method"] = (
        f"{CHAIN} kernel launches inside ONE jit per dispatch (scalar data "
        "dependency between launches, fp32-bit-identical input), median of "
        f"{REPEATS} repeats x {DISPATCHES} dispatches/sync, W={W}")
    print(json.dumps(probes))

    with open(OUT) as f:
        d = json.load(f)
    d.setdefault("two_step_compaction", {})["device_side_probe"] = probes
    with open(OUT, "w") as f:
        json.dump(d, f, indent=1)
        f.write("\n")
    print("written ->", OUT)


if __name__ == "__main__":
    main()
