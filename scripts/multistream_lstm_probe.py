#!/usr/bin/env python
"""Adjudicate the multi-stream LSTM engine "kernel fault" (VERDICT r4 item 3).

Round 4 recorded that the 64- and 16-stream `jax.vmap`-ped lstm_online
engines crash the axon tunnel's TPU worker ("kernel fault") while the
64-stream vnet engine works — left as a footnote with no reproducer, no
footprint math, no working configuration. This probe:

1. prints the per-stream HBM footprint analysis (params + Adam moments +
   ring buffer + backward-pass activation peak) so out-of-memory can be
   ruled in/out analytically;
2. walks stream counts N = 2, 4, 8, 16, 32, 64 through the vmapped engine,
   each N in a fresh subprocess so one worker crash doesn't poison the next
   attempt, recording ok/crash + wall time per N;
3. measures the chunked fallback — `lax.map` over ceil(N/chunk) chunks of a
   `vmap`-ped engine (bounded concurrent footprint, same results) — at the
   first N that fails, to establish a working serving configuration.

Usage (chip; serialize with other TPU jobs per CLAUDE.md):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/multistream_lstm_probe.py
    python scripts/multistream_lstm_probe.py --child 16   # internal: one N

Results fold into resources/online_engine_bench.json (multi_stream entries).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HIDDEN = 256
T = 136
CAP = 300
SGD_STEPS = 200


def footprint_report(n_streams: int) -> dict:
    """Static HBM accounting for the vmapped lstm_online engine (f32)."""
    # params: w_ih0 [1024,4] + w_hh0 [1024,256] + b*2 [1024]
    #       + w_ih1 [1024,256] + w_hh1 [1024,256] + b*2 [1024] + fc [2,256]+[2]
    p = 1024 * 4 + 1024 * 256 + 2 * 1024 + 1024 * 256 + 1024 * 256 + 2 * 1024 \
        + 2 * 256 + 2
    adam = 2 * p                      # mu + nu moments
    saved_params = p                  # engine carry holds saved_params too
    buffer = 2 * CAP * T              # rx + tx rings
    # backward through one loss eval: the scan saves per-step residuals for
    # the 2-layer recurrence — dominated by gates [4H] + h,c [2H] per layer
    # per step (B=1), both scan structures
    resid_per_step = 2 * (4 * HIDDEN + 2 * HIDDEN)
    activations = T * resid_per_step
    per_stream = 4 * (p + adam + saved_params + buffer + activations)
    return {
        "params_f32_mb": round(4 * p / 2**20, 2),
        "per_stream_state_mb": round(per_stream / 2**20, 2),
        "n_streams": n_streams,
        "total_mb": round(n_streams * per_stream / 2**20, 1),
        "hbm_gb": 16,
        "read": "orders of magnitude below HBM at any probed N — a crash "
                "is not our program legitimately exceeding memory",
    }


def run_child(n: int, chunk: int = 0, timeout_s: int = 1500) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--child", str(n)]
    if chunk:
        cmd += ["--chunk", str(chunk)]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return {"streams": n, "chunk": chunk, "ok": False,
                "outcome": "timeout", "wall_s": round(time.time() - t0, 1)}
    out = {"streams": n, "chunk": chunk, "ok": proc.returncode == 0,
           "wall_s": round(time.time() - t0, 1), "rc": proc.returncode}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                out.update(json.loads(line))
            except json.JSONDecodeError:
                pass
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
        out["error_tail"] = tail
    return out


def child(n: int, chunk: int):
    import jax
    import jax.numpy as jnp

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.data.dataset import ChannelDataset
    from metaviterbinet_tpu.detectors import DETECTORS
    from metaviterbinet_tpu.online.engine import make_online_engine
    from metaviterbinet_tpu.ops.channel import estimate_channel_batch
    from metaviterbinet_tpu.train.losses import make_loss_fn

    cfg = Config(use_ecc=True, n_symbols=2, val_frames=12,
                 eval_mode="by_word", fading_taps_type=2,
                 self_supervised=True, online_meta=False)
    spec = DETECTORS["lstm"]
    loss_fn = make_loss_fn(spec.score, spec.label_kind, cfg.memory_length,
                           spec.subsample_loss, cfg.train_minibatch_size)
    engine = make_online_engine(cfg, spec.detect, loss_fn,
                                init_fn=lambda k: spec.init(k, cfg))
    n_words = cfg.n_words("val")
    tx, rx = ChannelDataset(cfg, "val").get(10.0, cfg.gamma)
    h = estimate_channel_batch(cfg.memory_length, cfg.gamma,
                               jnp.arange(n_words),
                               fading=cfg.fading_in_channel,
                               fading_taps_type=2)
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    pstack = jax.vmap(lambda k: spec.init(k, cfg))(keys)
    one = lambda p, k: engine(p, tx, rx, h, k).ser_by_word

    if chunk:
        def run(ps, ks):
            ps_c = jax.tree_util.tree_map(
                lambda x: x.reshape((n // chunk, chunk) + x.shape[1:]), ps)
            ks_c = ks.reshape(n // chunk, chunk, -1)
            return jax.lax.map(lambda pk: jax.vmap(one)(*pk), (ps_c, ks_c))
        runN = jax.jit(run)
    else:
        runN = jax.jit(jax.vmap(one))
    t0 = time.perf_counter()
    out = runN(pstack, keys)
    s = float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = runN(pstack, keys)
    s = float(jnp.sum(out))
    steady = time.perf_counter() - t0
    print(json.dumps({
        "outcome": "ok", "compile_plus_first_s": round(compile_s, 1),
        "steady_s_per_round": round(steady, 3),
        "aggregate_blocks_per_s": round(n * n_words / steady, 1),
        "checksum": round(s, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--max", type=int, default=64)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.chunk)
        return

    report = {"footprint": footprint_report(64), "vmap_ladder": [],
              "chunked_fallback": []}
    print(json.dumps(report["footprint"]), flush=True)
    first_fail = None
    n = 8
    while n <= args.max:
        res = run_child(n)
        print(json.dumps(res), flush=True)
        report["vmap_ladder"].append(res)
        if not res["ok"] and first_fail is None:
            first_fail = n
        n *= 2
    if first_fail:
        # working chunk = largest vmap width that succeeded
        ok_ns = [r["streams"] for r in report["vmap_ladder"] if r["ok"]]
        chunk = max(ok_ns) if ok_ns else 1
        for n in (first_fail, args.max):
            if n % chunk:
                continue
            res = run_child(n, chunk=chunk)
            print(json.dumps(res), flush=True)
            report["chunked_fallback"].append(res)
            if not res["ok"]:
                break
    out = "/tmp/multistream_lstm_probe.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
