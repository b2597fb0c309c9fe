"""REAL multi-process distributed run (VERDICT r2 item 3): launch 2 local
JAX processes (CPU platform, 4 virtual devices each) against one coordinator
and drive parallel/mesh.py's `jax.distributed.initialize` call and the
`n_proc > 1` hybrid-mesh branch — the paths the in-process 8-device mesh and
the driver's dryrun cannot reach. The worker (scripts/multiproc_worker.py)
asserts: hosts-major mesh rows, a cross-process psum, dp-train-step equality
vs a single-device step, and 2D sequence-parallel decode equality."""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(nproc: int, port: int, env: dict):
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for rank in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_distributed_run():
    nproc = 2
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    # keep the axon TPU plugin out of the workers: the tunnel is single-client
    # and this test must run while the chip is busy elsewhere
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)  # worker sets its own device count

    # _free_port closes the probe socket before the coordinator binds — a
    # TOCTOU window another process can land in. Retry the whole launch on a
    # fresh port when the failure is a coordinator bind error.
    for attempt in range(3):
        procs, outs = _launch(nproc, _free_port(), env)
        if all(p.returncode == 0 for p in procs):
            break
        bindy = any("address already in use" in o.lower()
                    or "failed to bind" in o.lower() for o in outs)
        if not (bindy and attempt < 2):
            break
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank {rank}" in out, out
