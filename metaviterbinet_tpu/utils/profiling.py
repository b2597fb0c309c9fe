"""Profiling utilities.

The reference's only instrumentation is wall-clock prints around eval
(reference trainer.py:262-264). TPU-native replacement: `jax.profiler`
traces viewable in XProf/TensorBoard, plus a sync-aware timer (under remote
backends `block_until_ready` may return early — a scalar host pull is the
reliable fence, see bench.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block.

    View with: tensorboard --logdir <log_dir> (the XProf 'profile' tab).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that forces device completion at stop().

    >>> with Timer() as t:
    ...     out = step(...)
    ...     t.sync(out)     # fences on `out` before the clock stops
    >>> t.elapsed
    """

    def __init__(self):
        self.elapsed: Optional[float] = None
        self._t0 = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def sync(self, tree) -> None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            # scalar host pull — reliable completion fence on remote backends
            np.asarray(jnp.sum(leaves[0].ravel()[:1]))

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0
