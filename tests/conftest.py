"""Test config: force a virtual 8-device CPU mesh (no TPU needed).

The session environment pins JAX_PLATFORMS to the axon TPU tunnel and a
sitecustomize imports jax at interpreter startup, so jax's config has already
captured the env var by the time this file runs — setting os.environ here is
too late. `jax.config.update` before any backend initialization is the
reliable override. Unit tests validate semantics, not hardware; `bench.py`
and the driver's compile checks run on the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
