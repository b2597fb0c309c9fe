"""Test config: force a virtual 8-device CPU mesh (no TPU needed).

The session environment may pin JAX_PLATFORMS to a real TPU backend (e.g.
`axon`); unit tests must override it — they validate semantics, not hardware.
`bench.py` and the driver's compile checks are what run on the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
