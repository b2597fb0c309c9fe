"""metaviterbinet_tpu — a TPU-native (JAX/XLA/Pallas) software-radio equalization framework.

A from-scratch rebuild of the capabilities of the Meta-ViterbiNet reference
(tomerraviv95/meta-viterbinet, arXiv:2103.13483): BPSK over L-tap ISI-AWGN and
COST2100 channels, Reed-Solomon ECC, trellis detection (classical Viterbi,
ViterbiNet, windowed LSTM), and online meta-learned adaptation — designed
TPU-first: pure-functional param pytrees, `lax.scan` recursions, Pallas fused
kernels for the hot path, and `shard_map` block sharding over device meshes.
"""

__version__ = "0.1.0"

from metaviterbinet_tpu.config import Config, load_config  # noqa: F401
