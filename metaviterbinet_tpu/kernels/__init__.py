from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect, pallas_viterbi_decode  # noqa: F401
