from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect, pallas_viterbi_decode  # noqa: F401
from metaviterbinet_tpu.kernels.online_sgd import online_adapt_viterbinet  # noqa: F401
