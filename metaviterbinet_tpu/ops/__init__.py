from metaviterbinet_tpu.ops.trellis import (  # noqa: F401
    transition_table,
    acs_step,
    viterbi_decode,
    calculate_states,
)
from metaviterbinet_tpu.ops.modulation import bpsk_modulate  # noqa: F401
from metaviterbinet_tpu.ops.channel import (  # noqa: F401
    isi_awgn_transmit,
    estimate_channel,
    estimate_channel_batch,
)
from metaviterbinet_tpu.ops.metrics import error_rates  # noqa: F401
