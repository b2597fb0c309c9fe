from metaviterbinet_tpu.utils.profiling import trace, Timer  # noqa: F401
from metaviterbinet_tpu.utils.logging import MetricsLogger  # noqa: F401
