from metaviterbinet_tpu.evaluation.trainer import Trainer  # noqa: F401
