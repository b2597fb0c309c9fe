from metaviterbinet_tpu.models import va, viterbinet, lstm  # noqa: F401
