from metaviterbinet_tpu.online.engine import make_online_engine, OnlineResult  # noqa: F401
