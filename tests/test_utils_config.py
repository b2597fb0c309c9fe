"""Default config file, metrics logger, and profiling timer."""
import json
import os

import numpy as np

from metaviterbinet_tpu.config import Config, load_config
from metaviterbinet_tpu.paths import CONFIG_PATH
from metaviterbinet_tpu.utils.logging import MetricsLogger
from metaviterbinet_tpu.utils.profiling import Timer


def test_default_config_yaml_matches_dataclass_defaults():
    assert os.path.isfile(CONFIG_PATH)
    from_yaml = load_config(CONFIG_PATH)
    assert from_yaml == Config()


def test_config_override_precedence(tmp_path):
    cfg = load_config(CONFIG_PATH, val_SNR_start=7.0, use_ecc=False)
    assert cfg.val_SNR_start == 7.0
    assert not cfg.use_ecc
    assert cfg.memory_length == 4  # untouched default


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log("train", loss=1.5, snr=10.0)
    log.log("eval", ser=np.float32(0.01))
    records = [json.loads(line) for line in open(path)]
    assert [r["event"] for r in records] == ["train", "eval"]
    assert records[0]["step"] == 0 and records[1]["step"] == 1
    assert isinstance(records[1]["ser"], float)


def test_trainer_emits_metrics(tmp_path):
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    path = str(tmp_path / "t.jsonl")
    cfg = Config(val_block_length=24, n_symbols=1, val_frames=1,
                 subframes_in_frame=5)
    t = Trainer(cfg, "va", verbose=False, metrics=MetricsLogger(path))
    t.evaluate()
    records = [json.loads(line) for line in open(path)]
    assert any(r["event"] == "eval_point" for r in records)


def test_timer_sync():
    import jax.numpy as jnp

    with Timer() as t:
        x = jnp.ones((8, 8)) * 2
        t.sync(x)
    assert t.elapsed is not None and t.elapsed >= 0
