"""Plot cache, figure rendering, and CLI end-to-end on tiny configs."""
import json
import os

import numpy as np
import pytest

import metaviterbinet_tpu.paths as paths
from metaviterbinet_tpu.plotters.cache import get_ser_curve
from metaviterbinet_tpu.plotters.figures import plot_by_block, plot_ber_vs_snr


class _FakeTrainer:
    def __init__(self, ser):
        from metaviterbinet_tpu.config import Config
        self.cfg = Config()
        self._ser = ser
        self.calls = 0

    def evaluate(self):
        self.calls += 1
        return self._ser


def test_ser_cache_memoizes(tmp_path, monkeypatch):
    monkeypatch.setattr(paths, "PLOTS_DIR", str(tmp_path))
    import metaviterbinet_tpu.plotters.cache as cache
    monkeypatch.setattr(cache, "PLOTS_DIR", str(tmp_path))
    t = _FakeTrainer(np.array([0.1, 0.2]))
    s1 = get_ser_curve(t, run_over=False, method_name="m1")
    s2 = get_ser_curve(t, run_over=False, method_name="m1")
    assert t.calls == 1
    np.testing.assert_array_equal(s1, s2)
    get_ser_curve(t, run_over=True, method_name="m1")
    assert t.calls == 2


def test_figures_render(tmp_path, monkeypatch):
    import metaviterbinet_tpu.plotters.figures as figures
    monkeypatch.setattr(figures, "FIGURES_DIR", str(tmp_path))
    rng = np.random.default_rng(0)
    curves = [
        (rng.uniform(1e-4, 1e-1, 50), "Viterbi - Full CSI", 120, 2),
        (rng.uniform(1e-4, 1e-1, 50), "OnlineMetaViterbiNet", 120, 2),
    ]
    p1 = plot_by_block(curves, 120, 2, 10.0)
    assert os.path.isfile(p1)
    p2 = plot_ber_vs_snr(curves + curves, [10.0, 12.0])
    assert os.path.isfile(p2)


def test_tap_trajectory_figure(tmp_path, monkeypatch):
    import metaviterbinet_tpu.plotters.figures as figures
    monkeypatch.setattr(figures, "FIGURES_DIR", str(tmp_path))
    p = figures.plot_tap_trajectories(n_blocks=20)
    assert os.path.isfile(p)


def test_cli_taps(tmp_path, capsys, monkeypatch):
    import metaviterbinet_tpu.plotters.figures as figures
    monkeypatch.setattr(figures, "FIGURES_DIR", str(tmp_path))
    from metaviterbinet_tpu.cli import main
    rc = main(["taps", "--channel", "time_decay", "--fading-type", "2",
               "--blocks", "20"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.isfile(out["figure"])


def test_loss_types_bce_mse():
    """The reference's BCE/MSE criterion options (trainer.py:178-185) are
    selectable and produce finite, distinct losses."""
    import jax
    import jax.numpy as jnp
    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.detectors import DETECTORS
    from metaviterbinet_tpu.train.losses import make_loss_fn

    spec = DETECTORS["vnet"]
    cfg = Config()
    params = spec.init(jax.random.PRNGKey(0), cfg)
    rx = jax.random.normal(jax.random.PRNGKey(1), (2, 24))
    tx = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (2, 24)).astype(jnp.float32)
    vals = {}
    for lt in ("CrossEntropy", "BCE", "MSE"):
        fn = make_loss_fn(spec.score, spec.label_kind, cfg.memory_length,
                          False, 8, loss_type=lt)
        v = float(fn(params, rx, tx))
        assert np.isfinite(v) and v > 0
        vals[lt] = v
    assert len({round(v, 6) for v in vals.values()}) == 3
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        make_loss_fn(spec.score, spec.label_kind, cfg.memory_length,
                     False, 8, loss_type="Huber")(params, rx, tx)


def test_cli_evaluate_va(tmp_path, capsys):
    from metaviterbinet_tpu.cli import main
    rc = main([
        "evaluate", "--detector", "va", "--snr", "10",
        "--set", "val_block_length=24", "n_symbols=1", "val_frames=1",
        "subframes_in_frame=5",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["detector"] == "va"
    assert 0.0 <= out["mean_ser"] <= 1.0


def test_cli_rejects_unknown_field():
    from metaviterbinet_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["evaluate", "--detector", "va", "--set", "nonsense=1"])
