"""Trainer orchestration: train improves SER; both eval protocols run."""
import numpy as np
import pytest

from metaviterbinet_tpu.config import Config
from metaviterbinet_tpu.evaluation.trainer import Trainer


def tiny_cfg(tmp_path, **kw):
    base = dict(
        val_block_length=24, train_block_length=24, n_symbols=1,
        val_frames=2, subframes_in_frame=5, train_frames=2,
        train_minibatch_num=3, train_minibatch_size=8,
        self_supervised_iterations=3, meta_train_iterations=2, meta_j_num=2,
        meta_subframes=3, buffer_capacity=16,
        weights_dir=str(tmp_path / "weights"),
    )
    base.update(kw)
    return Config(**base)


def test_va_aggregated_eval(tmp_path):
    cfg = tiny_cfg(tmp_path, val_SNR_start=8.0, val_SNR_end=10.0)
    t = Trainer(cfg, "va", verbose=False)
    sers = t.evaluate()
    assert sers.shape == (3,)
    assert sers[0] >= sers[-1] - 0.02  # higher SNR should not be much worse


def test_vnet_train_improves_and_checkpoints(tmp_path):
    # untrained ViterbiNet is chance (SER ~0.5 +- sampling noise); training on
    # this tiny config must pull clearly below chance
    cfg = tiny_cfg(tmp_path, train_frames=4, train_minibatch_num=8)
    t = Trainer(cfg, "vnet", verbose=False)
    t.train()
    ser_trained = t.single_eval_at_point(t.params, 10.0, cfg.gamma)
    assert ser_trained < 0.35, ser_trained
    # checkpoint round-trip: a fresh trainer loads without retraining
    t2 = Trainer(cfg, "vnet", verbose=False)
    restored = t2.load_weights(10.0, cfg.gamma)
    ser_restored = t2.single_eval_at_point(restored, 10.0, cfg.gamma)
    # same weights, same protocol -> statistically close SER
    assert abs(ser_restored - ser_trained) < 0.1
    # config provenance: saving wrote the RESOLVED config beside the
    # checkpoints (reference trainer.py:132), and it round-trips to the
    # exact Config that produced them
    import os

    import yaml

    prov = os.path.join(t.weights_dir, "config.yaml")
    assert os.path.isfile(prov)
    with open(prov) as f:
        assert Config(**yaml.safe_load(f)) == cfg


def test_checkpoint_round_trips_opt_state(tmp_path):
    """Payload mirrors the reference's {model, optimizer, loss} artifact
    (trainer.py:507-511): Adam moments must round-trip bit-exactly, and
    params-only loads of the same file must keep working."""
    import jax
    import jax.numpy as jnp

    from metaviterbinet_tpu.train.checkpoint import (
        load_opt_state, load_params, save_params,
    )
    from metaviterbinet_tpu.train.optim import make_optimizer

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    opt = make_optimizer("Adam", 1e-3, 0.0)
    opt_state = opt.init(params)
    # advance the moments so they are non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt_state = opt.update(grads, opt_state, params)

    save_params(str(tmp_path), 10.0, 0.2, params, loss=1.5, opt_state=opt_state)
    p2 = load_params(str(tmp_path), 10.0, 0.2, params)
    o2 = load_opt_state(str(tmp_path), 10.0, 0.2, opt.init(params))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a params-only checkpoint (pre-opt_state format) restores opt_state None
    save_params(str(tmp_path), 11.0, 0.2, params, loss=0.0)
    assert load_opt_state(str(tmp_path), 11.0, 0.2, opt.init(params)) is None
    assert load_params(str(tmp_path), 12.0, 0.2, params) is None  # missing


def test_vnet_by_word_eval_runs(tmp_path):
    cfg = tiny_cfg(tmp_path, eval_mode="by_word", self_supervised=True)
    t = Trainer(cfg, "vnet", verbose=False)
    t.train()
    sers = t.evaluate()
    assert sers.shape == (cfg.n_words("val"),)
    assert np.all(np.isfinite(sers))


def test_meta_vnet_meta_train_runs(tmp_path):
    cfg = tiny_cfg(tmp_path)
    t = Trainer(cfg, "meta_vnet", verbose=False)
    t.train()  # dispatches to meta_train
    ser = t.single_eval_at_point(t.params, 10.0, cfg.gamma)
    assert np.isfinite(ser)


def test_by_word_requires_ecc(tmp_path):
    cfg = tiny_cfg(tmp_path, eval_mode="by_word", use_ecc=False)
    t = Trainer(cfg, "va", verbose=False)
    with pytest.raises(ValueError, match="ECC"):
        t.evaluate()


def test_meta_lstm_full_path(tmp_path):
    """Offline MAML meta-training + by-word online meta-adaptation for the
    LSTM family — the heaviest compile path (double-grad through the
    recurrent scan)."""
    cfg = tiny_cfg(tmp_path, train_minibatch_num=2, self_supervised=True,
                   online_meta=True, eval_mode="by_word", ser_thresh=1.0)
    t = Trainer(cfg, "meta_lstm", verbose=False)
    t.train()
    sers = t.evaluate()
    assert sers.shape == (cfg.n_words("val"),)
    assert np.all(np.isfinite(sers))


def test_bfloat16_compute_dtype(tmp_path):
    """Config.dtype='bfloat16' runs the metric network in bf16 (ACS stays
    f32); detection quality stays close to the f32 path on the same data."""
    import jax

    cfg32 = tiny_cfg(tmp_path, val_SNR_start=12.0, val_SNR_end=12.0)
    cfg16 = cfg32.replace(dtype="bfloat16")
    t32 = Trainer(cfg32, "vnet", verbose=False)
    t16 = Trainer(cfg16, "vnet", verbose=False)
    t16.params = t32.params  # same weights, different compute dtype
    s32 = t32.single_eval_at_point(t32.params, 12.0, cfg32.gamma)
    s16 = t16.single_eval_at_point(t16.params, 12.0, cfg16.gamma)
    assert np.isfinite(s16)
    assert abs(s16 - s32) < 0.15  # bf16 rounding must not destroy detection


def test_clip_grad_norm_optimizer():
    """clip_grad_norm > 0 bounds the update norm; 0 is the parity default."""
    import jax.numpy as jnp

    from metaviterbinet_tpu.train.optim import make_optimizer

    params = {"w": jnp.zeros(4)}
    grads = {"w": jnp.full(4, 100.0)}
    opt = make_optimizer("SGD", 1.0, clip_grad_norm=1.0)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.linalg.norm(updates["w"])) <= 1.0 + 1e-5
    opt0 = make_optimizer("SGD", 1.0, clip_grad_norm=0.0)
    updates0, _ = opt0.update(grads, opt0.init(params), params)
    assert float(jnp.linalg.norm(updates0["w"])) > 100.0


def test_fused_snr_sweep_matches_sequential(tmp_path):
    """The one-dispatch multi-SNR aggregated eval (sweep_eval_fused) must
    reproduce the per-SNR sequential loop exactly: same dataset PRNG stream,
    same decoder CSI, same per-SNR params routing. Checked for the
    parameterless VA and for a parameterized detector with DIFFERENT params
    per SNR (the per-SNR checkpoint semantics, trainer.py:249-251)."""
    cfg = tiny_cfg(tmp_path, use_ecc=False, val_SNR_start=8.0,
                   val_SNR_end=12.0, val_SNR_step=2.0)
    snrs = [float(s) for s in cfg.snr_range("val")]

    # VA (params None per point)
    seq = Trainer(cfg, "va", verbose=False)
    expected = [seq.single_eval_at_point(None, s, cfg.gamma) for s in snrs]
    fused = Trainer(cfg, "va", verbose=False)
    got = fused.sweep_eval_fused(snrs, tuple(None for _ in snrs))
    np.testing.assert_allclose(got, expected, atol=1e-6)

    # vnet with distinct random params per SNR
    seq = Trainer(cfg, "vnet", verbose=False)
    params_per_snr = tuple(seq.init_params() for _ in snrs)
    expected = [seq.single_eval_at_point(p, s, cfg.gamma)
                for p, s in zip(params_per_snr, snrs)]
    fused = Trainer(cfg, "vnet", verbose=False)
    got = fused.sweep_eval_fused(snrs, params_per_snr)
    np.testing.assert_allclose(got, expected, atol=1e-6)

    # with noisy decoder CSI the per-point key stream must also line up
    ncfg = cfg.replace(noisy_est_var=0.1)
    seq = Trainer(ncfg, "va", verbose=False)
    expected = [seq.single_eval_at_point(None, s, ncfg.gamma) for s in snrs]
    fused = Trainer(ncfg, "va", verbose=False)
    got = fused.sweep_eval_fused(snrs, tuple(None for _ in snrs))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_noisy_csi_degrades_va(tmp_path):
    """noisy_est_var adds Gaussian noise to the decoder-side taps
    (reference channel_estimation.py:35-36) — the full-CSI VA must degrade
    monotonically-ish with CSI uncertainty."""
    cfg = tiny_cfg(tmp_path, use_ecc=False, val_frames=8,
                   val_SNR_start=12.0, val_SNR_end=12.0)
    clean = Trainer(cfg, "va", verbose=False).single_eval_at_point(None, 12.0, cfg.gamma)
    noisy_cfg = cfg.replace(noisy_est_var=0.3)
    noisy = Trainer(noisy_cfg, "va", verbose=False).single_eval_at_point(None, 12.0, cfg.gamma)
    assert noisy > clean + 0.01, (clean, noisy)
