"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np

from metaviterbinet_tpu.models import va
from metaviterbinet_tpu.ops.channel import isi_awgn_transmit
from metaviterbinet_tpu.ops.modulation import bpsk_modulate
from metaviterbinet_tpu.ops.trellis import viterbi_decode
from metaviterbinet_tpu.parallel.decode import (
    chunked_decode_reference,
    sequence_parallel_decode,
    shard_words_decode,
)
from metaviterbinet_tpu.parallel.mesh import make_mesh
from metaviterbinet_tpu.parallel.training import make_dp_train_step


def _make_priors(W=8, T=512, L=4, snr=12.0, seed=0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=(W, T)).astype(np.float32)
    h = np.tile(np.exp(-0.2 * np.arange(L)), (W, 1)).astype(np.float32)
    padded = np.concatenate([bits, np.zeros((W, L))], axis=1)
    s = bpsk_modulate(padded)
    y = isi_awgn_transmit(jnp.asarray(s), jnp.asarray(h), snr, jax.random.PRNGKey(seed), L)
    return va.branch_priors(y, jnp.asarray(h)), bits


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def test_words_sharded_decode_matches_single_device():
    mesh = make_mesh((8,), ("dp",))
    priors, _ = _make_priors(W=16, T=136)
    seq = np.asarray(viterbi_decode(priors))

    run = shard_words_decode(mesh, lambda params, y, h: va.detect(y, h))
    # rebuild y,h to go through detect_fn end to end
    rng = np.random.default_rng(3)
    W, T, L = 16, 136, 4
    bits = rng.integers(0, 2, size=(W, T)).astype(np.float32)
    h = np.tile(np.exp(-0.2 * np.arange(L)), (W, 1)).astype(np.float32)
    padded = np.concatenate([bits, np.zeros((W, L))], axis=1)
    y = isi_awgn_transmit(jnp.asarray(bpsk_modulate(padded)), jnp.asarray(h), 12.0,
                          jax.random.PRNGKey(3), L)
    sharded = np.asarray(run(None, y, jnp.asarray(h)))
    single = np.asarray(va.detect(y, jnp.asarray(h)))
    np.testing.assert_array_equal(sharded, single)


def test_shard_map_pallas_detect_matches_single_device():
    """ADVICE A3: use_pallas + mesh_shape must compose — the Pallas-wrapped
    detect runs per-shard under shard_map (pad-to-128 happens per local
    block), matching the single-device fused kernel."""
    from metaviterbinet_tpu.detectors import DETECTORS, with_pallas_detect
    from metaviterbinet_tpu.models import viterbinet

    mesh = make_mesh((8,), ("dp",))
    spec = with_pallas_detect(DETECTORS["vnet"])
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    rng = np.random.default_rng(5)
    W, T = 16, 48
    y = jnp.asarray(rng.normal(size=(W, T)).astype(np.float32))
    h = jnp.zeros((W, 4), jnp.float32)  # unused by vnet detect
    run = shard_words_decode(mesh, spec.detect, via_shard_map=True)
    sharded = np.asarray(run(params, y, h))
    single = np.asarray(spec.detect(params, y, h))
    np.testing.assert_array_equal(sharded, single)


def test_use_pallas_auto_resolution():
    """use_pallas=None resolves to scan off-TPU and kernel on TPU."""
    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.detectors import DETECTORS
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    cfg = Config(val_block_length=24, n_symbols=1, val_frames=1,
                 subframes_in_frame=5)
    assert cfg.use_pallas is None
    t = Trainer(cfg, "vnet", verbose=False)  # CPU backend in tests
    assert t.spec.detect is DETECTORS["vnet"].detect
    t2 = Trainer(cfg.replace(use_pallas=True), "vnet", verbose=False)
    assert t2.spec.detect is not DETECTORS["vnet"].detect


def test_sequence_parallel_equals_sequential():
    """The N4 invariant: block-parallel decode with warm-up == sequential."""
    mesh = make_mesh((8,), ("sp",))
    priors, _ = _make_priors(W=4, T=1024)
    seq = np.asarray(viterbi_decode(priors))
    run = sequence_parallel_decode(mesh, overlap=32)
    par = np.asarray(run(priors))
    np.testing.assert_array_equal(par, seq)


def test_multihost_mesh_emulation_and_2d_decode():
    """make_multihost_mesh single-process emulation: (hosts, chips) grid;
    2D decode (words over the hosts axis, time over each host's chips) must
    equal sequential decode exactly — the layout a real pod would run."""
    from metaviterbinet_tpu.parallel.mesh import make_multihost_mesh

    mesh = make_multihost_mesh(chips_per_host=4)  # (2, 4) on 8 devices
    assert dict(mesh.shape) == {"dp": 2, "sp": 4}
    priors, _ = _make_priors(W=4, T=512)
    seq = np.asarray(viterbi_decode(priors))
    run = sequence_parallel_decode(mesh, overlap=32, words_axis="dp")
    par = np.asarray(run(priors))
    np.testing.assert_array_equal(par, seq)

    with np.testing.assert_raises(ValueError):
        make_multihost_mesh(chips_per_host=3)  # 8 % 3 != 0


def test_init_distributed_single_process_noop():
    """No coordinator configured and one process: must be a clean no-op."""
    from metaviterbinet_tpu.parallel.mesh import init_distributed

    init_distributed()
    assert jax.process_count() == 1


def test_chunked_reference_equals_sequential():
    priors, _ = _make_priors(W=4, T=1024)
    seq = np.asarray(viterbi_decode(priors))
    got = np.asarray(chunked_decode_reference(priors, n_chunks=8, overlap=32))
    np.testing.assert_array_equal(got, seq)


def test_dp_train_step_matches_single_device():
    """psum-of-grads over 8 shards == one big-batch step on one device."""
    import optax
    from metaviterbinet_tpu.models import viterbinet
    from metaviterbinet_tpu.train.losses import make_loss_fn

    mesh = make_mesh((8,), ("dp",))
    spec_score = viterbinet.score
    # no subsampling so both paths see identical data (keys differ per shard)
    loss_fn = make_loss_fn(spec_score, "states", 4, False, 8)
    opt = optax.sgd(0.1)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    rx = jnp.asarray(rng.normal(size=(16, 40)).astype(np.float32))
    tx = jnp.asarray(rng.integers(0, 2, size=(16, 40)).astype(np.float32))

    step = make_dp_train_step(mesh, loss_fn, opt)
    p_dp, _, loss_dp = step(params, opt_state, rx, tx, jax.random.PRNGKey(1))

    # single-device equivalent: mean of per-shard mean losses = global mean
    # (all shards have equal size)
    loss, grads = jax.value_and_grad(loss_fn)(params, rx, tx, None)
    updates, _ = opt.update(grads, opt_state, params)
    p_single = optax.apply_updates(params, updates)

    assert np.allclose(float(loss_dp), float(loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_trainer_mesh_shape_matches_plain_eval(tmp_path):
    """Config.mesh_shape=(4,) dp-shards batch detection (with words-axis
    padding for non-divisible word counts) and must bit-match the plain path."""
    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.evaluation.trainer import Trainer

    base = dict(val_block_length=24, n_symbols=1, val_frames=1,
                subframes_in_frame=5, weights_dir=str(tmp_path))
    t_mesh = Trainer(Config(mesh_shape=(4,), **base), "vnet", verbose=False)
    t_plain = Trainer(Config(**base), "vnet", verbose=False)
    ser_mesh = t_mesh.single_eval_at_point(t_mesh.params, 10.0, 0.2)
    ser_plain = t_plain.single_eval_at_point(t_mesh.params, 10.0, 0.2)
    assert abs(ser_mesh - ser_plain) < 1e-6
