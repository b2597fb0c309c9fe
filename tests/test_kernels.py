"""Pallas kernel equivalence tests (interpret mode on CPU; the same
assertions hold compiled on TPU — verified on hardware, see kernels/acs.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaviterbinet_tpu.kernels.acs import (
    fused_viterbinet_detect,
    pallas_viterbi_decode,
    _pick_tile_w,
    _route_matrix,
)
from metaviterbinet_tpu.models import viterbinet
from metaviterbinet_tpu.ops.trellis import transition_table, viterbi_decode


def test_route_matrix_encodes_predecessor_pairs():
    for S in (4, 16, 64):
        route = _route_matrix(S)
        tt = transition_table(S)
        # after min(total, roll(total,-1)), lane 2s' holds min over the
        # predecessor pair {2s', 2s'+1}; route must pick lane 2s' mod S
        for s in range(S):
            assert route[s, tt[s, 0]] == 1.0
            assert route[s].sum() == 1.0


@pytest.mark.parametrize("S", [16, 64])
def test_pallas_decode_bit_identical(S):
    rng = np.random.default_rng(0)
    W, T = 128, 48
    priors = jnp.asarray(rng.normal(size=(W, T, S)).astype(np.float32))
    ref = np.asarray(viterbi_decode(priors))
    got = np.asarray(pallas_viterbi_decode(priors))
    np.testing.assert_array_equal(got, ref)


def test_fused_detect_matches_xla_path():
    rng = np.random.default_rng(1)
    W, T, S = 128, 48, 16
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    y = jnp.asarray(rng.normal(size=(W, T)).astype(np.float32))
    ref = np.asarray(viterbinet.detect(params, y))
    got = np.asarray(fused_viterbinet_detect(params, y))
    # the kernel runs the metric MLP in bf16 (as XLA does on TPU, but with
    # different rounding on CPU interpret): allow rare near-tie bit flips
    assert np.mean(ref != got) < 1e-3


def test_shape_validation():
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    with pytest.raises(ValueError, match="multiple"):
        fused_viterbinet_detect(params, jnp.zeros((100, 48)))
    with pytest.raises(ValueError, match="multiple"):
        pallas_viterbi_decode(jnp.zeros((100, 48, 16)))


def test_pallas_readout_breaks_ties_like_argmin():
    """Exact ties (renorm pins the running min to 0.0) must resolve to the
    LOWEST state index, matching jnp.argmin / torch.argmin — here the tied
    minimum set is {1, 2, 9, 10}, so the emitted bit is state 1's LSB = 1."""
    import jax.numpy as jnp
    import numpy as np

    from metaviterbinet_tpu.kernels.acs import pallas_viterbi_decode
    from metaviterbinet_tpu.ops.trellis import viterbi_decode

    S = 16
    p0 = np.ones(S, np.float32)
    p0[[2, 4]] = 0.0  # new[1] = min(p2,p3) = 0, new[2] = min(p4,p5) = 0
    priors = np.stack([p0, np.ones(S, np.float32)])[None]  # [1, 2, S]
    priors = jnp.asarray(np.tile(priors, (128, 1, 1)))
    a = np.asarray(viterbi_decode(priors))
    b = np.asarray(pallas_viterbi_decode(priors))
    assert a[0, 1] == 1.0  # argmin of tie {1,2,...} is state 1 -> bit 1
    np.testing.assert_array_equal(a, b)


def test_pick_tile_w():
    T = 136  # protocol block length incl. parity
    # whole batch in one tile whenever it fits (grid steps serialize)
    assert _pick_tile_w(512, T) == 512
    assert _pick_tile_w(384, T) == 384
    assert _pick_tile_w(4096 * 3, T) == 4096
    # the tile must divide W and stay a lane multiple
    assert _pick_tile_w(4096 + 128, T) in range(128, 4097, 128)
    assert (4096 + 128) % _pick_tile_w(4096 + 128, T) == 0
    # long block lengths shrink the tile to fit the VMEM budget
    assert _pick_tile_w(65536, 4096) < _pick_tile_w(65536, 136)
    assert _pick_tile_w(65536, 4096) * (2 * 4096 + 256) * 4 <= (12 << 20)


def test_fused_detect_wide_tile_agreement():
    """W=512 exercises a 512-lane tile (tile width > LANE_W). The kernel's
    metric MLP runs in bf16 (same as the scan path's matmuls on TPU, but CPU
    interpret rounds differently): allow the same rare near-tie bit flips as
    test_fused_detect_matches_xla_path."""
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    y = jnp.asarray(np.random.default_rng(3).normal(size=(512, 24)).astype(np.float32))
    a = np.asarray(viterbinet.detect(params, y))
    b = np.asarray(fused_viterbinet_detect(params, y))
    assert np.mean(a != b) < 1e-3


def test_fused_detect_chunked_matches_plain():
    """Time-chunked overlap-save detect == plain fused detect. Both run the
    SAME kernel arithmetic (identical per-symbol bf16 MLP), so equality is
    exact once the overlap exceeds the trellis forgetting depth — including
    the stream-head chunks, whose warm-up priors are mask-zeroed (metrics
    stay exactly uniform, a bit-exact fresh start)."""
    from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect_chunked

    rng = np.random.default_rng(5)
    W, T, S = 128, 128, 16
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    # realistic y: BPSK through the 4-tap ISI channel at a working SNR
    from metaviterbinet_tpu.ops.channel import isi_awgn_transmit
    from metaviterbinet_tpu.ops.modulation import bpsk_modulate

    bits = rng.integers(0, 2, size=(W, T)).astype(np.float32)
    h = np.tile(np.exp(-0.2 * np.arange(4)), (W, 1)).astype(np.float32)
    padded = np.concatenate([bits, np.zeros((W, 4))], axis=1)
    y = isi_awgn_transmit(jnp.asarray(bpsk_modulate(padded)), jnp.asarray(h),
                          10.0, jax.random.PRNGKey(5), 4)[:, :T]

    plain = np.asarray(fused_viterbinet_detect(params, y))
    for n_chunks in (2, 4):
        got = np.asarray(
            fused_viterbinet_detect_chunked(params, y, n_chunks, overlap=32))
        np.testing.assert_array_equal(got, plain)


def test_fused_detect_chunked_validation():
    from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect_chunked

    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    with pytest.raises(ValueError, match="chunks"):
        fused_viterbinet_detect_chunked(params, jnp.zeros((128, 50)), 4)
    with pytest.raises(ValueError, match="overlap"):
        fused_viterbinet_detect_chunked(params, jnp.zeros((128, 128)), 8,
                                        overlap=32)


def test_with_pallas_detect_time_chunks_matches_plain():
    """Config.eval_time_chunks routes batch detection through the chunked
    kernel (with word padding) and must bit-match the plain kernel path;
    non-divisible T falls back to the plain kernel."""
    from metaviterbinet_tpu.detectors import DETECTORS, with_pallas_detect

    rng = np.random.default_rng(9)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    y = jnp.asarray(rng.normal(size=(100, 128)).astype(np.float32))  # W pads to 128
    plain = with_pallas_detect(DETECTORS["vnet"])
    chunked = with_pallas_detect(DETECTORS["vnet"], time_chunks=4, overlap=32)
    np.testing.assert_array_equal(np.asarray(chunked.detect(params, y, None)),
                                  np.asarray(plain.detect(params, y, None)))
    # T=50 doesn't divide into 4 chunks -> silently falls back, still correct
    y2 = jnp.asarray(rng.normal(size=(100, 50)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(chunked.detect(params, y2, None)),
                                  np.asarray(plain.detect(params, y2, None)))


def test_with_pallas_detect_two_step_matches_plain():
    """Config.eval_two_step routes batch detection through the pair-composed
    kernel and must bit-match the plain kernel path, alone and composed with
    time_chunks."""
    from metaviterbinet_tpu.detectors import DETECTORS, with_pallas_detect

    rng = np.random.default_rng(11)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    y = jnp.asarray(rng.normal(size=(100, 128)).astype(np.float32))
    plain = with_pallas_detect(DETECTORS["vnet"])
    want = np.asarray(plain.detect(params, y, None))
    two = with_pallas_detect(DETECTORS["vnet"], two_step=True)
    np.testing.assert_array_equal(np.asarray(two.detect(params, y, None)), want)
    both = with_pallas_detect(DETECTORS["vnet"], time_chunks=4, overlap=32,
                              two_step=True)
    np.testing.assert_array_equal(np.asarray(both.detect(params, y, None)),
                                  want)


@pytest.mark.parametrize("T", [40, 41])  # odd T covers the two_step
# trailing single-step tail branch in _va_kernel (T % 2 == 1)
def test_fused_va_detect_bit_identical(T):
    """The analytic-metric VA kernel must bit-match the scan path
    (viterbi_decode over branch_priors), alone and in two_step mode, and
    through the with_pallas_detect padding wrapper."""
    from metaviterbinet_tpu.detectors import DETECTORS, with_pallas_detect
    from metaviterbinet_tpu.kernels.acs import fused_va_detect
    from metaviterbinet_tpu.models import va

    rng = np.random.default_rng(5)
    W, L = 128, 4
    h = jnp.asarray(
        np.exp(-0.2 * np.arange(L))[None] *
        (1 + 0.1 * rng.normal(size=(W, L)))).astype(jnp.float32)
    y = jnp.asarray(rng.normal(size=(W, T)).astype(np.float32))
    want = np.asarray(va.detect(y, h))
    mu = h @ jnp.asarray(va.state_symbols(2 ** L, L)).T
    np.testing.assert_array_equal(np.asarray(fused_va_detect(y, mu)), want)
    np.testing.assert_array_equal(
        np.asarray(fused_va_detect(y, mu, two_step=True)), want)
    # non-lane-multiple W through the dispatch wrapper
    spec = with_pallas_detect(DETECTORS["va"])
    np.testing.assert_array_equal(
        np.asarray(spec.detect(None, y[:100], h[:100])), want[:100])


def test_pair_matrices_encode_grand_predecessors():
    from metaviterbinet_tpu.kernels.acs import _pair_matrices

    for S in (4, 16):
        m = _pair_matrices(S)
        rbig, pbig = m[:4 * S], m[4 * S:]
        for j in range(4):
            for s in range(S):
                assert rbig[j * S + s, (4 * s + j) % S] == 1.0
                assert rbig[j * S + s].sum() == 1.0
                assert pbig[j * S + s, (2 * s + j // 2) % S] == 1.0
                assert pbig[j * S + s].sum() == 1.0


@pytest.mark.parametrize("T", [48, 49])  # even and odd (leftover single step)
def test_two_step_bit_exact(T):
    """two_step=True composes ACS pairs into one (min,+) chain step; by the
    monotone-min commutation argument in _acs_step2's docstring it must be
    BIT-EXACT vs the plain kernel — not just statistically close — on the
    same backend, including renorm behavior and exact-tie readout."""
    rng = np.random.default_rng(11)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    y = jnp.asarray(rng.normal(size=(128, T)).astype(np.float32))
    plain = np.asarray(fused_viterbinet_detect(params, y))
    got = np.asarray(fused_viterbinet_detect(params, y, two_step=True))
    np.testing.assert_array_equal(got, plain)


def test_two_step_exact_ties():
    """Exact ties (renorm pins the running min to 0.0) must break toward the
    lowest state index in the two-step path too — both the even-step readout
    (from chain metrics) and the odd-step readout (from the off-chain new1)."""
    from metaviterbinet_tpu.kernels.acs import _run_detect_kernel

    S, W, T = 16, 128, 6
    # craft priors that force ties: all-equal priors => metrics stay uniform
    # (every state tied at 0.0), so every readout is a maximal tie set
    params = viterbinet.init_params(jax.random.PRNGKey(0), S)
    zero = {k: jnp.zeros_like(v) for k, v in params.items()}
    y = jnp.zeros((W, T), jnp.float32)
    plain = np.asarray(fused_viterbinet_detect(zero, y))
    got = np.asarray(fused_viterbinet_detect(zero, y, two_step=True))
    np.testing.assert_array_equal(got, plain)
    assert (plain == 0.0).all()  # tie -> state 0 -> bit 0


def test_two_step_chunked_composes():
    """two_step works inside the time-chunked kernel (warm-up masking per
    symbol is applied to the precomputed priors identically)."""
    from metaviterbinet_tpu.kernels.acs import fused_viterbinet_detect_chunked

    rng = np.random.default_rng(13)
    params = viterbinet.init_params(jax.random.PRNGKey(0), 16)
    from metaviterbinet_tpu.ops.channel import isi_awgn_transmit
    from metaviterbinet_tpu.ops.modulation import bpsk_modulate

    W, T = 128, 128
    bits = rng.integers(0, 2, size=(W, T)).astype(np.float32)
    h = np.tile(np.exp(-0.2 * np.arange(4)), (W, 1)).astype(np.float32)
    padded = np.concatenate([bits, np.zeros((W, 4))], axis=1)
    y = isi_awgn_transmit(jnp.asarray(bpsk_modulate(padded)), jnp.asarray(h),
                          10.0, jax.random.PRNGKey(5), 4)[:, :T]
    plain = np.asarray(fused_viterbinet_detect(params, y))
    got = np.asarray(fused_viterbinet_detect_chunked(params, y, 2, overlap=32,
                                                     two_step=True))
    np.testing.assert_array_equal(got, plain)
