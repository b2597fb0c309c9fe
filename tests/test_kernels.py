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
