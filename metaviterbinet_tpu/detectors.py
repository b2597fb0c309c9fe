"""Detector registry: one uniform functional API over all detector families.

The reference ships five `nn.Module` detectors with a shared-but-unenforced
`forward(y, phase, ...)` convention plus two functional "meta twin" clones
(reference python_code/detectors/*; see README.md:47 noting the API was never
unified).  Here a detector is a `DetectorSpec` binding pure functions:

    init(key, cfg)            -> param pytree (None for parameterless VA)
    score(params, y)          -> per-symbol metrics [words, T, n_classes]
    detect(params, y, csi)    -> hard bits [words, T]

Meta variants need no twin modules: `jax.grad` differentiates `score` w.r.t.
the param pytree to any order (this removes reference components
META_VNET/meta_vnet_detector.py and META_LSTM/meta_lstm_detector.py entirely).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from metaviterbinet_tpu.models import lstm, va, viterbinet


@dataclass(frozen=True)
class DetectorSpec:
    name: str
    trainable: bool
    label_kind: Optional[str]      # 'states' | 'bits' | None
    subsample_loss: bool           # reference select_batch subsampling in loss
    meta: bool                     # offline training is MAML meta-training
    init: Optional[Callable]       # (key, cfg) -> params
    score: Optional[Callable]      # (params, y) -> [W, T, n_classes]
    detect: Callable               # (params, y, h) -> [W, T] bits


def _vnet_init(key, cfg):
    return viterbinet.init_params(key, cfg.n_states)


def _lstm_init(key, cfg):
    return lstm.init_params(key)


# Classical Viterbi: parameterless, full CSI via explicit taps h.
# (reference detectors/VA/va_detector.py:13-100)
VA = DetectorSpec(
    name="va", trainable=False, label_kind=None, subsample_loss=False,
    meta=False, init=None, score=None,
    detect=lambda params, y, h: va.detect(y, h),
)

# ViterbiNet: DNN branch metrics + ACS (reference detectors/VNET/vnet_detector.py)
VNET = DetectorSpec(
    name="vnet", trainable=True, label_kind="states", subsample_loss=True,
    meta=False, init=_vnet_init,
    score=lambda params, y: viterbinet.score(params, y),
    detect=lambda params, y, h: viterbinet.detect(params, y),
)

# Meta-ViterbiNet: same network, MAML offline training + online meta-adaptation
# (reference trainers/META_VNET/metavnet_trainer.py)
META_VNET = DetectorSpec(
    name="meta_vnet", trainable=True, label_kind="states", subsample_loss=False,
    meta=True, init=_vnet_init,
    score=lambda params, y: viterbinet.score(params, y),
    detect=lambda params, y, h: viterbinet.detect(params, y),
)

# Windowed LSTM (reference detectors/LSTM/lstm_detector.py)
LSTM = DetectorSpec(
    name="lstm", trainable=True, label_kind="bits", subsample_loss=True,
    meta=False, init=_lstm_init,
    score=lambda params, y: lstm.score(params, y),
    detect=lambda params, y, h: lstm.detect(params, y),
)

# Meta-LSTM (reference trainers/META_LSTM/meta_lstm_trainer.py)
META_LSTM = DetectorSpec(
    name="meta_lstm", trainable=True, label_kind="bits", subsample_loss=False,
    meta=True, init=_lstm_init,
    score=lambda params, y: lstm.score(params, y),
    detect=lambda params, y, h: lstm.detect(params, y),
)

DETECTORS = {d.name: d for d in (VA, VNET, META_VNET, LSTM, META_LSTM)}

_MODEL_OF = {"vnet": viterbinet, "meta_vnet": viterbinet,
             "lstm": lstm, "meta_lstm": lstm}


def with_pallas_detect(spec: DetectorSpec, time_chunks: int = 0,
                       overlap: int = 32,
                       memory_length: int = 4,
                       two_step: Optional[bool] = None) -> DetectorSpec:
    """Specialize a spec to the fused Pallas metric+ACS kernel for batch
    detection (Config.use_pallas; None = auto-on for TPU): the MLP-metric
    kernel for the vnet family, the analytic-metric kernel for va
    (LSTM-family batch detection stays on the XLA scan — its recurrence is
    MXU-friendly as-is).

    The kernel wants the words axis padded to a lane multiple (128); the
    wrapper pads and slices. Off-TPU it runs in interpret mode (slow — meant
    for semantics tests only). Measured on TPU v5e: since the whole batch
    runs as ONE wide tile (kernels/acs.py::_pick_tile_w — grid steps would
    serialize), the kernel wins at every batch width: 55 vs 52 M sym/s at
    the protocol's 384 padded words, 164 vs 132 M at 1024, 468 vs 406 M at
    4096, and 1.75 B vs ~0.4 B at 65536 where all MLP activations stay in
    VMEM.

    time_chunks > 0 (Config.eval_time_chunks) additionally splits the time
    axis into overlap-save chunks inside the kernel — the occupancy fix for
    small eval batches, where the plain kernel is latency-bound on the
    T-step serial ACS chain (falls back to the plain kernel when T doesn't
    divide, the chunks are shorter than the overlap, or the overlap is
    below the ~8*memory_length trellis forgetting depth the bit-exactness
    measurement was taken at — a too-shallow warm-up would silently diverge
    from the plain kernel).

    two_step (Config.eval_two_step) composes consecutive ACS steps into one
    (min,+) routing matmul (serial chain T -> T/2; bit-exact by
    construction) — +23% device-side at the 384-word eval width, composable
    with time_chunks (resources/kernel_dispatch.json two_step_compaction).
    None = auto: ON for the VA kernel, OFF for the vnet family.
    """
    if spec.name == "va":
        # full-CSI VA: analytic Gaussian priors fused into the ACS kernel
        # (kernels/acs.py::fused_va_detect) — no [W,T,S] prior tensor in HBM.
        # two_step auto-resolves ON for VA: its batch eval is always
        # protocol-width (300-word batches), where halving the serial chain
        # wins +35% on-chip (149 vs 111 M sym/s at the 1920-lane sweep
        # width, bit-exact); VA has no wide-batch throughput path that the
        # 4x routing FLOPs could regress.
        from metaviterbinet_tpu.kernels.acs import LANE_W, fused_va_detect
        from metaviterbinet_tpu.models.va import state_symbols
        va_two_step = True if two_step is None else two_step

        def va_detect(params, y, h):
            W, T = y.shape
            Wp = -(-W // LANE_W) * LANE_W
            mu = h @ jnp.asarray(state_symbols(2 ** h.shape[-1],
                                               h.shape[-1])).T
            bits = fused_va_detect(jnp.pad(y, ((0, Wp - W), (0, 0))),
                                   jnp.pad(mu, ((0, Wp - W), (0, 0))),
                                   two_step=va_two_step)
            return bits[:W].astype(y.dtype)

        from dataclasses import replace
        return replace(spec, detect=va_detect)
    if spec.name not in ("vnet", "meta_vnet"):
        return spec
    from metaviterbinet_tpu.kernels.acs import (
        LANE_W, fused_viterbinet_detect, fused_viterbinet_detect_chunked)
    two_step = False if two_step is None else two_step

    if time_chunks > 1 and overlap < 8 * memory_length:
        import warnings
        warnings.warn(
            f"eval_time_chunks={time_chunks} requested with decode_overlap="
            f"{overlap} < 8*memory_length={8 * memory_length}: warm-up would "
            "not reach trellis forgetting depth — using the plain kernel.")
        time_chunks = 0

    def detect(params, y, h):
        W, T = y.shape
        Wp = -(-W // LANE_W) * LANE_W
        ypad = jnp.pad(y, ((0, Wp - W), (0, 0)))
        if time_chunks > 1 and T % time_chunks == 0 \
                and T // time_chunks >= overlap:
            bits = fused_viterbinet_detect_chunked(
                params, ypad, time_chunks, overlap, two_step=two_step)
        else:
            bits = fused_viterbinet_detect(params, ypad, two_step=two_step)
        return bits[:W].astype(y.dtype)

    from dataclasses import replace
    return replace(spec, detect=detect)


def with_compute_dtype(spec: DetectorSpec, dtype_name: str) -> DetectorSpec:
    """Specialize a trainable spec to a compute dtype (Config.dtype).

    'bfloat16' runs the branch-metric network's matmuls/recurrence in bf16 on
    the MXU — the ACS recursion and loss stay float32 (path metrics must not
    round; CLAUDE.md precision invariant). 'float32' returns the spec as-is,
    as does the parameterless VA (its analytic priors are a single f32 op).
    """
    if dtype_name in (None, "float32") or spec.name not in _MODEL_OF:
        return spec
    dt = jnp.dtype(dtype_name).type
    model = _MODEL_OF[spec.name]
    from dataclasses import replace
    return replace(
        spec,
        score=lambda params, y: model.score(params, y, compute_dtype=dt),
        detect=lambda params, y, h: model.detect(params, y, compute_dtype=dt),
    )
