"""Layered configuration: dataclass defaults <- yaml file <- programmatic overrides.

Parity with the reference's flat yaml namespace (reference python_code/config.yaml:1-57
and trainers/trainer.py:104-132, where constructor kwargs win over yaml values).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional

import yaml


@dataclass
class Config:
    # general
    run_name: str = "default_run"

    # coding parameters (reference config.yaml:5-6)
    use_ecc: bool = True
    n_symbols: int = 2  # RS parity symbols, 8 bits each

    # channel (reference config.yaml:9-17)
    memory_length: int = 4
    channel_type: str = "ISI_AWGN"
    channel_coefficients: str = "time_decay"  # 'time_decay' | 'cost2100'
    noisy_est_var: float = 0.0
    fading_in_channel: bool = True
    fading_in_decoder: bool = True
    fading_taps_type: int = 1  # 1 = synthetic train channel, 2 = test channel
    subframes_in_frame: int = 25  # first subframe of each frame is a pilot
    gamma: float = 0.2

    # validation (reference config.yaml:20-26)
    val_block_length: int = 120
    val_frames: int = 5
    val_SNR_start: float = 10.0
    val_SNR_end: float = 10.0
    val_SNR_step: float = 1.0
    eval_mode: str = "aggregated"  # 'aggregated' | 'by_word'

    # training (reference config.yaml:29-39)
    train_block_length: int = 120
    train_frames: int = 12
    train_minibatch_num: int = 25
    train_minibatch_size: int = 32
    train_SNR_start: float = 10.0
    train_SNR_end: float = 10.0
    train_SNR_step: float = 1.0
    lr: float = 1e-3
    clip_grad_norm: float = 0.0  # >0 enables global-norm grad clipping (opt-in; reference has none)
    loss_type: str = "CrossEntropy"  # 'BCE' | 'CrossEntropy' | 'MSE'
    optimizer_type: str = "Adam"  # 'Adam' | 'RMSprop' | 'SGD'

    # seeds (reference config.yaml:40-41)
    noise_seed: int = 3450002
    word_seed: int = 7860002

    # self-supervised online training (reference config.yaml:44-47)
    self_supervised: bool = False
    self_supervised_iterations: int = 200
    ser_thresh: float = 0.02

    # meta-learning (reference config.yaml:50-57)
    online_meta: bool = False
    meta_lr: float = 0.1
    MAML: bool = True  # True: second-order; False: first-order (stop_gradient)
    weights_init: str = "last_frame"  # 'random' | 'last_frame' | 'meta_training'
    window_size: int = 1
    buffer_empty: bool = True
    meta_train_iterations: int = 20
    meta_j_num: int = 10
    meta_subframes: int = 5

    # --- TPU-native extras (no reference counterpart) ---
    dtype: str = "float32"  # compute dtype for detector forward passes
    use_pallas: Optional[bool] = None  # fused metric+ACS Pallas kernel for
    # batch detection (vnet family). None = auto: on when the backend is TPU
    # (the kernel wins at every batch width there — 55 vs 52 M sym/s at the
    # protocol's 384-padded words, 1.75 B vs 0.4 B at 65536), off elsewhere
    # (interpret mode is for semantics tests). True/False force it.
    mesh_shape: Optional[tuple] = None  # e.g. (8,) data-parallel mesh; None = single device
    decode_overlap: int = 32  # warm-up overlap (symbols) for block-parallel decode
    eval_time_chunks: int = 0  # opt-in: split T into this many overlap-save
    # chunks inside the fused kernel, turning time into batch width — the
    # latency fix for SMALL eval batches (the 384-word protocol batch is
    # bound by the 136-step serial ACS chain). 0 = plain kernel. Equality
    # with the plain kernel needs decode_overlap >= trellis forgetting depth
    # (~8*memory_length); asserted in tests and measured on-chip
    # (resources/kernel_dispatch.json eval_width_occupancy).
    eval_two_step: Optional[bool] = None  # compose consecutive ACS steps into
    # one (min,+) routing matmul inside the fused kernel (serial chain
    # 136 -> 68). Bit-exact vs the plain kernel by construction
    # (resources/kernel_dispatch.json two_step_compaction). None = auto:
    # ON for the VA kernel (+35% at its protocol-width-only eval batches),
    # OFF for the vnet-family kernel (its default dispatch is the wide-batch
    # throughput path, where the 4x routing FLOPs would regress; +23% at the
    # 384-word eval width when opted in). True/False force either kernel.
    # Composes with eval_time_chunks.
    buffer_capacity: int = 300  # fixed ring-buffer capacity for the fused online loop
    weights_dir: Optional[str] = None

    # ---- derived quantities ----
    @property
    def n_states(self) -> int:
        return 2 ** self.memory_length

    def transmission_length(self, phase: str) -> int:
        """Codeword length through the channel (reference trainer.py:196-198)."""
        block = self.train_block_length if phase == "train" else self.val_block_length
        return block + 8 * self.n_symbols if self.use_ecc else block

    def block_length(self, phase: str) -> int:
        return self.train_block_length if phase == "train" else self.val_block_length

    def n_words(self, phase: str) -> int:
        frames = self.train_frames if phase == "train" else self.val_frames
        return frames * self.subframes_in_frame

    def snr_range(self, phase: str):
        import numpy as np
        if phase == "train":
            return np.arange(self.train_SNR_start, self.train_SNR_end + 1, step=self.train_SNR_step)
        return np.arange(self.val_SNR_start, self.val_SNR_end + 1, step=self.val_SNR_step)

    def coefficients_for_phase(self, phase: str) -> str:
        """Train phase always uses the synthetic time-decay taps (reference trainer.py:195)."""
        return "time_decay" if phase == "train" else self.channel_coefficients

    def data_indices(self, phase: str = "val"):
        """Non-pilot word indices; SER is computed only over these (reference trainer.py:99-102)."""
        import numpy as np
        n = self.n_words(phase)
        idx = np.arange(n)
        return idx[idx % self.subframes_in_frame != 0]

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def load_config(config_path: Optional[str] = None, **overrides) -> Config:
    """Build a Config: dataclass defaults, then yaml file, then overrides (highest wins)."""
    values = {}
    if config_path is not None and os.path.isfile(config_path):
        with open(config_path) as f:
            loaded = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(Config)}
        values.update({k: v for k, v in loaded.items() if k in known})
    values.update({k: v for k, v in overrides.items() if v is not None})
    return Config(**values)
