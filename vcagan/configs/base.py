"""Typed configuration core.

The reference drives everything through per-script argparse flags
(reference: train.py:25-50, train_LRS.py:27-53).  Here the single source of
truth is a dataclass tree; the CLI shims in ``vcagan.cli`` keep the original
argv surface and populate these dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio front-end parameters (reference: vid_aud_grid.py:36-38).

    640-pt FFT at 16 kHz with hop 160 -> 321 linear bins, 100 mel frames/s,
    i.e. exactly 4 mel frames per 25-fps video frame.
    """

    sample_rate: int = 16_000
    n_fft: int = 640
    hop_length: int = 160
    win_length: int = 640
    n_mels: int = 80
    f_min: float = 55.0
    f_max: float = 7500.0  # 7600.0 for LRS (reference: train_LRS.py:41-42)
    preemphasis: float = 0.97
    griffin_lim_iters: int = 60  # reference: vid_aud_grid.py:202
    mel_inversion_scale: float = 1000.0  # reference: vid_aud_grid.py:197

    @property
    def n_linear(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def mel_per_video_frame(self) -> int:
        # 16000 / 25 fps / 160 hop = 4 (reference: vid_aud_grid.py:174)
        return self.sample_rate // 25 // self.hop_length


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model family hyper-parameters.

    Defaults reproduce the reference topology exactly
    (reference: visual_front.py, generator.py).
    """

    # visual front
    stem_channels: int = 64
    resnet_layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    feature_dim: int = 512
    gru_hidden: int = 512
    gru_layers: int = 2
    gru_dropout: float = 0.3
    frontend_dropout: float = 0.3
    # generator
    noise_dim: int = 128
    mel_base_bins: int = 20  # coarse-scale freq bins; x2 per stage -> 20/40/80
    attention_dim: int = 256
    attention_inner: int = 1280  # 20 * 64 (reference: generator.py:151-152)
    # postnet
    postnet_channels: int = 256
    linear_bins: int = 321
    # discriminators
    disc_base_channels: int = 32
    disc_max_channels: int = 512
    sync_temp: float = 1.0
    # numerics
    use_bfloat16: bool = False  # compute dtype for conv/matmul-heavy modules


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset / windowing parameters (reference: train.py:43-44, vid_aud_grid.py:25-38)."""

    data_root: str = "Data_dir"
    dataset: str = "GRID"  # GRID | LRS2 | LRS3
    subject: str = "overlap"  # overlap | unseen | s# | four (GRID only)
    window_size: int = 40  # 50 for LRS
    max_v_timesteps: int = 75  # 160 for LRS
    augmentations: bool = True
    crop_size: int = 112
    grid_crop_box: Tuple[int, int, int, int] = (59, 95, 195, 231)
    # Slice the static GRID crop box on the HOST (uint8, before upload)
    # instead of shipping full frames to the device: 288x360 raw -> 136x136
    # cuts per-step H2D bytes ~5.6x, which dominates wall time on a
    # tunnel-attached chip.  Numerically identical (slice-then-resize ==
    # crop-then-resize); the device pipeline skips its crop when set.
    host_crop: bool = True
    # Convert RGB -> uint8 luma on the HOST before upload: another 3x off
    # the per-step H2D bytes (the wire is the input bottleneck on a
    # tunnel-attached chip, ~50 MB/s).  Within one uint8 rounding
    # (<= 0.5/255 per pixel) of the device float-luma path — below the
    # reference's own PIL uint8 quantization (transforms.host_luma_u8).
    host_gray: bool = True
    # Bilinear-resize to crop_size on the HOST with the device kernel's
    # exact weights (transforms.host_resize_u8): another 1.47x off the
    # per-step H2D video bytes; one uint8 rounding from the device float
    # path (same bound class as host_gray).  Default OFF: on this 1-vCPU
    # tunnel host the resize matmuls (~17 GFLOP/step at b112) cost more
    # than the wire saves (measured 3.23 -> 3.69 s/step e2e,
    # tools/bench_e2e_train.py).  Flip on for many-core hosts where BLAS
    # parallelism makes the trade positive.
    host_resize: bool = False
    # Run decode+collate in a worker PROCESS (shared-memory handoff,
    # vcagan.data.prefetch.ProcessEpoch) instead of the in-process thread
    # pair: sidesteps GIL contention between collate and upload on
    # few-core hosts — the tpu-native analogue of the reference's
    # DataLoader workers (train.py:139-146).  Measured round 5 at bf16
    # b32 on the TPU and kept OPT-IN: threaded 50.7 clips/s vs process
    # 46.6 (fork + shm copy-out overhead beats the GIL win on this
    # 1-vCPU host; re-measure on many-core hosts).
    collate_process: bool = False
    pixel_mean: float = 0.4136
    pixel_std: float = 0.1700
    erase_size: int = 56
    # synthetic-fallback corpus size (tests/benches); large-batch recipes
    # (b112) need >= batch_size clips for a real epoch
    synthetic_clips: int = 64


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization parameters (reference: train.py:30-46,78-89)."""

    batch_size: int = 88
    epochs: int = 1000
    lr: float = 1e-4
    weight_decay: float = 1e-5
    seed: int = 1
    eval_step: int = 720
    start_epoch: int = 0
    lr_milestones: Tuple[int, ...] = (500, 800)  # (100, 150) for LRS
    lr_gamma: float = 0.1
    amsgrad: bool = True  # False for LRS (reference: train_LRS.py:97-98)
    recon_weight: float = 50.0
    # LRS loss deltas (reference: train_LRS.py:218,233-237)
    sync_dis_weight: float = 1.0  # 0.5 for LRS
    g_sync_in_g_loss: bool = True  # LRS adds g_sync outside g_loss; same math
    recon_on_denormalized: bool = True  # False for LRS
    checkpoint_dir: str = "./data/checkpoints/GRID"
    workers: int = 6
    # Selective rematerialization sites ("none" | "r1" | "stem" |
    # "vfront", comma-separable; vfront and stem are mutually exclusive).
    # "r1" checkpoints the discriminator forward inside the R1 penalty —
    # measured to unlock bf16 batch 64+ on one v5e chip (batch 64 OOMs
    # without it), see tools/bench_train.py.  "stem" checkpoints the
    # conv/BN/PReLU/maxpool stem chain inside the visual front (nn.remat)
    # so only the 4x-smaller pooled output stays live — slightly slower
    # than the compiler's auto-remat where both fit (160.6 vs 168.9
    # clips/s at bf16 batch 96, round-4 compiler).  The single-chip
    # record recipe is bf16 batch 96 + "r1" (190.3 clips/s, round-5
    # compiler; the former b112 "stem,r1" record regressed under it —
    # runs/r5_tpu_session.log).  "vfront" trades much more recompute and
    # measured ~25% slower at every shape — available for memory-starved
    # configurations only.
    remat: str = "none"
    # D-phase program structure ("ref" | "batched"), math-identical either
    # way (tests/test_train_step.py pins metric equivalence).  "ref" keeps
    # the reference-shaped trace (real+R1 per scale, then fakes) and every
    # cached TPU executable; "batched" concatenates real+fake into one
    # 2B-batch discriminator forward per scale and takes the 3 R1 grads
    # jointly — fewer, larger kernels against the small-fusion latency
    # tail.  Measured on-chip round 5 (runs/r5_tpu_session.log): NEUTRAL
    # (b32 149.4 vs 152.3, b64 166.7 vs 164.8, b112 111.0 vs 112.1
    # clips/s) — not worth abandoning the cached ref trace order.
    d_phase: str = "ref"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout.

    The reference's only parallelism is single-host DataParallel
    (reference: train.py:112-119).  Here the batch axis is sharded over a
    ``data`` mesh axis (gradient psum rides ICI) and an optional ``model``
    axis shards the widest projection weights.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1  # 1 = pure DP


@dataclasses.dataclass(frozen=True)
class VCAGANConfig:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def grid_config(**overrides) -> VCAGANConfig:
    """Config matching the reference GRID recipe (train.py defaults)."""
    cfg = VCAGANConfig()
    return _apply(cfg, overrides)


def lrs_config(dataset: str = "LRS2", **overrides) -> VCAGANConfig:
    """Config matching the reference LRS recipe (train_LRS.py defaults)."""
    cfg = VCAGANConfig(
        audio=AudioConfig(f_max=7600.0),
        data=DataConfig(dataset=dataset, window_size=50, max_v_timesteps=160),
        train=TrainConfig(
            batch_size=16,
            epochs=200,
            lr_milestones=(100, 150),
            amsgrad=False,
            sync_dis_weight=0.5,
            recon_on_denormalized=False,
            checkpoint_dir=f"./data/checkpoints/{dataset}",
        ),
    )
    return _apply(cfg, overrides)


def _apply(cfg: VCAGANConfig, overrides: dict) -> VCAGANConfig:
    """Apply dotted-path overrides, e.g. _apply(cfg, {"train.lr": 3e-4})."""
    for key, value in overrides.items():
        parts = key.split(".")
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{parts[0]: value})
        else:
            sub = getattr(cfg, parts[0])
            sub = dataclasses.replace(sub, **{parts[1]: value})
            cfg = dataclasses.replace(cfg, **{parts[0]: sub})
    return cfg
