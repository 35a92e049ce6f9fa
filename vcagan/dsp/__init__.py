from vcagan.dsp.audio import (
    deemphasis,
    dynamic_range_compression,
    dynamic_range_decompression,
    mel_denormalize,
    mel_normalize,
    peak_normalize,
    preemphasis,
)
from vcagan.dsp.griffin_lim import griffin_lim
from vcagan.dsp.mel import mel_filterbank
from vcagan.dsp.stft import STFTParams, frame_count, istft, stft, stft_magnitude
from vcagan.dsp.pipeline import MelPipeline

__all__ = [
    "STFTParams",
    "stft",
    "stft_magnitude",
    "istft",
    "frame_count",
    "mel_filterbank",
    "griffin_lim",
    "preemphasis",
    "deemphasis",
    "peak_normalize",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "mel_normalize",
    "mel_denormalize",
    "MelPipeline",
]
