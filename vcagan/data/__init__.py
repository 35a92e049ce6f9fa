from vcagan.data.splits import grid_file_list
from vcagan.data.synthetic import SyntheticLipSpeech
from vcagan.data.transforms import (
    normalize_frames,
    prepare_clip,
    random_erase,
    sample_window,
)

__all__ = [
    "SyntheticLipSpeech",
    "grid_file_list",
    "normalize_frames",
    "prepare_clip",
    "random_erase",
    "sample_window",
]
