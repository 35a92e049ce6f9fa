"""Video clip transforms as batched jnp ops (on-device input processing).

The reference runs a Python/PIL per-frame loop in every DataLoader worker —
crop, resize, flip, grayscale, normalize, random-erase
(reference: vid_aud_grid.py:94-121) — a main CPU bottleneck (SURVEY.md §3.1).
Here the whole clip transform is a single vectorized XLA program: frames
stay (T, H, W, C) arrays, resize is one ``jax.image.resize``, the stateful
per-clip flip/erase draws come from explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_CROP = (59, 95, 195, 231)  # (x0, y0, x1, y1), reference vid_aud_grid.py:99
PIXEL_MEAN = 0.4136
PIXEL_STD = 0.1700
_LUMA = np.asarray([0.299, 0.587, 0.114], np.float32)


def host_luma_u8(video: np.ndarray) -> np.ndarray:
    """uint8 RGB frames -> uint8 ITU-R 601 luma on the HOST
    (DataConfig.host_gray): grayscale commutes with resize/flip up to
    rounding, so converting before upload cuts host->device bytes 3x.

    The residual vs the device's float-luma-after-resize path is one
    uint8 rounding, |err| <= 0.5/255 in [0, 1] pixel units — BELOW the
    reference's own quantization (PIL Resize and convert('L') each
    round to uint8, vid_aud_grid.py:104-106).  Pointwise, so it commutes
    exactly with the host_crop slice/superset (luma(0) == 0 keeps LRS
    zero-padding semantics).
    """
    y = np.rint(video[..., :3].astype(np.float32) @ _LUMA)
    return np.clip(y, 0.0, 255.0).astype(np.uint8)[..., None]


_RESIZE_W: dict = {}


def _resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """The (out_size, in_size) weight matrix of jax.image.resize's
    antialiased bilinear kernel along one axis.  resize is linear, so the
    matrix is extracted EXACTLY by resizing the identity — the host matmul
    then reproduces the device resize bit-for-bit in fp32 (cv2's
    INTER_LINEAR does NOT antialias on downscale and diverges by up to
    0.31 in [0,1] units; measured before rejecting it)."""
    key = (in_size, out_size)
    if key not in _RESIZE_W:
        eye = jnp.eye(in_size, dtype=jnp.float32)
        w = jax.image.resize(eye, (out_size, in_size), method="bilinear")
        _RESIZE_W[key] = np.asarray(jax.device_get(w), np.float32)
    return _RESIZE_W[key]


def host_resize_u8(video: np.ndarray, out_size: int) -> np.ndarray:
    """uint8 frames (T, H, W, C) -> uint8 (T, out, out, C) on the HOST
    (DataConfig.host_resize), using the device kernel's exact weights
    (see _resize_weights), quantized back to uint8 for the wire.

    Cuts host->device video bytes another (H*W)/(out*out)x (1.47x for the
    GRID 136^2 -> 112^2 box) on top of host_crop/host_gray.  Residual vs
    the device float path: one uint8 rounding, |err| <= 0.5/255 in [0,1]
    units — the same bound class as host_gray, and below the reference's
    own PIL quantization.  The downstream flip commutes (the antialias
    kernel is symmetric); erase/normalize are pointwise after."""
    t, h, w, c = video.shape
    wh = _resize_weights(h, out_size)
    ww = _resize_weights(w, out_size)
    x = video.astype(np.float32)
    # (T,H,W,C): contract H with wh -> (T,out,W,C), then W with ww
    x = np.einsum("oh,thwc->towc", wh, x, optimize=True)
    x = np.einsum("pw,towc->topc", ww, x, optimize=True)
    return np.clip(np.rint(x), 0.0, 255.0).astype(np.uint8)


def prepare_clip(
    frames: jax.Array,
    key: Optional[jax.Array] = None,
    crop_box: Optional[Tuple[int, int, int, int]] = GRID_CROP,
    out_size: int = 112,
    augment: bool = False,
    erase_size: int = 56,
) -> jax.Array:
    """Raw frames -> normalized model input.

    frames: (T, H, W, C) uint8 or float; C = 1 or 3.
    Returns (T, out_size, out_size, 1) float32, normalized.

    Pipeline (matching reference build_tensor, vid_aud_grid.py:94-121):
    fixed box crop -> bilinear resize to 112^2 -> stateful horizontal flip
    (one draw per clip) -> grayscale (ITU-R 601 luma, PIL semantics) ->
    normalize (0.4136, 0.1700) -> random 56^2 erase.

    ``crop_box=None`` skips the slice: the host already cut the box out
    of the raw frames before upload (DataConfig.host_crop).
    """
    t = frames.shape[0]
    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    if crop_box is not None:
        x0, y0, x1, y1 = crop_box
        x = x[:, y0:y1, x0:x1, :]
    if x.shape[1] != out_size or x.shape[2] != out_size:
        # skipped under DataConfig.host_resize: the host already applied
        # this exact kernel (transforms.host_resize_u8)
        x = jax.image.resize(
            x, (t, out_size, out_size, x.shape[-1]), method="bilinear"
        )

    if augment:
        if key is None:
            raise ValueError("augment=True requires a PRNG key")
        k_flip, k_erase = jax.random.split(key)
        flip = jax.random.bernoulli(k_flip, 0.5)
        x = jnp.where(flip, x[:, :, ::-1, :], x)

    # grayscale: PIL convert('L') luma weights
    if x.shape[-1] == 3:
        luma = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
        x = jnp.sum(x * luma, axis=-1, keepdims=True)

    x = (x - PIXEL_MEAN) / PIXEL_STD

    if augment:
        x = random_erase(x, k_erase, erase_size)
    return x


def random_erase(
    frames: jax.Array, key: jax.Array, erase_size: int = 56
) -> jax.Array:
    """Zero one erase_size^2 patch, same position across all frames of the
    clip; start drawn from [-10, 66] so partial patches occur
    (reference vid_aud_grid.py:116-118)."""
    t, h, w, c = frames.shape
    kx, ky = jax.random.split(key)
    x_s = jax.random.randint(kx, (), -10, 67)
    y_s = jax.random.randint(ky, (), -10, 67)
    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    in_patch = (
        (ys >= y_s) & (ys < y_s + erase_size) & (xs >= x_s) & (xs < x_s + erase_size)
    )
    return jnp.where(in_patch, 0.0, frames)


def normalize_frames(x: jax.Array) -> jax.Array:
    return (x - PIXEL_MEAN) / PIXEL_STD


def sample_window(
    num_frames: int,
    window_size: int,
    key: jax.Array,
    mel_per_frame: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Draw a random training window start (video-frame index, mel-frame
    index), matching reference extract_window (vid_aud_grid.py:172-188)."""
    max_start = max(num_frames - window_size, 0)
    st = jax.random.randint(key, (), 0, max_start + 1)
    return st, st * mel_per_frame
