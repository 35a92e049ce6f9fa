"""Fused conv3x3-PReLU-conv3x3-add-PReLU ResNet block (eval serving).

One Pallas kernel computes an entire folded-BN BasicBlock
(reference src/models/resnet.py:25-66 with the BNs pre-folded by
vcagan.nn.fold): conv1(+bias) -> PReLU -> conv2(+bias) -> +identity ->
PReLU, for the stride-1 equal-channel blocks (5 of the trunk's 8).  The
inter-conv activation lives only in VMEM — with XLA each conv is its own
kernel and the (N, H, W, C) intermediate round-trips HBM between them.

The 3x3 convs are computed as 9 shifted MXU matmuls over a zero-padded
VMEM scratch tile: for each tap (dy, dx), ``x_pad[:, dy:dy+H, dx:dx+W, :]
@ w[dy, dx]`` contracted over the channel axis (dot_general keeps the 4-D
layout; channels ride the lanes).  Grid is over image tiles of ``nb``
frames; weights/biases/slopes are broadcast to every program.

Serving-only: no custom VJP (training keeps the XLA path; the train step
needs BN batch statistics anyway, which folding removes).  An XLA
fallback (`fused_block_xla`) carries the same math off-TPU and as the
parity oracle in tests/test_fused_block.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import; CPU test environments fall back to interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def fused_block_xla(x, w1, b1, a1, w2, b2, a2):
    """Reference math: folded conv-PReLU-conv-add-PReLU via lax convs."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(
        x, w1.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + b1
    h = _prelu(h, a1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w2.astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + b2
    y = y + x.astype(jnp.float32)
    return _prelu(y, a2).astype(x.dtype)


def _conv3x3_taps(xp, w):
    """(nb, H+2, W+2, C) zero-padded tile -> (nb, H, W, Cout) fp32, as 9
    shifted channel-contractions on the MXU."""
    nb, hp, wp, _ = xp.shape
    h, wd = hp - 2, wp - 2
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + wd, :]
            term = jax.lax.dot_general(
                patch,
                w[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    return acc


def _block_kernel(x_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref, o_ref):
    _, _, _, c = x_ref.shape
    x = x_ref[:]
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))

    # SAME padding via jnp.pad (lowers to concatenate — conservative
    # Mosaic surface; sliced scratch writes were the riskier alternative)
    xp = jnp.pad(x, pad)
    hcur = _conv3x3_taps(xp, w1_ref[:]) + b1_ref[:].reshape(1, 1, 1, c)
    hcur = _prelu(hcur, a1_ref[:].reshape(1, 1, 1, c)).astype(x.dtype)

    hp = jnp.pad(hcur, pad)
    y = _conv3x3_taps(hp, w2_ref[:]) + b2_ref[:].reshape(1, 1, 1, c)
    y = y + x.astype(jnp.float32)
    o_ref[:] = _prelu(y, a2_ref[:].reshape(1, 1, 1, c)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _fused_block_pallas(x, w1, b1, a1, w2, b2, a2, nb=16, interpret=False):
    n, h, wd, c = x.shape
    pad = (-n) % nb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, h, wd, c), x.dtype)])
    grid = (x.shape[0] // nb,)
    # biases/slopes ride as (1, C) rows — rank-1 VMEM blocks are a Mosaic
    # lowering restriction (CLAUDE.md Pallas gotchas)
    row = lambda v: v.reshape(1, c).astype(jnp.float32)

    out = pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, h, wd, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], h, wd, c), x.dtype),
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype),
        row(b1),
        row(a1),
        w2.astype(x.dtype),
        row(b2),
        row(a2),
    )
    return out[:n] if pad else out


def _tile_images(n: int, h: int, c: int, dtype) -> int:
    """Pick the per-program image count: target ~2-4 MiB input tiles so
    two padded scratch copies + the output stay well inside VMEM."""
    bytes_per_img = h * h * c * jnp.dtype(dtype).itemsize
    nb = max(1, (2 << 20) // max(bytes_per_img, 1))
    return int(min(nb, 128, n))


def fused_basic_block(x, w1, b1, a1, w2, b2, a2, use_pallas: bool = True):
    """Folded-BN stride-1 BasicBlock: PReLU(conv2(PReLU(conv1(x)+b1))+b2+x).

    x: (N, H, W, C); w*: (3, 3, C, C); b*/a*: (C,).  Channels must be
    unchanged (the identity-shortcut blocks); stride-2 projection blocks
    keep the XLA path.
    """
    if use_pallas and _HAS_PLTPU and jax.default_backend() == "tpu":
        nb = _tile_images(x.shape[0], x.shape[1], x.shape[3], x.dtype)
        return _fused_block_pallas(x, w1, b1, a1, w2, b2, a2, nb=nb)
    return fused_block_xla(x, w1, b1, a1, w2, b2, a2)
