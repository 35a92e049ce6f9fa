"""Eval-time BatchNorm folding for serving.

In eval mode BatchNorm is a per-channel affine, so every conv -> BN pair
can be folded EXACTLY into the conv (kernel scaled per output channel, the
affine's residue becoming a conv bias):

    BN(conv(x, k)) = conv(x, k * s) + b,   s = scale / sqrt(var + eps)
                                           b = bn_bias - mean * s

This removes every BN read/write on the serving path's largest activations
(the visual front's (B,T,56,56,64) stem maps and the per-frame ResNet maps
— reference src/models/visual_front.py:10-17, src/models/resnet.py:25-66 —
plus the postnet's conv_in).  The generator's pre-activation norms
(GenResBlk norm1/norm2, _ToMel norm: BN -> LReLU -> conv) are NOT foldable
across the nonlinearity and stay as-is.

Pairing is by the package's naming convention — a BN that FOLLOWS its conv
shares the node: (conv1, bn1), (conv2, bn2), (down_conv, down_bn),
(stem_conv, stem_bn), (conv_in, bn_in).  GenResBlk's norm1/norm2 don't
match any pair name, so the walker never touches them.

Measured on the real chip (tools/bench_fold.py, bf16 b48x75f, 8 launches
in flight): base 116.1k mel-frames/s, fold 115.9k, fold + bf16-weight cast
116.0k — NEUTRAL.  XLA already fuses the eval BN affine into the conv
epilogue, and the serving path is latency-tail-bound (24% MFU at 56% HBM,
tools/mfu_report.py), so removing the affine's arithmetic moves nothing.
Folding therefore does NOT ship as the bench.py default; it stays a
tested, exact serving option (smaller param tree, fewer ops for
environments where dispatch latency differs).

Usage (serving):

    modules = VCAGANModules.create(cfg, fold_bn=True)
    g_params, g_stats = fold_generator_side(g_params, g_stats)
    modules.v_front.apply({"params": g_params["v_front"]}, video, train=False)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

BN_EPS = 1e-5  # must match vcagan.nn.common.batch_norm

# conv name -> the BN (by name) that consumes its output
_PAIRS = {
    "conv1": "bn1",
    "conv2": "bn2",
    "down_conv": "down_bn",
    "stem_conv": "stem_bn",
    "conv_in": "bn_in",
}


def _fold_one(conv: Dict, bn_p: Dict, bn_s: Dict) -> Dict:
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + BN_EPS)
    kernel = conv["kernel"] * s  # broadcast over the trailing out-feature axis
    old_bias = conv.get("bias", 0.0)
    bias = (old_bias - bn_s["mean"]) * s + bn_p["bias"]
    return {"kernel": kernel, "bias": bias}


def fold_conv_bn(
    params: Dict[str, Any], batch_stats: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold every paired conv->BN in one module's trees.

    Returns (folded_params, remaining_batch_stats).  Folded BN entries are
    removed from both trees; unpaired BNs (pre-activation norms) survive
    untouched, so the result stays apply-able with ``fold_bn=True`` modules.
    """

    def walk(p_node: Any, s_node: Any) -> Tuple[Any, Any]:
        if not isinstance(p_node, dict):
            return p_node, s_node
        s_node = s_node if isinstance(s_node, dict) else {}
        out_p: Dict[str, Any] = {}
        out_s: Dict[str, Any] = {}
        folded_bns = set()
        for k, v in p_node.items():
            bn_name = _PAIRS.get(k)
            if (
                bn_name is not None
                and isinstance(v, dict)
                and "kernel" in v
                and bn_name in p_node
                and bn_name in s_node
            ):
                out_p[k] = _fold_one(v, p_node[bn_name], s_node[bn_name])
                folded_bns.add(bn_name)
        for k, v in p_node.items():
            if k in out_p or k in folded_bns:
                continue
            if isinstance(v, dict) and "kernel" not in v and "scale" not in v:
                out_p[k], sub_s = walk(v, s_node.get(k))
                if sub_s:
                    out_s[k] = sub_s
            else:
                out_p[k] = v
        for k, v in s_node.items():
            if k in folded_bns or k in out_s:
                continue
            if k in p_node and isinstance(p_node[k], dict) and "kernel" not in p_node[k] and "scale" not in p_node[k]:
                continue  # handled by the recursive walk above
            out_s[k] = v
        return out_p, out_s

    return walk(params, batch_stats)


def fold_generator_side(
    g_params: Dict[str, Any], g_stats: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold the serving-path modules (v_front, post fully; gen's pre-act
    norms remain).  Input/output: {"v_front", "gen", "post"} trees."""
    out_p, out_s = {}, {}
    for name in g_params:
        out_p[name], out_s[name] = fold_conv_bn(
            g_params[name], g_stats.get(name, {})
        )
    return out_p, out_s
