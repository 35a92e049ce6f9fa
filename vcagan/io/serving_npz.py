"""Compact trained serving weights: generator-side params + BN stats as a
flat fp16 npz.

The full orbax checkpoint (params + BN stats + two Adam chains) is
resume-grade but too large to commit; the serving-side subset at fp16 is a
few tens of MB and is exactly what the trained-weights bf16-vs-fp32 serving
quality pin needs (tools/eval_bf16_quality.py,
tests/test_bf16_and_lrs_train.py).  fp16 storage is lossless for that
comparison's purposes: bf16 has fewer mantissa bits than fp16, and the fp32
reference run loses ~1e-3 relative — far under the deltas being pinned.

Reference counterpart: the torch .ckpt dict of state_dicts saved at
train.py:303-322 (which the bf16 comparison would otherwise have to convert
via tools/convert_torch_ckpt.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

GENERATOR_SIDE = ("v_front", "gen", "post")


def _leaf_key(kind: str, mod: str, key_path) -> str:
    return f"{kind}/{mod}" + "".join(
        f"/{getattr(k, 'key', getattr(k, 'idx', k))}" for k in key_path
    )


def save_serving_npz(g_params, batch_stats, path: str, quantize: str | None = None) -> None:
    """Flatten {v_front,gen,post} params + BN stats, compressed.

    ``quantize=None``: fp16 leaves (~100 MB for the 51.8M-param G side —
    serving-grade, too big to commit).  ``quantize="q8"``: symmetric int8
    with per-output-channel (last axis) fp32 scales (~52 MB — the
    committed trained-weights fixture, data/soak_serving_q8.npz).  q8 is
    NOT a serving format: it exists so the fresh-checkout suite can run
    the trained-weights bf16-vs-fp32 pin, which compares the two dtypes
    on the SAME loaded weights — quantization noise cancels out of that
    comparison.  BN stats stay fp16 either way (var must stay exact-ish
    for eval BN).
    """
    flat = {}
    for kind, tree in (("params", g_params), ("stats", batch_stats)):
        for mod, sub in tree.items():
            if mod not in GENERATOR_SIDE:
                continue
            for kp, leaf in jax.tree_util.tree_flatten_with_path(sub)[0]:
                key = _leaf_key(kind, mod, kp)
                arr = np.asarray(leaf, np.float32)
                if quantize == "q8" and kind == "params" and arr.size > 4096:
                    scale = np.max(np.abs(arr), axis=tuple(range(arr.ndim - 1)))
                    scale = np.maximum(scale, 1e-12) / 127.0
                    q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                    flat["q8:" + key] = q
                    flat["q8s:" + key] = scale.astype(np.float32)
                else:
                    flat[key] = arr.astype(np.float16)
    np.savez_compressed(path, **flat)


def load_serving_npz(
    path: str, params_template, stats_template
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Rebuild fp32 {v_front,gen,post} param/stat trees in the structure of
    the given templates (e.g. from ``VCAGANModules.init_all``).  Raises on
    any missing or extra leaf, so a template/model mismatch is loud."""
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    used = set()

    def fill(kind, tree):
        out = {}
        for mod in GENERATOR_SIDE:
            leaves, treedef = jax.tree_util.tree_flatten_with_path(tree[mod])
            vals = []
            for kp, leaf in leaves:
                key = _leaf_key(kind, mod, kp)
                if "q8:" + key in stored:
                    q = stored["q8:" + key].astype(np.float32)
                    arr = q * stored["q8s:" + key]
                    used.update(("q8:" + key, "q8s:" + key))
                elif key in stored:
                    arr = stored[key].astype(np.float32)
                    used.add(key)
                else:
                    raise KeyError(f"{path} is missing {key}")
                if arr.shape != np.shape(leaf):
                    raise ValueError(
                        f"{key}: stored {arr.shape} vs template {np.shape(leaf)}"
                    )
                vals.append(arr)
            out[mod] = jax.tree_util.tree_unflatten(treedef, vals)
        return out

    g_params = fill("params", params_template)
    g_stats = fill("stats", stats_template)
    extra = set(stored) - used
    if extra:
        raise KeyError(f"{path} has unmatched leaves: {sorted(extra)[:5]} ...")
    return g_params, g_stats
