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


def save_serving_npz(g_params, batch_stats, path: str) -> None:
    """Flatten {v_front,gen,post} params + BN stats to fp16 and compress."""
    flat = {}
    for kind, tree in (("params", g_params), ("stats", batch_stats)):
        for mod, sub in tree.items():
            if mod not in GENERATOR_SIDE:
                continue
            for kp, leaf in jax.tree_util.tree_flatten_with_path(sub)[0]:
                flat[_leaf_key(kind, mod, kp)] = np.asarray(leaf, np.float16)
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
                if key not in stored:
                    raise KeyError(f"{path} is missing {key}")
                arr = stored[key].astype(np.float32)
                if arr.shape != np.shape(leaf):
                    raise ValueError(
                        f"{key}: stored {arr.shape} vs template {np.shape(leaf)}"
                    )
                used.add(key)
                vals.append(arr)
            out[mod] = jax.tree_util.tree_unflatten(treedef, vals)
        return out

    g_params = fill("params", params_template)
    g_stats = fill("stats", stats_template)
    extra = set(stored) - used
    if extra:
        raise KeyError(f"{path} has unmatched leaves: {sorted(extra)[:5]} ...")
    return g_params, g_stats
