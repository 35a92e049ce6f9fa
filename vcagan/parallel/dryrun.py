"""Multi-chip dryrun problem + golden-equivalence machinery.

The driver gate (``__graft_entry__.dryrun_multichip``) must validate two
things on N virtual CPU devices: (1) the FULL sharded train step compiles
and executes, and (2) it reproduces the replicated single-device step
numerically — the GSPMD analogue of DataParallel's replicate-scatter-gather
equivalence (reference: train.py:112-119).

Round 4 checked (2) by compiling BOTH programs live; two multi-minute CPU
compiles of a second-order GAN step on a 1-vCPU host blew the driver's
budget (MULTICHIP_r04: rc=124).  This module keeps the equivalence bar
while compiling ONCE in the common case:

- ``tools/make_multichip_golden.py`` runs the replicated reference step
  offline, records its metrics + per-leaf updated-param statistics in
  ``data/multichip_golden.json`` keyed by a canonical hash of the SHARDED
  program's lowered StableHLO, and seeds ``data/dryrun_cache/`` with the
  sharded executable so the gate's one compile is a cache load.
- The gate lowers the sharded step (cheap: trace only), hashes it, and —
  on a hash match — compiles (cache hit), executes once, and compares
  against the golden.  On a mismatch (the step changed since the golden
  was committed) it falls back to the live two-compile comparison and
  tells you to refresh the golden.

Equivalence tolerances match tests/test_parallel.py's analysis: metrics to
5e-4 relative; updated g_params via per-leaf mean(|p|), which the
elementwise Adam bound (reassociation noise can flip ~lr*sign(grad), worst
case 2*lr per element) caps at 2.5*lr per leaf.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_PATH = os.path.join(_REPO, "data", "multichip_golden.json")
SEED_CACHE_DIR = os.path.join(_REPO, "data", "dryrun_cache")

METRIC_RTOL = 5e-4


def build_problem(n_devices: int, seed: int = 0):
    """Mesh + modules + state + batch + step factories for the dryrun.

    Deterministic: the same ``n_devices`` always produces the same
    problem, so golden metrics recorded offline stay comparable.
    """
    from vcagan.configs import TrainConfig
    from vcagan.parallel import make_mesh
    from vcagan.train import Batch, VCAGANModules, create_train_state
    from vcagan.train.state import make_optimizer

    devices = jax.devices()[:n_devices]
    n_avail = len(devices)
    model_parallel = 2 if (n_avail % 2 == 0 and n_avail >= 4) else 1
    mesh = make_mesh(model_parallel=model_parallel, devices=devices)
    data_size = mesh.shape["data"]

    modules = VCAGANModules.create()
    cfg = TrainConfig()
    g_tx = make_optimizer(
        cfg.lr, cfg.weight_decay, cfg.amsgrad, cfg.lr_milestones, cfg.lr_gamma, 10
    )
    d_tx = make_optimizer(
        cfg.lr, cfg.weight_decay, cfg.amsgrad, cfg.lr_milestones, cfg.lr_gamma, 10
    )
    state, _, _ = create_train_state(jax.random.PRNGKey(seed), modules, cfg, 10)

    # Small shapes on purpose: the gate validates sharding/collective
    # CORRECTNESS, and a second-order GAN step on 8 virtual devices of a
    # 1-vCPU host runs ~4 min at (20, 48) — image 24 executes ~2x faster
    # with the identical program structure (MULTICHIP_r04 timed out on
    # exactly this cost).  Frames must stay >= 20: the phase-1
    # discriminator's 5x5 VALID head needs >= 20 mel frames.
    frames, image = 20, 24
    b = max(data_size, 2)
    rng = np.random.default_rng(seed)
    batch = Batch(
        video=jnp.asarray(
            rng.standard_normal((b, frames, image, image, 1)), jnp.float32
        ),
        mel=jnp.asarray(
            np.clip(rng.standard_normal((b, 80, 4 * frames)), -1, 1), jnp.float32
        ),
        spec=jnp.asarray(
            np.abs(rng.standard_normal((b, 321, 4 * frames))), jnp.float32
        ),
        vid_len=jnp.full((b,), frames, jnp.int32),
        mel_len=jnp.full((b,), 4 * frames, jnp.int32),
    )
    key = jax.random.PRNGKey(1)
    return dict(
        mesh=mesh,
        model_parallel=model_parallel,
        data_size=data_size,
        modules=modules,
        cfg=cfg,
        g_tx=g_tx,
        d_tx=d_tx,
        state=state,
        batch=batch,
        key=key,
    )


def lower_sharded_step(problem) -> tuple[Any, Any, Any, Any]:
    """Shard state/batch, build the mesh-aware step, and LOWER it (no
    compile).  Returns (lowered, sharded_state, sharded_batch, mesh)."""
    from vcagan.parallel import shard_batch, shard_state
    from vcagan.train import make_train_step

    mesh = problem["mesh"]
    with mesh:
        sh_state = shard_state(problem["state"], mesh)
        sh_batch = shard_batch(problem["batch"], mesh)
        step = make_train_step(
            problem["modules"],
            problem["g_tx"],
            problem["d_tx"],
            problem["cfg"],
            donate=False,
            mesh=mesh,
        )
        lowered = step.lower(sh_state, sh_batch, problem["key"])
    return lowered, sh_state, sh_batch, mesh


_LOC_RE = re.compile(r"loc\(.*?\)|#loc\d*(?: = .*)?$", re.MULTILINE)


def canonical_hash(lowered) -> str:
    """sha256 of the lowered StableHLO with location metadata stripped —
    the same canonicalization the persistent compile cache effectively
    keys on (strip-debuginfo only; see commit d6b2880's trace-order
    analysis)."""
    text = lowered.as_text()
    text = _LOC_RE.sub("", text)
    return hashlib.sha256(text.encode()).hexdigest()


def g_param_leaf_stats(params) -> dict[str, float]:
    """Per-leaf mean(|p|) of the generator-side params, float64 on host."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = float(np.mean(np.abs(np.asarray(leaf, dtype=np.float64))))
    return out


def run_replicated_reference(problem):
    """The unsharded step on one device: metrics + updated-param stats.
    One full CPU compile — offline/fallback use only."""
    from vcagan.train import make_train_step

    step_ref = make_train_step(
        problem["modules"],
        problem["g_tx"],
        problem["d_tx"],
        problem["cfg"],
        donate=False,
    )
    ref_state, ref_metrics = step_ref(problem["state"], problem["batch"], problem["key"])
    jax.block_until_ready(ref_metrics)
    return (
        {k: float(v) for k, v in ref_metrics.items()},
        g_param_leaf_stats(ref_state.g_params),
    )


def load_golden() -> dict | None:
    try:
        with open(GOLDEN_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def save_golden(golden: dict) -> None:
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")


def seed_compile_cache() -> int:
    """Copy committed dryrun executables into the active persistent cache
    dir (so the gate's one compile is a cache load).  Returns the number
    of entries copied."""
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir or not os.path.isdir(SEED_CACHE_DIR):
        return 0
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in os.listdir(SEED_CACHE_DIR):
        src = os.path.join(SEED_CACHE_DIR, name)
        dst = os.path.join(cache_dir, name)
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
            n += 1
    return n


def compare_to_golden(metrics: dict, g_stats: dict[str, float], golden: dict):
    """Assert sharded results match the golden replicated reference.
    Returns (max_metric_rel_delta, max_leaf_stat_delta)."""
    lr = float(golden["lr"])
    metric_delta = 0.0
    for k, rv in golden["metrics"].items():
        v = float(metrics[k])
        assert np.isfinite(v), f"{k} not finite after sharded step: {v}"
        d = abs(v - float(rv)) / max(abs(float(rv)), 1e-6)
        metric_delta = max(metric_delta, d)
        assert d < METRIC_RTOL, f"sharded {k}={v} vs golden {rv} (rel {d:.2e})"
    stat_delta = 0.0
    gold_stats = golden["g_param_mean_abs"]
    assert set(gold_stats) == set(g_stats), "g_param tree changed vs golden"
    # elementwise Adam bound: reassociation can flip ~lr*sign(grad) per
    # element, so |mean|a| - mean|b|| <= mean|a-b| <= 2*lr; assert at 2.5x.
    for k, rv in gold_stats.items():
        d = abs(g_stats[k] - float(rv))
        stat_delta = max(stat_delta, d)
        assert d <= 2.5 * lr, f"g_param leaf {k}: mean|p| {g_stats[k]} vs golden {rv}"
    return metric_delta, stat_delta
