"""TPU compiler-option sweep against the train step's small-fusion tail.

tools/fusion_tail.py attributes the compiled fp32 b16x40 train step to
14.9k ENTRY-level instructions: ~2.5k async copy pairs (~3.6 GB of pure
copy traffic), ~1.6k fusions (62% with outputs under 64 KiB), ~1.9k tiny
optimizer adds.  No single hot spot — so the candidate lever is compiler
scheduling/fusion policy, swept here as whole-program measurements
(CLAUDE.md: microbenchmarks through the relay are meaningless; each
variant runs tools/bench_train.py in a fresh subprocess and reports the
same whole-step clips/s).

Mechanism note: client-side ``XLA_FLAGS`` cannot steer the TPU compiler
in this environment — the axon backend compiles SERVER-side behind the
tunnel, and the local process aborts on unknown ``--xla_tpu_*`` flags.
PJRT ``compiler_options`` (``lower().compile(compiler_options=...)``)
DO reach the server-side compiler, so the sweep rides
``bench_train.py --compiler_opts``.  Options the server rejects are
reported as "rejected" — the sweep self-prunes across libtpu versions.

Usage:
  python tools/sweep_xla_flags.py --batch 64 --bf16 --remat r1
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = {
    # make_train_step ships measured options by default, so the sweep's
    # baseline must explicitly compile with NO options ('none') to stay
    # an uncontaminated compiler-default row
    "baseline": "none",
    # larger scoped-vmem budget lets the fusion emitter build bigger
    # fusions before spilling (default is 16 MiB-ish on v5e)
    "vmem_64m": "xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_32m": "xla_tpu_scoped_vmem_limit_kib=32768",
    # latency-hiding scheduler: overlaps async copies with compute
    "lhs": "xla_tpu_enable_latency_hiding_scheduler=true",
    "lhs+vmem64m": (
        "xla_tpu_enable_latency_hiding_scheduler=true,"
        "xla_tpu_scoped_vmem_limit_kib=65536"
    ),
    # aggressive multi-output fusion
    "nested_fusion": "xla_tpu_enable_multi_level_nested_loop_fusion=true",
}

_RE = re.compile(r"([0-9.]+) clips/s")


def run_variant(name: str, opts: str, bench_args) -> dict:
    cmd = [sys.executable, os.path.join(HERE, "bench_train.py")] + bench_args
    cmd += ["--compiler_opts", opts]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    except subprocess.TimeoutExpired:
        return {"variant": name, "opts": opts, "status": "timeout"}
    text = out.stdout + out.stderr
    m = _RE.search(text)
    if out.returncode != 0 or not m:
        reason = "rejected" if "INVALID_ARGUMENT" in text or "Unknown" in text else "failed"
        tail = text.strip().splitlines()[-3:]
        return {"variant": name, "opts": opts, "status": reason, "tail": tail}
    return {
        "variant": name,
        "opts": opts,
        "status": "ok",
        "clips_per_s": float(m.group(1)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", type=str, default="r1")
    p.add_argument("--only", type=str, default=None, help="comma list of variants")
    args = p.parse_args()

    bench_args = ["--batch", str(args.batch), "--window", str(args.window),
                  "--remat", args.remat]
    if args.bf16:
        bench_args.append("--bf16")

    names = args.only.split(",") if args.only else list(VARIANTS)
    results = []
    for name in names:
        r = run_variant(name, VARIANTS[name], bench_args)
        results.append(r)
        print(json.dumps(r), flush=True)
    ok = [r for r in results if r["status"] == "ok"]
    if ok:
        best = max(ok, key=lambda r: r["clips_per_s"])
        base = next((r for r in ok if r["variant"] == "baseline"), None)
        if base:
            print(
                f"# best: {best['variant']} {best['clips_per_s']:.1f} clips/s "
                f"({best['clips_per_s'] / base['clips_per_s'] * 100 - 100:+.1f}% "
                "vs baseline)"
            )


if __name__ == "__main__":
    main()
