"""Attribute the train step's small-fusion tail from the optimized HLO.

The round-2 profile showed the compiled train step is a long tail of
~13k small fusions (CLAUDE.md).  Per-op timing through the tunnel is
meaningless (~25 ms dispatch floor), but the OPTIMIZED HLO the TPU
compiler returns (``compiled.as_text()``) carries every fusion with its
op_name/source metadata, so the tail can be attributed statically:
which module's backward produces the thousands of tiny ops, and how much
output traffic each group moves.

Usage:
  python tools/fusion_tail.py [--batch 16] [--window 40] [--bf16] [--top 25]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcagan.runtime import enable_compilation_cache

enable_compilation_cache()

import jax


def build_compiled(batch_size: int, window: int, bf16: bool,
                   remat: str = "none", d_phase: str = "ref"):
    from vcagan.train import make_train_step

    from _fixtures import train_fixture

    modules, cfg, g_tx, d_tx, state, batch = train_fixture(
        batch_size, window, bf16
    )
    # donate=True + compiler_options=None matches the bench_train session
    # executables exactly, so the (expensive) TPU compile is a
    # persistent-cache load whenever the same config was already benched —
    # the analysis only needs compiled.as_text().  (The shipped default
    # adds the scoped-VMEM option; pass it explicitly here if you want to
    # attribute THAT executable and are willing to compile it.)
    step_fn = make_train_step(modules, g_tx, d_tx, cfg, donate=True,
                              remat=remat, d_phase=d_phase,
                              compiler_options=None)
    return step_fn.lower(state, batch, jax.random.PRNGKey(0)).compile()


_SHAPE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64|u64)\[([0-9,]*)\]")
_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}


def _out_bytes(line: str) -> int:
    """Bytes of the instruction's output tuple.

    The output shape annotation sits after '=' in HLO text
    (``%name = f32[16,40,...]{...} fusion(...)``); shapes are taken up to
    the opcode's '(' argument list so operand shapes never count.
    """
    body = line.split(" = ", 1)[1] if " = " in line else line
    m = re.match(r"\(?([^()]*?)\)?\s*(fusion|copy|convolution|dot|custom-call|"
                 r"reduce|reduce-window|transpose|bitcast|all-reduce|scatter|"
                 r"dynamic-slice|dynamic-update-slice|rng-bit-generator)\(",
                 body)
    # no anchored opcode -> conservatively scan only the line head, which
    # holds at most the output tuple
    shapes_str = m.group(1) if m else body[:120]
    total = 0
    for dt, dims in _SHAPE.findall(shapes_str):
        n = 1
        if dims:
            for d in dims.split(","):
                if d:
                    n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", type=str, default="none")
    p.add_argument("--d_phase", type=str, default="ref",
                   choices=("ref", "batched"))
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--dump", type=str, default=None, help="write HLO text here")
    args = p.parse_args()

    compiled = build_compiled(args.batch, args.window, args.bf16,
                              remat=args.remat, d_phase=args.d_phase)
    hlo = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)

    # entry-computation instruction lines: attribute every fusion/copy/etc.
    # to its op_name metadata (the jax source scope)
    counts = defaultdict(int)
    bytes_by = defaultdict(int)
    kind_counts = defaultdict(int)
    small = defaultdict(int)  # <128 KiB output: latency-tail candidates
    n_instr = 0
    for line in hlo.splitlines():
        ls = line.strip()
        if not ls.startswith("%") and " = " not in ls:
            continue
        mk = re.search(r"\b(fusion|copy|convolution|dot|custom-call|reduce(?:-window)?|"
                       r"transpose|scatter|dynamic-slice|dynamic-update-slice|"
                       r"all-reduce|rng-bit-generator)\(", ls)
        if not mk:
            continue
        n_instr += 1
        kind = mk.group(1)
        kind_counts[kind] += 1
        mo = re.search(r'op_name="([^"]*)"', ls)
        scope = "<none>"
        if mo:
            # keep the jit(...)/ prefix trimmed, take the leading 3 scope parts
            parts = mo.group(1).split("/")
            parts = [q for q in parts if not q.startswith("jit(")]
            scope = "/".join(parts[:3]) if parts else "<none>"
        b = _out_bytes(ls)
        counts[scope] += 1
        bytes_by[scope] += b
        if b < (128 << 10):
            small[scope] += 1

    print(f"instructions (fusion-like): {n_instr}")
    print("by kind:", dict(sorted(kind_counts.items(), key=lambda kv: -kv[1])))
    print(f"\ntop {args.top} scopes by instruction count "
          f"(count, <128KiB-out count, total out MiB):")
    for scope, c in sorted(counts.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {c:6d}  {small[scope]:6d}  {bytes_by[scope] / (1 << 20):9.1f}  {scope}")


if __name__ == "__main__":
    main()
