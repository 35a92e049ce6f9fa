"""Refresh the committed suite seed cache (data/test_cache/).

The test suite's dominant cold cost is a handful of multi-minute XLA CPU
compiles of the full train step (tests/test_parallel.py, the train-step and
loop tests).  tests/conftest.py seeds the suite's persistent cache from
data/test_cache/ so cold checkouts skip them — the same mechanism as the
multichip dryrun's data/dryrun_cache (vcagan/parallel/dryrun.py).

Flow (two steps, so this tool stays cheap):

  rm -rf .jax_cache && python -m pytest tests/ -q   # populate fresh cache
  python tools/refresh_test_cache.py                # snapshot big entries

Only entries >= --min_bytes are kept: executable size tracks compile time
well enough here, and the long tail of tiny sub-second jits is not worth
committing.  Keys are stable across checkouts on the CI image because
conftest pins the key-relevant inputs (XLA_FLAGS string, in-repo cache-dir
path); see CLAUDE.md "PERSISTENT-CACHE KEY TRAPS".
"""

import argparse
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIVE = os.path.join(REPO, ".jax_cache")
SEED = os.path.join(REPO, "data", "test_cache")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--min_bytes", type=int, default=512 * 1024)
    p.add_argument(
        "--keep", type=int, default=24, help="max entries, largest first"
    )
    p.add_argument(
        "--exclude", type=str, default="jit_forward",
        help="comma list of entry-name prefixes to skip (the constant-"
        "embedding jit_forward eval executables are ~56 MB each and "
        "compile in ~1 min — not worth committing; the multi-minute "
        "costs are the ~2 MB jit_train_step programs)",
    )
    args = p.parse_args()
    excludes = tuple(x for x in args.exclude.split(",") if x)

    if not os.path.isdir(LIVE):
        raise SystemExit(f"no live cache at {LIVE}; run the suite first")
    entries = sorted(
        (
            (os.path.getsize(os.path.join(LIVE, n)), n)
            for n in os.listdir(LIVE)
            if os.path.isfile(os.path.join(LIVE, n))
        ),
        reverse=True,
    )
    picked = [
        (s, n)
        for s, n in entries
        if s >= args.min_bytes and not n.startswith(excludes)
    ][: args.keep]
    if os.path.isdir(SEED):
        shutil.rmtree(SEED)
    os.makedirs(SEED)
    total = 0
    for size, name in picked:
        shutil.copyfile(os.path.join(LIVE, name), os.path.join(SEED, name))
        total += size
        print(f"  {size / 1e6:8.2f} MB  {name}")
    print(
        f"seeded {len(picked)}/{len(entries)} entries, {total / 1e6:.1f} MB "
        f"-> {SEED} (commit it)"
    )


if __name__ == "__main__":
    main()
