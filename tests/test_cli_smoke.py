"""End-to-end smoke of the inference CLI mains on synthetic fixtures.

Regression coverage for two classes of CLI-only breakage that module
tests cannot see (both shipped broken at least once):

- a conditional ``import jax`` inside ``main`` shadowing the module-level
  import, so any invocation without ``--platform`` crashed with
  UnboundLocalError before device use;
- ``test_lrs`` sharing ``train_lrs.build_config`` while not defining the
  train-only ``--bf16`` flag.

Tiny shapes keep the CPU compile bounded; one batch end-to-end covers
argparse -> config -> dataset fallback -> device pipeline -> eval ->
vocode -> metrics -> artifact dump (reference test.py / test_LRS.py
drive the same composition).
"""

from __future__ import annotations

import os

import numpy as np


class TestInferenceCLIs:
    def test_grid_test_main(self, tmp_path):
        from vcagan.cli.test import main

        out = str(tmp_path / "grid")
        main([
            "--grid", str(tmp_path / "missing"), "--batch_size", "2",
            "--window_size", "20", "--max_timesteps", "20",
            "--max_batches", "1", "--out_dir", out,
        ])
        assert os.path.exists(os.path.join(out, "metric.txt"))
        wavs = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(os.path.join(out, "wav"))
            for f in fs
        ]
        assert wavs, "no wav artifacts dumped"

    def test_lrs_test_main(self, tmp_path):
        from vcagan.cli.test_lrs import main

        out = str(tmp_path / "lrs")
        main([
            "--data", str(tmp_path / "missing"), "--batch_size", "2",
            "--window_size", "24", "--max_timesteps", "60",
            "--max_batches", "1", "--out_dir", out,
        ])
        metric = os.path.join(out, "LRS2", "metric.txt")
        assert os.path.exists(metric)
        npzs = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(os.path.join(out, "LRS2", "mel"))
            for f in fs
        ]
        assert npzs, "no mel artifacts dumped"
        blob = np.load(npzs[0])
        assert np.isfinite(blob["mel"]).all()
