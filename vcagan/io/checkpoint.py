"""Checkpointing with the reference's metric-named best-pointer semantics.

The reference torch.saves a dict of 7 state_dicts into files named
``Epoch_%04d_stoi_%.3f_estoi_%.3f_pesq_%.3f.ckpt`` and maintains a single
``Best_*.ckpt`` by deleting the previous best (reference: train.py:303-322).
Optimizer state is NOT saved there — resume silently restarts Adam moments.

Here the FULL train state (params, batch stats, both optimizer states,
step) goes through orbax; filenames keep the metric-encoding convention so
checkpoint directories read the same way.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_metric = self._scan_best()

    # -------------------------------------------------------------- naming

    @staticmethod
    def _name(epoch: int, stoi: float, estoi: float, pesq: float) -> str:
        return f"Epoch_{epoch:04d}_stoi_{stoi:.3f}_estoi_{estoi:.3f}_pesq_{pesq:.3f}"

    def _scan_best(self) -> float:
        best = 0.0
        for path in glob.glob(os.path.join(self.directory, "Best_*")):
            m = re.search(r"stoi_([0-9.]+)_", os.path.basename(path))
            if m:
                best = max(best, float(m.group(1).rstrip(".")))
        return best

    # ---------------------------------------------------------------- save

    def save(
        self,
        state,
        epoch: int,
        stoi: float = 0.0,
        estoi: float = 0.0,
        pesq: float = 0.0,
    ) -> str:
        """Save a checkpoint; maintain Best_* when STOI improves
        (reference best-by-STOI semantics, train.py:311-322)."""
        name = self._name(epoch, stoi, estoi, pesq)
        path = os.path.join(self.directory, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        self._ckpt.wait_until_finished()

        if stoi > self.best_metric:
            self.best_metric = stoi
            for prev in glob.glob(os.path.join(self.directory, "Best_*")):
                shutil.rmtree(prev, ignore_errors=True)
            best_path = os.path.join(self.directory, "Best_" + name)
            self._ckpt.save(best_path, jax.device_get(state))
            self._ckpt.wait_until_finished()
        return path

    # ---------------------------------------------------------------- load

    def restore(self, template, path: Optional[str] = None):
        """Restore into the structure of ``template`` (an abstract or
        concrete state).  Without ``path``, picks the latest epoch."""
        if path is None:
            path = self.latest()
            if path is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._ckpt.restore(path, template)

    def latest(self) -> Optional[str]:
        epochs = []
        for path in glob.glob(os.path.join(self.directory, "Epoch_*")):
            m = re.match(r"Epoch_(\d+)_", os.path.basename(path))
            if m:
                epochs.append((int(m.group(1)), path))
        return max(epochs)[1] if epochs else None

    def best(self) -> Optional[str]:
        paths = glob.glob(os.path.join(self.directory, "Best_*"))
        return paths[0] if paths else None
