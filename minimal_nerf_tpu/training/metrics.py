"""Structured metrics logging: CSV scalars + PNG image dumps + console.

Replaces the reference's Weights & Biases logging (``train_nerf.py:23-25``,
``nerf_model.py:164-168,195-203``) with a dependency-free writer emitting the
same scalar set (train/val coarse/fine/total losses, lr, iteration speed) to
``{run_dir}/metrics.csv`` and reconstructed validation images to
``{run_dir}/images/``. A wandb backend can be layered on when available.
"""

from __future__ import annotations

import csv
import sys
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from minimal_nerf_tpu.utils import imageio as mio


class MetricsLogger:
    """Append-only CSV scalar logger with wide-row schema discovery.

    Set ``wandb_project`` to mirror scalars/images to Weights & Biases when
    the package is installed (the reference's logger, ``train_nerf.py:23``);
    silently degrades to CSV-only otherwise.
    """

    def __init__(self, run_dir, name: str = "run", echo: bool = True,
                 wandb_project: Optional[str] = None, resume: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        (self.run_dir / "images").mkdir(exist_ok=True)
        self.csv_path = self.run_dir / "metrics.csv"
        self.name = name
        self.echo = echo
        self._fieldnames = ["step"]
        self._rows = []
        if self.csv_path.exists():
            if resume:
                # resumed run: adopt the existing history so appends extend
                # it instead of a fresh logger clobbering it
                with open(self.csv_path, newline="") as f:
                    reader = csv.DictReader(f)
                    if reader.fieldnames:
                        self._fieldnames = list(reader.fieldnames)
                        self._rows = list(reader)
            else:
                # fresh run reusing a name: start a clean history rather
                # than interleaving two unrelated runs in one CSV
                self.csv_path.unlink()
        self._t0 = time.perf_counter()
        self._wandb = None
        if wandb_project:
            # degrade to CSV-only on ANY init failure (missing package, no
            # network, no credentials, ...) — logging must not kill training
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=name)
            except Exception as e:  # pragma: no cover - env dependent
                print(f"[metrics] wandb disabled ({e!r}); CSV-only",
                      file=sys.stderr)

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        row = {"step": int(step)}
        for k, v in scalars.items():
            row[k] = float(v)
        new_keys = [k for k in row if k not in self._fieldnames]
        self._rows.append(row)
        if new_keys:
            # schema widened (e.g. val metrics first appear): rewrite once
            # with the new header — rare, a handful of times per run
            self._fieldnames.extend(new_keys)
            self._rewrite()
        else:
            # steady state: O(1) append, so a crash loses at most the row
            # being written (the old whole-file rewrite was O(n^2) over a
            # run and lost everything if interrupted mid-rewrite)
            with open(self.csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fieldnames).writerow(row)
        if self._wandb is not None:
            self._wandb.log(dict(scalars), step=int(step))
        if self.echo:
            parts = " ".join(f"{k}={row[k]:.6g}" for k in scalars)
            print(f"[{self.name}] step {step}: {parts}", file=sys.stderr)

    def log_hyperparams(self, params: Dict) -> None:
        import json

        with open(self.run_dir / "hparams.json", "w") as f:
            json.dump({k: str(v) for k, v in dict(params).items()}, f, indent=2)

    def log_image(self, key: str, image: np.ndarray, step: Optional[int] = None) -> Path:
        suffix = f"-{step}" if step is not None else ""
        path = self.run_dir / "images" / f"{key}{suffix}.png"
        mio.imwrite(path, image)
        if self._wandb is not None:
            # mirror reconstructions to wandb like the reference
            # (nerf_model.py:203: logger.log_image(key='recon', images=[im]))
            import wandb

            self._wandb.log(
                {"recon": [wandb.Image(np.asarray(image), caption=key)]},
                step=int(step) if step is not None else None,
            )
        return path

    def _rewrite(self) -> None:
        # rewrite keeps the header consistent as new metric keys appear
        with open(self.csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def close(self) -> None:
        """Finish the wandb run (if any) so a successor logger in the same
        process (progressive-schedule phase 2) starts its own cleanly."""
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None


class NullLogger:
    """No-op logger for non-primary processes of a multihost run.

    Every process executes the same training program (the collectives
    require it), but only process 0 may own the run directory; the rest get
    this sink (``training/trainer.py``, ``parallel/distributed.py``).
    """

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        pass

    def log_hyperparams(self, params: Dict) -> None:
        pass

    def log_image(self, key, image, step=None):
        return None

    def elapsed(self) -> float:
        return 0.0

    def close(self) -> None:
        pass
