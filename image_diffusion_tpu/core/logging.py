"""Console + experiment-tracker logging.

Equivalent of the reference BasicLogger (reference modules/util.py:17-54):
stdlib logging to console plus an optional MLflow backend on a local sqlite
file.  MLflow is imported lazily and the logger degrades to CSV rows under
`logs_dir` when MLflow is unavailable, so training never depends on it.
Metric namespaces (vae/*, gan/*, unet/*, dev/*, util/*) match the reference.
"""

from __future__ import annotations

import csv
import logging
import os
from datetime import datetime


def get_run_name(prefix: str = "") -> str:
    """Timestamped run name, same format as reference modules/util.py:141-143."""
    return datetime.now().strftime(f"{prefix}_%b-%d_%H-%M-%S")


class BasicLogger:
    def __init__(self, logs_dir: str, run_name: str, no_mlflow: bool, log_interval: int):
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s %(levelname)s : %(message)s",
            datefmt="[%H:%M:%S]",
        )
        self.log_interval = log_interval
        self.logs_dir = logs_dir
        self.run_name = run_name
        self._mlflow = None
        self._csv_path = None

        # multi-host: only process 0 writes metrics/figures (console stays
        # on every host for debuggability)
        try:
            import jax

            self._is_main = jax.process_index() == 0
        except Exception:  # pragma: no cover
            self._is_main = True
        if not self._is_main:
            return

        os.makedirs(logs_dir, exist_ok=True)
        if not no_mlflow:
            try:
                import mlflow  # optional dependency

                mlflow.set_tracking_uri(f"sqlite:///{logs_dir}/mlflow.db")
                mlflow.set_experiment(run_name)
                self._mlflow = mlflow
            except Exception:  # pragma: no cover - mlflow missing or broken
                self.log_console("MLflow unavailable; logging metrics to CSV instead.")
        if self._mlflow is None:
            # --no-mlflow (or a broken mlflow) still leaves an auditable
            # metric trail; the reference's --no-mlflow drops metrics
            # entirely (modules/util.py:27-33)
            self._csv_path = os.path.join(logs_dir, f"{run_name}_metrics.csv")

    def log_metric(self, name: str, val: float, step: int) -> None:
        if self._mlflow is not None:
            self._mlflow.log_metric(name, val, step=step)
        elif self._csv_path is not None:
            new = not os.path.exists(self._csv_path)
            with open(self._csv_path, "a", newline="") as f:
                w = csv.writer(f)
                if new:
                    w.writerow(["step", "name", "value"])
                w.writerow([step, name, float(val)])

    def log_metrics(self, metrics: dict[str, float], step: int) -> None:
        for name, val in metrics.items():
            self.log_metric(name, val, step)

    def log_figure(self, name: str, figure) -> None:
        try:
            # single-writer invariant: like metrics/checkpoints, only
            # process 0 writes figures (concurrent savefig to one shared
            # path corrupts the file)
            if not self._is_main:
                return
            if self._mlflow is not None:
                self._mlflow.log_figure(figure, name)
            elif self.logs_dir is not None:
                path = os.path.join(self.logs_dir, self.run_name, name)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                figure.savefig(path)
        finally:
            # the logger owns figure disposal: pyplot's Gcf registry would
            # otherwise keep every recon/preview figure alive for the run
            try:
                import matplotlib.pyplot as plt

                plt.close(figure)
            except Exception:  # pragma: no cover - figure not pyplot-managed
                pass

    def log_params(self, **kwargs) -> None:
        if self._mlflow is not None:
            self._mlflow.log_params(dict(kwargs))
        else:
            self.log_console(f"params: {kwargs}")

    def log_console(self, message: str) -> None:
        logging.info(message)
