"""Run logging: python logging + TensorBoard + best-model tracking.

Mirrors the reference ``Logger``/``BestModels``
(``src/utils/log.py:10-89``): stream+file logging, TensorBoard scalar
writer, and a tracker that keeps the best student/teacher params by a
validation metric and flushes them to disk periodically. The
codecarbon emissions tracker is optional (not present in this image);
pass ``carbon_dir`` to enable it when installed.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Dict, Optional

import jax
import numpy as np


class Logger:
    def __init__(
        self,
        logger_name: str = "t4s",
        log_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        level: int = logging.INFO,
        carbon_dir: Optional[str] = None,
    ):
        self.logger = logging.getLogger(logger_name)
        self.logger.setLevel(level)
        self.logger.handlers.clear()
        stream = logging.StreamHandler(sys.stdout)
        stream.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
        self.logger.addHandler(stream)
        if log_path:
            fh = logging.FileHandler(log_path)
            fh.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
            self.logger.addHandler(fh)

        self.tensorboard_writer = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tensorboard_writer = SummaryWriter(tensorboard_dir)
            except ImportError:
                self.logger.warning("tensorboard unavailable; scalar logging disabled")

        self.carbon_tracker = None
        if carbon_dir:
            try:
                from codecarbon import OfflineEmissionsTracker

                self.carbon_tracker = OfflineEmissionsTracker(
                    country_iso_code="USA", output_dir=carbon_dir
                )
                self.carbon_tracker.start()
            except ImportError:
                self.logger.info("codecarbon unavailable; emissions tracking disabled")

    def info(self, msg: str):
        self.logger.info(msg)

    def scalar(self, tag: str, value: float, step: int):
        if self.tensorboard_writer is not None:
            self.tensorboard_writer.add_scalar(tag, float(value), global_step=step)

    def scalars(self, prefix: str, values: Dict[str, Any], step: int):
        for k, v in values.items():
            try:
                self.scalar(f"{prefix}/{k}", float(np.asarray(v)), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self.tensorboard_writer is not None:
            self.tensorboard_writer.flush()
        if self.carbon_tracker is not None:
            self.carbon_tracker.stop()


class BestModels:
    """Track best student/teacher params by validation metric (higher is
    better), flushing to disk every ``flush_every`` updates."""

    def __init__(self, save_dir: str, flush_every: int = 2):
        self.save_dir = save_dir
        self.flush_every = flush_every
        self.best_metric = -np.inf
        self.best_epoch = -1
        self._student = None
        self._teacher = None
        self._student_ms = None
        self._teacher_ms = None
        self._since_flush = 0
        os.makedirs(save_dir, exist_ok=True)
        # elastic recovery: a resumed run must not let its first epoch
        # clobber a better pre-preemption best (flush writes the metric)
        metric_path = os.path.join(save_dir, "best_metric.json")
        if os.path.exists(metric_path):
            import json

            with open(metric_path) as f:
                prev = json.load(f)
            self.best_metric = float(prev.get("metric", -np.inf))
            self.best_epoch = int(prev.get("epoch", -1))

    def update(
        self,
        epoch: int,
        metric: float,
        student_params,
        teacher_params=None,
        student_model_state=None,
        teacher_model_state=None,
    ) -> bool:
        improved = metric > self.best_metric
        if improved:
            self.best_metric = metric
            self.best_epoch = epoch
            self._dirty = True
            self._student = jax.device_get(student_params)
            self._teacher = None if teacher_params is None else jax.device_get(teacher_params)
            # BatchNorm collections ride with their params so the flushed
            # best is usable (fresh-init stats would mis-normalize)
            self._student_ms = (
                None if not student_model_state else jax.device_get(student_model_state)
            )
            self._teacher_ms = (
                None if not teacher_model_state else jax.device_get(teacher_model_state)
            )
        self._since_flush += 1
        if self._since_flush >= self.flush_every:
            self.flush()
            self._since_flush = 0
        return improved

    def flush(self):
        # only rewrite when a new best arrived since the last flush.
        # Multi-host: update() runs identically on every process (metrics
        # and params are replicated), so _dirty flips everywhere in
        # lockstep and ALL processes reach the orbax saves below — orbax
        # save has internal cross-host barriers and must be called by
        # every host; only the tiny json write is primary-gated.
        if self._student is None or not getattr(self, "_dirty", False):
            return
        self._dirty = False
        import json

        from transformer4sed_tpu.utils.checkpoint import save_params

        save_params(os.path.join(self.save_dir, "best_student"), self._student)
        if self._teacher is not None:
            save_params(os.path.join(self.save_dir, "best_teacher"), self._teacher)
        if self._student_ms is not None:
            save_params(os.path.join(self.save_dir, "best_model_state"), self._student_ms)
        if self._teacher_ms is not None:
            save_params(
                os.path.join(self.save_dir, "best_model_state_teacher"), self._teacher_ms
            )
        if jax.process_index() == 0:
            with open(os.path.join(self.save_dir, "best_metric.json"), "w") as f:
                json.dump({"metric": float(self.best_metric), "epoch": self.best_epoch}, f)
