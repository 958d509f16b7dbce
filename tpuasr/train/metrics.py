"""Metric logging: TensorBoard + append-only text log on process 0.

Scalar-name parity with the reference for easy comparison (run.py:129-162):
train/loss, train/learning_rate, train/loss_ctc, train/loss_rnnt, plus
framework-side throughput counters (audio_seconds_per_sec is the primary
performance metric per BASELINE.md).
"""

from __future__ import annotations

import os
import time


class MetricsWriter:
    def __init__(self, log_dir: str, text_log: str | None = None, enabled: bool | None = None):
        import jax

        self.enabled = enabled if enabled is not None else (jax.process_index() == 0)
        self.tb = None
        self.text = None
        if self.enabled:
            if log_dir:  # empty = console-only (no tensorboard event files)
                os.makedirs(log_dir, exist_ok=True)
                try:
                    from tensorboardX import SummaryWriter

                    self.tb = SummaryWriter(log_dir)
                except Exception:
                    self.tb = None
            if text_log:
                os.makedirs(os.path.dirname(text_log) or ".", exist_ok=True)
                self.text = open(text_log, "a", encoding="utf-8")

    def scalar(self, name: str, value: float, step: int) -> None:
        if self.tb is not None:
            self.tb.add_scalar(name, float(value), step)

    def scalars(self, values: dict, step: int, prefix: str = "") -> None:
        for k, v in values.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log(self, msg: str) -> None:
        if self.enabled:
            line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {msg}"
            print(line, flush=True)
            if self.text is not None:
                self.text.write(line + "\n")
                self.text.flush()

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
        if self.text is not None:
            self.text.close()


class StepTimer:
    """steps/s and audio-seconds/s counters (wenet common.py:337-353 parity,
    extended with the audio-throughput north-star metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.audio_seconds = 0.0

    def tick(self, audio_seconds: float = 0.0):
        self.steps += 1
        self.audio_seconds += audio_seconds

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def steps_per_second(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def audio_seconds_per_second(self) -> float:
        return self.audio_seconds / max(self.elapsed, 1e-9)
