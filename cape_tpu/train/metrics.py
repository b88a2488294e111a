"""Lightweight metrics logging and profiling hooks.

Replaces the reference's TensorBoard summaries (lib/models.py:400-414,
918-922) with: console lines, an append-only JSONL metrics file per run,
EMA-smoothed G/D losses (the reference's ExponentialMovingAverage(0.9)),
and optional jax.profiler trace capture around a step window.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class EMA:
    """Exponential moving average, decay 0.9 like the reference."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.value: float | None = None

    def update(self, x: float) -> float:
        self.value = x if self.value is None else self.decay * self.value + (1 - self.decay) * x
        return self.value


class MetricsLogger:
    def __init__(
        self,
        run_dir: str,
        filename: str = "metrics.jsonl",
        write: bool = True,
        tensorboard: bool = False,
    ):
        """write=False keeps the EMA state but touches no filesystem —
        non-lead ranks of a multi-controller run use this so only the
        lead process creates run_dir / metrics.jsonl. tensorboard=True
        additionally mirrors every scalar into a first-party TensorBoard
        event file in run_dir (train/tb_events.py; the reference's only
        observability surface, lib/models.py:399-414)."""
        self._fh = None
        self.tb = None
        if write:
            os.makedirs(run_dir, exist_ok=True)
            self.path = os.path.join(run_dir, filename)
            self._fh = open(self.path, "a")
            if tensorboard:
                from cape_tpu.train.tb_events import TBEventWriter

                self.tb = TBEventWriter(run_dir)
        self.ema_g = EMA()
        self.ema_d = EMA()
        self.t0 = time.time()

    def log(self, step: int, payload: dict[str, Any], echo: bool = False) -> None:
        if self._fh is None:
            return
        record = {"step": int(step), "t": round(time.time() - self.t0, 3)}
        record.update(
            {k: (float(v) if hasattr(v, "__float__") else v) for k, v in payload.items()}
        )
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self.tb is not None:
            from cape_tpu.train.tb_events import tb_tag

            self.tb.add_scalars(
                step,
                {
                    tb_tag(k): float(v)
                    for k, v in payload.items()
                    if isinstance(v, (int, float)) or hasattr(v, "__float__")
                },
            )
        if echo:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
                if k not in ("t",)
            )
            print(parts, flush=True)

    def close(self):
        if self._fh is not None:
            self._fh.close()
        if self.tb is not None:
            self.tb.close()


def profile_steps(log_dir: str):
    """Context manager capturing a jax.profiler trace for the enclosed steps."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def _ctx():
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return _ctx()
