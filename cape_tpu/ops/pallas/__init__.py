"""Pallas TPU kernels for the hot mesh ops.

Enabled via CAPE_TPU_PALLAS=1 or set_enabled(True); the XLA banded
formulation is the default until a kernel wins on the target hardware
(see docs/PERF.md for measurements).
"""

import os

_enabled = os.environ.get("CAPE_TPU_PALLAS", "0") == "1"


def enabled() -> bool:
    return _enabled


def set_enabled(value: bool) -> None:
    global _enabled
    _enabled = bool(value)
