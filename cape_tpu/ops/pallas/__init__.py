"""Pallas TPU kernels for the hot mesh ops.

Routing (see ops.cheb.cheb_conv and docs/PERF.md):
  * the large-batch kernel v3 is ON automatically past the measured
    batch/column thresholds, gated per-op by `BandedOp.allow_pallas`
    (set from `CAPEConfig.use_pallas` via build_graph_context);
  * the experimental small-batch v2 kernel is opt-in;
  * the CAPE_TPU_PALLAS env var overrides BOTH directions globally:
    "0" is a kill switch that forces the XLA banded path everywhere
    (escape hatch if a kernel misbehaves on a new backend), "1" also
    enables the v2 experiment. Unset means "follow the config".
"""

import os


def _env() -> str | None:
    return os.environ.get("CAPE_TPU_PALLAS")


_enabled = _env() == "1"


def enabled() -> bool:
    """Opt-in gate for the experimental small-batch v2 kernel."""
    return _enabled


def set_enabled(value: bool) -> None:
    global _enabled
    _enabled = bool(value)


def killed() -> bool:
    """Global kill switch: CAPE_TPU_PALLAS=0 disables every Pallas kernel,
    including the auto-selected large-batch v3 path (ADVICE round 2)."""
    return _env() == "0"
