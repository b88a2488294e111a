"""Pallas TPU kernels for the hot mesh ops.

Routing (see ops.cheb.cheb_conv and docs/PERF.md):
  * the large-batch kernel v3 is ON automatically past the measured
    batch/column thresholds, gated per-op by `BandedOp.allow_pallas`
    (set from `CAPEConfig.use_pallas` via build_graph_context);
  * the experimental small-batch v2 kernel is opt-in (set_enabled or
    CAPE_TPU_PALLAS=1);
  * the CAPE_TPU_PALLAS env var overrides the config in BOTH directions
    and is read LIVE at every routing decision: "0" forces the XLA
    banded path everywhere (kill switch for a misbehaving kernel on a
    new backend), "1" forces Pallas routing on even when
    use_pallas=False (and additionally enables the v2 experiment).
    Unset means "follow the config".
"""

import os

_enabled = False  # set_enabled(True): opt into the v2 experiment from code


def override() -> bool | None:
    """Live CAPE_TPU_PALLAS reading: False ('0'), True ('1'), None (unset
    or anything else — follow the per-op config)."""
    v = os.environ.get("CAPE_TPU_PALLAS")
    if v == "0":
        return False
    if v == "1":
        return True
    return None


def enabled() -> bool:
    """Opt-in gate for the experimental small-batch v2 kernel."""
    return _enabled or override() is True


def set_enabled(value: bool) -> None:
    global _enabled
    _enabled = bool(value)
