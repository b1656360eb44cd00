"""Pallas TPU kernels; `absorb_enabled` is the dynamic kill-switch for the
round-3 LN/MLP absorption paths (read at TRACE time, so flipping
MEDSEG_ABSORB and re-jitting falls back to the round-2 kernel set —
bench.py uses this to survive a Mosaic rejection on untested hardware)."""

import os


def absorb_enabled() -> bool:
    return os.environ.get("MEDSEG_ABSORB", "1") != "0"
