"""Shared kernel-entry helpers."""

from __future__ import annotations

import jax


def auto_interpret(interpret: bool) -> bool:
    """Mosaic only targets TPU; on the CPU backend every kernel entry runs
    in pallas interpret mode (this is how the test suite and the virtual
    multi-chip mesh exercise the kernels)."""
    return True if jax.default_backend() == "cpu" else interpret
