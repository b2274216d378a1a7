"""Numeric debugging hooks.

The reference asserts the fused spatial attention is NaN-free on every
forward (modules/layers/transformers.py:246). A Python assert can't run
inside a jitted TPU program, so the analog here is an opt-in host
callback: set ``MSR3D_NAN_CHECKS=1`` and every guarded tensor is checked
on host as values stream back (ordered with the computation via
``jax.debug.callback``). Off by default — the callback forces a D2H sync
per call, which would serialize the hot path.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_ENABLED = os.environ.get("MSR3D_NAN_CHECKS", "") not in ("", "0", "false")


def nan_checks_enabled() -> bool:
    return _ENABLED


def assert_finite(x: jax.Array, name: str) -> jax.Array:
    """Identity unless MSR3D_NAN_CHECKS=1, then a host-side finite check
    (reference transformers.py:246 analog)."""
    if not _ENABLED:
        return x

    def check(val):
        bad = np.size(val) - np.count_nonzero(np.isfinite(val))
        if bad:
            raise FloatingPointError(
                f"{name}: {bad}/{np.size(val)} non-finite values"
            )

    jax.debug.callback(check, x)
    return x
