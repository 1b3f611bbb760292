"""Shared interpret-mode policy for the Pallas kernel wrappers.

Every fused-kernel wrapper defaults to the Pallas interpreter when the
process is not running on a TPU (tests, CPU-mesh dryruns). That HOST-based
default is wrong at one place: ahead-of-time lowering for a DIFFERENT
target platform (``jax.export`` in ``cgat_tpu.serving``) — a TPU artifact
exported from a CPU host must carry the real Mosaic kernels, not the
interpreter. ``force_interpret(False)`` overrides the default during such
lowering (r4 verdict ask 8).
"""
from __future__ import annotations

import contextlib

import jax

_FORCE: bool | None = None  # None = auto (host backend)


def interpret_default() -> bool:
    """Interpret-mode default for wrappers whose caller passed None."""
    if _FORCE is not None:
        return _FORCE
    return jax.default_backend() != "tpu"


@contextlib.contextmanager
def force_interpret(value: bool | None):
    """Temporarily pin the wrappers' interpret default (None = back to
    auto). Used by serving export to lower real Mosaic kernels for a TPU
    target from any host."""
    global _FORCE
    prev = _FORCE
    _FORCE = value
    try:
        yield
    finally:
        _FORCE = prev
