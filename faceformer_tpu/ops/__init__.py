"""Pallas TPU kernels for the hot ops.

Enabled via FACEFORMER_PALLAS=1 (or faceformer_tpu.ops.enable()); every
kernel has an XLA-composed fallback and parity tests that run the kernels in
interpreter mode on CPU.
"""

import os

_ENABLED = os.environ.get("FACEFORMER_PALLAS", "0") not in ("0", "", "false")


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def interpret_mode() -> bool:
    """Pallas kernels need the interpreter off-TPU (CPU test runs)."""
    import jax

    return jax.default_backend() != "tpu"
