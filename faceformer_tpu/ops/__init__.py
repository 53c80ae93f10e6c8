"""Pallas TPU kernels for the hot ops.

Default: ON when running on a TPU backend (the kernels beat the XLA-composed
paths on every measured training and decode shape — see benchmarks/README.md),
OFF elsewhere (on CPU they would run through the interpreter, which is for
parity tests, not speed). Override with FACEFORMER_PALLAS=1/0 or
faceformer_tpu.ops.enable().
"""

import os

_ENV = os.environ.get("FACEFORMER_PALLAS", "").strip().lower()
_TRUTHY = ("1", "true", "yes", "on")
_FALSY = ("0", "false", "no", "off")
if _ENV in ("", "auto"):
    _FORCED = None
elif _ENV in _TRUTHY or _ENV in _FALSY:
    _FORCED = _ENV in _TRUTHY
else:
    raise ValueError(
        f"FACEFORMER_PALLAS={_ENV!r} not understood; use 1/0, true/false, "
        "yes/no, on/off, or auto")


def enable(on: bool = True) -> None:
    global _FORCED
    _FORCED = on


def enabled() -> bool:
    if _FORCED is not None:
        return _FORCED
    import jax

    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas kernels need the interpreter off-TPU (CPU test runs)."""
    import jax

    return jax.default_backend() != "tpu"
