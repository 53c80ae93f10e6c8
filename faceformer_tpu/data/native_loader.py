"""ctypes bridge to the native C++ data loader (native/dataloader.cc).

One threaded C++ pass turns a list of sample JSON files into the final
static-shape arrays (input grids + packed label grids) — replacing the
Python json.load preload plus per-sample packing the reference does in
DataLoader worker processes (reference faceformer/datasets/data.py:48-51,
trainer.py:33). Packing semantics are parity-tested against
faceformer_tpu/data/packing.py (tests/test_native_loader.py).

The loader returns None whenever the library is unavailable or any file
fails to parse/pack — callers fall back to the Python path, so error
behavior (which exception, for which sample) stays identical to the
reference's.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence

import numpy as np

from faceformer_tpu.config import ModelConfig
from faceformer_tpu.geometry import native as _geometry_native


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    if getattr(lib, "_loader_bound", False):
        return lib
    c = ctypes
    lib.load_pack_files.argtypes = [
        c.POINTER(c.c_char_p), c.c_int64, c.c_int32, c.c_int32,
        c.c_int32, c.c_int32, c.c_int32,
        c.c_int32, c.c_int32, c.c_int32, c.c_int32, c.c_int32,
        c.c_int32, c.c_int32,
        c.POINTER(c.c_float), c.POINTER(c.c_uint8), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
        c.c_char_p, c.c_int64,
    ]
    lib.load_pack_files.restype = c.c_int64
    lib._loader_bound = True
    return lib


def available() -> bool:
    lib = _geometry_native.load()
    return lib is not None and hasattr(lib, "load_pack_files")


def load_pack_files(
    paths: Sequence[str],
    cfg: ModelConfig,
    parallel: bool,
    n_threads: int = 0,
) -> Optional[Dict[str, np.ndarray]]:
    """Parse + resample + pack ``paths`` in C++ threads.

    Returns dict(input (N,L,P,2) f32, input_mask (N,L) bool,
    num_input (N,) i32, label (N,T)|(N,L,T) i32, num_label|num_faces (N,) i32,
    failed: tuple of indices that must re-pack through the Python path),
    or None when the library is unavailable or EVERY file failed. Individual
    bad files don't silently revert the whole corpus to the (15x slower)
    Python preload: the warning names them and callers fall back per sample.
    """
    lib = _geometry_native.load()
    if lib is None or not hasattr(lib, "load_pack_files"):
        return None
    if cfg.point_dim != 2:
        return None
    _bind(lib)

    n = len(paths)
    tok = cfg.token
    L, P = cfg.num_lines, cfg.num_points_per_line
    T = cfg.max_face_length if parallel else cfg.label_seq_length

    inp = np.empty((n, L, P, 2), dtype=np.float32)
    mask = np.empty((n, L), dtype=np.uint8)
    num_input = np.empty(n, dtype=np.int32)
    label = np.empty((n, L, T) if parallel else (n, T), dtype=np.int32)
    num_label = np.empty(n, dtype=np.int32)
    ok = np.zeros(n, dtype=np.uint8)
    err = ctypes.create_string_buffer(1024)

    encoded = [p.encode() for p in paths]
    path_arr = (ctypes.c_char_p * n)(*encoded)

    c = ctypes
    failures = lib.load_pack_files(
        path_arr, n, n_threads, 1 if parallel else 0,
        L, P, T,
        tok.length, tok.PAD, tok.SOS, tok.SEP, tok.EOS,
        tok.face_type_offset, tok.DIR0,
        inp.ctypes.data_as(c.POINTER(c.c_float)),
        mask.ctypes.data_as(c.POINTER(c.c_uint8)),
        num_input.ctypes.data_as(c.POINTER(c.c_int32)),
        label.ctypes.data_as(c.POINTER(c.c_int32)),
        num_label.ctypes.data_as(c.POINTER(c.c_int32)),
        ok.ctypes.data_as(c.POINTER(c.c_uint8)),
        err, len(err))
    failed = tuple(int(i) for i in np.nonzero(ok == 0)[0])
    if failures:
        import warnings

        shown = ", ".join(paths[i] for i in failed[:5])
        more = f" (+{len(failed) - 5} more)" if len(failed) > 5 else ""
        if len(failed) == n:
            warnings.warn(
                f"native loader: all {n} files failed "
                f"(first: {err.value.decode(errors='replace')}); "
                "falling back to the Python packer")
            return None
        warnings.warn(
            f"native loader: {failures}/{n} files failed, re-packing them "
            f"through the Python path: {shown}{more} "
            f"(first error: {err.value.decode(errors='replace')})")

    out = {
        "input": inp,
        "input_mask": mask.astype(bool),
        "num_input": num_input,
        "label": label,
        "failed": failed,
    }
    if parallel:
        out["num_faces"] = num_label
    else:
        out["num_label"] = num_label
    return out


def enabled() -> bool:
    """Opt out with FACEFORMER_NATIVE_LOADER=0."""
    return os.environ.get("FACEFORMER_NATIVE_LOADER", "1") not in (
        "0", "", "false")
