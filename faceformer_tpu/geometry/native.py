"""ctypes bridge to the C++ geometry kernel (native/geometry_kernel.cc).

The kernel accelerates the host-side hot loops — per-sample edge resampling
in the data pipeline and batch face-enclosedness in eval post-processing.
Pure-Python fallbacks keep everything working when the library isn't built;
`build()` compiles it with g++ on demand (no pybind11, C ABI only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfaceformer_geometry.so"))
_SOURCES = ("geometry_kernel.cc", "dataloader.cc", "Makefile")
# must match faceformer_abi_version() in native/dataloader.cc — bumped
# together whenever an extern "C" signature changes, so a stale .so built
# from older sources is never called with the new argument layout
FACEFORMER_NATIVE_ABI = 2
_lib = None
_load_failed = False  # memoized: load() sits on per-sample hot paths


def _stale() -> bool:
    """True when the .so is missing or older than any source/Makefile."""
    if not os.path.exists(_LIB_PATH):
        return True
    built = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(src) > built
        for s in _SOURCES
        if os.path.exists(src := os.path.join(_NATIVE_DIR, s)))


def build(force: bool = False) -> bool:
    """Compile the kernel with make/g++ when stale. Returns True on success."""
    if not force and not _stale():
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        # a failed build/handshake is permanent for the process: callers
        # probe load() once per sample (resampling, enclosedness filters),
        # and re-running `make` per probe would cost minutes on an 8k
        # corpus before the Python fallback even starts
        return None
    if _stale():
        build()  # self-heal after source updates; no-op without a toolchain
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        lib.faceformer_abi_version.restype = ctypes.c_int64
        abi = int(lib.faceformer_abi_version())
    except AttributeError:
        abi = 1  # predates the handshake
    if abi != FACEFORMER_NATIVE_ABI:
        import warnings
        warnings.warn(
            f"native library ABI {abi} != expected {FACEFORMER_NATIVE_ABI} "
            f"({_LIB_PATH}); run `make -C native clean all` — "
            "using Python fallbacks")
        _load_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resample_edges.argtypes = [f64p, i64p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.resample_edges.restype = None
    lib.check_faces_enclosed.argtypes = [
        f64p, i64p, ctypes.c_int64, i64p, i64p, ctypes.c_int64,
        ctypes.c_double, u8p, i64p, i64p]
    lib.check_faces_enclosed.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def flatten_edges(edges: Sequence) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged polylines -> (points (N,2) float64, offsets (E+1,) int64)."""
    offsets = np.zeros(len(edges) + 1, dtype=np.int64)
    for i, e in enumerate(edges):
        offsets[i + 1] = offsets[i] + len(e)
    points = np.empty((int(offsets[-1]), 2), dtype=np.float64)
    for i, e in enumerate(edges):
        points[offsets[i] : offsets[i + 1]] = np.asarray(e, dtype=np.float64)[:, :2]
    return points, offsets


def resample_edges_native(points: np.ndarray, offsets: np.ndarray,
                          num_samples: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    num_edges = len(offsets) - 1
    out = np.empty((num_edges, num_samples, 2), dtype=np.float32)
    lib.resample_edges(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_edges, num_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def check_faces_enclosed_native(
    points: np.ndarray, offsets: np.ndarray,
    faces: Sequence[Sequence[int]], tol: float,
) -> Optional[List[Optional[List[int]]]]:
    """Batch enclosedness. Per face: None when not enclosed, else the list
    of loop lengths (counting only in-range indices, matching the Python
    predicate's skip rule)."""
    lib = load()
    if lib is None:
        return None
    num_edges = len(offsets) - 1
    face_offsets = np.zeros(len(faces) + 1, dtype=np.int64)
    for i, f in enumerate(faces):
        face_offsets[i + 1] = face_offsets[i] + len(f)
    flat = np.asarray([i for f in faces for i in f], dtype=np.int64)
    if flat.size == 0:
        flat = np.zeros(1, dtype=np.int64)
    enclosed = np.zeros(len(faces), dtype=np.uint8)
    loop_ends = np.zeros(max(int(face_offsets[-1]), 1), dtype=np.int64)
    num_loops = np.zeros(len(faces), dtype=np.int64)
    lib.check_faces_enclosed(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_edges,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        face_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(faces), tol,
        enclosed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        loop_ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_loops.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    results: List[Optional[List[int]]] = []
    for i in range(len(faces)):
        if not enclosed[i]:
            results.append(None)
        else:
            ends = loop_ends[face_offsets[i] : face_offsets[i] + num_loops[i]]
            results.append([int(e) for e in ends])
    return results


def filter_faces_by_encloseness_batch(edges: Sequence, faces, tol: float):
    """Native-accelerated batch version of
    post_processing.filter_faces_by_encloseness: same output, one C call for
    all faces of a sample. Falls back to the Python predicate when the
    kernel is unavailable or indices carry orientation tuples."""
    from faceformer_tpu.geometry.loops import canonicalize_loops
    from faceformer_tpu.post_processing import filter_faces_by_encloseness

    plain = all(
        all(isinstance(i, (int, np.integer)) for i in face) for _, face in faces)
    if not plain or not available():
        return filter_faces_by_encloseness(edges, faces, tol)

    points, offsets = flatten_edges(edges)
    n_edges = len(edges)

    def norm(i):
        # Python-indexing parity: in-range negatives wrap (edges[-1] is the
        # last edge in the Python predicate); out-of-range ids stay as-is
        # so the C kernel skips them exactly like the Python path
        i = int(i)
        return i % n_edges if -n_edges <= i < 0 else i

    index_lists = [[norm(i) for i in face] for _, face in faces]
    outcomes = check_faces_enclosed_native(points, offsets, index_lists, tol)
    filtered = []
    for norm_face, (face_type, face), loop_lens in zip(
            index_lists, faces, outcomes):
        # zero loops == not enclosed (the Python predicate returns a falsy
        # [] when every index was skipped, dropping the face)
        if loop_lens is None or not loop_lens:
            continue
        # the normalized ids are C-side only; output loops carry the
        # ORIGINAL ids exactly like the Python predicate (which keeps
        # in-range negatives verbatim and skips ids >= n_edges)
        valid = [int(orig) for orig, j in zip(face, norm_face)
                 if 0 <= j < n_edges]
        loops, pos = [], 0
        for end in loop_lens:
            loops.append(valid[pos:end])
            pos = end
        filtered.append((face_type, canonicalize_loops(loops)))
    return filtered
