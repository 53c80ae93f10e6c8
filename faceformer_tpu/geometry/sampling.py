"""Edge-polyline resampling to a fixed point count.

Behavior contract (reference: faceformer/datasets/data.py:11-28):
  - a 2-point polyline (straight line) is linearly interpolated to P points;
  - a longer polyline (curve) is subsampled by rounding P evenly spaced
    fractional indices over [0, len-1] — NOT by arc-length interpolation.
Both behaviors are reproduced exactly so packed inputs match the reference's.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def resample_edge(edge: Sequence[Sequence[float]], num_samples: int = 50) -> np.ndarray:
    """Resample one polyline to exactly ``num_samples`` 2D points."""
    pts = np.asarray(edge, dtype=np.float64)
    if len(pts) == 2:
        t = np.linspace(0.0, 1.0, num_samples)[:, None]
        return pts[0] + (pts[1] - pts[0]) * t
    idx = np.linspace(0, len(pts) - 1, num_samples).round(0).astype(int)
    return pts[idx]


def resample_edge_batch(
    edges: Sequence[Sequence[Sequence[float]]],
    num_lines: int,
    num_samples: int = 50,
    point_dim: int = 2,
    dtype=np.float32,
) -> np.ndarray:
    """Pack a ragged edge list into a static (num_lines, num_samples, D) array.

    Rows past ``len(edges)`` stay zero (static padding, reference
    data.py:62-67). This is the host-side entry that feeds the device.
    """
    out = np.zeros((num_lines, num_samples, point_dim), dtype=dtype)
    if len(edges) > num_lines:
        raise ValueError(f"{len(edges)} edges exceed num_lines={num_lines}")
    if len(edges) == 0:
        return out
    if point_dim == 2 and dtype == np.float32:
        from faceformer_tpu.geometry import native

        if native.available():
            points, offsets = native.flatten_edges(edges)
            out[: len(edges)] = native.resample_edges_native(points, offsets, num_samples)
            return out
    for i, edge in enumerate(edges):
        out[i] = resample_edge(edge, num_samples)
    return out
