"""Face enclosedness predicate: is a face's edge sequence a chain of closed loops?

Behavior contract (reference: dataset/tests/check_faces_enclosed.py:10-46):
walk the face's oriented edge indices in order; each edge's start must meet
the previous edge's end within an absolute per-axis tolerance; whenever the
chain returns to the open loop's start, the loop closes and a new one may
begin. Returns the loop decomposition (list of index lists) or False.

The predicate is used three ways, exactly like the reference:
  1. a generation-time assertion (prepare_data.py:155-158),
  2. an eval-time filter on predicted faces (post_processing.py:8-20),
  3. a standalone dataset-integrity CLI (tools/check_faces_enclosed.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

Index = Union[int, Tuple[int, int]]


def edges_connect(e1: Sequence[Sequence[float]], e2: Sequence[Sequence[float]], tol: float) -> bool:
    """True if e1's last point meets e2's first point within per-axis tol."""
    return abs(e1[-1][0] - e2[0][0]) < tol and abs(e1[-1][1] - e2[0][1]) < tol


def is_face_enclosed(
    edges: Sequence[Sequence[Sequence[float]]],
    face_indices: Sequence[Index],
    tol: float,
):
    """Check the chained-loop invariant for one face.

    ``face_indices`` entries are either plain edge indices, or
    ``(index, orientation)`` pairs where a truthy orientation means the edge
    is traversed reversed (the --direction_token data flavor). Out-of-range
    plain indices are skipped, matching the reference's eval-time tolerance
    of model hallucinations (check_faces_enclosed.py:29-33).
    """
    loops: List[List[Index]] = []
    current: List[Index] = []
    loop_start_edge = None  # first edge of the currently open loop
    prev_edge = None
    for ind in face_indices:
        if isinstance(ind, tuple):
            i, reverse = ind
            if i >= len(edges):  # same hallucination tolerance as plain ids
                continue
            edge = edges[i][::-1] if reverse else edges[i]
        else:
            if ind >= len(edges):
                continue
            edge = edges[ind]
        if loop_start_edge is None:
            loop_start_edge = edge
        elif not edges_connect(prev_edge, edge, tol):
            return False
        prev_edge = edge
        current.append(ind)
        if edges_connect(edge, loop_start_edge, tol):
            loops.append(current)
            current = []
            loop_start_edge = None
    return loops if loop_start_edge is None else False


def is_face_enclosed_undirected(
    edges: Sequence[Sequence[Sequence[float]]],
    face_indices: Sequence[int],
    tol: float,
):
    """Enclosedness check for UNDIRECTED edge-token faces (combined flavor).

    The combined-coedge data flavor (reference prepare_data.py
    --combine_coedge) stores each face as a *sorted set* of undirected edge
    tokens — no chain order, no orientation — so the reference only asserts
    enclosedness *before* coedges are merged (prepare_data.py:155-158) and
    its checker CLI cannot re-validate the merged corpora from disk. The
    order-free invariant: the face's edge multiset decomposes into closed
    loops, which holds iff no endpoint vertex has odd degree (endpoints
    clustered within per-axis ``tol``). Out-of-range indices are skipped
    like :func:`is_face_enclosed`. Returns the decomposition as connected
    components (index lists) or False.
    """
    idx = [i for i in face_indices if i < len(edges)]
    reps: List[Tuple[float, float]] = []  # vertex-cluster representatives

    def vert(p) -> int:
        for vi, q in enumerate(reps):
            if abs(p[0] - q[0]) < tol and abs(p[1] - q[1]) < tol:
                return vi
        reps.append((p[0], p[1]))
        return len(reps) - 1

    degree: dict = {}
    endpoints: List[Tuple[int, int, int]] = []
    for i in idx:
        a, b = vert(edges[i][0]), vert(edges[i][-1])
        degree[a] = degree.get(a, 0) + 1
        degree[b] = degree.get(b, 0) + 1
        endpoints.append((i, a, b))
    if any(d % 2 for d in degree.values()):
        return False

    parent = list(range(len(reps)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, a, b in endpoints:
        parent[find(a)] = find(b)
    components: dict = {}
    for i, a, _ in endpoints:
        components.setdefault(find(a), []).append(i)
    return list(components.values())
