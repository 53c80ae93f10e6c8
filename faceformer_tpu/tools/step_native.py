"""CAD-free STEP -> topology pipeline: the native backend of
tools/prepare_data.py.

Reproduces the reference generation algorithm (dataset/prepare_data.py,
dataset/utils/TopoMapper.py) for plane/cylinder/cone B-Reps WITHOUT
OpenCascade, using the Part 21 reader in ``step21.py``:

  1. bbox-normalize the solid (center + scale so the extent diagonal is 2,
     reference prepare_data.py:294-300);
  2. analytic hidden-line-removal outline computation: the silhouette
     rulings of every cylindrical/conical face under the camera (the only
     outline curves plane/cylinder/cone solids have — OCC's
     OutLineVCompound3d, TopoMapper.py:38-43), and face splitting along
     them (TopoMapper.py:58-83 does this through BRepFeat_SplitShape;
     here the split is exact: arcs divide at the silhouette angles and
     new ruling edges bound the sub-faces);
  3. topology mapping: ordered oriented edge loops per face -> shared
     EdgeRecord/FaceRecord graph (TopoMapper.py:85-116);
  4. edge discretization (deflection-controlled arc sampling, OCC
     discretize_edge semantics) + camera projection;
  5. sewn-edge removal: seam edges (an edge used twice within one face)
     are removed and their faces merged through the SAME machinery the
     OCC backend uses (TopoMapper._remove_sewn_edges — inherited, it is
     pure record arithmetic; reference TopoMapper.py:118-185).

Surfaces/curves outside the plane/cylinder/cone + line/circle subset
raise step21.UnsupportedStep, routing those shapes to the optional OCC
backend.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from faceformer_tpu.tools import step21
from faceformer_tpu.tools.step21 import (
    BCurve, BEdge, BFace, BSolid, BVertex, Frame, UnsupportedStep,
    CONE, CYLINDER, PLANE, SPHERE,
)
from faceformer_tpu.tools.occ_pipeline import (
    EdgeRecord, FaceRecord, ProjectionArgs, TopoMapper,
)

TWO_PI = 2.0 * np.pi
_EPS_ANGLE = 1e-6


# ---------------------------------------------------------------------------
# edge discretization (OCC discretize_edge semantics: chordal deflection)
# ---------------------------------------------------------------------------


def ensure_arc_span(edge: BEdge) -> Tuple[float, float]:
    """Circle parameter interval (t0, t1) traversed in the edge's natural
    direction (CCW in the curve frame). Full circle when the endpoints
    coincide."""
    if edge.arc_span is not None:
        return edge.arc_span
    c = edge.curve
    f = c.frame
    q0, q1 = edge.v0.point - f.origin, edge.v1.point - f.origin
    t0 = float(np.arctan2(q0 @ f.y, q0 @ f.x))
    t1 = float(np.arctan2(q1 @ f.y, q1 @ f.x))
    if float(np.linalg.norm(edge.v0.point - edge.v1.point)) < 1e-9:
        span = (t0, t0 + TWO_PI)
    else:
        delta = (t1 - t0) % TWO_PI
        if delta < _EPS_ANGLE:
            delta = TWO_PI
        span = (t0, t0 + delta)
    edge.arc_span = span
    return span


def discretize_bedge(edge: BEdge, tol: float,
                     max_points: int = 512) -> np.ndarray:
    """3D polyline of the edge in its natural direction. Lines are their
    two endpoints; arcs sample at the chordal deflection ``tol``
    (reference: OCC.Extend.TopologyUtils.discretize_edge(edge, tol))."""
    if edge.curve.kind == "line":
        return np.stack([edge.v0.point, edge.v1.point])
    c = edge.curve
    t0, t1 = ensure_arc_span(edge)
    r = max(c.radius, 1e-12)
    dt = 2.0 * np.arccos(np.clip(1.0 - tol / r, -1.0, 1.0))
    npts = int(np.ceil((t1 - t0) / max(dt, 1e-6))) + 1
    npts = int(np.clip(npts, 3, max_points))
    t = np.linspace(t0, t1, npts)
    f = c.frame
    pts = (f.origin[None, :]
           + c.radius * np.cos(t)[:, None] * f.x[None, :]
           + c.radius * np.sin(t)[:, None] * f.y[None, :])
    # exact shared endpoints (vertex coincidence is what the downstream
    # enclosedness chaining keys on, check_faces_enclosed.py:18-46)
    pts[0], pts[-1] = edge.v0.point, edge.v1.point
    return pts


# ---------------------------------------------------------------------------
# normalization (reference prepare_data.py:294-300)
# ---------------------------------------------------------------------------


def solid_bbox(solid: BSolid, tol: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    pts = [np.concatenate([discretize_bedge(e, tol, max_points=128)
                           for e in solid.edges()])]
    for face in solid.faces:
        if face.surface_kind != SPHERE:
            continue
        # a sphere cap bulges past its boundary edges: include the cap pole
        # (or, unclassifiable caps, the conservative full-sphere corners)
        try:
            cap = _sphere_cap(face, face.loops[0])
            pts.append(face.frame.origin[None, :]
                       + face.radius * cap.w[None, :])
        except UnsupportedStep:
            corner = np.full(3, face.radius)
            pts.append(np.stack([face.frame.origin - corner,
                                 face.frame.origin + corner]))
    pts = np.concatenate(pts)
    return pts.min(axis=0), pts.max(axis=0)


def normalize_solid(solid: BSolid) -> float:
    """Center the solid and scale its bbox diagonal to 2, in place.
    Returns the scale applied."""
    lo, hi = solid_bbox(solid)
    center = (lo + hi) / 2
    scale = 2.0 / max(float(np.linalg.norm(hi - lo)), 1e-9)
    seen = set()

    def _move(point: np.ndarray) -> np.ndarray:
        return (point - center) * scale

    for face in solid.faces:
        if id(face.frame) not in seen:
            seen.add(id(face.frame))
            face.frame.origin = _move(face.frame.origin)
        face.radius *= scale
        for loop in face.loops:
            for edge, _ in loop:
                if id(edge) in seen:
                    continue
                seen.add(id(edge))
                edge.arc_span = None  # invalidate cached spans
                for v in (edge.v0, edge.v1):
                    if id(v) not in seen:
                        seen.add(id(v))
                        v.point = _move(v.point)
                c = edge.curve
                if id(c) not in seen:
                    seen.add(id(c))
                    if c.kind == "line":
                        c.point = _move(c.point)
                    else:
                        c.radius *= scale
                        if id(c.frame) not in seen:
                            seen.add(id(c.frame))
                            c.frame.origin = _move(c.frame.origin)
    return scale


# ---------------------------------------------------------------------------
# camera (reference projection_utils.py / HLRAlgo_Projector semantics)
# ---------------------------------------------------------------------------


class NativeProjector:
    """View frame + projection matching occ_pipeline._projector's inputs.

    The view frame comes from either a pose matrix (columns right/up/N,
    translation = frame origin — occ_pipeline.py:150-152) or a
    location+direction pair (N = normalized direction; the X direction is
    then a deterministic perpendicular — OCC picks its own convention,
    which only rotates the 2D wireframe; documented deviation).
    Orthographic (focus == 0) drops the N component; perspective places
    the eye at ``origin + focus * N`` and divides: x' = x * f / (f - z)
    (OCC HLRAlgo_Projector focal semantics)."""

    def __init__(self, args: ProjectionArgs):
        if args.pose is not None:
            pose = np.asarray(args.pose, dtype=float)
            self.origin = pose[:3, -1].copy()
            self.n = _unit(pose[:3, 2])
            self.vx = _unit(pose[:3, 0])
        else:
            self.origin = np.asarray(args.location, dtype=float)
            self.n = _unit(np.asarray(args.direction, dtype=float))
            seed = np.array([0.0, 0.0, 1.0])
            if abs(float(seed @ self.n)) > 0.9:
                seed = np.array([1.0, 0.0, 0.0])
            self.vx = _unit(np.cross(seed, self.n))
        self.vy = np.cross(self.n, self.vx)
        self.focus = float(args.focus)

    @property
    def eye(self) -> Optional[np.ndarray]:
        if self.focus == 0.0:
            return None
        return self.origin + self.focus * self.n

    def project(self, pts) -> np.ndarray:
        pts = np.atleast_2d(np.asarray(pts, dtype=float))
        q = pts - self.origin
        cam = np.stack([q @ self.vx, q @ self.vy, q @ self.n], axis=1)
        if self.focus == 0.0:
            return cam
        denom = np.maximum(self.focus - cam[:, 2], 1e-6)
        scale = self.focus / denom
        return np.stack([cam[:, 0] * scale, cam[:, 1] * scale, cam[:, 2]], axis=1)


def _unit(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    if n < 1e-12:
        raise UnsupportedStep("degenerate view direction")
    return np.asarray(v, dtype=float) / n


# ---------------------------------------------------------------------------
# analytic silhouettes (the HLR outline curves of cylinder/cone faces)
# ---------------------------------------------------------------------------


def _solve_silhouette(a: float, b: float, c: float) -> List[float]:
    """Angles theta with a*cos(theta) + b*sin(theta) = c."""
    amp = float(np.hypot(a, b))
    if amp < 1e-12 or amp < abs(c) - 1e-12:
        return []
    phi = float(np.arctan2(b, a))
    delta = float(np.arccos(np.clip(c / amp, -1.0, 1.0)))
    if delta < 1e-3 or abs(np.pi - delta) < 1e-3:
        return []  # grazing tangency: the silhouette has no area to split
    return [phi + delta, phi - delta]


def silhouette_angles(face: BFace, projector: NativeProjector) -> List[float]:
    """Face-frame angles of the silhouette rulings (the outline curves OCC's
    HLR finds on smooth surfaces, TopoMapper.py:38-43). Empty for planes."""
    if face.surface_kind == PLANE:
        return []
    f = face.frame
    if face.surface_kind == CYLINDER:
        if projector.eye is None:
            v = projector.n
            return _solve_silhouette(float(f.x @ v), float(f.y @ v), 0.0)
        q = f.origin - projector.eye
        return _solve_silhouette(float(f.x @ q), float(f.y @ q), -face.radius)
    # cone: normal(theta) ~ cos(a)(cos t x + sin t y) - sin(a) z
    alpha = face.semi_angle
    ca, sa = float(np.cos(alpha)), float(np.sin(alpha))
    if projector.eye is None:
        v = projector.n
        return _solve_silhouette(ca * float(f.x @ v), ca * float(f.y @ v),
                                 sa * float(f.z @ v))
    tan_a = np.tan(alpha)
    if abs(tan_a) < 1e-9:  # degenerate cone == cylinder
        q = f.origin - projector.eye
        return _solve_silhouette(float(f.x @ q), float(f.y @ q), -face.radius)
    apex = f.origin - (face.radius / tan_a) * f.z
    q = apex - projector.eye
    return _solve_silhouette(ca * float(f.x @ q), ca * float(f.y @ q),
                             sa * float(f.z @ q))


# ---------------------------------------------------------------------------
# face splitting along silhouette rulings
# ---------------------------------------------------------------------------


@dataclass
class _Piece:
    """One circular arc of a curved face, in face-frame angles:
    CCW span (s, e) with e > s; ``sense`` +1 when the edge's natural
    direction runs CCW in the face frame."""

    edge: BEdge
    s: float
    e: float
    sense: int
    station: int


def _wrap(theta: float, lo: float) -> float:
    """Map theta into [lo, lo + 2*pi)."""
    return lo + float((theta - lo) % TWO_PI)


class _FaceSplitter:
    """Split one cylindrical/conical face along silhouette rulings.

    Assumes the standard swept-face boundary: circular arcs at exactly two
    axial stations plus axial/slant line edges (seams and rulings). Curved
    faces outside that shape (trimmed by non-circular intersections) are
    not representable with LINE/CIRCLE edges in the first place, so the
    reader has already rejected them.
    """

    def __init__(self, face: BFace, projector: NativeProjector, tol: float,
                 registry: "_SplitRegistry"):
        self.face = face
        self.tol = tol
        self.reg = registry
        if len(face.loops) != 1:
            raise UnsupportedStep("multi-loop curved faces need the OCC backend")
        # expand through prior substitutions so an arc shared with an
        # already-split neighbor face splits its sub-pieces, not the parent
        self.loop = registry.expand(face.loops[0])
        self.f = face.frame
        self.cuts = silhouette_angles(face, projector)

    # -- face-frame helpers ------------------------------------------------

    def _theta(self, p: np.ndarray) -> float:
        q = p - self.f.origin
        return float(np.arctan2(q @ self.f.y, q @ self.f.x))

    def _z(self, p: np.ndarray) -> float:
        return float((p - self.f.origin) @ self.f.z)

    def _station_radius(self, z: float) -> float:
        if self.face.surface_kind == CYLINDER:
            return self.face.radius
        return self.face.radius + z * float(np.tan(self.face.semi_angle))

    def _point_at(self, theta: float, z: float) -> np.ndarray:
        r = self._station_radius(z)
        return (self.f.origin + z * self.f.z
                + r * (np.cos(theta) * self.f.x + np.sin(theta) * self.f.y))

    # -- classification ------------------------------------------------------

    def _classify(self):
        arcs: List[Tuple[BEdge, int]] = []  # (edge, times seen)
        lines: Dict[int, BEdge] = {}
        line_count: Dict[int, int] = {}
        seen = set()
        for edge, _ in self.loop:
            if edge.curve.kind == "circle":
                if id(edge) not in seen:
                    seen.add(id(edge))
                    arcs.append((edge, 1))
            else:
                line_count[id(edge)] = line_count.get(id(edge), 0) + 1
                lines[id(edge)] = edge
        # stations from arc centers along the face axis
        zs = []
        for edge, _ in arcs:
            center = edge.curve.frame.origin
            off = center - self.f.origin
            axial = float(off @ self.f.z)
            if float(np.linalg.norm(off - axial * self.f.z)) > 1e-6:
                raise UnsupportedStep("arc center off the face axis")
            zs.append(axial)
        stations = sorted(set(round(z, 7) for z in zs))
        if len(stations) != 2:
            raise UnsupportedStep(
                f"curved face with {len(stations)} axial stations")
        self.z_bot, self.z_top = float(stations[0]), float(stations[1])

        self.pieces: List[_Piece] = []
        for edge, _ in arcs:
            axial = float((edge.curve.frame.origin - self.f.origin) @ self.f.z)
            station = 0 if abs(axial - self.z_bot) < 1e-6 else 1
            sense = 1 if float(edge.curve.frame.z @ self.f.z) > 0 else -1
            t0, t1 = self._theta(edge.v0.point), self._theta(edge.v1.point)
            full = float(np.linalg.norm(edge.v0.point - edge.v1.point)) < 1e-9
            if sense > 0:
                s = t0
                e = t0 + TWO_PI if full else t0 + ((t1 - t0) % TWO_PI or TWO_PI)
            else:
                s = t1
                e = t1 + TWO_PI if full else t1 + ((t0 - t1) % TWO_PI or TWO_PI)
            self.pieces.append(_Piece(edge, s, e, sense, station))

        self.seam: Optional[BEdge] = None
        self.boundary_lines: Dict[float, BEdge] = {}
        for key, edge in lines.items():
            theta = self._theta((edge.v0.point + edge.v1.point) / 2)
            if line_count[key] >= 2:
                self.seam = edge
                self.seam_theta = theta
            else:
                self.boundary_lines[theta] = edge

    def _domain(self) -> Tuple[float, float, bool]:
        """CCW angular interval covered by the face (from the top-station
        arcs): (lo, hi, is_full_circle)."""
        tops = sorted((p for p in self.pieces if p.station == 1),
                      key=lambda p: p.s)
        total = sum(p.e - p.s for p in tops)
        if total > TWO_PI - 1e-6:
            return tops[0].s, tops[0].s + TWO_PI, True
        lo = tops[0].s
        hi = tops[0].e
        for p in tops[1:]:
            s = _wrap(p.s, lo)
            if abs(s - hi) > 1e-5:
                raise UnsupportedStep("non-contiguous curved face domain")
            hi = s + (p.e - p.s)
        return lo, hi, False

    # -- splitting ------------------------------------------------------------

    def split(self) -> Optional[List[BFace]]:
        """Returns replacement sub-faces, or None when no silhouette ruling
        crosses the face interior."""
        if not self.cuts:
            return None
        self._classify()
        lo, hi, full = self._domain()
        existing = [_wrap(p.s, 0.0) for p in self.pieces]
        existing += [_wrap(p.e, 0.0) for p in self.pieces]

        def near_existing(theta: float) -> bool:
            t = _wrap(theta, 0.0)
            return any(min(abs(t - e), TWO_PI - abs(t - e)) < 1e-4
                       for e in existing)

        cuts = []
        for c in self.cuts:
            cw = _wrap(c, lo)
            inside = True if full else (lo + 1e-4 < cw < hi - 1e-4)
            if inside and not near_existing(cw):
                cuts.append(cw)
        cuts = sorted(set(round(c, 9) for c in cuts))
        if not cuts:
            return None

        # split every arc piece at the interior cut angles
        pieces: List[_Piece] = []
        for p in self.pieces:
            inner = [c for base in cuts
                     for c in (_wrap(base, p.s),)
                     if p.s + 1e-6 < c < p.e - 1e-6]
            pieces.extend(self._split_piece(p, sorted(inner)))
        self.pieces = pieces

        # ruling edges at each cut (new) and at the domain boundary (existing)
        rulings: Dict[float, BEdge] = {}
        for c in cuts:
            p_bot, p_top = self._point_at(c, self.z_bot), self._point_at(c, self.z_top)
            edge = BEdge(BVertex(p_bot), BVertex(p_top),
                         BCurve("line", point=p_bot,
                                direction=_unit(p_top - p_bot)))
            # reuse the split-piece endpoint vertices so chains coincide
            edge.v0 = self.reg.vertex_at(self, c, self.z_bot)
            edge.v1 = self.reg.vertex_at(self, c, self.z_top)
            rulings[round(c, 9)] = edge
        for theta, edge in self.boundary_lines.items():
            rulings[round(_wrap(theta, lo), 9)] = edge

        # traversal sense of the top arcs in the original wire
        top_sense = 0
        for edge, orient in self.loop:
            for p in self.pieces:
                if p.edge is edge or self.reg.parent_of(p.edge) is edge:
                    if p.station == 1:
                        top_sense = p.sense * (1 if orient == 0 else -1)
                        break
            if top_sense:
                break
        if top_sense == 0:
            raise UnsupportedStep("could not orient the curved face wire")

        if full:  # intervals between consecutive cuts, wrapping around
            bounds = cuts + [cuts[0] + TWO_PI]
        else:
            bounds = [lo] + cuts + [hi]
        intervals = list(zip(bounds[:-1], bounds[1:]))

        out: List[BFace] = []
        for g0, g1 in intervals:
            out.append(self._sub_face(g0, g1, rulings, top_sense, lo))
        return out

    def _split_piece(self, p: _Piece, inner: List[float]) -> List[_Piece]:
        if not inner:
            return [p]
        bounds = [p.s] + inner + [p.e]
        z = self.z_bot if p.station == 0 else self.z_top
        # vertices at the boundary angles; ends reuse the parent's vertices
        verts = []
        for i, theta in enumerate(bounds):
            if i == 0:
                verts.append(p.edge.v0 if p.sense > 0 else p.edge.v1)
            elif i == len(bounds) - 1:
                verts.append(p.edge.v1 if p.sense > 0 else p.edge.v0)
            else:
                verts.append(self.reg.vertex_at(self, theta, z,
                                                make=self._point_at(theta, z)))
        subs_ccw: List[_Piece] = []
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            v_s, v_e = verts[i], verts[i + 1]
            curve = BCurve(
                "circle",
                frame=Frame(self.f.origin + z * self.f.z,
                            self.f.z if p.sense > 0 else -self.f.z,
                            self.f.x),
                radius=self._station_radius(z))
            if p.sense > 0:
                edge = BEdge(v_s, v_e, curve, arc_span=(s, e))
            else:
                # natural direction CW in face frame; in the flipped curve
                # frame the angle of face-angle t is -t
                edge = BEdge(v_e, v_s, curve, arc_span=(-e, -s))
            subs_ccw.append(_Piece(edge, s, e, p.sense, p.station))
        natural = subs_ccw if p.sense > 0 else subs_ccw[::-1]
        self.reg.substitute(p.edge, [q.edge for q in natural])
        return subs_ccw

    def _sub_face(self, g0: float, g1: float, rulings: Dict[float, BEdge],
                  top_sense: int, lo: float) -> BFace:
        def pick(station: int) -> List[_Piece]:
            sel = []
            for p in self.pieces:
                if p.station != station:
                    continue
                mid = _wrap((p.s + p.e) / 2, g0)
                if g0 < mid < g1:
                    sel.append(p)
            return sorted(sel, key=lambda p: _wrap(p.s + 1e-9, g0))

        def ruling(theta: float):
            best, best_d = None, 1e-4
            for key, edge in rulings.items():
                d = abs(key - theta) % TWO_PI
                d = min(d, TWO_PI - d)
                if d < best_d:
                    best, best_d = edge, d
            if best is None:
                raise UnsupportedStep(
                    f"no boundary ruling near angle {theta:.6f}")
            return best

        def up(edge: BEdge) -> int:
            return 0 if self._z(edge.v1.point) > self._z(edge.v0.point) else 1

        def arc_orient(p: _Piece, ccw: bool) -> int:
            natural_ccw = p.sense > 0
            return 0 if natural_ccw == ccw else 1

        seam_here = (self.seam is not None
                     and g0 + 1e-6 < _wrap(self.seam_theta, g0) < g1 - 1e-6)
        seam_theta = _wrap(self.seam_theta, g0) if seam_here else None

        walk: List[Tuple[BEdge, int]] = []
        tops, bots = pick(1), pick(0)
        if top_sense > 0:  # up at g0, top CCW g0->g1, down at g1, bottom CW
            r0, r1 = ruling(g0), ruling(g1)
            walk.append((r0, up(r0)))
            walk.extend(self._arc_walk(tops, ccw=True, base=g0,
                                       seam_theta=seam_theta))
            walk.append((r1, 1 - up(r1)))
            walk.extend(self._arc_walk(bots, ccw=False, base=g0))
        else:  # up at g1, top CW g1->g0, down at g0, bottom CCW
            r0, r1 = ruling(g1), ruling(g0)
            walk.append((r0, up(r0)))
            walk.extend(self._arc_walk(tops, ccw=False, base=g0,
                                       seam_theta=seam_theta))
            walk.append((r1, 1 - up(r1)))
            walk.extend(self._arc_walk(bots, ccw=True, base=g0))
        return BFace(self.face.surface_kind, self.face.frame, self.face.radius,
                     self.face.semi_angle, self.face.same_sense, [walk],
                     fid=self.face.fid)

    def _arc_walk(self, pieces: List[_Piece], ccw: bool, base: float,
                  seam_theta: Optional[float] = None) -> List[Tuple[BEdge, int]]:
        ordered = pieces if ccw else pieces[::-1]
        out: List[Tuple[BEdge, int]] = []
        for p in ordered:
            if seam_theta is not None:
                # crossing the seam angle: descend and return (the seam
                # edge stays a doubly-used wire member of this sub-face,
                # exactly like the OCC wire — sewn removal then drops it)
                s = _wrap(p.s, base)
                boundary = s if ccw else _wrap(p.e, base)
                if abs(boundary - seam_theta) < 1e-5 and out:
                    out.append((self.seam, 1 - up_of(self.seam, self._z)))
                    out.append((self.seam, up_of(self.seam, self._z)))
                    seam_theta = None
            out.append((p.edge, arc_orient_of(p, ccw)))
        return out


def up_of(edge: BEdge, zfn) -> int:
    return 0 if zfn(edge.v1.point) > zfn(edge.v0.point) else 1


def arc_orient_of(p: _Piece, ccw: bool) -> int:
    return 0 if (p.sense > 0) == ccw else 1


# ---------------------------------------------------------------------------
# spherical faces: cap classification + silhouette-circle splitting
# ---------------------------------------------------------------------------


@dataclass
class _Cap:
    """A spherical cap: the face region {P : (P - C) @ w >= h} of a sphere
    (C, R), bounded by one circle of radius ``rho`` centered ``O_b``."""

    w: np.ndarray       # unit cap axis, pointing from the boundary plane
    h: float            # signed plane offset along w (negative: cap > half)
    O_b: np.ndarray     # boundary circle center
    rho: float          # boundary circle radius


def _sphere_cap(face: BFace, loop) -> _Cap:
    """Classify a sphere face's boundary as a single-circle cap.

    The cap side is derived from the boundary walk orientation: walking the
    oriented boundary with the outward surface normal up, the face lies to
    the left (STEP FACE_OUTER_BOUND convention — the same rule the writer's
    cap discs follow)."""
    C, R = face.frame.origin, face.radius
    edges: List[BEdge] = []
    seen = set()
    for edge, _ in loop:
        if edge.curve.kind != "circle":
            raise UnsupportedStep("sphere face bounded by a non-circle edge")
        if id(edge) in seen:
            raise UnsupportedStep("sphere face with a seam edge")
        seen.add(id(edge))
        edges.append(edge)
    centers = np.stack([e.curve.frame.origin for e in edges])
    radii = np.array([e.curve.radius for e in edges])
    if float(np.ptp(centers, axis=0).max()) > 1e-6 or float(np.ptp(radii)) > 1e-6:
        raise UnsupportedStep("sphere face boundary spans multiple circles")
    O_b, rho = centers[0], float(radii[0])
    off = O_b - C
    h_abs = float(np.linalg.norm(off))
    w = off / h_abs if h_abs > 1e-7 else np.array(edges[0].curve.frame.z, float)
    if abs(h_abs * h_abs + rho * rho - R * R) > 1e-4 * max(R * R, 1.0):
        raise UnsupportedStep("sphere boundary circle is not on the sphere")
    edge0, orient0 = loop[0]
    p0 = edge0.v0.point if orient0 == 0 else edge0.v1.point
    tangent = np.cross(edge0.curve.frame.z, p0 - edge0.curve.frame.origin)
    if orient0 == 1:
        tangent = -tangent
    n_out = (p0 - C) / R
    if float(np.cross(n_out, tangent) @ w) < 0:
        w = -w
    return _Cap(w, float(off @ w), O_b, rho)


def _sphere_silhouette(face: BFace,
                       projector: NativeProjector) -> Tuple[np.ndarray, float]:
    """Silhouette plane of a sphere under the camera: (u, g) with the
    silhouette circle = sphere ∩ {P : (P - C) @ u = g}; u points toward
    the viewer. Orthographic: the great circle normal to the view
    direction. Perspective from eye E at distance d: offset R^2/d."""
    C, R = face.frame.origin, face.radius
    if projector.eye is None:
        return projector.n, 0.0
    q = projector.eye - C
    d = float(np.linalg.norm(q))
    if d <= R * (1.0 + 1e-9):
        raise UnsupportedStep("camera eye inside a sphere")
    return q / d, R * R / d


class _SphereSplitter:
    """Split one spherical cap face along its silhouette circle.

    Three geometric regimes (margins treat tangency as grazing, like
    _solve_silhouette): the silhouette circle misses the cap (no split);
    it crosses the boundary circle at two points (split into a
    toward-camera and an away sub-face along the silhouette arc); or it
    lies entirely inside the cap (split into an inner sub-cap plus a band
    face with two loops). This is the sphere analogue of OCC's HLR outline
    splitting (reference TopoMapper.py:38-43, 58-83); sphere faces map to
    the reference's Other face type (Face.py:18-24, GeomAbs_Sphere = 3)."""

    _MARGIN = 1e-3

    def __init__(self, face: BFace, projector: NativeProjector, tol: float,
                 registry: "_SplitRegistry"):
        self.face = face
        self.tol = tol
        self.reg = registry
        if len(face.loops) != 1:
            raise UnsupportedStep("multi-loop sphere faces need the OCC backend")
        self.loop = registry.expand(face.loops[0])
        self.C, self.R = face.frame.origin, face.radius
        self.u, self.g = _sphere_silhouette(face, projector)
        self.cap = _sphere_cap(face, self.loop)
        w = self.cap.w
        seed = np.array([1.0, 0.0, 0.0])
        if abs(float(seed @ w)) > 0.9:
            seed = np.array([0.0, 1.0, 0.0])
        self.bx = _unit(seed - w * float(seed @ w))
        self.by = np.cross(w, self.bx)

    # -- boundary-frame helpers ---------------------------------------------

    def _theta(self, p: np.ndarray) -> float:
        q = p - self.cap.O_b
        return float(np.arctan2(q @ self.by, q @ self.bx))

    def _point_at(self, theta: float) -> np.ndarray:
        return (self.cap.O_b
                + self.cap.rho * (np.cos(theta) * self.bx
                                  + np.sin(theta) * self.by))

    def _classify_pieces(self) -> List[_Piece]:
        pieces = []
        for edge, _ in self.loop:
            sense = 1 if float(edge.curve.frame.z @ self.cap.w) > 0 else -1
            t0, t1 = self._theta(edge.v0.point), self._theta(edge.v1.point)
            full = float(np.linalg.norm(edge.v0.point - edge.v1.point)) < 1e-9
            if sense > 0:
                s = t0
                e = t0 + TWO_PI if full else t0 + ((t1 - t0) % TWO_PI or TWO_PI)
            else:
                s = t1
                e = t1 + TWO_PI if full else t1 + ((t0 - t1) % TWO_PI or TWO_PI)
            pieces.append(_Piece(edge, s, e, sense, 0))
        return pieces

    def _split_piece(self, p: _Piece, inner: List[float]) -> List[_Piece]:
        """Split one boundary arc at interior angles (the _FaceSplitter
        logic, on the cap boundary circle instead of an axial station)."""
        if not inner:
            return [p]
        bounds = [p.s] + inner + [p.e]
        verts = []
        for i, theta in enumerate(bounds):
            if i == 0:
                verts.append(p.edge.v0 if p.sense > 0 else p.edge.v1)
            elif i == len(bounds) - 1:
                verts.append(p.edge.v1 if p.sense > 0 else p.edge.v0)
            else:
                verts.append(self.reg.vertex_near(self._point_at(theta)))
        subs_ccw: List[_Piece] = []
        w = self.cap.w
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            curve = BCurve(
                "circle",
                frame=Frame(self.cap.O_b.copy(), w if p.sense > 0 else -w,
                            self.bx),
                radius=self.cap.rho)
            if p.sense > 0:
                edge = BEdge(verts[i], verts[i + 1], curve, arc_span=(s, e))
            else:
                edge = BEdge(verts[i + 1], verts[i], curve, arc_span=(-e, -s))
            subs_ccw.append(_Piece(edge, s, e, p.sense, 0))
        natural = subs_ccw if p.sense > 0 else subs_ccw[::-1]
        self.reg.substitute(p.edge, [q.edge for q in natural])
        return subs_ccw

    # -- splitting -----------------------------------------------------------

    def split(self) -> Optional[List[BFace]]:
        clip = lambda x: float(np.clip(x, -1.0, 1.0))  # noqa: E731
        a_b = float(np.arccos(clip(self.cap.h / self.R)))
        a_s = float(np.arccos(clip(self.g / self.R)))
        beta = float(np.arccos(clip(self.cap.w @ self.u)))
        m = self._MARGIN
        if beta >= a_b + a_s - m:
            return None  # silhouette misses the cap (or external tangency)
        if beta + a_b <= a_s + m:
            return None  # whole cap on the near side of the silhouette
        if beta + a_s <= a_b - m:
            return self._band_split()
        if beta + a_s <= a_b + m:
            return None  # internal tangency: grazing
        return self._crossing_split()

    def _silhouette_frame(self) -> Tuple[np.ndarray, float]:
        O_s = self.C + self.g * self.u
        rho_s = float(np.sqrt(max(self.R ** 2 - self.g ** 2, 0.0)))
        return O_s, rho_s

    def _band_split(self) -> List[BFace]:
        """Silhouette circle interior to the cap: inner sub-cap + band."""
        O_s, rho_s = self._silhouette_frame()
        seed = np.array([1.0, 0.0, 0.0])
        if abs(float(seed @ self.u)) > 0.9:
            seed = np.array([0.0, 1.0, 0.0])
        sx = _unit(seed - self.u * float(seed @ self.u))
        start = O_s + rho_s * sx
        v = self.reg.vertex_near(start)
        silh = BEdge(v, v, BCurve("circle", frame=Frame(O_s, self.u, sx),
                                  radius=rho_s), arc_span=(0.0, TWO_PI))
        f = self.face
        inner = BFace(SPHERE, f.frame, f.radius, f.semi_angle, f.same_sense,
                      [[(silh, 0)]], fid=f.fid)
        band = BFace(SPHERE, f.frame, f.radius, f.semi_angle, f.same_sense,
                     [list(self.loop), [(silh, 1)]], fid=f.fid)
        return [inner, band]

    def _crossing_split(self) -> Optional[List[BFace]]:
        w, u, h, g = self.cap.w, self.u, self.cap.h, self.g
        cosb = float(w @ u)
        sin2 = max(1.0 - cosb * cosb, 1e-12)
        a = (h - g * cosb) / sin2
        b = (g - h * cosb) / sin2
        mid = a * w + b * u
        c2 = self.R ** 2 - float(mid @ mid)
        if c2 <= (10.0 * self.tol) ** 2:
            return None  # numerically tangent
        axis = _unit(np.cross(w, u))
        c = float(np.sqrt(c2))
        p_plus, p_minus = self.C + mid + c * axis, self.C + mid - c * axis

        pieces = self._classify_pieces()
        lo = pieces[0].s
        cut_angles = sorted({round(_wrap(self._theta(p), lo), 9)
                             for p in (p_plus, p_minus)})
        split_pieces: List[_Piece] = []
        for p in pieces:
            inner = [c_ for base in cut_angles
                     for c_ in (_wrap(base, p.s),)
                     if p.s + 1e-6 < c_ < p.e - 1e-6]
            split_pieces.extend(self._split_piece(p, sorted(inner)))

        # the re-expanded walk orders the final sub-arcs with their loop
        # orientations; the two silhouette crossings partition it into a
        # contiguous near-side (toward the camera) and far-side run
        walk = self.reg.expand(self.loop)

        def near(item) -> bool:
            edge = item[0]
            piece = next((q for q in split_pieces if q.edge is edge), None)
            if piece is not None:
                m = self._point_at((piece.s + piece.e) / 2.0)
            else:
                m = midpoint_of(edge)
            return float((m - self.C) @ u) > g

        flags = [near(it) for it in walk]
        if all(flags) or not any(flags):
            raise UnsupportedStep("silhouette crossing did not bisect the "
                                  "sphere boundary walk")
        start = next(i for i in range(len(walk))
                     if flags[i] and not flags[i - 1])
        walk = walk[start:] + walk[:start]
        flags = flags[start:] + flags[:start]
        n_near = flags.index(False)
        near_run, far_run = walk[:n_near], walk[n_near:]

        # silhouette arc inside the cap, between the crossing vertices
        O_s, _ = self._silhouette_frame()
        sx = _unit(p_plus - O_s)
        sy = np.cross(u, sx)
        rho_s = float(np.linalg.norm(p_plus - O_s))
        q = p_minus - O_s
        phi = float(np.arctan2(q @ sy, q @ sx)) % TWO_PI or TWO_PI
        v_plus = self.reg.vertex_near(p_plus)
        v_minus = self.reg.vertex_near(p_minus)
        curve = BCurve("circle", frame=Frame(O_s, u, sx), radius=rho_s)

        def arc_mid(t0: float, t1: float) -> np.ndarray:
            t = (t0 + t1) / 2.0
            return O_s + rho_s * (np.cos(t) * sx + np.sin(t) * sy)

        if float((arc_mid(0.0, phi) - self.C) @ w) > h:
            silh = BEdge(v_plus, v_minus, curve, arc_span=(0.0, phi))
        else:
            silh = BEdge(v_minus, v_plus, curve, arc_span=(phi, TWO_PI))

        f = self.face
        out = []
        for run in (near_run, far_run):
            last_edge, last_o = run[-1]
            end_v = last_edge.v1 if last_o == 0 else last_edge.v0
            orient = 0 if end_v is silh.v0 else 1
            out.append(BFace(SPHERE, f.frame, f.radius, f.semi_angle,
                             f.same_sense, [run + [(silh, orient)]],
                             fid=f.fid))
        return out


def midpoint_of(edge: BEdge) -> np.ndarray:
    """3D midpoint of an edge along its curve (arc-aware)."""
    if edge.curve.kind == "line":
        return (edge.v0.point + edge.v1.point) / 2.0
    t0, t1 = ensure_arc_span(edge)
    t = (t0 + t1) / 2.0
    fr = edge.curve.frame
    return (fr.origin + edge.curve.radius
            * (np.cos(t) * fr.x + np.sin(t) * fr.y))


class _SplitRegistry:
    """Global edge substitutions + shared cut vertices across faces."""

    def __init__(self):
        self.subs: Dict[int, List[BEdge]] = {}
        self._parents: Dict[int, BEdge] = {}
        self._verts: Dict[tuple, BVertex] = {}

    def substitute(self, parent: BEdge, subs_natural: List[BEdge]):
        self.subs[id(parent)] = subs_natural
        for s in subs_natural:
            self._parents[id(s)] = parent

    def parent_of(self, edge: BEdge) -> Optional[BEdge]:
        return self._parents.get(id(edge))

    def vertex_at(self, splitter: "_FaceSplitter", theta: float, z: float,
                  make: Optional[np.ndarray] = None) -> BVertex:
        point = make if make is not None else splitter._point_at(theta, z)
        key = tuple(round(float(c), 7) for c in point)
        if key not in self._verts:
            self._verts[key] = BVertex(np.asarray(point, dtype=float))
        return self._verts[key]

    def vertex_near(self, point: np.ndarray, tol: float = 1e-5) -> BVertex:
        """Shared cut vertex by proximity: cut points computed by two
        different splitters (a cylinder's ruling endpoint and the sphere
        silhouette crossing of the shared boundary circle) agree only to
        floating-point, so exact-key dedup would fracture the chain."""
        point = np.asarray(point, dtype=float)
        key = tuple(round(float(c), 7) for c in point)
        if key in self._verts:
            return self._verts[key]
        for v in self._verts.values():
            if float(np.max(np.abs(v.point - point))) < tol:
                return v
        self._verts[key] = BVertex(point)
        return self._verts[key]

    def expand(self, loop: List[Tuple[BEdge, int]]) -> List[Tuple[BEdge, int]]:
        out: List[Tuple[BEdge, int]] = []
        for edge, orient in loop:
            subs = self.subs.get(id(edge))
            if subs is None:
                out.append((edge, orient))
            elif orient == 0:
                out.extend(self.expand([(s, 0) for s in subs]))
            else:
                out.extend(self.expand([(s, 1) for s in subs[::-1]]))
        return out


def split_solid(solid: BSolid, projector: NativeProjector,
                tol: float) -> BSolid:
    """Split every curved face along its silhouette curves; substitute the
    split arcs into every loop that references them (BRepFeat_SplitShape
    semantics: the split modifies the whole shape, TopoMapper.py:58-83).

    Swept faces (cylinder/cone) split first, spheres after: a hemisphere on
    a cylinder shares the equator circle, and the wall's ruling endpoints
    land exactly on the sphere's silhouette crossings — processing spheres
    last lets them reuse those cut vertices. A final re-expansion pass
    updates every emitted walk through the full substitution map, so a
    face split early still sees arcs subdivided by a later neighbor."""
    registry = _SplitRegistry()
    replaced: Dict[int, List[BFace]] = {}
    curved = [f for f in solid.faces if f.surface_kind != PLANE]
    for face in sorted(curved, key=lambda f: f.surface_kind == SPHERE):
        if face.surface_kind == SPHERE:
            subs = _SphereSplitter(face, projector, tol, registry).split()
        else:
            subs = _FaceSplitter(face, projector, tol, registry).split()
        if subs is not None:
            replaced[id(face)] = subs
    out: List[BFace] = []
    for face in solid.faces:
        out.extend(replaced.get(id(face), [face]))
    for face in out:
        face.loops = [registry.expand(loop) for loop in face.loops]
    return BSolid(out)


# ---------------------------------------------------------------------------
# the native TopoMapper
# ---------------------------------------------------------------------------


class NativeTopoMapper(TopoMapper):
    """TopoMapper over a parsed STEP B-Rep instead of an OCC shape.

    Inherits the sewn-edge removal / face-merge / edge-merge machinery —
    it is pure record arithmetic (occ_pipeline.py:400-475, itself the
    contract of reference TopoMapper.py:118-185) — and replaces the OCC
    entry points (HLR outline, BRepFeat split, wire exploration,
    discretize_edge, HLRAlgo projection) with the analytic equivalents in
    this module."""

    def __init__(self, solid: BSolid, args: ProjectionArgs):
        self.args = args
        self.tol = args.tol
        self.projector = NativeProjector(args)
        # sewn edges are detected on the ORIGINAL shape (reference
        # TopoMapper.py:118-143): an edge used twice within one face wire
        sewn: List[int] = []
        for face in solid.faces:
            seen: List[int] = []
            for loop in face.loops:
                for edge, _ in loop:
                    key = hash(edge)
                    if key in seen:
                        sewn.append(key)
                    else:
                        seen.append(key)
        split = split_solid(solid, self.projector, args.tol)
        self._construct_native_mapping(split)
        self._project_native(args.discretize_last)
        self._remove_sewn_edges(sewn)

    def _construct_native_mapping(self, solid: BSolid):
        self.all_edges: Dict[int, EdgeRecord] = {}
        self.all_faces: Dict[int, FaceRecord] = {}
        for face in solid.faces:
            params = {"radius": face.radius} if face.surface_kind != PLANE else None
            record = FaceRecord(face, face.surface_kind, params)
            self.all_faces[hash(face)] = record
            for loop in face.loops:
                for edge, orient in loop:
                    key = hash(edge)
                    erec = self.all_edges.get(key)
                    if erec is None:
                        erec = EdgeRecord(edge)
                        self.all_edges[key] = erec
                    erec.faces.append(record)
                    erec.orientations.append(orient)
                    record.add(erec, orient)

    def _project_native(self, discretize_last: bool = False):
        # discretize_last changes WHERE discretization happens in the
        # reference (project the curve then discretize vs discretize then
        # project, occ_pipeline.py:355-379); for line/circle edges under a
        # projective camera both orders sample the same curve, so the
        # native backend always discretizes first.
        del discretize_last
        for erec in self.all_edges.values():
            pts3d = discretize_bedge(erec.edge, self.tol)
            cam = self.projector.project(pts3d)
            erec.dedge3d = [tuple(float(c) for c in p) for p in cam]
            erec.dedge = [(p[0], p[1]) for p in erec.dedge3d]

    def dominant_directions(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
        cam = self.projector.project(pts)
        origin, x, y, z = cam
        return [(x - origin).tolist(), (y - origin).tolist(), (z - origin).tolist()]


def load_solid(path: str, filter_num_shapes: int = 1):
    """Read a STEP file -> (solid, num_solids); mirrors read_step_file's
    contract (occ_pipeline.py:56-91): None when over the shape cap."""
    solids = step21.read_brep(path)
    if not solids:
        raise AssertionError("no shape to transfer")
    if len(solids) > filter_num_shapes:
        return None, len(solids)
    return solids[0], len(solids)
