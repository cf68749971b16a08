"""Label raster → rectilinear polygons (pixel-edge tracing).

Replaces the reference's per-segment ``rasterio.features.shapes`` loop
(reference segment_boundaries.py:59-70 — hot loop #1: one full-image boolean
mask + GDAL polygonize call per segment id) with a single vectorised pass:

1. numpy comparisons against the 4-shifted raster emit every boundary edge
   (with the owning label) at once;
2. per label, directed unit edges are stitched into closed rings with a
   right-turn-first rule (so regions touching only at a corner separate,
   matching GDAL 4-connectivity semantics);
3. rings with positive signed area in (col, row) space are exteriors,
   negative ones are holes, assigned to the containing exterior.

Output coordinates are pixel corners (x=col, y=row); callers apply the
world affine afterwards (as the reference does via shapely
``affine_transform``). A C++ fast path is planned in ``obia_tpu.native``;
this is the reference implementation and fallback.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .geom import Polygon

# Directions: 0=E(+x), 1=S(+y), 2=W(-x), 3=N(-y). Right turn = (d+1)%4 in
# y-down screen coordinates.
_DSTEP = {0: (1, 0), 1: (0, 1), 2: (-1, 0), 3: (0, -1)}


def _polygons_with_holes(exteriors: List[np.ndarray],
                         holes: List[np.ndarray]) -> List[Polygon]:
    """One Polygon per exterior; each hole goes to the exterior containing
    its first vertex (single shared implementation — every polygonise
    entry point assembles rings through here). A hole no exterior contains
    (degenerate input) is dropped."""
    if len(exteriors) == 1:
        return [Polygon(exteriors[0], holes)]
    polys = [Polygon(e) for e in exteriors]
    hole_lists: List[List[np.ndarray]] = [[] for _ in exteriors]
    for h in holes:
        px, py = h[0, 0], h[0, 1]
        for i, p in enumerate(polys):
            if p.contains_points(np.array(px), np.array(py)):
                hole_lists[i].append(h)
                break
    return [Polygon(e, hl) for e, hl in zip(exteriors, hole_lists)]


def _group_rings(rings) -> Dict[int, List[Polygon]]:
    """Group (label, coords, signed_area) rings into Polygons with holes."""
    by_label: Dict[int, Tuple[list, list]] = {}
    for label, coords, area in rings:
        ext, holes = by_label.setdefault(label, ([], []))
        (ext if area > 0 else holes).append(coords)
    return {label: _polygons_with_holes(exteriors, holes)
            for label, (exteriors, holes) in by_label.items()}


def _edges_for_label_raster(labels: np.ndarray):
    """Vectorised boundary-edge extraction.

    Returns (lab, start_corner, direction) int64 arrays; corner id =
    r * (W + 1) + c.
    """
    H, W = labels.shape
    CW = W + 1
    lab = labels

    parts = []

    def corners(rr, cc):
        return rr.astype(np.int64) * CW + cc.astype(np.int64)

    # North edge of pixel (r,c): neighbor above differs -> edge E from (c, r)
    nb = np.empty_like(lab)
    nb[0, :] = -9
    nb[1:, :] = lab[:-1, :]
    m = (lab >= 0) & (lab != nb)
    rr, cc = np.nonzero(m)
    parts.append((lab[rr, cc], corners(rr, cc), np.full(rr.size, 0)))

    # East edge: right neighbor differs -> edge S from (c+1, r)
    nb = np.empty_like(lab)
    nb[:, -1] = -9
    nb[:, :-1] = lab[:, 1:]
    m = (lab >= 0) & (lab != nb)
    rr, cc = np.nonzero(m)
    parts.append((lab[rr, cc], corners(rr, cc + 1), np.full(rr.size, 1)))

    # South edge: below differs -> edge W from (c+1, r+1)
    nb = np.empty_like(lab)
    nb[-1, :] = -9
    nb[:-1, :] = lab[1:, :]
    m = (lab >= 0) & (lab != nb)
    rr, cc = np.nonzero(m)
    parts.append((lab[rr, cc], corners(rr + 1, cc + 1), np.full(rr.size, 2)))

    # West edge: left neighbor differs -> edge N from (c, r+1)
    nb = np.empty_like(lab)
    nb[:, 0] = -9
    nb[:, 1:] = lab[:, :-1]
    m = (lab >= 0) & (lab != nb)
    rr, cc = np.nonzero(m)
    parts.append((lab[rr, cc], corners(rr + 1, cc), np.full(rr.size, 3)))

    labs = np.concatenate([p[0] for p in parts])
    starts = np.concatenate([p[1] for p in parts])
    dirs = np.concatenate([p[2] for p in parts])
    return labs, starts, dirs


def _stitch_rings(starts: np.ndarray, dirs: np.ndarray, cw: int
                  ) -> List[np.ndarray]:
    """Walk directed unit edges into closed rings (right-turn preference).
    Returns list of (N, 2) float arrays of (x=col, y=row) corners."""
    # start corner -> up to 2 outgoing directions (bitmask by direction)
    out: Dict[int, List[int]] = {}
    for s, d in zip(starts.tolist(), dirs.tolist()):
        out.setdefault(s, []).append(d)

    rings = []
    # deterministic order: sorted start corners
    for s0 in sorted(out.keys()):
        while out.get(s0):
            # HIGHEST direction first — the native stitcher picks the same,
            # so ring ORDER is identical between the two implementations
            # even at pinch corners with two outgoing edges
            d = max(out[s0])
            out[s0].remove(d)
            ring = [s0]
            cur = s0
            cur_d = d
            while True:
                dx, dy = _DSTEP[cur_d]
                nxt = cur + dy * cw + dx
                if nxt == ring[0]:
                    ring.append(nxt)
                    break
                ring.append(nxt)
                options = out.get(nxt)
                if not options:
                    # open chain (shouldn't happen on valid rasters)
                    break
                # prefer right turn, then straight, then left
                chosen = None
                for turn in (1, 0, 3):
                    dd = (cur_d + turn) % 4
                    if dd in options:
                        chosen = dd
                        break
                if chosen is None:
                    chosen = options[-1]
                options.remove(chosen)
                cur = nxt
                cur_d = chosen
            coords = np.empty((len(ring), 2), np.float64)
            ids = np.asarray(ring, np.int64)
            coords[:, 0] = ids % cw
            coords[:, 1] = ids // cw
            rings.append(coords)
    return rings


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x * y2 - x2 * y))


def _simplify_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop interior collinear corners (all edges are axis-aligned)."""
    if len(ring) < 4:
        return ring
    pts = ring[:-1]
    prev = np.roll(pts, 1, axis=0)
    nxt = np.roll(pts, -1, axis=0)
    keep = ~(((prev[:, 0] == pts[:, 0]) & (pts[:, 0] == nxt[:, 0]))
             | ((prev[:, 1] == pts[:, 1]) & (pts[:, 1] == nxt[:, 1])))
    kept = pts[keep]
    if len(kept) < 3:
        return ring
    return np.vstack([kept, kept[:1]])


def polygonize_labels_rle(values: np.ndarray, lengths: np.ndarray,
                          shape, simplify: bool = True
                          ) -> Optional[Dict[int, List[Polygon]]]:
    """Polygonise directly from a row-wise RLE label raster (runs break
    at row ends) via the native O(runs + boundary) collector — the dense
    raster never has to exist on host. Returns None when the native
    library is unavailable (caller falls back to the dense path)."""
    from .. import native
    rings = native.polygonize_rings_rle(values, lengths, shape,
                                        simplify=simplify)
    if rings is None:
        return None
    return _group_rings(rings)


def group_rings_packed(labels: np.ndarray, areas: np.ndarray,
                       offsets: np.ndarray, coords: np.ndarray
                       ) -> Dict[int, List[Polygon]]:
    """Packed-array analog of ``_group_rings``: ring i is
    ``coords[offsets[i]:offsets[i+1]]``; ``areas`` carry the PIXEL-space
    signed area (sign classifies exterior vs hole even when ``coords``
    were already affine-transformed to world space, where a y-flip would
    negate recomputed areas). The single-exterior common case builds its
    Polygon straight from the slice — no per-ring dicts or lists."""
    out: Dict[int, List[Polygon]] = {}
    n = len(labels)
    if n == 0:
        return out
    order = np.argsort(labels, kind="stable")
    lab_s = labels[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(lab_s)) + 1, [n]])
    pos = areas > 0
    for gi in range(len(starts) - 1):
        grp = order[starts[gi]:starts[gi + 1]]
        label = int(lab_s[starts[gi]])
        if len(grp) == 1 and pos[grp[0]]:
            i = int(grp[0])
            out[label] = [Polygon(coords[offsets[i]:offsets[i + 1]])]
            continue
        exteriors = []
        holes = []
        for i in grp:
            c = coords[offsets[i]:offsets[i + 1]]
            (exteriors if pos[i] else holes).append(c)
        out[label] = _polygons_with_holes(exteriors, holes)
    return out


def polygonize_labels(labels: np.ndarray,
                      simplify: bool = True,
                      use_native: bool = True
                      ) -> Dict[int, List[Polygon]]:
    """Polygonise every non-negative label.

    Returns {label: [Polygon, ...]} in pixel-corner coordinates. Each
    connected region yields one Polygon (with holes); a label split into
    several regions yields several Polygons, mirroring how the reference
    emits one geometry per ``shapes`` result (segment_boundaries.py:66-70).

    Uses the native C++ ring stitcher when available; this module is the
    always-works fallback and the semantics reference.
    """
    labels = np.ascontiguousarray(labels)
    if use_native:
        from .. import native
        rings = native.polygonize_rings(labels, simplify=simplify)
        if rings is not None:
            return _group_rings(rings)
    H, W = labels.shape
    cw = W + 1
    labs, starts, dirs = _edges_for_label_raster(labels)
    order = np.argsort(labs, kind="stable")
    labs, starts, dirs = labs[order], starts[order], dirs[order]
    boundaries = np.flatnonzero(np.diff(labs)) + 1
    slices = np.split(np.arange(labs.size), boundaries)

    out: Dict[int, List[Polygon]] = {}
    for sl in slices:
        if sl.size == 0:
            continue
        label = int(labs[sl[0]])
        rings = _stitch_rings(starts[sl], dirs[sl], cw)
        if simplify:
            rings = [_simplify_collinear(r) for r in rings]
        exteriors = []
        holes = []
        for r in rings:
            if _signed_area(r) > 0:
                exteriors.append(r)
            else:
                holes.append(r)
        out[label] = _polygons_with_holes(exteriors, holes)
    return out
