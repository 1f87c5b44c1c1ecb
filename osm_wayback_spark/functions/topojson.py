"""F7 — pure-Python TopoJSON topology encoder.

The reference's WRITE_TOPOJSON_HISTORY mode wraps the npm ``topojson``
library: ``topojson.topology(newHistoryObject)`` over the array of
per-version history Features (map-geom-reconstruction.js:257-275 —
note it passes the ARRAY, so the topology objects are keyed "0", "1",
… like JS ``Object.keys`` of an array). No TopoJSON library ships in
this environment, so this module implements the published topology
algorithm (topojson-server: geometry → extract → join → cut → dedup)
from its documented semantics:

- every line start/end is a junction; an interior point becomes a
  junction when it is revisited with a different (prev, next)
  neighbor pair (orientation-insensitive);
- lines are cut at interior junctions into arcs; rings are rotated to
  start at a junction before cutting, or kept whole if junction-free;
- arcs deduplicate exactly or reversed (a reversed reference is the
  ones'-complement ~index); junction-free rings also deduplicate
  under rotation;
- quantization (optional, the reference passes none) snaps
  coordinates to a (q-1)×(q-1) grid over the bbox and delta-encodes
  arcs, emitting the ``transform`` member.

The output is a plain dict: ``{"type": "Topology", "bbox": [...],
("transform": {...},) "objects": {...}, "arcs": [...]}``.
"""

from __future__ import annotations

from typing import Any

_LINE_TYPES = {"LineString", "MultiLineString", "Polygon", "MultiPolygon"}


def _geomify(o: dict | None) -> dict:
    """GeoJSON object → topology geometry object (topojson-server
    geometry.js): Features collapse onto their geometry, carrying id +
    (non-empty) properties; line types rename coordinates → arcs."""
    if o is None:
        return {"type": None}
    t = o.get("type")
    if t == "FeatureCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [_geomify(f) for f in o["features"]],
        }
    if t == "Feature":
        out = _geomify(o.get("geometry"))
        if o.get("id") is not None:
            out["id"] = o["id"]
        if o.get("properties"):
            out["properties"] = o["properties"]
        return out
    if t == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [_geomify(g) for g in o["geometries"]],
        }
    if t in ("Point", "MultiPoint"):
        return {"type": t, "coordinates": o["coordinates"]}
    if t in _LINE_TYPES:
        return {"type": t, "arcs": o["coordinates"]}
    return {"type": None}


def _walk_lines(geom: dict, fn) -> None:
    """Apply fn(sequence, is_ring) -> replacement to every line/ring
    coordinate sequence of a geometry object, bottom-up."""
    t = geom.get("type")
    if t == "GeometryCollection":
        for g in geom["geometries"]:
            _walk_lines(g, fn)
    elif t == "LineString":
        geom["arcs"] = fn(geom["arcs"], False)
    elif t == "MultiLineString":
        geom["arcs"] = [fn(line, False) for line in geom["arcs"]]
    elif t == "Polygon":
        geom["arcs"] = [fn(ring, True) for ring in geom["arcs"]]
    elif t == "MultiPolygon":
        geom["arcs"] = [
            [fn(ring, True) for ring in poly] for poly in geom["arcs"]
        ]


def _junctions(extracted: list[tuple[list, bool]]) -> set:
    """Point keys that must cut arcs (topojson-server join.js)."""
    junctions: set = set()
    neighbors: dict[Any, tuple] = {}
    visited: dict[Any, int] = {}

    def see(line_id, prev_pt, cur_pt, next_pt):
        if visited.get(cur_pt) == line_id:
            return  # self-intersection within one line: first visit wins
        visited[cur_pt] = line_id
        pair = neighbors.get(cur_pt)
        this_pair = (prev_pt, next_pt)
        if pair is not None:
            if pair != this_pair and pair != (next_pt, prev_pt):
                junctions.add(cur_pt)
        else:
            neighbors[cur_pt] = this_pair

    for line_id, (seq, is_ring) in enumerate(extracted):
        pts = [tuple(p) for p in seq]
        if len(pts) < 2:
            continue  # degenerate (empty/single-point) — nothing to cut
        if not is_ring:
            junctions.add(pts[0])
            junctions.add(pts[-1])
            for i in range(1, len(pts) - 1):
                see(line_id, pts[i - 1], pts[i], pts[i + 1])
        else:
            # closed ring (pts[0] == pts[-1]); wraparound neighbors,
            # no automatic junction at the start point
            n = len(pts) - 1
            for i in range(n):
                see(line_id, pts[(i - 1) % n], pts[i], pts[(i + 1) % n])
    return junctions


def _cut(seq: list, is_ring: bool, junctions: set) -> list[list]:
    """One extracted sequence → list of arc point-sequences."""
    pts = [tuple(p) for p in seq]
    if len(pts) < 2:
        return [pts]  # degenerate: empty coordinates are emitted by
        # the builder quirk (empty majorVersion array is truthy)
    if is_ring:
        n = len(pts) - 1
        ring = pts[:n]
        starts = [i for i in range(n) if ring[i] in junctions]
        if not starts:
            return [pts]  # junction-free ring stays whole
        # rotate so the ring starts at the first junction
        s = starts[0]
        ring = ring[s:] + ring[:s]
        ring.append(ring[0])
        pts = ring
    arcs: list[list] = []
    start = 0
    for i in range(1, len(pts) - 1):
        if pts[i] in junctions:
            arcs.append(pts[start : i + 1])
            start = i
    arcs.append(pts[start:])
    return arcs


def topology(
    objects: dict | list, quantization: int | None = None
) -> dict:
    """GeoJSON objects → TopoJSON Topology (dict).

    ``objects`` may be a list (the reference passes the history
    FEATURE ARRAY — keys become "0", "1", …) or a name→object dict.
    """
    if isinstance(objects, (list, tuple)):
        objects = {str(i): o for i, o in enumerate(objects)}
    geoms = {k: _geomify(v) for k, v in objects.items()}

    # bbox over every coordinate (points + lines)
    xs: list[float] = []
    ys: list[float] = []

    def scan(geom):
        t = geom.get("type")
        if t == "GeometryCollection":
            for g in geom["geometries"]:
                scan(g)
        elif t == "Point":
            xs.append(geom["coordinates"][0]), ys.append(geom["coordinates"][1])
        elif t == "MultiPoint":
            for p in geom["coordinates"]:
                xs.append(p[0]), ys.append(p[1])
        elif t in _LINE_TYPES:
            def visit(seq, _ring):
                for p in seq:
                    xs.append(p[0]), ys.append(p[1])
                return seq
            _walk_lines(geom, visit)

    for g in geoms.values():
        scan(g)
    bbox = [min(xs), min(ys), max(xs), max(ys)] if xs else None

    transform = None
    if quantization and quantization > 0 and bbox:
        x0, y0, x1, y1 = bbox
        kx = (quantization - 1) / (x1 - x0) if x1 > x0 else 1.0
        ky = (quantization - 1) / (y1 - y0) if y1 > y0 else 1.0
        transform = {
            "scale": [1.0 / kx, 1.0 / ky],
            "translate": [x0, y0],
        }

        def q(p):
            return (round((p[0] - x0) * kx), round((p[1] - y0) * ky))
    else:

        def q(p):
            return (p[0], p[1])

    # extract: collect every line/ring sequence (quantized), leaving a
    # slot index in the geometry for the cut/dedup result
    extracted: list[tuple[list, bool]] = []

    def dedup_consecutive(seq):
        if not seq:
            return []
        out = [seq[0]]
        for p in seq[1:]:
            if p != out[-1]:
                out.append(p)
        return out

    for g in geoms.values():
        def grab(seq, is_ring):
            pts = dedup_consecutive([q(p) for p in seq])
            if is_ring and pts and pts[0] != pts[-1]:
                pts.append(pts[0])
            extracted.append((pts, is_ring))
            return len(extracted) - 1  # slot
        _walk_lines(g, grab)
        if g.get("type") in ("Point", "MultiPoint") and quantization:
            if g["type"] == "Point":
                g["coordinates"] = list(q(g["coordinates"]))
            else:
                g["coordinates"] = [list(q(p)) for p in g["coordinates"]]

    junctions = _junctions(extracted)

    # cut + dedup
    arcs: list[list] = []  # point sequences, first-appearance order
    index_by_key: dict[tuple, int] = {}
    ring_index_by_key: dict[tuple, int] = {}

    def ring_canonical(pts):
        """rotation-invariant key of a closed junction-free ring."""
        if len(pts) <= 1:
            return tuple(pts)  # degenerate collapsed ring
        core = pts[:-1]
        best = min(
            tuple(core[i:] + core[:i]) for i in range(len(core))
        )
        return best

    def arc_ref(pts, is_uncut_ring) -> int:
        fwd = tuple(pts)
        if fwd in index_by_key:
            return index_by_key[fwd]
        rev = tuple(reversed(pts))
        if rev in index_by_key:
            return ~index_by_key[rev]
        if is_uncut_ring:
            ck = ring_canonical(list(fwd))
            if ck in ring_index_by_key:
                return ring_index_by_key[ck]
            rk = ring_canonical(list(rev))
            if rk in ring_index_by_key:
                return ~ring_index_by_key[rk]
        i = len(arcs)
        arcs.append(list(fwd))
        index_by_key[fwd] = i
        if is_uncut_ring:
            ring_index_by_key[ring_canonical(list(fwd))] = i
        return i

    cut_by_slot: list[list[int]] = []
    for seq, is_ring in extracted:
        pieces = _cut(seq, is_ring, junctions)
        uncut_ring = (
            is_ring
            and len(pieces) == 1
            and len(pieces[0]) > 0
            and pieces[0][0] not in junctions
        )
        cut_by_slot.append([arc_ref(p, uncut_ring) for p in pieces])

    for g in geoms.values():
        _walk_lines(g, lambda slot, _ring: cut_by_slot[slot])

    # serialize arcs: absolute positions, or delta-encoded when quantized
    def encode(pts):
        if transform is None:
            return [list(p) for p in pts]
        out = []
        px = py = 0
        for x, y in pts:
            out.append([x - px, y - py])
            px, py = x, y
        return out

    topo = {"type": "Topology"}
    if bbox is not None:
        topo["bbox"] = bbox
    if transform is not None:
        topo["transform"] = transform
    topo["objects"] = geoms
    topo["arcs"] = [encode(a) for a in arcs]
    return topo
