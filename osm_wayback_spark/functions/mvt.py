"""Pure-Python Mapbox Vector Tile 2.1 encoder/decoder.

Closes the last artifact-format substitution vs the reference: its
final output is a tippecanoe-built `.mbtiles` whose tile payloads are
MVT protobufs (run.sh:65); `write_mbtiles` previously shipped gzip'd
GeoJSON with a documented format note. This module implements the
public MVT 2.1 spec (https://github.com/mapbox/vector-tile-spec)
directly — protobuf wire format (varint/zigzag), layer key/value
tables, cursor-delta geometry commands — with no protobuf library
dependency. The decoder exists for round-trip testing and for
consumers that want tile introspection without a JS stack.

Encoding is pure per-feature math, so the Spark side can run it
distributedly in an Arrow-batched kernel (one tile per row) — only
the finished blobs stream through the driver into sqlite.

Spec mapping (MVT 2.1 §4):
- Tile:    repeated Layer = field 3
- Layer:   version=2 (15), name (1), features (2), keys (3),
           values (4), extent (5)
- Feature: id (1), tags (2, packed), type (3), geometry (4, packed)
- Value:   string (1) | double (3) | int (4) | sint (6) | bool (7)
- Geometry: command integer (id & 0x7) | (count << 3);
  MoveTo=1, LineTo=2, ClosePath=7; params zigzag-encoded deltas
  from a running cursor.
- Winding (§4.3.3.3): with the surveyor's formula evaluated in tile
  coordinates (Y down), exterior rings must have POSITIVE signed
  area ("clockwise" on screen), interior rings negative. Rings are
  reversed as needed on encode.
"""

from __future__ import annotations

import math

EXTENT = 4096
_MAX_LAT = 85.05112878

# -- protobuf wire primitives ------------------------------------------------


def _varint(n: int) -> bytes:
    """Unsigned LEB128."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# -- projection --------------------------------------------------------------


def project(lon: float, lat: float, z: int, x: int, y: int,
            extent: int = EXTENT) -> tuple[int, int]:
    """lon/lat → integer tile-local coordinates of tile (z, x, y)
    (same Web-Mercator math as functions/tiles.py, scaled to the
    tile's extent grid). Coordinates may exceed [0, extent) for
    geometry crossing the tile edge — allowed by the spec (buffers)."""
    n = 1 << z
    px = (lon + 180.0) / 360.0 * n
    lat = max(-_MAX_LAT, min(_MAX_LAT, lat))
    rad = math.radians(lat)
    py = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n
    return (
        round((px - x) * extent),
        round((py - y) * extent),
    )


# -- value/key tables --------------------------------------------------------


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return _tag(1, 2) + _varint(len(s)) + s


def _decode_value(buf: bytes):
    pos = 0
    key, pos = _read_varint(buf, pos)
    field, wire = key >> 3, key & 0x7
    if field == 1:
        ln, pos = _read_varint(buf, pos)
        return buf[pos : pos + ln].decode("utf-8")
    if field == 3:
        import struct

        return struct.unpack("<d", buf[pos : pos + 8])[0]
    if field == 2:
        import struct

        return struct.unpack("<f", buf[pos : pos + 4])[0]
    if field in (4, 5):
        n, pos = _read_varint(buf, pos)
        return n
    if field == 6:
        n, pos = _read_varint(buf, pos)
        return _unzigzag(n)
    if field == 7:
        n, pos = _read_varint(buf, pos)
        return bool(n)
    raise ValueError(f"unknown Value field {field} (wire {wire})")


# -- geometry commands -------------------------------------------------------


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _ring_area2(ring: list[tuple[int, int]]) -> int:
    """Twice the signed area by the surveyor's formula in tile
    coordinates (Y down): positive = exterior winding per MVT §4.3.3.3."""
    s = 0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _encode_geometry(gtype: str, coords, cursor: list[int]) -> list[int]:
    """GeoJSON coordinates (already projected to integer tile coords)
    → MVT geometry integer sequence. ``cursor`` is the running
    [x, y] delta origin, mutated in place."""
    geom: list[int] = []

    def move_to(pts):
        geom.append(_cmd(1, len(pts)))
        for px, py in pts:
            geom.append(_zigzag(px - cursor[0]))
            geom.append(_zigzag(py - cursor[1]))
            cursor[0], cursor[1] = px, py

    def line_to(pts):
        geom.append(_cmd(2, len(pts)))
        for px, py in pts:
            geom.append(_zigzag(px - cursor[0]))
            geom.append(_zigzag(py - cursor[1]))
            cursor[0], cursor[1] = px, py

    if gtype == "Point":
        move_to([coords])
    elif gtype == "MultiPoint":
        move_to(coords)
    elif gtype == "LineString":
        move_to([coords[0]])
        line_to(coords[1:])
    elif gtype == "MultiLineString":
        for line in coords:
            move_to([line[0]])
            line_to(line[1:])
    elif gtype in ("Polygon", "MultiPolygon"):
        polys = [coords] if gtype == "Polygon" else coords
        for rings in polys:
            for ri, ring in enumerate(rings):
                pts = list(ring)
                if len(pts) > 1 and pts[0] == pts[-1]:
                    pts = pts[:-1]  # ClosePath replaces the repeat
                area2 = _ring_area2(pts)
                want_positive = ri == 0
                if (area2 > 0) != want_positive and area2 != 0:
                    pts = [pts[0]] + pts[:0:-1]
                move_to([pts[0]])
                line_to(pts[1:])
                geom.append(_cmd(7, 1))
    else:
        raise ValueError(f"unsupported geometry type: {gtype}")
    return geom


def _project_coords(gtype: str, coords, z: int, x: int, y: int, extent: int):
    p = lambda c: project(c[0], c[1], z, x, y, extent)  # noqa: E731
    if gtype == "Point":
        return p(coords)
    if gtype in ("MultiPoint", "LineString"):
        return [p(c) for c in coords]
    if gtype in ("MultiLineString", "Polygon"):
        return [[p(c) for c in part] for part in coords]
    if gtype == "MultiPolygon":
        return [[[p(c) for c in ring] for ring in poly] for poly in coords]
    raise ValueError(f"unsupported geometry type: {gtype}")


_GEOM_TYPE = {
    "Point": 1,
    "MultiPoint": 1,
    "LineString": 2,
    "MultiLineString": 2,
    "Polygon": 3,
    "MultiPolygon": 3,
}
_TYPE_NAME = {1: "POINT", 2: "LINESTRING", 3: "POLYGON"}


# -- public API --------------------------------------------------------------


def encode_tile(
    features: list[dict],
    z: int,
    x: int,
    y: int,
    layer_name: str = "features",
    extent: int = EXTENT,
) -> bytes:
    """GeoJSON Feature dicts → one MVT tile (single layer) as bytes.

    Properties keep scalar values only (string/int/float/bool; None
    skipped) per the spec's Value message. A numeric feature ``id``
    is carried through; non-numeric ids become an ``$id`` property."""
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    feature_msgs: list[bytes] = []

    for feat in features:
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        if gtype not in _GEOM_TYPE:
            continue
        projected = _project_coords(gtype, geom["coordinates"], z, x, y, extent)
        cursor = [0, 0]
        geom_ints = _encode_geometry(gtype, projected, cursor)

        props = dict(feat.get("properties") or {})
        fid = feat.get("id")
        if (
            fid is not None
            and not isinstance(fid, bool)
            and isinstance(fid, int)
            and fid >= 0
        ):
            pass  # non-negative numeric id → Feature.id (uint64) field
        elif fid is not None:
            # Feature.id is uint64: negative or non-numeric ids travel
            # as a property instead (a negative int would not survive
            # the unsigned varint).
            props["$id"] = fid
            fid = None

        tags: list[int] = []
        for k, v in props.items():
            if v is None:
                continue
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vb = _encode_value(v)
            if vb not in val_idx:
                val_idx[vb] = len(values)
                values.append(vb)
            tags.extend((key_idx[k], val_idx[vb]))

        body = bytearray()
        if fid is not None:
            body += _tag(1, 0) + _varint(fid)
        if tags:
            packed = b"".join(_varint(t) for t in tags)
            body += _len_delim(2, packed)
        body += _tag(3, 0) + _varint(_GEOM_TYPE[gtype])
        body += _len_delim(4, b"".join(_varint(g) for g in geom_ints))
        feature_msgs.append(bytes(body))

    layer = bytearray()
    layer += _tag(15, 0) + _varint(2)  # version
    name_b = layer_name.encode("utf-8")
    layer += _tag(1, 2) + _varint(len(name_b)) + name_b
    for fm in feature_msgs:
        layer += _len_delim(2, fm)
    for k in keys:
        kb = k.encode("utf-8")
        layer += _tag(3, 2) + _varint(len(kb)) + kb
    for vb in values:
        layer += _len_delim(4, vb)
    layer += _tag(5, 0) + _varint(extent)
    return bytes(_len_delim(3, bytes(layer)))


def _decode_geometry(ints: list[int]) -> list[list[tuple[int, int]]]:
    """MVT geometry integers → list of parts; each part is a list of
    (x, y) tile coords. ClosePath appends the part's first point."""
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] | None = None
    cx = cy = 0
    i = 0
    while i < len(ints):
        cmd = ints[i]
        i += 1
        cmd_id, count = cmd & 0x7, cmd >> 3
        if cmd_id == 1:  # MoveTo starts a new part per vertex run
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                cur = [(cx, cy)]
                parts.append(cur)
        elif cmd_id == 2:  # LineTo
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == 7:  # ClosePath
            cur.append(cur[0])
        else:
            raise ValueError(f"unknown geometry command {cmd_id}")
    return parts


def decode_tile(data: bytes) -> dict:
    """MVT bytes → {layer_name: {"version", "extent", "features":
    [{"id", "type", "parts", "properties"}]}} with ``parts`` in raw
    tile coordinates (see _decode_geometry)."""
    layers: dict = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire = key >> 3, key & 0x7
        if field != 3 or wire != 2:
            raise ValueError(f"unexpected Tile field {field}")
        ln, pos = _read_varint(data, pos)
        layer_buf = data[pos : pos + ln]
        pos += ln

        name = None
        version = None
        extent = EXTENT
        keys: list[str] = []
        values: list = []
        feats_raw: list[bytes] = []
        lpos = 0
        while lpos < len(layer_buf):
            lkey, lpos = _read_varint(layer_buf, lpos)
            f, w = lkey >> 3, lkey & 0x7
            if w == 2:
                lln, lpos = _read_varint(layer_buf, lpos)
                chunk = layer_buf[lpos : lpos + lln]
                lpos += lln
                if f == 1:
                    name = chunk.decode("utf-8")
                elif f == 2:
                    feats_raw.append(chunk)
                elif f == 3:
                    keys.append(chunk.decode("utf-8"))
                elif f == 4:
                    values.append(_decode_value(chunk))
            else:
                n, lpos = _read_varint(layer_buf, lpos)
                if f == 15:
                    version = n
                elif f == 5:
                    extent = n

        features = []
        for fb in feats_raw:
            fid = None
            ftype = None
            tags: list[int] = []
            geom_ints: list[int] = []
            fpos = 0
            while fpos < len(fb):
                fkey, fpos = _read_varint(fb, fpos)
                f, w = fkey >> 3, fkey & 0x7
                if w == 2:
                    fln, fpos = _read_varint(fb, fpos)
                    chunk = fb[fpos : fpos + fln]
                    fpos += fln
                    seq = []
                    cpos = 0
                    while cpos < len(chunk):
                        n, cpos = _read_varint(chunk, cpos)
                        seq.append(n)
                    if f == 2:
                        tags = seq
                    elif f == 4:
                        geom_ints = seq
                else:
                    n, fpos = _read_varint(fb, fpos)
                    if f == 1:
                        fid = n
                    elif f == 3:
                        ftype = n
            props = {
                keys[tags[i]]: values[tags[i + 1]]
                for i in range(0, len(tags), 2)
            }
            features.append(
                {
                    "id": fid,
                    "type": _TYPE_NAME.get(ftype, ftype),
                    "parts": _decode_geometry(geom_ints),
                    "properties": props,
                }
            )
        layers[name] = {
            "version": version,
            "extent": extent,
            "features": features,
        }
    return layers


def encode_tile_from_json(
    feature_jsons: list[str],
    z: int,
    x: int,
    y: int,
    layer_name: str = "features",
    extent: int = EXTENT,
) -> bytes:
    """Convenience: GeoJSON strings → MVT bytes (the shape the tile
    sink's per-tile aggregation produces). Accepts full Feature
    objects or bare geometries (``assign_tiles`` carries the raw
    geometry as ``feature_json``) — bare geometries are wrapped."""
    import json

    feats = []
    for s in feature_jsons:
        obj = json.loads(s)
        if obj.get("type") in _GEOM_TYPE:
            obj = {"type": "Feature", "geometry": obj, "properties": {}}
        feats.append(obj)
    return encode_tile(feats, z, x, y, layer_name, extent)
