"""INDEPENDENT stage-4 (geometry reconstruction) oracle — no Spark,
no engine imports.

A deliberate second implementation of the reference's reconstruction
stage, transliterated statement-by-statement from the JS sources
(way-history-builder.js:32-443, node-history-builder.js:26-77,
relation-history-builder.js:30-67, map-geom-reconstruction.js:47-295)
rather than derived from the engine kernel. It must NOT import
``osm_wayback_spark.operators._reconstruct_core`` or
``operators.reconstruction`` — the whole point is that a semantics bug
in the engine kernel makes the driver's ``pages_reconstruct`` hash
comparison FAIL instead of being mirrored here
(tests/test_oracle_independent.py additionally proves equivalence on
the synthetic corpus and that a mutated kernel diverges).

Style notes (fidelity over elegance, intentionally): JS truthiness is
reproduced with bare ``if x`` on the same expressions the source
tests; the ``JSON.parse(JSON.stringify(...))`` deep copy is performed
literally; variable roles (prevNode / prevNodeNotAdded / deleteMe /
prevTime) mirror the source so a reviewer can diff this file against
the JS line-by-line.
"""

from __future__ import annotations

import json

# way-history-builder.js:3-7 (node/relation builders declare 5 min
# but never use it in any decision).
MINOR_CHANGESET_VERSION_THRESHOLD = 60 * 1
CHANGESET_THRESHOLD = 60 * 1

# map-geom-reconstruction.js:30-45
CONFIG = {
    "GEOMETRY_ONLY": False,
    "INCLUDE_DIFFS_ON_MAJOR_VERSIONS": False,
    "INCLUDE_FULL_PROPERTIES_ON_MAJOR_VERSIONS": True,
    "INCLUDE_FULL_PROPERTIES_ON_MINOR_VERSIONS": True,
}


def _get_node_versions(node_locations, node_ref, valid_since, valid_until, changeset):
    """way-history-builder.js:32-155 getNodeVersions."""
    # js:42 nodeLocations[nodeRef.toString()]
    node_versions_by_changeset = node_locations.get(str(node_ref))
    if node_versions_by_changeset is None:
        node_versions_by_changeset = node_locations.get(int(node_ref))
    if node_versions_by_changeset is None:
        return None  # js:45 "No version of Node"
    # js:49 Object.values(...) iterates integer-like keys in ascending
    # numeric order; each record's `c` equals its changeset key
    # (json_encoding.hpp:60 writes the member; the nested key IS the
    # changeset, so backfilling from the key is byte-equivalent).
    values = [
        dict(v, c=int(k))
        for k, v in sorted(
            node_versions_by_changeset.items(), key=lambda kv: int(kv[0])
        )
    ]
    # js:49 _.sortBy(..., n.t) — stable
    node_versions = sorted(values, key=lambda n: n["t"])
    # js:52 filter hasOwnProperty('p') — deleted versions carry no p
    # (json_encoding.hpp:35-46); a None p ≡ the absent member.
    node_versions = [n for n in node_versions if n.get("p") is not None]

    if len(node_versions) == 0:
        return False  # js:54-59 "LIKELY REDACTED"
    if len(node_versions) == 1:
        return node_versions  # js:62-64

    prev_node = node_versions[0]  # js:67
    prev_node_not_added = None
    filtered_nodes = []

    if valid_since:  # js:71 (False ≡ JS false)
        for node in node_versions:  # js:73-88
            if node["c"] == changeset:  # OVERRIDE 1
                filtered_nodes.append(node)
            elif node["t"] >= valid_since:
                filtered_nodes.append(node)
            else:
                prev_node_not_added = dict(node)  # Object.assign({},node)
            prev_node = node  # js:87 — reassigned EVERY iteration
        if len(filtered_nodes) == 0:  # js:90-92 safety condition 1
            return [prev_node]
        if prev_node_not_added is not None:  # js:95-99
            if filtered_nodes[0]["t"] > valid_since + CHANGESET_THRESHOLD:
                filtered_nodes.insert(0, prev_node_not_added)
    else:
        filtered_nodes = node_versions  # js:101-103

    # js:106 — the literal deep copy
    filterable = json.loads(json.dumps(filtered_nodes))

    if valid_until:  # js:109-121
        filterable = [
            v for v in filterable if v["t"] < valid_until or v["c"] == changeset
        ]
        if len(filterable) == 0:
            if prev_node:
                return [prev_node]
            return False
    if len(filterable) == 1:
        return filterable  # js:123
    # js:127-140 — collapse consecutive identical coordinates
    diff_geoms = [filterable[0]]
    prev = filterable[0]["p"]
    for i in range(1, len(filterable)):
        if prev[0] != filterable[i]["p"][0] or prev[1] != filterable[i]["p"][1]:
            diff_geoms.append(filterable[i])
            prev = filterable[i]["p"]
    return diff_geoms


def _build_all_possible_version_geometries(
    node_locations, node_refs, valid_since, valid_until, changeset
):
    """way-history-builder.js:169-337 buildAllPossibleVersionGeometries."""
    versions = []
    for node_ref in node_refs:  # js:190-207
        possible_nodes = _get_node_versions(
            node_locations, node_ref, valid_since, valid_until, changeset
        )
        if possible_nodes:  # None/False falsy; returned lists never empty
            versions.append(list(possible_nodes))  # .slice(0)

    major_version = [a[0] for a in versions]  # js:221

    countable_minor_versions_try2 = None  # js var hoisting: undefined
    lens = [len(a) for a in versions]
    max_len = max(lens) if lens else None  # _.max([]) → undefined

    if max_len is not None and max_len > 1:  # js:234
        # Step 1 (js:243-258): all changesets with their time ranges;
        # first-seen u/h win (insertion order = refs order, then time).
        minor_changesets: dict[int, dict] = {}
        for v in versions:
            for u in v:
                if u["c"] in minor_changesets:
                    if u["t"] > minor_changesets[u["c"]]["max"]:
                        minor_changesets[u["c"]]["max"] = u["t"]
                    if u["t"] < minor_changesets[u["c"]]["min"]:
                        minor_changesets[u["c"]]["min"] = u["t"]
                else:
                    minor_changesets[u["c"]] = {
                        "min": u["t"],
                        "max": u["t"],
                        "u": u.get("u"),
                        "h": u.get("h"),
                        "nodes": [],
                    }

        # js:262-281: validity pruning
        delete_me = [changeset]  # the major version's own changeset
        prev_time = None
        for c_key in sorted(minor_changesets.keys()):
            # js:266 `max < validSince` — validSince false coerces to 0
            if minor_changesets[c_key]["max"] < (valid_since if valid_since else 0):
                delete_me.append(c_key)
            if prev_time:  # js:270 truthiness (ts never 0 in practice)
                if (
                    minor_changesets[c_key]["max"] - MINOR_CHANGESET_VERSION_THRESHOLD
                    < prev_time
                ):
                    # js:272 pushes the CURRENT key (comment says
                    # "previous" — code wins)
                    delete_me.append(c_key)
            prev_time = minor_changesets[c_key]["max"]
        for c_key in delete_me:
            minor_changesets.pop(c_key, None)

        # js:288-315: assign one node per ref to each minor changeset
        for c_key in sorted(minor_changesets.keys()):
            for i in range(len(versions)):
                if len(versions[i]) == 1:
                    minor_changesets[c_key]["nodes"].append(versions[i][0])
                elif c_key in [v["c"] for v in versions[i]]:
                    minor_changesets[c_key]["nodes"].append(
                        [v for v in versions[i] if v["c"] == c_key][0]
                    )
                else:
                    nv = sorted(versions[i], key=lambda v: v["t"])  # stable
                    prev_node = nv[0]
                    for j in range(1, len(nv)):
                        if nv[j]["t"] > minor_changesets[c_key]["max"]:
                            break
                        prev_node = nv[j]
                    minor_changesets[c_key]["nodes"].append(prev_node)

        # js:317-331
        countable_minor_versions_try2 = []
        minor_version_idx = 1
        for c in sorted(minor_changesets.keys()):
            obj = minor_changesets[c]
            countable_minor_versions_try2.append(
                {
                    "minorVersion": minor_version_idx,
                    "changeset": obj.get("c"),  # undefined in the source
                    "validSince": obj["max"],
                    "user": obj["h"],
                    "uid": obj["u"],
                    "coordinates": [p["p"] for p in obj["nodes"]],
                }
            )
            minor_version_idx += 1

    return {
        "majorVersion": [g["p"] for g in major_version],
        "minorVersions": countable_minor_versions_try2,
    }


def _way_historical_geometries(history, node_locations):
    """way-history-builder.js:347-443 buildGeometries."""
    hg: dict[int, list[dict]] = {}
    n = len(history)
    for i in range(n):
        valid_since = history[i]["t"] if i > 0 else False  # js:369-371
        valid_until = (
            history[i + 1]["t"] - CHANGESET_THRESHOLD if i < n - 1 else False
        )  # js:373-375
        if history[i].get("n") is None:  # js:379 hasOwnProperty('n')
            continue
        major_version_number = history[i]["i"]
        geometries = _build_all_possible_version_geometries(
            node_locations,
            history[i]["n"],
            valid_since,
            valid_until,
            history[i].get("c"),
        )
        # js:391 if(geometries.majorVersion) — an array, always truthy
        hg[major_version_number] = [
            {
                "type": "Feature",
                "properties": {
                    "@version": major_version_number,
                    "@minorVersion": 0,
                    "@user": history[i].get("h"),
                    "@changeset": history[i].get("c"),
                    "@uid": history[i].get("u"),
                    "@validSince": history[i]["t"],
                    "@validUntil": history[i + 1]["t"] if i < n - 1 else None,
                },
                "geometry": {
                    "type": "LineString",
                    "coordinates": geometries["majorVersion"],
                },
            }
        ]
        mv = geometries["minorVersions"]
        if mv and len(mv) > 0:  # js:410
            hg[major_version_number][0]["properties"]["@validUntil"] = mv[0][
                "validSince"
            ]
            for j in range(len(mv)):
                hg[major_version_number].append(
                    {
                        "type": "Feature",
                        "geometry": {
                            "type": "LineString",
                            "coordinates": mv[j]["coordinates"],
                        },
                        "properties": {
                            "@version": major_version_number,
                            "@minorVersion": mv[j]["minorVersion"],
                            "@changeset": mv[j]["changeset"],  # undefined
                            "@user": mv[j]["user"],
                            "@uid": mv[j]["uid"],
                            "@validSince": mv[j]["validSince"],
                            "@validUntil": mv[j + 1]["validSince"]
                            if j < len(mv) - 1
                            else None,
                        },
                    }
                )
            # js:436-438 — next major version caps the LAST minor
            if i < n - 1:
                hg[major_version_number][-1]["properties"]["@validUntil"] = history[
                    i + 1
                ]["t"]
    return hg


def _node_historical_geometries(history):
    """node-history-builder.js:26-77 buildGeometries."""
    hg: dict[int, list[dict]] = {}
    n = len(history)
    for i in range(n):
        this_major_version = history[i]["i"]
        valid_since = history[i]["t"]
        valid_until = history[i + 1]["t"] if i < n - 1 else False
        ver = dict(history[i])
        p = ver.pop("p", None)  # js:59 delete versions[i].p
        geometry = (
            {"type": "Point", "coordinates": p} if p is not None else None
        )
        this_node = {
            "geometry": geometry,
            "properties": {"@validSince": valid_since, "@validUntil": valid_until},
        }
        # js:72 {...thisNode, ...versions[i]} — record fields land at
        # the entry TOP level, not inside properties.
        this_node.update({k: v for k, v in ver.items() if v is not None})
        hg[this_major_version] = [this_node]
    return hg


def _relation_historical_geometries(history, current_geometry):
    """relation-history-builder.js:30-67 — the GEOMETRY FAKER: the
    current geometry is shared onto every version (the JS shares the
    same object reference; nothing downstream mutates relations)."""
    hg: dict[int, list[dict]] = {}
    n = len(history)
    for i in range(n):
        this_major_version = history[i]["i"]
        this_version = {
            "geometry": current_geometry,
            "properties": {
                "@validSince": history[i]["t"],
                "@validUntil": history[i + 1]["t"] if i < n - 1 else False,
            },
        }
        this_version.update(
            {k: v for k, v in history[i].items() if v is not None}
        )
        hg[this_major_version] = [this_version]
    return hg


def _reconstruct_major_osm_tags(base_object, new_object):
    """map-geom-reconstruction.js:11-28."""
    if new_object.get("aA"):
        for key in new_object["aA"]:
            base_object[key] = new_object["aA"][key]
    if new_object.get("aM"):
        for key in new_object["aM"]:
            base_object[key] = new_object["aM"][key][1]
    if new_object.get("aD"):
        for key in new_object["aD"]:
            base_object.pop(key, None)
    return base_object


def _js_or(a, b):
    """JS ``a || b`` — 0, '', None, False all fall through."""
    return a if a else b


def reconstruct_features(
    element_type, osm_id, geometry, history, node_locations, config=None
):
    """map-geom-reconstruction.js:70-232 — the newHistoryObject array
    (WRITE_EVERY_GEOMETRY feature stream). Returns None when no
    geometry builder gets defined (status.noNodeLocations ≡ nothing
    written for the line)."""
    cfg = dict(CONFIG)
    cfg.update(config or {})
    if history is None:
        return None  # no @history → status.noHistory (caller decides)

    if element_type == "node":  # js:74-80
        hg = _node_historical_geometries(history)
    elif node_locations is not None:  # js:83-89 — KEY presence (js:82)
        hg = _way_historical_geometries(history, node_locations)
    elif element_type == "relation":  # js:92-97
        hg = _relation_historical_geometries(history, geometry)
    else:
        return None  # js:98-100 noNodeLocations

    geometry_type = geometry.get("type") if geometry else None  # js:113
    new_history_object = []
    major_version_tags: dict = {}

    for hist_obj in history:  # js:123
        major_version_tags = _reconstruct_major_osm_tags(
            major_version_tags, hist_obj
        )
        major_version_key = hist_obj["i"]
        entries = hg.get(major_version_key, [])
        for i in range(len(entries)):  # js:126 for(var i in ...)
            entry = entries[i]
            # js:130-135 Polygon re-closure (mutates the entry, like JS)
            if element_type == "way" and geometry_type in (
                "Polygon",
                "MultiPolygon",
            ) and entry["geometry"] is not None:
                entry["geometry"]["type"] = "Polygon"
                entry["geometry"]["coordinates"] = [
                    entry["geometry"]["coordinates"]
                ]

            this_version = {"type": "Feature", "geometry": entry["geometry"]}

            if cfg["GEOMETRY_ONLY"]:  # js:142-147
                this_version["properties"] = {
                    "@validSince": entry["properties"]["@validSince"],
                    "@validUntil": entry["properties"]["@validUntil"],
                }
            else:
                props = entry["properties"]  # js:150 — alias, as in JS
                props["@id"] = osm_id
                # js:155-165 backfills; an undefined result means the
                # member is dropped by JSON.stringify → drop the key.
                for prop_key, src_key in (
                    ("@user", "h"),
                    ("@uid", "u"),
                    ("@changeset", "c"),
                ):
                    val = _js_or(props.get(prop_key), entry.get(src_key))
                    if val is None:
                        props.pop(prop_key, None)
                    else:
                        props[prop_key] = val
                props["@version"] = _js_or(props.get("@version"), major_version_key)

                if i == 0:  # js:168 — diffs only on major versions
                    if cfg["INCLUDE_DIFFS_ON_MAJOR_VERSIONS"]:
                        for dk in ("aA", "aM", "aD"):
                            if dk in hist_obj and hist_obj[dk] is not None:
                                props[dk] = hist_obj[dk]
                    if cfg["INCLUDE_FULL_PROPERTIES_ON_MAJOR_VERSIONS"]:
                        props = {**props, **major_version_tags}
                else:
                    if cfg["INCLUDE_FULL_PROPERTIES_ON_MINOR_VERSIONS"]:
                        props = {**props, **major_version_tags}
                this_version["properties"] = props

            # js:214-216 — delete properties.n (guarded on thisVersion
            # in the source, so effectively dead; kept harmless here)
            this_version["properties"].pop("n", None)
            new_history_object.append(this_version)
    return new_history_object


def reconstruct_rows(
    element_type, osm_id, geometry, history, node_locations, config=None
):
    """The WRITE_EVERY_GEOMETRY feature stream flattened to the typed
    columns of the driver's expected table. @validUntil false (node/
    relation last version) and null (way last version) both map to SQL
    NULL; geometry serializes compact, like the reference's stringify.
    """
    feats = reconstruct_features(
        element_type, osm_id, geometry, history, node_locations, config
    )
    if feats is None:
        return []
    rows = []
    for ft in feats:
        props = ft["properties"]
        vu = props.get("@validUntil")
        rows.append(
            {
                "element_type": element_type,
                "id": osm_id,
                "version": int(props.get("@version") or 0),
                "minor_version": int(props.get("@minorVersion") or 0),
                "valid_since": props.get("@validSince") or None,
                "valid_until": vu
                if isinstance(vu, int) and not isinstance(vu, bool)
                else None,
                "geometry": json.dumps(ft["geometry"], separators=(",", ":"))
                if ft["geometry"] is not None
                else None,
            }
        )
    return rows
