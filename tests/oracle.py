"""Pure-Python oracle of the reference pipeline (no Spark).

Re-executes, driver-side and row-at-a-time like the reference, the
semantics of build_lookup_index → add_history → add_geometry over the
same synthetic pages, so Spark results can be golden-compared. Tag
diff follows add_history.cpp:118-204 (diff vs previous FOUND version);
node_locations follows json_encoding.hpp:51-57 (max version per
(node, changeset)).
"""

from __future__ import annotations

from osm_wayback_spark.sources.extract import extract_island
from osm_wayback_spark.synth import synth_pages_local


def extract_all(sf: float) -> list[dict]:
    pdf = synth_pages_local(sf)
    return [extract_island(h) for h in pdf["html"]]


def build_index(islands: list[dict]):
    """→ (versions_by_key, node_locations, features)"""
    versions: dict[tuple, dict] = {}
    for isl in islands:
        versions[(isl["element_type"], isl["id"], isl["version"])] = isl
    # locations CF: per (node, changeset) keep max version
    node_locations: dict[int, dict[int, dict]] = {}
    for isl in islands:
        if isl["element_type"] != "node":
            continue
        by_cs = node_locations.setdefault(isl["id"], {})
        cur = by_cs.get(isl["changeset"])
        if cur is None or isl["version"] > cur["i"]:
            by_cs[isl["changeset"]] = {
                "p": isl.get("lonlat"),
                "i": isl["version"],
                "u": isl.get("uid"),
                "h": isl.get("user"),
                "t": isl["ts"],
            }
    # features: latest version per entity, needs geometry
    latest: dict[tuple, dict] = {}
    for isl in islands:
        k = (isl["element_type"], isl["id"])
        if k not in latest or isl["version"] > latest[k]["version"]:
            latest[k] = isl
    features = {k: v for k, v in latest.items() if v.get("geometry") is not None}
    return versions, node_locations, features


def tag_diff_record(isl: dict, prev_tags: dict | None) -> dict:
    """One @history record with short keys (add_history.cpp:66-226)."""
    rec = {
        "i": isl["version"],
        "c": isl.get("changeset"),
        "t": isl["ts"],
        "u": isl.get("uid"),
        "h": isl.get("user"),
    }
    if isl.get("deleted"):
        rec["d"] = True
    if not isl.get("deleted") and isl.get("lonlat") is not None:
        rec["p"] = isl["lonlat"]
    if isl.get("node_refs") is not None:
        rec["n"] = isl["node_refs"]
    cur = isl.get("tags") or {}
    if prev_tags is None:
        rec["aA"] = dict(cur)
    elif cur != prev_tags:
        added = {k: v for k, v in cur.items() if k not in prev_tags}
        deleted = {k: v for k, v in prev_tags.items() if k not in cur}
        modified = {
            k: [prev_tags[k], cur[k]]
            for k in cur
            if k in prev_tags and cur[k] != prev_tags[k]
        }
        if added:
            rec["aA"] = added
        if modified:
            rec["aM"] = modified
        if deleted:
            rec["aD"] = deleted
    return rec


def add_history_oracle(versions, features) -> dict[tuple, list[dict]]:
    """feature key → @history array (version-ascending, diff vs
    previous FOUND version — add_history.cpp:92,94-213)."""
    out = {}
    for (etype, eid), feat in features.items():
        history = []
        prev_tags = None
        for v in range(1, feat["version"] + 1):
            isl = versions.get((etype, eid, v))
            if isl is None:
                continue  # lookup_fail — gap tolerated
            history.append(tag_diff_record(isl, prev_tags))
            prev_tags = isl.get("tags") or {}
        out[(etype, eid)] = history
    return out


def node_locations_oracle(
    histories, features, node_locations
) -> dict[tuple, dict]:
    """feature key → nested nodeLocations (add_geometry.cpp:50-152);
    only non-node features, only when ≥1 node resolves."""
    out = {}
    for (etype, eid), history in histories.items():
        if etype == "node":
            continue
        refs: set[int] = set()
        for rec in history:
            for ref in rec.get("n") or []:
                refs.add(ref)
        nested = {}
        for ref in sorted(refs):
            if ref in node_locations:
                nested[str(ref)] = {
                    str(cs): dict(v) for cs, v in node_locations[ref].items()
                }
        if nested:
            out[(etype, eid)] = nested
    return out
