"""J2/J3 node-location join vs the pure-Python oracle."""

import pytest

from osm_wayback_spark import pipeline
from osm_wayback_spark.synth import synth_pages

from .oracle import (
    add_history_oracle,
    build_index,
    extract_all,
    node_locations_oracle,
)

SF = 0.001


@pytest.fixture(scope="module")
def spark_geom(spark):
    pages = synth_pages(spark, SF)
    rows = pipeline.geometry_pipeline(pages).collect()
    return {(r.element_type, r.id): r for r in rows}


@pytest.fixture(scope="module")
def oracle_geom():
    versions, locs, features = build_index(extract_all(SF))
    histories = add_history_oracle(versions, features)
    return node_locations_oracle(histories, features, locs)


def _normalize_nested(nl) -> dict:
    out = {}
    for node_id, by_cs in nl.items():
        inner = {}
        for cs, rec in by_cs.items():
            d = rec.asDict() if hasattr(rec, "asDict") else dict(rec)
            if d.get("p") is not None:
                d["p"] = list(d["p"])
            inner[str(cs)] = {k: v for k, v in d.items()}
        out[str(node_id)] = inner
    return out


def test_node_locations_match_oracle(spark_geom, oracle_geom):
    assert len(oracle_geom) > 20
    for key, row in spark_geom.items():
        if key in oracle_geom:
            assert row.node_locations is not None, key
            got = _normalize_nested(row.node_locations)
            exp = {
                nid: {cs: {k: v for k, v in rec.items()} for cs, rec in by.items()}
                for nid, by in oracle_geom[key].items()
            }
            assert got == exp, f"nodeLocations mismatch for {key}"
        else:
            # attached only when ≥1 node resolved (add_geometry.cpp:150)
            assert row.node_locations is None or key[0] == "node"


def test_nodes_pass_through_without_locations(spark_geom):
    for (etype, _id), row in spark_geom.items():
        if etype == "node":
            assert row.node_locations is None


def test_refs_source_path_identical_to_history_derived(spark):
    """late r7: refs derived from the versions table (one narrow
    distinct) must reproduce the with_history-derived refs exactly —
    the change only removes the duplicated history-assembly subtree
    from the physical plan, never a row or map entry."""
    from osm_wayback_spark.operators.history import add_history
    from osm_wayback_spark.operators.locations import add_node_locations

    pages = synth_pages(spark, SF)
    t = pipeline.build_tables(pages)
    hist = add_history(t["features"], t["versions"])
    old = add_node_locations(hist, t["node_locations"])
    new = add_node_locations(
        hist, t["node_locations"], refs_source=t["versions"]
    )

    def canon(df):
        def canon_nl(nl):
            if nl is None:
                return None
            return tuple(sorted(
                (k, tuple(sorted(
                    (k2, (tuple(v2.p) if v2.p is not None else None,
                          v2.i, v2.u, v2.h, v2.t))
                    for k2, v2 in v.items()
                )))
                for k, v in nl.items()
            ))

        return sorted(
            (r.element_type, r.id, canon_nl(r.node_locations))
            for r in df.select(
                "element_type", "id", "node_locations"
            ).collect()
        )

    assert canon(old) == canon(new)
