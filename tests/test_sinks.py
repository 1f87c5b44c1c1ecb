import json

import pytest
from pyspark.sql import functions as F

from osm_wayback_spark.sources.sinks import (
    classify_geometry,
    to_topojson_history,
    with_observed_counts,
    write_geojsonseq,
)


def test_classify_geometry(spark):
    rows = [
        (1, {"building": "yes"}, True),
        (2, {"building": "yes"}, False),   # not closed → LineString
        (3, {"highway": "primary"}, True),  # linear wins even closed
        (4, {"name": "x"}, True),
    ]
    df = spark.createDataFrame(rows, "id long, tags map<string,string>, closed boolean")
    got = {
        r.id: r.g
        for r in df.select(
            "id", classify_geometry(F.col("tags"), F.col("closed")).alias("g")
        ).collect()
    }
    assert got == {1: "Polygon", 2: "LineString", 3: "LineString", 4: "LineString"}


def test_write_geojsonseq_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [('{"type":"Feature","properties":{"@id":1}}',)], "feature_json string"
    )
    out = str(tmp_path / "seq")
    write_geojsonseq(df, out)
    lines = [json.loads(l) for l in spark.read.text(out).toPandas()["value"]]
    assert lines == [{"type": "Feature", "properties": {"@id": 1}}]


def test_topojson_empty_history():
    import json

    t = json.loads(to_topojson_history([]))
    assert t == {"type": "Topology", "objects": {}, "arcs": []}


def test_observed_counts(spark):
    df = with_observed_counts(spark.range(5), "m")
    df.collect()
    # observation is attached; value surfaces via listener / query
    # progress — here we just assert the plan carries it and executes
    assert df.count() == 5
