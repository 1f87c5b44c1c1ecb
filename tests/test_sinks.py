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


def test_write_mbtiles_container(spark, tmp_path):
    """Real MBTiles 1.3 container (payload="json" option): TMS
    y-flip, unique tile index, metadata table, gzip'd deterministic
    per-tile payload that decodes back to the input features."""
    import gzip
    import sqlite3

    from osm_wayback_spark.operators.tiles import assign_tiles
    from osm_wayback_spark.sources.sinks import write_mbtiles

    df = spark.createDataFrame(
        [
            ("node", 1, '{"type":"Point","coordinates":[-77.03,38.89]}'),
            ("node", 2, '{"type":"Point","coordinates":[-77.03,38.89]}'),
            ("node", 3, '{"type":"Point","coordinates":[10.0,50.0]}'),
        ],
        "element_type string, id long, geometry string",
    )
    tiles = assign_tiles(df, z=7)
    path = str(tmp_path / "out.mbtiles")
    stats = write_mbtiles(tiles, path, name="t", payload="json")
    assert stats["tiles"] == 2 and stats["minzoom"] == stats["maxzoom"] == 7

    con = sqlite3.connect(path)
    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles "
        "ORDER BY tile_column"
    ).fetchall()
    assert len(rows) == 2
    src = {(r.x, r.y): r for r in tiles.collect()}
    for z, col, tms_row, blob in rows:
        y = (1 << z) - 1 - tms_row  # undo the TMS flip
        assert (col, y) in src
        feats = gzip.decompress(blob).decode().splitlines()
        exp = 2 if col == src[min(src)].x and len(src) == 2 else 1
        assert len(feats) in (1, 2)
        for f in feats:
            json.loads(f)
    # the two co-located points share one tile payload of 2 lines
    sizes = sorted(
        len(gzip.decompress(b).decode().splitlines()) for *_a, b in rows
    )
    assert sizes == [1, 2]
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "json" and meta["minzoom"] == "7"
    # spec: unique index present
    idx = [r[1] for r in con.execute("PRAGMA index_list(tiles)").fetchall()]
    assert "tile_index" in idx
    con.close()

    # deterministic bytes: re-export produces identical tile blobs
    path2 = str(tmp_path / "out2.mbtiles")
    write_mbtiles(
        assign_tiles(df.repartition(3), z=7), path2, name="t", payload="json"
    )
    con2 = sqlite3.connect(path2)
    blobs1 = dict(
        (tuple(r[:3]), r[3]) for r in rows
    )
    blobs2 = {
        tuple(r[:3]): r[3]
        for r in con2.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        )
    }
    con2.close()
    assert blobs1 == blobs2


def test_write_corpus_shards_manifest_and_determinism(spark, tmp_path):
    from osm_wayback_spark.sources.sinks import (
        verify_corpus_shards,
        write_corpus_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", (i * 3) % 40 + 1) for i in range(500)],
        "doc_id long, text string, n_tokens long",
    )
    p = str(tmp_path / "corpus")
    man = write_corpus_shards(docs, p, n_shards=8, token_col="n_tokens")
    assert man["total_rows"] == 500 and len(man["shards"]) == 8
    assert sum(s["rows"] for s in man["shards"]) == 500
    assert sum(s["tokens"] for s in man["shards"]) == sum(
        (i * 3) % 40 + 1 for i in range(500)
    )
    # loader-side integrity check passes on the written artifact
    assert verify_corpus_shards(spark, p)
    # deterministic shard MEMBERSHIP under repartitioning
    man2 = write_corpus_shards(
        docs.repartition(13), str(tmp_path / "corpus2"), n_shards=8,
        token_col="n_tokens",
    )
    assert man2["shards"] == man["shards"]
    # roundtrip: all rows come back exactly once
    back = spark.read.parquet(f"{p}/data.parquet")
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    # a corrupted artifact (one shard dir dropped) fails verification
    import shutil

    victim = next(
        d for d in __import__("os").listdir(f"{p}/data.parquet")
        if d.startswith("shard=")
    )
    shutil.rmtree(f"{p}/data.parquet/{victim}")
    assert not verify_corpus_shards(spark, p)
