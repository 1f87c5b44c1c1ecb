"""Sinks + export-side classification (SURVEY.md rows S3, S8, S9, F7).

- ``classify_geometry``: the osmium-export linear/area tag
  classification (example/osmiumconfig:12-19 — ``area_tags`` like
  building/landuse make a closed way a Polygon, ``linear_tags`` force
  LineString). Pure column logic.
- ``write_geojsonseq``: line-delimited GeoJSON export (≙ the
  reference's stdout JSON sink, add_history.cpp:219-222) with the
  short-key property scheme already embedded in the rows.
- ``to_topojson_history``: the reference's WRITE_TOPOJSON_HISTORY
  output mode (map-geom-reconstruction.js:257-275), backed by the
  pure-Python topology encoder in functions/topojson.py.
- ``write_mbtiles``: the reference's final artifact
  (run.sh:65 tippecanoe → .mbtiles): a real MBTiles 1.3 sqlite file
  (TMS tile addressing, unique tile index, metadata table) whose
  tile payloads are gzip'd Mapbox Vector Tile 2.1 protobufs encoded
  by the pure-Python functions/mvt.py (``format: pbf`` — full format
  parity); gzip'd GeoJSON lines remain available via
  ``payload="json"``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# osmiumconfig-style defaults (example/osmiumconfig:12-19)
AREA_TAGS = ["building", "landuse", "natural", "amenity", "leisure", "area"]
LINEAR_TAGS = ["highway", "barrier", "waterway", "railway"]


def classify_geometry(
    tags: Column,
    is_closed: Column,
    area_tags: list[str] | None = None,
    linear_tags: list[str] | None = None,
) -> Column:
    """'Polygon' | 'LineString' per export-config tag classification.

    linear tags win (a closed ``highway`` ring is still a road);
    otherwise a closed way with an area tag becomes a Polygon.
    """
    area = F.array(*[F.lit(t) for t in (area_tags or AREA_TAGS)])
    linear = F.array(*[F.lit(t) for t in (linear_tags or LINEAR_TAGS)])
    has = lambda vocab: F.exists(  # noqa: E731
        F.map_keys(tags), lambda k: F.array_contains(vocab, k)
    )
    return (
        F.when(has(linear), F.lit("LineString"))
        .when(is_closed & has(area), F.lit("Polygon"))
        .otherwise(F.lit("LineString"))
    )


def write_geojsonseq(df: DataFrame, path: str, json_col: str = "feature_json") -> None:
    """One GeoJSON Feature per line (≙ .geojsonseq staged files,
    README.md:52-62)."""
    df.select(F.col(json_col).alias("value")).write.mode("overwrite").text(path)


def write_mbtiles(
    tiles: DataFrame,
    path: str,
    name: str = "osm_wayback_spark",
    feature_col: str = "feature_json",
    compress: bool = True,
    payload: str = "mvt",
    layer_name: str = "features",
) -> dict:
    """Export an ``assign_tiles`` output (z, x, y, …, feature_json)
    into a REAL `.mbtiles` sqlite container — the reference's final
    artifact shape (run.sh:65: tippecanoe → osm-wayback.mbtiles).

    ``payload="mvt"`` (default): tile_data is a gzip'd Mapbox Vector
    Tile 2.1 protobuf (pure-Python encoder, functions/mvt.py;
    ``metadata.format = "pbf"``) — full format parity with the
    tippecanoe artifact. ``payload="json"`` keeps the previous
    newline-delimited-GeoJSON payload (``format: json``) for
    consumers that want tiles without an MVT reader.

    Spec fidelity (MBTiles 1.3): the ``tiles`` table uses the TMS
    scheme — ``tile_row = 2^z - 1 - y`` (the XYZ y-flip) — with the
    spec's unique index, plus the required ``metadata`` table.

    Scale shape: per-tile feature lists are aggregated DISTRIBUTEDLY
    (one groupBy(z, x, y) with a sorted collect_list → deterministic
    bytes) and the MVT encoding runs in an Arrow-batched kernel on
    the executors (pure per-tile math) — only finished blobs stream
    through the driver into sqlite via ``toLocalIterator`` (one
    partition at a time, never the corpus). A single-file sqlite
    artifact is inherently single-writer; the reference pays the
    same serial step (tippecanoe runs on one node over the full
    export).
    """
    import gzip
    import sqlite3
    from collections.abc import Iterator

    import pandas as pd

    if payload not in ("mvt", "json"):
        raise ValueError(f"payload must be 'mvt' or 'json', got {payload!r}")

    per_tile = (
        tiles.groupBy("z", "x", "y")
        .agg(F.sort_array(F.collect_list(F.col(feature_col))).alias("_feats"))
        .select("z", "x", "y", "_feats")
    )

    if payload == "mvt":
        from ..functions.mvt import encode_tile_from_json

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                blobs = [
                    encode_tile_from_json(
                        list(feats), int(z), int(x), int(y), layer_name
                    )
                    for z, x, y, feats in zip(
                        pdf["z"], pdf["x"], pdf["y"], pdf["_feats"]
                    )
                ]
                yield pd.DataFrame(
                    {"z": pdf["z"], "x": pdf["x"], "y": pdf["y"], "_data": blobs}
                )

        encoded = per_tile.mapInPandas(
            kernel, schema="z int, x long, y long, _data binary"
        )
    else:
        encoded = per_tile.select(
            "z",
            "x",
            "y",
            F.encode(F.concat_ws("\n", "_feats"), "UTF-8").alias("_data"),
        )

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("DROP TABLE IF EXISTS tiles")
        cur.execute("DROP TABLE IF EXISTS metadata")
        cur.execute(
            "CREATE TABLE tiles (zoom_level integer, tile_column integer, "
            "tile_row integer, tile_data blob)"
        )
        cur.execute("CREATE TABLE metadata (name text, value text)")
        n_tiles = 0
        zmin = zmax = None
        for row in encoded.toLocalIterator():
            data = bytes(row._data)
            if compress:
                # fixed mtime → byte-deterministic output
                data = gzip.compress(data, mtime=0)
            tms_row = (1 << row.z) - 1 - row.y
            cur.execute(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                (row.z, row.x, tms_row, sqlite3.Binary(data)),
            )
            n_tiles += 1
            zmin = row.z if zmin is None else min(zmin, row.z)
            zmax = row.z if zmax is None else max(zmax, row.z)
        cur.execute(
            "CREATE UNIQUE INDEX tile_index ON tiles "
            "(zoom_level, tile_column, tile_row)"
        )
        meta = {
            "name": name,
            "format": "pbf" if payload == "mvt" else "json",
            "compression": "gzip" if compress else "none",
            "minzoom": str(zmin if zmin is not None else 0),
            "maxzoom": str(zmax if zmax is not None else 0),
            "type": "overlay",
            "version": "1",
        }
        cur.executemany(
            "INSERT INTO metadata VALUES (?, ?)", sorted(meta.items())
        )
        con.commit()
        return {"tiles": n_tiles, "minzoom": zmin, "maxzoom": zmax}
    finally:
        con.close()


def to_topojson_history(
    features: list[dict], quantization: int | None = None
) -> str:
    """WRITE_TOPOJSON_HISTORY encoding (map-geom-reconstruction.js:
    257-275): ``topojson.topology(newHistoryObject)`` over the
    per-version history FEATURE ARRAY (the reference passes the array
    itself, so objects are keyed "0", "1", … — reproduced). The
    encoder is the pure-Python topology implementation in
    functions/topojson.py; the reference passes no quantization."""
    import json

    from ..functions.topojson import topology

    return json.dumps(
        topology(features, quantization),
        separators=(",", ":"),
        # Arrow-native inputs carry coordinates as numpy arrays
        default=lambda o: o.tolist(),
    )


def with_observed_counts(df: DataFrame, name: str) -> DataFrame:
    """A4 — the reference's run counters (feature_count /
    lookup_fail, add_history.cpp:54-60) as Spark observed metrics:
    collected by the driver on action completion with zero extra
    passes."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))


def write_corpus_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> dict:
    """Training-corpus shard writer: deterministic hash sharding +
    a verifiable manifest — the artifact a data loader consumes.

        <path>/data.parquet/shard=N/   (one directory per shard)
        <path>/manifest.json           (per-shard rows, token sums,
                                        order-insensitive checksums)

    Scale shape: shard = pmod(xxhash64(id), n_shards) — deterministic
    across runs/partitionings/engines, so a re-run produces
    byte-stable shard MEMBERSHIP (loaders can resume mid-epoch and
    dedup bookkeeping survives rewrites). ONE repartition on the
    shard column co-locates each shard into one task's output;
    the manifest aggregate reuses the same Exchange. Checksum =
    sum(pmod(xxhash64(id), 2^31)) per shard — order-insensitive and
    multiplicity-sensitive (the lineage-metrics design), so a
    dropped-or-duplicated row is visible without re-reading data.
    Returns the manifest dict."""
    import json as _json

    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    staged = docs.withColumn("shard", shard).repartition(n_shards, "shard")
    staged.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data.parquet"
    )
    aggs = [
        F.count("*").alias("rows"),
        F.sum(F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31))).alias(
            "checksum"
        ),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("tokens"))
    stats = (
        staged.groupBy("shard").agg(*aggs).orderBy("shard").collect()
    )
    manifest = {
        "n_shards": n_shards,
        "total_rows": int(sum(r.rows for r in stats)),
        "shards": [
            {
                "shard": int(r.shard),
                "rows": int(r.rows),
                "checksum": int(r.checksum),
                **(
                    {"tokens": int(r.tokens)}
                    if token_col is not None
                    else {}
                ),
            }
            for r in stats
        ],
    }
    docs.sparkSession.createDataFrame(
        [(_json.dumps(manifest),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/manifest.json")
    return manifest


def verify_corpus_shards(spark, path: str, id_col: str = "doc_id") -> bool:
    """Recompute the manifest from the written shards and compare —
    the loader-side integrity check (detects lost/duplicated rows
    without ordering assumptions)."""
    import json as _json

    manifest = _json.loads(
        spark.read.text(f"{path}/manifest.json").collect()[0].value
    )
    got = {
        int(r.shard): (int(r.rows), int(r.checksum))
        for r in spark.read.parquet(f"{path}/data.parquet")
        .groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31))).alias(
                "checksum"
            ),
        )
        .collect()
    }
    want = {
        s["shard"]: (s["rows"], s["checksum"]) for s in manifest["shards"]
    }
    return got == want
