"""Sinks + export-side classification (SURVEY.md rows S3, S8, S9, F7).

- ``classify_geometry``: the osmium-export linear/area tag
  classification (example/osmiumconfig:12-19 — ``area_tags`` like
  building/landuse make a closed way a Polygon, ``linear_tags`` force
  LineString). Pure column logic.
- ``write_geojsonseq``: line-delimited GeoJSON export (≙ the
  reference's stdout JSON sink, add_history.cpp:219-222) with the
  short-key property scheme already embedded in the rows.
- ``to_topojson_history``: the reference's WRITE_TOPOJSON_HISTORY
  output mode (map-geom-reconstruction.js:257-275) — STUBBED: it
  wraps the `topojson` npm library; no Python equivalent ships in
  this environment. The function raises with the exact plug-in point
  documented.
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
