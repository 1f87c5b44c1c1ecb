"""D1/J4 — the geometry-reconstruction kernel as an Arrow flat-map.

The reference runs a 24-process pool mapping one JSON line → 0..N
per-version features (geometry-reconstruction/index.js:28-32). Here
the same per-feature computation (_reconstruct_core.reconstruct_feature
— the exact as-of/changeset-override/minor-version semantics of
way-history-builder.js) runs inside ``mapInPandas``: Arrow-batched,
one Python worker per core/executor, no per-row JVM↔Python dispatch.

No grouping/shuffle is needed — the add_history + add_node_locations
output already has ONE row per feature with everything nested, so this
stage is embarrassingly parallel (a narrow map), exactly what the
reference's process pool was approximating.

Nested inputs cross the Arrow boundary as JSON strings (`to_json`),
which both sidesteps Arrow nested-map limits and matches the
reference's wire format (stage 3 → stage 4 is JSON lines anyway);
`to_json` drops null struct fields, reproducing the
"conditionally-present JSON key" hasOwnProperty semantics.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import RECONSTRUCTED
from ._reconstruct_core import reconstruct_feature

from pyspark.sql import types as T

_OUT_COLS = [f.name for f in RECONSTRUCTED.fields] + ["feature_json"]
# copy — StructType.add mutates the shared schema object
_OUT_SCHEMA = T.StructType(
    list(RECONSTRUCTED.fields) + [T.StructField("feature_json", T.StringType())]
)


def _rows_for_feature(
    element_type: str,
    osm_id: int,
    geometry_json: str | None,
    history_json: str | None,
    node_locations_json: str | None,
    config: dict | None = None,
) -> list[dict]:
    geometry = json.loads(geometry_json) if geometry_json else None
    history = json.loads(history_json) if history_json else []
    node_locations = (
        json.loads(node_locations_json) if node_locations_json else None
    )
    feats = reconstruct_feature(
        element_type, osm_id, geometry, history, node_locations, config
    )
    rows = []
    for ft in feats:
        props = ft["properties"]
        vu = props.get("@validUntil")
        tags = {
            k: v for k, v in props.items() if not k.startswith("@") and v is not None
        }
        rows.append(
            {
                "element_type": element_type,
                "id": osm_id,
                # GEOMETRY_ONLY mode strips identity props
                "version": int(props.get("@version") or 0),
                "minor_version": int(props.get("@minorVersion") or 0),
                "valid_since": props.get("@validSince") or None,
                # quirk: node/relation last version is false, way's is
                # null — both map to SQL NULL here; feature_json keeps
                # the raw distinction for golden comparisons.
                "valid_until": vu
                if isinstance(vu, int) and not isinstance(vu, bool)
                else None,
                "changeset": props.get("@changeset"),
                "uid": props.get("@uid"),
                "user": props.get("@user"),
                "geometry": json.dumps(ft["geometry"], separators=(",", ":"))
                if ft["geometry"] is not None
                else None,
                "tags": tags,
                "feature_json": json.dumps(
                    ft, separators=(",", ":"), sort_keys=True
                ),
            }
        )
    return rows


def reconstruct(
    with_locations: DataFrame,
    target_partitions: int | None = None,
    config: dict | None = None,
) -> DataFrame:
    """add_history→add_node_locations output → per-version features.

    Input needs columns: element_type, id, geometry (GeoJSON string),
    history (array<HISTORY_RECORD>), node_locations (nested map,
    nullable).

    ``config`` forwards the reference's D3 output-mode switches
    (map-geom-reconstruction.js:30-45): GEOMETRY_ONLY,
    INCLUDE_DIFFS_ON_MAJOR_VERSIONS,
    INCLUDE_FULL_PROPERTIES_ON_{MAJOR,MINOR}_VERSIONS.

    The input is round-robin repartitioned before the kernel: the
    upstream agg output is small, so AQE coalesces it to few
    partitions — fine for the agg, but it would serialize THIS
    stage's expensive per-row Python. A cheap shuffle of the nested
    rows buys full-kernel parallelism and evens out skew-heavy
    features (one 80-version way costs ~40× a 1-version node).
    """
    if target_partitions is None:
        sc = with_locations.sparkSession.sparkContext
        target_partitions = max(sc.defaultParallelism * 3, 8)
    prepared = with_locations.repartition(target_partitions).select(
        "element_type",
        "id",
        "geometry",
        F.to_json("history").alias("history_json"),
        F.to_json("node_locations").alias("node_locations_json"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise accumulation: building one dict-of-lists is
            # several times cheaper than pandas' list-of-dicts path
            cols: dict[str, list] = {c: [] for c in _OUT_COLS}
            for et, oid, gj, hj, nlj in zip(
                pdf["element_type"],
                pdf["id"],
                pdf["geometry"],
                pdf["history_json"],
                pdf["node_locations_json"],
            ):
                for row in _rows_for_feature(et, int(oid), gj, hj, nlj, config):
                    for c in _OUT_COLS:
                        cols[c].append(row[c])
            yield pd.DataFrame(cols, columns=_OUT_COLS)

    return prepared.mapInPandas(kernel, schema=_OUT_SCHEMA)
