"""Similarity search over embeddings(vec_id, embedding array<float>).

- ``cosine_topk``: exact brute-force top-k for a broadcast query set —
  the correctness baseline. Dot products via native higher-order
  functions (zip_with + aggregate): stays JVM-side.
- ``ann_lsh``: random-hyperplane LSH bucketing — the scale path. The
  hyperplanes are derived deterministically from md5 so every executor
  (and a re-run) builds identical planes without shipping state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def with_cosine(pairs: DataFrame, a: str = "a_emb", b: str = "b_emb") -> DataFrame:
    ca = F.transform(F.col(a), lambda x: x.cast("double"))
    cb = F.transform(F.col(b), lambda x: x.cast("double"))
    return pairs.withColumn(
        "cosine", F.round(_dot(ca, cb) / (_norm(ca) * _norm(cb)), 6)
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """→ (query_id, vec_id, cosine, rank). queries(query_id, embedding)
    is broadcast; ties broken on vec_id. Self-matches excluded."""
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("a_emb")
        )
    )
    c = embeddings.select("vec_id", F.col("embedding").alias("b_emb"))
    pairs = c.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    scored = with_cosine(pairs).select("query_id", "vec_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _planes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 — identical on
    every executor with zero shipped state. ``table`` seeds an
    independent plane set per LSH table (table 0 keeps the original
    seed format for backward determinism)."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(0, dim, 4):
            seed = f"plane:{p}:{d}" if table == 0 else f"plane:t{table}:{p}:{d}"
            h = hashlib.md5(seed.encode()).digest()
            for j in range(min(4, dim - d)):
                v = int.from_bytes(h[j * 4 : j * 4 + 4], "little")
                out[p, d + j] = (v / 2**31) - 1.0
    return out


def lsh_buckets(embeddings: DataFrame, n_planes: int = 12) -> DataFrame:
    """→ (vec_id, bucket): sign-bit bucket id per vector (vectorized
    Arrow kernel: one matmul per batch)."""

    @pandas_udf("long")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype="int64")
        mat = np.stack(emb.to_numpy())
        planes = _planes(mat.shape[1], n_planes)
        bits = (mat @ planes.T) > 0
        weights = (2 ** np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return embeddings.select(
        "vec_id", "embedding", bucket_udf("embedding").alias("bucket")
    )


def lsh_bucket_rows(
    embeddings: DataFrame, n_planes: int = 8, tables: int = 1
) -> DataFrame:
    """→ (vec_id, embedding, bucket) with one row per (vector, table);
    bucket = table * 2^n_planes + sign-bits, so one long column keys
    the (table, bits) equi-join AND low-bit XOR flips stay inside the
    table. ONE Arrow kernel pass computes every table's bits (a single
    (n, tables·n_planes) matmul), then a native posexplode fans out."""

    @pandas_udf("array<long>")
    def buckets_udf(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype="object")
        mat = np.stack(emb.to_numpy())
        planes = np.vstack(
            [_planes(mat.shape[1], n_planes, t) for t in range(tables)]
        )
        bits = (mat @ planes.T) > 0  # (n, tables*n_planes)
        weights = (2 ** np.arange(n_planes)).astype(np.int64)
        per_table = bits.reshape(len(mat), tables, n_planes) @ weights
        offsets = (np.arange(tables) * (1 << n_planes)).astype(np.int64)
        return pd.Series(list(per_table + offsets))

    return embeddings.select(
        "vec_id",
        "embedding",
        F.explode(buckets_udf("embedding")).alias("bucket"),
    )


def ann_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 6,
    tables: int = 8,
    probes: int = 1,
    fallback: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket neighborhood, exact cosine re-rank within. → (query_id,
    vec_id, cosine, rank). The scale path when the query side is too
    big to broadcast (bucket equi-join instead of cross join).

    Recall levers (defaults tuned so recall@5 ≥ 0.8 on the driver
    embeddings, pytest-enforced):
    - ``tables``: independent hash tables, candidates unioned — the
      classic LSH OR-amplification; one Arrow kernel pass computes
      all tables' bits (single matmul), the fan-out is native.
    - ``probes``: multiprobe radius — probes=1 also visits the
      n_planes single-bit-flip buckets per table (native bitwiseXOR
      explode, no Python).
    - ``fallback=True``: queries that found fewer than k candidates
      (empty/sparse buckets) are re-answered by the exact broadcast
      path, so every query is guaranteed k results.
    """
    c = lsh_bucket_rows(embeddings, n_planes, tables).select(
        "vec_id", "bucket", F.col("embedding").alias("b_emb")
    )
    q = lsh_bucket_rows(queries, n_planes, tables).select(
        F.col("vec_id").alias("query_id"),
        "bucket",
        F.col("embedding").alias("a_emb"),
    )
    if probes >= 1:
        # low-bit flips stay inside the table (bucket = tbl·2^b + bits)
        probe_buckets = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b))
                for b in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probe_buckets))
    # a (query, candidate) pair can match in several tables — dedup
    # BEFORE scoring so each dot product is paid once
    cand = (
        c.join(q, on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.first("a_emb").alias("a_emb"), F.first("b_emb").alias("b_emb"))
    )
    scored = with_cosine(cand).select("query_id", "vec_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if not fallback:
        return approx
    counts = approx.groupBy("query_id").agg(F.count("*").alias("_n"))
    starved = queries.join(
        counts.filter(F.col("_n") >= k).select(F.col("query_id").alias("vec_id")),
        on="vec_id",
        how="left_anti",
    )
    full = approx.join(
        counts.filter(F.col("_n") >= k).select("query_id"), on="query_id"
    )
    return full.unionByName(cosine_topk(embeddings, starved, k))
