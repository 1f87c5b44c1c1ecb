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


def _planes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from md5 — identical on
    every executor with zero shipped state."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(0, dim, 4):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
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


def ann_lsh(
    embeddings: DataFrame, queries: DataFrame, k: int, n_planes: int = 12
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine re-rank within. → (query_id, vec_id, cosine,
    rank). Recall < 1 by construction; the scale path when the query
    side is too big to broadcast (bucket equi-join instead of cross)."""
    c = lsh_buckets(embeddings, n_planes).select(
        "vec_id", "bucket", F.col("embedding").alias("b_emb")
    )
    q = lsh_buckets(queries, n_planes).select(
        F.col("vec_id").alias("query_id"),
        "bucket",
        F.col("embedding").alias("a_emb"),
    )
    cand = c.join(q, on="bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = with_cosine(cand).select("query_id", "vec_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
