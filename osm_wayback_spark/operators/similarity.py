"""Similarity search over embeddings(vec_id, embedding array<float>).

- ``cosine_topk``: exact brute-force top-k for a broadcast query set —
  the correctness baseline. Dot products via native higher-order
  functions (zip_with + aggregate): stays JVM-side.
- ``ann_lsh``: random-hyperplane LSH (multi-table + multiprobe) — the
  high-recall scale path. Hyperplanes are derived deterministically
  from md5 so every executor (and a re-run) builds identical planes
  without shipping state.
- ``ann_ivf``: inverted-file ANN (Spark-native Lloyd k-means coarse
  quantizer + nprobe cell search) — the second scale path; candidate
  volume is bounded by nprobe/n_centroids of the corpus.

Both approximate paths guarantee k results per query (exact fallback
for starved queries) and carry pytest recall gates vs cosine_topk.
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


def near_dup_candidates(
    embeddings: DataFrame,
    n_planes: int = 3,
    tables: int = 12,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup CANDIDATE pairs → distinct (vec_a, vec_b),
    a < b: pairs sharing ≥1 LSH bucket in any table.

    The scale-safe replacement for the all-pairs theta self-join: the
    only join is an equi-join on the bucket id (shuffle on a short
    key), so cost is Σ_buckets C(n_b, 2), not C(N, 2). Recall for a
    cosine-θ pair is 1-(1-(1-θ/π)^n_planes)^tables — the defaults give
    ≥ 0.95 for cosine ≥ 0.4 (pytest-gated vs the exact all-pairs at
    test scale). At planet scale raise ``n_planes`` (smaller buckets)
    and ``tables`` together, and set ``max_bucket`` to guard degenerate
    buckets (logged, see operators.dedup._cap_buckets)."""
    from .dedup import _cap_buckets

    rows = lsh_bucket_rows(embeddings, n_planes, tables).select(
        "vec_id", "bucket"
    )
    rows = _cap_buckets(rows, ["bucket"], max_bucket, "near_dup_candidates")
    a, b = rows.alias("a"), rows.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.vec_id") < F.col("b.vec_id"),
            ],
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )


def near_dup_pairs(
    embeddings: DataFrame,
    candidates: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-cosine verify over a candidate pair set → (vec_a, vec_b,
    cosine ≥ threshold). Two vec_id equi-joins + column-math cosine;
    no Python, no self-join."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb")
    )
    scored = with_cosine(candidates.join(a, on="vec_a").join(b, on="vec_b"))
    return scored.filter(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", "cosine"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path: k-means coarse
# quantizer + nprobe cell search. Complements LSH: better recall per
# candidate when the corpus is clustered, and the centroid count
# directly controls the join fan-out.

def _init_centroids(embeddings: DataFrame, n_centroids: int) -> np.ndarray:
    """Deterministic init: the n vectors with the smallest
    md5(vec_id) — spread pseudo-randomly, identical on re-runs."""
    rows = (
        embeddings.select("vec_id", "embedding")
        .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    return np.array([list(r.embedding) for r in rows], dtype=np.float64)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Lloyd's k-means, Spark-native: per iteration one pass assigns
    every vector to its nearest centroid (vectorized Arrow matmul),
    then a posexplode + groupBy computes per-dimension means — the
    only driver traffic is the (n_centroids × dim) table. At 100 TB
    train on a sample (``sample_fraction``); assignment stays exact.
    """
    data = embeddings
    if sample_fraction:
        data = data.sample(fraction=sample_fraction, seed=42)
    centroids = _init_centroids(data, n_centroids)
    for _ in range(iters):
        assigned = with_ivf_cell(data, centroids)
        means = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r.cell, r.dim] = r.m
        centroids = new
    return centroids


def with_ivf_cell(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """+ ``cell``: index of the nearest centroid (L2), one Arrow
    matmul per batch; centroids ship in the task closure (small)."""
    cent = centroids.astype(np.float64)
    cnorm2 = (cent * cent).sum(axis=1)

    @pandas_udf("int")
    def cell_udf(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype="int32")
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        # argmin ||x-c||² = argmin (||c||² - 2 x·c)
        scores = cnorm2[None, :] - 2.0 * (mat @ cent.T)
        return pd.Series(scores.argmin(axis=1).astype("int32"))

    return embeddings.withColumn("cell", cell_udf("embedding"))


def ann_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    centroids: np.ndarray | None = None,
    fallback: bool = True,
) -> DataFrame:
    """IVF approximate top-k: candidates restricted to the query's
    ``nprobe`` nearest centroid cells (equi-join on cell), exact
    cosine re-rank within. → (query_id, vec_id, cosine, rank).
    Pass precomputed ``centroids`` to skip training (production: train
    once on a sample, reuse). ``fallback`` guarantees k results per
    query via the exact broadcast path."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_centroids, iters)
    cent = centroids.astype(np.float64)
    cnorm2 = (cent * cent).sum(axis=1)
    n_probe = min(nprobe, len(cent))

    c = with_ivf_cell(embeddings, centroids).select(
        "vec_id", "cell", F.col("embedding").alias("b_emb")
    )

    @pandas_udf("array<int>")
    def probe_udf(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype="object")
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        scores = cnorm2[None, :] - 2.0 * (mat @ cent.T)
        order = np.argsort(scores, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("a_emb"),
        F.explode(probe_udf("embedding")).alias("cell"),
    )
    cand = c.join(q, on="cell").filter(F.col("vec_id") != F.col("query_id"))
    scored = with_cosine(cand).select("query_id", "vec_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if not fallback:
        return approx
    counts = approx.groupBy("query_id").agg(F.count("*").alias("_n"))
    full = approx.join(
        counts.filter(F.col("_n") >= k).select("query_id"), on="query_id"
    )
    starved = queries.join(
        counts.filter(F.col("_n") >= k).select(F.col("query_id").alias("vec_id")),
        on="vec_id",
        how="left_anti",
    )
    return full.unionByName(cosine_topk(embeddings, starved, k))
