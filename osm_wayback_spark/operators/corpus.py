"""Corpus curation operators: deterministic sampling and token
packing — the steps a training-data pipeline runs AFTER dedup and
quality filtering to turn a cleaned document pool into a training
mix.

Design notes (100 TB shape):

- ``stratified_sample`` is pure per-row column math — the keep/drop
  decision is a hash of the document id, so it is deterministic,
  reproducible across runs and engines, independent of partitioning,
  and requires NO shuffle and NO count-first pass (rate-based, not
  exact-count-based; an exact-count stratified sampler needs a
  per-stratum count + sort and is a different cost class).
  The md5-prefix construction matches what the DuckDB oracle can
  compute bit-identically (same trick as the simhash oracle).

- ``pack_tokens`` is ONE window per stratum (cumulative token sum in
  a deterministic document order) + integer math: a document starts
  in chunk floor(cum_before / budget) — the classic streaming
  greedy packer. The shuffle is exactly one Exchange on the stratum
  key; skewed strata are bounded by the corpus's own language mix.
  Chunks can overflow by at most one document (a doc that straddles
  a boundary stays in the chunk where it starts) — the semantics
  tokenizer-side sequence packing expects when documents must not be
  split across workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic per-id bucket in [0, buckets): integer value of
    the first 8 hex chars of md5(id) mod buckets. Stable across
    engines (DuckDB mirrors it exactly), runs, and partitionings —
    the property a reproducible corpus sample needs."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int],
    default_rate: int = 100,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each document with a per-stratum percentage: document d
    of stratum s survives iff sample_bucket(d) < rates.get(s,
    default_rate). Zero-shuffle, reproducible (hash-based, not
    random), and exact in expectation — the standard way to rebalance
    a language/source mix at corpus scale."""
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return documents.filter(sample_bucket(F.col(id_col)) < rate)


def pack_tokens(
    documents: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequential token packing: within each stratum, in
    deterministic ``id_col`` order, assign each document to chunk
    floor(tokens_before_it / budget). → input columns +
    ``chunk_id``. A chunk may overflow by the one document that
    straddles its boundary (documents are never split)."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return documents.withColumn(
        "chunk_id", F.floor((cum - F.col(token_col)) / budget).cast("long")
    )


def pack_summary(
    packed: DataFrame,
    token_col: str = "n_tokens",
    stratum_col: str = "lang",
) -> DataFrame:
    """Per (stratum, chunk) fill report → (stratum, chunk_id,
    n_docs, chunk_tokens): the number a batch scheduler actually
    consumes."""
    return (
        packed.groupBy(stratum_col, "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).cast("long").alias("chunk_tokens"),
        )
    )
