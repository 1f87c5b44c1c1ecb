"""Character n-gram language-model perplexity — the CCNet-style
quality signal (Wenzek et al. 2020 filter corpora by LM perplexity;
a char n-gram model is the engine-friendly form of that signal).

Everything here — training included — is counting + joins + one
log/exp, so the WHOLE operator (not just scoring) sits under the
driver's oracle hash gate (`__spark_entry__.q_lm_perplexity`).

Design (100 TB shape):

- **train** (`train_char_lm`): one explode → groupBy(prefix, next)
  count — a single Exchange with map-side partial aggregation; the
  model is alphabet-bounded (|Σ|^n rows at most, |Σ| ≈ dozens for
  normalized text), i.e. TINY regardless of corpus size.
- **score** (`lm_perplexity`): the model is BROADCAST (both the
  pair counts and the derived prefix totals), so scoring is
  explode → broadcast-join → per-doc aggregate: the only shuffle is
  the final groupBy(doc_id), and unseen n-grams fall out of the
  add-k smoothing algebra for free — with c and C coalesced to 0,
  log((0+k)/(0+k·V)) = log(1/V), the uniform backoff, with NO
  special-case branch.

Smoothing: add-k (Laplace, k=1 default):
    logp(next | prefix) = ln((c + k) / (C + k·V))
where c = count(prefix, next), C = count(prefix, ·) and V is the
alphabet size measured as distinct `next` chars in training.
Per-doc perplexity = exp(-avg logp) over the doc's n-grams; docs
shorter than n normalized chars have no n-grams and drop out (both
engines agree on that semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.parallel import fanout_small


def _norm(text: Column) -> Column:
    """lowercase + whitespace-collapse: a small, stable alphabet."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def char_ngrams(text: Column, n: int) -> Column:
    """array<struct<prefix,nxt>> of the text's char n-grams
    (prefix = first n-1 chars, nxt = last char). Spark's `sequence`
    counts DOWN when stop < start, so short texts are guarded to an
    empty array explicitly.

    NOTE `text` should already be a materialized column, not a
    nested expression: Spark does NOT common-subexpression-eliminate
    inside higher-order-function lambdas, so an inline
    `lower(regexp_replace(...))` here would re-run the regex once
    PER ARRAY ELEMENT — measured 45 s → 1.5 s at sf0.1 when the
    normalization was hoisted into its own projection
    (see _exploded)."""
    t = text
    seq = F.sequence(F.lit(1), F.length(t) - (n - 1))
    return F.when(
        F.length(t) >= n,
        F.transform(
            seq,
            lambda i: F.struct(
                F.substring(t, i, n - 1).alias("prefix"),
                F.substring(t, i + (n - 1), 1).alias("nxt"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prefix:string,nxt:string>>"))


def _exploded(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    # normalization in its OWN projection so the transform lambda
    # sees a plain column (substring per element, not regex per
    # element — see char_ngrams docstring)
    return (
        fanout_small(docs)
        .select("doc_id", _norm(F.col(text_col)).alias("_t"))
        .select("doc_id", F.explode(char_ngrams(F.col("_t"), n)).alias("g"))
        .select("doc_id", "g.prefix", "g.nxt")
    )


def train_char_lm(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """→ model (prefix, nxt, c_pair): char n-gram counts. Alphabet-bounded
    (≤ |Σ|^n rows), broadcastable by construction."""
    return (
        _exploded(docs, n, text_col)
        .groupBy("prefix", "nxt")
        .agg(F.count("*").alias("c_pair"))
    )


def lm_perplexity(
    docs: DataFrame,
    model: DataFrame,
    n: int = 3,
    k: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained model → (doc_id, n_grams,
    ppl). Broadcast-joins the model; one shuffle total (the per-doc
    aggregate). An empty model is an error: with v=0 the smoothing
    denominator collapses to 0 for unseen n-grams and every ppl would
    silently come out Infinity/NaN.

    The model frame is consumed THREE times (vocabulary count,
    per-prefix totals, the broadcast join) — when the caller hands a
    lazy train_char_lm DAG that would re-run the corpus-sized
    training groupBy each time, so it is eagerly materialized once
    here; the model is alphabet-bounded (≤ |Σ|^n rows), so the
    checkpoint costs nothing even when the input was already a
    table."""
    model = model.localCheckpoint(eager=True)
    v = model.select(F.countDistinct("nxt")).first()[0]
    if not v:
        raise ValueError(
            "lm_perplexity: model has no (prefix, nxt) rows — train on a "
            "non-empty corpus before scoring"
        )
    totals = model.groupBy("prefix").agg(F.sum("c_pair").alias("c_prefix"))
    grams = _exploded(docs, n, text_col)
    scored = (
        grams.join(F.broadcast(model), ["prefix", "nxt"], "left")
        .join(F.broadcast(totals), ["prefix"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c_pair"), F.lit(0)) + F.lit(float(k)))
                / (
                    F.coalesce(F.col("c_prefix"), F.lit(0))
                    + F.lit(float(k)) * F.lit(float(v))
                )
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )


def ppl_buckets(
    scored: DataFrame,
    col: str = "ppl",
    probs: tuple[float, float] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    exact: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 split the
    corpus into head/middle/tail by LM perplexity terciles; head =
    lowest perplexity = most in-distribution): + ``bucket``.

    The cut points are ONE scalar aggregate row broadcast back onto
    the corpus — no global sort, no ntile window over the full
    table. ``exact=True`` uses the exact interpolated percentile
    (identical semantics to DuckDB's quantile_cont, so the whole
    operator is hash-gatable); at 100 TB set ``exact=False`` for
    approx_percentile with bounded error — the aggregate becomes a
    fixed-size sketch instead of a value buffer, and CCNet's own
    protocol (cuts from a reference sample, reused as constants) is
    `probs`-equivalent anyway."""
    pct = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    cuts = scored.agg(
        pct(F.col(col), F.lit(list(probs))).alias("_t")
    ).select(F.col("_t")[0].alias("_t1"), F.col("_t")[1].alias("_t2"))
    lo, mid, hi = labels
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.when(F.col(col) <= F.col("_t1"), F.lit(lo))
            .when(F.col(col) <= F.col("_t2"), F.lit(mid))
            .otherwise(F.lit(hi)),
        )
        .drop("_t1", "_t2")
    )
