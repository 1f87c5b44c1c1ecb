"""Distilled quality/language classifier — logistic regression
trained WITH Spark aggregations, scored as pure column math.

Production training pipelines gate documents with a cheap linear
classifier distilled from an expensive signal (CCNet / RefinedWeb
style: a fastText-class model over surface features). The reference
engine has nothing like it; this is part of the training-data layer
the north rule adds.

Design (100 TB shape):

- **featurize** (`doc_features`): six surface features, ALL exact
  IEEE column arithmetic (integer counts and divisions — no libm),
  so the DuckDB oracle reproduces them bit-identically. Zero
  shuffle; rides the scan.
- **train** (`train_logreg`): full-batch gradient descent where each
  iteration is ONE Spark aggregation job (d+1 `avg` expressions over
  the persisted feature frame — map-side partial aggregation, a
  single scalar row to the driver per step). Driver state is just
  the weight vector. At corpus scale you train on
  `sample_fraction` — gradient noise from sampling dwarfs the gain
  from exact full-batch gradients, and the cached sample makes each
  step seconds, not a corpus scan. This is the same
  aggregate-per-step shape MLlib's own optimizers use, written
  plainly.
- **score** (`score_logreg`): sigmoid(w·x) as a column expression —
  zero Python, zero shuffle; the only libm call is one `exp`, and
  the driver-gate query rounds to 6 decimals so cross-engine libm
  ulp drift cannot flip the hash.

Training itself is iterative (not SQL-expressible) and is
pytest-gated against an independent numpy implementation on the
collected sample; scoring with a FROZEN weight vector is hash-gated
(`__spark_entry__.q_quality_classifier`), mirroring the
train-pytest / encode-oracle split used for BPE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURES = ["f_len", "f_stop", "f_punct", "f_wlen", "f_digit"]

_PUNCT = r"[^\.\,\;\:\!\?]"


def doc_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Surface features per document (exact arithmetic only):

    - f_len:   min(len/500, 1) — length saturation
    - f_stop:  English stopword hits / tokens
    - f_punct: sentence-punctuation chars / chars
    - f_wlen:  non-whitespace chars / tokens (mean word length)
    - f_digit: digit chars / chars
    """
    from ..functions.text import _EN, _hits, token_count

    t = F.col(text_col)
    n_tok = F.greatest(token_count(t), F.lit(1)).cast("double")
    n_chr = F.greatest(F.length(t), F.lit(1)).cast("double")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.least(F.length(t) / 500.0, F.lit(1.0)).alias("f_len"),
        (_hits(t, _EN).cast("double") / n_tok).alias("f_stop"),
        (
            F.length(F.regexp_replace(t, _PUNCT, "")).cast("double") / n_chr
        ).alias("f_punct"),
        (
            F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tok
        ).alias("f_wlen"),
        (
            F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double") / n_chr
        ).alias("f_digit"),
    )


def score_logreg(weights: list[float], cols: list[str] | None = None) -> Column:
    """sigmoid(w0 + w·x) as a pure column expression. `weights` is
    [bias, w1..wd] frozen from `train_logreg`."""
    cols = cols or FEATURES
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], cols):
        z = z + F.lit(float(w)) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str] | None = None,
    iters: int = 80,
    lr: float = 2.0,
    l2: float = 0.0,
    sample_fraction: float | None = None,
    seed: int = 7,
) -> list[float]:
    """Full-batch logistic regression by gradient descent; one Spark
    aggregation job per iteration over the persisted feature frame.
    Returns [bias, w1..wd]."""
    feature_cols = feature_cols or FEATURES
    df = features.select(
        F.col(label_col).cast("double").alias("_y"), *feature_cols
    )
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    df = df.persist()
    try:
        d = len(feature_cols)
        # z-score standardization (one extra aggregation pass) — GD
        # on raw ratio features is badly conditioned; training runs
        # in standardized space and the learned weights are folded
        # back so score_logreg applies to RAW features
        m = df.agg(
            *[F.avg(c).alias(f"m{j}") for j, c in enumerate(feature_cols)],
            *[
                F.stddev_pop(c).alias(f"s{j}")
                for j, c in enumerate(feature_cols)
            ],
        ).first()
        mu = [m[f"m{j}"] for j in range(d)]
        sd = [m[f"s{j}"] or 1.0 for j in range(d)]
        sd = [s if s > 0 else 1.0 for s in sd]
        zcols = [
            ((F.col(c) - F.lit(mu[j])) / F.lit(sd[j])).alias(f"_z{j}")
            for j, c in enumerate(feature_cols)
        ]
        zdf = df.select("_y", *zcols).persist()
        znames = [f"_z{j}" for j in range(d)]
        w = [0.0] * (d + 1)
        for _ in range(iters):
            p = score_logreg(w, znames)
            err = p - F.col("_y")
            aggs = [F.avg(err).alias("g0")] + [
                F.avg(err * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(znames)
            ]
            g = zdf.agg(*aggs).first()
            w = [
                wj - lr * (gj + l2 * wj)
                for wj, gj in zip(w, [g[f"g{j}"] for j in range(d + 1)])
            ]
        zdf.unpersist()
        # fold standardization into raw-space weights:
        # w_raw_j = w_j / sd_j;  b_raw = b - Σ w_j·mu_j / sd_j
        w_raw = [w[j + 1] / sd[j] for j in range(d)]
        b_raw = w[0] - sum(w[j + 1] * mu[j] / sd[j] for j in range(d))
        return [b_raw, *w_raw]
    finally:
        df.unpersist()
