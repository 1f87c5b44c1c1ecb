"""Distilled quality/language classifier: Spark-aggregation GD vs an
independent numpy implementation, and scoring as column math."""

import math

import numpy as np
from pyspark.sql import functions as F

from osm_wayback_spark.operators.classifier import (
    FEATURES,
    doc_features,
    score_logreg,
    train_logreg,
)


def _docs(spark):
    rows = []
    for i in range(120):
        if i % 2 == 0:
            t = ("the cat and the dog of a house is to go " * (1 + i % 3)).strip()
            lab = 1
        else:
            t = ("der hund 123 und 456; die katze; 789!!! " * (1 + i % 3)).strip()
            lab = 0
        rows.append((i, t, lab))
    return spark.createDataFrame(rows, "doc_id long, text string, y long")


def _numpy_gd(X, y, iters, lr):
    # mirrors train_logreg: z-score standardize, GD, fold back
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd > 0, sd, 1.0)
    Z = (X - mu) / sd
    w = np.zeros(Z.shape[1] + 1)
    Zb = np.hstack([np.ones((Z.shape[0], 1)), Z])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Zb @ w)))
        w = w - lr * (Zb.T @ (p - y)) / len(y)
    w_raw = w[1:] / sd
    b_raw = w[0] - np.sum(w[1:] * mu / sd)
    return np.concatenate([[b_raw], w_raw])


def test_train_matches_numpy_and_separates(spark):
    docs = _docs(spark)
    feats = doc_features(docs).join(docs.select("doc_id", "y"), "doc_id")
    w = train_logreg(feats, "y", iters=60, lr=2.0)

    pdf = feats.orderBy("doc_id").toPandas()
    w_ref = _numpy_gd(
        pdf[FEATURES].to_numpy(), pdf["y"].to_numpy().astype(float), 60, 2.0
    )
    assert np.allclose(w, w_ref, atol=1e-8), (w, w_ref)

    scored = feats.select(
        "doc_id", "y", score_logreg(w).alias("p")
    ).collect()
    acc = sum((r.p > 0.5) == (r.y == 1) for r in scored) / len(scored)
    assert acc >= 0.95, acc
    # column-math score agrees with the driver-side sigmoid
    for r in scored[:10]:
        frow = feats.filter(F.col("doc_id") == r.doc_id).first()
        z = w[0] + sum(wj * frow[c] for wj, c in zip(w[1:], FEATURES))
        assert abs(r.p - 1.0 / (1.0 + math.exp(-z))) < 1e-12


def test_sample_fraction_and_l2(spark):
    docs = _docs(spark)
    feats = doc_features(docs).join(docs.select("doc_id", "y"), "doc_id")
    w_l2 = train_logreg(feats, "y", iters=30, lr=2.0, l2=0.1)
    w_no = train_logreg(feats, "y", iters=30, lr=2.0)
    assert np.linalg.norm(w_l2) < np.linalg.norm(w_no)
    w_s = train_logreg(feats, "y", iters=30, lr=2.0, sample_fraction=0.5)
    scored = feats.select("y", score_logreg(w_s).alias("p")).collect()
    acc = sum((r.p > 0.5) == (r.y == 1) for r in scored) / len(scored)
    assert acc >= 0.9, acc


def test_features_partition_independent(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, doc_features(docs).collect()))
    b = sorted(map(tuple, doc_features(docs.repartition(13)).collect()))
    assert a == b
