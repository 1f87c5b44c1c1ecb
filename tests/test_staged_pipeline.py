"""Staged (resumable) pipeline ≡ lazy pipeline; salted join ≡ plain."""

import pytest

from osm_wayback_spark import pipeline
from osm_wayback_spark.operators.history import add_history, add_history_salted
from osm_wayback_spark.synth import synth_pages

SF = 0.001


def test_staged_equals_lazy(spark, tmp_path):
    pages = synth_pages(spark, SF)
    lazy = {
        (r.element_type, r.id, r.version, r.minor_version): r.feature_json
        for r in pipeline.reconstruction_pipeline(pages, with_feature_json=True).collect()
    }
    staged = {
        (r.element_type, r.id, r.version, r.minor_version): r.feature_json
        for r in pipeline.staged_pipeline(spark, pages, str(tmp_path / "ck"), with_feature_json=True).collect()
    }
    assert staged == lazy

    # resume: all three markers exist → a rerun reads checkpoints
    import os

    for stage in ("versions", "history_geom", "versions_out"):
        assert os.path.exists(tmp_path / "ck" / stage / "_SUCCESS_STAGE")
    again = pipeline.staged_pipeline(spark, pages, str(tmp_path / "ck"))
    assert again.count() == len(lazy)


def test_salted_history_equals_plain(spark):
    pages = synth_pages(spark, SF)
    t = pipeline.build_tables(pages)
    plain = {
        (r.element_type, r.id): [rec.asDict(recursive=True) for rec in r.history]
        for r in add_history(t["features"], t["versions"]).collect()
    }
    salted = {
        (r.element_type, r.id): [rec.asDict(recursive=True) for rec in r.history]
        for r in add_history_salted(t["features"], t["versions"], salt_buckets=7).collect()
    }
    assert salted == plain


def test_hot_key_stress_salted(spark):
    # one entity with 3000 versions (pathological url) — both join
    # variants must agree and complete
    from pyspark.sql import functions as F

    from osm_wayback_spark.schemas import FEATURES

    versions = (
        spark.range(1, 3001)
        .select(
            F.lit("node").alias("element_type"),
            F.lit(77).cast("long").alias("id"),
            F.col("id").cast("int").alias("version"),
            (F.lit(1500000000) + F.col("id") * 100).alias("ts"),
            (F.col("id") % 50).cast("long").alias("changeset"),
            F.lit(1).cast("int").alias("uid"),
            F.lit("u").alias("user"),
            F.lit(True).alias("visible"),
            F.lit(False).alias("deleted"),
            F.map_from_arrays(
                F.array(F.lit("v")),
                F.array(F.col("id").cast("string")),
            ).alias("tags"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("lonlat"),
            F.lit(None).cast("array<bigint>").alias("node_refs"),
        )
    )
    features = spark.createDataFrame(
        [("node", 77, 3000, 1, 1500300000, 1, "u", "{}", {"v": "3000"})],
        schema=FEATURES,
    )
    from osm_wayback_spark.operators.history import add_history, add_history_salted

    plain = add_history(features, versions).collect()[0]
    salted = add_history_salted(features, versions, salt_buckets=16).collect()[0]
    assert len(plain.history) == 3000
    assert [r.i for r in plain.history] == list(range(1, 3001))
    assert [r.asDict(recursive=True) for r in salted.history] == [
        r.asDict(recursive=True) for r in plain.history
    ]
