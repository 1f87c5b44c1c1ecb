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
        for r in pipeline.reconstruction_pipeline(pages).collect()
    }
    staged = {
        (r.element_type, r.id, r.version, r.minor_version): r.feature_json
        for r in pipeline.staged_pipeline(spark, pages, str(tmp_path / "ck")).collect()
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
