"""Bucketed versions table: correctness + shuffle elimination."""

import pytest
from pyspark.sql import functions as F

from osm_wayback_spark import pipeline
from osm_wayback_spark.operators.history import add_history
from osm_wayback_spark.plans.bucketing import (
    exchanges_in_plan,
    read_bucketed_versions,
    write_bucketed_versions,
)
from osm_wayback_spark.synth import synth_pages

SF = 0.001


def test_bucketed_join_correct_and_shuffle_free(spark, tmp_path):
    # warehouse dir is a static conf — the managed table lands in
    # ./spark-warehouse (gitignored)
    pages = synth_pages(spark, SF)
    t = pipeline.build_tables(pages)
    write_bucketed_versions(t["versions"], "versions_b", buckets=8)
    bucketed = read_bucketed_versions(spark, "versions_b")

    plain = {
        (r.element_type, r.id): [rec.asDict(recursive=True) for rec in r.history]
        for r in add_history(t["features"], t["versions"]).collect()
    }
    # force SMJ so the bucket-side exchange elision is observable;
    # disable AQE for the audit — its runtime coalescing re-shuffles
    # the (small) features side to match the bucket count, which
    # keeps the total Exchange count equal even though the big
    # versions side no longer shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = add_history(t["features"], bucketed)
        got = {
            (r.element_type, r.id): [rec.asDict(recursive=True) for rec in r.history]
            for r in out.collect()
        }
        assert got == plain

        # plan audit: bucketed versions side must not re-shuffle —
        # strictly fewer exchanges than the unbucketed SMJ plan
        unbucketed_x = exchanges_in_plan(add_history(t["features"], t["versions"]))
        bucketed_x = exchanges_in_plan(out)
        assert bucketed_x < unbucketed_x, (bucketed_x, unbucketed_x)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS versions_b")
