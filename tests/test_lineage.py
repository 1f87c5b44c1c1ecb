"""Checkpoint/resume with per-partition lineage."""

import pytest

from osm_wayback_spark.plans import lineage


def test_stage_checkpoint_and_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(0, 100).selectExpr("id", "id * 2 AS dbl")

    out1 = lineage.run_stage(spark, root, "stage_a", build)
    assert out1.count() == 100
    assert calls["n"] == 1
    # resume: completed stage must NOT recompute
    out2 = lineage.run_stage(spark, root, "stage_a", build)
    assert out2.count() == 100
    assert calls["n"] == 1

    lin = lineage.read_lineage(spark, root, "stage_a")
    rows = lin.collect()
    assert sum(r.rows_out for r in rows) == 100
    assert all(r.stage == "stage_a" for r in rows)

    # force: marker removed → recompute
    out3 = lineage.run_stage(spark, root, "stage_a", build, force=True)
    assert out3.count() == 100
    assert calls["n"] == 2


def test_lineage_pass_is_jvm_native(spark):
    """The metrics pass must not ship stage data through Python: no
    BatchEvalPython / ArrowEvalPython / mapInPandas in its plan, and
    the checksum must be deterministic but order/content-sensitive."""
    df = spark.range(0, 1000).selectExpr(
        "id", "map('k', cast(id as string)) AS tags", "cast(id as double) AS v"
    )
    agg = lineage.partition_metrics(df)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    rows = {r.partition_id: r for r in agg.collect()}
    again = {r.partition_id: r for r in lineage.partition_metrics(df).collect()}
    assert {p: (r.rows_out, r.checksum) for p, r in rows.items()} == {
        p: (r.rows_out, r.checksum) for p, r in again.items()
    }
    assert sum(r.rows_out for r in rows.values()) == 1000
    mutated = df.withColumn("v", lineage.F.col("v") + 1)
    changed = {r.partition_id: r.checksum for r in lineage.partition_metrics(mutated).collect()}
    assert changed != {p: r.checksum for p, r in rows.items()}


def test_checksum_is_multiplicity_sensitive(spark):
    """Round-4 advice: the old bit-XOR checksum cancelled any row
    duplicated an even number of times, so swapping one duplicated
    row for another (same cardinality) was invisible. The modular-sum
    checksum must distinguish {A,A,B} from {A,B,B} (rows_out equal)."""
    a = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "id long, s string"
    ).coalesce(1)
    b = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y")], "id long, s string"
    ).coalesce(1)
    ra = lineage.partition_metrics(a).collect()[0]
    rb = lineage.partition_metrics(b).collect()[0]
    assert ra.rows_out == rb.rows_out == 3
    assert ra.checksum != rb.checksum
    # order-insensitive: a reordering of the same multiset matches
    a2 = spark.createDataFrame(
        [(2, "y"), (1, "x"), (1, "x")], "id long, s string"
    ).coalesce(1)
    assert lineage.partition_metrics(a2).collect()[0].checksum == ra.checksum


def test_incomplete_stage_recomputed(spark, tmp_path):
    import os

    root = str(tmp_path / "ckpt2")
    lineage.run_stage(spark, root, "s", lambda: spark.range(10))
    # simulate a crash mid-write: marker removed
    os.remove(f"{root}/s/_SUCCESS_STAGE")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(20)

    out = lineage.run_stage(spark, root, "s", build)
    assert out.count() == 20
    assert calls["n"] == 1
