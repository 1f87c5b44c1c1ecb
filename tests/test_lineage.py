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
