"""Checkpoint / resume with per-partition lineage + metrics.

North rule: "per-partition lineage and metrics checkpointed so any
stage is resumable mid-run". Each pipeline stage writes

    <root>/<stage>/data/        the stage output (parquet)
    <root>/<stage>/_lineage/    per-partition rows_out/checksum/wall_ms
    <root>/<stage>/_SUCCESS_STAGE   atomic completion marker

`run_stage` is idempotent: a completed stage short-circuits to a read
of its data (resume = skip), an interrupted one (no marker) is
recomputed and overwritten. The reference's analog is its run
counters + staged files (add_history.cpp:54-60, README.md:52-62);
here the metrics are collected distributedly inside the writing pass
(mapPartitions-style via mapInPandas), not driver-side.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _paths(root: str, stage: str) -> tuple[str, str, str]:
    base = os.path.join(root, stage)
    return (
        os.path.join(base, "data"),
        os.path.join(base, "_lineage"),
        os.path.join(base, "_SUCCESS_STAGE"),
    )


def stage_complete(root: str, stage: str) -> bool:
    return os.path.exists(_paths(root, stage)[2])


def write_stage(df: DataFrame, root: str, stage: str) -> None:
    """Write stage output + per-partition lineage, then the marker."""
    data_path, lineage_path, marker = _paths(root, stage)
    spark = df.sparkSession
    df.write.mode("overwrite").parquet(data_path)

    # lineage over what was written (stable file-based partitions)
    written = spark.read.parquet(data_path)

    def metrics(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.time()
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        checksum = 0
        for pdf in batches:
            rows += len(pdf)
            if len(pdf):
                checksum ^= int(
                    pd.util.hash_pandas_object(pdf.astype(str)).sum()
                ) & ((1 << 63) - 1)
        yield pd.DataFrame(
            {
                "stage": [stage],
                "partition_id": [pid],
                "rows_out": [rows],
                "checksum": [checksum],
                "wall_ms": [(time.time() - t0) * 1000.0],
            }
        )

    written.mapInPandas(
        metrics,
        schema="stage string, partition_id int, rows_out long, "
        "checksum long, wall_ms double",
    ).write.mode("overwrite").parquet(lineage_path)
    with open(marker, "w") as fh:
        fh.write(str(time.time()))


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    build: Callable[[], DataFrame],
    force: bool = False,
) -> DataFrame:
    """Resume-aware stage execution: completed → read back; else
    compute, checkpoint, read back (so downstream stages consume the
    materialized artifact, cutting lineage like the reference's staged
    files)."""
    data_path, _lineage, marker = _paths(root, stage)
    if force and os.path.exists(marker):
        os.remove(marker)
    if not stage_complete(root, stage):
        write_stage(build(), root, stage)
    return spark.read.parquet(data_path)


def read_lineage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(_paths(root, stage)[1])
