"""Line-delimited JSON pages source/sink (SURVEY.md row S4's "line
source" as a real interchange format, not just DataFrame-in/out).

Crawl archives commonly ship as (gzipped) JSONL; this maps that wire
format onto the engine's PAGES schema losslessly:

- ``html`` (binary) rides as base64 — JSON has no bytes type;
- ``warc_ts`` as epoch MICROseconds (integer — avoids the timezone
  and sub-second formatting ambiguity of ISO strings);
- everything else verbatim.

Both directions are pure DataFrame ops (spark.read.json / write.text
with native base64/unbase64/from_unixtime), so the source splits,
prunes and parallelizes like any other scan — .gz files are
line-splittable only per-file, so a real crawl drop should be many
files (which is how crawls ship anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import PAGES

_WIRE = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts_us", T.LongType()),
        T.StructField("html_b64", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def write_pages_jsonl(pages: DataFrame, path: str, compress: bool = True) -> None:
    """pages (PAGES schema) → one JSON object per line."""
    wire = pages.select(
        F.to_json(
            F.struct(
                F.col("url"),
                # unix_micros is exact for TimestampType (µs precision)
                F.unix_micros("warc_ts").alias("warc_ts_us"),
                F.base64("html").alias("html_b64"),
                F.col("text"),
                F.col("lang"),
            )
        ).alias("value")
    )
    writer = wire.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL (as written by write_pages_jsonl) → PAGES-schema frame.
    Explicit wire schema: no sampling-based inference pass over the
    (huge) input."""
    wire = spark.read.schema(_WIRE).json(path)
    out = wire.select(
        F.col("url"),
        F.timestamp_micros("warc_ts_us").alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    # keep column order/type parity with the parquet source
    return out.select(*[F.col(f.name).cast(f.dataType) for f in PAGES.fields])
