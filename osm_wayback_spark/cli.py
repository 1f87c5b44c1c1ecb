"""spark-submit entry point (north rule: "run via spark-submit
--py-files on multi-executor clusters").

    zip -r osm_wayback_spark.zip osm_wayback_spark/
    spark-submit --py-files osm_wayback_spark.zip \
        osm_wayback_spark/cli.py \
        --pages /path/to/pages_parquet \
        --out /path/to/checkpoints \
        --tiles /path/to/tiles_table [--zoom 15] [--resume]

Runs the staged, resumable pipeline (pages → versions → history_geom
→ versions_out → tiles) with per-partition lineage at every stage;
re-running with --resume (default) skips completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow `python osm_wayback_spark/cli.py` / `spark-submit cli.py`
# without an installed package: the repo root is one level up
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=False, help="pages parquet path; "
                   "omit to synthesize --synth-sf pages")
    p.add_argument("--synth-sf", type=float, default=0.01)
    p.add_argument("--out", required=True, help="checkpoint root")
    p.add_argument("--tiles", default=None, help="tile table output path")
    p.add_argument("--zoom", type=int, default=15)
    p.add_argument("--no-resume", action="store_true",
                   help="force-recompute all stages")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # under spark-submit the session/master comes from the launcher;
    # fall back to the local factory otherwise
    spark = SparkSession.getActiveSession()
    if spark is None:
        try:
            spark = SparkSession.builder.getOrCreate()
        except Exception:  # noqa: BLE001
            from osm_wayback_spark.session import get_spark

            spark = get_spark(app_name="osm-wayback-spark")

    from osm_wayback_spark import pipeline
    from osm_wayback_spark.operators.tiles import assign_tiles, write_tiles
    from osm_wayback_spark.plans import lineage

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        from osm_wayback_spark.synth import synth_pages

        pages = synth_pages(spark, args.synth_sf)

    t0 = time.time()
    if args.no_resume:
        for stage in ("versions", "history_geom", "versions_out"):
            import os

            marker = f"{args.out}/{stage}/_SUCCESS_STAGE"
            if os.path.exists(marker):
                os.remove(marker)
    recon = pipeline.staged_pipeline(spark, pages, args.out)
    n_out = recon.count()
    stats = {"versions_out_rows": n_out, "wall_s": round(time.time() - t0, 2)}

    if args.tiles:
        tiles = assign_tiles(
            recon.filter(F.col("geometry").isNotNull()), z=args.zoom
        )
        write_tiles(tiles, args.tiles)
        stats["tiles_rows"] = spark.read.parquet(args.tiles).count()

    for stage in ("versions", "history_geom", "versions_out"):
        lin = lineage.read_lineage(spark, args.out, stage)
        row = lin.groupBy().agg(
            F.sum("rows_out").alias("rows"), F.sum("wall_ms").alias("ms")
        ).collect()[0]
        stats[f"stage_{stage}"] = {"rows": row.rows, "partition_ms": round(row.ms, 1)}

    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
