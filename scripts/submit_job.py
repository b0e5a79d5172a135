"""spark-submit entry point (north rule: "the whole job runs via
spark-submit --py-files ... at N and 4N executors").

Usage:
    scripts/make_pyfiles.sh   # builds dist/smart_geocubes_spark.zip
    spark-submit --master local[8]  --py-files dist/smart_geocubes_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.01 --cube /tmp/cube \
        --roi=-150.7,62.3,-148.2,64.9
    spark-submit --master local[32] --py-files dist/smart_geocubes_spark.zip ... (4N)

Runs the full engine job: cube create (if absent) -> resumable
materialize of the ROI -> geoparse + PIP spatial join of the pages
table -> per-patch counts. Prints one JSON line with row counts and
timings so two invocations at different parallelism give the scaling
numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cube", required=True)
    ap.add_argument("--roi", default="-150.7,62.3,-148.2,64.9")
    args = ap.parse_args()
    roi = tuple(float(x) for x in args.roi.split(","))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("smart-geocubes-spark-job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")

    from smart_geocubes_spark.operators.prep import prep_pages
    from smart_geocubes_spark.operators.spatial_join import (
        explode_catalog_to_cells,
        pip_join,
    )
    from smart_geocubes_spark.plans.materialize import (
        CubeSpec,
        create_cube,
        load,
        materialize,
    )
    from smart_geocubes_spark.sources.synth import GRID, catalog_df, pages_df

    t0 = time.time()
    if not os.path.exists(os.path.join(args.cube, "_meta.json")):
        create_cube(args.cube, CubeSpec(grid=GRID, channels=("dem",), time_epochs=None))
    m = materialize(spark, args.cube, roi)
    cube_rows = load(spark, args.cube, roi).count()
    t_mat = time.time() - t0

    t0 = time.time()
    pages = pages_df(spark, args.sf_dir).select("page_id", "url", "html", "warc_epoch", "host_id")
    pts = prep_pages(pages)
    cells = explode_catalog_to_cells(spark, catalog_df(spark))
    join_rows = pip_join(pts, cells).groupBy("patch_id").agg(F.count("*").alias("n")).count()
    t_join = time.time() - t0

    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "chunks_written": m.get("written", 0),
                "cube_rows_visible": cube_rows,
                "materialize_sec": round(t_mat, 3),
                "join_patches": join_rows,
                "join_sec": round(t_join, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
