"""Round-6 optimization measurement harness (bench.py stays frozen).

Isolates each bench-timed component per guide §1: per-query noop-sink
timings (interleaved min-of-N), materialize and flagship-pipeline
throughput, and ``.explain("formatted")`` dumps for the plan evidence
in plans/r06/.

Usage:
  python bench_extra.py                    # all headline components, 2 passes
  python bench_extra.py --passes 3 q1 q2   # just the named queries
  python bench_extra.py --explain SUFFIX   # also dump plans/r06/<q>_SUFFIX.txt
  python bench_extra.py --mat --flag       # throughput sections only
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen; reused for session + jobs)

HEADLINE = [
    "geoparse",
    "extract_text",
    "tile_assign",
    "cell_encode",
    "spatial_join_bbox",
    "spatial_join_pip",
    "knn_ring",
    "asof_time_nearest",
    "range_join_time",
    "zonal_stats",
]


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    explain_suffix = None
    do_mat = "--mat" in args
    do_flag = "--flag" in args
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_suffix = args[i + 1]
        del args[i : i + 2]
    names = [a for a in args if not a.startswith("--")] or HEADLINE
    if do_mat or do_flag:
        names = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.make_session(cpus)

    out: dict[str, object] = {}
    if names:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        # warm python workers
        qs["geoparse"](spark, sf_dir).limit(1000).write.format("noop").mode(
            "overwrite"
        ).save()
        if explain_suffix:
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            for n in names:
                df = qs[n](spark, sf_dir)
                with open(
                    os.path.join(REPO, "plans", "r06", f"{n}_{explain_suffix}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        times: dict[str, list[float]] = {n: [] for n in names}
        for _p in range(passes):
            for n in names:
                spark.sparkContext.setJobDescription(f"r06:{n}")
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[n].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        out["queries_min"] = {n: min(v) for n, v in times.items()}
        out["queries_samples"] = times
        out["queries_total_min"] = round(sum(min(v) for v in times.values()), 3)

    if do_mat:
        mats = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription("r06:materialize")
            tiles, sec = bench.materialize_job(spark)
            mats.append((tiles, round(sec, 3)))
            spark.sparkContext.setJobDescription(None)
        out["materialize"] = mats
        out["tiles_per_sec_best"] = round(max(t / s for t, s in mats), 1)

    if do_flag:
        mult = int(os.environ.get("SPARK_GRAFT_MULT", "8"))
        fl = []
        for _ in range(passes):
            spark.sparkContext.setJobDescription("r06:flagship")
            t0 = time.time()
            n_rows = bench.flagship_pipeline(spark, sf_dir, mult=mult, cores=cpus)
            fl.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out["flagship_sec"] = fl
        out["flagship_rows_per_sec_best"] = round(n_rows / min(fl), 1)

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
