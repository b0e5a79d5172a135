"""Scale-holding sweep for the round-6 plan changes (bench.py frozen).

The driver's round-end measurement may run at a LARGER scale factor
than the local sf0.1 fixture, so every r6 optimization must hold as
the input grows, not just at 600k-row tables. This harness times the
operators whose PLANS changed this round at K x the fixture input:

- dedup / similarity family (shared-subtree checkpoints + the
  exact-Jaccard semi-join prefilter): the ``documents`` view is
  re-registered as K replicas, each replica's text passed through a
  per-replica letter rotation (``translate``) so lengths and the
  WITHIN-replica injected-dup structure are preserved while
  cross-replica texts stay disjoint — the corpus and its near-dup
  pair count scale linearly in K (replicating verbatim would make
  every replica an exact dup and quadratically explode pairs, which
  is not what a bigger crawl looks like);
- spatial_join_pip (closed-form diamond refine): the pages side fans
  out with the generator's own ``mult=K`` (unique hashed page ids, the
  same mechanism bench.py's flagship job uses).

K=1 and K=K reps are INTERLEAVED across two passes (CLAUDE.md host
notes: never back-to-back on this VM). Noop sink per guide §1.4,
jobs labelled per §1.5. Usage:

  python bench_scale.py [K]     # default 4
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen; reused for the session builder)

#: per-replica rotation alphabet (high-frequency letters so most
#: 12-gram shingles actually change across replicas)
_ROT = "etaoinshr"

#: replica doc_id stride — must clear max(doc_id) + the +1000/+2000
#: shifts CORPUS_SQL applies when injecting dups (fixture max is 4999)
_STRIDE = 10_000

DEDUP_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash_neardup",
    "dedup_clusters",
    "contamination_overlap",
]


def register_documents(spark, k: int) -> None:
    """Point the ``documents`` temp view at a K-replica perturbed copy
    of the base table (always rebuilt from ``documents_base`` so K can
    change mid-session)."""
    parts = []
    for i in range(k):
        r = i % len(_ROT)
        rot = _ROT[r:] + _ROT[:r]
        text = "text" if rot == _ROT else f"translate(text, '{_ROT}', '{rot}')"
        parts.append(
            f"SELECT doc_id + {i * _STRIDE} AS doc_id, {text} AS text "
            "FROM documents_base"
        )
    spark.sql(" UNION ALL ".join(parts)).createOrReplaceTempView("documents")


def pip_frame(spark, sf_dir: str, k: int):
    """q_spatial_join_pip's exact frame with the pages side at mult=k."""
    from pyspark.sql import functions as F

    from smart_geocubes_spark.operators.geoparse import geoparsed_points
    from smart_geocubes_spark.operators.spatial_join import (
        explode_catalog_to_cells,
        pip_join,
    )
    from smart_geocubes_spark.sources.synth import catalog_df, pages_df

    dp = spark.sparkContext.defaultParallelism
    pages = pages_df(spark, sf_dir, mult=k, parallelism=dp).select(
        "page_id", "url", "warc_epoch", "host_id"
    )
    pts = geoparsed_points(pages)
    cells = explode_catalog_to_cells(spark, catalog_df(spark))
    return pip_join(pts, cells).groupBy("patch_id").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("page_id").cast("long").alias("sum_page_id"),
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))

    import __spark_entry__ as entrymod
    from smart_geocubes_spark.sources.synth import ensure_base_views

    spark = bench.make_session(cpus)
    ensure_base_views(spark, sf_dir)
    # snapshot the pristine table once; every register_documents call
    # rebuilds from this so K flips cleanly between interleaved reps
    spark.table("documents").createOrReplaceTempView("documents_base")

    qs = entrymod.queries()
    # warm the Arrow/python UDF workers once so the first pip rep
    # isn't charged the spawn (bench.py does the same)
    qs["geoparse"](spark, sf_dir).limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}

    def run_one(name: str, kk: int, build) -> None:
        # time construction AND the action together (bench.py's
        # methodology): several of these queries do their heavy work
        # eagerly at build time (localCheckpoints, iteration rounds)
        spark.sparkContext.setJobDescription(f"scale{kk}:{name}")
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        slot = out.setdefault(name, {})
        slot[kk] = dt if kk not in slot else min(slot[kk], dt)
        print(f"  {name} K={kk}: {dt:.2f}s", flush=True)

    for p in range(passes):
        print(f"pass {p + 1}/{passes}", flush=True)
        for kk in (1, k):
            register_documents(spark, kk)
            for name in DEDUP_QUERIES:
                run_one(name, kk, lambda n=name: qs[n](spark, sf_dir))
            run_one(
                "spatial_join_pip",
                kk,
                lambda kk=kk: pip_frame(spark, sf_dir, kk),
            )
        # row-count sanity on the first pass: output cardinality must
        # scale with the input (catches a silently-empty scaled view)
        if p == 0:
            for kk in (1, k):
                register_documents(spark, kk)
                counts.setdefault("dedup_minhash_lsh", {})[kk] = qs[
                    "dedup_minhash_lsh"
                ](spark, sf_dir).count()

    # restore the pristine view before anything else uses the session
    spark.table("documents_base").createOrReplaceTempView("documents")

    ratios = {
        n: round(t[k] / t[1], 2) if t.get(1) else None
        for n, t in out.items()
        if k in t
    }
    print(
        json.dumps(
            {
                "k": k,
                "sf_dir": sf_dir,
                "cpus": cpus,
                "min_sec": {
                    n: {str(kk): round(v, 2) for kk, v in t.items()}
                    for n, t in out.items()
                },
                "wall_ratio_k_over_1": ratios,
                "minhash_rows": {str(kk): v for kk, v in counts.get(
                    "dedup_minhash_lsh", {}
                ).items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
