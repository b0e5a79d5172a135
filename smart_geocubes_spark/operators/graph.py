"""Web-graph operators over the Common-Crawl-style ``pages`` table.

The reference library has no graph stage, but every web-scale corpus
pipeline ranks hosts before sampling them (crawl-frontier priority,
spam demotion, domain mixing).  This module derives a host->host link
graph from the pages table and runs a fixed number of PageRank rounds
entirely in scaled BIGINT fixed-point arithmetic so the result is
bit-reproducible across engines (the oracle replays the identical
integer math in DuckDB).

Determinism notes (why this is exactly oracle-able):

* PR values are scaled by 1e9 and kept as BIGINT; sums of BIGINTs are
  exact and order-independent (unlike double sums, which depend on
  shuffle order).
* The only non-integer steps are ``floor(CAST(pr AS DOUBLE) / outdeg)``
  and ``floor(0.85 * mass)``.  Both are safe: every operand is < 2^53
  so the casts are exact; a single IEEE divide / multiply of identical
  operands is identical in every engine; and ``floor`` can only flip
  when the true quotient sits within one ulp of an integer, which for
  ``pr < 2^46`` and ``outdeg <= n_hosts`` requires an exact division —
  itself computed exactly.  (Bound: ulp(5e10) ~= 2^-16; a fractional
  part that small forces remainder < outdeg * 2^-16 < 1, i.e. 0.)

Scale: nodes are hosts (~1e8 at web scale), edges host->host
(distinct). Each round is one hash join on the edge src plus one
aggregation on dst — the canonical Pregel-as-joins shape.  The edge
set feeds every round, so it is localCheckpoint'ed once (CLAUDE.md
invariant: a DataFrame consumed by 2+ plan subtrees is checkpointed,
never recomputed).  Rounds are unrolled (fixed n_iter), so there is
no driver-side convergence loop to stall the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# host universe size: ONE constant, owned by the pages derivation
# (sources/synth.py interpolates it into host_id = h1 % N_HOSTS); the
# link target uses the independent h2 hash over the same universe.
from smart_geocubes_spark.sources.synth import N_HOSTS  # noqa: E402

DAMPING = 0.85  # the single damping parameter; everything below derives
PR_SCALE = 1_000_000_000  # fixed-point 1.0
DAMPING_NUM = int(DAMPING * PR_SCALE)
TELEPORT = PR_SCALE - DAMPING_NUM  # (1 - DAMPING) * PR_SCALE

# ONE expression string per fixed-point step, shared verbatim with the
# DuckDB oracle (queries.py interpolates these) so the double trees are
# identical in both engines.  The damping literal is repr()-interpolated
# from DAMPING so the teleport term and the multiplier cannot drift.
CONTRIB_EXPR = "CAST(floor(CAST(pr AS DOUBLE) / CAST(outdeg AS DOUBLE)) AS BIGINT)"
DAMP_EXPR = (
    f"CAST({TELEPORT} AS BIGINT) + "
    f"CAST(floor(CAST({DAMPING!r} AS DOUBLE) * CAST(mass AS DOUBLE)) AS BIGINT)"
)


def host_link_edges(pages: DataFrame) -> DataFrame:
    """Distinct host->host edges derived from pages.

    Each page on host ``host_id`` links to host ``h2 % N_HOSTS`` (the
    second derivation hash — independent of host_id, deterministic).
    Self-links are dropped; parallel edges collapse to one (unweighted
    graph keeps the per-round division exactly floor(pr/outdeg), which
    is the provably-exact fixed-point step — see module docstring).
    """
    return (
        pages.select(
            F.col("host_id").cast("long").alias("src"),
            (F.col("h2") % F.lit(N_HOSTS)).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_fixed_point(edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """``n_iter`` PageRank rounds in scaled-BIGINT fixed point.

    Returns (host_id, pr_scaled, outdeg, indeg).  pr_scaled is the
    rank after ``n_iter`` rounds, scaled by PR_SCALE; dangling nodes
    (appearing only as dst) contribute nothing, nodes receiving no
    mass keep only the teleport term — both via LEFT joins, exactly as
    the oracle's unrolled CTEs replay.
    """
    # edges feed every round AND the degree tables: checkpoint once.
    # nodes/outdeg feed every round too (CLAUDE.md rule: 2+ consumers ->
    # checkpoint, never recompute the distinct/groupBy shuffle per round).
    edges = edges.localCheckpoint(eager=True)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count("*").cast("long").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    indeg = edges.groupBy("dst").agg(F.count("*").cast("long").alias("indeg"))
    nodes = (
        edges.select(F.col("src").alias("host_id"))
        .union(edges.select(F.col("dst").alias("host_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pr = nodes.withColumn("pr", F.lit(PR_SCALE).cast("long"))
    for _ in range(n_iter):
        mass = (
            edges.join(pr, edges["src"] == pr["host_id"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("host_id"), F.expr(CONTRIB_EXPR).alias("c"))
            .groupBy("host_id")
            .agg(F.sum("c").alias("mass"))
        )
        pr = (
            nodes.join(mass, "host_id", "left")
            .withColumn("mass", F.coalesce(F.col("mass"), F.lit(0)))
            .select("host_id", F.expr(DAMP_EXPR).cast("long").alias("pr"))
        )
    return (
        pr.join(outdeg, pr["host_id"] == outdeg["src"], "left")
        .join(indeg, pr["host_id"] == indeg["dst"], "left")
        .select(
            "host_id",
            F.col("pr").alias("pr_scaled"),
            F.coalesce(F.col("outdeg"), F.lit(0)).cast("long").alias("outdeg"),
            F.coalesce(F.col("indeg"), F.lit(0)).cast("long").alias("indeg"),
        )
    )
