"""Distinct-count sketches with integer-deterministic state.

KMV (k-minimum-values, a.k.a. bottom-k) over a Knuth-multiplicative
hash: the sketch state is the k smallest distinct hash values — pure
BIGINTs, so unlike HyperLogLog's harmonic mean (an order-dependent
double sum) the whole sketch AND its estimate are bit-reproducible and
exactly oracle-able in DuckDB.

Estimate: for k minima over a hash space of size M, the classic KMV
estimator is (k-1) * M / h_(k).  Exactness of the floor: the numerator
(k-1)*M fits in 2^53 so the double cast is exact; the quotient is a
few thousand, whose ulp (~2^-41) is far below the smallest possible
non-zero fractional part, so floor() can only be "off" on an exact
division — which IEEE computes exactly.

Scale shape: distinct() is one hash-shuffle on the hash value;
``orderBy(h).limit(k)`` is TakeOrdered — per-partition bottom-k heaps
merged on the driver (k rows), NOT a global sort.  Sketch states from
shards merge by union + bottom-k, the standard mergeable-summary
property, so this shape survives any fan-in tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_MULT = 2654435761  # Knuth multiplicative constant, shared with oracles
HASH_SPACE = 2147483648  # 2^31

def kmv_est_expr(k: int) -> str:
    """ONE expression string evaluated by both engines (the oracle
    interpolates it verbatim) so the double division tree is identical.

    Underfull sketch (n_kept < k): every distinct hash was retained, so
    the exact count n_kept IS the answer — extrapolating would undercount
    (e.g. 3 distinct values would report floor(2*M/h_3)).  greatest(h_k,
    1): h(0) = 0, and floor(x/0.0) = floor(inf) would throw on the
    BIGINT cast under ANSI (CLAUDE.md zero-denominator rule).
    """
    return (
        f"CASE WHEN n_kept < {k} THEN n_kept ELSE "
        "CAST(floor(CAST((n_kept - 1) * CAST(2147483648 AS BIGINT) AS DOUBLE)"
        " / CAST(greatest(h_k, CAST(1 AS BIGINT)) AS DOUBLE)) AS BIGINT) END"
    )


def kmv_bottom_k(values: DataFrame, col: str, k: int = 64) -> DataFrame:
    """KMV sketch over the BIGINT column ``col``.

    Returns exactly min(k, n_distinct) rows:
    (rank, hval, est_distinct) — est_distinct is the (k-1)*M/h_(k)
    estimate computed from the largest retained hash, constant across
    rows.  The input value must be NON-NEGATIVE (Spark and DuckDB both
    give sign-of-dividend remainders, so negatives would still agree,
    but the estimator assumes hashes uniform on [0, M)) and small
    enough that value*HASH_MULT fits int64 (caller reduces first —
    ANSI mode throws on overflow, which is the guard we want at scale).
    """
    from pyspark.sql import Window

    h = (F.col(col) * F.lit(HASH_MULT)) % F.lit(HASH_SPACE)
    mins = (
        values.select(h.cast("long").alias("hval"))
        .distinct()
        .orderBy("hval")
        .limit(k)
    )
    # k rows max: the window + the max-scalar cross join are driver-trivial
    mins = mins.localCheckpoint(eager=True)  # feeds two subtrees below
    kth = mins.agg(
        F.max("hval").alias("h_k"), F.count("*").cast("long").alias("n_kept")
    )
    w = Window.orderBy("hval")
    return (
        mins.crossJoin(F.broadcast(kth))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "hval",
            F.expr(kmv_est_expr(k)).alias("est_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# with d x W bounded state.  Buckets are md5 HEX PREFIXES, not integers:
# substr(md5('<j>|' || key), 1, CMS_HEX) is byte-identical in Spark and
# DuckDB (the minhash family already relies on this), which makes the
# whole sketch — counters AND estimates — exactly oracle-able without a
# cross-engine hex->int conversion.
#
# Scale shape: the counter build is one map-side-combining aggregation of
# d*n generator rows into d*W groups (W = 16^CMS_HEX); the counter table
# is KBs at any corpus size, so the probe side joins it broadcast.  The
# classic two-pass heavy-hitters: sketch pass + candidate probe pass,
# bounded memory at 100 TB.  Standard guarantee: est >= true count
# always (only over-counts on collisions); est <= true + eps*N w.h.p.
# ---------------------------------------------------------------------------

CMS_D = 3  # hash rows
# hex chars per bucket key -> W = 16^CMS_HEX buckets per row.  1 hex
# char (W=16) at fixture scale: the synthetic corpus has a ~66-token
# vocabulary, so W=256 would never collide and the gate would only
# ever see est == tf — W=16 forces real collisions and the compare
# covers the over-count + min-reduction path.  Production sizing is
# eps = e/W: pick CMS_HEX from the tolerated over-count, not this.
CMS_HEX = 1


def cms_bucket_sql(col: str, j: int) -> str:
    """ONE bucket expression per hash row, interpolated verbatim into
    both the Spark selectExpr and the DuckDB oracle."""
    return f"substr(md5('{j}|' || {col}), 1, {CMS_HEX})"


def _cms_stack_expr(col: str) -> str:
    args = ", ".join(f"{j}, {cms_bucket_sql(col, j)}" for j in range(CMS_D))
    return f"stack({CMS_D}, {args}) AS (j, bucket)"


def cms_counters(keys: DataFrame, col: str) -> DataFrame:
    """d x W counter table from one occurrence-stream pass: each key
    row fans out to CMS_D (j, bucket) generator rows (no shuffle until
    the combining aggregate)."""
    return (
        keys.selectExpr(_cms_stack_expr(col))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, col: str, counters: DataFrame) -> DataFrame:
    """min over the d probed counters per candidate key — the CMS
    point estimate.  counters is d*W rows by construction: broadcast.

    LEFT join + coalesce(0): a candidate key ABSENT from the sketched
    stream probes one or more EMPTY cells, which the counter table does
    not materialize — an inner join would drop those probes and inflate
    the min (or lose the key entirely when all d cells are empty). The
    empty cell's true counter is 0 and must win the min."""
    probes = candidates.selectExpr(col, _cms_stack_expr(col))
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
