"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM higher-order
functions: ``zip_with`` + ``aggregate`` — no Python, no shuffle of the
embedding table beyond the broadcast of queries), and a
random-hyperplane LSH-bucketed variant as the scale path (buckets via
sign bits of projections in an Arrow pandas UDF; candidate set =
query's bucket + hamming-1 neighbors; exact re-rank inside).

At 10^12 rows the brute-force path is the per-bucket re-ranker, not
the global plan; the bucketed variant keeps the big side hash-
partitioned by bucket with no cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cos_cols(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / (F.sqrt(na) * F.sqrt(nb))


def ann_cosine_topk(spark: SparkSession, emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k for query vectors (vec_id % 25 == 0) over the
    whole table; queries broadcast, ranking by (cos desc, vec_id)."""
    base = emb.select("vec_id", _as_double("embedding").alias("v"))
    q = base.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cand = base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    cand = cand.withColumn("cos", _cos_cols(F.col("v"), F.col("qv")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def embedding_neardup_pairs(spark: SparkSession, emb: DataFrame, tau: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= tau).
    Fixture-scale is a self cross join; at scale the LSH bucketing below
    bounds candidates."""
    base = emb.select("vec_id", _as_double("embedding").alias("v"))
    a = base.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = base.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    pairs = pairs.withColumn("cos", _cos_cols(F.col("va"), F.col("vb")))
    return pairs.filter(F.col("cos") >= F.lit(tau)).select("id_a", "id_b")


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.standard_normal((n_planes, dim))


def make_bucket_udf(dim: int):
    planes = _planes(dim)

    @F.pandas_udf("int")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (n, dim) float32
        proj = m.astype(np.float64) @ planes.T  # (n, P)
        bits = (proj > 0).astype(np.int64)
        return pd.Series((bits << np.arange(N_PLANES)).sum(axis=1).astype(np.int32))

    return bucket_udf


def ann_lsh_topk(spark: SparkSession, emb: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets; each query probes
    its own bucket + all hamming-1 buckets; exact cosine re-rank inside
    the candidate set (multiprobe LSH)."""
    dim = len(emb.select("embedding").head()[0])
    bucket = make_bucket_udf(dim)
    base = emb.select(
        "vec_id", _as_double("embedding").alias("v"), bucket(F.col("embedding")).alias("bucket")
    )
    q = base.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    # multiprobe: qb plus hamming-1 neighbors
    probes = q.select(
        "qid",
        "qv",
        F.explode(
            F.array(F.col("qb"), *[(F.col("qb").bitwiseXOR(F.lit(1 << i))) for i in range(N_PLANES)])
        ).alias("bucket"),
    )
    cand = base.join(F.broadcast(probes), "bucket").filter(F.col("vec_id") != F.col("qid"))
    cand = cand.withColumn("cos", _cos_cols(F.col("v"), F.col("qv")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "rank", F.round("cos", 6).alias("cos6"))
    )
