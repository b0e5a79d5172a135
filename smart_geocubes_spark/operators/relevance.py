"""Corpus relevance scoring (BM25 family) over the documents table.

Training-data pipelines score documents against seed queries to build
quality-weighted mixtures (e.g. "educational value" retrieval scoring).
This is BM25 with the classic k1=1.2 / b=0.75 parameters, except the
idf uses the *rational* form (N - df + 0.5) / (df + 0.5) without the
log: monotone in df exactly like log-idf (so rankings are preserved
for single-term contributions), but expressible as a short, fixed
IEEE-double expression tree that Spark and DuckDB evaluate bit-for-bit
identically (no libm log, whose last ulp is implementation-defined —
CLAUDE.md oracle-parity rule: floats only where both engines provably
compute identical doubles).

Every float in the score is derived from exact integers (tf, df, dl,
sum_dl, n_docs — all BIGINT, all order-independent) through ONE shared
expression string evaluated by both engines, so term contributions are
accumulated left-associatively in a fixed order and the doubles match
exactly.

Scale shape: one pass computes per-doc token features (JVM higher-order
functions, no Python); one tiny aggregate produces the corpus stats
row (broadcast); scoring is a single projection; top-k is
``orderBy().limit(k)`` = TakeOrdered (per-partition heaps + driver
merge of k rows), NEVER a global-order window, which would funnel the
corpus through one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = "CAST(1.2 AS DOUBLE)"
K1P1 = "CAST(2.2 AS DOUBLE)"
ONE_MINUS_B = "CAST(0.25 AS DOUBLE)"
B = "CAST(0.75 AS DOUBLE)"


def token_features(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Per-document token length + term frequencies, all JVM-side.

    dl counts whitespace-split tokens (identical to DuckDB
    ``len(string_split(text, ' '))`` — both keep empty tokens); tf_<t>
    counts exact token matches via a higher-order filter, no Python.
    """
    def _eq(term: str):
        # NOT `lambda x, t=t`: pyspark passes (element, index) to
        # two-parameter lambdas, silently overriding the default.
        return lambda x: x == F.lit(term)

    toks = F.split(F.col("text"), " ")
    out = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(t))).cast("long").alias(f"tf_{t}")
            for t in terms
        ],
    )
    return out


def bm25_score_expr(terms: list[str]) -> str:
    """The shared Spark/DuckDB scoring expression.

    Expects columns tf_<t> (per doc), dl (per doc), and corpus scalars
    n_docs, sum_dl, df_<t>.  avgdl and every constant are spelled the
    same way in both engines so the double trees are identical; term
    contributions are summed left-associatively in ``terms`` order.
    """
    if not terms:
        raise ValueError("bm25: terms must be non-empty")
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for t in terms:
        idf = (
            f"((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            f" / (CAST(df_{t} AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
        )
        norm = f"({K1} * ({ONE_MINUS_B} + {B} * (CAST(dl AS DOUBLE) / {avgdl})))"
        parts.append(
            f"({idf} * ((CAST(tf_{t} AS DOUBLE) * {K1P1})"
            f" / (CAST(tf_{t} AS DOUBLE) + {norm})))"
        )
    # left-associative accumulation, fixed order
    expr = parts[0]
    for p in parts[1:]:
        expr = f"({expr} + {p})"
    return expr


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20) -> DataFrame:
    """Top-k documents for ``terms`` by rational-idf BM25.

    Returns (rank, doc_id, score, dl, tf_<t>...).  Ties (identical tf
    vector + dl) break by doc_id, so ranks are deterministic.
    """
    from pyspark.sql import Window

    # feat feeds TWO subtrees in one action (the corpus-stats aggregate
    # and the scoring side of the crossJoin): checkpoint so the full
    # tokenize/filter pass over the corpus runs once (CLAUDE.md rule:
    # 2+ consumers -> eager localCheckpoint)
    feat = token_features(docs, terms).localCheckpoint(eager=True)
    stats = feat.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).cast("long").alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = feat.crossJoin(F.broadcast(stats)).withColumn(
        "score", F.expr(bm25_score_expr(terms))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "score",
        "dl",
        *[f"tf_{t}" for t in terms],
    )
