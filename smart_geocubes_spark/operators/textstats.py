"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

All JVM-side built-ins (``regexp_count``, ``length``, ``md5``,
higher-order array functions) — whole-stage codegen, no Python in the
hot path, bit-identical DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language marker words (function words per language) — a real n-gram
# language-ID heuristic in miniature: score = marker hits / tokens.
LANG_MARKERS = {
    "en": r"\b(the|a|of|and)\b",
    "de": r"\b(der|die|das|und)\b",
    "fr": r"\b(le|la|et|des)\b",
}

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORD_RE = r"\b(the|a|and|of|to|in)\b"
FP_GRAM = 8


def lang_id(docs: DataFrame, keep: bool = False) -> DataFrame:
    """Marker-word counts per language + argmax prediction (ties ->
    LANG_MARKERS insertion order: en, then de, then fr — deterministic,
    mirrored by the oracle's >= chain). ``keep=True`` preserves the
    input columns so the op composes into single-pass pipelines (the
    corpus funnel chains lang -> quality -> tokens with ZERO joins —
    all three are projections of text)."""
    cols = [
        F.regexp_count(F.col("text"), F.lit(rx)).cast("long").alias(f"n_{lang}")
        for lang, rx in LANG_MARKERS.items()
    ]
    d = docs.select(*(["*"] if keep else ["doc_id"]), *cols)
    # argmax derived from LANG_MARKERS (insertion order breaks ties), so
    # adding a language keeps counts and prediction in sync
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [F.col(f"n_{lang}") >= F.col(f"n_{o}") for o in langs[langs.index(lang) + 1 :]]
        cond = later[0]
        for c in later[1:]:
            cond = cond & c
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return d.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame, keep: bool = False) -> DataFrame:
    """Length/punctuation/stopword-ratio quality features + a composite
    score (all integer/double column math). ``keep=True``: see lang_id."""
    n_tokens = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+")).cast("long")
    n_punct = F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).cast("long")
    n_stop = F.regexp_count(F.col("text"), F.lit(STOPWORD_RE)).cast("long")
    d = docs.select(
        *(["*"] if keep else ["doc_id"]),
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
    )
    return d.select(
        "*",
        (F.col("n_stop").cast("double") / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")).alias(
            "stop_ratio"
        ),
        (
            F.col("n_tokens").cast("double") / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
            - F.col("n_punct").cast("double") / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
        ).alias("qscore"),
    )


def token_counts(docs: DataFrame, keep: bool = False) -> DataFrame:
    """Whitespace tokens + BPE-ish subtoken count (regex classes).
    ``keep=True``: see lang_id."""
    return docs.select(
        *(["*"] if keep else ["doc_id"]),
        F.regexp_count(F.col("text"), F.lit(r"\S+")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("long").alias("n_subtokens"),
    )


def repetition_quality(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1 in
    miniature) as INTEGER rules — no float thresholds to drift between
    engines: a doc is flagged ``repetitive`` when its most frequent
    word-bigram exceeds half of all bigrams (2*top > n_bigrams) or
    distinct words fall under a third of words (3*distinct < words).

    Scale shape: the top-bigram count is a RUN-LENGTH FOLD over the
    doc's sorted bigram array — one JVM projection, zero shuffle, zero
    explode (the explode x n_bigrams + double groupBy form ships
    n_bigrams rows per doc through two exchanges and survives only as
    the DuckDB oracle)."""
    w = F.split(F.col("text"), " ")
    df = docs.select(F.col("doc_id").cast("long").alias("doc_id"), w.alias("w"))
    bg = (
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        " ELSE array() END"
    )
    top = F.expr(
        f"""aggregate(
          array_sort({bg}),
          named_struct('prev', '', 'run', 0L, 'best', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run', IF(x = acc.prev, acc.run + 1L, 1L),
            'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1L, 1L))),
          acc -> acc.best)"""
    )
    out = df.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_words"),
        top.alias("top_bigram_count"),
    )
    return out.withColumn(
        "repetitive",
        (2 * F.col("top_bigram_count") > F.col("n_words") - 1)
        | (3 * F.col("n_distinct_words") < F.col("n_words")),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over rolling char 8-grams
    (JVM: sequence + transform + array_min)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length(text) - {FP_GRAM - 1}, 1)),"
        f" i -> md5(substring(text, i, {FP_GRAM})))"
    )
    return docs.select("doc_id", F.array_min(grams).alias("fingerprint"))


# Rabin-Karp-style polynomial rolling hash (true "rolling hash"
# fingerprint): h(i) = sum_j byte(text[i+j]) * B^j mod P over 8-grams.
RH_B = 131
RH_P = 2147483647
RH_W = 8


def rolling_hash_fingerprint(docs: DataFrame) -> DataFrame:
    """Min rolling hash over all 8-gram windows per document — numpy
    sliding-window vectorized inside an Arrow kernel (the engine's
    rolling-hash path; md5 variant in doc_fingerprint is the
    cryptographic one)."""
    import numpy as np
    import pandas as pd

    powers = np.array([RH_B**j for j in range(RH_W)], dtype=np.int64)

    def gen(batches):
        for b in batches:
            out_ids, out_h = [], []
            for doc_id, text in zip(b["doc_id"], b["text"]):
                by = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
                if len(by) < RH_W:
                    by = np.pad(by, (0, RH_W - len(by)))
                win = np.lib.stride_tricks.sliding_window_view(by, RH_W)
                h = (win * powers[None, :]).sum(axis=1) % RH_P
                out_ids.append(doc_id)
                out_h.append(int(h.min()))
            yield pd.DataFrame({"doc_id": out_ids, "min_rh": out_h})

    return docs.select("doc_id", "text").mapInPandas(gen, "doc_id long, min_rh long")
