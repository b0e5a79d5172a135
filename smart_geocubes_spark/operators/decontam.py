"""Benchmark decontamination at large needle-set sizes: one
Aho-Corasick pass over the corpus.

The small-suite path (queries.q_decontaminate) bakes the needles into a
single JVM ``exists(contains)`` projection — right for the reference
contract (benchmark suites are small), but O(len(text) * |needles|)
per doc. Held-out registries at training scale carry 10^4-10^6
needles, where the multiplicative term dominates; this operator is the
swap-in SCALE.md promises: a goto/fail/output automaton built ONCE on
the driver (O(sum needle lengths)), shipped to executors in the Arrow
kernel closure, giving O(len(text)) per doc INDEPENDENT of |needles|.
The big side stays a single-pass projection — no join, no fan-out,
same plan shape as the exists(contains) form.

Semantics are exactly "any needle is a substring" (multi-pattern
substring search), so the DuckDB oracle is the same EXISTS/contains
subquery the small path uses — the automaton is an implementation
detail the gate cannot see.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def build_automaton(needles: list[str]) -> tuple[list[dict], list[int], list[bool]]:
    """(goto, fail, out): classic Aho-Corasick construction. ``out[s]``
    is True iff some needle ends at state s OR at any state on s's
    failure chain (propagated during the BFS, so matching never walks
    the chain)."""
    goto: list[dict] = [{}]
    out: list[bool] = [False]
    for nd in needles:
        if not nd:
            continue
        s = 0
        for ch in nd:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append(False)
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s] = True
    fail = [0] * len(goto)
    q: deque[int] = deque()
    for t in goto[0].values():
        q.append(t)  # depth-1 states fail to the root
    while q:
        r = q.popleft()
        out[r] = out[r] or out[fail[r]]
        for ch, u in goto[r].items():
            q.append(u)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[u] = goto[f].get(ch, 0)
    return goto, fail, out


def _contains_any(goto: list[dict], fail: list[int], out: list[bool], text: str) -> bool:
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            return True
    return False


def decontaminate_ac(corpus: DataFrame, needles: list[str]) -> DataFrame:
    """Docs containing ANY needle as a substring -> (doc_id). The
    automaton is built once here (driver) and captured by the kernel
    closure — the per-task cost is its one-time deserialization, the
    per-doc cost O(len(text)).

    Reference analog: held-out-set filtering before training-data
    export; the reference repo has no text pipeline, this extends its
    cache-fill lineage discipline to corpus hygiene (task mandate)."""
    goto, fail, out = build_automaton(sorted(set(needles)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            keep = [
                did
                for did, txt in zip(b["doc_id"], b["text"])
                if _contains_any(goto, fail, out, txt)
            ]
            yield pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64")})

    return corpus.select("doc_id", "text").mapInPandas(gen, "doc_id long")
