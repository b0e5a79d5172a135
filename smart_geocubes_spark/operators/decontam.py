"""Benchmark decontamination at large needle-set sizes: one
Aho-Corasick pass over the corpus.

The small-suite path (queries.q_decontaminate) bakes the needles into a
single JVM ``exists(contains)`` projection — right for the reference
contract (benchmark suites are small), but O(len(text) * |needles|)
per doc. Held-out registries at training scale carry 10^4-10^6
needles, where the multiplicative term dominates; this operator is the
swap-in SCALE.md promises: an automaton built ONCE on the driver
(O(sum needle lengths)), shipped to executors as a SPARK BROADCAST of
flat numpy arrays (CSR transition table — one deserialized copy per
executor, NOT a python-object closure pickled into every task), giving
O(len(text)) per doc INDEPENDENT of |needles|. The big side stays a
single-pass projection — no join, no fan-out, same plan shape as the
exists(contains) form.

Semantics are exactly "any needle is a substring" (multi-pattern
substring search), so the DuckDB oracle is the same EXISTS/contains
subquery the small path uses — the automaton is an implementation
detail the gate cannot see.
"""

from __future__ import annotations

from bisect import bisect_left
from collections import deque
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# (starts, chars, targets, fail, out): CSR goto table — state s's sorted
# outgoing edges live at [starts[s], starts[s+1]) of chars/targets —
# plus failure links and the "some needle ends here or on my failure
# chain" flag. ~24 B/state + 16 B/edge vs 100+ B/edge for dict tries.
Automaton = tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def build_automaton(needles: list[str]) -> Automaton:
    """Classic Aho-Corasick construction (dict trie + BFS failure
    links), flattened to the CSR numpy form above. ``out`` is
    propagated along failure chains during the BFS, so matching never
    walks the chain to test for a hit."""
    goto: list[dict] = [{}]
    out: list[bool] = [False]
    for nd in needles:
        if not nd:
            # contains(text, '') is TRUE in both engines, so silently
            # skipping would diverge from the EXISTS/contains oracle
            # ("flag docs containing ANY needle") — refuse loudly
            raise ValueError("build_automaton: empty needle matches every document")
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
    q: deque[int] = deque(goto[0].values())  # depth-1 states fail to root
    while q:
        r = q.popleft()
        out[r] = out[r] or out[fail[r]]
        for ch, u in goto[r].items():
            q.append(u)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[u] = goto[f].get(ch, 0)

    n = len(goto)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(g) for g in goto], out=starts[1:])
    chars = np.empty(int(starts[-1]), dtype=np.int64)
    targets = np.empty(int(starts[-1]), dtype=np.int64)
    for s, g in enumerate(goto):
        base = int(starts[s])
        for k, (cc, t) in enumerate(sorted((ord(c), t) for c, t in g.items())):
            chars[base + k] = cc
            targets[base + k] = t
    return starts, chars, targets, np.asarray(fail, dtype=np.int64), np.asarray(out, dtype=bool)


def _contains_any(auto: Automaton, text: str) -> bool:
    starts, chars, targets, fail, out = auto
    s = 0
    for ch in text:
        c = ord(ch)
        while True:
            lo, hi = int(starts[s]), int(starts[s + 1])
            j = bisect_left(chars, c, lo, hi)
            if j < hi and chars[j] == c:
                s = int(targets[j])
                break
            if s == 0:
                break
            s = int(fail[s])
        if out[s]:
            return True
    return False


def decontaminate_ac(corpus: DataFrame, needles: list[str]) -> DataFrame:
    """Docs containing ANY needle as a substring -> (doc_id). The
    automaton is built once here (driver) and shipped as a Spark
    broadcast — per-executor cost is one deserialization of five flat
    arrays; per-doc cost O(len(text)).

    Reference analog: held-out-set filtering before training-data
    export; the reference repo has no text pipeline, this extends its
    cache-fill lineage discipline to corpus hygiene (task mandate)."""
    bc = corpus.sparkSession.sparkContext.broadcast(
        build_automaton(sorted(set(needles)))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        auto = bc.value
        for b in batches:
            keep = [
                did
                for did, txt in zip(b["doc_id"], b["text"])
                if _contains_any(auto, txt)
            ]
            yield pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64")})

    return corpus.select("doc_id", "text").mapInPandas(gen, "doc_id long")
