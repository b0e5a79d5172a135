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

The automaton operates on UTF-8 BYTES (alphabet 256): a byte-level
substring match is exactly a character-level substring match because
UTF-8 is self-synchronizing. On executors the CSR form is compiled
once per process into a dense DFA (state x 256 -> state, failure
links resolved away) held as a flat ``array('i')`` so the scan loop is
two C-speed index ops per byte — ~10x over the previous per-byte
bisect over numpy scalars. States above ``_DENSE_MAX_STATES``
(~32 MB table) fall back to the CSR walk with locals bound.

Crossover note (measured shapes, not magic): the JVM
``exists(contains)`` projection runs at memchr speed per needle, so it
wins below roughly 10^2-10^3 needles; the automaton's per-byte cost is
flat in |needles|, so it wins when the needle registry is large — the
regime this operator exists for. Callers with small suites should use
``queries.q_decontaminate``.

Semantics are exactly "any needle is a substring" (multi-pattern
substring search), so the DuckDB oracle is the same EXISTS/contains
subquery the small path uses — the automaton is an implementation
detail the gate cannot see.
"""

from __future__ import annotations

from array import array
from bisect import bisect_left
from collections import deque
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# (starts, bytes_, targets, fail, out): CSR goto table — state s's sorted
# outgoing edges live at [starts[s], starts[s+1]) of bytes_/targets —
# plus failure links and the "some needle ends here or on my failure
# chain" flag. ~24 B/state + 16 B/edge vs 100+ B/edge for dict tries.
Automaton = tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]

#: dense-DFA compile cap: 32768 states x 256 x 4 B = 32 MB per executor
_DENSE_MAX_STATES = 1 << 15


def build_automaton(needles: list[str]) -> Automaton:
    """Classic Aho-Corasick construction (dict trie over UTF-8 bytes +
    BFS failure links), flattened to the CSR numpy form above. ``out``
    is propagated along failure chains during the BFS, so matching
    never walks the chain to test for a hit."""
    goto: list[dict] = [{}]
    out: list[bool] = [False]
    for nd in needles:
        if not nd:
            # contains(text, '') is TRUE in both engines, so silently
            # skipping would diverge from the EXISTS/contains oracle
            # ("flag docs containing ANY needle") — refuse loudly
            raise ValueError("build_automaton: empty needle matches every document")
        s = 0
        for ch in nd.encode("utf-8"):
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
    bytes_ = np.empty(int(starts[-1]), dtype=np.int64)
    targets = np.empty(int(starts[-1]), dtype=np.int64)
    for s, g in enumerate(goto):
        base = int(starts[s])
        for k, (cc, t) in enumerate(sorted(g.items())):
            bytes_[base + k] = cc
            targets[base + k] = t
    return starts, bytes_, targets, np.asarray(fail, dtype=np.int64), np.asarray(out, dtype=bool)


def to_dense(auto: Automaton) -> tuple[array, array] | None:
    """Compile the CSR automaton into a dense DFA: ``delta[s*256+b]``
    is the next state (failure links resolved away, standard AC->DFA
    BFS), ``outa[s]`` is the match flag. Flat stdlib ``array``s index
    at C speed from the Python scan loop — numpy scalar indexing costs
    ~10x more per access. Returns None above the memory cap."""
    starts, bytes_, targets, fail, out = auto
    n = len(fail)
    if n > _DENSE_MAX_STATES:
        return None
    delta = np.zeros((n, 256), dtype=np.int32)
    # root row: its explicit edges, everything else stays 0 (root)
    lo, hi = int(starts[0]), int(starts[1])
    delta[0, bytes_[lo:hi]] = targets[lo:hi]
    order: deque[int] = deque(int(t) for t in targets[lo:hi])
    while order:
        s = order.popleft()
        delta[s] = delta[int(fail[s])]  # inherit the failure row...
        lo, hi = int(starts[s]), int(starts[s + 1])
        delta[s, bytes_[lo:hi]] = targets[lo:hi]  # ...own edges override
        order.extend(int(t) for t in targets[lo:hi])
    # frombytes, never tolist(): at the state cap tolist() would box
    # ~8.4M transient Python ints (~300 MB) per worker process just to
    # feed a 32 MB array
    da = array("i")
    da.frombytes(delta.astype("<i4").tobytes())
    oa = array("b")
    oa.frombytes(out.astype(np.int8).tobytes())
    return da, oa


def _scan_dense(delta: array, outa: array, data: bytes) -> bool:
    """Per-byte dense-DFA walk; delta/outa/s bound to locals, two
    C-level index ops per byte."""
    s = 0
    for b in data:
        s = delta[(s << 8) | b]
        if outa[s]:
            return True
    return False


def _scan_csr(
    starts_l: list, bytes_l: list, targets_l: list, fail_l: list, out_l: list, data: bytes
) -> bool:
    """CSR fallback walk (automatons too large for the dense compile):
    binary-search the sorted edge list per byte. Everything is plain
    Python lists bound to locals — numpy scalar reads from an
    interpreted loop were the dominant cost of the previous version."""
    s = 0
    for c in data:
        while True:
            lo, hi = starts_l[s], starts_l[s + 1]
            j = bisect_left(bytes_l, c, lo, hi)
            if j < hi and bytes_l[j] == c:
                s = targets_l[j]
                break
            if s == 0:
                break
            s = fail_l[s]
        if out_l[s]:
            return True
    return False


def _csr_lists(auto: Automaton) -> tuple[list, list, list, list, list]:
    starts, bytes_np, targets_np, fail_np, out_np = auto
    return (
        starts.tolist(), bytes_np.tolist(), targets_np.tolist(),
        fail_np.tolist(), out_np.tolist(),
    )


def _contains_any(auto: Automaton, text: str) -> bool:
    """One-shot convenience (tests / driver-side checks): CSR walk over
    ``text``. Hot paths precompute the list form once via _csr_lists or
    the dense DFA — see _scanner_for."""
    return _scan_csr(*_csr_lists(auto), text.encode("utf-8"))


# per-process cache of compiled scan closures, keyed by broadcast id —
# the dense compile runs once per executor, not once per task
_SCAN_CACHE: dict[int, object] = {}


def _scanner_for(bc) -> object:
    auto = bc.value
    # Spark caches the deserialized broadcast VALUE per worker process,
    # so its object identity keys the compile (the Broadcast wrapper is
    # rebuilt per task and exposes no id on executors). The cache entry
    # PINS the value: holding a strong reference guarantees CPython
    # never reuses that id for a different automaton, and the `is`
    # check guards the key anyway.
    key = id(auto)
    entry = _SCAN_CACHE.get(key)
    if entry is not None and entry[0] is auto:
        return entry[1]
    dense = to_dense(auto)
    if dense is not None:
        delta, outa = dense
        fn = lambda txt: _scan_dense(delta, outa, txt.encode("utf-8"))  # noqa: E731
    else:
        # CSR fallback: pre-convert to python lists ONCE per process
        lists = _csr_lists(auto)
        fn = lambda txt: _scan_csr(*lists, txt.encode("utf-8"))  # noqa: E731
    if len(_SCAN_CACHE) >= 8:  # bound per-process memory across jobs
        _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
    _SCAN_CACHE[key] = (auto, fn)
    return fn


def decontaminate_ac(corpus: DataFrame, needles: list[str]) -> DataFrame:
    """Docs containing ANY needle as a substring -> (doc_id). The
    automaton is built once here (driver) and shipped as a Spark
    broadcast — per-executor cost is one deserialization of five flat
    arrays + one dense-DFA compile; per-doc cost O(len(text)).

    Reference analog: held-out-set filtering before training-data
    export; the reference repo has no text pipeline, this extends its
    cache-fill lineage discipline to corpus hygiene (task mandate)."""
    bc = corpus.sparkSession.sparkContext.broadcast(
        build_automaton(sorted(set(needles)))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hit = _scanner_for(bc)
        for b in batches:
            keep = [did for did, txt in zip(b["doc_id"], b["text"]) if hit(txt)]
            yield pd.DataFrame({"doc_id": pd.Series(keep, dtype="int64")})

    return corpus.select("doc_id", "text").mapInPandas(gen, "doc_id long")
