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
  (enforced loudly — pagerank_fixed_point raises when n_nodes *
  PR_SCALE reaches 2^53, the conserved-mass bound on any single pr)
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


def _directed(pages: DataFrame, hash_col: str) -> DataFrame:
    """host_id -> (hash_col % N_HOSTS) directed links, one per page.
    Shared by both graph derivations so the projections cannot drift."""
    return pages.select(
        F.col("host_id").cast("long").alias("src"),
        (F.col(hash_col) % F.lit(N_HOSTS)).cast("long").alias("dst"),
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
        _directed(pages, "h2")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def host_link_edges_multi(pages: DataFrame) -> DataFrame:
    """Two-target link graph: each page links host_id -> h2 % N_HOSTS
    AND host_id -> h3 % N_HOSTS.

    The single-target graph is BIPARTITE by construction (the LCG's odd
    multiplier and odd increment flip parity, and mod 2^31 preserves
    it, so h2 always has the opposite parity of h1 — every link joins
    an even host to an odd one), hence triangle-free; h3 flips parity
    back, so the union mixes both parities and closes triangles. Used
    by the triangle census, which would otherwise count a structural
    zero."""
    return (
        _directed(pages, "h2")
        .union(_directed(pages, "h3"))
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
    # Exactness bound, checked loudly (repo convention: overflow never
    # silent): every pr/mass must cast to DOUBLE exactly, i.e. < 2^53.
    # Total scaled mass is conserved at <= n_nodes * PR_SCALE (teleport
    # + damped redistribution can only shrink it), so a hub's pr is
    # bounded by that product. At PR_SCALE=1e9 the guard admits ~9e6
    # nodes; for the ~1e8-host web graph lower PR_SCALE to 1e7 (the
    # fixed-point resolution still dwarfs float noise) — without this
    # check the floor(CAST(pr AS DOUBLE)) step would silently lose the
    # cross-engine bit-reproducibility the module header promises.
    n_nodes = nodes.count()
    if n_nodes * PR_SCALE >= 1 << 53:
        raise ValueError(
            f"pagerank_fixed_point: n_nodes={n_nodes} x PR_SCALE={PR_SCALE} "
            f">= 2^53 — the DOUBLE casts stop being exact and the integer "
            f"fixed point loses cross-engine determinism; lower PR_SCALE "
            f"(e.g. 1e7 admits ~9e8 nodes)"
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


def _degree_oriented(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical a<b edges along the (deg, id) total order:
    two hash equi-joins against the degree table, then a projection.
    Struct comparison is lexicographic, and (deg,a)==(deg,b) is
    impossible since a != b."""
    lt = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    return (
        und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
    )


def triangle_stats(edges: DataFrame, orientation: str = "degree") -> DataFrame:
    """Global triangle census of the undirected host graph: one row
    (n_nodes, n_edges, n_wedges, n_triangles).

    Compact-forward counting: symmetrize to canonical a < b edges,
    orient each edge along a TOTAL ORDER on vertices, enumerate length-2
    out-wedges at each source, and close them against the canonical edge
    set — each triangle counted exactly once (exactly one of its three
    vertices has both out-edges under any total order), no post-hoc /6.
    All joins are hash equi-joins.

    ``orientation='degree'`` (default, the production shape) orders
    vertices by (deg, id): every out-wedge lives at its triangle's
    LOWEST-degree vertex, which caps wedge enumeration at O(E^1.5)
    total regardless of degree skew [Chiba–Nishizeki] — on a power-law
    web graph, id-orientation can strand a hub with millions of
    id-forward neighbors and quadratic wedge fan-out at that one
    vertex.  Costs one extra degree join (broadcast-sized relative to
    the wedge set).  ``orientation='id'`` keeps the plain a < b
    orientation (kept for the skew-fixture equivalence pytest; the
    count is orientation-invariant).

    n_wedges = sum(deg*(deg-1) DIV 2) stays exact in BIGINT
    (consecutive integers: the product is even).
    """
    if orientation not in ("degree", "id"):
        raise ValueError(f"triangle_stats: unknown orientation {orientation!r}")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds degrees + three join legs
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    node_stats = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).cast("long").alias("n_wedges"),
    )
    if orientation == "degree":
        # the orientation joins run inside this eager checkpoint's job
        # (oriented feeds both wedge legs), so they never appear in the
        # returned plan — tests/test_plan_quality.py audits
        # _degree_oriented's plan directly
        oriented = _degree_oriented(und, deg).localCheckpoint(eager=True)
    else:
        oriented = und.select(F.col("a").alias("u"), F.col("b").alias("w"))
    # out-wedge at u: unordered neighbor pair {p, q} deduped by id p < q;
    # the closing edge (p, q) with p < q is exactly und's canonical form
    w1 = oriented.select("u", F.col("w").alias("p"))
    w2 = oriented.select("u", F.col("w").alias("q"))
    e3 = und.select(F.col("a").alias("p3"), F.col("b").alias("q3"))
    tri = (
        w1.join(w2, "u")
        .filter(F.col("p") < F.col("q"))
        .join(e3, (F.col("p") == F.col("p3")) & (F.col("q") == F.col("q3")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    n_edges = und.agg(F.count("*").cast("long").alias("n_edges"))
    return (
        node_stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


def hits_fixed_point(edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """``n_iter`` UNNORMALIZED HITS rounds (Kleinberg hubs/authorities)
    in pure BIGINT.

    h0 = 1 for every node; a round is ``auth = A^T hub`` then
    ``hub = A auth`` — exact integer sums, order-independent across
    shuffles, so the result is bit-reproducible and the DuckDB oracle
    replays it with unrolled CTEs. The per-round 1/||.|| normalization
    of textbook HITS is a positive scalar: it never changes the
    RANKING, so it is omitted and the scores stay integers. Growth is
    bounded by n_nodes^(2*n_iter) per score; Spark 4 ANSI mode makes a
    BIGINT overflow LOUD (raise), never silent — at web scale run few
    rounds or rescale between rounds.

    Plan shape: identical to pagerank_fixed_point — one hash join +
    one aggregation per half-round over the checkpointed edge set
    (Pregel-as-joins), rounds unrolled, no driver loop."""
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("host_id"))
        .union(edges.select(F.col("dst").alias("host_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("hub", F.lit(1).cast("long"))
    auth = None
    for i in range(n_iter):
        a = (
            edges.join(hub, edges["src"] == hub["host_id"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("s"))
        )
        auth = nodes.join(a, nodes["host_id"] == a["node"], "left").select(
            "host_id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("auth")
        )
        if i == n_iter - 1:
            # the last auth feeds TWO consumers (the final hub half-round
            # AND the returned join) — without this checkpoint the whole
            # auth chain subtree is duplicated in the final plan
            auth = auth.localCheckpoint(eager=True)
        h = (
            edges.join(auth, edges["dst"] == auth["host_id"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("s"))
        )
        hub = nodes.join(h, nodes["host_id"] == h["node"], "left").select(
            "host_id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("hub")
        )
    return hub.join(auth, "host_id").select("host_id", "hub", "auth")


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    edges_checkpointed: bool = False,
) -> DataFrame:
    """Unrolled multi-source BFS: min forward-hop distance from the
    seed set within ``n_rounds`` hops (unreached nodes absent).

    Round k is ``dist := min(dist, min over edges u->v of dist(u)+1)``
    — a hash join + a combining min-aggregate per round over the
    checkpointed edge set, the same Pregel-as-joins shape as
    pagerank_fixed_point/hits_fixed_point. Distances are small BIGINTs;
    min is order-independent, so the result is bit-reproducible and the
    DuckDB oracle replays it with unrolled CTEs. At web scale the
    frontier frame stays node-sized and every join is an equi-join on
    host_id — no broadcast assumption on the node side.

    Each round references the previous distance frame TWICE (the
    carry-forward union arm and the join arm), so without a per-round
    checkpoint the plan subtree DOUBLES per round — exponential plan
    size in n_rounds (observed: 62 aggregate nodes at 3 rounds).
    Checkpoint-per-round is the same discipline dedup's
    connected-components loop uses for exactly this shape.

    ``edges_checkpointed=True`` is the caller's contract that the edge
    frame is ALREADY eagerly checkpointed (e.g. because the caller also
    derived the seed set from it) — skipping the internal checkpoint
    avoids materializing a second copy of an edge-scale frame."""
    if not edges_checkpointed:
        edges = edges.localCheckpoint(eager=True)
    dist = seeds.select(F.col("host_id").cast("long"), F.lit(0).cast("long").alias("dist"))
    for _ in range(n_rounds):
        dist = dist.localCheckpoint(eager=True)  # 2 consumers below
        step = edges.join(dist, edges["src"] == dist["host_id"]).select(
            F.col("dst").alias("host_id"), (F.col("dist") + F.lit(1)).alias("dist")
        )
        dist = (
            dist.unionByName(step)
            .groupBy("host_id")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist


def label_propagation(edges: DataFrame, n_rounds: int = 2) -> DataFrame:
    """``n_rounds`` of synchronous label propagation (community
    detection) with DETERMINISTIC tie-breaking: every node starts as
    its own label; each round a node adopts the most frequent label
    among its UNDIRECTED neighbors, ties broken by the SMALLEST label
    (then keeps its current label only if it has no neighbors). The
    min-tie rule makes the fixed number of rounds bit-reproducible
    under any partitioning — the property the textbook random-tie LPA
    lacks and the reason the DuckDB oracle can replay it exactly.

    Plan shape per round: one hash join (edges x labels) + one count
    aggregate + one min-over-max-count selection (window-free: two
    aggregates) — Pregel-as-joins like the rest of the family. The
    label frame feeds the next round once (chain, not union-with-self),
    so one checkpoint per round bounds plan growth linearly."""
    # loud domain guard (module convention, like pagerank's 2^53 bound):
    # the packed-min encoding needs every id/label in [0, 2^31) — a raw
    # 64-bit hash id would silently collide across (count, label) pairs
    # and merge unrelated communities.  IN-PLAN (ANSI raise_error inside
    # the undirected projection, evaluated during the checkpoint job)
    # rather than a driver-side pre-aggregation: the guard costs zero
    # extra jobs.  Checking src alone covers every endpoint because the
    # union mirrors each edge, so each dst also appears as a src.
    guard = (
        "CASE WHEN src < 0 OR src >= 2147483648 THEN raise_error(concat("
        "'label_propagation: node id ', CAST(src AS STRING), "
        "' outside [0, 2^31) — packed-min tie-break needs reduced ids')) "
        "ELSE CAST(src AS BIGINT) END"
    )
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .select(F.expr(guard).alias("src"), F.col("dst").cast("long").alias("dst"))
        .localCheckpoint(eager=True)
    )
    # nodes feeds exactly one consumer (the identity labels, themselves
    # checkpointed each round) — no checkpoint needed here
    nodes = und.select(F.col("src").alias("host_id")).distinct()
    labels = nodes.withColumn("label", F.col("host_id"))
    for _ in range(n_rounds):
        labels = labels.localCheckpoint(eager=True)  # joined + carried
        neigh = (
            und.join(labels, und["dst"] == labels["host_id"])
            .groupBy(F.col("src").alias("node"), F.col("label"))
            .agg(F.count("*").alias("c"))
        )
        # most frequent label, ties -> smallest label: one aggregate
        # over (c desc, label asc) encoded as a single packed min
        # (c <= n_nodes < 2^31, label < 2^31: pack exactly in BIGINT)
        best = (
            neigh.groupBy("node")
            .agg(
                F.min(
                    (-F.col("c").cast("long") * F.lit(1 << 31)) + F.col("label").cast("long")
                ).alias("packed")
            )
            .select(
                F.col("node").alias("host_id"),
                ((F.col("packed") % F.lit(1 << 31) + F.lit(1 << 31)) % F.lit(1 << 31))
                .cast("long")
                .alias("new_label"),
            )
        )
        labels = labels.join(best, "host_id", "left").select(
            "host_id",
            F.coalesce(F.col("new_label"), F.col("label")).cast("long").alias("label"),
        )
    return labels
