"""Distributed graph analytics over edge DataFrames (node pairs) —
the KG-adjacent metrics a pipeline wants once a graph exists:
triangle counting (community density / quality signal) and PageRank
(entity importance).

Scale stances:
  * Triangle counting uses DEGREE ORIENTATION (each undirected edge
    is directed from its lower-degree endpoint, ties by node id) —
    the classic bound that caps the wedge join's fan-out at
    O(sqrt(m)) per node, so one hub with 10^6 neighbors contributes
    ~0 wedges instead of 10^12.
  * PageRank runs a FIXED number of power iterations in integer
    micro-units (floor division) — integer sums are order-independent
    across engines and parallelism, so ranks are bit-identical
    anywhere, and the unrolled-join plan stays Catalyst-optimizable
    (no RDD loop).  Dangling-node mass is dropped (the standard
    "dangling ranks leak" variant), identically on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # rank micro-units: 1.0 == 10^12
HITS_SCALE = 1_000_000  # HITS micro-units: L1 norm == 10^6

# the iterative-op discipline (pagerank round-4 fix, extended to hits/
# kcore in round 5 and shared with the LSH pair miners in round 6):
# see ops/lineage.py for the full rationale
from octofludb_spark.ops.lineage import truncate_lineage as _truncate_lineage  # noqa: E402,E501


def undirect(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set from (src, dst): distinct pairs
    with src < dst, self-loops dropped."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    return e


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over the undirected graph:
    (node, n_triangles).  Degree-oriented wedge join: edges point
    low-degree -> high-degree (ties by id), wedges (u->v, u->w) close
    iff (v->w) is an oriented edge — each triangle is found exactly
    once, from its lowest-degree corner."""
    # und feeds THREE consumers (degree calc, orientation, closure
    # semi-join) and oriented feeds two — persist alone bounds
    # execution but every consumer still re-embeds the full upstream
    # LOGICAL plan (extract -> canonicalize -> ...), so Catalyst
    # re-analyzes it once per reference: truncate the lineage at the
    # canonical edge set, exactly the pagerank/kcore/hits discipline
    # (kg_triangles sat at 620 Exchange nodes in the r5 plan audit).
    und = _truncate_lineage(undirect(edges))
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    # orient: (a,b) -> src = the endpoint with (smaller degree, id)
    oriented_base = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))),
                   F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))),
                   F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    oriented = oriented_base.persist()
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    # the closing edge between v and w may be oriented either way, but
    # wedges already have v < w and `und` is canonical (a < b), so the
    # closure check is a pure EQUI semi-join on the undirected set —
    # an OR-of-orientations condition here would plan a nested loop.
    closer = und.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = wedges.join(closer, ["v", "w"], "left_semi")
    nodes = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    out = (
        nodes.groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
        .persist()
    )
    try:
        out.count()  # materialize while the intermediates are cached
        return out
    finally:
        oriented.unpersist()
        und.unpersist()


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """HITS hubs-and-authorities in integer micro-units:
    (node, hub_micro, auth_micro) after ``iters`` mutual-
    reinforcement rounds, each L1-normalized to HITS_SCALE with
    BIGINT floor division — bit-identical on any engine at any
    parallelism, so the whole trajectory is value-hash oracleable
    (float HITS could never be).

    Normalization uses a broadcast one-row aggregate (crossJoin), so
    the plan stays lazy and fully unrolled for Catalyst; scores
    bounded by HITS_SCALE keep products within BIGINT for graphs up
    to ~9e6 nodes (swap to DECIMAL(38,0) beyond).  Nodes without
    in-edges (out-edges) hold authority (hub) 0."""
    # truncate at the edge table (round-4 pagerank discipline): the
    # caller's lineage (extraction -> canonicalize -> join) would be
    # re-embedded ~4x per round otherwise — 7,372 Exchange nodes in
    # the round-4 plan audit
    e = _truncate_lineage(
        edges.select("src", "dst").where(
            F.col("src") != F.col("dst")).distinct())
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    if nodes.isEmpty():
        nodes.unpersist()
        e.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, hub_micro long, auth_micro long")

    cached = []

    def _norm(x: DataFrame, col: str) -> DataFrame:
        # The L1 norm is ONE scalar: take it driver-side (a bounded
        # O(1) action, same contract as bm25's N/avgdl) and fold it
        # into the projection as a literal.  A crossJoin(broadcast(
        # agg)) variant keeps the plan lazy but nests a broadcast
        # exchange per round — measured 2x slower and heap-hungry by
        # iteration 3.  x is materialized anyway for the sum, so cut
        # the round's lineage here too — round k+1's plan then builds
        # on a flat table instead of k nested rounds.
        x = _truncate_lineage(x)
        cached.append(x)
        s = int(x.agg(F.greatest(F.sum(col), F.lit(1))).first()[0])
        return x.select(
            "node",
            F.expr(f"CAST(({col} * {HITS_SCALE}) DIV {s} AS BIGINT)")
            .alias(col),
        )

    h = nodes.select("node", F.lit(HITS_SCALE).cast("long").alias("h"))
    a = None
    for _ in range(iters):
        a_raw = (
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        a = _norm(
            nodes.join(a_raw, "node", "left")
            .select("node", F.coalesce("a", F.lit(0)).cast("long")
                    .alias("a")),
            "a",
        )
        h_raw = (
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        h = _norm(
            nodes.join(h_raw, "node", "left")
            .select("node", F.coalesce("h", F.lit(0)).cast("long")
                    .alias("h")),
            "h",
        )
    out = (
        h.join(a, "node", "outer")
        .select("node",
                F.coalesce("h", F.lit(0)).cast("long").alias("hub_micro"),
                F.coalesce("a", F.lit(0)).cast("long").alias("auth_micro"))
        .persist()
    )
    try:
        out.count()
        return out
    finally:
        for c in cached:
            c.unpersist()
        nodes.unpersist()
        e.unpersist()


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node:
    cc = triangles / (d * (d - 1) / 2) over the undirected graph —
    the community-density signal for entity-quality filtering.
    (node, degree, n_triangles, cc_micro) with cc in integer
    micro-units (floor), value-hash stable; nodes with degree < 2
    have cc_micro = 0.

    Cost: the triangle count (degree-oriented wedge join) plus one
    degree agg and a broadcast-sized join of the two node-keyed
    aggregates."""
    # truncate at the canonical edge set (r5 verdict #1: this was the
    # registry's largest plan at 2,772 Exchange nodes — the wedge join
    # and degree agg each re-embedded the deep extract->canonicalize
    # upstream once per reference; persist alone cannot stop that)
    und = _truncate_lineage(undirect(edges))
    try:
        deg = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count("*").cast("long").alias("degree"))
        )
        tri = triangle_counts(und.select(F.col("a").alias("src"),
                                         F.col("b").alias("dst")))
        out = (
            deg.join(tri, "node", "left")
            .select(
                "node", "degree",
                F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
                .alias("n_triangles"),
                F.when(
                    F.col("degree") >= 2,
                    F.expr("CAST(coalesce(n_triangles, 0) * 2000000 "
                           "DIV (degree * (degree - 1)) AS BIGINT)"),
                ).otherwise(F.lit(0)).cast("long").alias("cc_micro"),
            )
            .persist()
        )
        out.count()
        return out
    finally:
        und.unpersist()


def pagerank(edges: DataFrame, iters: int = 5,
             damping_num: int = 85, damping_den: int = 100) -> DataFrame:
    """(node, rank_micro): PageRank after ``iters`` power iterations
    in integer micro-units (PR_SCALE == rank 1.0).  All arithmetic is
    BIGINT floor division/multiplication — bit-identical on any
    engine at any parallelism.  The plan is ``iters`` unrolled
    join+agg rounds (Catalyst sees the whole thing; no driver loop
    state), each one shuffle on dst."""
    # e is scanned once per iteration (and once for nodes/outdeg), and
    # the unrolled plan repeats its LINEAGE once per reference even
    # when the data is cached — with a deep upstream (extraction ->
    # canonicalize -> join) Catalyst re-analyzes thousands of nodes
    # and planning time dominates the tiny per-round jobs.  Truncate
    # the lineage at the edge table: checkpoint() when a reliable
    # checkpoint dir is configured (survives executor loss on a
    # cluster), else localCheckpoint() (executor-local; right for
    # local mode and measured 3x end-to-end on a deep-lineage caller).
    e = _truncate_lineage(
        edges.select("src", "dst").where(
            F.col("src") != F.col("dst")).distinct())
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        e.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank_micro long")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    init = PR_SCALE // n
    base = (PR_SCALE * (damping_den - damping_num) // damping_den) // n
    ranks = nodes.select("node", F.lit(init).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                # exact integral steps (DIV, not '/': double division
                # would round-to-nearest and truncate differently
                # across engines)
                F.expr(f"(r * {damping_num}) DIV {damping_den}")
                .alias("rs"),
                F.col("od"),
            )
            .select("node",
                    F.expr("rs DIV od").cast("long").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_r"), F.lit(0)))
                .cast("long").alias("r"),
            )
        )
    out = ranks.select("node", F.col("r").alias("rank_micro")).persist()
    try:
        out.count()  # materialize while e/nodes are cached
        return out
    finally:
        nodes.unpersist()
        e.unpersist()


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, public) made fully deterministic: every node starts
    labeled with itself; each round, a node adopts the most frequent
    label among its undirected neighbors, ties broken by MIN label —
    so the whole trajectory is engine- and parallelism-independent
    and value-hash oracleable (classic async LPA is run-order
    dependent and never would be).  Returns (node, community) after
    ``iters`` rounds; isolated input rows (self-loops only) are
    absent, matching the other graph ops.

    Scale shape: one shuffle per round — join neighbor labels, count
    per (node, label), argmax via a row_number window on the counts
    (label-cardinality rows, not edge rows).  The per-round label
    table is persisted so round k+1 scans a materialized table
    instead of re-deriving k rounds of lineage; fixed unrolled rounds
    keep the plan Catalyst-optimizable (no RDD loop)."""
    from pyspark.sql import Window

    # truncate at the symmetric edge list: each LPA round's counts
    # join re-embeds sym's lineage, so a deep upstream is re-analyzed
    # once per round otherwise (same discipline as pagerank/kcore)
    und = undirect(edges)
    sym = _truncate_lineage(und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .select("node", F.col("node").alias("community"))
    )
    cached = [sym]
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("community").asc())
    try:
        for _ in range(iters):
            counts = (
                sym.join(labels.withColumnRenamed("node", "b"), "b")
                .groupBy(F.col("a").alias("node"), "community")
                .agg(F.count("*").alias("cnt"))
            )
            labels = (
                counts.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "community")
                .persist()
            )
            cached.append(labels)
        out = labels.select("node", "community").persist()
        out.count()  # materialize while the round tables are cached
        return out
    finally:
        for c in cached:
            c.unpersist()


def kcore(edges: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """Bounded-round k-core peeling over the undirected graph: each
    round removes every node whose current degree is < ``k`` (and its
    edges), ``rounds`` times.  At fixpoint this is exactly the k-core
    subgraph; a fixed round count keeps the plan fully unrolled for
    Catalyst and the trajectory bit-identical on every engine — both
    engines peel the same rounds, so the result is value-hash
    oracleable even before convergence.  Returns (node, degree) for
    surviving nodes with their degree in the peeled subgraph.

    Scale shape: per round one degree aggregation (map-side partial)
    + two semi-joins of the edge set against the surviving-node set —
    the classic distributed peel; the edge set only shrinks, and each
    round's lineage is CUT (checkpoint, not just persist): a round
    references the previous edge set three times (degree + two
    semi-joins), so the un-truncated plan grew ~3^rounds references
    and hit 11,554 Exchange nodes in the round-4 plan audit."""
    cur = _truncate_lineage(undirect(edges))
    cached = [cur]
    try:
        for _ in range(rounds):
            deg = (
                cur.select(F.col("a").alias("node"))
                .unionByName(cur.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").alias("d"))
            )
            keep = deg.where(F.col("d") >= k).select("node")
            cur = _truncate_lineage(
                cur.join(keep.withColumnRenamed("node", "a"), "a",
                         "left_semi")
                .join(keep.withColumnRenamed("node", "b"), "b",
                      "left_semi")
            )
            cached.append(cur)
        out = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count("*").cast("long").alias("degree"))
            .persist()
        )
        out.count()
        return out
    finally:
        for c in cached:
            c.unpersist()


def bfs_distances(edges: DataFrame, sources: DataFrame,
                  max_hops: int = 3) -> DataFrame:
    """Multi-source breadth-first distances over the undirected
    graph: (node, dist) for every node within ``max_hops`` of any
    source node (dist = hops to the NEAREST source; sources are
    dist 0).  Bounded rounds keep the plan unrolled for Catalyst and
    the trajectory engine-identical, so the full distance table is
    value-hash oracleable.

    Scale shape: classic frontier BFS — per round one equi-join of
    the symmetric edge list against the (shrinking) frontier, a
    distinct, and an anti-join against the visited set; each round is
    persisted so round d+1 scans materialized frontiers.  The visited
    set grows to the reachable ball only, never the full corpus,
    and all joins are keyed shuffles (broadcastable when the frontier
    is small — AQE decides)."""
    # truncate at the symmetric edge list: every BFS round joins sym
    # and re-embeds its lineage (624 Exchange nodes in the r5 plan
    # audit with the deep extract->canonicalize upstream)
    und = undirect(edges)
    sym = _truncate_lineage(und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))))
    visited = (
        sources.select(F.col(sources.columns[0]).alias("node")).distinct()
        .join(sym.select(F.col("a").alias("node")).distinct(), "node",
              "left_semi")  # sources outside the graph contribute nothing
        .select("node", F.lit(0).cast("long").alias("dist"))
        .persist()
    )
    frontier = visited.select("node")
    cached = [sym, visited]
    try:
        for d in range(1, max_hops + 1):
            nxt = (
                sym.join(frontier.withColumnRenamed("node", "a"), "a")
                .select(F.col("b").alias("node")).distinct()
                .join(visited, "node", "left_anti")
                .select("node", F.lit(d).cast("long").alias("dist"))
                .persist()
            )
            cached.append(nxt)
            visited = visited.unionByName(nxt).persist()
            cached.append(visited)
            frontier = nxt.select("node")
        out = visited.persist()
        out.count()
        return out
    finally:
        for c in cached:
            c.unpersist()


def node_similarity(edges: DataFrame, min_common: int = 1,
                    max_center_degree: int | None = 100_000) -> DataFrame:
    """Common-neighbor / Jaccard node-pair similarity (the classic
    link-prediction scores) over the undirected graph: (a, b, common,
    deg_a, deg_b, jaccard_micro) for unordered pairs a < b with at
    least ``min_common`` common neighbors.  jaccard_micro =
    common * 10^6 // (deg_a + deg_b - common) — integer micro-units so
    the value is bit-identical across engines and parallelism.

    Scale shape: pairs are generated from each shared neighbor as the
    WEDGE CENTER — a center of degree d contributes d*(d-1)/2 pair
    rows, so hub nodes are the quadratic hazard (degree orientation
    cannot help here: unlike triangles, every wedge IS an output
    contributor).  ``max_center_degree`` excludes centers above the
    cap BEFORE the self-join, applied and LOGGED (never silent) —
    the standard mitigation (a hub shared by two nodes says little
    about their similarity, cf. stopword df-capping in text dedup).
    Within the cap the plan is two keyed exchanges: the wedge
    self-join on center, and the pair hash-agg."""
    import logging

    log = logging.getLogger(__name__)
    # truncate, not just persist: und feeds nbr (twice), deg, and the
    # wedge self-join — four lineage re-embeddings of the upstream
    und = _truncate_lineage(undirect(edges))
    nbr = (
        und.select(F.col("a").alias("ctr"), F.col("b").alias("nb"))
        .unionByName(und.select(F.col("b").alias("ctr"),
                                F.col("a").alias("nb")))
    )
    deg = nbr.groupBy("ctr").agg(F.count("*").alias("d"))
    if max_center_degree is not None:
        hubs = deg.where(F.col("d") > max_center_degree).persist()
        n_hubs = hubs.count()
        if n_hubs:
            log.warning(
                "node_similarity: excluding %d wedge centers with degree"
                " > %d", n_hubs, max_center_degree)
            nbr = nbr.join(hubs.select("ctr"), "ctr", "left_anti")
        else:
            hubs.unpersist()
    v = nbr.select("ctr", F.col("nb").alias("a"))
    w = nbr.select("ctr", F.col("nb").alias("b"))
    common = (
        v.join(w, "ctr").where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common"))
        .where(F.col("common") >= min_common)
    )
    da = deg.select(F.col("ctr").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("ctr").alias("b"), F.col("d").alias("deg_b"))
    out = (
        common.join(da, "a").join(db, "b")
        .select(
            "a", "b", "common",
            F.col("deg_a").cast("long").alias("deg_a"),
            F.col("deg_b").cast("long").alias("deg_b"),
            # `div` is Spark's INTEGER division — float `/` + cast can
            # land one off DuckDB's `//` when the quotient is exact
            F.expr("common * 1000000L div (deg_a + deg_b - common)")
            .cast("long").alias("jaccard_micro"),
        )
    )
    return out


def modularity(edges: DataFrame, communities: DataFrame) -> DataFrame:
    """Per-community Newman modularity contributions over the
    undirected graph (Newman & Girvan 2004): for community c with
    e_c intra-community edges and d_c total degree,

        Q = sum_c ( e_c / m  -  (d_c / 2m)^2 )
          = sum_c ( 4*m*e_c - d_c^2 ) / (4 m^2)

    The per-community NUMERATOR (4*m*e_c - d_c^2) is emitted as an
    exact BIGINT next to m, so Q itself is a single exact rational —
    no float ever enters the aggregation and the full breakdown is
    value-hash oracleable.  ``communities`` is (node, community), e.g.
    label_propagation output.

    Scale shape: the undirected edge set is the only data-sized
    input; the community map joins it twice (community tables are
    node-sized — at KG scale these joins shuffle on node id like
    every other per-node metric here), then two community-sized
    aggregates.  m comes from a one-row aggregate (driver scalar,
    like the other ops' bounded collects).

    Output: (community, n_nodes, intra_edges, degree_sum, q_num, m)."""
    # truncate at the canonical edge set (it feeds m, deg and the
    # community joins; 179 Exchange nodes in the r5 plan audit came
    # from re-embedding the upstream per reference)
    und = _truncate_lineage(undirect(edges))
    try:
        m = und.count()
        sym = und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        deg = sym.groupBy(F.col("a").alias("node")).agg(
            F.count("*").alias("d"))
        ca = communities.select(F.col("node").alias("a"),
                                F.col("community").alias("comm_a"))
        cb = communities.select(F.col("node").alias("b"),
                                F.col("community").alias("comm_b"))
        intra = (
            und.join(ca, "a").join(cb, "b")
            .where(F.col("comm_a") == F.col("comm_b"))
            .groupBy(F.col("comm_a").alias("community"))
            .agg(F.count("*").cast("long").alias("intra_edges"))
        )
        dsum = (
            deg.join(communities, "node")
            .groupBy("community")
            .agg(F.count("*").cast("long").alias("n_nodes"),
                 F.sum("d").cast("long").alias("degree_sum"))
        )
        out = (
            dsum.join(intra, "community", "left")
            .select(
                "community",
                "n_nodes",
                F.coalesce("intra_edges", F.lit(0)).cast("long")
                .alias("intra_edges"),
                "degree_sum",
                (F.lit(4 * m) * F.coalesce("intra_edges", F.lit(0))
                 - F.col("degree_sum") * F.col("degree_sum"))
                .cast("long").alias("q_num"),
                F.lit(m).cast("long").alias("m"),
            )
        )
        out = out.persist()
        out.count()
        return out
    finally:
        und.unpersist()


def personalized_pagerank(edges: DataFrame, sources: DataFrame,
                          iters: int = 5, damping_num: int = 85,
                          damping_den: int = 100) -> DataFrame:
    """Personalized PageRank: identical integer power iterations to
    ``pagerank`` except ALL teleport mass (the 1-d share) lands on
    the ``sources`` node set — rank becomes importance RELATIVE to
    the seeds (Haveliwala 2002), the metric behind related-entity
    ranking from a query set.  ``sources`` is a one-column (node)
    DataFrame; rows absent from the graph are ignored.

    Determinism/scale: same exact-BIGINT floor steps, same unrolled
    join+agg plan (one shuffle on dst per round), plus one semi-join
    to flag the seed set (broadcast when small — the common case)."""
    # truncate at the edge table like plain pagerank: the unrolled
    # rounds re-embedded the deep upstream once per reference (505
    # Exchange nodes in the r5 plan audit)
    e = _truncate_lineage(
        edges.select("src", "dst").where(
            F.col("src") != F.col("dst")).distinct())
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    seeds = nodes.join(sources.select("node").distinct(), "node",
                       "semi").persist()
    ns = seeds.count()
    if ns == 0:
        for c in (seeds, nodes, e):
            c.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank_micro long")
    flagged = nodes.join(seeds.withColumn("_s", F.lit(1)), "node", "left")
    init = PR_SCALE // ns
    base = (PR_SCALE * (damping_den - damping_num) // damping_den) // ns
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    ranks = flagged.select(
        "node",
        F.when(F.col("_s") == 1, F.lit(init)).otherwise(F.lit(0))
        .cast("long").alias("r"),
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(r * {damping_num}) DIV {damping_den}")
                .alias("rs"),
                F.col("od"),
            )
            .select("node", F.expr("rs DIV od").cast("long").alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_r"))
        )
        ranks = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                (F.when(F.col("_s") == 1, F.lit(base)).otherwise(F.lit(0))
                 + F.coalesce(F.col("in_r"), F.lit(0)))
                .cast("long").alias("r"),
            )
        )
    out = ranks.select("node", F.col("r").alias("rank_micro")).persist()
    try:
        out.count()
        return out
    finally:
        seeds.unpersist()
        nodes.unpersist()
        e.unpersist()


def random_walks(edges: DataFrame, walk_len: int = 4,
                 walks_per_node: int = 1, seed: int = 0) -> DataFrame:
    """DeepWalk/node2vec-style random-walk corpus over a directed
    graph: (walk_id, start, path) where path is the ' '-joined node
    sequence of a ``walk_len``-step walk.  This is the sentence
    generator that graph-embedding training consumes — emitted as a
    DataFrame so it feeds the same pack/shuffle/dedup pipeline as any
    text corpus.

    Determinism (the whole point of this variant): the step-t choice
    of walk w standing at a node of out-degree d is
    ``md5("{seed}:{w}:{t}") mod d`` over the node's neighbours ranked
    by destination id asc — RNG-free, so corpora are bit-identical at
    any parallelism and replayable by any engine (the DuckDB oracle
    walks the same lattice).  Walks stop early at sinks (out-degree
    0); the path keeps the visited prefix.

    Scale shape: neighbour ranking is ONE (src)-keyed window over the
    edge list; each step is ONE keyed equi-join of the walk frontier
    against the ranked edges on (current node, chosen rank) — walk_len
    is a small constant, so the plan is walk_len unrolled joins, all
    hash joins on graph-scale keys with no fan-out (exactly one match
    per frontier row).  State carried per walk is (ids + the growing
    path string); nothing is ever collected."""
    from pyspark.sql import Window

    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    w_rank = Window.partitionBy("src").orderBy(F.col("dst").asc())
    ranked = (edges.select("src", "dst").distinct()
              .withColumn("rank",
                          F.row_number().over(w_rank).cast("long") - 1)
              .withColumn("deg",
                          F.count("*").over(
                              Window.partitionBy("src")).cast("long")))

    starts = edges.select(F.col("src").alias("start")).distinct()
    reps = F.explode(F.sequence(
        F.lit(0), F.lit(int(walks_per_node) - 1))).alias("rep")
    frontier = (starts.select("start", reps)
                .select(
                    F.concat_ws(":", F.col("start"), F.col("rep"))
                    .alias("walk_id"),
                    F.col("start"),
                    F.col("start").cast("string").alias("path"),
                    F.col("start").alias("cur")))

    for t in range(int(walk_len)):
        choice_of = (F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(int(seed)), F.col("walk_id"),
                              F.lit(t))), 1, 12), 16, 10)
            .cast("long"))
        step = (frontier
                .join(ranked, (frontier["cur"] == ranked["src"]),
                      "left")
                .where(F.col("src").isNull()
                       | (F.col("rank") == F.pmod(choice_of,
                                                  F.col("deg"))))
                .select(
                    "walk_id", "start",
                    F.when(F.col("dst").isNull(), F.col("path"))
                    .otherwise(F.concat_ws(" ", F.col("path"),
                                           F.col("dst"))).alias("path"),
                    F.col("dst").alias("cur")))
        frontier = step
    return frontier.select("walk_id", "start", "path")


def walk_skipgrams(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from a random-walk corpus (the
    word2vec/DeepWalk objective's input): one row per (center,
    context) occurrence within ``window`` positions inside a walk,
    with a global count — (center, context, n_pairs).

    Scale shape: pair generation is PURE map-side array algebra —
    split the path, then for each position explode the +/-window
    slice around it (self excluded) via transform + flatten; no
    self-join, no shuffle until the single (center, context) count
    agg with map-side partials.  At 100 TB of walks this is scan +
    one exchange, the same shape as a bigram count."""
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = F.split(F.col("path"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - 1)
    pairs = F.flatten(F.transform(
        idx,
        lambda i: F.transform(
            F.filter(
                F.sequence(
                    F.greatest(i - F.lit(int(window)), F.lit(0)),
                    F.least(i + F.lit(int(window)), n - 1)),
                lambda j: j != i),
            lambda j: F.struct(
                F.element_at(toks, i + 1).alias("center"),
                F.element_at(toks, j + 1).alias("context")))))
    return (walks
            .select(F.explode(pairs).alias("p"))
            .select(F.col("p.center").alias("center"),
                    F.col("p.context").alias("context"))
            .groupBy("center", "context")
            .agg(F.count("*").cast("long").alias("n_pairs")))


def transe_negatives(triples: DataFrame, n_buckets: int | None = None,
                     seed: int = 0) -> DataFrame:
    """KG-embedding training pairs (TransE/DistMult-style, Bordes et
    al. 2013): for every URI-object triple (h, r, t) emit one
    deterministically-corrupted negative — head or tail replaced by a
    pseudo-random entity — as (h, r, t, side, neg).

    RNG-free and engine-replayable: the corrupted side and the drawn
    entity are md5 functions of (seed, h, r, t), so the same sample
    set falls out at any parallelism and a SQL engine replays every
    row.  Negatives equal to the node they replace are filtered (the
    'filtered' sampling convention), so every emitted pair is a true
    corruption.

    Scale design — no global entity index: a single row_number over
    the whole entity vocabulary would serialize on one partition at
    10^9 entities.  Instead entities are md5-bucketed into
    ``n_buckets`` groups and ranked per bucket (parallel windows);
    a triple draws bucket = md5 mod n_buckets, then rank = md5 mod
    bucket_size.  The bucket-size table is n_buckets rows (broadcast);
    the draw resolves with ONE (bucket, idx)-keyed equi-join against
    the ranked vocabulary — triple-scale x entity-scale, both sides
    hash-partitioned.

    ``n_buckets`` defaults ADAPTIVELY (ADVICE r4: a fixed 16 put 1/16
    of the vocabulary on one reducer at 10^9 entities): one map-side
    HLL estimate of the entity count sizes the buckets so each ranking
    window holds <= ~1M entities, floor 16 — small corpora keep the
    round-4 geometry (oracle-stable), huge ones scale the windows out.
    An explicit value overrides."""
    from pyspark.sql import Window

    from octofludb_spark.functions.uri import DT_URI

    def h24(*cols):
        return F.conv(F.substring(
            F.md5(F.concat_ws(":", *cols)), 1, 12), 16, 10).cast("long")

    pos = (triples.where(F.col("object_dtype") == DT_URI)
           .select(F.col("subject").alias("h"),
                   F.col("predicate").alias("r"),
                   F.col("object_lex").alias("t")))
    if n_buckets is None:
        # HLL merge is commutative, so the estimate (and therefore the
        # emitted sample set) is parallelism-independent
        n_est = (pos.select(F.explode(F.array("h", "t")).alias("node"))
                 .agg(F.approx_count_distinct("node").alias("n"))
                 .first()["n"])
        n_buckets = max(16, -(-int(n_est) // 1_000_000))
    ent = (pos.select(F.col("h").alias("node"))
           .unionByName(pos.select(F.col("t").alias("node")))
           .distinct()
           .withColumn("bucket", F.pmod(
               F.conv(F.substring(F.md5("node"), 1, 6), 16, 10)
               .cast("long"), F.lit(n_buckets))))
    w = Window.partitionBy("bucket").orderBy("node")
    ranked = ent.withColumn("idx", F.row_number().over(w) - 1)
    bsize = ranked.groupBy("bucket").agg(
        F.count("*").alias("bsize"))
    s = F.lit(int(seed))
    drawn = (pos
             .withColumn("bucket", F.pmod(
                 h24(s, F.col("h"), F.col("r"), F.col("t"), F.lit("b")),
                 F.lit(n_buckets)))
             .join(F.broadcast(bsize), "bucket")
             .withColumn("idx", F.pmod(
                 h24(s, F.col("h"), F.col("r"), F.col("t"), F.lit("r")),
                 F.col("bsize")))
             .withColumn("side", F.when(F.pmod(
                 h24(s, F.col("h"), F.col("r"), F.col("t"), F.lit("s")),
                 F.lit(2)) == 0, F.lit("head")).otherwise(F.lit("tail"))))
    out = (drawn.join(ranked.select("bucket", "idx",
                                    F.col("node").alias("neg")),
                      ["bucket", "idx"])
           .where(((F.col("side") == "head") & (F.col("neg") != F.col("h")))
                  | ((F.col("side") == "tail")
                     & (F.col("neg") != F.col("t")))))
    return out.select("h", "r", "t", "side", "neg")


def node2vec_walks(edges: DataFrame, walk_len: int = 4,
                   walks_per_node: int = 1, seed: int = 0,
                   w_return: int = 1, w_in: int = 4,
                   w_out: int = 2) -> DataFrame:
    """node2vec-style SECOND-ORDER biased walk corpus (Grover &
    Leskovec 2016) over a directed graph: (walk_id, start, path).
    Each step weighs the current node's out-neighbours by where they
    sit relative to the PREVIOUS node — back to it (``w_return``,
    node2vec's 1/p), adjacent to it (``w_in``, the BFS-ish weight 1),
    or farther (``w_out``, 1/q) — so integer weights (w_return, w_in,
    w_out) = (1, 4, 2) correspond to p=4, q=2.  The first step (no
    previous node) falls through to uniform w_out.

    Deterministic like random_walks: the step-t draw of walk w is
    ``md5("{seed}:{w}:{t}") mod total_weight`` landing in a
    neighbour's cumulative-weight interval (dst-asc order) — RNG-free,
    bit-identical at any parallelism, replayable in SQL (the oracle
    REWALKS every path through the same class logic and interval
    arithmetic).  Walks stop at sinks keeping their prefix.

    Scale shape per step: ONE keyed equi-join of the frontier against
    the ranked adjacency (fan-out = out-degree of the current node),
    ONE broadcast-free left join against the edge set for the
    is-adjacent-to-previous class (keyed on (prev, dst)), and ONE
    walk-keyed window for the cumulative intervals — partitions are
    single-neighbourhood-sized, never graph-sized.  walk_len is a
    small constant: the whole plan is unrolled for Catalyst."""
    from pyspark.sql import Window

    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if min(w_return, w_in, w_out) < 1:
        raise ValueError("class weights must be >= 1")
    w_rank = Window.partitionBy("src").orderBy(F.col("dst").asc())
    e = edges.select("src", "dst").distinct()
    ranked = e.withColumn(
        "rank", F.row_number().over(w_rank).cast("long") - 1)
    # fresh lineage for the previous-node adjacency side (a shared
    # plan with `ranked` trips Spark's ambiguous-self-join check)
    prev_adj = (edges.select(F.col("src").alias("p_src"),
                             F.col("dst").alias("p_dst")).distinct()
                .withColumn("p_hit", F.lit(1)))

    starts = e.select(F.col("src").alias("start")).distinct()
    reps = F.explode(F.sequence(
        F.lit(0), F.lit(int(walks_per_node) - 1))).alias("rep")
    frontier = (starts.select("start", reps)
                .select(
                    F.concat_ws(":", F.col("start"), F.col("rep"))
                    .alias("walk_id"),
                    F.col("start"),
                    F.col("start").cast("string").alias("path"),
                    F.lit(None).cast("string").alias("prev"),
                    F.col("start").alias("cur")))

    w_cum = Window.partitionBy("walk_id").orderBy(F.col("rank").asc())
    w_tot = Window.partitionBy("walk_id")
    for t in range(int(walk_len)):
        draw = (F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(int(seed)), F.col("walk_id"),
                              F.lit(t))), 1, 12), 16, 10)
            .cast("long"))
        cand = (frontier.alias("f")
                .join(ranked.alias("rk"),
                      F.col("f.cur") == F.col("rk.src"))
                .join(prev_adj.alias("pa"),
                      (F.col("f.prev") == F.col("pa.p_src"))
                      & (F.col("rk.dst") == F.col("pa.p_dst")), "left")
                .select(F.col("f.walk_id").alias("walk_id"),
                        F.col("f.prev").alias("prev"),
                        F.col("rk.dst").alias("dst"),
                        F.col("rk.rank").alias("rank"),
                        F.col("pa.p_hit").alias("p_hit"))
                .withColumn(
                    "w",
                    F.when(F.col("dst") == F.col("prev"),
                           F.lit(int(w_return)))
                    .when(F.col("p_hit").isNotNull(), F.lit(int(w_in)))
                    .otherwise(F.lit(int(w_out))).cast("long")))
        cand = (cand
                .withColumn("cum", F.sum("w").over(w_cum))
                .withColumn("tot", F.sum("w").over(w_tot))
                .withColumn("r", F.pmod(draw, F.col("tot")))
                .where((F.col("r") >= F.col("cum") - F.col("w"))
                       & (F.col("r") < F.col("cum")))
                .select(F.col("walk_id").alias("c_walk"),
                        F.col("dst").alias("nxt")))
        frontier = (frontier
                    .join(cand, frontier["walk_id"] == cand["c_walk"],
                          "left")
                    .select(
                        "walk_id", "start",
                        F.when(F.col("nxt").isNull(), F.col("path"))
                        .otherwise(F.concat_ws(" ", F.col("path"),
                                               F.col("nxt")))
                        .alias("path"),
                        F.when(F.col("nxt").isNull(),
                               F.lit(None).cast("string"))
                        .otherwise(F.col("cur")).alias("prev"),
                        F.col("nxt").alias("cur")))
    return frontier.select("walk_id", "start", "path")
