"""Connected components over owl:sameAs edges — the entity-linking
pass that replaces GraphDB's built-in sameAs inference
(reference: octofludb/data/octofludb-config.ttl:29,48; queries opt out
with FROM onto:disable-sameAs, masterlist.rq:23).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), expressed as
DataFrame joins.  Each iteration localCheckpoints to cut lineage; the
loop stops when an iteration changes no edges.  sameAs clusters here
are tiny (ids co-occurring in a row, classifier_flucrew.py:337-342),
so convergence takes 2-3 rounds; the algorithm still scales to
billion-edge graphs because every step is a pair of shuffles on the
edge relation only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from octofludb_spark.functions.uri import OWL_SAMEAS


def sameas_edges(triples: DataFrame) -> DataFrame:
    """(src, dst) edge list from owl:sameAs triples."""
    return (
        triples.where(F.col("predicate") == OWL_SAMEAS)
        .select(F.col("subject").alias("src"), F.col("object_lex").alias("dst"))
        .where(F.col("dst").isNotNull())
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than the node to the component
    minimum of its closed neighborhood."""
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    grouped = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("mn"),
        F.collect_set("dst").alias("nbrs"),
    )
    return (
        grouped.select("src", "mn", F.explode("nbrs").alias("v"))
        .where(F.col("v") > F.col("src"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect all strictly-smaller neighbors (and self) to the min."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    grouped = directed.groupBy("src").agg(
        F.min("dst").alias("mn"), F.collect_set("dst").alias("nbrs")
    )
    return (
        grouped.select("src", "mn",
                       F.explode(F.array_union("nbrs", F.array("src"))).alias("v"))
        .where(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


DRIVER_CC_THRESHOLD = 2_000_000  # edges; ~100MB of IRIs on the driver


def _make_union_find():
    """One shared path-compressed union-find (closures, not methods —
    these loops run over millions of pairs on the driver and inside
    the per-partition contraction).  Returns (parent, find, union);
    works over any hashable key type (str or int64 hash)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a, b) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    return parent, find, union


def _driver_union_find(pairs) -> list[tuple[str, str]]:
    """Union-find with path compression; representative = lexicographic
    min (same result as the distributed fixpoint)."""
    _, find, union = _make_union_find()
    nodes: set[str] = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    # second pass: the min member of each set wins as representative
    # (union order above may have attached an earlier-found min later)
    comp_min: dict[str, str] = {}
    for x in nodes:
        r = find(x)
        if r not in comp_min or x < comp_min[r]:
            comp_min[r] = x
    return [(x, comp_min[find(x)]) for x in sorted(nodes)]


def _driver_union_find_hashed(hs, hd, h2s: dict) -> list[tuple[str, str]]:
    """Union-find over int64 node hashes; representative = the
    lexicographically smallest node STRING of the component (same
    output as `_driver_union_find` on the string edges)."""
    _, find, union = _make_union_find()
    for a, b in zip(hs, hd):
        union(a, b)
    comp_min: dict[int, str] = {}
    for h, s in h2s.items():
        r = find(h)
        cur = comp_min.get(r)
        if cur is None or s < cur:
            comp_min[r] = s
    return sorted((s, comp_min[find(h)]) for h, s in h2s.items())


def connected_components(edges: DataFrame, max_iter: int = 20,
                         driver_threshold: int = DRIVER_CC_THRESHOLD) -> DataFrame:
    """-> (node, component) with component = min member IRI.

    Deterministic: component representative is the lexicographic
    minimum, independent of partitioning.

    Hybrid execution: below ``driver_threshold`` edges the alias graph
    collects to the driver for union-find (microseconds — the common
    case, since sameAs edges only link ids co-occurring in a row);
    above it, alternating large-star/small-star DataFrame iterations
    handle arbitrarily large graphs."""
    def _sig(e: DataFrame) -> tuple:
        """Cheap fixpoint signature: (count, sum of row hashes) — one
        aggregate instead of two anti-joins per iteration."""
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    spark = edges.sparkSession
    # persist the filtered edge relation: CC runs up to three actions
    # over it (the contraction pass, the node dictionary — which scans
    # it TWICE via the src/dst union — and the rare collision
    # fallback).  Without the cache each action re-executes the
    # caller's upstream; on the KG link path that was two extra full
    # scans of the triple store per call (measured: the node-dict job
    # was the single heaviest CC job).  Unpersisted before returning.
    edges = (edges.where(F.col("src") != F.col("dst"))
             .select("src", "dst").persist())
    # Two-level connected components.  Level 1 contracts each
    # partition's edges to a spanning forest IN PARALLEL (mapInPandas
    # over int64 node hashes — Arrow moves them zero-copy): a
    # partition with e edges over v nodes emits at most v-1 pairs that
    # preserve its connectivity, so the driver never sees the raw edge
    # multiplicity.  Level 2 union-finds the contracted pairs on the
    # driver.  ONE job both decides the execution mode and fetches the
    # contracted structure (limit threshold+1); union-find is
    # insensitive to duplicates so there is no distinct job anywhere.
    import pandas as pd

    def _contract(batches):
        parent, find, union = _make_union_find()
        n_in = False
        for bpdf in batches:
            n_in = n_in or len(bpdf)
            for a, b in zip(bpdf["hs"].to_numpy(), bpdf["hd"].to_numpy()):
                union(a, b)
        if not n_in:
            return
        out = [(x, find(x)) for x in list(parent)]
        yield pd.DataFrame(out, columns=["hs", "hd"])

    contracted = (
        edges.select(F.xxhash64("src").alias("hs"),
                     F.xxhash64("dst").alias("hd"))
        .mapInPandas(_contract, "hs long, hd long")
    )
    hpdf = contracted.limit(driver_threshold + 1).toPandas()
    if len(hpdf) == 0 and edges.isEmpty():
        # Empty ONLY when there are genuinely no edges: a contraction
        # that lost every pair to src/dst hash collisions must still
        # reach the collision check below, not short-circuit to zero
        # components.
        edges.unpersist()
        return spark.createDataFrame([], "node string, component string")
    if len(hpdf) <= driver_threshold:
        import pandas as pd

        # The node dictionary (distinct endpoints, typically << edges)
        # carries the strings.  An xxhash64 collision over the node
        # set would silently merge two entities, so it is CHECKED; on
        # collision fall back to the exact string path.
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .withColumn("h", F.xxhash64("node"))
            .toPandas()
        )
        if nodes["h"].nunique() == len(nodes):
            comp = _driver_union_find_hashed(
                hpdf["hs"].to_numpy(), hpdf["hd"].to_numpy(),
                dict(zip(nodes["h"].to_numpy(), nodes["node"].to_numpy())),
            )
        else:  # astronomically rare; exactness beats speed
            pdf = edges.toPandas()
            comp = _driver_union_find(
                zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy())
            )
        out = pd.DataFrame(comp, columns=["node", "component"])
        edges.unpersist()
        return spark.createDataFrame(out)  # Arrow transfer back
    ein = edges
    edges = edges.distinct().localCheckpoint()
    ein.unpersist()
    sig = _sig(edges)
    # The sameAs edge set is small relative to the triple store; size
    # the iteration's shuffles to the data, not to the session-wide
    # partition count (a 6-job driver loop at full width is pure
    # scheduling overhead).
    nparts = max(2, min(64, int(sig[0]) // 100_000 + 1))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        edges = edges.repartition(nparts)
        for _ in range(max_iter):
            edges2 = _small_star(_large_star(edges)).localCheckpoint()
            sig2 = _sig(edges2)
            edges = edges2
            if sig2 == sig:
                break
            sig = sig2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # after convergence every edge points node -> component min
    comp = edges.select(F.col("src").alias("node"),
                        F.col("dst").alias("component"))
    roots = comp.select(F.col("component").alias("node"),
                        F.col("component").alias("component")).distinct()
    return comp.unionByName(roots).distinct()
