"""Graph analytics over a relational co-occurrence graph.

Triangle counting and PageRank are THE canonical MapReduce-era graph
workloads (the reference's lineage — its wordcount/inverted-index jobs,
/root/reference/mapreduce_wc.py:3-11, are the text half of the same
classic suite), re-expressed as DataFrame plans.

Graph derivation: parts co-occurring in the same URGENT order form an
undirected edge. The bipartite projection is degree-bounded by order size
(TPC-H orders hold ~4 items, and real carts are similarly small), so the
per-order pair explosion is O(items²)-per-order with a small constant —
linear in lineitem overall, which is what survives 100 TB. The priority
filter prunes at the orders scan before anything joins.

Scale notes per operator:
- triangle_count uses the src-centered wedge join with the src<dst<dst2
  total order, so each triangle is generated exactly once and wedge
  volume is Σ deg(v)²/2 over the oriented (lower-endpoint) adjacency —
  the standard node-iterator bound. All joins are equi-joins on vertex
  keys (shuffle hash / sort-merge); no cartesian anywhere.
- pagerank_iter keeps ranks and edges co-partitioned on the vertex key
  across iterations — the join key never changes, so after the first
  shuffle each subsequent iteration reuses the partitioning (no new
  exchange of the edge set). Ranks are O(V) and flow through shuffle
  joins, never a broadcast (at 100 TB, V-proportional state must not
  land on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pythonmapreduce_spark.catalog import load
from pythonmapreduce_spark.plans.registry import register
from pythonmapreduce_spark.plans.materialize import iter_materialize

# Shared CTE prefix for the DuckDB oracles — identical edge derivation.
# AS MATERIALIZED throughout the graph oracles: DuckDB inlines a CTE
# once PER REFERENCE, so a chain of rounds where each level is read
# twice (sym -> m and sym -> e) re-computes the base 2^depth times —
# graph_cc_bigstar's 4-round oracle measured 21 s plain vs 0.05 s
# materialized at sf0.01, identical result. The hint is DuckDB-side
# only; Spark never parses oracle SQL.
_EDGES_CTE = """
    WITH urgent AS MATERIALIZED (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    items AS MATERIALIZED (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN urgent u ON l.l_orderkey = u.o_orderkey
    ),
    edges AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
"""


def _sym_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized symmetric ADJACENCY LISTS: (vtx, nbrs) — one row per
    vertex, neighbors as an array. The round-12 loop base for the
    propagation-style graph queries (pagerank/bfs/LPA/CC/kcore/HITS).

    Why arrays instead of the (src, dst) edge rows the loops used
    through round 11 (guide §2.3 "shuffle fewer bytes"): a checkpointed
    base re-enters the plan as ExistingRDD with NO known partitioning,
    so every loop round re-shuffles it for the state join. As edge rows
    that is 2|E| rows × 16 bytes per round; as adjacency rows it is
    |V| rows carrying |E|+|V| longs total — about half the bytes and a
    V-sized join cardinality instead of 2E (at 100 TB the state table
    is O(V) and CANNOT broadcast, so the per-round join shuffle is the
    loop's dominant cost). The propagation itself becomes
    join-on-vertex → explode(nbrs), and the explode output collapses
    map-side into the same per-vertex aggregate as before. Per-vertex
    degree is size(nbrs) — free, no second aggregate. Interleaved A/B
    at sf0.1: bfs 0.65×, pagerank 0.79×, row-equal outputs.

    Neighbor-list ORDER is collect_list arrival order (nondeterministic
    across runs) — every consumer aggregates with order-independent
    (min/count) or rounding-absorbed (float-sum) semantics, exactly the
    guarantee the edge-row shape already relied on (shuffle arrival
    order was never deterministic either)."""
    e = _edges(spark, sf_dir)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return iter_materialize(
        sym.groupBy(F.col("src").alias("vtx")).agg(
            F.collect_list("dst").alias("nbrs")
        )
    )


def _pagerank_ranks(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Full (node, pr) vector after 3 iterations, or None on an empty
    graph. Factored out of the registered query so tests can assert
    global invariants (Σ pr = 1) the top-20 projection hides."""
    # Round 12: adjacency-array loop base (see _sym_adjacency) — the
    # out-degree is size(nbrs), so the old sym ⋈ deg contrib_base (2|E|
    # rows re-shuffled every round) collapses into the |V|-row base.
    adj = _sym_adjacency(spark, sf_dir).select(
        "vtx", "nbrs", F.size("nbrs").alias("d")
    )
    # |V| is one scalar folded into the teleport literal.
    n_nodes = adj.count()
    if n_nodes == 0:
        return None
    teleport = 0.15 / n_nodes
    # Iteration-1 specialization (superstep-0 constant folding): the
    # uniform init makes every rank the literal 1/|V|, so each vertex
    # sends the constant (1/|V|)/d to every neighbor — fold it into the
    # explode+aggregate instead of joining a constant rank table. Same
    # pr/d terms summed under the same grouping; any reordering drift
    # sits far below the ×1000-then-round-6dp compare precision the
    # oracle already relies on for cross-engine float summation.
    ranks = (
        adj.select(
            F.explode("nbrs").alias("dst"),
            (F.lit(1.0 / n_nodes) / F.col("d")).alias("t"),
        )
        .groupBy("dst")
        .agg((F.lit(teleport) + 0.85 * F.sum("t")).alias("pr"))
        .withColumnRenamed("dst", "src")
    )
    for _ in range(2):
        ranks = (
            adj.join(ranks, F.col("vtx") == F.col("src"))
            .select(
                F.explode("nbrs").alias("dst"),
                (F.col("pr") / F.col("d")).alias("t"),
            )
            .groupBy("dst")
            .agg((F.lit(teleport) + 0.85 * F.sum("t")).alias("pr"))
            .withColumnRenamed("dst", "src")
        )
    return ranks


def basket_pair_rows(baskets: DataFrame, c1: str, c2: str) -> DataFrame:
    """All ordered pairs (a < b) from each basket's sorted distinct
    ``parts`` array, one pair per output row — shared by the graph edge
    base and basket_rules.

    Round 12 shape: a TWO-LEVEL explode (posexplode each anchor, then
    explode the anchor's tail slice) instead of round 11's
    ``flatten(transform(...))`` single explode. The single-explode form
    materialized all k(k-1)/2 pair structs of a basket INSIDE ONE ROW
    before the Generate — fine at TPC-H's k≈4, but a skewed 100 TB
    basket key makes that one row O(k²) bytes with no spill path (a
    10⁶-item basket would be a single ~10 TB row). The two-level form
    keeps every row O(k): level 1 emits one (anchor, parts) row per
    item, level 2 slices the tail on the fly, and both Generates stream
    through the same whole-stage pipeline — the O(k²) pair volume still
    exists (it is the job's output), but only ever as ROWS, which
    shuffle and spill like any other rows. Same total work, no
    single-row blowup, no cap constant, no degrade branch, and still
    exactly one pass over the fact table. p1 < p2 by construction
    (sorted distinct array, tail slice strictly after the anchor)."""
    return baskets.select(
        "parts", F.posexplode("parts").alias("_i", c1)
    ).select(
        c1,
        F.explode(
            F.expr("slice(parts, _i + 2, size(parts) - _i - 1)")
        ).alias(c2),
    )


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edge set (src < dst) of the part co-occurrence graph.

    Round 11 shape: ONE lineitem pass builds per-order sorted distinct
    part arrays (collect_set dedups map-side; order size ~4 bounds the
    array), then pairs explode from each array in-JVM — sorted arrays
    make src < dst by construction. The old form self-joined a distinct
    (l_orderkey, l_partkey) projection with itself, which the physical
    plan executed as TWO full lineitem scans + two distinct exchanges +
    a join-key shuffle; now the only exchanges are the groupBy(order)
    and the final edge distinct. Identical edge set (verified row-equal
    at sf0.1 and via every graph oracle). Round 12: the pair explode is
    the two-level skew-safe form — see basket_pair_rows."""
    urgent = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    baskets = (
        load(spark, sf_dir, "lineitem")
        .join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    return basket_pair_rows(baskets, "src", "dst").distinct()


@register(
    "graph_degree",
    oracle=_EDGES_CTE
    + """
    , deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT src AS node, dst FROM edges
            UNION ALL
            SELECT dst AS node, src FROM edges
        ) GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-occurrence graph.

    The first question asked of any production graph (skew detection:
    a power-law hub is what breaks the wedge join below). Symmetrize by
    union, count per node, histogram the counts — two partial-agg
    exchanges, output is |distinct degrees| rows.
    """
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


@register(
    "triangle_count",
    oracle=_EDGES_CTE
    + """
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
    JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count via the node-iterator wedge join.

    Wedges (u<v, u<w, v<w) are built from the lower endpoint's adjacency
    (self-equi-join on src), then closed against the edge set with one
    more equi-join — each triangle counted exactly once because the
    vertex total order orients it uniquely. Both joins shuffle on vertex
    keys; wedge volume is the classic Σ deg² bound, kept small here by
    the order-size-bounded co-occurrence degree. One global count at the
    end (partial counts combine map-side).
    """
    # Materialize the edge set once: the plan references it three times
    # (two wedge sides + the closing probe) and Catalyst's exchange reuse
    # does not canonicalize the three differently-aliased self-join
    # subtrees (measured: 12 parquet scans, 0 ReusedExchange without
    # this). On a cluster this is persist() of the oriented edge list.
    e = iter_materialize(_edges(spark, sf_dir))
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = e.select(F.col("src").alias("u2"), F.col("dst").alias("w"))
    wedges = e1.join(
        e2, (F.col("u") == F.col("u2")) & (F.col("v") < F.col("w"))
    ).select("v", "w")
    closing = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


@register(
    "pagerank_iter",
    oracle=_EDGES_CTE
    + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY node),
    n AS (SELECT COUNT(*) AS c FROM deg),
    r0 AS (SELECT node, 1.0 / (SELECT c FROM n) AS pr FROM deg),
    r1 AS (
        SELECT s.dst AS node,
               0.15 / (SELECT c FROM n)
                   + 0.85 * SUM(r.pr / g.d) AS pr
        FROM sym s JOIN r0 r ON s.src = r.node JOIN deg g ON s.src = g.node
        GROUP BY s.dst
    ),
    r2 AS (
        SELECT s.dst AS node,
               0.15 / (SELECT c FROM n)
                   + 0.85 * SUM(r.pr / g.d) AS pr
        FROM sym s JOIN r1 r ON s.src = r.node JOIN deg g ON s.src = g.node
        GROUP BY s.dst
    ),
    r3 AS (
        SELECT s.dst AS node,
               0.15 / (SELECT c FROM n)
                   + 0.85 * SUM(r.pr / g.d) AS pr
        FROM sym s JOIN r2 r ON s.src = r.node JOIN deg g ON s.src = g.node
        GROUP BY s.dst
    )
    SELECT node, ROUND(pr * 1000, 6) + 0.0 AS pr_millis
    FROM r3
    ORDER BY ROUND(pr * 1000, 6) DESC, node
    LIMIT 20
    """,
)
def pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 synchronous iterations, damping 0.85, uniform init.

    Per iteration: ranks ⋈ edges on the source vertex, contributions
    pr/deg flow along out-edges, sum per destination, re-seed with the
    teleport term. The symmetric edge set guarantees no dangling mass
    (every node has out-degree ≥ 1). Ranks stay O(V) and co-partitioned
    with the edge list on the vertex key across iterations — Spark reuses
    the exchange instead of re-shuffling edges each round. Fixed iteration
    count keeps the computation a finite DAG, which is what makes the
    unrolled-CTE oracle expressible; scores ×1000 then rounded to 6dp so
    the cross-engine float-summation drift stays below the compare
    precision. Top-20 with vertex-id tiebreak.
    """
    ranks = _pagerank_ranks(spark, sf_dir)
    if ranks is None:
        # Degenerate (empty-partition) corpus: no vertices, empty result
        # with the stable schema.
        return spark.createDataFrame([], "node bigint, pr_millis double")
    return (
        ranks.select(
            F.col("src").alias("node"),
            (F.round(F.col("pr") * 1000, 6) + 0.0).alias("pr_millis"),
        )
        .orderBy(F.col("pr_millis").desc(), "node")
        .limit(20)
    )


@register(
    "bfs_distances",
    oracle=_EDGES_CTE
    + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    d0 AS (
        SELECT DISTINCT src AS node, 0 AS dist FROM sym WHERE src % 97 = 0
    ),
    d1 AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d0
            UNION ALL
            SELECT s.dst AS node, d.dist + 1 FROM d0 d JOIN sym s ON s.src = d.node
        ) GROUP BY node
    ),
    d2 AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d1
            UNION ALL
            SELECT s.dst AS node, d.dist + 1 FROM d1 d JOIN sym s ON s.src = d.node
        ) GROUP BY node
    ),
    d3 AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d2
            UNION ALL
            SELECT s.dst AS node, d.dist + 1 FROM d2 d JOIN sym s ON s.src = d.node
        ) GROUP BY node
    )
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM d3 GROUP BY dist
    """,
)
def bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: shortest hop distance (≤ 3 hops) from the
    deterministic source set {v : v % 97 = 0} — the frontier-expansion
    iterative shape next to pagerank_iter's value iteration (together
    they cover both classic iterative-graph dataflows).

    Each round relaxes dist(v) = min(dist(v), min_{u→v} dist(u)+1) as a
    union + min-aggregate over the checkpointed symmetric edge list: one
    vertex-key equi-join and one partial+final min per hop, distance
    table stays O(V) and co-partitioned with edges on the join key.
    Bounded hop count makes the computation a finite DAG (the unrolled
    oracle); the unbounded variant is the same loop with a convergence
    count, exactly like dedup_clusters. Output: distance histogram
    (≤ hops+2 rows: 0..3 plus unreached nodes never appear).
    """
    # Round 12: adjacency-array loop base (see _sym_adjacency) — each
    # relaxation is a |V|-row join + neighbor explode instead of a 2|E|-
    # row edge shuffle; min() is order-independent, so the result is
    # exactly the edge-row form's (verified row-equal). The vertex set
    # is unique by construction, so the old source-set distinct is gone.
    adj = _sym_adjacency(spark, sf_dir)
    dist = (
        adj.select(F.col("vtx").alias("node"))
        .where(F.col("node") % 97 == 0)
        .select("node", F.lit(0).alias("dist"))
    )
    for _ in range(3):
        relaxed = adj.join(dist, F.col("vtx") == F.col("node")).select(
            F.explode("nbrs").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.groupBy("dist").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))


@register(
    "graph_common_neighbors",
    oracle=_EDGES_CTE
    + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    adj AS (SELECT src AS node, list_sort(list(dst)) AS nbrs FROM sym GROUP BY src)
    SELECT e.src, e.dst,
           CAST(LEN(list_intersect(a.nbrs, b.nbrs)) AS BIGINT) AS common,
           ROUND(CAST(LEN(list_intersect(a.nbrs, b.nbrs)) AS DOUBLE)
                 / LEN(list_distinct(list_concat(a.nbrs, b.nbrs))), 4) + 0.0
               AS jaccard
    FROM edges e
    JOIN adj a ON e.src = a.node
    JOIN adj b ON e.dst = b.node
    WHERE LEN(list_intersect(a.nbrs, b.nbrs)) >= 5
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge strength via neighborhood overlap: common-neighbor count and
    neighbor-set Jaccard per edge (≥5 common) — the classic
    link-prediction/tie-strength baseline, and the per-edge refinement
    of triangle_count (Σ common over all edges = 3 × triangles, pinned
    by tests/test_graphs.py's cross-check).

    Adjacency sets build in one partial-agg exchange (collect_set);
    each edge joins its two endpoint sets on the vertex key and the
    intersection runs as a JVM array expression per edge — work is
    Σ(deg(u)+deg(v)) over edges, never a pair explosion. The ≥5 floor
    keeps the emitted edge list to the structurally-embedded ties.
    """
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = sym.groupBy(F.col("src").alias("node")).agg(
        F.collect_set("dst").alias("nbrs")
    )
    common = F.size(F.array_intersect("na", "nb"))
    union_size = F.size(F.array_union("na", "nb"))
    return (
        e.join(adj.withColumnsRenamed({"node": "u", "nbrs": "na"}), F.col("src") == F.col("u"))
        .join(adj.withColumnsRenamed({"node": "v", "nbrs": "nb"}), F.col("dst") == F.col("v"))
        .where(common >= 5)
        .select(
            "src",
            "dst",
            common.cast("long").alias("common"),
            (F.round(common.cast("double") / union_size, 4) + 0.0).alias("jaccard"),
        )
    )


@register(
    "graph_clustering_coef",
    oracle=_EDGES_CTE
    + """
    , sym AS (
        SELECT src AS v, dst AS u FROM edges
        UNION ALL
        SELECT dst AS v, src AS u FROM edges
    ),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY v
    ),
    tris AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
        JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ),
    tv AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT a AS v FROM tris
            UNION ALL SELECT b AS v FROM tris
            UNION ALL SELECT c AS v FROM tris
        ) GROUP BY v
    )
    SELECT d.v AS part, d.d AS degree,
           COALESCE(tv.t, 0) AS n_triangles,
           ROUND(2.0 * COALESCE(tv.t, 0) / (d.d * (d.d - 1)), 4)
               AS clustering_coef
    FROM deg d LEFT JOIN tv ON d.v = tv.v
    WHERE d.d >= 2
    """,
)
def graph_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient: 2·T(v) / (deg(v)·(deg−1))
    — how close each part's neighborhood is to a clique, the community-
    structure metric on top of triangle_count's global tally (same
    oriented triangle enumeration, now unioned back to all three corners
    before a vertex-key count).

    Same scale spine as the rest of the graph tier: the oriented edge
    base materializes once (iter_materialize), wedge volume is the Σdeg²
    bound, per-vertex triangle counts and degrees are combine-enabled
    aggregates on vertex keys, and the final join is |V|-sized. Degree<2
    vertices are excluded (coefficient undefined).
    """
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.select(F.col("src").alias("v")).unionAll(
        e.select(F.col("dst").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v1"))
    e2 = e.select(F.col("src").alias("u2"), F.col("dst").alias("w"))
    wedges = e1.join(
        e2, (F.col("u") == F.col("u2")) & (F.col("v1") < F.col("w"))
    ).select("u", "v1", "w")
    closing = e.select(F.col("src").alias("v1"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v1", "w"]).select(
        F.col("u").alias("a"), F.col("v1").alias("b"), F.col("w").alias("c")
    )
    tv = (
        tris.select(F.col("a").alias("v"))
        .unionAll(tris.select(F.col("b").alias("v")))
        .unionAll(tris.select(F.col("c").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return (
        deg.join(tv, "v", "left")
        .where(F.col("d") >= 2)
        .select(
            F.col("v").alias("part"),
            F.col("d").alias("degree"),
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.round(
                2.0 * F.coalesce("t", F.lit(0)) / (F.col("d") * (F.col("d") - 1)), 4
            ).alias("clustering_coef"),
        )
    )


@register(
    "hits_hub_authority",
    oracle=_EDGES_CTE
    + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    v AS (SELECT DISTINCT src AS vid FROM sym),
    a0 AS (SELECT vid, 1.0 AS a FROM v),
    h1r AS (
        SELECT s.src AS vid, SUM(a0.a) AS h
        FROM sym s JOIN a0 ON s.dst = a0.vid GROUP BY s.src
    ),
    h1 AS (
        SELECT vid, h / (SELECT SUM(h) FROM h1r) AS h FROM h1r
    ),
    a1r AS (
        SELECT s.dst AS vid, SUM(h1.h) AS a
        FROM sym s JOIN h1 ON s.src = h1.vid GROUP BY s.dst
    ),
    a1 AS (
        SELECT vid, a / (SELECT SUM(a) FROM a1r) AS a FROM a1r
    )
    SELECT h1.vid AS part,
           ROUND(h1.h, 6) AS hub,
           ROUND(a1.a, 6) AS authority
    FROM h1 JOIN a1 ON h1.vid = a1.vid
    ORDER BY hub DESC, part LIMIT 20
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One HITS round (hub/authority scores, sum-normalized) over the
    symmetric co-occurrence graph — the mutually-recursive ranking next
    to pagerank_iter's single-score iteration (on an undirected graph
    after one round they coincide up to normalization; the two-table
    UPDATE shape is the point, it is what link-spam and citation
    analysis run on directed webs).

    Same spine as the rest of the tier: scores live in O(V) tables
    co-partitioned on the vertex key, each half-round is one equi-join +
    combine-enabled sum, normalizers are 1-row broadcasts, and the
    deterministic top-20 (score desc, id) bounds the output. More rounds
    = the same pair of joins repeated over iter_materialize'd bases.
    """
    # Round-12 note: the adjacency-array base measured neutral here
    # (1.032 interleaved, steal 11 — ONE propagation join can't amortize
    # the base's collect_list shuffle). Edge-row form kept, same
    # adjudication as LPA/CC.
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Each raw score table feeds BOTH its own normalizer aggregate and the
    # next half-round (and h1 additionally the final join). Without
    # materializing these O(V) tables Catalyst re-executes the |E|-sized
    # propagation join once per consumer (measured: 4 nested-loop
    # normalizer subtrees instead of 2, with h1's edge join computed three
    # times); checkpointing them keeps each half-round's shuffle join
    # computed exactly once — the two-table-UPDATE shape iterative HITS
    # needs at scale.
    # Half-round-1 specialization (superstep-0 fold, as in LPA/CC/
    # pagerank): a0 is uniformly 1.0, so the first hub score is just the
    # vertex degree — sum of exact 1.0s, order-independent in float, so
    # bit-identical to the general half-round's join+sum the oracle runs.
    h1r = iter_materialize(
        sym.groupBy("src")
        .agg(F.sum(F.lit(1.0)).alias("h"))
        .select(F.col("src").alias("vid"), "h")
    )
    h_tot = h1r.agg(F.sum("h").alias("ht"))
    h1 = h1r.crossJoin(F.broadcast(h_tot)).select(
        "vid", (F.col("h") / F.col("ht")).alias("h")
    )
    a1r = iter_materialize(
        sym.join(h1, sym.src == h1.vid)
        .groupBy("dst")
        .agg(F.sum("h").alias("a"))
        .select(F.col("dst").alias("vid"), "a")
    )
    a_tot = a1r.agg(F.sum("a").alias("at"))
    a1 = a1r.crossJoin(F.broadcast(a_tot)).select(
        "vid", (F.col("a") / F.col("at")).alias("a")
    )
    return (
        h1.join(a1, "vid")
        .select(
            F.col("vid").alias("part"),
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
        .orderBy(F.col("hub").desc(), "part")
        .limit(20)
    )


def _cc_oracle(rounds: int) -> str:
    """Unrolled min-label propagation over the symmetric edge set."""
    parts = [
        _EDGES_CTE
        + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    l0 AS (SELECT DISTINCT src AS vid, src AS lbl FROM sym)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    l{r} AS (
        SELECT v.vid, LEAST(v.lbl, COALESCE(MIN(n.lbl), v.lbl)) AS lbl
        FROM l{p} v
        LEFT JOIN sym s ON s.src = v.vid
        LEFT JOIN l{p} n ON n.vid = s.dst
        GROUP BY v.vid, v.lbl
    )"""
        )
    return (
        "".join(parts)
        + f"""
    SELECT lbl AS component, CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM l{rounds} GROUP BY lbl
    """
    )


@register("graph_cc_rounds", oracle=_cc_oracle(3))
def graph_cc_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by min-label propagation run for EXACTLY 3
    rounds — the driver-checkable twin of dedup_clusters (which is
    rows-only because its edges come from the LSH hash family and it
    iterates to data-dependent convergence; here the edge set is the
    oracle-able co-occurrence graph and the round count is pinned, so
    the intermediate label state is deterministic and the unrolled CTE
    reproduces it exactly — same trick as bfs_distances' fixed hops).
    Emits component label → size after round 3; labels that have not yet
    converged are part of the CONTRACT, not an error.

    Per round: one vertex-key equi-join against the label table + a
    min-aggregate — labels O(V), edges reused from the materialized
    base, the iterative shape pagerank/bfs share. On a cluster rounds
    continue to convergence with iter_materialize cutting lineage.
    """
    # Round-12 note: the adjacency-array base measured ~neutral-to-worse
    # here (1.050 interleaved, steal 15) — two min rounds don't clearly
    # amortize the extra collect_list shuffle. Edge-row form kept (same
    # adjudication as LPA; pagerank/bfs/kcore adopted the base on
    # measured wins).
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Round-1 specialization (superstep-0 constant folding): with every
    # initial label equal to the vertex id, round 1's neighbor-min is
    # just min(dst) per src and the least() against the own label is
    # least(src, min(dst)) — one combine-enabled aggregate over the edge
    # base replaces the label join + left-join merge. Every vertex
    # appears as a src in the symmetric edge set, so no left join is
    # needed to keep isolated-side rows. Integer min — bit-identical to
    # the general round the oracle unrolls.
    labels = iter_materialize(
        sym.groupBy("src")
        .agg(F.min("dst").alias("nbl"))
        .select(
            F.col("src").alias("vid"),
            F.least(F.col("src"), F.col("nbl")).alias("lbl"),
        )
    )
    for _ in range(2):
        nbr_min = (
            sym.join(labels.withColumnRenamed("vid", "dst2"), F.col("dst") == F.col("dst2"))
            .groupBy("src")
            .agg(F.min("lbl").alias("nbl"))
            .select(F.col("src").alias("vid"), "nbl")
        )
        labels = (
            labels.join(nbr_min, "vid", "left")
            .select(
                "vid",
                F.least(F.col("lbl"), F.coalesce("nbl", F.col("lbl"))).alias("lbl"),
            )
        )
        labels = iter_materialize(labels)
    return labels.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )


def _lpa_oracle(rounds: int) -> str:
    """Unrolled synchronous label propagation over the symmetric edge set."""
    parts = [
        _EDGES_CTE
        + """
    , sym AS MATERIALIZED (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS vid, src AS lbl FROM sym)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    v{r} AS MATERIALIZED (
        SELECT s.src AS vid, l.lbl, COUNT(*) AS cnt
        FROM sym s JOIN l{p} l ON l.vid = s.dst
        GROUP BY s.src, l.lbl
    ),
    l{r} AS MATERIALIZED (
        SELECT vid, lbl FROM (
            SELECT vid, lbl,
                   ROW_NUMBER() OVER (PARTITION BY vid
                                      ORDER BY cnt DESC, lbl ASC) AS rn
            FROM v{r}
        ) WHERE rn = 1
    )"""
        )
    return (
        "".join(parts)
        + f"""
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM l{rounds} GROUP BY lbl
    """
    )


@register("label_propagation_communities", oracle=_lpa_oracle(2))
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (LPA, Raghavan
    et al. 2007) run for EXACTLY 2 rounds: each vertex adopts the MOST
    FREQUENT label among its neighbors, smallest label on ties — the
    modularity-free community detector, and a genuinely different
    labeling from connected components (CC merges everything reachable;
    LPA splits a component along its dense cores). Plain LPA iterates
    asynchronously with random tie-breaks; pinning the round count,
    synchronous updates, and the (count DESC, label ASC) tie order makes
    every intermediate state deterministic, so the unrolled DuckDB CTE
    reproduces it exactly (the graph_cc_rounds trick).

    Per round: one vertex-key equi-join of the label table against the
    materialized edge base, a (vertex, label) count aggregate, and a
    per-vertex top-1 expressed as max_by(lbl, (cnt, -lbl)) — a second
    combine-enabled hash aggregate instead of a per-vertex sort window,
    so both round stages take map-side partials and nothing sorts.
    Labels stay O(V), edges are never re-derived (iter_materialize).
    Same iterative scale shape as pagerank: co-partitioned on the vertex
    key, nothing collected, rounds extend to convergence on a cluster.
    """
    # Round-12 note: the adjacency-array base (_sym_adjacency) measured
    # 1.16× SLOWER here interleaved (1.790 vs 1.545 min, steal 22) —
    # LPA's single vote round cannot amortize the extra collect_list
    # shuffle the base costs, unlike pagerank/bfs/kcore's 2-3 join
    # rounds. Edge-row form kept; at convergence-depth production runs
    # the adjacency base wins, and flipping it is a 5-line change.
    e = iter_materialize(_edges(spark, sf_dir))
    sym = e.select("src", "dst").unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Round-1 specialization (first-iteration constant folding, the
    # standard Pregel superstep-0 trick): every initial label is the
    # vertex id and sym is duplicate-free BY CONSTRUCTION (_edges ends
    # in distinct() under src < dst, so no (a,b) repeats in either
    # direction on any fixture) — every round-1 vote count is exactly 1
    # and the (cnt DESC, lbl ASC) top-1 is simply the minimum neighbor
    # id. One combine-enabled min-aggregate over the edge base replaces
    # the label join + O(E) vote count + per-vertex window; integer
    # min, so bit-identical to the general round the oracle unrolls.
    labels = iter_materialize(
        sym.groupBy("src")
        .agg(F.min("dst").alias("lbl"))
        .select(F.col("src").alias("vid"), "lbl")
    )
    for _ in range(1):
        votes = (
            sym.join(
                labels.withColumnRenamed("vid", "dst2"),
                F.col("dst") == F.col("dst2"),
            )
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # Top-1 under (cnt DESC, lbl ASC) == argmax of the struct
        # (cnt, -lbl), which is unique per vertex (labels are distinct
        # within a vote group), so max_by is deterministic and
        # order-equivalent to the oracle's ROW_NUMBER pick — but runs as
        # a combine-enabled hash aggregate instead of a per-vertex sort
        # window (map-side partials, no sort, no WindowGroupLimit pass).
        labels = votes.groupBy(F.col("src").alias("vid")).agg(
            F.max_by("lbl", F.struct(F.col("cnt"), (-F.col("lbl")).alias("nl"))).alias("lbl")
        )
        labels = iter_materialize(labels)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled k-core peeling over the symmetric edge set."""
    parts = [
        _EDGES_CTE
        + """
    , sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ),
    a0 AS (SELECT DISTINCT src AS vid FROM sym)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    a{r} AS (
        SELECT s.src AS vid
        FROM sym s
        JOIN a{p} x ON s.src = x.vid
        JOIN a{p} y ON s.dst = y.vid
        GROUP BY s.src
        HAVING COUNT(*) >= {k}
    )"""
        )
    selects = [
        f"SELECT {r} AS peel_round, CAST(COUNT(*) AS BIGINT) AS n_alive FROM a{r}"
        for r in range(1, rounds + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@register("kcore_rounds", oracle=_kcore_oracle(3, 3))
def kcore_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by EXACTLY 3 peeling rounds (k=3): each round
    recomputes degrees over the surviving subgraph and drops vertices
    below k — the density filter that strips hangers-on before community
    detection, and the standard "find the engaged core" cut for social/
    co-occurrence graphs. Fixed round count makes the intermediate
    survivor sets deterministic, so the unrolled CTE reproduces them
    exactly (graph_cc_rounds' trick); full peeling runs rounds to
    fixpoint with iter_materialize cutting lineage.

    Per round: two semi-joins restrict the materialized edge base to the
    surviving subgraph (vertex-key equi-joins, survivor sets O(V)), then
    one combine-enabled degree count — no edge regeneration, no pair
    explosion. Emits survivors per round; a round losing no vertices is
    the converged core.
    """
    # Round 12: adjacency-array loop base (see _sym_adjacency) — round 1's
    # degree is size(nbrs) (map-only; the edge-row form paid a count
    # shuffle), and each peeling round filters the |V|-row base + the
    # exploded neighbors against the survivor set instead of
    # semi-joining the 2|E| edge rows twice. Counts are order-
    # independent — identical survivor sets (oracle green).
    adj = _sym_adjacency(spark, sf_dir)
    alive = None
    counts = []
    for r in range(1, 4):
        if alive is None:
            # Round-1 specialization: the initial survivor set is every
            # vertex (both endpoint filters are identity), so round 1 is
            # a bare projection of the adjacency degree.
            deg = adj.select(F.col("vtx").alias("src"), F.size("nbrs").alias("deg"))
        else:
            deg = (
                adj.join(alive.withColumnRenamed("vid", "sv"), F.col("vtx") == F.col("sv"), "left_semi")
                .select(F.col("vtx").alias("src"), F.explode("nbrs").alias("nb"))
                .join(alive.withColumnRenamed("vid", "dv"), F.col("nb") == F.col("dv"), "left_semi")
                .groupBy("src")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
        alive = iter_materialize(
            deg.where(F.col("deg") >= 3).select(F.col("src").alias("vid"))
        )
        counts.append(
            alive.agg(F.count(F.lit(1)).cast("long").alias("n_alive")).select(
                F.lit(r).alias("peel_round"), "n_alive"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def _bigstar_oracle(rounds: int) -> str:
    """Unrolled alternating large-star / small-star rounds (m = min of
    the closed neighborhood; the seed edges arrive oriented src < dst
    from _EDGES_CTE, every star round re-emits oriented a > b)."""
    parts = [
        _EDGES_CTE
        + """
    , e0 AS (SELECT src AS a, dst AS b FROM edges)"""
    ]
    idx = 0
    for _ in range(rounds):
        for op in ("L", "S"):
            p, idx = idx, idx + 1
            sym = f"""
    sym{idx} AS MATERIALIZED (
        SELECT a AS v, b AS u FROM e{p}
        UNION ALL
        SELECT b AS v, a AS u FROM e{p}
    ),
    m{idx} AS MATERIALIZED (
        SELECT v, LEAST(MIN(u), v) AS m FROM sym{idx} GROUP BY v
    )"""
            if op == "L":
                new = f"""
    e{idx} AS MATERIALIZED (
        SELECT DISTINCT s.u AS a, m.m AS b
        FROM sym{idx} s JOIN m{idx} m ON s.v = m.v
        WHERE s.u > s.v
    )"""
            else:
                new = f"""
    e{idx} AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
            SELECT s.u AS a, m.m AS b
            FROM sym{idx} s JOIN m{idx} m ON s.v = m.v
            WHERE s.u < s.v
            UNION ALL
            SELECT m.v AS a, m.m AS b FROM m{idx} m
        ) WHERE a <> b
    )"""
            parts.append("," + sym + "," + new)
    return (
        "".join(parts)
        + f"""
    SELECT b AS root, CAST(COUNT(DISTINCT a) AS BIGINT) AS n_children
    FROM e{idx} GROUP BY b
    """
    )


@register("graph_cc_bigstar", oracle=_bigstar_oracle(2))
def graph_cc_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the algorithm that replaces min-label propagation at extreme scale:
    each operation is one neighborhood min-aggregate + one re-keyed edge
    emission, and the alternation contracts components in O(log n)
    rounds instead of O(diameter) (graph_cc_rounds' propagation walks
    the diameter; a 10^9-vertex path graph never finishes that way).
    large-star hangs every larger neighbor off the neighborhood minimum;
    small-star re-hangs the smaller ones; every star round re-emits
    edges oriented a > b (the seed set arrives src < dst and both
    engines symmetrize it identically), so the pair space only shrinks.

    Run for exactly 2 alternating rounds with the intermediate edge sets
    deterministic (pure integer min/join/distinct), so the unrolled CTE
    oracle reproduces the exact parent multiset — same fixed-depth trick
    as graph_cc_rounds/bfs_distances; production runs to fixpoint with
    iter_materialize cutting lineage per round. Per round nothing wider
    than (vertex, vertex) int pairs crosses an exchange.
    """
    e = iter_materialize(_edges(spark, sf_dir)).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    for op in ("L", "S", "L", "S"):
        e = star_op(e, op)
    return e.groupBy(F.col("b").alias("root")).agg(
        F.count_distinct("a").cast("long").alias("n_children")
    )


def star_op(e: DataFrame, op: str) -> DataFrame:
    """One large-star ("L") or small-star ("S") operation over an (a, b)
    edge DataFrame, result materialized (lineage cut per round). Shared by
    graph_cc_bigstar's fixed unrolling and bigstar_fixpoint below."""
    sym = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    m = sym.groupBy("v").agg(F.least(F.min("u"), F.col("v")).alias("m"))
    if op == "L":
        out = (
            sym.join(m, "v")
            .where(F.col("u") > F.col("v"))
            .select(F.col("u").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
    else:
        smaller = (
            sym.join(m, "v")
            .where(F.col("u") < F.col("v"))
            .select(F.col("u").alias("a"), F.col("m").alias("b"))
        )
        selfrow = m.select(F.col("v").alias("a"), F.col("m").alias("b"))
        out = (
            smaller.unionAll(selfrow)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
    return iter_materialize(out)


def bigstar_fixpoint(e: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Alternating large-star / small-star run to CONVERGENCE over an
    (a, b) edge DataFrame: returns the final star edges, child ``a`` →
    component-minimum root ``b`` (Kiveris et al.'s fixpoint — every
    component contracts to a star rooted at its minimum vertex in
    O(log n) alternations). Convergence is detected by edge-set
    stability (symmetric-difference count 0 after an L,S pair); each
    round's edges are materialized, so the check costs one count over an
    O(E) integer-pair set, never a lineage replay.

    graph_cc_bigstar keeps its fixed 2-round unrolling (that is what its
    CTE oracle replicates); this fixpoint form is the production path
    and the independent labeling that dedup_clusters_verify checks label
    propagation against."""
    e = iter_materialize(e)
    for _ in range(max_rounds):
        new = star_op(star_op(e, "L"), "S")
        changed = (
            new.join(e, ["a", "b"], "left_anti")
            .unionAll(e.join(new, ["a", "b"], "left_anti"))
            .count()
        )
        e = new
        if changed == 0:
            break
    return e
