"""Graph analytics over a derived edge list: degree centrality and an
iterative (unrolled) weighted PageRank.

The graph is the nation-level trade network implicit in the star schema:
an edge (supplier nation → customer nation) weighted by shipped revenue,
i.e. the TPC-H Q7 join shape aggregated to a 25×25 adjacency list. This is
the standard "big fact table → small graph → iterative algorithm" pattern:
the expensive part is one fact-scale aggregation (scan-bound at 100 TB,
dimension joins all broadcast); the iterations then run on the aggregated
graph, which is O(nations²) — driver-trivial here, and still executor-cheap
for million-node graphs since each iteration is one equi-join + groupBy on
the edge list. Companion iterative op: llm_dedup_cc (pointer-jumping
connected components, plans/llm.py).

The PageRank oracle unrolls the same three iterations as CTEs, so the
driver hash gate checks the *fixpoint trajectory*, not just the final
ranking. Both engines ignore dangling-node mass (this graph has none —
every nation ships something) and use damping 0.85 from the original
PageRank formulation (Brin & Page 1998, public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

#: Edge weight in 1e-4-dollar INTEGER units (cents × discount-pct): integer
#: summation is order-independent, so the fact-scale aggregate underneath
#: every graph query is bit-identical across engines and runs at any SF —
#: a float SUM's order-dependent error at sf1 (~5e-4 over 240k rows/edge)
#: crossed the 2-dp rounding grid of q_graph_degree. int64 headroom: the
#: total trade volume in these units is ~2.8e14 at sf1; overflow needs
#: sf~30000.
_EDGE_SQL = """
    SELECT n1.n_name AS src, n2.n_name AS dst,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS w
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
"""


#: rows per partition for graph-sized iteration stages: small enough that a
#: partition's join+agg state fits comfortably in executor memory, large
#: enough that a 625-edge nation graph collapses to a single task.
GRAPH_ROWS_PER_PARTITION = 1_000_000


def graph_stage_partitions(
    n_edges: int, rows_per_partition: int = GRAPH_ROWS_PER_PARTITION
) -> int:
    """Partition target for iterative graph stages, derived from the edge
    count: ceil(n_edges / rows_per_partition), min 1. The nation graph
    (625 edges) gets 1 — iteration over a 64-partition exchange was pure
    scheduling overhead — while a 50M-edge graph gets 50 tasks per
    iteration instead of a single straggler."""
    return max(1, -(-max(0, n_edges) // rows_per_partition))


def _bcast_if_table_small(df: DataFrame, sf_dir: str, table: str) -> DataFrame:
    """Broadcast gate from parquet-FOOTER row counts (zero Spark jobs —
    footers are the catalog statistics) for UNFILTERED dims whose slim
    projection is build-side material: supplier/customer key→nationkey
    maps here. 16 M rows × ~16 B ≈ 256 MB, the same executor-memory cap
    _broadcast_if_small uses; past it the join degrades to AQE's shuffle
    strategies — at a true-100 TB customer count the hint simply vanishes."""
    from ..sources.tables import table_row_count

    return F.broadcast(df) if table_row_count(sf_dir, table) <= 16_000_000 else df


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src nation, dst nation, revenue weight) edge list.

    ZERO fact-scale shuffles when the dims fit — orders joins as the same
    footer-gated SLIM broadcast as supplier/customer (o_orderkey→o_custkey,
    2 longs; the gate reads parquet footer row counts — zero jobs — and
    vanishes past 16 M rows ≈ 256 MB of build side, so a true-100 TB
    orders table degrades to the orderkey sort-merge join this used to
    hard-code). Below the gate the whole edge build is one lineitem scan
    with three broadcast hash joins and a map-side partial aggregate; the
    only exchange carries ≤ nations² combined rows per task — bytes. The
    final (supplier-nation, customer-nation) aggregate partial-combines
    map-side to ≤ nations² rows per task, so its exchange is bytes.

    An eager per-(orderkey, supplier-nation) pre-aggregate was measured
    and REJECTED here: ~4 lineitems/order with mostly-distinct suppliers
    means it collapses almost nothing and just adds a second fact-sized
    exchange (sf10: 56 s vs 22 s container-normalized without it)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("_cnat")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("_snat")
    )
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("src")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("dst")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    li_slim = li.select("l_orderkey", "l_suppkey", rev.alias("_rev"))
    per_nat = (
        li_slim.join(
            _bcast_if_table_small(orders, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast_if_table_small(cust, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            _bcast_if_table_small(supp, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("_snat", "_cnat")
        .agg(F.sum("_rev").alias("w"))
    )
    return (
        per_nat.join(F.broadcast(n1), F.col("_snat") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("_cnat") == F.col("c_nkey"))
        .select("src", "dst", "w")
    )


@query(
    "q_graph_degree",
    oracle=f"""
    WITH e AS ({_EDGE_SQL}),
    both_dirs AS (
      SELECT src AS nation, 1 AS outd, 0 AS ind,
             w AS outw, CAST(0 AS BIGINT) AS inw FROM e
      UNION ALL
      SELECT dst AS nation, 0, 1, CAST(0 AS BIGINT), w FROM e
    )
    SELECT nation,
           CAST(SUM(outd) AS BIGINT) AS out_degree,
           CAST(SUM(ind) AS BIGINT) AS in_degree,
           ROUND(CAST(SUM(outw) AS DOUBLE) / 10000, 2) AS out_weight,
           ROUND(CAST(SUM(inw) AS DOUBLE) / 10000, 2) AS in_weight
    FROM both_dirs
    GROUP BY nation
    """,
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality of the trade graph: per nation, how many distinct
    partner nations it supplies / buys from and the revenue in each
    direction. Single pass over the edge list via explode-of-structs — the
    earlier unionAll of two selects DUPLICATED the whole fact-scale edge
    subtree (Catalyst plans each union branch independently and no
    ReusedExchange fired: 12 scans / 2 edge aggregations in the round-9
    before-plan, plans/r09/q_graph_degree_before.txt); the explode emits
    both endpoint rows from ONE edge build, so the lineitem join+aggregate
    runs exactly once (6 scans / 1 edge aggregation after)."""
    e = _trade_edges(spark, sf_dir)
    zero = F.lit(0).cast("long")
    one, nil = F.lit(1), F.lit(0)
    return (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("nation"),
                        one.alias("outd"),
                        nil.alias("ind"),
                        F.col("w").alias("outw"),
                        zero.alias("inw"),
                    ),
                    F.struct(
                        F.col("dst").alias("nation"),
                        nil.alias("outd"),
                        one.alias("ind"),
                        zero.alias("outw"),
                        F.col("w").alias("inw"),
                    ),
                )
            ).alias("x")
        )
        .select("x.*")
        .groupBy("nation")
        .agg(
            F.sum("outd").alias("out_degree"),
            F.sum("ind").alias("in_degree"),
            F.round(F.sum("outw").cast("double") / 10000, 2).alias("out_weight"),
            F.round(F.sum("inw").cast("double") / 10000, 2).alias("in_weight"),
        )
    )


def _pagerank_oracle() -> str:
    """Unroll 3 damped iterations as CTEs r1..r3 over the normalized edges."""
    d = 0.85
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(
            f"""r{i} AS (
      SELECT nodes.n, (1 - {d}) / nn.n_nodes
             + {d} * COALESCE(SUM({prev}.r * en.p), 0) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN en ON en.dst = nodes.n
      LEFT JOIN {prev} ON {prev}.n = en.src
      GROUP BY nodes.n, nn.n_nodes
    )"""
        )
        prev = f"r{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH e AS ({_EDGE_SQL}),
    outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
    en AS (SELECT e.src, e.dst, e.w / o.ow AS p
           FROM e JOIN outw o ON e.src = o.src),
    nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
    nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    r0 AS (SELECT n, 1.0 / nn.n_nodes AS r FROM nodes CROSS JOIN nn),
    {chain}
    SELECT n AS nation, ROUND(r, 6) AS pagerank FROM r3
    """


@query("q_graph_pagerank", oracle=_pagerank_oracle())
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, damping 0.85, 3 iterations, on the trade graph:
    r'(v) = (1−d)/N + d·Σ_{u→v} r(u)·w(u,v)/out_w(u). Implemented as the
    canonical DataFrame loop — normalize edge weights once, then each
    iteration is one equi-join (ranks ⋈ edges on src) + groupBy(dst). The
    rank table is O(nodes), so Spark broadcasts it into each iteration's
    join; the edge list never moves. The oracle replays the identical
    unrolled trajectory, making the iterative operator hash-checkable."""
    # Cache the edge list ITSELF (≤ nations² rows): everything downstream —
    # normalization, node set, all three iterations — derives from it, so
    # the fact-scale join+aggregation materializes exactly once per call
    # (uncached, the en subtree and the nodes.count() subtree each re-ran
    # the full edge build). The coalesce right-sizes the iteration stages
    # to the GRAPH's cardinality, not the fact table's shuffle-partition
    # conf — 3 iterations over 625 rows across 64-partition exchanges was
    # pure scheduling overhead (measured 4.1s → ~1s at sf0.1). The target
    # is DERIVED from the edge count (graph_stage_partitions), so a
    # million-edge graph automatically gets proportionally more partitions
    # — the count is read from the cache forced below, never a second scan.
    e0 = _trade_edges(spark, sf_dir).cache()
    n_edges = e0.count()  # forces the single cached materialization
    e = e0.coalesce(graph_stage_partitions(n_edges))
    d = 0.85
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    en = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select(F.col("dst").alias("n")))
        .distinct()
    )
    n_nodes = nodes.count()
    ranks = nodes.select("n", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(3):
        contrib = (
            en.join(F.broadcast(ranks), en.src == ranks.n)
            .select(F.col("dst").alias("n"), (F.col("r") * F.col("p")).alias("c"))
            .groupBy("n")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = nodes.join(F.broadcast(contrib), "n", "left").select(
            "n",
            (
                F.lit((1 - d) / n_nodes)
                + F.lit(d) * F.coalesce(F.col("mass"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select(F.col("n").alias("nation"), F.round("r", 6).alias("pagerank"))


@query(
    "q_graph_triangles",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (SELECT u, v FROM pairs WHERE w >= 2),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
      SELECT a AS node FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the co-purchase graph (parts appearing in
    >= 2 shared orders), the clustering-coefficient numerator.

    The engine runs the DEGREE-ORDERED forward algorithm (public standard:
    Schank & Wagner / Latapy): orient every undirected edge from the
    (degree, id)-smaller endpoint to the larger, enumerate wedges among
    out-neighbors, close them with one equi-join. Degree orientation bounds
    every node's out-degree by O(sqrt(|E|)) on skewed graphs — the hub that
    would generate deg² wedges under id-ordering generates almost none —
    which is what keeps the wedge fan-out tractable at 100 TB. The basket
    self-join that builds the edge list carries the same Σ basket² skew
    hazard as q_copurchase_pairs, so the same cap_basket guard truncates
    pathological baskets first (no-op on TPC-H's ≤7-line orders,
    property-tested; the guard's window rides the self-join's own
    l_orderkey shuffle). The oracle states the same triangle set with the
    naive id-ordered 3-way self-join; identical per-node counts from two
    different algorithms is the check."""
    from ..operators.skew import cap_basket
    from .relational import BASKET_PAIR_CAP

    li = cap_basket(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
        ["l_partkey"],
        BASKET_PAIR_CAP,
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        # The edge list feeds THREE consumers before the orientation is even
        # computed (the degree table — twice via its endpoint unpivot — and
        # the degree-annotation join), so uncheckpointed the basket
        # self-join that builds it executed FIVE times inside the fwd
        # materialization. O(|E|) rows; at scale the edge list is a
        # persisted artifact anyway.
        .localCheckpoint(eager=False)
    )
    # one pass over the edge list: explode both endpoints (a unionAll of two
    # selects would plan the edge subtree twice — same fix as q_graph_degree)
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # annotate both endpoints with degree (deg is node-domain-sized: broadcast)
    e = (
        edges.join(F.broadcast(deg.withColumnRenamed("node", "u")
                               .withColumnRenamed("deg", "du")), "u")
        .join(F.broadcast(deg.withColumnRenamed("node", "v")
                          .withColumnRenamed("deg", "dv")), "v")
    )
    fwd = e.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d"),
                     F.col("du").alias("ds"), F.col("dv").alias("dd")),
        )
        .otherwise(
            F.struct(F.col("v").alias("s"), F.col("u").alias("d"),
                     F.col("dv").alias("ds"), F.col("du").alias("dd"))
        )
        .alias("o")
    ).select("o.s", "o.d", "o.dd")
    # The oriented edge list feeds THREE consumers (wedge sides + closure);
    # checkpoint it so the basket self-join that builds it runs once, not
    # three times — at scale the edge list is a persisted artifact anyway.
    fwd = fwd.localCheckpoint(eager=False)
    e1, e2 = fwd.alias("e1"), fwd.alias("e2")
    wedges = e1.join(e2, F.col("e1.s") == F.col("e2.s")).filter(
        (F.col("e1.dd") < F.col("e2.dd"))
        | ((F.col("e1.dd") == F.col("e2.dd")) & (F.col("e1.d") < F.col("e2.d")))
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.d").alias("b"),
        F.col("e2.d").alias("c"),
    )
    closing = fwd.select(F.col("s").alias("b"), F.col("d").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    # one pass: each triangle contributes all three corners via explode —
    # the earlier unionAll of three selects re-executed the wedge+closure
    # joins three times (6 SortMergeJoins in the round-9 before-plan,
    # plans/r09/q_graph_triangles_before.txt; 2 after)
    nodes = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "q_graph_sssp",
    oracle=f"""
    WITH RECURSIVE trade AS ({_EDGE_SQL}),
    ranked AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM trade WHERE src <> dst
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rn <= 3),
    walk(n, hops) AS (
      SELECT CAST('NATION_0' AS VARCHAR), 0
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.n
      WHERE w.hops < 25
    )
    SELECT n AS nation, MIN(hops) AS hops FROM walk GROUP BY n
    """,
)
def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths (BFS hop count) from NATION_0 over the
    top-3-partners trade graph — the iterative frontier-expansion pattern
    PageRank's fixed unroll cannot express, because the round count is
    DATA-DEPENDENT (loop until the frontier is empty). Each round is one
    equi-join (frontier ⋈ edges on src) + an anti-join against settled
    nodes; rounds are bounded by the graph's diameter, so the driver loop
    runs O(diameter) actions, NOT O(nodes) — the same discipline as
    llm_dedup_cc's pointer jumping (O(log d) rounds), which proved the
    shape at sf10. The top-3 sparsification (row_number per src, ties on
    dst name) makes the hop structure non-trivial: the dense trade graph
    is 1-hop-everywhere.

    The oracle replays BFS as a DuckDB recursive CTE with UNION-distinct
    termination on the (node, hops) lattice. Unreachable nations are
    absent from both sides by construction."""
    from pyspark.sql import Window

    e0 = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w3 = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    edges = (
        e0.withColumn("rn", F.row_number().over(w3))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
        .coalesce(1)  # ≤ 3·nations rows: one task per iteration stage
        .cache()
    )
    edges.count()  # materialize once; every round reuses the cached graph

    settled = spark.createDataFrame([("NATION_0", 0)], "nation string, hops int")
    frontier = settled
    for hop in range(1, 26):  # diameter bound; exits on empty frontier
        nxt = (
            F.broadcast(frontier)
            .join(edges, frontier.nation == edges.src)
            .select(F.col("dst").alias("nation"))
            .distinct()
            .join(settled, "nation", "left_anti")
            .select("nation", F.lit(hop).alias("hops"))
            .localCheckpoint(eager=True)  # cut the lineage per round
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled
