"""Calendar-spine and change-history operators: gap detection over a
generated date spine, SCD2 interval construction, and rolling-window
distinct counts — the warehouse-pipeline trio that pure per-row queries
can't express without row *generation* or interval logic.

Scale posture: the generated spine is O(days) — always broadcastable; the
SCD2 build is one window pass over the change log; the rolling distinct
count is honest about being a range join at exact semantics (the 100 TB
path swaps the exact countDistinct for an HLL sketch per day, which turns
it into a mergeable aggregate — documented on the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_date_spine",
    oracle="""
    WITH span AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
             CAST(MAX(o_orderdate) AS DATE) AS d1
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    active AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
    )
    SELECT CAST(s.day AS VARCHAR) AS missing_day
    FROM spine s LEFT JOIN active a ON s.day = a.day
    WHERE a.day IS NULL
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-gap detection: generate the complete day spine over the
    order-date span (F.sequence + explode — row generation, a surface no
    scan-only query exercises) and anti-join the days that actually have
    orders. The spine is O(days) regardless of fact volume, so Spark
    broadcasts it; the fact side reduces to a distinct-day aggregate whose
    output is equally tiny. Day output is string-cast on both engines
    (DATE widens to datetime64 through DuckDB's pandas bridge)."""
    o = _t(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    spine = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    active = o.select(F.col("o_orderdate").cast("date").alias("day")).distinct()
    return (
        spine.join(active, "day", "left_anti")
        .select(F.col("day").cast("string").alias("missing_day"))
    )


@query(
    "q_scd2",
    oracle="""
    SELECT o_custkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS valid_from,
           CAST(CAST(lead(o_orderdate) OVER w AS DATE) AS VARCHAR) AS valid_to,
           o_orderstatus AS status,
           (lead(o_orderdate) OVER w IS NULL) AS is_current,
           o_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: each customer's
    order events become [valid_from, valid_to) status intervals, the open
    interval flagged current — the standard warehouse history-table build.
    One window pass (lead over the entity's ordered changes), one shuffle
    on the entity key; at 100 TB this is the same single-exchange contract
    as any per-entity sessionization. The unique o_orderkey breaks
    timestamp ties so intervals are deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").cast("string").alias("valid_from"),
        nxt.cast("date").cast("string").alias("valid_to"),
        F.col("o_orderstatus").alias("status"),
        nxt.isNull().alias("is_current"),
        "o_orderkey",
    )


@query(
    "q_rolling_distinct",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT CAST(d.day AS VARCHAR) AS day,
           COUNT(DISTINCT u.user_id) AS wau
    FROM days d
    JOIN ud u ON u.day >= d.day - 6 AND u.day <= d.day
    GROUP BY d.day
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (WAU): the metric COUNT(DISTINCT)
    window frames cannot express in Spark. Exact form: dedupe to (user, day)
    — a fact-scale but heavily-reducing aggregate — then a range join of the
    O(days) day spine against the deduped pairs and a distinct count per
    day. The spine side is tiny so the join broadcasts; work is
    O(active_pairs × 7). At 100 TB the exact distinct stays the expensive
    step — the sketch path replaces it with one HLL per (day) merged over a
    7-day window (approx_count_distinct partials are mergeable), turning
    the whole thing into a single aggregate; this query keeps the exact
    semantics the oracle can check."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    joined = F.broadcast(days.withColumnRenamed("day", "anchor")).join(
        ud, F.col("day").between(F.date_sub(F.col("anchor"), 6), F.col("anchor"))
    )
    return (
        joined.groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("anchor").cast("string").alias("day"), "wau")
    )


@query("q_rolling_distinct_hll")
def q_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of q_rolling_distinct: rolling 7-day users per day
    from MERGED HLL SKETCHES instead of an exact distinct.

    One fact scan builds ONE Datasketches-HLL per day
    (``hll_sketch_agg`` — partials are mergeable, so the map side reduces
    to a sketch per (partition, day) before the shuffle); the day spine
    then range-joins O(days) sketch rows — kilobytes, broadcast — and each
    anchor day unions its 7 daily sketches (``hll_union_agg``) and reads
    the estimate. The fact-scale distinct from the exact form is gone:
    shuffle volume is days × sketch_size regardless of user count. No SQL
    oracle (approximate by construction) — tests/test_sketch_twins.py
    asserts ≤2% relative error vs the exact q_rolling_distinct at sf0.01,
    matching HLL lgConfigK=12's published ~1.6% RSE."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    days = daily.select(F.col("day").alias("anchor"))
    return (
        F.broadcast(days)
        .join(
            daily,
            F.col("day").between(
                F.date_sub(F.col("anchor"), 6), F.col("anchor")
            ),
        )
        .groupBy("anchor")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True)))
            .alias("wau_approx")
        )
        .select(F.col("anchor").cast("string").alias("day"), "wau_approx")
    )


@query(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey, l_shipdate AS s,
             l_shipdate + (CAST(l_quantity AS INT) % 10 + 3) * INTERVAL 1 DAY AS e
      FROM lineitem WHERE l_linenumber = 1
    ),
    marked AS (
      SELECT l_suppkey, s, e,
             CASE WHEN MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ),
    isl AS (
      SELECT l_suppkey, s, e,
             SUM(is_new) OVER (PARTITION BY l_suppkey ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    )
    SELECT l_suppkey, MIN(s) AS merge_start, MAX(e) AS merge_end,
           COUNT(*) AS n_spans
    FROM isl GROUP BY l_suppkey, island
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping [shipdate, receiptdate] intervals per supplier —
    the range-consolidation primitive behind SLA windows, maintenance
    calendars and contiguous-coverage checks. Gaps-and-islands with a
    running MAX(end) over the preceding frame: an interval starts a new
    island iff it begins after every prior interval in the key has ended.
    One shuffle on the key, one per-key sort — the same cost envelope as
    any windowed aggregate; no self-join of intervals ever happens (the
    naive overlap join is quadratic per key). Interval end is derived from
    the ship date plus a quantity-determined duration (this lineitem has no
    receipt date); restricted to l_linenumber=1 to keep interval
    multiplicity meaningful."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            "l_suppkey",
            F.col("l_shipdate").alias("s"),
            F.expr(
                "l_shipdate + make_dt_interval(CAST(l_quantity AS INT) % 10 + 3, 0, 0, 0)"
            ).alias("e"),
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy("s", "e")
    marked = li.withColumn(
        "is_new",
        F.when(
            F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)) >= F.col("s"),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    isl = marked.withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return isl.groupBy("l_suppkey", "island").agg(
        F.min("s").alias("merge_start"),
        F.max("e").alias("merge_end"),
        F.count(F.lit(1)).alias("n_spans"),
    ).select("l_suppkey", "merge_start", "merge_end", "n_spans")
