"""Product-analytics extensions: path analysis, A/B testing, conversion
latency — the queries an analytics user of the reference's event stream
runs the day after the funnel/retention basics (plans/relational.py's
q_funnel / q_retention / q_event_transitions).

Scale discipline: everything here is windows + mergeable aggregates on the
user_id clustering the event table already wants; output sizes are
O(paths), O(groups), O(1) — never O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS e1, e2, e3, COUNT(*) AS n
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY event_type, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 15
    """,
)
def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths: the 15 most common 3-step behavior sequences
    (lead-window trigrams per user, tie-broken on the unique event_id).
    One shuffle on user_id for the windows, then a mergeable trigram count
    whose output is bounded by |event_types|³ regardless of volume; the
    final ordering is a TakeOrdered top-k, not a global sort."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(15)
    )


@query(
    "q_ab_test",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), g AS (
      SELECT grp, COUNT(*) AS n, SUM(converted) AS conv
      FROM assign GROUP BY grp
    ), wide AS (
      SELECT CAST(MAX(CASE WHEN grp = 0 THEN n END) AS BIGINT) AS n_control,
             CAST(MAX(CASE WHEN grp = 0 THEN conv END) AS BIGINT) AS conv_control,
             CAST(MAX(CASE WHEN grp = 1 THEN n END) AS BIGINT) AS n_treatment,
             CAST(MAX(CASE WHEN grp = 1 THEN conv END) AS BIGINT) AS conv_treatment
      FROM g
    )
    SELECT n_control, conv_control, n_treatment, conv_treatment,
           ROUND(conv_control * 1.0 / n_control, 6) AS rate_control,
           ROUND(conv_treatment * 1.0 / n_treatment, 6) AS rate_treatment,
           ROUND(
             (conv_treatment * 1.0 / n_treatment
              - conv_control * 1.0 / n_control)
             / SQRT(((conv_control + conv_treatment) * 1.0
                     / (n_control + n_treatment))
                    * (1 - (conv_control + conv_treatment) * 1.0
                           / (n_control + n_treatment))
                    * (1.0 / n_control + 1.0 / n_treatment)),
             6) AS z_stat
    FROM wide
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test: users hash-split into control/treatment
    (user_id parity — deterministic, the hash-assignment discipline of
    training.py), per-user conversion flags, pooled two-proportion
    z-statistic. The whole experiment readout is two mergeable aggregates
    and O(1) arithmetic — at 100 TB the cost is one scan; the statistics
    never leave constant space."""
    ev = _t(spark, sf_dir, "events")
    # conversion = a HIGH-VALUE purchase, so pooled rate sits strictly
    # inside (0,1) — every user makes some purchase in this data, and a
    # degenerate 0%/100% rate zeroes the z denominator
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("grp"), "converted")
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_control"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("conv_control"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_treatment"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("conv_treatment"),
    )
    p0 = F.col("conv_control") / F.col("n_control")
    p1 = F.col("conv_treatment") / F.col("n_treatment")
    pooled = (F.col("conv_control") + F.col("conv_treatment")) / (
        F.col("n_control") + F.col("n_treatment")
    )
    z = (p1 - p0) / F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_control") + 1 / F.col("n_treatment"))
    )
    return wide.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.round(p0, 6).alias("rate_control"),
        F.round(p1, 6).alias("rate_treatment"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "q_mom_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS revenue
      FROM orders GROUP BY 1
    )
    SELECT CAST(month AS VARCHAR) AS month, revenue,
           ROUND(lag(revenue) OVER (ORDER BY month), 2) AS prev_revenue,
           ROUND((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) * 100, 4)
             AS pct_change
    FROM m
    """,
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup, then a lag window
    for the period-over-period delta — the standard KPI dashboard query.
    The heavy aggregate reduces the fact table to O(months) rows first, so
    the single-partition ordering window runs over dozens of rows, not the
    corpus (same discipline as llm_vocab_build's global ranking)."""
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month")
        )
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100
            ).alias("revenue")
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        F.col("month").cast("string").alias("month"),
        "revenue",
        F.round(prev, 2).alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("pct_change"),
    )


@query(
    "q_funnel_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), lat AS (
      SELECT e.user_id,
             MIN(epoch(e.ts) - epoch(v.first_view)) AS latency_s
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(latency_s, 0.5), 3) AS p50_s,
           ROUND(quantile_cont(latency_s, 0.9), 3) AS p90_s,
           ROUND(AVG(latency_s), 3) AS mean_s
    FROM lat
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: per user, seconds from first view to first
    subsequent purchase; report conversion count and latency percentiles —
    the funnel's "how fast", complementing q_funnel's "how many". The
    per-user MIN aggregates are mergeable; the percentile buffer holds one
    number per converted user (swap percentile_approx at extreme scale)."""
    ev = _t(spark, sf_dir, "events")
    tsec = F.col("ts").cast("timestamp").cast("double")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(tsec).alias("first_view"))
    )
    lat = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", tsec.alias("pt"))
        .join(v, "user_id")
        .where(F.col("pt") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min(F.col("pt") - F.col("first_view")).alias("latency_s"))
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 3).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 3).alias("p90_s"),
        F.round(F.avg("latency_s"), 3).alias("mean_s"),
    )


@query("q_funnel_latency_approx")
def q_funnel_latency_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of q_funnel_latency: identical funnel, but latency
    quantiles come from ``approx_percentile`` (Greenwald-Khanna, accuracy
    10000 → ≤0.01% rank error) whose partial state is a CONSTANT-size
    summary that merges map-side, instead of an exact percentile buffer
    holding one value per converted user. At fact scale the exact buffer
    is O(users) on a single reducer; the sketch keeps the final aggregate
    O(1). No SQL oracle (approximate by construction) —
    tests/test_sketch_twins.py asserts ≤5% relative error vs the exact
    twin at sf0.01."""
    ev = _t(spark, sf_dir, "events")
    tsec = F.col("ts").cast("timestamp").cast("double")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(tsec).alias("first_view"))
    )
    lat = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", tsec.alias("pt"))
        .join(v, "user_id")
        .where(F.col("pt") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min(F.col("pt") - F.col("first_view")).alias("latency_s"))
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(
            F.approx_percentile("latency_s", F.lit(0.5), F.lit(10000)), 3
        ).alias("p50_s"),
        F.round(
            F.approx_percentile("latency_s", F.lit(0.9), F.lit(10000)), 3
        ).alias("p90_s"),
        F.round(F.avg("latency_s"), 3).alias("mean_s"),
    )


@query(
    "q_cumulative_reach",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT d0, COUNT(*) AS new_users FROM first_day GROUP BY d0
    )
    SELECT CAST(d0 AS VARCHAR) AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY d0
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative user reach: each user counted once on their first-seen
    day, then a running total — the growth curve every launch dashboard
    leads with. Computing reach as cumsum-of-first-appearances costs two
    mergeable aggregates plus a window over O(days) rows; the naive
    per-day COUNT(DISTINCT user so far) would rescan history per day."""
    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("timestamp")).cast("date").alias("d0")
    )
    per_day = first_day.groupBy("d0").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d0").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH first_m AS (
      SELECT user_id, CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT e.user_id, f.cohort,
             (EXTRACT(year FROM e.ts) * 12 + EXTRACT(month FROM e.ts))
             - (EXTRACT(year FROM f.cohort) * 12
                + EXTRACT(month FROM f.cohort)) AS age_m,
             e.value
      FROM events e JOIN first_m f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    )
    SELECT CAST(cohort AS VARCHAR) AS cohort,
           CAST(age_m AS BIGINT) AS age_m,
           COUNT(DISTINCT user_id) AS n_buyers,
           ROUND(SUM(value), 2) AS revenue
    FROM rev GROUP BY cohort, age_m
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen month,
    purchase revenue accumulated per cohort-age month — the LTV triangle
    behind payback-period decisions, completing q_retention's activity
    triangle with money. Month age is integer (year×12+month) arithmetic
    on both engines — no fractional months_between, no calendar edge
    cases. Two aggregates + one join on the user clustering; output is
    O(cohorts × ages)."""
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    month_idx = F.year(ts) * 12 + F.month(ts)
    first_m = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min(ts)).cast("date").alias("cohort")
    )
    cohort_idx = F.year("cohort") * 12 + F.month("cohort")
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", month_idx.alias("em"), "value")
        .join(first_m, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.col("em") - cohort_idx).cast("long").alias("age_m"),
            "value",
        )
    )
    return rev.groupBy("cohort", "age_m").agg(
        F.countDistinct("user_id").alias("n_buyers"),
        F.round(F.sum("value"), 2).alias("revenue"),
    ).select(
        F.col("cohort").cast("string").alias("cohort"),
        "age_m",
        "n_buyers",
        "revenue",
    )


@query(
    "llm_dataset_card",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                                    x -> length(x) > 0))) AS BIGINT)
             AS n_tokens,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 1) AS p50_chars,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 1) AS p95_chars
    FROM documents
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-query dataset card: corpus size, language/source diversity,
    token volume, and length distribution — the summary block every
    dataset release ships. Single scan, one aggregate; the only
    non-constant state is the exact length-percentile buffer (swap
    percentile_approx at 100 TB)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(
            F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)"), 1
        ).alias("p50_chars"),
        F.round(
            F.expr("percentile(CAST(n_chars AS DOUBLE), 0.95)"), 1
        ).alias("p95_chars"),
    )


@query("llm_dataset_card_sketch")
def llm_dataset_card_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of llm_dataset_card: every non-constant-memory
    aggregate swapped for its mergeable sketch — ``approx_count_distinct``
    (HLL++, rsd 1%) for language/source diversity, ``approx_percentile``
    for the length distribution — so the whole card is one scan with O(1)
    aggregate state per partition. No SQL oracle (approximate by
    construction) — tests/test_sketch_twins.py asserts the diversity
    counts are exact at this cardinality (5 langs / 6 sources ≪ HLL error
    onset) and percentiles within 5% of the exact card."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    nchars = F.col("n_chars").cast("double")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.approx_count_distinct("lang", 0.01).alias("n_langs"),
        F.approx_count_distinct("source", 0.01).alias("n_sources"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(
            F.approx_percentile(nchars, F.lit(0.5), F.lit(10000)), 1
        ).alias("p50_chars"),
        F.round(
            F.approx_percentile(nchars, F.lit(0.95), F.lit(10000)), 1
        ).alias("p95_chars"),
    )


@query(
    "q_seq_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2,
             LEAD(ts, 2) OVER w AS ts2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_matches,
           MIN(ts) AS first_match_ts
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      AND ts2 <= ts + INTERVAL 1 DAY
    GROUP BY user_id
    """,
)
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-pattern detection (MATCH_RECOGNIZE-lite): per user,
    CONTIGUOUS view→click→purchase runs completing within one day —
    contiguity encodes 'nothing else happened in between' without any
    between-events join. Implemented as two LEADs over one (user, time)
    window: a single shuffle + per-key sort, the same plan family as
    q_event_transitions, then a map-side-combinable rollup. Deterministic
    ordering via the (ts, event_id) tie-break in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    matched = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (F.col("ts2") <= F.col("ts") + F.expr("INTERVAL 1 DAY"))
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )


@query(
    "q_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value, 0 AS _side
      FROM events WHERE event_type IN ('view', 'click', 'signup')
      UNION ALL
      SELECT user_id, ts, event_id, event_type, value, 1 AS _side
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT user_id, event_type, value, _side,
             first_value(CASE WHEN _side = 0 THEN event_type END IGNORE NULLS)
               OVER w AS first_touch,
             last_value(CASE WHEN _side = 0 THEN event_type END IGNORE NULLS)
               OVER w AS last_touch
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, _side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    conv AS (SELECT * FROM filled WHERE _side = 1)
    SELECT model, touch_type, COUNT(*) AS n_conversions,
           ROUND(SUM(value), 2) AS revenue
    FROM (
      SELECT 'first' AS model, COALESCE(first_touch, '(none)') AS touch_type,
             value FROM conv
      UNION ALL
      SELECT 'last', COALESCE(last_touch, '(none)'), value FROM conv
    )
    GROUP BY model, touch_type
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch AND last-touch revenue attribution in one pass: every
    purchase's value credits the user's earliest (first-touch model) and
    most recent (last-touch model) preceding view/click/signup event.

    Same one-shuffle union + windowed ignorenulls-fill skeleton as the as-of
    joins — no join of conversions back to touches, so a user with 10k
    touches costs a sort, not a fan-out. Purchases with no preceding touch
    report as '(none)' instead of silently dropping (the honest row every
    attribution report needs). Output: (model, touch_type) rollup."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "ts", "event_id", "event_type", "value", F.lit(0).alias("_side"))
    convs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "event_type", "value", F.lit(1).alias("_side")
    )
    tagged = touches.unionByName(convs)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_type = F.when(F.col("_side") == 0, F.col("event_type"))
    filled = tagged.select(
        "user_id",
        "value",
        "_side",
        F.first(touch_type, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch_type, ignorenulls=True).over(w).alias("last_touch"),
    )
    conv = filled.filter(F.col("_side") == 1)
    # one pass: each conversion contributes its first- AND last-touch row
    # via explode — a unionByName of two selects planned the event-window
    # subtree (the query's one shuffle) twice, once per model branch
    per_model = conv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("model"),
                    F.coalesce("first_touch", F.lit("(none)")).alias(
                        "touch_type"
                    ),
                    F.col("value"),
                ),
                F.struct(
                    F.lit("last").alias("model"),
                    F.coalesce("last_touch", F.lit("(none)")).alias(
                        "touch_type"
                    ),
                    F.col("value"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    return per_model.groupBy("model", "touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )


@query(
    "q_survivorship",
    oracle="""
    SELECT user_id,
           ROUND((MAX(CASE WHEN event_type = 'purchase'
                      THEN struct_pack(ts := ts, event_id := event_id,
                                       v := value) END)).v, 2)
             AS last_purchase_value,
           (MAX(CASE WHEN event_type = 'error'
                THEN struct_pack(ts := ts, event_id := event_id) END)).ts
             AS last_error_ts,
           MAX(ts) AS last_seen_ts,
           COUNT(*) AS n_records
    FROM events GROUP BY user_id
    """,
)
def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship: one consolidated row per entity carrying,
    for each attribute, the value from the LATEST record that actually has
    it (last purchase amount, last error time, last activity), nulls where
    the entity never produced one — the master-data-management merge step
    after entity resolution.

    Pattern: conditional MAX over a (ts, event_id, payload) struct — struct
    comparison is lexicographic, so 'latest record wins, deterministic
    tie-break' is a plain aggregate in both engines. One map-side-combinable
    shuffle; no per-attribute self-joins, no windows — this is the shape
    that survives a billion entities."""
    ev = load_table(spark, sf_dir, "events")
    last_purchase = F.max(
        F.when(
            F.col("event_type") == "purchase",
            F.struct(F.col("ts"), F.col("event_id"), F.col("value").alias("v")),
        )
    )["v"]
    last_error = F.max(
        F.when(
            F.col("event_type") == "error",
            F.struct(F.col("ts"), F.col("event_id")),
        )
    )["ts"]
    return ev.groupBy("user_id").agg(
        F.round(last_purchase, 2).alias("last_purchase_value"),
        last_error.alias("last_error_ts"),
        F.max("ts").alias("last_seen_ts"),
        F.count(F.lit(1)).alias("n_records"),
    )
