"""Statistical / time-series analytics: correlation, OLS regression,
distribution moments, entropy, anomaly scoring, resampling, EWMA, and
winsorization.

These extend the engine past plain aggregation into the descriptive-stats
surface an analytics user (or a training-data curator profiling a corpus)
reaches for next: "are these columns related", "which rows are outliers",
"downsample this event stream", "smooth this series", "trim the tails".

Scale discipline: every query here is a groupBy/window over the natural
analysis key — one shuffle, map-side partial aggregation where Spark
supports it (corr/regr/moments are all declarative AggregateFunctions, so
partials combine on the map side and 100 TB reduces to one narrow exchange
of constant-size state per group). The only collection primitive is q_ewma's
per-entity ordered fold, which is bounded by a single user's history (the
streaming analogue is applyInPandasWithState, tests/test_stateful_streaming).

Float discipline (see registry docstring): results are ROUNDed to a scale
where the two engines' different summation orders cannot diverge; the EWMA
fold is sequential in both engines (identical operation order → identical
bits), so even a 6-decimal round is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import all_oracles, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_stat_corr",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stat_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance/stddev per group, run
    through the SQL-TEXT door: the exact oracle string executes via
    spark.sql (sql_api.run_sql) — parser/analyzer handle it with zero
    translation, the 10th one-string query. All four statistics are
    declarative AggregateFunctions with mergeable co-moment state
    (Welford-style): a single hash aggregate with map-side partials,
    per-group state O(1) regardless of group size — the canonical 100 TB
    aggregation shape."""
    from ..sql_api import run_sql

    return run_sql(spark, sf_dir, all_oracles()["q_stat_corr"])


@query(
    "q_stat_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stat_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (y = extendedprice ~ x = quantity) via the
    SQL-standard REGR_* family — slope, intercept, R² — through the
    SQL-TEXT door (one portable string is engine query AND oracle; the
    11th). Same single-exchange mergeable-state shape as q_stat_corr; a
    regression over a 100 TB fact costs exactly one narrow shuffle of
    per-group co-moments."""
    from ..sql_api import run_sql

    return run_sql(spark, sf_dir, all_oracles()["q_stat_regression"])


@query(
    "q_stat_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, AVG(l_extendedprice) AS mu
      FROM lineitem GROUP BY l_returnflag
    ), s AS (
      SELECT l.l_returnflag,
             COUNT(*) AS n,
             SUM(POWER(l_extendedprice - mu, 2)) AS s2,
             SUM(POWER(l_extendedprice - mu, 3)) AS s3,
             SUM(POWER(l_extendedprice - mu, 4)) AS s4
      FROM lineitem l JOIN m USING (l_returnflag)
      GROUP BY l.l_returnflag
    )
    SELECT l_returnflag,
           ROUND((s3 / n) / POWER(s2 / n, 1.5), 6) AS skewness,
           ROUND((s4 / n) / POWER(s2 / n, 2) - 3, 6) AS kurtosis,
           CAST(n AS BIGINT) AS n
    FROM s
    """,
)
def q_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group. Spark's builtin
    skewness/kurtosis use exactly the population formulas g1 = m3/m2^1.5 and
    g2 = m4/m2² − 3 over central moments, computed in ONE pass with
    mergeable moment state. DuckDB's builtins are *sample*-corrected, so the
    oracle reproduces the population formula two-pass (mean, then centered
    power sums) — a deliberate cross-engine semantics check, not a Spark
    limitation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 6).alias("skewness"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("kurtosis"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_stat_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ), t AS (
      SELECT user_id, c, SUM(c) OVER (PARTITION BY user_id) AS tot
      FROM c
    )
    SELECT user_id,
           ROUND(-SUM((c * 1.0 / tot) * LN(c * 1.0 / tot)), 6) AS entropy,
           COUNT(*) AS n_types
    FROM t
    GROUP BY user_id
    """,
)
def q_stat_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the standard
    behavioral-diversity / bot-detection feature (and, over token or source
    distributions, a corpus-diversity metric). Count per (user, type), a
    window total per user, then −Σ p·ln p. Both shuffles cluster on user_id;
    AQE coalesces the second into the first's partitioning. Entropy terms
    are O(types) per user, not O(events) — state stays tiny at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c").over(Window.partitionBy("user_id"))
    p = F.col("c") / tot
    return (
        c.withColumn("p", p)
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_types"),
        )
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH z AS (
      SELECT event_id, event_type,
             (value - AVG(value) OVER (PARTITION BY event_type))
               / stddev_samp(value) OVER (PARTITION BY event_type) AS z
      FROM events
    )
    SELECT event_id, event_type, ROUND(z, 6) AS zscore
    FROM z WHERE ABS(z) > 3
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging: each event scored against its event_type's
    mean/stddev (one unordered window = whole-partition frame, a single
    shuffle on the type key), keep |z| > 3. The window form computes stats
    and scores in one pass over one exchange — no self-join. For 100 TB with
    few types the per-type state is two doubles; skewed type keys hit the
    same AQE skew-split path as any hot aggregation key. Returns 188 rows at
    sf0.01 (value is exponential-ish) — non-vacuous by construction."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return (
        ev.select("event_id", "event_type", z.alias("z"))
        .where(F.abs(F.col("z")) > 3)
        .select("event_id", "event_type", F.round("z", 6).alias("zscore"))
    )


@query(
    "q_resample_5min",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) AS bin,
             event_type, value, event_id
      FROM events
    )
    SELECT bin, event_type,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS avg_value,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value,
           ROUND(arg_max(value, event_id), 2) AS last_value
    FROM b
    GROUP BY bin, event_type
    """,
)
def q_resample_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling: 5-minute OHLC-style rollup per event type
    (count/avg/min/max plus the value of the latest row, max_by keyed on the
    unique event_id so ties cannot flap). The bin is integer epoch//300 —
    epoch-aligned in both engines, no timezone or calendar dependence. One
    hash aggregate; output is O(bins × types) regardless of input volume, so
    resampling 100 TB of raw events is scan-bound with a tiny shuffle.
    ts scans as TIMESTAMP_NTZ; NTZ→LTZ under the pinned-UTC session is
    value-preserving and matches DuckDB's epoch() on the same naive value."""
    ev = _t(spark, sf_dir, "events")
    tsec = F.col("ts").cast("timestamp").cast("double")
    b = ev.select(
        F.floor(tsec / 300).cast("long").alias("bin"),
        "event_type",
        "value",
        "event_id",
    )
    return b.groupBy("bin", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
    )


@query(
    "q_ewma",
    oracle="""
    SELECT user_id,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α = 0.3) of each user's value
    series, seeded at the first observation — the smoothing primitive behind
    rate limiting, trend detection, and metric dashboards. EWMA is an
    inherently sequential fold, so it is expressed as sort_array(collect_list
    (struct)) + F.aggregate: both engines fold left-to-right in the same
    order, making the result bit-identical (not merely close).

    Scale: state is one user's history — bounded per entity, the same
    contract as any per-entity sessionization; group sizes are data-bounded,
    not volume-bounded. For unbounded streams the incremental form
    s' = αx + (1−α)s runs under applyInPandasWithState (streaming/stateful
    .py) with O(1) state; this batch query is its replayable oracle."""
    ev = _t(spark, sf_dir, "events")
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    g = ev.groupBy("user_id").agg(
        arr.alias("_arr"), F.count(F.lit(1)).alias("n_events")
    )
    vals = F.transform(F.col("_arr"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return g.select(
        "user_id", F.round(ewma, 6).alias("ewma"), "n_events"
    )


# Count-min sketch geometry + hash family (odd multiplicative constants —
# FNV offset basis, FNV prime, 2^32/φ — distinct from training.py's family
# so bucket decisions are independent of the sampling operators').
_CMS_D = ((0, 2166136261), (1, 16777619), (2, 2654435769))
_CMS_W = 512
_CMS_PREMOD = 2147483648  # 2^31: keeps (id % 2^31) * mult inside int64
_CMS_MOD = 4294967296  # 2^32
_CMS_THRESHOLD = 75


def _cms_rows_sql() -> str:
    return " UNION ALL ".join(f"SELECT {r} AS r, {m} AS mult" for r, m in _CMS_D)


@query(
    "q_heavy_hitters_cms",
    oracle=f"""
    WITH rows3 AS ({_cms_rows_sql()}),
    bucketed AS (
      SELECT r, ((user_id % {_CMS_PREMOD}) * mult) % {_CMS_MOD} % {_CMS_W}
               AS bucket
      FROM events CROSS JOIN rows3
    ),
    cms AS (SELECT r, bucket, COUNT(*) AS c FROM bucketed GROUP BY r, bucket),
    keys AS (SELECT user_id, COUNT(*) AS true_count FROM events
             GROUP BY user_id),
    est AS (
      SELECT k.user_id, k.true_count, MIN(c.c) AS est_count
      FROM keys k
      CROSS JOIN rows3 r3
      JOIN cms c
        ON c.r = r3.r
       AND c.bucket = ((k.user_id % {_CMS_PREMOD}) * r3.mult)
                      % {_CMS_MOD} % {_CMS_W}
      GROUP BY k.user_id, k.true_count
    )
    SELECT user_id, CAST(est_count AS BIGINT) AS est_count, true_count
    FROM est WHERE est_count > {_CMS_THRESHOLD}
    """,
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection through a count-min sketch (Cormode &
    Muthukrishnan 2005, public knowledge): d=3 hash rows × w=512 counters,
    est(key) = min over rows of its bucket count — an overestimate, never
    an under. The sketch build is a groupBy over (row, bucket): mergeable,
    map-side combinable, and O(d·w) state TOTAL regardless of key
    cardinality — the property that lets 100 TB of events fit in 1536
    counters where an exact per-key count needs a key-cardinality shuffle.
    The probe side broadcasts the finished sketch (tiny by construction)
    onto the candidate keys. Hashing is the same portable multiplicative
    family as training.py, so the oracle replays bucket decisions exactly;
    true_count rides along to exhibit the one-sided error (est ≥ true)."""
    ev = _t(spark, sf_dir, "events")

    def bucket(col, mult: int):
        return ((col.cast("long") % F.lit(_CMS_PREMOD)) * F.lit(mult)) % F.lit(
            _CMS_MOD
        ) % F.lit(_CMS_W)

    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), bucket(F.col("user_id"), m).alias("bucket")
                )
                for r, m in _CMS_D
            ]
        )
    ).alias("rb")
    cms = (
        ev.select(rb)
        .select("rb.r", "rb.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    probes = keys.select(
        "user_id",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket(F.col("user_id"), m).alias("bucket"),
                    )
                    for r, m in _CMS_D
                ]
            )
        ).alias("pb"),
    )
    est = (
        probes.join(
            F.broadcast(cms),
            (probes.pb.r == cms.r) & (probes.pb.bucket == cms.bucket),
        )
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("est_count"))
    )
    return est.filter(F.col("est_count") > _CMS_THRESHOLD).select(
        "user_id", "est_count", "true_count"
    )


@query(
    "q_winsorize",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS q05,
             quantile_cont(l_extendedprice, 0.95) AS q95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(AVG(l.l_extendedprice), 4) AS avg_raw,
           ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, q.q05), q.q95)), 4)
             AS avg_winsor,
           ROUND(MIN(q.q05), 4) AS p05,
           ROUND(MIN(q.q95), 4) AS p95
    FROM lineitem l JOIN q USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean: clamp each group's values into its own [p05, p95]
    before averaging — the robust-mean step that keeps a handful of huge
    outliers from dominating a metric.

    Plan: SINGLE lineitem scan. The per-group quantiles are computed as
    window aggregates (``percentile(...) OVER (PARTITION BY l_returnflag)``)
    so the clamp sees p05/p95 on the same pass, and the final groupBy reuses
    the window's hash partitioning — one scan, one shuffle total
    (plan-asserted in tests/test_plans.py). Note exact-percentile partial
    buffers hold every value, so the old aggregate-then-broadcast-rejoin
    form shuffled the same bytes AND paid a second full fact scan; at
    100 TB swap the window percentile for approx_percentile partials
    (see q_agg_approx_quantile) to shrink the shuffle too."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag")
    q05 = F.expr("percentile(l_extendedprice, 0.05)").over(w)
    q95 = F.expr("percentile(l_extendedprice, 0.95)").over(w)
    clamped = li.select(
        "l_returnflag",
        "l_extendedprice",
        q05.alias("q05"),
        q95.alias("q95"),
    ).withColumn(
        "winsor",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("q05")), F.col("q95")),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("avg_raw"),
        F.round(F.avg("winsor"), 4).alias("avg_winsor"),
        F.round(F.min("q05"), 4).alias("p05"),
        F.round(F.min("q95"), 4).alias("p95"),
    )


@query(
    "q_holt_trend",
    oracle="""
    WITH RECURSIVE
    series AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id
    ),
    step AS (
      SELECT user_id, vs, 2 AS i,
             CASE WHEN len(vs) = 1 THEN vs[1] ELSE vs[2] END AS l,
             CASE WHEN len(vs) = 1 THEN 0.0e0 ELSE vs[2] - vs[1] END AS b
      FROM series
      UNION ALL
      SELECT user_id, vs, i + 1,
             0.4e0 * vs[i+1] + 0.6e0 * (l + b),
             0.3e0 * ((0.4e0 * vs[i+1] + 0.6e0 * (l + b)) - l) + 0.7e0 * b
      FROM step WHERE i < len(vs)
    )
    SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
           ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
           ROUND(l + b, 6) AS forecast
    FROM step WHERE i >= len(vs)
    """,
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (α=0.4, β=0.3) per user: level +
    trend state folded over the time-ordered value series, one-step-ahead
    forecast = level + trend. Initialization: level₂ = x₂, trend₂ = x₂ − x₁
    (textbook), degenerate 1-point series → (x₁, 0).

    Like q_ewma, the recurrence is inherently sequential, so it runs as
    sort_array(collect_list(struct)) + a single F.aggregate fold with a
    STRUCT accumulator; the level expression is repeated inside the trend
    update (not let-bound) so both engines execute the identical operation
    sequence and a 6-decimal round is exact. The oracle states the same
    recurrence as a recursive CTE rather than list_reduce: DuckDB's
    list_reduce aliases a struct accumulator's already-updated fields into
    later field expressions of the same iteration (observed: trend reads
    the NEW level from iteration 2 on), so a lambda-fold oracle diverges —
    the CTE reads only the previous row's state and is unambiguous. State
    per group is one user's history — the same bounded-entity contract as
    q_ewma; the O(1) streaming twin would carry (level, trend) in
    applyInPandasWithState."""
    ev = _t(spark, sf_dir, "events")
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    g = ev.groupBy("user_id").agg(arr.alias("_arr"))
    vals = F.transform(F.col("_arr"), lambda s: s["value"])
    x1 = F.element_at(vals, 1)
    x2 = F.element_at(vals, 2)
    rest = F.slice(vals, F.lit(3), F.greatest(F.size(vals) - 2, F.lit(0)))
    init = F.struct(x2.alias("a"), (x2 - x1).alias("b"))
    lvl = lambda acc, x: F.lit(0.4) * x + F.lit(0.6) * (acc["a"] + acc["b"])  # noqa: E731
    folded = F.aggregate(
        rest,
        init,
        lambda acc, x: F.struct(
            lvl(acc, x).alias("a"),
            (
                F.lit(0.3) * (lvl(acc, x) - acc["a"]) + F.lit(0.7) * acc["b"]
            ).alias("b"),
        ),
    )
    st = F.when(F.size(vals) == 1, F.struct(x1.alias("a"), F.lit(0.0).alias("b"))).otherwise(
        folded
    )
    return g.select(
        "user_id",
        F.size(vals).cast("long").alias("n_events"),
        F.round(st["a"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["a"] + st["b"], 6).alias("forecast"),
    )


@query(
    "q_theta_sketch",
    oracle="""
    WITH a_items AS (
      SELECT DISTINCT o_custkey AS id FROM orders WHERE o_totalprice > 250000
    ), b_items AS (
      SELECT DISTINCT c_custkey AS id FROM customer WHERE c_acctbal > 5000
    ), ha AS (
      SELECT DISTINCT list_reduce(
        list_transform(range(1, 14), j -> CAST(strpos('0123456789abcdef',
            substr(md5(CAST(id AS VARCHAR)), CAST(j AS INTEGER), 1)) - 1
          AS BIGINT)),
        (acc, d) -> acc * 16 + d) AS h
      FROM a_items
    ), hb AS (
      SELECT DISTINCT list_reduce(
        list_transform(range(1, 14), j -> CAST(strpos('0123456789abcdef',
            substr(md5(CAST(id AS VARCHAR)), CAST(j AS INTEGER), 1)) - 1
          AS BIGINT)),
        (acc, d) -> acc * 16 + d) AS h
      FROM b_items
    ), ska AS (SELECT h FROM ha ORDER BY h LIMIT 128),
    skb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
    sku AS (
      SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
      ORDER BY h LIMIT 128
    ), sa AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM ska),
    sb AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM skb),
    su AS (SELECT COUNT(*) AS n, MAX(h) AS mx FROM sku),
    thetas AS (
      SELECT LEAST(
        CASE WHEN sa.n < 128 THEN 4503599627370496 ELSE sa.mx END,
        CASE WHEN sb.n < 128 THEN 4503599627370496 ELSE sb.mx END
      ) AS t FROM sa, sb
    ), icnt AS (
      SELECT COUNT(*) AS c FROM (
        SELECT h FROM ska INTERSECT SELECT h FROM skb
      ) i, thetas WHERE i.h < thetas.t
    )
    SELECT 'distinct_a' AS metric,
           ROUND(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                      ELSE CAST(127 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                           / CAST(mx AS DOUBLE) END, 4) AS est,
           (SELECT COUNT(*) FROM a_items) AS exact
    FROM sa
    UNION ALL
    SELECT 'distinct_b',
           ROUND(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                      ELSE CAST(127 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                           / CAST(mx AS DOUBLE) END, 4),
           (SELECT COUNT(*) FROM b_items)
    FROM sb
    UNION ALL
    SELECT 'union',
           ROUND(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                      ELSE CAST(127 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                           / CAST(mx AS DOUBLE) END, 4),
           (SELECT COUNT(*) FROM (SELECT id FROM a_items UNION
                                  SELECT id FROM b_items))
    FROM su
    UNION ALL
    SELECT 'intersection',
           ROUND(CAST(icnt.c AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                 / CAST(thetas.t AS DOUBLE), 4),
           (SELECT COUNT(*) FROM (SELECT id FROM a_items INTERSECT
                                  SELECT id FROM b_items))
    FROM icnt, thetas
    UNION ALL
    SELECT 'difference',
           ROUND(CAST(dcnt.c AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
                 / CAST(thetas.t AS DOUBLE), 4),
           (SELECT COUNT(*) FROM (SELECT id FROM a_items EXCEPT
                                  SELECT id FROM b_items))
    FROM (
      SELECT COUNT(*) AS c FROM (
        SELECT h FROM ska EXCEPT SELECT h FROM skb
      ) e, thetas WHERE e.h < thetas.t
    ) dcnt, thetas
    """,
)
def q_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta distinct-count sketches with SET OPERATIONS — the
    capability HLL union lacks: an INTERSECTION estimate
    (|SA ∩ SB ∩ [0,θ)| / θ with θ = min(θ_A, θ_B); Beyer et al. 2007 /
    the DataSketches theta algebra). Each segment keeps its k=128 smallest
    distinct hash values (TakeOrderedAndProject — per-partition k-mins
    merge on one tiny exchange, the mergeable-sketch property); a segment
    with fewer than k distinct items degrades to the EXACT set with θ=1
    (segment B at sf0.001 exercises that branch, A the estimating one).
    Hashes are the first 13 hex chars of md5 — 52 exact bits that Spark
    (conv base16) and DuckDB (digit fold) reproduce bit-identically, so
    the whole estimator is deterministic and the oracle checks it
    hash-exact, unlike the engine-specific HLL/CMS sketch paths. Scalar
    thetas broadcast (1-row BNLJ, allowlisted); every estimate divides
    exact integers on the 2^52 grid, rounded at 4dp on both engines."""
    K = 128
    P52 = 4503599627370496  # 2^52

    def hashed(df, idcol):
        return df.select(
            F.conv(
                F.substring(F.md5(F.col(idcol).cast("string")), 1, 13), 16, 10
            )
            .cast("long")
            .alias("h")
        ).distinct()

    # Each segment's distinct-key frame feeds FOUR consumers (its own
    # exact count, the union row, and the intersection/difference exact
    # counts), so uncheckpointed the scan + distinct exchange re-executed
    # four times per segment. The checkpoint holds the post-distinct keys
    # — O(distinct ids), already shuffled — not the base scan.
    a_items = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    b_items = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ska = hashed(a_items, "id").orderBy("h").limit(K).localCheckpoint(eager=True)
    skb = hashed(b_items, "id").orderBy("h").limit(K).localCheckpoint(eager=True)
    sku = ska.unionByName(skb).distinct().orderBy("h").limit(K)

    theta = lambda n, mx: F.when(n < K, F.lit(P52)).otherwise(mx)  # noqa: E731
    est = lambda n, mx: F.round(  # noqa: E731
        F.when(n < K, n.cast("double")).otherwise(
            F.lit(float(K - 1)) * F.lit(float(P52)) / mx
        ),
        4,
    )

    def seg_row(sk, name, exact_df):
        stats = sk.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
        exact = exact_df.agg(F.count(F.lit(1)).alias("exact"))
        return stats.crossJoin(exact).select(
            F.lit(name).alias("metric"),
            est(F.col("n"), F.col("mx")).alias("est"),
            F.col("exact").cast("long").alias("exact"),
        )

    union_items = a_items.unionByName(b_items).distinct()
    thetas = (
        ska.agg(F.count(F.lit(1)).alias("na"), F.max("h").alias("mxa"))
        .crossJoin(skb.agg(F.count(F.lit(1)).alias("nb"), F.max("h").alias("mxb")))
        .select(
            F.least(
                theta(F.col("na"), F.col("mxa")), theta(F.col("nb"), F.col("mxb"))
            ).alias("t")
        )
    )
    icnt = (
        ska.join(skb, "h", "left_semi")
        .crossJoin(F.broadcast(thetas))
        .filter(F.col("h") < F.col("t"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    inter_exact = a_items.join(b_items, "id", "left_semi").agg(
        F.count(F.lit(1)).alias("exact")
    )
    inter_row = icnt.crossJoin(thetas).crossJoin(inter_exact).select(
        F.lit("intersection").alias("metric"),
        F.round(
            F.col("c").cast("double") * F.lit(float(P52)) / F.col("t"), 4
        ).alias("est"),
        F.col("exact").cast("long").alias("exact"),
    )
    # difference A \ B: below θ the sketches are complete, so anti-join
    # membership is exact — |{h ∈ SA \ SB : h < θ}| / θ
    dcnt = (
        ska.join(skb, "h", "left_anti")
        .crossJoin(F.broadcast(thetas))
        .filter(F.col("h") < F.col("t"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    diff_exact = a_items.join(b_items, "id", "left_anti").agg(
        F.count(F.lit(1)).alias("exact")
    )
    diff_row = dcnt.crossJoin(thetas).crossJoin(diff_exact).select(
        F.lit("difference").alias("metric"),
        F.round(
            F.col("c").cast("double") * F.lit(float(P52)) / F.col("t"), 4
        ).alias("est"),
        F.col("exact").cast("long").alias("exact"),
    )
    return (
        seg_row(ska, "distinct_a", a_items)
        .unionByName(seg_row(skb, "distinct_b", b_items))
        .unionByName(seg_row(sku, "union", union_items))
        .unionByName(inter_row)
        .unionByName(diff_row)
    )
