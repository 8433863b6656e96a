"""Temporal join operators: as-of join and time-range join.

Spark has no native as-of/range join (the reference delegates all
relational work to Spark, SURVEY.md §2.1 closing note — these are part
of the driver-mandated extension surface for event-stream analytics).
Both are implemented as compositions of built-in operators chosen for
their shuffle shape, not as UDFs:

  q55  as-of join     — union both sides into one frame, one window
                        pass per key (the "union trick"): each
                        purchase picks up the most recent strictly-
                        prior click of the same user.
  q59  range join     — equi-join on coarse time buckets, then the
                        exact range predicate: candidate space is
                        O(rows x buckets-overlapped), never the
                        O(n x m) inequality-join cartesian.

Scale design (100 TB):
  - q55 is ONE shuffle keyed by user_id followed by an in-partition
    sort — the minimum possible data movement for an as-of join; a
    naive ``a JOIN b ON a.key = b.key AND b.ts <= a.ts`` + argmax
    shuffles the full inequality cross product (every click pairs with
    every later purchase of that user) before pruning it.
  - q59's bucket key bounds each candidate group by construction; the
    exact predicate runs inside whole-stage codegen after the hash
    join. Bucket width trades shuffle fan-out (finer) against
    candidate width (coarser) and is a literal, so Catalyst constant-
    folds it into the join key expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .caching import persist_tracked
from .registry import query
from .tables import load_table


# --------------------------------------------------------------------------
# q55 — as-of join (purchases to most recent prior click per user)
# --------------------------------------------------------------------------
@query(
    "q55_asof_join",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
w AS (
  SELECT *,
    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_event_id,
    last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts_us
  FROM ev
)
SELECT event_id AS purchase_id,
       user_id,
       ts_us    AS purchase_ts_us,
       value    AS purchase_value,
       click_event_id,
       click_ts_us,
       CAST(ts_us - click_ts_us AS BIGINT) AS gap_us
FROM w
WHERE event_type = 'purchase'
""",
    tags=("temporal", "asof", "window"),
)
def q55_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union trick: both event roles live in one
    frame, so a single window pass per user — ordered by (ts_us,
    event_id), frame ``UNBOUNDED PRECEDING .. 1 PRECEDING`` — carries
    each purchase the latest strictly-prior click (composite order
    makes same-microsecond ties deterministic). Purchases with no
    prior click keep NULL, the as-of LEFT semantics.

    This is how kdb/Flink-style as-of joins map onto Spark: the
    alternative inequality-join + argmax materializes every
    (click, later purchase) pair through the shuffle. DuckDB's native
    ``ASOF JOIN`` expresses the same operator; the oracle uses the
    identical window formulation instead because ASOF leaves
    same-timestamp ties unspecified."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("click_event_id", click_id)
        .withColumn("click_ts_us", click_ts)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("value").alias("purchase_value"),
            "click_event_id",
            "click_ts_us",
            (F.col("ts_us") - F.col("click_ts_us")).cast("long").alias("gap_us"),
        )
    )


# --------------------------------------------------------------------------
# q59 — time-range join via bucketed equi-join
# --------------------------------------------------------------------------
_RANGE_US = 1_800_000_000  # pair events within 30 minutes
_BUCKET_US = 1_800_000_000  # bucket width == range => probe 2 buckets


@query(
    "q59_range_join_bucketed",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events
),
err AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
pur AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_id,
       e.event_id AS error_id,
       p.user_id,
       CAST(p.ts_us - e.ts_us AS BIGINT) AS lag_us
FROM pur p
JOIN err e
  ON p.user_id = e.user_id
 AND e.ts_us <= p.ts_us
 AND p.ts_us - e.ts_us <= {_RANGE_US}
""",
    tags=("temporal", "range-join"),
)
def q59_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — purchases paired with every error by the same user
    in the preceding 10 minutes — executed as a bucketed equi-join:
    each error lands in its time bucket and its successor (bucket
    width == range, so a qualifying pair is never more than one bucket
    apart), the join is an equi-join on (user_id, bucket), and the
    exact range predicate prunes inside codegen. Spark would otherwise
    plan the inequality join as BroadcastNestedLoopJoin / cartesian —
    the classic range-join blowup this operator exists to avoid
    (tests/test_plans.py pins SortMergeJoin/ShuffledHashJoin and bans
    the nested-loop plans). Duplicate-free by construction: an
    (error, purchase) pair matches in exactly one of the two probe
    buckets."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    bucket = lambda c: F.expr(f"{c} DIV {_BUCKET_US}")  # integer division: exact  # noqa: E731
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_us").alias("err_ts_us"),
        F.explode(
            F.array(bucket("ts_us"), bucket("ts_us") + 1)
        ).alias("bucket"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("pur_ts_us"),
        bucket("ts_us").alias("bucket"),
    )
    return (
        pur.join(err, ["user_id", "bucket"])
        .filter(
            (F.col("err_ts_us") <= F.col("pur_ts_us"))
            & (F.col("pur_ts_us") - F.col("err_ts_us") <= _RANGE_US)
        )
        .select(
            "purchase_id",
            "error_id",
            "user_id",
            (F.col("pur_ts_us") - F.col("err_ts_us")).cast("long").alias("lag_us"),
        )
    )


# --------------------------------------------------------------------------
# q75 — time-series gap-fill + forward fill (resample to an hourly grid)
# --------------------------------------------------------------------------
_HOUR_US = 3_600_000_000


@query(
    "q75_gapfill_ffill",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // {_HOUR_US} AS h,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(range(mn, mx + 1)) AS h FROM bounds
),
joined AS (
  SELECT g.event_type, g.h,
         coalesce(a.n_events, 0) AS n_events,
         a.sum_cents
  FROM grid g LEFT JOIN hourly a USING (event_type, h)
)
SELECT event_type,
       CAST(h AS BIGINT) AS hour_idx,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events = 0 AS BIGINT) AS is_gap,
       CAST(last_value(sum_cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS filled_cents
FROM joined
""",
    tags=("temporal", "gapfill", "window"),
)
def q75_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: events are rolled up to an hourly grid
    per event_type, missing hours are materialized from a generated
    per-type min..max hour sequence, and the last observed hourly
    value is carried forward into the gaps (forward fill) — the
    standard resample/ffill operator a feature-engineering pipeline
    needs before windowed model inputs.

    Scale: the raw 100 TB event stream collapses FIRST via a
    (type, hour) partial-then-final hash aggregate — everything after
    that operates on the grid, whose size is #types x #hours (time-
    bounded, not data-bounded). The gap grid is a generated sequence
    (no scan), the fill window partitions by type over hours, and the
    left join is broadcast-friendly because both sides are grid-sized.
    Value sums are exact integer cents so the fill is bit-stable."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) DIV {_HOUR_US}").alias("h"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("h"))
    )
    joined = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "sum_cents",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("h").cast("long").alias("hour_idx"),
        "n_events",
        (F.col("n_events") == 0).cast("long").alias("is_gap"),
        F.last("sum_cents", ignorenulls=True).over(w).cast("long").alias("filled_cents"),
    )


# --------------------------------------------------------------------------
# q85 — trailing-window anomaly detection (integer-exact squared z-score)
# --------------------------------------------------------------------------
_AN_LOOKBACK = 24  # trailing hours
_AN_Z2_Q6 = 1_000_000  # flag |z| >= 1 (z^2 >= 1 on the 1e-6 grid; synthetic
#   traffic is near-uniform, so a production |z|>=3 gate would never fire here)
# z² saturation ceiling on the 1e-6 grid (= z ≥ 1000σ, reported as
# exactly 1e12). Why a cap exists at all: Spark's IntegralDivide on
# DECIMAL operands returns BIGINT and silently WRAPS past 2^63 even
# under ANSI (probed on 4.1.2: 1.04e24 DIV 1 → garbage), while
# DuckDB's HUGEINT // only fails at the final BIGINT cast — so an
# uncapped degenerate tail (near-constant history + a multi-million-σ
# spike) would silently diverge across engines. The CASE compares
# dev_sq against (n·var_num)·cap BEFORE dividing, all in
# DECIMAL(38,0)/HUGEINT, so the ELSE quotient is provably < cap ≪
# 2^63 and exact in both engines.
_AN_Z2_CAP = 10**12


@query(
    "q85_hourly_anomalies",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // {_HOUR_US} AS h,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, h, cnt,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(cnt) OVER w AS BIGINT) AS s,
         sum(CAST(cnt AS HUGEINT) * cnt) OVER w AS ss
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {_AN_LOOKBACK} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_type, h, cnt, n, s,
         n * ss - CAST(s AS HUGEINT) * s AS var_num,
         CAST(n * cnt - s AS HUGEINT) * (n * cnt - s) AS dev_sq
  FROM stats
  WHERE n = {_AN_LOOKBACK} AND n * ss - CAST(s AS HUGEINT) * s > 0
)
SELECT event_type,
       CAST(h AS BIGINT) AS hour_idx,
       cnt,
       CAST((CAST(s AS HUGEINT) * 1000) // n AS BIGINT) AS mean_q3,
       CAST(CASE WHEN dev_sq >= n * var_num * {_AN_Z2_CAP // 1_000_000}
                 THEN {_AN_Z2_CAP}
                 ELSE (dev_sq * 1000000) // (n * var_num) END AS BIGINT)
         AS z2_q6
FROM scored
WHERE CASE WHEN dev_sq >= n * var_num * {_AN_Z2_CAP // 1_000_000}
           THEN {_AN_Z2_CAP}
           ELSE (dev_sq * 1000000) // (n * var_num) END >= {_AN_Z2_Q6}
""",
    tags=("temporal", "anomaly", "window"),
)
def q85_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag anomalous traffic hours: each (event_type, hour) count is
    z-scored against the trailing {_AN_LOOKBACK}-hour window and hours
    with |z| >= 1 surface (threshold is a literal; production would gate at 2-3) — the streaming-ops anomaly monitor, here in
    its batch/backfill form. The squared z-score is computed entirely
    in integers: z² = (n·x − Σ)² / (n·Σx² − Σ²) (one integer floor
    division on the 1e-6 grid), so no float variance ever crosses the
    engine boundary. The quadratic intermediates (Σx², Σ², (n·x−Σ)²
    and the ×1e6 scaling) are the r12 q98 overflow class — dev_sq·1e6
    crosses int64 at ~1.3e5 events per hour-cell against a near-empty
    window, and Σx² at ~6e8 — so they are computed in DECIMAL(38,0)
    (DuckDB: HUGEINT) in lockstep, exact to ~1e38; both engines
    floor-divide positives identically, so the BIGINT output grid is
    value-identical below 2^63 (r13 audit of the q98 bug class).

    Scale: the raw stream collapses FIRST to (type, hour) counts via a
    partial-then-final aggregate; the trailing window then runs over
    grid-sized data partitioned by event_type — frame arithmetic is
    O(#hours) per type regardless of event volume. Same two-phase
    shape as q75's gap-fill; the two compose into a backfill-then-
    monitor pipeline."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type", F.expr(f"unix_micros(ts) DIV {_HOUR_US}").alias("h")
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_AN_LOOKBACK, -1)
    )
    stats = hourly.select(
        "event_type",
        "h",
        "cnt",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("cnt").over(w).cast("long").alias("s"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt")).over(w).alias("ss"),
    )
    var_num = F.expr("n * ss - CAST(s AS DECIMAL(38,0)) * s")
    scored = stats.filter(
        (F.col("n") == _AN_LOOKBACK) & (var_num > 0)
    ).select(
        "event_type",
        "h",
        "cnt",
        "n",
        "s",
        var_num.alias("var_num"),
        F.expr(
            "CAST(n * cnt - s AS DECIMAL(38,0)) * (n * cnt - s)"
        ).alias("dev_sq"),
    )
    z2 = (
        f"CAST(CASE WHEN dev_sq >= n * var_num * {_AN_Z2_CAP // 1_000_000} "
        f"THEN {_AN_Z2_CAP} "
        f"ELSE (dev_sq * 1000000) DIV (n * var_num) END AS BIGINT)"
    )
    return scored.select(
        "event_type",
        F.col("h").cast("long").alias("hour_idx"),
        "cnt",
        F.expr("CAST((CAST(s AS DECIMAL(38,0)) * 1000) DIV n AS BIGINT)").alias("mean_q3"),
        F.expr(z2).alias("z2_q6"),
    ).filter(F.col("z2_q6") >= _AN_Z2_Q6)


# --------------------------------------------------------------------------
# q105 — conversion-latency quantiles (as-of join ∘ histogram quantiles)
# --------------------------------------------------------------------------
_CL_BUCKET_S = 600  # 10-minute latency buckets
_CL_PCTS = (50, 90, 99)


@query(
    "q105_conversion_latency",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('click', 'purchase')
),
w AS (
  SELECT *,
    last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts_us
  FROM ev
),
lat AS (
  SELECT (ts_us - click_ts_us) // 1000000 // {_CL_BUCKET_S} AS bucket
  FROM w WHERE event_type = 'purchase' AND click_ts_us IS NOT NULL
),
hist AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM lat GROUP BY 1),
cum AS (
  SELECT bucket, c,
         CAST(sum(c) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rt,
         CAST(sum(c) OVER () AS BIGINT) AS tot
  FROM hist
)
{" UNION ALL ".join(
    "SELECT CAST(" + str(p) + " AS BIGINT) AS q_pct, "
    "CAST(min(bucket) * " + str(_CL_BUCKET_S) + " AS BIGINT) AS latency_lo_s, "
    "CAST(max(tot) AS BIGINT) AS n_pairs "
    "FROM cum WHERE rt * 100 >= tot * " + str(p)
    for p in _CL_PCTS
)}
""",
    tags=("temporal", "asof", "quantile", "composition"),
)
def q105_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency SLO report: p50/p90/p99 of the time between
    each purchase and the user's latest prior click — the as-of join
    (q55's single-window union trick) composed with histogram-based
    quantiles (q81's discipline: NO global sort; the quantile is the
    first {_CL_BUCKET_S}-second bucket whose running count crosses the
    percentile threshold, integer arithmetic end to end).

    Scale: one user-keyed window pass for the as-of pairing, one hash
    aggregate to the bucket histogram (bucket count ≤ observed-latency
    range / {_CL_BUCKET_S}s — metadata-sized), and the cumulative
    window runs over that tiny histogram, not the data."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    paired = ev.withColumn(
        "click_ts_us",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
        ).over(w),
    )
    lat = paired.filter(
        (F.col("event_type") == "purchase") & F.col("click_ts_us").isNotNull()
    ).select(
        F.expr(
            f"(ts_us - click_ts_us) DIV 1000000 DIV {_CL_BUCKET_S}"
        ).alias("bucket")
    )
    hist = lat.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cw = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # persisted (r15): each percentile leg filters this metadata-sized
    # cumulative histogram — without persist every leg re-ran the
    # full events window pass + histogram aggregate (3 corpus passes)
    cum = hist.select(
        "bucket",
        F.sum("c").over(cw).cast("long").alias("rt"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("tot"),
    ).transform(persist_tracked)
    out = None
    for p in _CL_PCTS:
        row = (
            cum.filter(F.expr(f"rt * 100 >= tot * {p}"))
            .agg(
                F.min(F.expr(f"bucket * {_CL_BUCKET_S}"))
                .cast("long")
                .alias("latency_lo_s"),
                F.max("tot").cast("long").alias("n_pairs"),
            )
            .select(
                F.lit(p).cast("long").alias("q_pct"), "latency_lo_s", "n_pairs"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
