"""Relational query corpus (SURVEY.md §2.2 + §7 Phase 1).

The reference implements no relational operators of its own — every
query over its streaming DataFrame is executed by Spark SQL/Catalyst
(SURVEY.md §2.1 closing note). This module pins down that delegated
surface as oracle-checked queries over the driver's star schema:
projection+cast (reference README.md:66-67,89), filter
(PubsubConnectorTest.scala:218-219), union (:275), plus the standard
OLAP set (agg, joins of all shapes, top-k windows, rollup, scalar
functions, from_json, event-time windows, sessionization).

All double-valued aggregates use the exact integer-scaled technique
from ``functions.exact`` so Spark and the DuckDB oracle agree
bit-for-bit regardless of summation order.

Scale notes are inline per query; the common ones:
  - dimension joins (region/nation) are explicitly broadcast;
  - fact-fact joins rely on AQE for skew/partition sizing;
  - aggregates are expressed so map-side partial aggregation applies;
  - filters/projections sit directly on the scan so Catalyst pushes
    them into parquet (verified in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exact import eavg, esum, sql_eavg, sql_esum
from ..functions.textops import sql_tokens, tokens
from .caching import persist_tracked
from .registry import query
from .tables import load_table

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


# --------------------------------------------------------------------------
# q01 — flagship: TPC-H Q1-style pricing summary (SURVEY.md §7 Phase 0)
# --------------------------------------------------------------------------
def _q01_oracle() -> str:
    # Factory, not a baked f-string: re-composes per access so the
    # exact-agg accumulator knob (SPARK_GRAFT_EXACT_ACC /
    # set_accumulator_mode, functions/exact.py) flips this oracle and
    # the Spark plan in lockstep — pinned by test_exact_agg_mode_knob.
    return f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_esum("l_quantity", 2, "sum_qty")},
  {sql_esum("l_extendedprice", 2, "sum_base_price")},
  {sql_esum(_DISC_PRICE, 4, "sum_disc_price")},
  {sql_esum(_CHARGE, 6, "sum_charge")},
  {sql_eavg("l_quantity", 2, "avg_qty")},
  {sql_eavg("l_extendedprice", 2, "avg_price")},
  {sql_eavg("l_discount", 2, "avg_disc")},
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query(
    "q01_pricing_summary",
    oracle=_q01_oracle,
    tags=("agg", "flagship"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan aggregate; partial aggregation makes the shuffle tiny
    (6 groups) regardless of input scale — the 100 TB plan is scan-bound."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            esum("l_quantity", 2).alias("sum_qty"),
            esum("l_extendedprice", 2).alias("sum_base_price"),
            esum(disc_price, 4).alias("sum_disc_price"),
            esum(charge, 6).alias("sum_charge"),
            eavg("l_quantity", 2).alias("avg_qty"),
            eavg("l_extendedprice", 2).alias("avg_price"),
            eavg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — projection + casts, the reference's documented message projection
# --------------------------------------------------------------------------
@query(
    "q02_projection_cast",
    oracle="""
SELECT
  CAST(event_id AS VARCHAR)                    AS id_str,
  lower(hex(CAST(props AS BLOB)))              AS data_hex,
  upper(event_type)                            AS event_type_u,
  CAST(round(value * 100, 0) AS BIGINT)        AS value_cents
FROM events
WHERE event_id < 2000
""",
    tags=("projection",),
)
def q02_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirrors `CAST(data AS STRING)` / `CAST(value AS BINARY) as data`
    from the reference README.md:66-67,89 — pure narrow projection, no
    shuffle; the cast chain stays inside whole-stage codegen.

    The binary cast is still exercised, but the exported column is its
    hex encoding: raw bytes crash the driver's pandas canonicalizer
    (`bytearray` is unhashable), so both engines export
    ``lower(hex(...))`` of the same bytes instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") < 2000).select(
        F.col("event_id").cast("string").alias("id_str"),
        F.lower(F.hex(F.col("props").cast("binary"))).alias("data_hex"),
        F.upper("event_type").alias("event_type_u"),
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )


# --------------------------------------------------------------------------
# q03 — filter with compound boolean predicate
# --------------------------------------------------------------------------
@query(
    "q03_filter_predicate",
    oracle="""
SELECT
  o_orderkey,
  o_custkey,
  o_orderstatus,
  o_totalprice,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 200000
  AND o_orderstatus IN ('O', 'F')
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
""",
    tags=("filter",),
)
def q03_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-predicate filter (PubsubConnectorTest.scala:218-219
    analog); all three conjuncts push down to the parquet scan.
    o_totalprice passes through unmodified (identical stored double)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").isin("O", "F")
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
    )


# --------------------------------------------------------------------------
# q04 — union of two streams (reference unionAll test)
# --------------------------------------------------------------------------
@query(
    "q04_union_streams",
    oracle=lambda: f"""
SELECT event_type, count(*) AS n, {sql_esum("value", 2, "sum_value")}
FROM (
  SELECT event_type, value FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT event_type, value FROM events WHERE event_type = 'signup'
)
GROUP BY event_type
""",
    tags=("union",),
)
def q04_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`unionAll` of two differently-filtered scans
    (PubsubConnectorTest.scala:275 analog), then aggregate."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("event_type", "value")
    b = ev.filter(F.col("event_type") == "signup").select("event_type", "value")
    return (
        a.unionAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), esum("value", 2).alias("sum_value"))
    )


# --------------------------------------------------------------------------
# q05 — distinct / exact dedup on the relational side
# --------------------------------------------------------------------------
@query(
    "q05_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def q05_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicates` — hash-aggregate dedup; partial-agg collapses
    duplicates map-side before the shuffle."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .dropDuplicates()
    )


# --------------------------------------------------------------------------
# q06 — top-k per group via ranking window
# --------------------------------------------------------------------------
@query(
    "q06_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
""",
    tags=("window", "topk"),
    bench=True,
)
def q06_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number + filter lets Spark run a
    rank-limit (WindowGroupLimit) before the full sort at scale; the
    o_orderkey tiebreak keeps it deterministic for the oracle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


# --------------------------------------------------------------------------
# q07 — broadcast dimension join chain
# --------------------------------------------------------------------------
@query(
    "q07_join_broadcast",
    oracle=lambda: f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {sql_eavg("c_acctbal", 2, "avg_acctbal")}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    tags=("join", "broadcast"),
)
def q07_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region(5) and nation(25) are broadcast — zero shuffle for the
    joins at any fact-table scale; only the final 25-group agg shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            eavg("c_acctbal", 2).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q08 — fact-fact shuffle join with aggregation
# --------------------------------------------------------------------------
@query(
    "q08_join_shuffle_agg",
    oracle=lambda: f"""
SELECT c_mktsegment, o_orderpriority,
       {sql_esum(_DISC_PRICE, 4, "revenue")},
       count(*) AS n_items
FROM customer
JOIN orders   ON o_custkey  = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_mktsegment, o_orderpriority
""",
    tags=("join", "shuffle"),
    bench=True,
)
def q08_join_shuffle_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem is the scale-critical shuffle join (both sides
    grow with SF); keys are uniform so AQE handles partition sizing.
    customer joins via its key then aggregates to ~20 groups.

    The lineitem scan is widened (r15, guide §2.5): the local
    single-row-group file plans as ONE task, so both broadcast-join
    probes and the partial aggregation serialized on one core
    (interleaved A/B at sf0.1: warm 1.157 → 0.851 s, −26%); column
    pruning pushes through the repartition so the exchange carries
    only the 3 needed columns, and at scale the widen guard is a
    no-op (the scan already yields ≥ parallelism splits)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem", widen=True).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            esum(disc_price, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q09 — left-semi join
# --------------------------------------------------------------------------
@query(
    "q09_semi_join",
    oracle="""
SELECT n_name, count(*) AS n_active_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
""",
    tags=("join", "semi"),
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order, counted per nation. left_semi never
    duplicates rows and only ships the join key — cheapest existence
    check at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


# --------------------------------------------------------------------------
# q10 — left-anti join
# --------------------------------------------------------------------------
@query(
    "q10_anti_join",
    oracle="""
SELECT p_brand, count(*) AS n_unsold_parts
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
""",
    tags=("join", "anti"),
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered, per brand — left_anti against the key
    projection of lineitem."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_unsold_parts"))
    )


# --------------------------------------------------------------------------
# q11 — rollup (grouping sets)
# --------------------------------------------------------------------------
@query(
    "q11_rollup",
    oracle=lambda: f"""
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(n_name, 'ALL') AS nation_name,
       count(c_custkey)        AS n_customers,
       {sql_esum("c_acctbal", 2, "sum_acctbal")}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup"),
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) with totals; NULL grouping keys coalesced
    to 'ALL' so the hash comparison is unambiguous (n_name/r_name are
    never NULL in the data, so no collision with real values)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            esum("c_acctbal", 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


# --------------------------------------------------------------------------
# q12 — scalar function library (string / math / modulo)
# --------------------------------------------------------------------------
@query(
    "q12_scalar_funcs",
    oracle="""
SELECT
  p_partkey,
  upper(p_brand)                  AS brand_u,
  length(p_name)                  AS name_len,
  substr(p_type, 1, 5)            AS type5,
  concat_ws('#', p_brand, p_type) AS brand_type,
  round(p_retailprice * 1.1, 3)   AS marked_up,
  abs(p_size - 25)                AS size_dev,
  p_partkey % 7                   AS k7
FROM part
""",
    tags=("scalar",),
)
def q12_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math surface — all JVM built-ins inside one
    whole-stage-codegen projection. marked_up rounds at 3 decimals
    because 2-decimal-price × 1.1 is exact on the 1e-3 grid (no
    boundary ambiguity)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 3).alias("marked_up"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("k7"),
    )


# --------------------------------------------------------------------------
# q13 — semi-structured JSON extraction (events.props)
# --------------------------------------------------------------------------
@query(
    "q13_from_json",
    oracle=lambda: f"""
SELECT
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  count(*) AS n,
  {sql_eavg("value", 2, "avg_value")}
FROM events
GROUP BY 1
""",
    tags=("json",),
)
def q13_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`from_json` over the stream's string payload (the multimodal
    metadata pattern, SURVEY.md §2.3) then aggregate per extracted key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("j", F.from_json("props", "k INT"))
        .groupBy(F.col("j.k").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            eavg("value", 2).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# q14 — event-time tumbling window aggregation
# --------------------------------------------------------------------------
@query(
    "q14_window_tumbling",
    oracle=lambda: f"""
SELECT
  epoch_us(date_trunc('hour', ts)) AS window_start_us,
  event_type,
  count(*) AS n,
  {sql_esum("value", 2, "sum_value")}
FROM events
GROUP BY 1, 2
""",
    tags=("window", "time"),
    bench=True,
)
def q14_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window over event time — the batch shape of the
    streaming windowed agg (streaming/ runs the same plan with a
    watermark). Window start exported as epoch µs for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            esum("value", 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q15 — sessionization via gap detection (batch shape)
# --------------------------------------------------------------------------
@query(
    "q15_sessionize",
    oracle=lambda: f"""
WITH flagged AS (
  SELECT
    user_id,
    event_id,
    epoch_us(ts) AS ts_us,
    value,
    CASE
      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
      ELSE 0
    END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT *,
         CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       {sql_esum("value", 2, "sum_value")}
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("window", "session"),
)
def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize per user with a 30-min inactivity gap (lag + running
    sum — the batch analog of `session_window`; the streaming variant
    lives in streaming/pipelines.py). Partition-by-user windows scale
    horizontally: state never exceeds one user's events per task."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts_us").over(w).isNull(), F.lit(1))
        .when(F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        esum("value", 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# q34 — collection (array) function surface over tokenized text
# --------------------------------------------------------------------------
@query(
    "q34_collection_funcs",
    oracle="""
SELECT doc_id,
       len(w) AS n_tok,
       array_to_string(w[1:5], ' ')             AS first5,
       w[-1]                                    AS last_tok,
       array_to_string(list_sort(w)[1:3], ' ')  AS sorted3,
       CAST(coalesce(list_position(w, 'the'), 0) AS BIGINT) AS the_pos
FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents)
""",
    tags=("collection",),
)
def q34_collection_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (size/slice/element_at/sort_array/
    array_position) — the collection ops a message-attribute or token
    pipeline leans on. Pure per-row projection, no shuffle; Spark and
    DuckDB agree because tokens are lowercase ASCII (binary collation
    identical) and both engines' slice semantics are 1-based
    inclusive."""
    from ..functions.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tok"),
        F.concat_ws(" ", F.slice(w, 1, 5)).alias("first5"),
        F.element_at(w, -1).alias("last_tok"),
        F.concat_ws(" ", F.slice(F.sort_array(w), 1, 3)).alias("sorted3"),
        F.array_position(w, "the").alias("the_pos"),
    )


# --------------------------------------------------------------------------
# q35 — CUBE grouping sets
# --------------------------------------------------------------------------
@query(
    "q35_cube",
    oracle=lambda: f"""
SELECT coalesce(c_mktsegment, 'ALL')    AS segment,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       {sql_esum("o_totalprice", 2, "sum_total")}
FROM orders
JOIN customer ON c_custkey = o_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
""",
    tags=("agg", "cube"),
)
def q35_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, priority): all four grouping sets in one
    pass — Spark expands the sets map-side, so the shuffle still
    carries only partial aggregates (4× group count, not 4× data)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            esum("o_totalprice", 2).alias("sum_total"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
    )


# --------------------------------------------------------------------------
# q36 — correlated-aggregate predicate (orders above customer average)
# --------------------------------------------------------------------------
@query(
    "q36_above_cust_avg",
    oracle=lambda: f"""
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM orders
JOIN (
  SELECT o_custkey AS ck, {sql_eavg("o_totalprice", 2, "cust_avg")}
  FROM orders GROUP BY o_custkey
) a ON a.ck = o_custkey
WHERE o_totalprice > cust_avg
""",
    tags=("agg", "subquery"),
)
def q36_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery pattern (each order vs its customer's
    average) decorrelated into aggregate + self-join — exactly the
    rewrite Catalyst itself applies to correlated scalar subqueries.
    Both sides compute the average with identical exact-integer sums,
    so the > predicate flips on neither engine."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    avg = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        eavg("o_totalprice", 2).alias("cust_avg")
    )
    return (
        o.join(avg, o.o_custkey == avg.ck)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


# --------------------------------------------------------------------------
# q37 — date/time function surface
# --------------------------------------------------------------------------
@query(
    "q37_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)    AS y,
       month(o_orderdate)   AS m,
       day(o_orderdate)     AS d,
       quarter(o_orderdate) AS q,
       dayofweek(o_orderdate) + 1 AS dow,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS ship_by,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')    AS age_days
FROM orders
WHERE o_orderkey < 5000
""",
    tags=("scalar", "date"),
)
def q37_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: extraction, arithmetic, formatting.
    DuckDB numbers Sunday 0 where Spark uses 1, so the oracle shifts —
    values, not conventions, are what must agree."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("ship_by"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("age_days"),
    )


# --------------------------------------------------------------------------
# q38 — pivot (conditional aggregation) + count distinct
# --------------------------------------------------------------------------
@query(
    "q38_pivot_status",
    oracle=lambda: f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       {sql_esum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", 2, "open_total")},
       {sql_esum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 2, "filled_total")},
       {sql_esum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END", 2, "partial_total")}
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
    tags=("agg", "pivot"),
)
def q38_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation — the portable (and
    at scale *preferable*) form of `groupBy().pivot()`: one pass, no
    second job to discover pivot values, still fully partial-agg'd.
    count(DISTINCT) adds the expand-then-dedup aggregate path."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def status_total(s: str):
        return esum(
            F.when(F.col("o_orderstatus") == s, F.col("o_totalprice")).otherwise(
                F.lit(0.0)
            ),
            2,
        )

    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            status_total("O").alias("open_total"),
            status_total("F").alias("filled_total"),
            status_total("P").alias("partial_total"),
        )
    )


# --------------------------------------------------------------------------
# q39 — exact percentiles on the integer grid
# --------------------------------------------------------------------------
@query(
    "q39_percentiles",
    oracle="""
SELECT l_returnflag,
       CAST(quantile_cont(CAST(round(l_quantity * 100, 0) AS BIGINT), 0.5) AS DOUBLE) / 100  AS median_qty,
       CAST(quantile_cont(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.9) AS DOUBLE) / 100 AS p90_price,
       CAST(min(round(l_quantity * 100, 0)) AS DOUBLE) / 100 AS min_qty,
       CAST(max(round(l_extendedprice * 100, 0)) AS DOUBLE) / 100 AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def q39_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p90 with linear interpolation, computed on the
    integer cents grid: both engines interpolate (1-f)·a + f·b over
    identical BIGINTs, so the one double expression matches exactly.
    Spark's `percentile` is the exact (sort-based) aggregate — at
    100 TB you'd swap in approx_percentile and drop the oracle to a
    tolerance check; the exact form is what the correctness gate can
    hash.

    r16 NOTE (VERDICT r15 #3 adjudicated by measurement, guide §1):
    two rank-from-histogram rewrites were built, proven bit-identical
    to ``percentile()`` (oracle-green at sf0.001/0.01/0.1, plus an
    adversarial property pin), measured, and REVERTED as slower:
    flat (flag, cents) histogram + cumulative window 1.60 s warm,
    two-level coarse-bucket + second-pass rank pick 2.0 s warm, vs
    1.45 s for this form at sf0.1. The "3-reducer funnel" premise does
    not dominate here: the measured decomposition is price-percentile
    1.2 s of the 1.45 total, and a histogram cannot help because
    l_extendedprice is ~unique per row (594,330 distinct cents in
    600 k rows — the histogram build ALONE costs 0.85 s, measured),
    so every exact method pays the same distinct-value state and the
    rewrites only add stages. Numbers in OPTIMIZATION_r16.md; the
    100 TB answer stays approx_percentile as documented above."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(qty_c, F.lit(0.5)).cast("double") / 100).alias("median_qty"),
        (F.percentile(price_c, F.lit(0.9)).cast("double") / 100).alias("p90_price"),
        (F.min(qty_c).cast("double") / 100).alias("min_qty"),
        (F.max(price_c).cast("double") / 100).alias("max_price"),
    )


# --------------------------------------------------------------------------
# q40 — salted two-phase aggregation (skew mitigation)
# --------------------------------------------------------------------------
@query(
    "q40_skewed_agg_salted",
    oracle=lambda: f"""
SELECT event_type,
       count(*) AS n,
       {sql_esum("value", 2, "sum_value")},
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
    tags=("agg", "skew", "salt"),
)
def q40_skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: `events` has a handful of event_type
    values, so a naive groupBy concentrates each type on one reducer.
    Two-level exact form: level 1 groups by (event_type, user_id) —
    the distinct key itself is the salt, fanning every hot event_type
    across as many reducers as it has users, with map-side partial
    aggregation collapsing repeats before the shuffle. Level 2 merges
    per-user partials per type: n = Σ pn, sum composes, and n_users is
    simply the level-1 row count. No collect_set / array state
    anywhere — per-reducer memory stays O(1) per key regardless of how
    many distinct users the hottest type has (the round-1 form
    materialized per-salt user arrays, which re-created the skew it
    was built to avoid)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "user_id"
    )
    lvl1 = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("psum_q2"),
    )
    return lvl1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("psum_q2").cast("double") / 100).alias("sum_value"),
        # one level-1 row per (type, user); count(col) skips null users
        # exactly like the oracle's count(DISTINCT user_id)
        F.count(F.col("user_id")).alias("n_users"),
    )


# --------------------------------------------------------------------------
# q41 — set operations (INTERSECT / EXCEPT)
# --------------------------------------------------------------------------
@query(
    "q41_set_ops",
    oracle="""
WITH both_side AS (
  SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
),
only_building AS (
  SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
SELECT nk, 'both' AS which FROM both_side
UNION ALL
SELECT nk, 'building_only' AS which FROM only_building
""",
    tags=("setops",),
)
def q41_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics) — Spark plans both
    as existence joins (left-semi / left-anti over distinct inputs), so
    they scale like any keyed join: shuffle on the compared columns,
    no materialized set structures."""
    c = load_table(spark, sf_dir, "customer")
    building = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    machinery = (
        c.filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    both_side = building.intersect(machinery).withColumn("which", F.lit("both"))
    only_b = building.exceptAll(machinery).withColumn(
        "which", F.lit("building_only")
    )
    return both_side.unionAll(only_b)


# --------------------------------------------------------------------------
# q42 — global top-k (TakeOrderedAndProject)
# --------------------------------------------------------------------------
@query(
    "q42_global_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
    tags=("sort", "limit", "topk"),
)
def q42_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 by price: orderBy+limit compiles to
    TakeOrderedAndProject — each task keeps a 25-row heap and the
    driver merges, so no full sort ever materializes (asserted in
    tests/test_plans.py). The o_orderkey tiebreak makes the cutoff
    deterministic for the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------------
# q43 — fuzzy-match join (blocked Levenshtein)
# --------------------------------------------------------------------------
@query(
    "q43_fuzzy_type_match",
    oracle="""
WITH t AS (
  SELECT DISTINCT p_name AS nm, split_part(p_name, ' ', 1) AS blk FROM part
)
SELECT a.nm AS name_a, b.nm AS name_b,
       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
FROM t a
JOIN t b ON a.blk = b.blk AND a.nm < b.nm
WHERE levenshtein(a.nm, b.nm) <= 5
""",
    tags=("join", "fuzzy", "levenshtein"),
)
def q43_fuzzy_type_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching with blocking: distinct part names are
    blocked on their first word, pairs within a block are scored with
    Levenshtein and kept under a distance cutoff. The blocking key
    turns an O(n²) edit-distance sweep into per-block pair sets — the
    same candidate-then-verify shape as the LSH dedup pipeline, for
    typo-level (not shingle-level) similarity."""
    t = (
        load_table(spark, sf_dir, "part")
        .select(
            F.col("p_name").alias("nm"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
        )
        .distinct()
    )
    a = t.select(F.col("nm").alias("name_a"), F.col("blk").alias("blk"))
    b = t.select(F.col("nm").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= 5)
    )


# --------------------------------------------------------------------------
# q60 — sliding-window aggregation (overlapping windows)
# --------------------------------------------------------------------------
_SLIDE_US = 1_800_000_000  # 30-minute hop
_WIDTH_US = 3_600_000_000  # 1-hour window => every event in 2 windows


@query(
    "q60_window_sliding",
    oracle=lambda: f"""
WITH ev AS (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events),
x AS (
  SELECT event_type, value,
         unnest([(ts_us // {_SLIDE_US}) * {_SLIDE_US},
                 (ts_us // {_SLIDE_US}) * {_SLIDE_US} - {_SLIDE_US}])
           AS window_start_us
  FROM ev
)
SELECT window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n,
       {sql_esum("value", 2, "sum_value")}
FROM x
GROUP BY 1, 2
""",
    tags=("window", "time", "sliding"),
)
def q60_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window hopping every 30 minutes — the overlapping
    complement of q14's tumbling window (each event lands in exactly
    width/slide = 2 windows). Spark's ``window(ts, width, slide)``
    replicates rows into their windows before the hash aggregate, so
    the shuffle carries one partial row per (window, event_type) per
    partition — map-side combine absorbs the 2x row expansion. The
    oracle derives the same epoch-aligned window starts with integer
    division and unnest."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), esum("value", 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q65 — salted skew join (the join-side twin of q40's salted aggregate)
# --------------------------------------------------------------------------
_JOIN_SALT = 8


@query(
    "q65_skew_join_salted",
    oracle=lambda: f"""
WITH dim AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS user_n_events,
         {sql_esum("value", 2, "user_sum_value")}
  FROM events
  GROUP BY 1
)
SELECT e.event_id, e.user_id, d.user_n_events, d.user_sum_value
FROM events e
JOIN dim d ON e.user_id = d.user_id
""",
    tags=("join", "skew", "salt"),
)
def q65_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-enrichment join under key skew: every event picks up its
    user's aggregate profile. A plain shuffle join funnels each hot
    user through one reducer; salting replicates each dim row
    {_JOIN_SALT} ways and scatters the fact side by a deterministic
    md5-derived salt, so a hot key spreads across {_JOIN_SALT} tasks.
    The salt changes the physical plan only — the oracle is the plain
    join, and the salted result must hash-match it exactly.

    ``shuffle_hash`` is hinted because at 100 TB a user-cardinality
    dim does not broadcast (and letting the tiny test dim broadcast
    would optimize the salt away); AQE's skew-join handles sort-merge
    spills, salting handles hash-join reducers — the two compose."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("user_n_events"),
        esum("value", 2).alias("user_sum_value"),
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_JOIN_SALT)]))
    )
    fact = ev.select("event_id", "user_id").withColumn(
        "salt",
        F.expr(
            f"CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) "
            f"% {_JOIN_SALT} AS INT)"
        ),
    )
    return (
        fact.join(salted_dim.hint("shuffle_hash"), ["user_id", "salt"])
        .select("event_id", "user_id", "user_n_events", "user_sum_value")
    )


# --------------------------------------------------------------------------
# q70 — session funnel conversion (click → purchase within a session)
# --------------------------------------------------------------------------
_FUNNEL_GAP_US = 30 * 60 * 1_000_000


@query(
    "q70_session_funnel",
    oracle=f"""
WITH flagged AS (
  SELECT
    user_id, event_id, event_type,
    epoch_us(ts) AS ts_us,
    CASE
      WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_FUNNEL_GAP_US} THEN 1
      ELSE 0
    END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT *,
         CAST(sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(min(ts_us) AS BIGINT) AS session_start_us,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_clicks,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchases,
       coalesce(
         max(CASE WHEN event_type = 'purchase' THEN ts_us END)
           >= min(CASE WHEN event_type = 'click' THEN ts_us END),
         FALSE) AS converted
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("window", "session", "funnel"),
)
def q70_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis over gap-detected sessions (q15's machinery):
    per session, click and purchase counts plus whether the session
    CONVERTED — some purchase at-or-after the first click, computed in
    the same aggregate pass as ``max(purchase ts) >= min(click ts)``
    (no second window or self-join). NULL-safe: a session with no
    click or no purchase is not converted.

    Scale: identical movement to q15 — one user-keyed window shuffle,
    then a (user, session) hash aggregate with map-side partials;
    conversion adds only two conditional min/max columns."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts_us").over(w).isNull(), F.lit(1))
        .when(F.col("ts_us") - F.lag("ts_us").over(w) > _FUNNEL_GAP_US, F.lit(1))
        .otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    pur_ts = F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.count(click_ts).alias("n_clicks"),
        F.count(pur_ts).alias("n_purchases"),
        F.coalesce(F.max(pur_ts) >= F.min(click_ts), F.lit(False)).alias("converted"),
    )


# --------------------------------------------------------------------------
# q71 — retention cohorts (signup day x activity-day offset)
# --------------------------------------------------------------------------
@query(
    "q71_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_day
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id,
         f.cohort_day,
         epoch_us(e.ts) // 86400000000 - f.cohort_day AS day_offset
  FROM events e JOIN firsts f USING (user_id)
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity
GROUP BY 1, 2
""",
    tags=("agg", "cohort", "retention"),
)
def q71_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-seen day (cohort),
    counted once per (cohort, day-offset) they were active — the
    standard product-analytics rollup. Day arithmetic is integer
    epoch-µs division, identical in both engines.

    Scale: first-seen is a user-keyed min aggregate; the cohort join
    is keyed by user_id (co-partitioned with the events shuffle); the
    distinct collapses each user's repeat activity map-side. No step
    carries more than one row per (user, active day)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --------------------------------------------------------------------------
# q74 — Bloom-filter semi-join pruning (broadcast bitset before shuffle)
# --------------------------------------------------------------------------
_BLOOM_M = 4096  # bits in the filter
_BLOOM_K = 3  # hash functions


def _bloom_pos(j_col: str, key_col: str):
    """Position of hash j for a bigint key: md5("j:key") prefix mod m."""
    from ..functions.textops import hex_prefix_int, md5_str

    return (
        hex_prefix_int(
            md5_str(
                F.concat_ws(
                    ":", F.col(j_col).cast("string"), F.col(key_col).cast("string")
                )
            )
        )
        % _BLOOM_M
    )


def _sql_bloom_pos(j_expr: str, key_expr: str) -> str:
    from ..functions.textops import sql_hex_prefix_int

    h = f"md5(CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR))"
    return f"({sql_hex_prefix_int(h)} % {_BLOOM_M})"


@query(
    "q74_bloom_semijoin",
    oracle=lambda: f"""
WITH keys AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
),
bloom AS (
  SELECT DISTINCT {_sql_bloom_pos('u.j', 'keys.k')} AS pos
  FROM keys, unnest(range(0, {_BLOOM_K})) AS u(j)
),
probe AS (SELECT DISTINCT l_orderkey AS pk FROM lineitem),
ppos AS (
  SELECT DISTINCT probe.pk, {_sql_bloom_pos('u.j', 'probe.pk')} AS pos
  FROM probe, unnest(range(0, {_BLOOM_K})) AS u(j)
),
gen AS (SELECT pk, count(*) AS npos FROM ppos GROUP BY 1),
hit AS (
  SELECT ppos.pk, count(*) AS nhit
  FROM ppos JOIN bloom USING (pos) GROUP BY 1
),
cand AS (
  SELECT gen.pk FROM gen JOIN hit USING (pk) WHERE hit.nhit = gen.npos
),
truth AS (SELECT probe.pk FROM probe JOIN keys ON probe.pk = keys.k)
SELECT
  CAST((SELECT count(*) FROM keys) AS BIGINT) AS n_urgent_keys,
  CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_probe_keys,
  CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
  CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
  CAST((SELECT count(*) FROM cand) - (SELECT count(*) FROM truth)
       AS BIGINT) AS n_false_pos,
  (SELECT {sql_esum('l_extendedprice')} FROM lineitem
   WHERE l_orderkey IN (SELECT k FROM keys)) AS urgent_revenue
""",
    tags=("join", "bloom", "pruning"),
)
def q74_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: the urgent-order key set is
    collapsed into a {_BLOOM_K}-hash / {_BLOOM_M}-bit Bloom filter
    (materialized as its set bit positions, <= {_BLOOM_M} rows no
    matter how many keys), broadcast to probe the fact side, and only
    bloom-surviving keys reach the exact verification join. The result
    reports the measured false-positive count alongside the verified
    revenue — the runtime-filter pattern (a la Spark's own
    InjectRuntimeFilter) made explicit and measurable.

    Scale: the bitset aggregate is bounded by m={_BLOOM_M} rows
    regardless of build-side cardinality, so the probe is a broadcast
    hash join against a kilobyte-scale table; the expensive shuffle
    join runs only over bloom candidates (false-positive rate
    ~(1-e^(-kn/m))^k). All hashing is md5 + integer arithmetic in
    whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    jseq = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")

    # persisted (r15): the before-plan re-ran the orders scan+distinct
    # 4x (bloom build, truth, key count, revenue semi-join) and the
    # LINEITEM scan+distinct 3x (ppos, truth, probe count) — 18
    # parquet scans / 44 exchanges for one query. Each distinct key
    # set materializes once; ppos additionally feeds both the
    # per-key position count and the bloom-hit probe.
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .transform(persist_tracked)
    )
    bloom = keys.select("k", jseq).select(_bloom_pos("j", "k").alias("pos")).distinct()
    probe = li.select(F.col("l_orderkey").alias("pk")).distinct().transform(persist_tracked)
    ppos = (
        probe.select("pk", jseq)
        .select("pk", _bloom_pos("j", "pk").alias("pos"))
        .distinct()
        .transform(persist_tracked)
    )
    gen = ppos.groupBy("pk").agg(F.count(F.lit(1)).alias("npos"))
    hit = (
        ppos.join(F.broadcast(bloom), "pos")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("nhit"))
    )
    cand = gen.join(hit, "pk").filter(F.col("nhit") == F.col("npos")).select("pk")
    truth = probe.join(keys, probe.pk == keys.k, "semi")

    counts = (
        keys.agg(F.count(F.lit(1)).cast("long").alias("n_urgent_keys"))
        .crossJoin(probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe_keys")))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(truth.agg(F.count(F.lit(1)).cast("long").alias("n_true")))
    )
    revenue = li.join(keys, li.l_orderkey == keys.k, "semi").agg(
        esum("l_extendedprice").alias("urgent_revenue")
    )
    return counts.crossJoin(revenue).select(
        "n_urgent_keys",
        "n_probe_keys",
        "n_candidates",
        "n_true",
        (F.col("n_candidates") - F.col("n_true")).cast("long").alias("n_false_pos"),
        "urgent_revenue",
    )


# --------------------------------------------------------------------------
# q86 — session path mining (top event-type trigram journeys)
# --------------------------------------------------------------------------
_PATH_TOPK = 15


@query(
    "q86_session_paths",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_FUNNEL_GAP_US} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT *, CAST(sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
steps AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER s AS e2,
         lead(event_type, 2) OVER s AS e3
  FROM sessions
  WINDOW s AS (PARTITION BY user_id, session_id ORDER BY ts_us, event_id)
)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
FROM steps WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, e1, e2, e3
LIMIT {_PATH_TOPK}
""",
    tags=("agg", "session", "path-mining"),
)
def q86_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey patterns: the {_PATH_TOPK} most frequent
    3-step event-type sequences occurring INSIDE a gap-detected
    session (q15's machinery) — the path-mining rollup behind "what do
    users do right before purchasing". Sequences never cross a session
    boundary because the lead() window partitions by (user, session).

    Scale: one user-keyed window shuffle builds sessions, a second
    window (same user-partitioned data, finer key — Spark reuses the
    partitioning, no second Exchange of the raw stream) emits each
    event's two successors as columns: NO arrays, NO collect_list —
    the pattern stream is exactly one row per event. The pattern
    aggregate's key space is |event_types|³ (bounded), map-side
    partials collapse it, and the global top-k is a TakeOrdered."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts_us").over(w).isNull(), F.lit(1))
        .when(F.col("ts_us") - F.lag("ts_us").over(w) > _FUNNEL_GAP_US, F.lit(1))
        .otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    s = Window.partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
    steps = sessions.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(s).alias("e2"),
        F.lead("event_type", 2).over(s).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        steps.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "e1", "e2", "e3")
        .limit(_PATH_TOPK)
    )


# --------------------------------------------------------------------------
# q92 — shipping priority (the TPC-H Q3 shape)
# --------------------------------------------------------------------------
_SP_SEGMENT = "BUILDING"
_SP_CUTOFF = "1998-06-01 00:00:00"
_SP_TOPK = 10


@query(
    "q92_shipping_priority",
    oracle=lambda: f"""
SELECT l_orderkey,
       {sql_esum(_DISC_PRICE, 4, "revenue")},
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{_SP_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{_SP_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_SP_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate_s ASC, l_orderkey ASC
LIMIT {_SP_TOPK}
""",
    tags=("olap", "tpch", "join", "topk"),
)
def q92_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority — the TPC-H Q3 shape: unshipped-revenue top-10
    for one market segment. Both date predicates reach the parquet
    scans (PushedFilters), the segment filter prunes customer BEFORE
    its join, and the global top-10 is a TakeOrdered (no full sort).
    Revenue uses the exact integer-scaled sum (functions/exact.py) so
    the cross-engine ordering of tied rows is deterministic.

    Scale: customer⋈orders and orders⋈lineitem are key-partitioned
    shuffle joins whose inputs are filter-reduced first; the aggregate
    is keyed by l_orderkey (high cardinality, no skew); TakeOrdered
    moves exactly {_SP_TOPK} rows per partition to the driver."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _SP_SEGMENT
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_SP_CUTOFF)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_SP_CUTOFF)
    )
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(esum(F.expr(_DISC_PRICE), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate_s").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(_SP_TOPK)
    )


# --------------------------------------------------------------------------
# q93 — local-supplier regional revenue (the TPC-H Q5 shape)
# --------------------------------------------------------------------------
_RR_REGION = "ASIA"
_RR_LO = "1997-01-01 00:00:00"
_RR_HI = "1998-01-01 00:00:00"


@query(
    "q93_regional_revenue",
    oracle=lambda: f"""
SELECT n_name,
       {sql_esum(_DISC_PRICE, 4, "revenue")},
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_RR_REGION}'
  AND o_orderdate >= TIMESTAMP '{_RR_LO}'
  AND o_orderdate <  TIMESTAMP '{_RR_HI}'
GROUP BY n_name
""",
    tags=("olap", "tpch", "join"),
)
def q93_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier regional revenue — the TPC-H Q5 shape: a 6-table
    join where customer and supplier must share a nation inside one
    region, grouped to per-nation revenue for one order-date year.

    Scale: region and nation are broadcast (5 / 25 rows — the
    broadcast side of every sane plan); supplier joins by key after
    the nation filter pruned it to one region's suppliers;
    orders⋈lineitem is the only large shuffle pair and both are
    date/filter-reduced at the scan. The final aggregate has
    nation-count cardinality — a 1-row-per-nation partial agg."""
    rg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _RR_REGION)
    na = load_table(spark, sf_dir, "nation").join(
        F.broadcast(rg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    su = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_RR_LO))
        & (F.col("o_orderdate") < F.lit(_RR_HI))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            esum(F.expr(_DISC_PRICE), 4).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q98 — join-key skew profiler (Herfindahl + top-k shares)
# --------------------------------------------------------------------------
_SKEW_SCALE = 1_000_000
_SKEW_TOPK = 10


def _sql_skew_profile(col: str) -> str:
    # HUGEINT intermediates: Σc² and total² are quadratic in per-key
    # counts and blow past int64 around 100× this corpus (the Spark
    # side uses DECIMAL(38,0) for the same reason — both floor-divide
    # positives, so the grids stay value-identical).
    return f"""
SELECT '{col}' AS key_name,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS total_rows,
       CAST(sum(CAST(c AS HUGEINT) * c) * {_SKEW_SCALE}
            // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS hhi_q6,
       CAST(CAST(max(c) AS HUGEINT) * {_SKEW_SCALE} // sum(c) AS BIGINT)
         AS top1_share_q6,
       CAST(CAST((SELECT sum(c) FROM (SELECT c FROM cnt_{col}
             ORDER BY c DESC, k ASC LIMIT {_SKEW_TOPK})) AS HUGEINT)
            * {_SKEW_SCALE} // sum(c) AS BIGINT) AS top10_share_q6
FROM cnt_{col}"""


@query(
    "q98_skew_profile",
    oracle=f"""
WITH cnt_user_id AS (
  SELECT CAST(user_id AS STRING) AS k, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
cnt_event_type AS (
  SELECT event_type AS k, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
)
{_sql_skew_profile("user_id")}
UNION ALL
{_sql_skew_profile("event_type")}
""",
    tags=("olap", "skew", "profiling"),
)
def q98_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: for each prospective shuffle key, the
    distinct-key count, Herfindahl concentration index (Σshare² — 1e6
    grid; 1/n_keys when uniform, 1.0 when one key owns everything),
    and top-1/top-{_SKEW_TOPK} share — the numbers that decide whether
    a join/aggregate on that key needs salting (q40/q65's machinery)
    or can rely on AQE skew splitting.

    Scale: one hash aggregate per profiled key (map-side partials —
    the profile never sees raw rows after the first agg); the top-k
    share is a TakeOrdered over the count table, and every ratio is
    exact integer floor division. The HHI intermediates (Σc², total²,
    and their ×1e6 scaling) are quadratic in per-key counts and
    overflow int64 near 100× this corpus — caught live by the r12
    100× probe — so they are computed in DECIMAL(38,0) (DuckDB:
    HUGEINT), which holds to ~1e38: safe past any conceivable corpus;
    the final shares still land on the same BIGINT 1e-6 grid."""
    ev = load_table(spark, sf_dir, "events")

    def profile(col: str) -> DataFrame:
        cnt = (
            ev.groupBy(F.col(col).cast("string").alias("k"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        top = (
            cnt.orderBy(F.col("c").desc(), F.col("k").asc())
            .limit(_SKEW_TOPK)
            .agg(F.sum("c").cast("long").alias("topk"))
        )
        return (
            cnt.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum("c").cast("long").alias("total_rows"),
                F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ss"),
                F.max("c").cast("long").alias("cmax"),
            )
            .crossJoin(F.broadcast(top))
            .select(
                F.lit(col).alias("key_name"),
                "n_keys",
                "total_rows",
                F.expr(
                    f"CAST(ss * {_SKEW_SCALE} DIV "
                    f"(CAST(total_rows AS DECIMAL(38,0)) * total_rows) AS BIGINT)"
                ).alias("hhi_q6"),
                F.expr(
                    f"CAST(CAST(cmax AS DECIMAL(38,0)) * {_SKEW_SCALE} "
                    f"DIV total_rows AS BIGINT)"
                ).alias("top1_share_q6"),
                F.expr(
                    f"CAST(CAST(topk AS DECIMAL(38,0)) * {_SKEW_SCALE} "
                    f"DIV total_rows AS BIGINT)"
                ).alias("top10_share_q6"),
            )
        )

    return profile("user_id").unionByName(profile("event_type"))


# --------------------------------------------------------------------------
# q100 — large-volume orders (the TPC-H Q18 shape)
# --------------------------------------------------------------------------
_LO_QTY = 250  # HAVING sum(l_quantity) threshold


@query(
    "q100_large_orders",
    oracle=lambda: f"""
WITH big AS (
  SELECT l_orderkey, {sql_esum("l_quantity", 2, "sum_qty")}
  FROM lineitem GROUP BY 1
  HAVING {sql_esum("l_quantity", 2)} > {_LO_QTY}
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       {sql_esum("o_totalprice", 2, "o_totalprice_e")},
       {sql_esum("sum_qty", 2, "sum_qty")}
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY 1, 2, 3, 4
""",
    tags=("olap", "tpch", "having"),
)
def q100_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers — the TPC-H Q18 shape: orders whose
    total line quantity exceeds {_LO_QTY}, joined back to order and
    customer detail. The HAVING aggregate is the whole reduction: the
    order-keyed hash agg collapses lineitem map-side, the threshold
    keeps ~0.7% of orders, and only that residue joins onward —
    the filter-before-join discipline that makes this cheap at any
    scale. All money/quantity sums are exact integer-scaled
    (functions/exact.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(esum("l_quantity", 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > _LO_QTY)
    )
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return (
        big.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
        )
        .agg(
            esum("o_totalprice", 2).alias("o_totalprice_e"),
            esum("sum_qty", 2).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# q106 — GROUPING SETS (the third grouping variant: q11 rollup, q35 cube)
# --------------------------------------------------------------------------
@query(
    "q106_grouping_sets",
    oracle=f"""
SELECT coalesce(lang, 'ALL') AS lang_g,
       coalesce(source, 'ALL') AS source_g,
       CAST(grouping(lang) * 2 + grouping(source) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({sql_tokens('text')})) AS BIGINT) AS n_tokens
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), ())
""",
    tags=("olap", "grouping-sets"),
)
def q106_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the mixed-granularity rollup a mixture
    dashboard wants: per-(lang, source) cells, per-lang margins, and
    the grand total, WITHOUT cube's unwanted per-source margin. The
    gid column (grouping(lang)·2 + grouping(source)) disambiguates
    NULL-valued data from subtotal rows, computed portably instead of
    engine-specific grouping_id spellings.

    Scale: Spark expands grouping sets into one Expand + hash
    aggregate — each input row contributes to 3 sets, partial
    aggregation collapses them map-side, and the shuffle carries only
    distinct group cells."""
    docs = load_table(spark, sf_dir, "documents")
    view = "docs_gs_view"
    docs.select(
        "lang", "source", F.size(tokens("text")).cast("long").alias("n_tok")
    ).createOrReplaceTempView(view)
    return docs.sparkSession.sql(
        f"""
SELECT coalesce(lang, 'ALL') AS lang_g,
       coalesce(source, 'ALL') AS source_g,
       CAST(grouping(lang) * 2 + grouping(source) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM {view}
GROUP BY lang, source GROUPING SETS ((lang, source), (lang), ())
"""
    )


# --------------------------------------------------------------------------
# q107 — gaps-and-islands: longest increasing value run per user
# --------------------------------------------------------------------------
@query(
    "q107_longest_run",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 10000, 0) AS BIGINT) AS v_q4
  FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id, v_q4,
         CASE WHEN lag(v_q4) OVER w IS NULL
              OR v_q4 <= lag(v_q4) OVER w THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
grp AS (
  SELECT user_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS run_len
  FROM grp GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(run_len) AS BIGINT) AS longest_run,
       CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1
""",
    tags=("olap", "window", "gaps-islands"),
)
def q107_longest_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the classic sequence-analytics pattern: per
    user, the longest strictly-increasing run of event values and the
    total number of maximal runs. Break detection via lag(), island
    ids via a running sum of breaks, run lengths via a keyed
    aggregate — three steps, all on the same (user, time) partition
    order, so ONE shuffle serves every window (Spark reuses the
    partitioning across the two window passes and the values are
    4-decimal-quantized BIGINTs, so break comparisons are exact).

    Scale: windows partition by user_id (high cardinality, uniform);
    the run aggregate is keyed by (user, island) — never wider than
    the input; the final rollup is user-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 10_000, 0).cast("long").alias("v_q4"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "brk",
        F.when(
            F.lag("v_q4").over(w).isNull() | (F.col("v_q4") <= F.lag("v_q4").over(w)),
            1,
        ).otherwise(0),
    )
    grp = flagged.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    runs = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_run"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
    )
