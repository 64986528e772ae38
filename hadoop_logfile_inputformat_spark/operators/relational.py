"""Relational query builders over the TPC-H-ish testdata.

The reference composes only count/filter/sample/map (SURVEY.md §2.3-2.5
"not present" rows); this module populates that inventory with the full
join/aggregate/window/set-op surface, expressed declaratively so
Catalyst owns the physical strategy.  Every builder takes
``(spark, sf_dir)`` and returns a DataFrame whose column names match the
DuckDB oracle in ``plans.registry``.

Scale notes (local[32] today, 1000 executors at 100 TB tomorrow):

- region/nation are always broadcast (bounded size); fact-fact joins
  shuffle on their natural keys and rely on AQE for skew splitting.
- double-typed aggregates are ``round``-ed in both engines so the
  oracle's value hash is stable despite floating summation order.
- every top-k has a total ORDER BY (tiebreakers) before LIMIT, so the
  result set is deterministic under any physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.tables import load, money, msum

def _revenue():
    """Exact-decimal revenue addend (lazy: Column creation needs an
    active SparkContext).  See tables.MONEY for why decimals."""
    return money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - money("l_discount")
    )


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial-aggregate rollup of lineitem.

    At 100 TB this is the pure-throughput query: no join, one shuffle of
    |groups| ≈ 6 rows after map-side partial aggregation.
    """
    l = load(spark, sf_dir, "lineitem")
    disc_price = _revenue()
    charge = disc_price * (F.lit(1).cast("decimal(3,2)") + money("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            msum(disc_price).alias("sum_disc_price"),
            msum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered customer ⋈ orders ⋈ lineitem top-k.

    customer is filtered to one segment (~1/5) before the join; orders
    and lineitem join on o_orderkey — the big shuffle.  AQE converts the
    customer side to broadcast when the filtered size is under the
    threshold (64 MB in session defaults).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(msum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, revenue by nation.

    region/nation broadcast (bounded dims); the customer=supplier nation
    equality is an extra join predicate, not a post-filter, so Catalyst
    can plan it inside the join.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(msum(_revenue()).alias("revenue"))
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by value per customer.

    Shuffles once on o_custkey; the rank filter is applied before any
    further join, so at scale only 3×|customers| rows survive the stage.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregate: ROLLUP(status, priority)."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_distinct_custs_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation alongside a plain count."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the event stream table (batch
    form; the streaming twin lives in ``streaming/``)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gaps-and-islands: a >30 min silence starts a
    new session.  Two window passes over the same (user_id, ts)
    partitioning — Catalyst reuses one shuffle for both.
    """
    e = load(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # timestamp_diff is NTZ-safe and timezone-independent (pure wall-clock
    # field arithmetic); casting ts to BIGINT breaks on TIMESTAMP_NTZ in
    # Spark 4 and epoch-based variants drag the session timezone in.
    # Microsecond units keep exact parity with the DuckDB oracle's
    # epoch_us() difference — no per-operand truncation on either side.
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(by_user), F.col("ts"))
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sessions = e.select(
        "user_id", "ts", "value", is_new.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(by_user))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


def q_suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: suppliers that appear in lineitem."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    return s.join(
        l, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def q_priority_customer_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: UNION (distinct) of two customer populations."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 8000).select("c_custkey")
    big = (
        o.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.union(big).distinct()


def q_running_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: cumulative revenue over months.

    Monthly sums are rounded *before* the cumulative pass so both
    engines accumulate identical addends.
    """
    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
    )


def q_part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dimension with explicit broadcast: part is ~0.2% of
    lineitem rows at every SF — always the broadcast side."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            msum(_revenue()).alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: pull a typed field out of the JSON
    ``props`` column and aggregate it."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


def q_order_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per priority class (sort-based
    aggregate; at 100 TB swap to approx_percentile and drop the oracle)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.count("*").alias("n_orders"),
    )
