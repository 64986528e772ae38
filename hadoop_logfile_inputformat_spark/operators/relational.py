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


#: SQL-text twin of :func:`_revenue` — the headline builders are
#: written as ONE parameterized ``spark.sql`` text each (r16): building
#: the same tree Column-by-Column costs 400-850 py4j round-trips per
#: warm invocation (driver-side latency the bench pays 4× per query),
#: the SQL form ~7.  The analyzed trees are identical (proven via
#: ``sameResult`` at rewrite time; oracle-gated every round).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)

#: SQL-text twin of :func:`tables.msum`.
def _msum_sql(expr: str, alias: str) -> str:
    return f"CAST(round(sum({expr}), 2) AS DOUBLE) AS {alias}"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial-aggregate rollup of lineitem.

    At 100 TB this is the pure-throughput query: no join, one shuffle of
    |groups| ≈ 6 rows after map-side partial aggregation.
    """
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               {_msum_sql(_REV_SQL, 'sum_disc_price')},
               {_msum_sql(
                   f'({_REV_SQL}) * (CAST(1 AS DECIMAL(3,2))'
                   ' + CAST(l_tax AS DECIMAL(12,2)))', 'sum_charge')},
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM {{lineitem}}
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
        lineitem=load(spark, sf_dir, "lineitem", fanout="wide:l_extendedprice"),
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered customer ⋈ orders ⋈ lineitem top-k.

    customer is filtered to one segment (~1/5) before the join; orders
    and lineitem join on o_orderkey — the big shuffle.  AQE converts the
    customer side to broadcast when the filtered size is under the
    threshold (64 MB in session defaults).
    """
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(c) */ l_orderkey, o_orderdate, o_orderpriority,
               {_msum_sql(_REV_SQL, 'revenue')}
        FROM {{lineitem}} l
        JOIN {{orders}} o ON l.l_orderkey = o.o_orderkey
        JOIN {{customer}} c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < '1998-01-01'
          AND l.l_shipdate > '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """,
        # r17: fan the single-row-group scan out on the DOWNSTREAM key
        # (l_orderkey is both the o⋈l join key and the groupBy key), so
        # the inserted exchange is the one the aggregation needed anyway
        # (guide §2.4 — two operations keyed the same way share one
        # exchange) while the join + partial agg run 32-way instead of
        # in the lone scan task.  Measured 0.44→0.37 / 0.38→0.29 s
        # (interleaved min-of-3, twice); exchange count unchanged.
        lineitem=load(spark, sf_dir, "lineitem", fanout="wide:l_orderkey"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join, revenue by nation.

    region/nation broadcast (bounded dims); the customer=supplier nation
    equality is an extra join predicate, not a post-filter, so Catalyst
    can plan it inside the join.
    """
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(s) */ n_name, {_msum_sql(_REV_SQL, 'revenue')}
        FROM {{lineitem}} l
        JOIN {{orders}} o ON l.l_orderkey = o.o_orderkey
        JOIN {{customer}} c ON o.o_custkey = c.c_custkey
        JOIN {{supplier}} s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
        JOIN {{nation}} n ON s.s_nationkey = n.n_nationkey
        JOIN {{region}} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
        GROUP BY n_name
        """,
        lineitem=load(spark, sf_dir, "lineitem"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
        supplier=load(spark, sf_dir, "supplier"),
        nation=load(spark, sf_dir, "nation"),
        region=load(spark, sf_dir, "region"),
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by value per customer.

    Shuffles once on o_custkey; the rank filter is applied before any
    further join, so at scale only 3×|customers| rows survive the stage.
    """
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey,
                 round(o_totalprice, 2) AS totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
                   AS BIGINT) AS rn
          FROM {orders}
        ) WHERE rn <= 3
        """,
        orders=load(spark, sf_dir, "orders"),
    )


def q_rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregate: ROLLUP(status, priority)."""
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM {orders}
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        orders=load(spark, sf_dir, "orders"),
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
    return spark.sql(
        """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM {events}
        GROUP BY date_trunc('hour', ts), event_type
        """,
        events=load(spark, sf_dir, "events"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gaps-and-islands: a >30 min silence starts a
    new session.  Two window passes over the same (user_id, ts)
    partitioning — Catalyst reuses one shuffle for both.
    """
    # timestampdiff is NTZ-safe and timezone-independent (pure wall-clock
    # field arithmetic); casting ts to BIGINT breaks on TIMESTAMP_NTZ in
    # Spark 4 and epoch-based variants drag the session timezone in.
    # Microsecond units keep exact parity with the DuckDB oracle's
    # epoch_us() difference — no per-operand truncation on either side.
    return spark.sql(
        """
        SELECT user_id, max(session_id) AS n_sessions,
               count(*) AS n_events
        FROM (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts)
                   AS session_id
          FROM (
            SELECT user_id, ts,
                   CASE WHEN gap IS NULL OR gap > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM (
              SELECT user_id, ts,
                     timestampdiff(MICROSECOND,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                       AS gap
              FROM {events})))
        GROUP BY user_id
        """,
        events=load(spark, sf_dir, "events"),
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
    return spark.sql(
        """
        SELECT month, revenue,
               round(sum(revenue) OVER (ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS cum_revenue
        FROM (
          SELECT date_trunc('month', o_orderdate) AS month,
                 round(sum(o_totalprice), 2) AS revenue
          FROM {orders}
          GROUP BY date_trunc('month', o_orderdate))
        """,
        orders=load(spark, sf_dir, "orders"),
    )


def q_part_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dimension with explicit broadcast: part is ~0.2% of
    lineitem rows at every SF — always the broadcast side."""
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(p) */ p_brand,
               {_msum_sql(_REV_SQL, 'revenue')},
               round(sum(l_quantity), 2) AS sum_qty
        FROM {{lineitem}} l
        JOIN {{part}} p ON l.l_partkey = p.p_partkey
        GROUP BY p_brand
        """,
        # r17: same single-row-group fan-out as q1/q9 (broadcast join +
        # low-cardinality decimal agg previously ran in the lone scan
        # task).  Measured 0.95→0.56 / 0.86→0.56 s (interleaved
        # min-of-3, twice).
        lineitem=load(spark, sf_dir, "lineitem", fanout="wide:l_extendedprice"),
        part=load(spark, sf_dir, "part"),
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
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile(o_totalprice, 0.5), 2) AS median_price,
               count(*) AS n_orders
        FROM {orders}
        GROUP BY o_orderpriority
        """,
        orders=load(spark, sf_dir, "orders"),
    )
