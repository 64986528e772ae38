"""Extended relational surface: the operator classes SURVEY.md §2.3-2.6
marks "not present" in the reference, populated as first-class queries.

Covers: pure filter-agg scans, EXISTS/NOT-EXISTS semi joins with
non-equi conditions, multi-nation fact joins, correlated-aggregate
joins, scalar subqueries, as-of joins, range (interval) joins, pivot,
CUBE grouping sets, NTILE deciles, range-frame moving windows, global
top-k, INTERSECT/EXCEPT chains and statistical aggregates.

Every builder returns a DataFrame whose column names match its DuckDB
oracle in ``plans.registry`` (driver contract).  Scale notes inline:
each query states the shuffle it pays and why that is the minimal one.
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


from hadoop_logfile_inputformat_spark.operators.relational import (  # noqa: E402
    _REV_SQL,
    _msum_sql,
)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate scan → single-row aggregate.

    No join, no wide shuffle: map-side partial sums reduce to one row.
    At 100 TB the only cost is the parquet scan; all three predicates
    push down (verify: PushedFilters in .explain).
    """
    return spark.sql(
        f"""
        SELECT {_msum_sql(
            'CAST(l_extendedprice AS DECIMAL(12,2))'
            ' * CAST(l_discount AS DECIMAL(12,2))', 'revenue')},
               count(*) AS n_items
        FROM {{lineitem}}
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
          AND l_discount >= 0.05D AND l_discount <= 0.07D
          AND l_quantity < 24
        """,
        lineitem=load(spark, sf_dir, "lineitem"),
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi join with a non-equi residual.

    Orders that have ≥1 line shipped more than 60 days after the order
    date.  left_semi keeps the probe side unduplicated — no DISTINCT
    needed, and only orders columns flow out of the join.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume.

    Two independent broadcast joins against nation (bounded dim) attach
    supplier- and customer-nation; the only big shuffles are the
    l⋈o and o⋈c key joins.  supp≠cust inequality applied post-join.
    """
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(s) */ supp_nation, cust_nation,
               year(l_shipdate) AS l_year,
               {_msum_sql(_REV_SQL, 'volume')},
               count(*) AS n_items
        FROM {{lineitem}} l
        JOIN {{orders}} o ON l.l_orderkey = o.o_orderkey
        JOIN {{customer}} c ON o.o_custkey = c.c_custkey
        JOIN {{supplier}} s ON l.l_suppkey = s.s_suppkey
        JOIN (SELECT n_nationkey AS c_nk, n_name AS cust_nation
              FROM {{nation1}}) n1 ON c.c_nationkey = n1.c_nk
        JOIN (SELECT n_nationkey AS s_nk, n_name AS supp_nation
              FROM {{nation2}}) n2 ON s.s_nationkey = n2.s_nk
        WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
          AND supp_nation != cust_nation
        GROUP BY supp_nation, cust_nation, year(l_shipdate)
        """,
        lineitem=load(spark, sf_dir, "lineitem", fanout="wide:l_extendedprice"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
        supplier=load(spark, sf_dir, "supplier"),
        nation1=load(spark, sf_dir, "nation"),
        nation2=load(spark, sf_dir, "nation"),
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.

    No partsupp table in this dataset; supply cost is proxied as
    10% of p_retailprice per unit.  part broadcasts (0.2% of fact
    rows); nation broadcasts always; one shuffle on l_suppkey.
    """
    amount = (
        f"({_REV_SQL}) - CAST('0.1' AS DECIMAL(2,1))"
        " * CAST(p_retailprice AS DECIMAL(12,2))"
        " * CAST(l_quantity AS DECIMAL(12,2))"
    )
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(p), BROADCAST(s) */
               n_name AS nation, year(l_shipdate) AS o_year,
               {_msum_sql(amount, 'profit')}
        FROM {{lineitem}} l
        JOIN (SELECT p_partkey, p_retailprice FROM {{part}}) p
          ON l.l_partkey = p.p_partkey
        JOIN {{supplier}} s ON l.l_suppkey = s.s_suppkey
        JOIN {{nation}} n ON s.s_nationkey = n.n_nationkey
        GROUP BY n_name, year(l_shipdate)
        """,
        lineitem=load(spark, sf_dir, "lineitem", fanout="wide:l_extendedprice"),
        part=load(spark, sf_dir, "part"),
        supplier=load(spark, sf_dir, "supplier"),
        nation=load(spark, sf_dir, "nation"),
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + double aggregation.

    count(o_orderkey) over a left join keeps zero-order customers; the
    second groupBy is tiny (|distinct order counts| rows).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over one month."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(3,2)")
    )
    return l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate (avg qty per part) join.

    The correlated subquery becomes an aggregate-then-join: per-part
    averages are |part| rows — broadcast side at any SF.
    """
    l = load(spark, sf_dir, "lineitem")
    half_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(half_avg), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a fact aggregate, joined back to dims.

    The heavy groupBy(l_orderkey) runs first and the >170 filter cuts
    it to a sliver before any join — join input is minimal.
    """
    return spark.sql(
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(qty, 2) AS sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS qty
              FROM {lineitem} GROUP BY l_orderkey
              HAVING sum(l_quantity) > 170) big
        JOIN {orders} o ON big.l_orderkey = o.o_orderkey
        JOIN {customer} c ON o.o_custkey = c.c_custkey
        """,
        lineitem=load(spark, sf_dir, "lineitem"),
        orders=load(spark, sf_dir, "orders"),
        customer=load(spark, sf_dir, "customer"),
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join residual over brand/size/qty."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            msum(_revenue()).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join.

    The global average is a 1-row DataFrame crossJoin-broadcast into
    the filter (no driver collect); the anti join removes customers
    with any *recent* order (every customer has some order in this
    dataset, so the recency filter keeps the result non-trivial).
    """
    c = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    click at-or-before the purchase time.

    Spark has no ASOF JOIN; the classic MPP formulation is a tagged
    union + one window pass: sort (user_id, ts, kind) with clicks
    before purchases at equal ts, carry the last non-null click via
    ``last(ignorenulls)``.  ONE shuffle on user_id — no range join, no
    per-row subquery; scales linearly and AQE handles user skew.
    (DuckDB oracle uses its native ASOF LEFT JOIN.)
    """
    e = load(spark, sf_dir, "events")
    # match the source ts type exactly (TIMESTAMP_NTZ vs _LTZ depends
    # on how the parquet was written); a hardcoded "timestamp" would
    # force a union-coercion that flips with the writer's convention
    ts_ddl = e.schema["ts"].dataType.simpleString()
    return spark.sql(
        f"""
        SELECT event_id, user_id, ts, click_ts, click_value FROM (
          SELECT user_id, ts, kind, event_id,
                 last(c_ts, true) OVER w AS click_ts,
                 round(last(c_value, true) OVER w, 2) AS click_value
          FROM (
            SELECT user_id, ts, 0 AS kind,
                   CAST(NULL AS BIGINT) AS event_id,
                   ts AS c_ts, value AS c_value
            FROM {{events}} WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, ts, 1 AS kind, event_id,
                   CAST(NULL AS {ts_ddl}) AS c_ts,
                   CAST(NULL AS DOUBLE) AS c_value
            FROM {{events2}} WHERE event_type = 'purchase')
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ) WHERE kind = 1
        """,
        events=e,
        events2=load(spark, sf_dir, "events"),
    )


def q_price_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders binned into broadcast price bands.

    The band table is tiny and broadcast, so the non-equi condition is
    evaluated as a broadcast nested-loop join — the right physical plan
    for interval joins against a bounded dim at any scale.
    """
    return spark.sql(
        """
        SELECT /*+ BROADCAST(bands) */ band_id,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM {orders} o
        JOIN (SELECT CAST(id AS INT) AS band_id,
                     id * 50000.0D AS lo,
                     (id + 1) * 50000.0D AS hi
              FROM range(10)) bands
          ON o.o_totalprice >= bands.lo AND o.o_totalprice < bands.hi
        GROUP BY band_id
        """,
        orders=load(spark, sf_dir, "orders"),
    )


PRIORITIES = [
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"),
    ("5-LOW", "n_low"),
]


def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, status rows × priority columns.

    The pivot value list is explicit so the plan is one pass (no
    distinct-values pre-job) — required at scale.
    """
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in PRIORITIES])
        .count()
    )
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a) for v, a in PRIORITIES],
    )


def q_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over lineitem flags (all 4 subtotal levels)."""
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM {lineitem}
        GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        lineitem=load(spark, sf_dir, "lineitem"),
    )


def q_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile stats over customer balances.

    Exact NTILE(10) with NO global-order window: distributed rank
    (range repartition + local row_number + broadcast offsets, see
    operators/ranks.py) and the SQL bucket-size arithmetic.  Tie-broken
    on c_custkey so the decile assignment is total and deterministic —
    which is also what makes rank-based NTILE bit-identical to the
    windowed form.
    """
    from hadoop_logfile_inputformat_spark.operators.ranks import (
        ntile_from_rank,
        with_global_row_number,
    )

    c = load(spark, sf_dir, "customer")
    ranked = with_global_row_number(
        c.select("c_acctbal", "c_custkey"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        rn_col="rn",
        total_col="n_total",
    )
    return (
        ranked.select(
            "c_acctbal",
            ntile_from_rank(F.col("rn"), F.col("n_total"), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


def q_weekly_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame moving window: 7-day trailing revenue per day.

    RANGE frame over a day-number key (not ROWS): days missing from
    the data still age out correctly.  Daily sums are rounded before
    the window so both engines accumulate identical addends.
    """
    return spark.sql(
        """
        SELECT day, revenue,
               round(sum(revenue) OVER (
                 ORDER BY datediff(day, '1970-01-01')
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        FROM (
          SELECT date_trunc('day', o_orderdate) AS day,
                 round(sum(o_totalprice), 2) AS revenue
          FROM {orders}
          GROUP BY date_trunc('day', o_orderdate))
        """,
        orders=load(spark, sf_dir, "orders"),
    )


def q_global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with dim enrichment AFTER the limit.

    TakeOrderedAndProject keeps only k rows per partition then k total;
    the customer join sees 20 rows, so its side choice is irrelevant.
    Total ORDER BY (price desc, key asc) makes the k-set deterministic.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    top = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20)
    return top.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey",
        "c_name",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


def q_building_bigspender_not_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op chain: INTERSECT then EXCEPT over customer-key sets."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        o.filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return building.intersect(big).subtract(rich)


def q_stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation / stddev / covariance."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.count("*").alias("n_items"),
    )


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches next to their exact twins (HLL++ distinct,
    interpolation-free approx percentile).  The raw sketch VALUES are
    engine-specific (DuckDB's HLL differs), so this full frame has no
    SQL oracle; the registry runs :func:`q_approx_sketches_checked`,
    which hashes the exact columns plus error-bound flags instead.
    Tests additionally assert bounded relative error.
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(F.expr("approx_percentile(value, 0.95)"), 2).alias("p95_value"),
        F.round(F.expr("percentile(value, 0.95)"), 2).alias("p95_exact"),
    )


#: Error budgets for the checked sketch frame: HLL++ runs at its
#: default rsd=0.05, so 0.15 is a 3-sigma envelope; approx_percentile
#: at default accuracy 10000 is near-exact — 2% relative (plus an
#: absolute epsilon for near-zero percentiles) is generous.
HLL_REL_TOL = 0.15
PCTL_REL_TOL = 0.02


def q_approx_sketches_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-frame twin of :func:`q_approx_sketches`: exact aggregates
    plus boolean sketch-within-bound flags.

    The driver value-hashes EVERY column of a registry result, so the
    engine-specific sketch values cannot appear directly; their
    *distance to the exact twin staying inside the documented error
    envelope* is deterministic, which makes ``(exact values, bound
    flags)`` a fully hash-checkable frame (oracle emits literal TRUE).
    A sketch regression (wrong rsd, broken merge) flips a flag and
    fails the hash — this is a real check, not a tautology.
    """
    df = q_approx_sketches(spark, sf_dir)
    users_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= HLL_REL_TOL * F.col("exact_users")
    )
    p95_ok = (
        F.abs(F.col("p95_value") - F.col("p95_exact"))
        <= PCTL_REL_TOL * F.abs(F.col("p95_exact")) + F.lit(0.01)
    )
    return df.select(
        "event_type",
        "exact_users",
        "p95_exact",
        users_ok.alias("approx_users_ok"),
        p95_ok.alias("approx_p95_ok"),
    )


def q_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count rollup via mergeable HLL sketch
    partials — materialized-view maintenance, the pattern that makes
    COUNT(DISTINCT) affordable at 100 TB: daily (event_type, day)
    sketch partials are built once (at scale: appended to a rollup
    table as each day of events lands), and any coarser distinct —
    weekly here — is answered by ``hll_union_agg`` over the partials,
    never rescanning raw events.  Distinct counts don't sum, but
    DataSketches HLL registers max-merge losslessly, so the merged
    estimate EQUALS the direct whole-week sketch (asserted per row as
    ``merge_lossless``; also a test invariant).

    Output is the checked frame (cf. :func:`q_approx_sketches_checked`):
    exact weekly distincts, partial-day counts, and two deterministic
    flags — merged-estimate-within-bound and merge-equals-direct — all
    hash-checkable cross-engine; raw sketch bytes are engine-specific
    and stay internal.
    """
    e = load(spark, sf_dir, "events")
    # the materialized rollup: one sketch per (event_type, day)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy(
        "event_type", F.date_trunc("week", F.col("day")).alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.count("*").alias("n_days"),
    )
    # direct twin (scan of raw events) — only for the check columns;
    # production trusts the merged path and never runs this side
    direct = e.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    j = merged.join(direct, ["event_type", "week"])
    est_ok = (
        F.abs(F.col("merged_est") - F.col("exact_users"))
        <= HLL_REL_TOL * F.col("exact_users")
    )
    return j.select(
        "event_type",
        "week",
        "exact_users",
        "n_days",
        est_ok.alias("merged_est_ok"),
        (F.col("merged_est") == F.col("direct_est")).alias("merge_lossless"),
    )


def q_nation_wealth_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: rich-customer vs rich-supplier counts per
    nation.  Both sides are filtered aggregates, so some nations appear
    on only one side — the outer join preserves them with null counts.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_rich_custs")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("n_rich_supps")
    )
    return cn.join(sn, "nationkey", "full_outer").select(
        "nationkey", "n_rich_custs", "n_rich_supps"
    )


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not rollup/cube), authored through the
    SQL entry point — each flag dimension totalled independently plus a
    grand total, in one pass."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: month-over-month revenue delta and percent
    change.  Monthly sums are rounded before the window so both engines
    difference identical values."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("mom_delta"),
        F.round((F.col("revenue") - prev) / prev * 100.0, 4).alias("mom_pct"),
    )


def q_daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a generated date spine left-joined to
    daily revenue, missing days emitted as zero.

    The spine is a single-row sequence() exploded — no driver loop, no
    collect; the join broadcasts the (tiny) daily aggregate only when
    AQE sizes it under threshold, else shuffles once on day.
    """
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging: per-type z-score over event values.

    Per-type mean/stddev are a tiny aggregate joined back broadcast;
    the outlier filter is then a pure map — no second shuffle of the
    events.  Rounded moments on both engines keep z-scores comparable.
    """
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    # filter on the UNROUNDED z (the oracle does too) — filtering the
    # rounded value would disagree with the oracle for z in
    # (3.0, 3.00005]; rounding is display-only.
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last order), frequency
    (order count), monetary (total spend), each scored into quartiles.

    One groupBy(custkey) shuffle for the aggregates; each quartile
    score is an exact distributed NTILE (range repartition + local
    row_number + bucket arithmetic, operators/ranks.py) — three range
    shuffles over the per-customer aggregate (already |customers|-sized,
    not |orders|-sized), zero global-order windows.

    Deliberately NOT persisted: the four consumers of ``per_cust``
    share one physical aggregate via ReusedExchange, and an A/B at
    sf0.1 measured the persisted variant 60% SLOWER (3.2s vs 1.9s) —
    the InMemoryRelation scan blocks the codegen the range
    repartitions otherwise fuse into."""
    from hadoop_logfile_inputformat_spark.operators.ranks import (
        ntile_from_rank,
        with_global_row_number,
    )

    o = load(spark, sf_dir, "orders")
    anchor = F.lit("2002-01-01")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max("o_orderdate")).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )

    def score(order_cols, name):
        ranked = with_global_row_number(
            per_cust.select("o_custkey", "recency_days", "frequency", "monetary"),
            order_cols,
            rn_col="rn",
            total_col="n",
        )
        return ranked.select(
            "o_custkey", ntile_from_rank(F.col("rn"), F.col("n"), 4).alias(name)
        )

    r = score([F.asc("recency_days"), F.asc("o_custkey")], "r_score")
    f = score([F.desc("frequency"), F.asc("o_custkey")], "f_score")
    m = score([F.desc("monetary"), F.asc("o_custkey")], "m_score")
    return (
        per_cust.join(r, "o_custkey").join(f, "o_custkey").join(m, "o_custkey")
        .select(
            "o_custkey", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        )
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: view → click → purchase conversion.

    Step timestamps are per-user min-aggregates (one shuffle on
    user_id); a step counts only if it happens at-or-after the previous
    step, so the funnel is ordered, not just a presence check.
    """
    e = load(spark, sf_dir, "events")
    t = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_view"))
    purchased = clicked & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    return t.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_clicked"),
        F.sum(purchased.cast("long")).alias("n_purchased"),
    )


def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-active week,
    per (cohort_week, week_offset) distinct-active counts and the
    retention ratio — the standard product-analytics rollup, and a
    representative "self-join a fact table against its own first-touch
    aggregate" shape.

    Scale shape: one user_id groupBy for first-touch (map-side
    partials), one (user_id, week) distinct, one user_id-equi join
    (co-partitioned after the first shuffle), then a low-cardinality
    (cohort, week) aggregate.  Nothing quadratic, no window at all;
    the retention ratio uses the integer half-up formulation so the
    frame value-hashes cross-engine.
    """
    e = load(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    first = wk.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count("*").alias("n_cohort")
    )
    act = (
        wk.join(first, "user_id")
        .groupBy("cohort_week", "wk")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    ratio = F.expr(
        "CAST((n_active * 20000 + n_cohort) DIV (2 * n_cohort) AS DOUBLE)"
        " / 10000"
    )
    return (
        act.join(cohort_sizes, "cohort_week")
        .select(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) DIV 7").cast("long").alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            ratio.alias("retention"),
        )
    )


def q_order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist analytics over order values (top 1%
    orders with their exact distribution position).

    The ordering is total (tie-break on o_orderkey), so rank ==
    row_number and both analytics reduce to arithmetic over the
    distributed global row number (operators/ranks.py):
    percent_rank = (rn-1)/(n-1), cume_dist = rn/n — identical doubles
    to the windowed form, no global-order window."""
    from hadoop_logfile_inputformat_spark.operators.ranks import (
        cume_dist_from_rank,
        percent_rank_from_rank,
        with_global_row_number,
    )

    o = load(spark, sf_dir, "orders")
    ranked = with_global_row_number(
        o.select("o_orderkey", "o_totalprice"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        rn_col="rn",
        total_col="n",
    )
    rn, n = F.col("rn"), F.col("n")
    return (
        ranked.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(percent_rank_from_rank(rn, n), 6).alias("pct_rank"),
            F.round(cume_dist_from_rank(rn, n), 6).alias("cume"),
        )
        .filter(F.col("pct_rank") >= 0.99)
    )
