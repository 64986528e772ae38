"""Query registry: every implemented operator as a named (builder,
oracle) pair.

``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is the equivalent ANSI SQL that DuckDB runs over the
same parquet tables (views ``region nation customer supplier part
orders lineitem events documents embeddings``).  Every registry key
carries an oracle: everything hash-dependent (MinHash, SimHash,
winnowing fingerprints, LSH curation, the deterministic log sample)
uses the portable md5-based family so the oracle reproduces values
exactly, and the two genuinely engine-specific surfaces are recast as
checkable frames — ``logfile_sample`` samples by a replayable hash
gate (generator-replay VALUES oracle) and ``approx_sketches`` hashes
exact aggregates plus sketch-error-bound flags.

Cross-engine determinism rules applied throughout (see operator
docstrings): double aggregates rounded identically on both sides,
every LIMIT preceded by a total order, approximate operators verified
against their exact twins in tests instead of via SQL.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from hadoop_logfile_inputformat_spark.operators import (
    dedup,
    logparity,
    pipeline,
    relational,
    relational_ext,
    similarity,
    snapshot,
    splits,
    text,
    tpch_rest,
)


def _media_features_query(spark, sf_dir):
    from hadoop_logfile_inputformat_spark.multimodal import (
        attach_fake_media,
        extract_media_features,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    return extract_media_features(attach_fake_media(load(spark, sf_dir, "documents")))


def _audio_features_query(spark, sf_dir):
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        attach_fake_audio,
        extract_audio_features,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    return extract_audio_features(attach_fake_audio(load(spark, sf_dir, "documents")))


def _media_resize_query(spark, sf_dir):
    """Resize-then-decode: features of the 8x8-downsampled payloads,
    pinning every output pixel of the binary->binary resize stage."""
    from hadoop_logfile_inputformat_spark.multimodal import (
        attach_fake_media,
        extract_media_features,
    )
    from hadoop_logfile_inputformat_spark.multimodal.media import resize_images
    from hadoop_logfile_inputformat_spark.operators.tables import load

    return extract_media_features(
        resize_images(attach_fake_media(load(spark, sf_dir, "documents")), 8, 8)
    )


def _video_frames_query(spark, sf_dir):
    """Frame-sampling fan-out over the deterministic FAKE video
    payloads: every sampled frame's exact bytes surface as a hex
    string, so the explode + byte-offset slice (the plumbing a real
    ffmpeg-backed stage fills) is value-hashed end to end."""
    from pyspark.sql import functions as F

    from hadoop_logfile_inputformat_spark.multimodal.media import (
        attach_fake_video,
        sample_video_frames,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    frames = sample_video_frames(
        attach_fake_video(load(spark, sf_dir, "documents")), every_nth=2
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex("frame_payload").alias("frame_hex"),
        F.length("frame_payload").cast("long").alias("n_bytes"),
    )

# ``QUERIES`` / ``ORACLES`` (the 50-key registry the driver consumes)
# are assembled at the END of this module from:
#   - the per-surface builders imported above,
#   - ``_SQL`` (member-level oracle SQL, one entry per query shape),
#   - ``_PACKS`` (correctness packs folding schema-aligned relational
#     members under one key — see operators/packs.py).
# The driver's gate records at most 50 rows per round; 50 keys means
# EVERY key gets a row EVERY round, so insertion order stops mattering.

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in text.STOPWORDS_EN)

_SHINGLES_CTE = """
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> concat_ws(' ', t[i], t[i + 1], t[i + 2])))) AS shingle
    FROM toks WHERE len(t) >= 3
)
"""

# --- portable MinHash / SimHash fragments: DuckDB recomputation of the
# md5-affine hash family in operators/dedup.py (PORTABLE_A/B/MOD), so
# the approximate dedup surface is value-hash-checked, not rows-only.
# ``sets`` keeps per-doc shingle LISTS (candidate verification);
# ``sh`` re-derives the exploded form the signature pass needs.
_SHINGLE_SETS_CTE = """
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
    FROM documents
),
sets AS (
    SELECT doc_id,
           list_distinct(list_transform(
               generate_series(1, len(t) - 2),
               i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))) AS shingles
    FROM toks WHERE len(t) >= 3
),
sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sets)
"""

_RPB = dedup.N_PERMUTATIONS // dedup.LSH_BANDS

_MINHASH_SIG_COLS = ",\n           ".join(
    f"min(({dedup.PORTABLE_A[i]} * lo + {dedup.PORTABLE_B[i]} * hi + {i})"
    f" % {dedup.PORTABLE_MOD}) AS h{i}"
    for i in range(dedup.N_PERMUTATIONS)
)

_MINHASH_BANDS_SQL = "\n    UNION ALL ".join(
    "SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS bucket FROM sig".format(
        b=b, cols=", ".join(f"h{b * _RPB + r}" for r in range(_RPB))
    )
    for b in range(dedup.LSH_BANDS)
)

#: shingle-hash → MinHash signatures → LSH banding, as CTEs ending in
#: ``bands`` — the shared prefix of the full-corpus pipeline and the
#: incremental (corpus×delta) probe.
_MINHASH_BANDS_CTE = f"""{_SHINGLE_SETS_CTE},
hx0 AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS base
    FROM sh
),
hx AS (SELECT doc_id, base & 1073741823 AS lo, base >> 30 AS hi FROM hx0),
sig AS (
    SELECT doc_id,
           {_MINHASH_SIG_COLS}
    FROM hx GROUP BY doc_id
),
bands AS (
    {_MINHASH_BANDS_SQL}
)"""

#: bucket-colliding candidates → exact-Jaccard verification: the full
#: LSH pipeline as CTEs ending in ``lsh_pairs``.
_MINHASH_LSH_CTE = f"""{_MINHASH_BANDS_CTE},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id
),
lsh_sc AS (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shingles, sb.shingles)) AS inter,
           len(sa.shingles) + len(sb.shingles)
               - len(list_intersect(sa.shingles, sb.shingles)) AS uni
    FROM cand
    JOIN sets sa ON sa.doc_id = doc_a
    JOIN sets sb ON sb.doc_id = doc_b
),
-- round(inter/uni, 4) as exact integer HALF_UP: round(double, 4)
-- disagrees between engines on .xxxx5 boundaries and here a flip
-- changes row membership (jaccard >= threshold), not just a value
lsh_pairs AS (
    SELECT doc_a, doc_b,
           CAST((inter * 20000 + uni) // (2 * uni) AS DOUBLE) / 10000
               AS jaccard
    FROM lsh_sc
)"""

_SIMHASH_BITS = 60  # portable base is 60 bits (15 hex chars of md5)

_SIMHASH_BSUM_COLS = ",\n           ".join(
    f"sum(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
    for k in range(_SIMHASH_BITS)
)

_SIMHASH_PACK = " + ".join(
    f"(CASE WHEN b{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(_SIMHASH_BITS)
)

_SQL: Dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE)                             AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    "rollup_order_counts": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "distinct_custs_per_status": """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    "events_hourly": """
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # incremental distinct rollup: the oracle recomputes the exact
    # weekly frame directly; the flag columns are TRUE by the sketch
    # error envelope / lossless register max-merge (a sketch or merge
    # regression flips a flag and fails the hash — cf. approx_sketches)
    "events_distinct_rollup": """
        SELECT event_type,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
               count(DISTINCT user_id) AS exact_users,
               count(DISTINCT date_trunc('day', ts)) AS n_days,
               TRUE AS merged_est_ok,
               TRUE AS merge_lossless
        FROM events
        GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM g
        )
        SELECT user_id,
               CAST(max(session_id) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM s GROUP BY user_id
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "suppliers_with_shipments": """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
    "priority_customer_union": """
        SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        UNION
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
    "running_monthly_revenue": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               round(sum(revenue) OVER (ORDER BY month
                                        ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue
        FROM monthly
    """,
    "part_brand_revenue": """
        SELECT p_brand,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "events_json_extract": """
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    "order_value_median": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """,
    "q7_nation_trade": """
        SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS volume,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND n2.n_name <> n1.n_name
        GROUP BY 1, 2, 3
    """,
    "q9_profit_by_nation_year": """
        SELECT n_name AS nation, year(l_shipdate) AS o_year,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                         - CAST(0.1 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2))
                           * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "q13_customer_order_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS n_custs FROM per_cust GROUP BY c_count
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                                      ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 4) AS promo_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    "q17_small_quantity_revenue": """
        WITH ha AS (
            SELECT l_partkey AS pk, avg(l_quantity) * 0.5 AS half_avg_qty
            FROM lineitem GROUP BY 1
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem JOIN ha ON l_partkey = pk
        WHERE l_quantity < half_avg_qty
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, sum(l_quantity) AS qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 170
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS totalprice,
               round(qty, 2) AS sum_qty
        FROM big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q19_disjunctive_revenue": """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    "q22_idle_rich_customers": """
        SELECT c_mktsegment, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
    """,
    "asof_purchase_last_click": """
        WITH clicks AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        ),
        purch AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts,
               c.ts AS click_ts, round(c.value, 2) AS click_value
        FROM purch p
        ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "price_band_counts": """
        SELECT band_id, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        JOIN (SELECT CAST(range AS INT) AS band_id,
                     range * 50000.0 AS lo, (range + 1) * 50000.0 AS hi
              FROM range(10)) b
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_id
    """,
    "pivot_status_priority": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
               count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
        FROM orders GROUP BY o_orderstatus
    """,
    "cube_returnflag_status": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "acctbal_deciles": """
        WITH t AS (
            SELECT c_acctbal,
                   ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
            FROM customer
        )
        SELECT decile, count(*) AS n_custs,
               round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal,
               round(avg(c_acctbal), 4) AS avg_bal
        FROM t GROUP BY decile
    """,
    "weekly_moving_revenue": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        ),
        d AS (
            SELECT day, revenue,
                   date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) AS dn
            FROM daily
        )
        SELECT day, revenue,
               round(sum(revenue) OVER (ORDER BY dn
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        FROM d
    """,
    "global_topk_orders": """
        WITH top AS (
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        )
        SELECT o_orderkey, c_name, round(o_totalprice, 2) AS totalprice
        FROM top JOIN customer ON o_custkey = c_custkey
    """,
    "building_bigspender_not_rich": """
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT DISTINCT o_custkey AS c_custkey FROM orders
         WHERE o_totalprice > 300000)
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    "stats_by_returnflag": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
               round(stddev_samp(l_quantity), 4) AS qty_stddev,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               count(*) AS n_items
        FROM lineitem GROUP BY l_returnflag
    """,
    "nation_wealth_full_outer": """
        WITH cn AS (
            SELECT c_nationkey AS nationkey, count(*) AS n_rich_custs
            FROM customer WHERE c_acctbal > 9000 GROUP BY 1
        ),
        sn AS (
            SELECT s_nationkey AS nationkey, count(*) AS n_rich_supps
            FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
        )
        SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
               n_rich_custs, n_rich_supps
        FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
    "grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "monthly_revenue_mom": """
        WITH monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta,
               round((revenue - lag(revenue) OVER (ORDER BY month))
                     / lag(revenue) OVER (ORDER BY month) * 100.0, 4) AS mom_pct
        FROM monthly
    """,
    "daily_revenue_gapfill": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                          (SELECT max(day) FROM daily),
                                          INTERVAL 1 DAY)) AS day
        )
        SELECT s.day,
               coalesce(d.revenue, 0.0) AS revenue,
               coalesce(d.n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    "event_value_outliers": """
        WITH stats AS (
            SELECT event_type,
                   round(avg(value), 6) AS mu,
                   round(stddev_samp(value), 6) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               round(value, 2) AS value,
               round((value - mu) / sigma, 4) AS zscore
        FROM events e JOIN stats USING (event_type)
        WHERE abs((value - mu) / sigma) > 3.0
    """,
    "customer_rfm": """
        WITH per_cust AS (
            SELECT o_custkey,
                   date_diff('day', CAST(max(o_orderdate) AS DATE),
                             DATE '2002-01-01') AS recency_days,
                   count(*) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, recency_days, frequency, monetary,
               ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
               ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
               ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score
        FROM per_cust
    """,
    "event_funnel": """
        WITH t AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                             AND t_purchase >= t_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
        FROM t
    """,
    # cohort retention matrix (relational_ext.q_user_retention_cohorts):
    # first-touch week per user, then (cohort, week) distinct actives;
    # retention uses the integer half-up round-4 formulation.
    "user_retention_cohorts": """
        WITH wk AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        ),
        first AS (
            SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id
        ),
        coh AS (
            SELECT cohort_week, count(*) AS n_cohort FROM first GROUP BY 1
        ),
        act AS (
            SELECT f.cohort_week, w.wk, count(DISTINCT w.user_id) AS n_active
            FROM wk w JOIN first f USING (user_id)
            GROUP BY 1, 2
        )
        SELECT a.cohort_week,
               CAST(datediff('day', a.cohort_week, a.wk) // 7 AS BIGINT)
                   AS week_offset,
               CAST(a.n_active AS BIGINT) AS n_active,
               CAST(c.n_cohort AS BIGINT) AS n_cohort,
               CAST((a.n_active * 20000 + c.n_cohort) // (2 * c.n_cohort)
                    AS DOUBLE) / 10000 AS retention
        FROM act a JOIN coh c USING (cohort_week)
    """,
    "order_value_distribution": """
        WITH ranked AS (
            SELECT o_orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   round(percent_rank() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC), 6) AS pct_rank,
                   round(cume_dist() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC), 6) AS cume
            FROM orders
        )
        SELECT * FROM ranked WHERE pct_rank >= 0.99
    """,
    "q2_min_cost_supplier": """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ),
        eur AS (
            SELECT s_suppkey, s_name, n_name AS supp_nation
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p_partkey, p_name, s_name, supp_nation, unit_cost, s_suppkey
            FROM cost
            JOIN part ON l_partkey = p_partkey
            JOIN eur ON l_suppkey = s_suppkey
            WHERE p_size <= 15 AND p_type = 'LARGE'
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY p_partkey
                                         ORDER BY unit_cost ASC, s_suppkey ASC) AS rn
            FROM cand
        )
        SELECT p_partkey, p_name, s_name, supp_nation, unit_cost
        FROM ranked WHERE rn = 1
    """,
    "q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN dec_rev
                                   ELSE CAST(0 AS DECIMAL(3,2)) END) AS DOUBLE)
                     / CAST(sum(dec_rev) AS DOUBLE), 4) AS mkt_share,
               CAST(round(sum(dec_rev), 2) AS DOUBLE) AS total_volume
        FROM (
            SELECT o_orderdate, n2.n_name AS supp_nation,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2))) AS dec_rev
            FROM lineitem
            JOIN part      ON l_partkey = p_partkey AND p_type = 'STANDARD'
            JOIN orders    ON l_orderkey = o_orderkey
            JOIN customer  ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
            JOIN supplier  ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
        )
        GROUP BY o_year
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name AS nation,
               round(c_acctbal, 2) AS acctbal,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2)
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-10-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q11_important_parts": """
        WITH vals AS (
            SELECT l_partkey AS p_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                JOIN nation ON s_nationkey = n_nationkey
                                WHERE n_name = 'NATION_7')
            GROUP BY 1
        )
        SELECT p_partkey, CAST(round(value_dec, 2) AS DOUBLE) AS value
        FROM vals
        WHERE CAST(value_dec AS DOUBLE)
              > (SELECT CAST(sum(value_dec) AS DOUBLE) FROM vals) * 0.001
    """,
    "q12_shipping_delay": """
        SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 90 THEN 'medium'
                    ELSE 'slow' END AS ship_bucket,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name,
               CAST(round(rev_dec, 2) AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q20_part_promotion_suppliers": """
        WITH pq AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
            GROUP BY 1, 2
        ),
        tot AS (SELECT l_partkey AS pk, sum(qty_dec) AS total_dec
                FROM pq GROUP BY 1)
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
          AND s_suppkey IN (
              SELECT DISTINCT l_suppkey
              FROM pq JOIN tot ON l_partkey = pk
              WHERE CAST(qty_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.25)
    """,
    "q21_waiting_suppliers": """
        WITH lf AS (
            SELECT l_orderkey, l_suppkey, l_shipdate
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderstatus = 'F')
        ),
        per_order AS (
            SELECT l_orderkey AS ok, max(l_shipdate) AS max_ship,
                   count(DISTINCT l_suppkey) AS n_supp
            FROM lf GROUP BY 1
        ),
        ach AS (
            SELECT DISTINCT lf.l_orderkey, lf.l_suppkey
            FROM lf JOIN per_order
              ON lf.l_orderkey = ok AND lf.l_shipdate = max_ship
            WHERE n_supp >= 2
        ),
        uniq AS (
            SELECT l_orderkey, min(l_suppkey) AS sk
            FROM ach GROUP BY 1 HAVING count(*) = 1
        )
        SELECT s_name, count(*) AS numwait
        FROM uniq JOIN supplier ON sk = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    "dedup_exact": """
        SELECT doc_id,
               sha256(text) AS text_hash,
               min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id,
               CAST(doc_id <> min(doc_id) OVER (PARTITION BY sha256(text)) AS INT) AS is_dup
        FROM documents
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES_CTE},
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST((n_common * 20000 + (ca.n + cb.n - n_common))
                    // (2 * (ca.n + cb.n - n_common)) AS DOUBLE) / 10000
                   AS jaccard
        FROM common
        JOIN counts ca ON ca.doc_id = doc_a
        JOIN counts cb ON cb.doc_id = doc_b
        WHERE CAST((n_common * 20000 + (ca.n + cb.n - n_common))
                   // (2 * (ca.n + cb.n - n_common)) AS DOUBLE) / 10000
              >= {dedup.JACCARD_THRESHOLD}
    """,
    "dedup_groups": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM common
            JOIN counts ca ON ca.doc_id = doc_a
            JOIN counts cb ON cb.doc_id = doc_b
            WHERE CAST((n_common * 20000 + (ca.n + cb.n - n_common))
                       // (2 * (ca.n + cb.n - n_common)) AS DOUBLE) / 10000
                  >= {dedup.JACCARD_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
        )
        SELECT n AS doc_id, min(m) AS group_id FROM reach GROUP BY n
    """,
    "curate_documents": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM common
            JOIN counts ca ON ca.doc_id = doc_a
            JOIN counts cb ON cb.doc_id = doc_b
            WHERE CAST((n_common * 20000 + (ca.n + cb.n - n_common))
                       // (2 * (ca.n + cb.n - n_common)) AS DOUBLE) / 10000
                  >= {dedup.JACCARD_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
        ),
        groups AS (SELECT n AS doc_id, min(m) AS group_id FROM reach GROUP BY n),
        quality AS (
            SELECT doc_id FROM documents
            WHERE len(string_split_regex(trim(text), '\\s+')) >= 5
              AND length(text) >= 20
              AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / length(text) > 0.5
        ),
        exact_keep AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
                FROM documents
            ) WHERE doc_id = keep_id
        )
        SELECT q.doc_id
        FROM quality q
        JOIN exact_keep e ON e.doc_id = q.doc_id
        JOIN groups g ON g.doc_id = q.doc_id AND g.group_id = g.doc_id
    """,
    "dedup_minhash_lsh": f"""
        WITH {_MINHASH_LSH_CTE}
        SELECT doc_a, doc_b, jaccard
        FROM lsh_pairs
        WHERE jaccard >= {dedup.JACCARD_THRESHOLD}
    """,
    # incremental refresh probe: bands over ALL docs (signatures are
    # per-doc, so banding the corpus and the delta separately — what
    # the Spark operator does — yields identical rows), candidates
    # restricted to corpus×delta by the deterministic doc_id%4 split.
    "dedup_incremental": f"""
        WITH {_MINHASH_BANDS_CTE},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id % {dedup.INCR_SPLIT_MOD} != {dedup.INCR_DELTA_REM}
              AND b.doc_id % {dedup.INCR_SPLIT_MOD} = {dedup.INCR_DELTA_REM}
        ),
        incr_sc AS (
            SELECT doc_a, doc_b,
                   len(list_intersect(sa.shingles, sb.shingles)) AS inter,
                   len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles)) AS uni
            FROM cand
            JOIN sets sa ON sa.doc_id = doc_a
            JOIN sets sb ON sb.doc_id = doc_b
        )
        SELECT doc_a, doc_b,
               CAST((inter * 20000 + uni) // (2 * uni) AS DOUBLE) / 10000
                   AS jaccard
        FROM incr_sc
        WHERE CAST((inter * 20000 + uni) // (2 * uni) AS DOUBLE) / 10000
              >= {dedup.JACCARD_THRESHOLD}
    """,
    # Takedown twin (delete_from_dedup_index inline): the incremental
    # probe with the victims (corpus docs, doc_id % 3 = 2) excluded
    # from the corpus BANDING before candidates form — exactly the
    # tombstone anti-join's placement.  Table path pinned equal in
    # tests/test_dedup_incremental.py.
    "dedup_deleted": f"""
        WITH {_MINHASH_BANDS_CTE},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.doc_id % {dedup.INCR_SPLIT_MOD} != {dedup.INCR_DELTA_REM}
              AND a.doc_id % {dedup.DEL_SPLIT_MOD} != {dedup.DEL_REM}
              AND b.doc_id % {dedup.INCR_SPLIT_MOD} = {dedup.INCR_DELTA_REM}
        ),
        incr_sc AS (
            SELECT doc_a, doc_b,
                   len(list_intersect(sa.shingles, sb.shingles)) AS inter,
                   len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles)) AS uni
            FROM cand
            JOIN sets sa ON sa.doc_id = doc_a
            JOIN sets sb ON sb.doc_id = doc_b
        )
        SELECT doc_a, doc_b,
               CAST((inter * 20000 + uni) // (2 * uni) AS DOUBLE) / 10000
                   AS jaccard
        FROM incr_sc
        WHERE CAST((inter * 20000 + uni) // (2 * uni) AS DOUBLE) / 10000
              >= {dedup.JACCARD_THRESHOLD}
    """,
    "dedup_simhash": f"""
        WITH {_SHINGLE_SETS_CTE},
        hx AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
            FROM sh
        ),
        bsum AS (
            SELECT doc_id,
                   {_SIMHASH_BSUM_COLS}
            FROM hx GROUP BY doc_id
        ),
        sim AS (
            SELECT doc_id, {_SIMHASH_PACK} AS simhash FROM bsum
        ),
        chunks AS (
            SELECT doc_id, simhash, r.range AS ci,
                   (simhash >> (r.range * 8)) & 255 AS cv
            FROM sim CROSS JOIN range(0, 8) r
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM chunks a
        JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
    """,
    "curate_documents_scale": f"""
        WITH RECURSIVE {_MINHASH_LSH_CTE},
        pairs AS (
            SELECT doc_a, doc_b FROM lsh_pairs
            WHERE jaccard >= {dedup.JACCARD_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, m) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
        ),
        groups AS (SELECT n AS doc_id, min(m) AS group_id FROM reach GROUP BY n),
        quality AS (
            SELECT doc_id FROM documents
            WHERE len(string_split_regex(trim(text), '\\s+')) >= 5
              AND length(text) >= 20
              AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / length(text) > 0.5
        ),
        exact_keep AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
                FROM documents
            ) WHERE doc_id = keep_id
        )
        SELECT q.doc_id
        FROM quality q
        JOIN exact_keep e ON e.doc_id = q.doc_id
        JOIN groups g ON g.doc_id = q.doc_id AND g.group_id = g.doc_id
    """,
    "ann_cosine_topk": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        q AS (SELECT * FROM n WHERE vec_id % {similarity.QUERY_MODULUS} = 0),
        sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4) AS sim
            FROM q JOIN n c ON c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {similarity.TOP_K}
    """,
    "ann_l2_topk": f"""
        -- negated squared L2 (one higher-is-better convention across
        -- all serving metrics); same fold order both engines.
        -- floor(x*1e4+0.5)/1e4 = similarity._round4_portable: pure
        -- IEEE double rounding, no engine decimal semantics (r12)
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        q AS (SELECT * FROM v WHERE vec_id % {similarity.QUERY_MODULUS} = 0),
        sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   floor(-list_sum(list_transform(
                       list_zip(q.e, c.e),
                       p -> (p[1] - p[2]) * (p[1] - p[2])))
                       * 10000 + 0.5) / 10000 AS sim
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {similarity.TOP_K}
    """,
    "ann_ip_topk": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        q AS (SELECT * FROM v WHERE vec_id % {similarity.QUERY_MODULUS} = 0),
        sims AS (
            -- floor half-up: the _round4_portable twin (r12)
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   floor(list_dot_product(q.e, c.e) * 10000 + 0.5)
                       / 10000 AS sim
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {similarity.TOP_K}
    """,
    "ann_cosine_topk_quantized": f"""
        -- int8 scalar quantization: all quantized components are
        -- integers, so dots/norms are exact in double arithmetic on
        -- both engines (no fold-order sensitivity)
        WITH sv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(CAST(x AS DOUBLE)))),
                            1e-30) / 127.0 AS s
            FROM embeddings
        ),
        qv AS (
            SELECT vec_id,
                   list_transform(e, x -> floor(x / s + 0.5)) AS q
            FROM sv
        ),
        n AS (
            SELECT vec_id, q,
                   sqrt(list_sum(list_transform(q, x -> x * x))) AS nrm
            FROM qv
        ),
        qq AS (SELECT * FROM n WHERE vec_id % {similarity.QUERY_MODULUS} = 0),
        sims AS (
            SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_dot_product(qq.q, c.q) / (qq.nrm * c.nrm), 4) AS sim
            FROM qq JOIN n c ON c.vec_id <> qq.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {similarity.TOP_K}
    """,
    # filtered ANN: same quantized arithmetic, neighbor set restricted
    # to one label BEFORE ranking (pre-filter semantics — every query's
    # top-k comes entirely from the filtered subset)
    "ann_filtered_topk": f"""
        WITH sv AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(CAST(x AS DOUBLE)))),
                            1e-30) / 127.0 AS s
            FROM embeddings
        ),
        qv AS (
            SELECT vec_id, label,
                   list_transform(e, x -> floor(x / s + 0.5)) AS q
            FROM sv
        ),
        n AS (
            SELECT vec_id, label, q,
                   sqrt(list_sum(list_transform(q, x -> x * x))) AS nrm
            FROM qv
        ),
        qq AS (SELECT * FROM n WHERE vec_id % {similarity.QUERY_MODULUS} = 0),
        sims AS (
            SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_dot_product(qq.q, c.q) / (qq.nrm * c.nrm), 4) AS sim
            FROM qq JOIN n c
              ON c.vec_id <> qq.vec_id
             AND c.label = {similarity.FILTER_LABEL}
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {similarity.TOP_K}
    """,
    # PQ ADC shortlist + exact re-rank over the int8-quantized vectors:
    # encoding scores, ADC dots, and reconstructed norms are all
    # integer-valued, so argmin and the grouped sums are exact and
    # order-insensitive on both engines (same trick as the quantized
    # search above)
    "ann_pq_topk": f"""
        WITH sv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(CAST(x AS DOUBLE)))),
                            1e-30) / 127.0 AS s
            FROM embeddings
        ),
        n AS (
            SELECT vec_id, q,
                   sqrt(list_sum(list_transform(q, x -> x * x))) AS nrm
            FROM (SELECT vec_id,
                         list_transform(e, x -> floor(x / s + 0.5)) AS q
                  FROM sv)
        ),
        parts AS (
            SELECT vec_id, r.range AS m,
                   q[(r.range * {similarity.PQ_SUBDIM} + 1):
                     (r.range * {similarity.PQ_SUBDIM} + {similarity.PQ_SUBDIM})]
                       AS sub
            FROM n CROSS JOIN range(0, {similarity.PQ_M}) r
        ),
        cb AS (
            SELECT m, vec_id AS entry_id, sub AS c_sub,
                   list_sum(list_transform(sub, x -> x * x)) AS c_nrm2
            FROM parts WHERE vec_id % {similarity.PQ_CODEBOOK_MODULUS} = 0
        ),
        codes AS (
            SELECT vec_id, m, entry_id AS code, c_nrm2 AS code_nrm2 FROM (
                SELECT p.vec_id, p.m, c.entry_id, c.c_nrm2,
                       row_number() OVER (PARTITION BY p.vec_id, p.m
                           ORDER BY c.c_nrm2
                                    - 2 * list_dot_product(p.sub, c.c_sub) ASC,
                                    c.entry_id ASC) AS rn
                FROM parts p JOIN cb c ON c.m = p.m
            ) WHERE rn = 1
        ),
        lut AS (
            SELECT qp.vec_id AS query_id, qp.m, c.entry_id,
                   list_dot_product(qp.sub, c.c_sub) AS pdot
            FROM parts qp JOIN cb c ON c.m = qp.m
            WHERE qp.vec_id % {similarity.QUERY_MODULUS} = 0
        ),
        adc AS (
            SELECT l.query_id, co.vec_id,
                   sum(l.pdot) AS adc, sum(co.code_nrm2) AS rnrm2
            FROM codes co JOIN lut l ON l.m = co.m AND l.entry_id = co.code
            GROUP BY 1, 2
        ),
        shortlist AS (
            SELECT query_id, vec_id AS neighbor_id FROM (
                SELECT a.query_id, a.vec_id,
                       row_number() OVER (PARTITION BY a.query_id
                           ORDER BY round(a.adc / (qn.nrm * sqrt(a.rnrm2)), 4)
                                        DESC,
                                    a.vec_id ASC) AS r
                FROM adc a JOIN n qn ON qn.vec_id = a.query_id
                WHERE a.vec_id <> a.query_id
            ) WHERE r <= {similarity.PQ_RERANK}
        ),
        rer AS (
            SELECT s.query_id, s.neighbor_id,
                   round(list_dot_product(q.q, c.q) / (q.nrm * c.nrm), 4) AS sim
            FROM shortlist s
            JOIN n q ON q.vec_id = s.query_id
            JOIN n c ON c.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, sim, rank FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM rer
        ) WHERE rank <= {similarity.TOP_K}
    """,
    "ann_pq_topk_l2": f"""
        -- l2-serving flat PQ (r16): same quantize/codebook/encode/LUT
        -- pipeline as ann_pq_topk, scored as NEGATED squared L2 —
        -- ADC via |q|^2 + |x̂|^2 − 2·q·x̂ (reconstructed norm = Σ
        -- code_nrm2), exact re-rank via the norm identity on the
        -- quantized vectors; floor(x*1e4+0.5)/1e4 is the
        -- _round4_portable twin (integer components keep every
        -- pre-round double exact in both engines)
        WITH sv AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   greatest(list_max(list_transform(embedding,
                                                    x -> abs(CAST(x AS DOUBLE)))),
                            1e-30) / 127.0 AS s
            FROM embeddings
        ),
        n AS (
            SELECT vec_id, q,
                   sqrt(list_sum(list_transform(q, x -> x * x))) AS nrm
            FROM (SELECT vec_id,
                         list_transform(e, x -> floor(x / s + 0.5)) AS q
                  FROM sv)
        ),
        parts AS (
            SELECT vec_id, r.range AS m,
                   q[(r.range * {similarity.PQ_SUBDIM} + 1):
                     (r.range * {similarity.PQ_SUBDIM} + {similarity.PQ_SUBDIM})]
                       AS sub
            FROM n CROSS JOIN range(0, {similarity.PQ_M}) r
        ),
        cb AS (
            SELECT m, vec_id AS entry_id, sub AS c_sub,
                   list_sum(list_transform(sub, x -> x * x)) AS c_nrm2
            FROM parts WHERE vec_id % {similarity.PQ_CODEBOOK_MODULUS} = 0
        ),
        codes AS (
            SELECT vec_id, m, entry_id AS code, c_nrm2 AS code_nrm2 FROM (
                SELECT p.vec_id, p.m, c.entry_id, c.c_nrm2,
                       row_number() OVER (PARTITION BY p.vec_id, p.m
                           ORDER BY c.c_nrm2
                                    - 2 * list_dot_product(p.sub, c.c_sub) ASC,
                                    c.entry_id ASC) AS rn
                FROM parts p JOIN cb c ON c.m = p.m
            ) WHERE rn = 1
        ),
        lut AS (
            SELECT qp.vec_id AS query_id, qp.m, c.entry_id,
                   list_dot_product(qp.sub, c.c_sub) AS pdot
            FROM parts qp JOIN cb c ON c.m = qp.m
            WHERE qp.vec_id % {similarity.QUERY_MODULUS} = 0
        ),
        adc AS (
            SELECT l.query_id, co.vec_id,
                   sum(l.pdot) AS adc, sum(co.code_nrm2) AS rnrm2
            FROM codes co JOIN lut l ON l.m = co.m AND l.entry_id = co.code
            GROUP BY 1, 2
        ),
        shortlist AS (
            SELECT query_id, vec_id AS neighbor_id FROM (
                SELECT a.query_id, a.vec_id,
                       row_number() OVER (PARTITION BY a.query_id
                           ORDER BY floor(-(qn.nrm * qn.nrm + a.rnrm2
                                            - 2 * a.adc) * 10000 + 0.5)
                                        / 10000 DESC,
                                    a.vec_id ASC) AS r
                FROM adc a JOIN n qn ON qn.vec_id = a.query_id
                WHERE a.vec_id <> a.query_id
            ) WHERE r <= {similarity.PQ_RERANK}
        ),
        rer AS (
            SELECT s.query_id, s.neighbor_id,
                   floor(-(q.nrm * q.nrm + c.nrm * c.nrm
                           - 2 * list_dot_product(q.q, c.q)) * 10000 + 0.5)
                       / 10000 AS sim
            FROM shortlist s
            JOIN n q ON q.vec_id = s.query_id
            JOIN n c ON c.vec_id = s.neighbor_id
        )
        SELECT query_id, neighbor_id, sim, rank FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM rer
        ) WHERE rank <= {similarity.TOP_K}
    """,
    "ann_ivf_topk": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        cent AS (
            SELECT vec_id AS centroid_id, e AS c_e, nrm AS c_nrm
            FROM n WHERE vec_id % {similarity.IVF_CENTROID_MODULUS} = 0
        ),
        assigned AS (
            SELECT vec_id, e, nrm, centroid_id FROM (
                SELECT n.vec_id, n.e, n.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY list_dot_product(n.e, c.c_e)
                                    / (n.nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS rn
                FROM n CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        queries AS (
            SELECT vec_id AS query_id, e AS q_e, nrm AS q_nrm
            FROM assigned WHERE vec_id % {similarity.QUERY_MODULUS} = 0
        ),
        probes AS (
            SELECT query_id, q_e, q_nrm, centroid_id FROM (
                SELECT q.query_id, q.q_e, q.q_nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.q_e, c.c_e)
                                    / (q.q_nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS p
                FROM queries q CROSS JOIN cent c
            ) WHERE p <= {similarity.IVF_NPROBE}
        ),
        hits AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(p.q_e, a.e) / (p.q_nrm * a.nrm), 4)
                       AS sim
            FROM probes p JOIN assigned a ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, sim, rank FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM hits
        ) WHERE rank <= {similarity.TOP_K}
    """,
    # Incremental IVF (the append-lifecycle twin): centroids frozen
    # from the SEED corpus only (vec_id % 4 <> 3 — what build_ivf_index
    # materialized), every vector including the DELTA assigned to those
    # frozen centroids (what append_to_ivf_index does), delta queries
    # (vec_id % 20 = 3) probing the post-append index.  Identical math
    # to ann_ivf_topk with two predicates changed; the table-backed
    # path is pinned bit-equal to this inline twin in
    # tests/test_index_append.py, so this value-hash gates it too.
    "ann_ivf_incremental": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        cent AS (
            SELECT vec_id AS centroid_id, e AS c_e, nrm AS c_nrm
            FROM n WHERE vec_id % {similarity.IVF_CENTROID_MODULUS} = 0
              AND vec_id % {similarity.INCR_SPLIT_MOD}
                  <> {similarity.INCR_DELTA_REM}
        ),
        assigned AS (
            SELECT vec_id, e, nrm, centroid_id FROM (
                SELECT n.vec_id, n.e, n.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY list_dot_product(n.e, c.c_e)
                                    / (n.nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS rn
                FROM n CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        queries AS (
            SELECT vec_id AS query_id, e AS q_e, nrm AS q_nrm
            FROM assigned WHERE vec_id % {similarity.INCR_QUERY_MODULUS}
                = {similarity.INCR_DELTA_REM}
        ),
        probes AS (
            SELECT query_id, q_e, q_nrm, centroid_id FROM (
                SELECT q.query_id, q.q_e, q.q_nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.q_e, c.c_e)
                                    / (q.q_nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS p
                FROM queries q CROSS JOIN cent c
            ) WHERE p <= {similarity.IVF_NPROBE}
        ),
        hits AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(p.q_e, a.e) / (p.q_nrm * a.nrm), 4)
                       AS sim
            FROM probes p JOIN assigned a ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, sim, rank FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM hits
        ) WHERE rank <= {similarity.TOP_K}
    """,
    # Delete-lifecycle twin (the tombstone semantics of
    # similarity.delete_from_index inline): index built over the FULL
    # corpus (centroids = the plain modulus subset, frozen — deletes
    # never move centroids), victims (vec_id % 4 = 3, the incremental
    # twin's split reused) excluded from the CANDIDATE lists before
    # ranking, standing queries (vec_id % 50 = 0, never victims since
    # 50 ≡ 2 mod 4) probing the post-delete index.  The table-backed
    # path (build → delete_from_index → ann_ivf_probe) is pinned
    # bit-equal to this inline twin in tests/test_index_append.py, so
    # the value-hash gates the tombstone exclusion end to end.
    "ann_ivf_deleted": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        cent AS (
            SELECT vec_id AS centroid_id, e AS c_e, nrm AS c_nrm
            FROM n WHERE vec_id % {similarity.IVF_CENTROID_MODULUS} = 0
        ),
        assigned AS (
            SELECT vec_id, e, nrm, centroid_id FROM (
                SELECT n.vec_id, n.e, n.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY list_dot_product(n.e, c.c_e)
                                    / (n.nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS rn
                FROM n CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        queries AS (
            SELECT vec_id AS query_id, e AS q_e, nrm AS q_nrm
            FROM assigned WHERE vec_id % {similarity.QUERY_MODULUS} = 0
        ),
        probes AS (
            SELECT query_id, q_e, q_nrm, centroid_id FROM (
                SELECT q.query_id, q.q_e, q.q_nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY list_dot_product(q.q_e, c.c_e)
                                    / (q.q_nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS p
                FROM queries q CROSS JOIN cent c
            ) WHERE p <= {similarity.IVF_NPROBE}
        ),
        hits AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   round(list_dot_product(p.q_e, a.e) / (p.q_nrm * a.nrm), 4)
                       AS sim
            FROM probes p JOIN assigned a ON a.centroid_id = p.centroid_id
            WHERE a.vec_id <> p.query_id
              AND a.vec_id % {similarity.INCR_SPLIT_MOD}
                  <> {similarity.INCR_DELTA_REM}
        )
        SELECT query_id, neighbor_id, sim, rank FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM hits
        ) WHERE rank <= {similarity.TOP_K}
    """,
    "embedding_near_dup": """
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.9
    """,
    # SemDeDup (cluster-then-prune): nearest-modulus-centroid assignment
    # exactly as ann_ivf_topk, then pairwise cosine INSIDE each cluster
    # only.  The registry member runs tau=0.5 because the synthetic
    # embeddings are near-random (max pairwise cosine ~0.6 at sf0.1) —
    # the paper-typical 0.95 default would make the drop path
    # unreachable on this fixture.
    "semantic_dedup": f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        cent AS (
            SELECT vec_id AS centroid_id, e AS c_e, nrm AS c_nrm
            FROM n WHERE vec_id % {{cent_mod}} = 0
        ),
        assigned AS (
            SELECT vec_id, e, nrm, centroid_id FROM (
                SELECT n.vec_id, n.e, n.nrm, c.centroid_id,
                       row_number() OVER (
                           PARTITION BY n.vec_id
                           ORDER BY list_dot_product(n.e, c.c_e)
                                    / (n.nrm * c.c_nrm) DESC,
                                    c.centroid_id ASC) AS rn
                FROM n CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        mates AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS sim
            FROM assigned a JOIN assigned b
                ON a.centroid_id = b.centroid_id AND a.vec_id <> b.vec_id
        ),
        prof AS (
            SELECT vec_a,
                   sum(CASE WHEN sim >= {{tau}} THEN 1 ELSE 0 END) AS n_close,
                   max(sim) AS max_mate_sim,
                   max(CASE WHEN sim >= {{tau}} AND vec_b < vec_a
                       THEN 1 ELSE 0 END) AS dominated
            FROM mates GROUP BY vec_a
        )
        SELECT a.vec_id, a.centroid_id,
               CAST(COALESCE(p.n_close, 0) AS BIGINT) AS n_close,
               p.max_mate_sim,
               CAST(1 - COALESCE(p.dominated, 0) AS INT) AS kept
        FROM assigned a LEFT JOIN prof p ON p.vec_a = a.vec_id
    """.replace("{cent_mod}", str(similarity.IVF_CENTROID_MODULUS)).replace(
        "{tau}", "0.5"
    ),
    "text_quality": f"""
        -- ratios use the same integer half-up rounding as the Spark
        -- side (_ratio4): floor((a*20000 + b) / (2b)) / 10000 —
        -- round(double, 4) semantics differ between engines on
        -- .xxxx5 boundaries
        WITH m AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split_regex(trim(text), '\\s+')) AS n_words,
                   length(regexp_replace(text, '\\s+', '', 'g')) AS n_nospace,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                   len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                   t -> t IN ({_STOPWORDS_SQL}))) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               n_chars,
               n_words,
               floor((n_nospace*20000 + n_words) / (n_words*2)) / 10000 AS avg_word_len,
               floor((n_alpha*20000 + n_chars) / (n_chars*2)) / 10000 AS alpha_ratio,
               floor((n_digit*20000 + n_chars) / (n_chars*2)) / 10000 AS digit_ratio,
               floor((n_punct*20000 + n_chars) / (n_chars*2)) / 10000 AS punct_ratio,
               floor((n_stop*20000 + n_words) / (n_words*2)) / 10000 AS stopword_ratio,
               CAST(n_words >= 5 AND n_chars >= 20
                    AND n_alpha / n_chars > 0.5 AS INT) AS quality_keep
        FROM m
    """,
    "token_counts": """
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_regex_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_llm_tokens
        FROM documents
    """,
    "chunk_documents": f"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        ),
        starts AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t),
                          {text.CHUNK_TOKENS - text.CHUNK_OVERLAP})) AS s
            FROM toks
        )
        SELECT doc_id,
               CAST((s - 1) / {text.CHUNK_TOKENS - text.CHUNK_OVERLAP} AS BIGINT)
                   AS chunk_id,
               array_to_string(t[s : s + {text.CHUNK_TOKENS} - 1], ' ')
                   AS chunk_text,
               least({text.CHUNK_TOKENS}, len(t) - s + 1) AS n_tokens
        FROM starts
    """,
    "redact_pii": f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{text.PII_PATTERNS[0][1]}', '<EMAIL>', 'g'),
                   '{text.PII_PATTERNS[1][1]}', '<IP>', 'g'),
                   '{text.PII_PATTERNS[2][1]}', '<PHONE>', 'g') AS clean_text,
               len(regexp_extract_all(text, '{text.PII_PATTERNS[0][1]}'))
               + len(regexp_extract_all(text, '{text.PII_PATTERNS[1][1]}'))
               + len(regexp_extract_all(text, '{text.PII_PATTERNS[2][1]}'))
                   AS n_redactions
        FROM documents
    """,
    "vocab_document_frequency": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        tf AS (
            SELECT unnest(t) AS token FROM toks
        ),
        tfc AS (SELECT token, count(*) AS tf FROM tf GROUP BY token),
        dfc AS (
            SELECT token, count(*) AS df FROM (
                SELECT doc_id, unnest(list_distinct(t)) AS token FROM toks
            ) GROUP BY token
        )
        SELECT tfc.token AS token, tf, df,
               round(ln(((SELECT count(*) FROM documents) + 1.0)
                        / (df + 1.0)), 6) AS idf
        FROM tfc JOIN dfc ON tfc.token = dfc.token
        ORDER BY df DESC, token ASC
        LIMIT 100
    """,
    # Unigram-frequency quality profile: integer counts + the _ratio4
    # half-up formulation — deliberately NO per-token log sum (float
    # fold order is partitioning-dependent, not hashable cross-engine).
    "rare_token_profile": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        occ AS (SELECT doc_id, unnest(t) AS token FROM toks),
        dfs AS (
            SELECT token, count(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM occ) GROUP BY token
        ),
        per_doc AS (
            SELECT o.doc_id,
                   count(*) AS n_tokens,
                   count(DISTINCT o.token) AS n_distinct,
                   sum(CASE WHEN d.df <= {rare_df} THEN 1 ELSE 0 END) AS n_rare,
                   sum(least(d.df, {df_cap})) AS capped_df_sum
            FROM occ o JOIN dfs d ON o.token = d.token
            GROUP BY o.doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               CAST(n_rare AS BIGINT) AS n_rare,
               floor((n_rare*20000 + n_tokens) / (n_tokens*2)) / 10000
                   AS rare_ratio,
               floor((capped_df_sum*20000 + n_tokens) / (n_tokens*2)) / 10000
                   AS avg_capped_df,
               CAST(n_rare * 2 <= n_tokens AS INT) AS freq_keep
        FROM per_doc
    """.replace("{rare_df}", str(text.RARE_DF_MAX)).replace(
        "{df_cap}", str(text.COMMON_DF_CAP)
    ),
    # Paragraph-level exact dedup: md5 paragraph hashes, first
    # occurrence (lowest doc_id, para_idx) owns; the oracle spells the
    # owner rule as a row_number window where Spark uses min_by.
    "paragraph_dedup": """
        WITH p0 AS (
            SELECT doc_id, string_split_regex(text, '\\n\\s*\\n') AS ps
            FROM documents
        ),
        p1 AS (
            SELECT doc_id, ps,
                   unnest(generate_series(1, len(ps))) AS i
            FROM p0
        ),
        p2 AS (
            SELECT doc_id, i - 1 AS para_idx, trim(ps[i]) AS para FROM p1
        ),
        p3 AS (
            SELECT doc_id, para_idx, length(para) AS n_chars, md5(para) AS h
            FROM p2 WHERE length(para) >= {min_chars}
        ),
        tagged AS (
            SELECT doc_id, n_chars,
                   CASE WHEN count(*) OVER (PARTITION BY h) > 1
                             AND row_number() OVER (
                                 PARTITION BY h
                                 ORDER BY doc_id, para_idx) > 1
                        THEN 1 ELSE 0 END AS is_dup
            FROM p3
        ),
        per_doc AS (
            SELECT doc_id,
                   count(*) AS n_paras,
                   sum(is_dup) AS n_dup_paras,
                   sum(n_chars) AS para_chars,
                   sum(n_chars * is_dup) AS dup_chars
            FROM tagged GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_paras AS BIGINT) AS n_paras,
               CAST(n_dup_paras AS BIGINT) AS n_dup_paras,
               CAST(para_chars AS BIGINT) AS para_chars,
               CAST(dup_chars AS BIGINT) AS dup_chars,
               floor((n_dup_paras*20000 + n_paras) / (n_paras*2)) / 10000
                   AS dup_para_ratio,
               floor((dup_chars*20000 + para_chars) / (para_chars*2)) / 10000
                   AS dup_char_ratio,
               CAST(dup_chars * 2 < para_chars AS INT) AS para_keep
        FROM per_doc
    """.replace("{min_chars}", str(text.PARA_MIN_CHARS)),
    # Exact duplicated-substring dedup (Lee et al. 2022 ExactSubstr at
    # k-token resolution): md5 gram hashes, global first occurrence
    # owns, covered positions merge into maximal spans, rewrite md5
    # recomputed via string_agg ORDER BY position.
    "substring_dedup": """
        WITH toks AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        g0 AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - {km1})) AS i
            FROM toks WHERE len(t) >= {k}
        ),
        grams AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(list_slice(t, i, i + {km1}), ' ')) AS h
            FROM g0
        ),
        tagged AS (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY h) AS n_occ,
                   row_number() OVER (
                       PARTITION BY h ORDER BY doc_id, pos) AS rn
            FROM grams
        ),
        dup AS (SELECT doc_id, pos FROM tagged WHERE n_occ > 1 AND rn > 1),
        cov0 AS (
            SELECT doc_id,
                   unnest(generate_series(pos, pos + {km1})) AS tpos
            FROM dup
        ),
        covered AS (SELECT DISTINCT doc_id, tpos FROM cov0),
        spans AS (
            SELECT doc_id, tpos,
                   CASE WHEN lag(tpos) OVER w IS NULL
                             OR tpos > lag(tpos) OVER w + 1
                        THEN 1 ELSE 0 END AS brk
            FROM covered
            WINDOW w AS (PARTITION BY doc_id ORDER BY tpos)
        ),
        per_doc_dup AS (
            SELECT doc_id, count(*) AS n_dup_tokens, sum(brk) AS n_dup_spans
            FROM spans GROUP BY doc_id
        ),
        tok0 AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
            FROM toks
        ),
        tokens AS (SELECT doc_id, i - 1 AS tpos, t[i] AS token FROM tok0),
        kept AS (
            SELECT tk.doc_id, tk.tpos, tk.token
            FROM tokens tk
            LEFT JOIN covered c
              ON tk.doc_id = c.doc_id AND tk.tpos = c.tpos
            WHERE c.doc_id IS NULL
        ),
        rewritten AS (
            SELECT doc_id,
                   md5(string_agg(token, ' ' ORDER BY tpos)) AS dedup_md5,
                   count(*) AS n_kept_tokens
            FROM kept GROUP BY doc_id
        ),
        base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
        SELECT b.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(coalesce(n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
               floor((coalesce(n_dup_tokens, 0) * 20000 + b.n_tokens)
                     / (b.n_tokens * 2)) / 10000 AS dup_token_ratio,
               CAST(coalesce(n_kept_tokens, 0) AS BIGINT) AS n_kept_tokens,
               dedup_md5,
               CAST(coalesce(n_dup_tokens, 0) * 2 < b.n_tokens AS INT)
                   AS substr_keep
        FROM base b
        LEFT JOIN per_doc_dup USING (doc_id)
        LEFT JOIN rewritten USING (doc_id)
    """.replace("{km1}", str(text.SUBSTR_K - 1)).replace(
        "{k}", str(text.SUBSTR_K)
    ),
    # Gopher rule filter (Rae et al. 2021 Table A1): flags are pure
    # integer comparisons (n*10 vs m*k), never a rounded-ratio
    # threshold, so no float boundary can flip a rule cross-engine.
    # (BPE merge learning is generated below — see _bpe_oracle_sql.)
    "gopher_quality": f"""
        WITH m AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS n_words,
                   length(regexp_replace(text, '\\s+', '', 'g')) AS n_nospace,
                   length(regexp_replace(text, '[^#…]', '', 'g')) AS n_symbols,
                   len(string_split(text, chr(10))) AS n_lines,
                   len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(l, '^\\s*([-*•]|\\d+[.)])\\s')))
                       AS n_bullet,
                   len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                       AS n_ellipsis,
                   len(list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha_words,
                   len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                   t -> t IN ({{stopwords}}))) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               floor((n_nospace*20000 + n_words) / (n_words*2)) / 10000
                   AS mean_word_len,
               floor((n_symbols*20000 + n_words) / (n_words*2)) / 10000
                   AS symbol_ratio,
               floor((n_bullet*20000 + n_lines) / (n_lines*2)) / 10000
                   AS bullet_ratio,
               floor((n_ellipsis*20000 + n_lines) / (n_lines*2)) / 10000
                   AS ellipsis_ratio,
               floor((n_alpha_words*20000 + n_words) / (n_words*2)) / 10000
                   AS alpha_word_ratio,
               CAST(n_stop AS BIGINT) AS n_stopwords,
               CAST(n_words >= 5 AND n_words <= 100000 AS INT) AS r_words,
               CAST(n_nospace*10 >= n_words*30
                    AND n_nospace*10 <= n_words*100 AS INT) AS r_wordlen,
               CAST(n_symbols*10 <= n_words AS INT) AS r_symbols,
               CAST(n_bullet*10 <= n_lines*9 AS INT) AS r_bullets,
               CAST(n_ellipsis*10 <= n_lines*3 AS INT) AS r_ellipsis,
               CAST(n_alpha_words*10 >= n_words*8 AS INT) AS r_alpha,
               CAST(n_stop >= 2 AS INT) AS r_stop,
               CAST(n_words >= 5 AND n_words <= 100000
                    AND n_nospace*10 >= n_words*30
                    AND n_nospace*10 <= n_words*100
                    AND n_symbols*10 <= n_words
                    AND n_bullet*10 <= n_lines*9
                    AND n_ellipsis*10 <= n_lines*3
                    AND n_alpha_words*10 >= n_words*8
                    AND n_stop >= 2 AS INT) AS gopher_keep
        FROM m
    """.replace("{stopwords}", _STOPWORDS_SQL),
    "top_bigrams": """
        WITH toks AS (
            SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                         i -> concat_ws(' ', t[i], t[i + 1]))) AS bigram
            FROM toks WHERE len(t) >= 2
        )
        SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram ASC LIMIT 20
    """,
    "language_id": None,  # filled in below from text.LANG_PROFILES
}

# language_id oracle assembled from the same profile constants the Spark
# operator uses, so both engines score identical patterns.
_lang_scores = ", ".join(
    f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
    for lang, pat in text.LANG_PROFILES.items()
)
_langs = list(text.LANG_PROFILES) + ["zh"]
_best = "greatest(" + ", ".join(f"s_{lg}" for lg in _langs) + ")"
_pred = "CASE WHEN " + _best + " <= 0 THEN 'und' " + " ".join(
    f"WHEN s_{lg} = {_best} THEN '{lg}'" for lg in _langs
) + " END"
_SQL["ann_cosine_topk_arrow"] = _SQL["ann_cosine_topk"]
# The LSH scale path verifies candidates with the SAME exact cosine the
# all-pairs twin computes, so at the 0.9 default threshold its output is
# the exact result wherever LSH recall is 1 (~0.996/pair analytically;
# exactly 1 on the synthetic testdata, where no pair comes near 0.9 —
# asserted at lower thresholds in test_embedding_near_dup_scale_vs_exact).
_SQL["embedding_near_dup_scale"] = _SQL["embedding_near_dup"]


# media_features' FAKEIMG payload is pure arithmetic on doc_id
# (multimodal/media.py:93-127): width/height/seed are modular exprs and
# mean_luma is the mean of ((i*31+seed) % 251) over the w*h body bytes —
# all DuckDB-expressible, so the multimodal row is hash-checked rather
# than rows-only.  (With a real codec the decode is not SQL-expressible;
# this oracle is valid exactly because the driver environment exercises
# the deterministic fake.)
_SQL["media_features"] = """
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 4 AS INT) AS w,
               CAST(doc_id % 8 + 4 AS INT) AS h,
               doc_id % 2147483647 AS seed
        FROM documents
    )
    SELECT doc_id,
           'image' AS media_type,
           CAST(20 + w * h AS BIGINT) AS n_bytes,
           w AS width,
           h AS height,
           CAST(1 AS INT) AS n_channels,
           CAST(list_sum(list_transform(generate_series(0, w * h - 1),
                                        i -> (i * 31 + seed) % 251)) AS DOUBLE)
               / (w * h) AS mean_luma,
           true AS ok,
           CAST(NULL AS VARCHAR) AS error
    FROM dims
"""

# FAKEAUD twin (multimodal/media.py attach_fake_audio): samples are
# ((i*17+seed) % 256) - 128; every feature is an integer sum plus one
# final IEEE divide/sqrt, identical in both engines.
_SQL["audio_features"] = """
    WITH a AS (
        SELECT doc_id,
               CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
               CAST((doc_id % 32 + 8) * 4 AS INT) AS n_samples,
               doc_id % 2147483647 AS seed
        FROM documents
    ),
    s AS (
        SELECT doc_id, sample_rate, n_samples,
               list_transform(generate_series(0, n_samples - 1),
                              i -> ((i * 17 + seed) % 256) - 128) AS x
        FROM a
    )
    SELECT doc_id,
           'audio' AS media_type,
           sample_rate,
           n_samples,
           n_samples * 1000.0 / sample_rate AS duration_ms,
           sqrt(CAST(list_sum(list_transform(x, v -> v * v)) AS DOUBLE)
                / n_samples) AS rms,
           CAST(list_sum(list_transform(generate_series(1, n_samples - 1),
                i -> CAST(x[i] * x[i + 1] < 0 AS INT))) AS INT)
               AS zero_crossings,
           CAST(list_max(list_transform(x, v -> abs(v))) AS INT) AS peak,
           true AS ok,
           CAST(NULL AS VARCHAR) AS error
    FROM s
"""

# Nearest-neighbor 8x8 resize of the FAKEIMG payloads, then decode:
# output pixel (x, y) reads source index (y*h//8)*w + (x*w//8), whose
# byte is (idx*31+seed) % 251 — the oracle recomputes the resized
# body exactly, so the binary->binary transform is value-checked via
# the decoded features.
_SQL["media_resize"] = """
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 16 + 4 AS INT) AS w,
               CAST(doc_id % 8 + 4 AS INT) AS h,
               doc_id % 2147483647 AS seed
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63),
                   i -> (((((i // 8) * h // 8) * w + ((i % 8) * w // 8))
                         * 31 + seed) % 251)) AS body
        FROM dims
    )
    SELECT doc_id,
           'image' AS media_type,
           CAST(84 AS BIGINT) AS n_bytes,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(1 AS INT) AS n_channels,
           CAST(list_sum(body) AS DOUBLE) / 64 AS mean_luma,
           true AS ok,
           CAST(NULL AS VARCHAR) AS error
    FROM g
"""

# Frame sampling over the FAKE video payloads (attach_fake_video:
# headerless, byte j = (j*13 + seed) % 256, seed = doc_id % 997,
# length = (doc_id % 8 + 1) * 640).  The oracle rebuilds the payload
# as a HEX STRING and slices it at 2x the byte offsets — bit-exact
# parity with Spark's substring-on-binary + hex (both engines emit
# uppercase two-digit hex), so every sampled frame's bytes are
# value-hashed.  Frame indices: sequence(0, len/1024, step) inclusive
# on both engines (Spark sequence == DuckDB range with explicit stop
# + 1 below).
_SQL["video_frames"] = """
    WITH v AS (
        SELECT doc_id,
               doc_id % 997 AS seed,
               CAST((doc_id % 8 + 1) * 640 AS INT) AS n
        FROM documents
    ),
    h AS (
        SELECT doc_id, n,
               array_to_string(list_transform(generate_series(0, n - 1),
                   j -> lpad(hex((j * 13 + seed) % 256), 2, '0')), '')
                   AS payload_hex
        FROM v
    ),
    f AS (
        SELECT doc_id, payload_hex,
               unnest(range(0, n // 1024 + 1, 2)) AS frame_idx
        FROM h
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           substring(payload_hex, frame_idx * 128 + 1, 128) AS frame_hex,
           CAST(length(substring(payload_hex, frame_idx * 128 + 1, 128)) // 2
                AS BIGINT) AS n_bytes
    FROM f
"""


def _bpe_oracle_sql(n_merges: int, passes: int) -> str:
    """DuckDB recomputation of text.bpe_merges: the merge loop unrolls
    into chained CTEs — per round a pair-count aggregate, an argmax
    (count DESC, pair ASC), and ``passes`` nested plain replaces whose
    pattern/replacement come from scalar subqueries on that round's
    winner.  Plain ``replace`` is non-overlapping left-to-right in both
    engines, so the recomputation is exact by construction."""
    ctes = [
        """words AS MATERIALIZED (
        SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents)
        WHERE w <> '' AND w NOT LIKE '%|%'
        GROUP BY w
    )""",
        """w0 AS MATERIALIZED (
        SELECT '|' || array_to_string(list_transform(
                   generate_series(1, length(w)), i -> substr(w, i, 1)), '|')
               || '|</w>|' AS s, cnt
        FROM words
    )""",
    ]
    for r in range(n_merges):
        ctes.append(f"""t{r} AS MATERIALIZED (
        SELECT list_filter(string_split(s, '|'), x -> x <> '') AS t, cnt
        FROM w{r}
    )""")
        ctes.append(f"""p{r} AS MATERIALIZED (
        SELECT t, cnt, unnest(generate_series(1, len(t) - 1)) AS i FROM t{r}
    )""")
        ctes.append(f"""c{r} AS MATERIALIZED (
        SELECT t[i] AS l, t[i + 1] AS r, sum(cnt) AS c
        FROM p{r} GROUP BY 1, 2
    )""")
        ctes.append(
            f"b{r} AS MATERIALIZED (SELECT l, r, c FROM c{r} ORDER BY c DESC, l, r LIMIT 1)"
        )
        pat = f"'|' || (SELECT l FROM b{r}) || '|' || (SELECT r FROM b{r}) || '|'"
        rep = f"'|' || (SELECT l FROM b{r}) || (SELECT r FROM b{r}) || '|'"
        expr = "s"
        for _ in range(passes):
            expr = f"replace({expr}, {pat}, {rep})"
        ctes.append(f"w{r + 1} AS MATERIALIZED (SELECT {expr} AS s, cnt FROM w{r})")
    finals = "\n        UNION ALL ".join(
        f"SELECT {r} AS rank, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


_SQL["bpe_merges"] = _bpe_oracle_sql(text.BPE_MERGES, text.BPE_PASSES)

# Per-doc curation gate matrix: composed verbatim from the member
# oracles (same convention as training_corpus / corpus_report);
# paragraph_dedup left-joins because zero-paragraph docs have nothing
# to dedup and default to keep.
_SQL["curation_matrix"] = f"""
    WITH q AS ({_SQL["text_quality"]}),
    g AS ({_SQL["gopher_quality"]}),
    r AS ({_SQL["rare_token_profile"]}),
    p AS ({_SQL["paragraph_dedup"]}),
    s AS ({_SQL["substring_dedup"]}),
    e AS ({_SQL["dedup_exact"]})
    SELECT q.doc_id,
           q.quality_keep,
           g.gopher_keep,
           r.freq_keep,
           CAST(coalesce(p.para_keep, 1) AS INT) AS para_keep,
           s.substr_keep,
           CAST(1 - e.is_dup AS INT) AS exact_keep,
           CAST(q.quality_keep * g.gopher_keep * r.freq_keep
                * coalesce(p.para_keep, 1) * s.substr_keep
                * (1 - e.is_dup) AS INT) AS final_keep
    FROM q
    JOIN g USING (doc_id)
    JOIN r USING (doc_id)
    LEFT JOIN p USING (doc_id)
    JOIN s USING (doc_id)
    JOIN e USING (doc_id)
"""

_SQL["corpus_split"] = """
    SELECT doc_id,
           CASE WHEN b < 800 THEN 'train'
                WHEN b < 900 THEN 'val'
                ELSE 'test' END AS split,
           CAST(b AS BIGINT) AS bucket
    FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                   % 1000 AS b
        FROM documents
    )
"""

# training-shard assignment (splits.py:shard_corpus): shard bucket and
# intra-shard rank both from engine-portable 60-bit md5 hashes — the
# oracle recomputes assignment AND order exactly.
_SQL["shard_corpus"] = f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT)
                   % {splits.N_SHARDS} AS shard,
               CAST(('0x' || substr(md5('order|' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) AS okey
        FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id)
                - 1 AS BIGINT) AS pos
    FROM keyed
"""

# per-label embedding QA profile (similarity.py:embedding_stats):
# integer counts + min/max of the engine-identical sequential-fold
# norm — deliberately no mean/sum of doubles (accumulation order).
_SQL["embedding_stats"] = """
    WITH rows0 AS (
        SELECT label,
               len(embedding) AS dim,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS raw_nrm,
               CASE WHEN embedding IS NULL THEN 1
                    WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
                    THEN 1
                    WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                         x -> isnan(x) OR isinf(x))) > 0
                    THEN 1 ELSE 0 END AS is_bad
        FROM embeddings
    ),
    -- degenerate norms are nulled behind the SAME predicate the Spark
    -- side uses: the engines disagree on a NULL-component norm (fold
    -- propagation vs list_sum NULL-skip), so it must reach min/max on
    -- neither
    rows AS (
        SELECT label, dim,
               CASE WHEN is_bad = 1 THEN NULL ELSE raw_nrm END AS nrm,
               is_bad
        FROM rows0
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(dim) AS BIGINT) AS min_dim,
           CAST(max(dim) AS BIGINT) AS max_dim,
           min(nrm) AS min_norm,
           max(nrm) AS max_norm,
           CAST(sum(greatest(is_bad,
                             CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END))
                AS BIGINT) AS n_degenerate
    FROM rows
    GROUP BY label
"""

# characteristic terms per source (text.py:top_terms_per_source):
# log-free TF-IDF-style ranking — lexicographic (tf desc, src_df asc,
# token asc), no transcendental math, so top-k membership is exact.
_SQL["top_terms_per_source"] = f"""
    WITH toks AS (
        SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents
    ),
    occ AS (SELECT source, unnest(t) AS token FROM toks),
    tf AS (SELECT source, token, count(*) AS tf FROM occ GROUP BY 1, 2),
    sdf AS (SELECT token, count(*) AS src_df FROM tf GROUP BY token),
    ranked AS (
        SELECT tf.source, tf.token, tf.tf, sdf.src_df,
               row_number() OVER (PARTITION BY tf.source
                                  ORDER BY tf.tf DESC, sdf.src_df ASC,
                                           tf.token ASC) AS rank
        FROM tf JOIN sdf USING (token)
    )
    SELECT source, token, CAST(tf AS BIGINT) AS tf,
           CAST(src_df AS BIGINT) AS src_df, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {text.TOP_TERMS_K}
"""

# corpus snapshot diff (snapshot.py:corpus_snapshot_diff): two
# deterministic snapshot views of documents full-outer-joined on
# 32-byte digests — added/removed/changed/unchanged drift audit.
_SQL["corpus_snapshot_diff"] = """
    WITH old AS (
        -- 'X|' || text mirrors Spark's NULL-propagating concat (DuckDB
        -- concat() would SKIP the NULL); reverse() is avoided on both
        -- engines (code-unit vs grapheme reversal diverges on non-ASCII)
        SELECT doc_id,
               md5(CASE WHEN doc_id % 89 = 0 THEN 'X|' || text
                        ELSE text END) AS old_md5
        FROM documents WHERE doc_id % 97 != 3
    ),
    new AS (
        SELECT doc_id, md5(text) AS new_md5
        FROM documents WHERE doc_id % 93 != 5
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.old_md5 IS DISTINCT FROM n.new_md5 THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_md5, n.new_md5
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""

# concat-and-cut sequence packing (text.py:pack_sequences /
# pack_chunks): the oracle recomputes the global token cumsum with a
# plain window — the Spark side's two-phase distributed cumsum must be
# value-identical to it.  Parameterized on a doc filter so the
# training_corpus composition below reuses the exact same packing SQL.


def _pack_sql(doc_where: str = "") -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents {doc_where}
    ),
    chunks AS (
        SELECT doc_id,
               CAST((s - 1) / {text.CHUNK_TOKENS - text.CHUNK_OVERLAP} AS BIGINT)
                   AS chunk_id,
               least({text.CHUNK_TOKENS}, len(t) - s + 1) AS n_tokens
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t),
                            {text.CHUNK_TOKENS - text.CHUNK_OVERLAP})) AS s
              FROM toks)
    ),
    cum AS (
        SELECT doc_id, chunk_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS token_end
        FROM chunks
    )
    SELECT doc_id, chunk_id,
           token_end - n_tokens AS token_start,
           n_tokens,
           (token_end - n_tokens) // {text.PACK_BUDGET} AS bin_id,
           CAST((token_end - 1) // {text.PACK_BUDGET}
                != (token_end - n_tokens) // {text.PACK_BUDGET} AS INT)
               AS straddles
    FROM cum
"""


_SQL["pack_sequences"] = _pack_sql()

# benchmark decontamination (text.py:decontaminate): docs sharing a
# 5-word shingle with the doc_id%97==0 pseudo-benchmark set.
_SQL["decontaminate"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - {text.DECONTAM_SHINGLE - 1}, 1)),
                   i -> array_to_string(t[i:i + {text.DECONTAM_SHINGLE} - 1], ' '))))
                   AS shingle
        FROM toks
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {text.DECONTAM_MOD} = 0)
    SELECT s.doc_id, count(*) AS n_shared_shingles
    FROM sh s JOIN ev USING (shingle)
    WHERE s.doc_id % {text.DECONTAM_MOD} != 0
    GROUP BY s.doc_id
"""

# Gopher-style repetition metrics (text.py:repetition_profile): all
# integers, threshold test integer cross-multiplied — zero float
# rounding surface between the engines.
_SQL["repetition_profile"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(t) - 1, 1)),
                      i -> array_to_string(t[i:i + 1], ' '))) AS gram
        FROM toks
    ),
    c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
    p2 AS (
        SELECT doc_id, max(cnt) AS top2_cnt,
               CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   AS dup2_cnt
        FROM c2 GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                      i -> array_to_string(t[i:i + 2], ' '))) AS gram
        FROM toks
    ),
    c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram),
    p3 AS (
        SELECT doc_id, max(cnt) AS top3_cnt,
               CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
                   AS dup3_cnt
        FROM c3 GROUP BY doc_id
    ),
    n AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT n.doc_id, n_tokens, top2_cnt, dup2_cnt, top3_cnt, dup3_cnt,
           CAST(top2_cnt * 200 > {text.REP_TOP2_PCT} * n_tokens
                OR top3_cnt * 300 > {text.REP_TOP3_PCT} * n_tokens AS INT)
               AS repetitive
    FROM n JOIN p2 USING (doc_id) JOIN p3 USING (doc_id)
"""

# Deterministic language-mixture sampling (text.py:mixture_sample):
# keep decision = salted md5 bucket vs per-language per-mille rate.
_mix_case = "CASE lang_pred " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in text.MIXTURE_RATES.items()
) + f" ELSE {text.MIXTURE_RATES['und']} END"

_SQL["mixture_sample"] = f"""
    WITH scored AS (
        SELECT doc_id, {_lang_scores},
               len(regexp_extract_all(text, '{text.CJK_PATTERN}')) AS s_zh
        FROM documents
    ),
    li AS (SELECT doc_id, {_pred} AS lang_pred FROM scored),
    b AS (
        SELECT doc_id, lang_pred,
               CAST(CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INT) % 1000 AS BIGINT) AS mix_bucket
        FROM li
    )
    SELECT doc_id, lang_pred, mix_bucket
    FROM b WHERE mix_bucket < {_mix_case}
"""

# Fixed-size stratified sampling (text.py:stratified_sample): the k
# smallest salted-md5 keys per predicted language.  The Spark side's
# two-phase partition-local top-k is result-identical to this direct
# per-group ranking (transitivity of the total (sk, doc_id) order).
_SQL["stratified_sample"] = f"""
    WITH scored AS (
        SELECT doc_id, {_lang_scores},
               len(regexp_extract_all(text, '{text.CJK_PATTERN}')) AS s_zh
        FROM documents
    ),
    li AS (SELECT doc_id, {_pred} AS lang_pred FROM scored),
    keyed AS (
        SELECT doc_id, lang_pred,
               md5('strat:' || CAST(doc_id AS VARCHAR)) AS sk
        FROM li
    ),
    ranked AS (
        SELECT doc_id, lang_pred,
               row_number() OVER (PARTITION BY lang_pred
                                  ORDER BY sk, doc_id) AS rk
        FROM keyed
    )
    SELECT doc_id, lang_pred, rk FROM ranked WHERE rk <= {text.STRATIFIED_K}
"""

# End-to-end training-corpus materialization (operators/pipeline.py):
# curation − contamination − benchmark docs ∩ train split → packing.
# Composed verbatim from the member oracles above so the composition
# itself (the join/filter chain) is what this row actually checks.
_SQL["training_corpus"] = f"""
    WITH kept AS ({_SQL["curate_documents"]}),
    cont AS (SELECT doc_id FROM ({_SQL["decontaminate"]}) AS c),
    tr AS (SELECT doc_id FROM ({_SQL["corpus_split"]}) AS s
           WHERE split = 'train'),
    elig AS (
        SELECT kept.doc_id FROM kept
        JOIN tr USING (doc_id)
        WHERE kept.doc_id % {text.DECONTAM_MOD} != 0
          AND kept.doc_id NOT IN (SELECT doc_id FROM cont)
    )
    SELECT * FROM (
        {_pack_sql("WHERE doc_id IN (SELECT doc_id FROM elig)")}
    ) AS p
"""

# winnowing with the portable md5 gram hash (text.py:document_fingerprints)
_SQL["doc_fingerprints"] = """
    WITH grams AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(length(text) - 7, 1)),
                   i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 8))
                             AS BIGINT)) AS g
        FROM documents
    ),
    fps AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(g) - 3, 1)),
                   i -> list_min(g[i:i + 3]))) AS f
        FROM grams
    )
    SELECT doc_id,
           CAST(len(f) AS INT) AS n_fingerprints,
           list_min(f) AS fp_min,
           list_max(f) AS fp_max
    FROM fps
"""

# approx_sketches (checked frame): exact aggregates are recomputed by
# DuckDB; the sketch-within-bound flags are literal TRUE — the Spark
# side computes them from the live HLL/percentile sketches, so a sketch
# regression breaks the hash (relational_ext.q_approx_sketches_checked).
_SQL["approx_sketches"] = """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           round(quantile_cont(value, 0.95), 2) AS p95_exact,
           true AS approx_users_ok,
           true AS approx_p95_ok
    FROM events
    GROUP BY event_type
"""

# Golden-count oracles for the logfile-source queries: the fixture
# corpus is deterministic (seeded generator), so expected values are an
# independent no-IO replay of the generator's RNG sequence
# (testing/loggen.py:summarize_log_corpus / replay_log_corpus_records)
# — Test.java:117-152's golden-count contract expressed as literal
# VALUES.
from hadoop_logfile_inputformat_spark.operators.logparity import (  # noqa: E402
    _FIXTURE_FILES,
    _FIXTURE_SECONDS,
    _FIXTURE_SEED,
    SAMPLE_BP,
    _fixture_dir_name,
)
from hadoop_logfile_inputformat_spark.testing.loggen import (  # noqa: E402
    _STACK_TRACE,
    replay_log_corpus_records,
    summarize_log_corpus,
)

_LOG_GOLDEN = summarize_log_corpus(
    n_files=_FIXTURE_FILES, seconds_per_file=_FIXTURE_SECONDS, seed=_FIXTURE_SEED
)
_lvl_rows = ", ".join(
    f"('{lvl}', CAST({n} AS BIGINT))"
    for lvl, n in sorted(_LOG_GOLDEN.by_level.items())
    if n
)
_SQL["logfile_count_by_level"] = (
    f"SELECT * FROM (VALUES {_lvl_rows}) AS t(level, n)"
)
_eq_rows = ", ".join(
    f"('{lvl}', CAST({n} AS BIGINT), CAST({n} AS BIGINT), true)"
    for lvl, n in sorted(_LOG_GOLDEN.by_level.items())
    if n
)
_SQL["logfile_gzip_equivalence"] = (
    f"SELECT * FROM (VALUES {_eq_rows}) AS t(level, n_log, n_gz, equal)"
)
# every ERROR record embeds the SAME stack (_STACK_TRACE), so each
# (cls, method) frame appears once per ERROR record at one fixed depth:
# n_frames == n_errors, depths_seen == 1.  Frames parsed with the SAME
# regex the UDTF applies (functions/udtfs.py:_FRAME_RE).
from hadoop_logfile_inputformat_spark.functions.udtfs import _FRAME_RE  # noqa: E402

_frame_rows = ", ".join(
    f"('{m.group(1)}', '{m.group(2)}',"
    f" CAST({_LOG_GOLDEN.by_level['ERROR']} AS BIGINT), CAST(1 AS BIGINT))"
    for m in (_FRAME_RE.match(ln) for ln in _STACK_TRACE.split("\n"))
    if m
)
_SQL["logfile_stack_hotspots"] = (
    f"SELECT * FROM (VALUES {_frame_rows})"
    " AS t(cls, method, n_frames, depths_seen)"
)

# logfile_sample: the registry query's keep decision is a pure function
# of (file basename, offset) — md5-bucketed, mirrored here with
# hashlib — so the expected FORMATTED LINES are a literal-VALUES replay
# of the generator (no IO, no scanner involvement).  The fixture dir
# path is deterministic per machine (_fixture_dir_name, no generation
# forced at import).
import hashlib  # noqa: E402
import os  # noqa: E402

_sample_dir = _fixture_dir_name()
_sample_rows = []
for _name, _off, _rec in replay_log_corpus_records(
    n_files=_FIXTURE_FILES, seconds_per_file=_FIXTURE_SECONDS, seed=_FIXTURE_SEED
):
    _b = int(hashlib.md5(f"sample:{_name}@{_off}".encode()).hexdigest()[:4], 16)
    if _b % 10000 < SAMPLE_BP:
        _line = f"{os.path.join(_sample_dir, _name)}@{_off:016d}:\n\n{_rec}\n\n"
        _sample_rows.append("('" + _line.replace("'", "''") + "')")
_SQL["logfile_sample"] = (
    "SELECT * FROM (VALUES " + ",\n".join(_sample_rows) + ") AS t(value)"
    if _sample_rows
    else "SELECT CAST(NULL AS VARCHAR) AS value WHERE FALSE"
)

_SQL["language_id"] = f"""
    WITH scored AS (
        SELECT doc_id, {_lang_scores},
               len(regexp_extract_all(text, '{text.CJK_PATTERN}')) AS s_zh
        FROM documents
    )
    SELECT doc_id, {_pred} AS lang_pred, {_best} AS best_score
    FROM scored
"""

# per-(language, source) corpus data card — composed verbatim from the
# member oracles, same pattern as training_corpus
_SQL["corpus_report"] = f"""
    WITH lang AS ({_SQL["language_id"]}),
    q AS ({_SQL["text_quality"]}),
    g AS ({_SQL["gopher_quality"]}),
    tok AS ({_SQL["token_counts"]}),
    ded AS ({_SQL["dedup_exact"]})
    SELECT l.lang_pred, d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
           CAST(sum(tok.n_ws_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(q.quality_keep) AS BIGINT) AS n_quality_keep,
           CAST(sum(g.gopher_keep) AS BIGINT) AS n_gopher_keep,
           CAST(sum(1 - ded.is_dup) AS BIGINT) AS n_exact_unique
    FROM documents d
    JOIN lang l USING (doc_id)
    JOIN q USING (doc_id)
    JOIN g USING (doc_id)
    JOIN tok USING (doc_id)
    JOIN ded USING (doc_id)
    GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Correctness packs: schema-aligned relational members folded under one
# registry key each (operators/packs.py).  Every member's FULL result is
# still value-hashed against its own oracle SQL — the pack only changes
# the reporting key, never the member's physical plan (unionByName of
# independently-built DataFrames is metadata-only).
# ---------------------------------------------------------------------------

from hadoop_logfile_inputformat_spark.operators.packs import (  # noqa: E402
    Member,
    _ts,
    pack_oracle,
    pack_query,
)


#: Original key → builder for every query that rides inside a pack —
#: bench.py and the plan-quality tests keep per-member granularity.
MEMBER_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def _m(tag, builder, sql_key, **colmap):
    MEMBER_QUERIES[sql_key] = builder
    return Member(tag=tag, builder=builder, sql=_SQL[sql_key], colmap=colmap)


_PACKS: Dict[str, list] = {
    # Single-row scalar aggregates over lineitem(+part): TPC-H q6/q14/q17/q19.
    # ANN variants — identical (query_id, neighbor_id, sim, rank)
    # shape: the Arrow-kernel twin of the brute-force search and the
    # int8-scalar-quantized index path.  Folded so the registry stays
    # at the driver's 50-row budget; both remain individually timed in
    # bench and individually tested.
    "ann_variants_pack": [
        _m("arrow", similarity.cosine_topk_arrow, "ann_cosine_topk_arrow",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        _m("quant", similarity.ann_cosine_topk_quantized,
           "ann_cosine_topk_quantized",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # filtered search (neighbors restricted to one label BEFORE
        # ranking — pre-filter semantics; the label predicate pushes
        # into the parquet scan).  Index-backed twin: ann_ivf_probe's
        # member_filter over a carry-built lists table, pinned
        # equivalent in tests/test_operators.py.
        _m("filtered", similarity.ann_filtered_topk, "ann_filtered_topk",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # L2 / inner-product serving metrics (round 11): the exact
        # brute-force rankings under the other two metrics the IVF
        # index can serve (build_ivf_index(metric=)) — sim is the
        # negated squared distance for l2 (one higher-is-better
        # convention), the raw dot for ip; value-hashing them gates
        # the metric arithmetic the metric probes rank with
        _m("l2", similarity.l2_topk, "ann_l2_topk",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        _m("ip", similarity.ip_topk, "ann_ip_topk",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # PQ ADC shortlist + exact re-rank (codes are M small ints per
        # vector — the memory-floor index tier).  Portable binding pins
        # the codebook modulus (oracle hardcodes it); bench FAST_PATH
        # times the adaptive library default.
        _m("pq", similarity.ann_pq_topk_portable, "ann_pq_topk",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # l2-serving flat PQ (r16): the ADC tier's negated-squared-L2
        # scoring — the arithmetic ann_pq_probe/ann_ivfpq_probe
        # (metric="l2") rank with, value-hashed end-to-end (portable
        # half-up rounding, integer quantized components exact in
        # double on both engines)
        _m("pq_l2", similarity.ann_pq_topk_portable_l2, "ann_pq_topk_l2",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # incremental IVF: seed-frozen centroids, delta assigned to
        # them (the append_to_ivf_index math inline), delta queries
        # probing the post-append index — the append lifecycle's
        # oracle gate (table path pinned bit-equal in tests)
        _m("ivfincr", similarity.ann_ivf_incremental,
           "ann_ivf_incremental",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # delete lifecycle: victims (vec_id % 4 == 3) tombstoned out of
        # the candidate lists BEFORE ranking, centroids/queries frozen
        # — the delete_from_index semantics inline (table path pinned
        # bit-equal in tests/test_index_append.py)
        _m("ivfdel", similarity.ann_ivf_deleted, "ann_ivf_deleted",
           k1="query_id", k2="neighbor_id", v1="sim", v2="rank"),
        # SemDeDup cluster-then-prune (tau=0.5: the fixture embeddings
        # are near-random, see _SQL["semantic_dedup"]).  The oracle
        # binding pins max_cluster_size=None — exact-parity semantics;
        # the library default is the guarded SEMDEDUP_MAX_CLUSTER cap.
        _m("semdedup", lambda spark, sf_dir: similarity.semantic_dedup(
               spark, sf_dir, tau=0.5, max_cluster_size=None),
           "semantic_dedup",
           k1="vec_id", k2="centroid_id",
           v1="n_close", v2="max_mate_sim", v3="kept"),
        # per-label embedding QA profile (pre-indexing data-quality
        # gate: dimension drift / degenerate-norm / NaN detection)
        _m("embstats", similarity.embedding_stats, "embedding_stats",
           k1="label", v1="n_vecs", v2="min_dim", v3="max_dim",
           v4="min_norm", v5="max_norm", v6="n_degenerate"),
    ],
    # Multimodal surface under its original key: image decode features,
    # audio decode features, and resize-then-decode (all deterministic
    # fake codecs — see multimodal/media.py — so every member is
    # value-hashed; real Pillow/soundfile decode stays behind
    # import-tries and is unit-tested separately).
    "media_features": [
        _m("img", _media_features_query, "media_features",
           k1="doc_id", k2="media_type", k3="error", v1="n_bytes",
           v2="width", v3="height", v4="n_channels", v5="mean_luma",
           v6=("CAST(ok AS INT)", "CAST(ok AS INT)")),
        _m("audio", _audio_features_query, "audio_features",
           k1="doc_id", k2="media_type", k3="error", v1="sample_rate",
           v2="n_samples", v3="duration_ms", v4="rms",
           v5="zero_crossings", v6="peak"),
        _m("resize", _media_resize_query, "media_resize",
           k1="doc_id", k2="media_type", v1="n_bytes", v2="width",
           v3="height", v4="mean_luma",
           v5=("CAST(ok AS INT)", "CAST(ok AS INT)")),
        # video frame sampling: every sampled frame's exact bytes (as
        # hex) value-hashed — closes the one multimodal verb that had
        # no gate (fan-out explode + byte-offset slice plumbing)
        _m("video", _video_frames_query, "video_frames",
           k1="doc_id", k2="frame_hex", v1="frame_idx", v2="n_bytes"),
    ],
    "tpch_scalar_pack": [
        _m("q6", relational_ext.q6_forecast_revenue, "q6_forecast_revenue",
           v1="revenue", v2="n_items"),
        _m("q14", relational_ext.q14_promo_revenue, "q14_promo_revenue",
           v1="promo_pct", v2="n_items"),
        _m("q17", relational_ext.q17_small_quantity_revenue, "q17_small_quantity_revenue",
           v1="avg_yearly", v2="n_items"),
        _m("q19", relational_ext.q19_disjunctive_revenue, "q19_disjunctive_revenue",
           v1="revenue", v2="n_items"),
    ],
    # Grouped multi-way joins: q4 (EXISTS), q7 (two nation dims), q8
    # (market share), q12 (case buckets), q22 (anti-exists + scalar
    # subquery), part-brand rollup.
    "tpch_join_pack": [
        _m("q4", relational_ext.q4_order_priority, "q4_order_priority",
           k1="o_orderpriority", v1="n_orders"),
        _m("q7", relational_ext.q7_nation_trade, "q7_nation_trade",
           k1="supp_nation", k2="cust_nation", k3="l_year",
           v1="volume", v2="n_items"),
        _m("q8", tpch_rest.q8_market_share, "q8_market_share",
           k1="o_year", v1="mkt_share", v2="total_volume"),
        _m("q12", tpch_rest.q12_shipping_delay, "q12_shipping_delay",
           k1="ship_bucket", v1="high_line_count", v2="low_line_count"),
        _m("q22", relational_ext.q22_idle_rich_customers, "q22_idle_rich_customers",
           k1="c_mktsegment", v1="n_custs", v2="total_bal"),
        _m("part_brand", relational.q_part_brand_revenue, "part_brand_revenue",
           k1="p_brand", v1="revenue", v2="sum_qty"),
    ],
    # Subquery-threshold shapes: q10 (top returned), q11 (value share),
    # q15 (max revenue), q16 (NOT IN), q20 (nested IN chains).
    "tpch_threshold_pack": [
        _m("q10", tpch_rest.q10_returned_items, "q10_returned_items",
           k1="c_custkey", k2="c_name", k3="nation",
           v1="revenue", v2="n_items", v3="acctbal"),
        _m("q11", tpch_rest.q11_important_parts, "q11_important_parts",
           k1="p_partkey", v1="value"),
        _m("q15", tpch_rest.q15_top_supplier, "q15_top_supplier",
           k1="s_suppkey", k2="s_name", v1="total_revenue"),
        _m("q16", tpch_rest.q16_supplier_part_counts, "q16_supplier_part_counts",
           k1="p_brand", k2="p_type", k3="p_size", v1="supplier_cnt"),
        _m("q20", tpch_rest.q20_part_promotion_suppliers, "q20_part_promotion_suppliers",
           k1="s_suppkey", k2="s_name"),
    ],
    # Top-k: per-group row_number vs global total-order limit + join.
    "topk_pack": [
        _m("per_customer", relational.q_top_orders_per_customer, "top_orders_per_customer",
           k1="o_custkey", k2="o_orderkey", v1="totalprice", v2="rn"),
        _m("global", relational_ext.q_global_topk_orders, "global_topk_orders",
           k1="o_orderkey", k2="c_name", v1="totalprice"),
    ],
    # ROLLUP / CUBE / GROUPING SETS — three flavors of one operator.
    "grouping_sets_pack": [
        _m("rollup", relational.q_rollup_order_counts, "rollup_order_counts",
           k1="o_orderstatus", k2="o_orderpriority", v1="n_orders", v2="sum_price"),
        _m("cube", relational_ext.q_cube_returnflag_status, "cube_returnflag_status",
           k1="l_returnflag", k2="l_linestatus", v1="n_items", v2="sum_qty"),
        _m("gsets", relational_ext.q_grouping_sets_revenue, "grouping_sets_revenue",
           k1="l_returnflag", k2="l_linestatus", v1="n_items", v2="sum_qty"),
    ],
    # count(DISTINCT) vs pivot on the same grouping key.
    "status_matrix_pack": [
        _m("distinct", relational.q_distinct_custs_per_status, "distinct_custs_per_status",
           k1="o_orderstatus", v1="n_customers", v2="n_orders"),
        _m("pivot", relational_ext.q_pivot_status_priority, "pivot_status_priority",
           k1="o_orderstatus", v1="n_urgent", v2="n_high", v3="n_medium",
           v4="n_notspec", v5="n_low"),
    ],
    # UNION-dedup vs INTERSECT/EXCEPT chains.
    "set_ops_pack": [
        _m("union", relational.q_priority_customer_union, "priority_customer_union",
           k1="c_custkey"),
        _m("intersect_except", relational_ext.q_building_bigspender_not_rich,
           "building_bigspender_not_rich", k1="c_custkey"),
    ],
    # Join variants beyond inner: anti, semi, full outer.
    "join_variants_pack": [
        _m("anti", relational.q_customers_without_orders, "customers_without_orders",
           k1="c_custkey", k2="c_name"),
        _m("semi", relational.q_suppliers_with_shipments, "suppliers_with_shipments",
           k1="s_suppkey", k2="s_name"),
        _m("full_outer", relational_ext.q_nation_wealth_full_outer,
           "nation_wealth_full_outer",
           k1="nationkey", v1="n_rich_custs", v2="n_rich_supps"),
    ],
    # Time-series windows: cumulative sum, lag deltas, RANGE moving
    # average, spine gap-fill.
    "timeseries_pack": [
        _m("monthly_cum", relational.q_running_monthly_revenue, "running_monthly_revenue",
           k1=_ts("month"), v1="revenue", v2="cum_revenue"),
        _m("monthly_mom", relational_ext.q_monthly_revenue_mom, "monthly_revenue_mom",
           k1=_ts("month"), v1="revenue", v2="mom_delta", v3="mom_pct"),
        _m("weekly_ma7", relational_ext.q_weekly_moving_revenue, "weekly_moving_revenue",
           k1=_ts("day"), v1="revenue", v2="ma7"),
        _m("daily_gapfill", relational_ext.q_daily_revenue_gapfill, "daily_revenue_gapfill",
           k1=_ts("day"), v1="revenue", v2="n_orders"),
    ],
    # Event profiling: hourly rollup, JSON extraction, z-score outliers.
    "events_profile_pack": [
        _m("hourly", relational.q_events_hourly, "events_hourly",
           k1=_ts("hour"), k2="event_type", v1="n_events", v2="sum_value"),
        _m("json", relational.q_events_json_extract, "events_json_extract",
           k1="event_type", v1="avg_k", v2="max_k"),
        _m("outliers", relational_ext.q_event_value_outliers, "event_value_outliers",
           k1="event_id", k2="event_type", v1="value", v2="zscore"),
        _m("funnel", relational_ext.q_event_funnel, "event_funnel",
           v1="n_users", v2="n_viewed", v3="n_clicked", v4="n_purchased"),
        # mergeable-sketch rollup: weekly distinct users from daily HLL
        # partials (hll_union_agg), checked against the exact frame
        _m("distinct_rollup", relational_ext.q_distinct_rollup,
           "events_distinct_rollup",
           k1=_ts("week"), k2="event_type", v1="exact_users", v2="n_days",
           v3="merged_est_ok", v4="merge_lossless"),
        # cohort retention matrix: first-touch week x activity week
        _m("retention", relational_ext.q_user_retention_cohorts,
           "user_retention_cohorts",
           k1=_ts("cohort_week"), v1="week_offset", v2="n_active",
           v3="n_cohort", v4="retention"),
    ],
    # Rank/distribution windows: ntile deciles, RFM ntile trio,
    # percent_rank/cume_dist tail.
    "rank_suite_pack": [
        _m("deciles", relational_ext.q_acctbal_deciles, "acctbal_deciles",
           k1="decile", v1="n_custs", v2="min_bal", v3="max_bal", v4="avg_bal"),
        _m("rfm", relational_ext.q_customer_rfm, "customer_rfm",
           k1="o_custkey", v1="recency_days", v2="frequency", v3="monetary",
           v4="r_score", v5="f_score", v6="m_score"),
        _m("ovd", relational_ext.q_order_value_distribution, "order_value_distribution",
           k1="o_orderkey", v1="totalprice", v2="pct_rank", v3="cume"),
    ],
    # Exact median vs moment statistics (corr/stddev/covar).
    "distribution_stats_pack": [
        _m("median", relational.q_order_value_median, "order_value_median",
           k1="o_orderpriority", v1="median_price", v2="n_orders"),
        _m("stats", relational_ext.q_stats_by_returnflag, "stats_by_returnflag",
           k1="l_returnflag", v1="qty_price_corr", v2="qty_stddev",
           v3="qty_price_covar", v4="n_items"),
    ],
    # Training-corpus preparation over `documents`: deterministic
    # train/val/test assignment, concat-and-cut sequence packing (the
    # global token cumsum runs distributed — range shuffle + broadcast
    # offsets, no single-partition window), and shingle-overlap
    # benchmark decontamination (eval shingle set broadcast).
    "corpus_prep_pack": [
        _m("corpus_split", splits.corpus_split, "corpus_split",
           k1="doc_id", k2="split", v1="bucket"),
        # deterministic training-shard assignment + pseudo-random
        # intra-shard order (the data-loader handoff after packing)
        _m("shard", splits.shard_corpus, "shard_corpus",
           k1="doc_id", v1="shard", v2="pos"),
        # log-free TF-IDF-style characteristic terms per source
        _m("top_terms", text.top_terms_per_source, "top_terms_per_source",
           k1="source", k2="token", v1="tf", v2="src_df", v3="rank"),
        # snapshot drift audit (added/removed/changed/unchanged); both
        # digests ride in one engine-identical concat expression
        _m("snap_diff", snapshot.corpus_snapshot_diff, "corpus_snapshot_diff",
           k1="doc_id", k2="status",
           k3="concat_ws('|', coalesce(old_md5, '-'), coalesce(new_md5, '-'))"),
        _m("pack_sequences", text.pack_sequences, "pack_sequences",
           k1="doc_id", k2="chunk_id", v1="token_start", v2="n_tokens",
           v3="bin_id", v4="straddles"),
        _m("decontaminate", text.decontaminate, "decontaminate",
           k1="doc_id", v1="n_shared_shingles"),
        _m("repetition", text.repetition_profile, "repetition_profile",
           k1="doc_id", v1="n_tokens", v2="top2_cnt", v3="dup2_cnt",
           v4="top3_cnt", v5="dup3_cnt", v6="repetitive"),
        _m("mixture", text.mixture_sample, "mixture_sample",
           k1="doc_id", k2="lang_pred", v1="mix_bucket"),
        _m("stratified", text.stratified_sample, "stratified_sample",
           k1="doc_id", k2="lang_pred", v1="rk"),
        _m("training_corpus", pipeline.training_corpus, "training_corpus",
           k1="doc_id", k2="chunk_id", v1="token_start", v2="n_tokens",
           v3="bin_id", v4="straddles"),
        # corpus-refresh probe: delta docs (doc_id%4==3) deduped against
        # the standing corpus with delta-only signature computation
        _m("incremental", dedup.dedup_incremental_pairs, "dedup_incremental",
           k1="doc_a", k2="doc_b", v1="jaccard"),
        # takedown lifecycle: victims tombstoned out of the corpus
        # banding before candidates form (delete_from_dedup_index
        # semantics inline; table path pinned equal in tests)
        _m("deleted", dedup.dedup_deleted_pairs, "dedup_deleted",
           k1="doc_a", k2="doc_b", v1="jaccard"),
        # per-(language, source) data card: volumes + per-gate keep
        # counts — the summary table a corpus run publishes
        _m("report", pipeline.corpus_report, "corpus_report",
           k1="lang_pred", k2="source", v1="n_docs", v2="total_chars",
           v3="total_tokens", v4="n_quality_keep", v5="n_gopher_keep",
           v6="n_exact_unique"),
        # paragraph-level exact dedup (Dolma/RefinedWeb granularity;
        # the fixture has no blank lines, so every doc is one unique
        # paragraph here — drop behavior is unit-tested on crafted docs)
        _m("para_dedup", text.paragraph_dedup, "paragraph_dedup",
           k1="doc_id", v1="n_paras", v2="n_dup_paras", v3="para_chars",
           v4="dup_chars", v5="dup_para_ratio", v6="para_keep"),
        # exact duplicated-substring dedup (Lee et al. 2022 ExactSubstr
        # at k-token resolution); the rewrite itself is pinned by the
        # md5 of the span-removed text in k2
        _m("substr_dedup", text.substring_dedup, "substring_dedup",
           k1="doc_id", k2="dedup_md5", v1="n_tokens", v2="n_dup_spans",
           v3="n_dup_tokens", v4="dup_token_ratio", v5="n_kept_tokens",
           v6="substr_keep"),
        # per-doc curation audit: every gate's keep flag + conjunction
        _m("gate_matrix", pipeline.curation_matrix, "curation_matrix",
           k1="doc_id", k2="final_keep", v1="quality_keep",
           v2="gopher_keep", v3="freq_keep", v4="para_keep",
           v5="substr_keep", v6="exact_keep"),
        # distributed BPE merge learning on the word-frequency vocab
        # (Sennrich et al. 2016); the whole iterative loop is
        # recomputed by the oracle's unrolled CTE chain
        _m("bpe", text.bpe_merges, "bpe_merges",
           k1="left_sym", k2="right_sym", k3="merged", v1="rank",
           v2="pair_count"),
        # unigram-frequency quality profile (log-free CCNet-style filter)
        _m("rare_tokens", text.rare_token_profile, "rare_token_profile",
           k1="doc_id", v1="n_tokens", v2="n_distinct", v3="n_rare",
           v4="rare_ratio", v5="avg_capped_df", v6="freq_keep"),
        # Gopher rule filter, split over two members (16 output columns
        # vs 7 generic slots); flags ride as one bitmask expression,
        # spelled identically on both engines
        _m("gopher_m", text.gopher_quality, "gopher_quality",
           k1="doc_id", v1="n_words", v2="mean_word_len", v3="symbol_ratio",
           v4="bullet_ratio", v5="ellipsis_ratio", v6="alpha_word_ratio"),
        Member(
            tag="gopher_r",
            builder=text.gopher_quality,
            sql=_SQL["gopher_quality"],
            colmap={
                "k1": "doc_id",
                "v1": "n_stopwords",
                "v2": "r_words + 2*r_wordlen + 4*r_symbols + 8*r_bullets"
                      " + 16*r_ellipsis + 32*r_alpha + 64*r_stop",
                "v3": "gopher_keep",
            },
        ),
    ],
}


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- similarity surface ---
    # Oracle-bound keys with adaptive geometry pin the FIXTURE geometry
    # here (the *_portable contract, cf. dedup_simhash): the DuckDB SQL
    # hardcodes one geometry, so the binding must resolve to it on ANY
    # corpus size, not just coincidentally on the shipped fixtures.
    # Library defaults (bench FAST_PATH) stay adaptive.
    "ann_cosine_topk": similarity.cosine_topk,
    "ann_ivf_topk": similarity.ann_ivf_topk_portable,
    "embedding_near_dup": similarity.embedding_near_dup_pairs,
    "embedding_near_dup_scale": similarity.embedding_near_dup_scale_portable,
    # --- text-analysis surface ---
    "text_quality": text.text_quality,
    "language_id": text.language_id,
    "token_counts": text.token_counts,
    "doc_fingerprints": text.document_fingerprints_portable,
    "top_bigrams": text.top_bigrams,
    "chunk_documents": text.chunk_documents,
    "redact_pii": text.redact_pii,
    "vocab_document_frequency": text.vocab_document_frequency,
    # --- logfile-source surface (reference parity) ---
    "logfile_count_by_level": logparity.logfile_count_by_level,
    "logfile_gzip_equivalence": logparity.logfile_gzip_equivalence,
    "logfile_stack_hotspots": logparity.logfile_stack_hotspots,
    "logfile_sample": logparity.logfile_sample,
    # --- multimodal surface: rides as the media_features pack below ---
    # --- relational surface: structurally distinctive shapes stay
    # individual; schema-aligned families ride in packs below ---
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q3_shipping_priority": relational.q3_shipping_priority,
    "q5_local_supplier_volume": relational.q5_local_supplier_volume,
    "q9_profit_by_nation_year": relational_ext.q9_profit_by_nation_year,
    "q13_customer_order_distribution": relational_ext.q13_customer_order_distribution,
    "q18_large_volume_customers": relational_ext.q18_large_volume_customers,
    "q2_min_cost_supplier": tpch_rest.q2_min_cost_supplier,
    "q21_waiting_suppliers": tpch_rest.q21_waiting_suppliers,
    "events_sessionize": relational.q_events_sessionize,
    "asof_purchase_last_click": relational_ext.asof_purchase_last_click,
    "price_band_counts": relational_ext.q_price_band_counts,
    "approx_sketches": relational_ext.q_approx_sketches_checked,
    # --- correctness packs (each member fully hash-checked) ---
    **{name: pack_query(members) for name, members in _PACKS.items()},
    # --- dedup surface ---
    "dedup_exact": dedup.exact_dedup,
    "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
    "dedup_minhash_lsh": dedup.minhash_lsh_pairs_portable,
    "dedup_simhash": dedup.simhash_pairs_portable,
    "dedup_groups": dedup.near_dup_groups,
    "curate_documents": dedup.curate_documents,
    "curate_documents_scale": dedup.curate_documents_scale,
}

#: Final oracle map: individual keys take their member SQL verbatim;
#: pack keys get the generated UNION ALL projection.  Every QUERIES
#: key has an entry (50/50 value-hash-checked).
ORACLES: Dict[str, str] = {
    **{k: _SQL[k] for k in QUERIES if k in _SQL},
    **{name: pack_oracle(members) for name, members in _PACKS.items()},
}


def query_names() -> list:
    return list(QUERIES)
