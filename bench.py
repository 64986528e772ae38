"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <float>}

Each query is timed over a full materialization (collect) so the
measurement includes scan → shuffle → result, not just plan time.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_logfile_inputformat_spark.plans.registry import QUERIES
from hadoop_logfile_inputformat_spark.session import get_spark

#: Headline set: every operator family, weighted toward the shapes that
#: dominate at 100 TB (scan-agg, fact-fact join, window, dedup, ANN).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_trade",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "asof_purchase_last_click",
    "weekly_moving_revenue",
    "cube_returnflag_status",
    "price_band_counts",
    "top_orders_per_customer",
    "rollup_order_counts",
    "events_hourly",
    "events_sessionize",
    "running_monthly_revenue",
    "part_brand_revenue",
    "order_value_median",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "ann_ivf_topk",
    "text_quality",
    "language_id",
    "token_counts",
    "doc_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/session on a trivial job so query 1 isn't charged
    # for executor startup
    spark.range(1000).count()

    timings = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        # steady-state measurement: one warm-up materialization (JIT,
        # Python-worker spawn, shuffle-file cache), then min of two
        # timed runs — single-shot numbers on a shared box swing ±30%.
        len(fn(spark, sf_dir).collect())
        best, n = None, 0
        for _ in range(2):
            t0 = time.monotonic()
            n = len(fn(spark, sf_dir).collect())
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
