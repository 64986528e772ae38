"""Cold-start anatomy: decompose bench.py's cold-vs-steady gap.

BENCH rounds show cold_total ~1.8x steady_total.  This tool measures
where a fresh process actually spends that time, so SCALING.md can
carry numbers instead of hypotheses:

  session   SparkSession build (JVM launch + conf + logfile-source
            registration)
  jvm_job   first JVM-only job (spark.range.count — scheduler/codegen
            warm-up, no Python workers)
  py_job    first Python-worker job (tiny logfile read — Python
            DataSource worker spawn + Arrow lane init)
  footers   one metadata pass over every sf table (parquet footer
            reads: count(*) resolves from row-group stats)
  q_cold    first real query after all of the above
  q_steady  min of 3 warm re-runs of the same query

Run it twice per variant: ``--no-warmup`` skips the jvm/py/footer
stages so q_cold absorbs them — the difference is exactly what
warm-up buys, and the remaining q_cold - q_steady delta is the
irreducible per-plan cost (JIT of the generated code + shuffle-file
cache population).

Usage:
    python tools/coldstart.py [--sf /root/testdata/sf0.1] [--no-warmup]
                              [--query q9_profit_by_nation_year]

Prints one JSON line; single-process by design (cold numbers are only
meaningful in a fresh process — run the script per variant).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--query", default="q9_profit_by_nation_year")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--worker-reuse", default=None, choices=["true", "false"])
    args = ap.parse_args()

    out = {"detail": "coldstart", "warmup": not args.no_warmup}
    t0 = time.monotonic()
    if args.worker_reuse is not None:
        # must be set before the JVM starts to take effect
        os.environ["SPARK_SUBMIT_OPTS"] = (
            os.environ.get("SPARK_SUBMIT_OPTS", "")
            + f" -Dspark.python.worker.reuse={args.worker_reuse}"
        )
        out["worker_reuse"] = args.worker_reuse

    from hadoop_logfile_inputformat_spark.session import get_spark

    spark = get_spark(app_name="coldstart")
    out["session"] = round(time.monotonic() - t0, 2)

    if not args.no_warmup:
        t = time.monotonic()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        out["jvm_job"] = round(time.monotonic() - t, 2)

        t = time.monotonic()
        import tempfile

        tiny = os.path.join(tempfile.gettempdir(), "coldstart_tiny.log")
        if not os.path.exists(tiny):
            with open(tiny, "w") as fh:
                fh.write("2024-01-01 00:00:00,000 | INFO | x | y\n")
        pat = r"^\d{4}-\d{2}-\d{2}\s\d{2}:\d{2}:\d{2},\d{3}\s\|\s.*"
        spark.read.format("logfile").option("pattern", pat).load(tiny).count()
        out["py_job"] = round(time.monotonic() - t, 2)
        # second identical job isolates the reusable-worker benefit
        # (spark.python.worker.reuse): delta = spawn + import cost
        t = time.monotonic()
        spark.read.format("logfile").option("pattern", pat).load(tiny).count()
        out["py_job2"] = round(time.monotonic() - t, 2)

        t = time.monotonic()
        for tbl in TABLES:
            p = os.path.join(args.sf, f"{tbl}.parquet")
            if os.path.exists(p):
                spark.read.parquet(p).count()  # row-group stats only
        out["footers"] = round(time.monotonic() - t, 2)

    from hadoop_logfile_inputformat_spark.plans.registry import (
        MEMBER_QUERIES,
        QUERIES,
    )

    fn = QUERIES.get(args.query) or MEMBER_QUERIES[args.query]
    t = time.monotonic()
    n = len(fn(spark, args.sf).collect())
    out["q_cold"] = round(time.monotonic() - t, 2)
    best = None
    for _ in range(3):
        t = time.monotonic()
        fn(spark, args.sf).collect()
        dt = time.monotonic() - t
        best = dt if best is None else min(best, dt)
    out["q_steady"] = round(best, 2)
    out["query"] = args.query
    out["rows"] = n
    timing_keys = ("session", "jvm_job", "py_job", "py_job2", "footers", "q_cold")
    out["total_to_first_result"] = round(
        sum(out[k] for k in timing_keys if k in out), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
