"""Physical-plan audit over the bench headline queries.

Prints one line per query with the plan properties that decide 100 TB
behavior — exchange count, broadcast vs shuffle joins, parquet filter
pushdown, whole-stage-codegen span count, and red flags (cartesian
products, unpartitioned data-sized windows, row-at-a-time Python) —
plus a JSON summary.  Complements tests/test_plan_quality.py (which
*gates* these properties for representative queries) by showing the
full picture on demand:

    python tools/plan_report.py [sf_dir] [query ...]

Caveat: plans are read pre-execution, so under AQE the codegen span
count usually reads 0 (AdaptiveSparkPlan annotates codegen only in the
final plan); exchange/join/pushdown fields are accurate.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_logfile_inputformat_spark.plans.registry import (  # noqa: E402
    MEMBER_QUERIES,
    QUERIES,
)
from hadoop_logfile_inputformat_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

#: The bench headline set (imported, so it cannot drift from bench.py)
#: plus the registry-bound member keys worth auditing that bench times
#: only as extras.  Any registry/member key can be passed explicitly.
_AUDIT_EXTRAS = [
    "user_retention_cohorts", "shard_corpus", "top_terms_per_source",
    "embedding_stats", "corpus_snapshot_diff",
]
DEFAULT = [
    k for k in bench.HEADLINE if k != "ann_cosine_topk_arrow"
] + _AUDIT_EXTRAS
# ann_cosine_topk_arrow is excluded: its fetch runs eagerly inside the
# query function (toLocalIterator guard), so a plan-only audit would
# execute the query rather than read a plan.


def audit(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "shuffle_joins": plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        # red flags
        "cartesian": "CartesianProduct" in plan,
        "row_python_udf": "BatchEvalPython" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark(app_name="plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    for name in names:
        fn = QUERIES.get(name) or MEMBER_QUERIES.get(name)
        if fn is None:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        rows[name] = a
        flags = "".join(
            f" !{k}" for k in ("cartesian", "row_python_udf") if a[k]
        )
        print(
            f"{name:32s} exch={a['exchanges']:2d} "
            f"(1part={a['single_partition_exchanges']}) "
            f"bcast={a['broadcast_joins']} shuf={a['shuffle_joins']} "
            f"codegen={a['codegen_spans']} "
            f"pushdown={'y' if a['pushed_filters'] else '-'}{flags}"
        )
    n_flagged = sum(1 for a in rows.values() if a["cartesian"] or a["row_python_udf"])
    print(json.dumps({"queries": len(rows), "red_flagged": n_flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
