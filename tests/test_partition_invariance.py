"""Partition-count invariance: answers must not depend on shuffle width.

A cluster migration changes ``spark.sql.shuffle.partitions`` (and AQE
re-plans it at runtime); any operator whose RESULT changes with the
partition count is silently nondeterministic at scale — the classic
culprits being double-sum accumulation order, ``first()`` without
ordering, and partition-local logic that leaks into the answer.  The
engine-portable design here (integer/decimal arithmetic, total
orderings, two-phase ranks) promises invariance; this suite pins it for
a representative query per family by comparing full result SETS under
two very different shuffle widths.
"""

import pytest

from hadoop_logfile_inputformat_spark.plans.registry import MEMBER_QUERIES, QUERIES

SF = "/root/testdata/sf0.001"

#: One representative per operator family that shuffles: scan-agg,
#: fact join, window/rank, distributed cumsum, dedup (hash + LSH),
#: ANN ranking, sharding, retention, snapshot diff.
CASES = [
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "top_orders_per_customer",
    "pack_sequences",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # the two delete twins: tombstone-exclusion semantics must be
    # shuffle-width-invariant like the probes they gate
    "ann_ivf_deleted",
    "dedup_deleted",
    "shard_corpus",
    "user_retention_cohorts",
    "corpus_snapshot_diff",
    "top_terms_per_source",
]


def _rows(spark, name):
    fn = QUERIES.get(name) or MEMBER_QUERIES[name]
    df = fn(spark, SF)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_is_shuffle_width_invariant(spark, name):
    conf = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf)
    # clear memoized per-query caches so the second run re-plans under
    # the new width instead of reusing frames persisted under the first
    from hadoop_logfile_inputformat_spark.operators.tables import (
        clear_query_caches,
    )

    try:
        spark.conf.set(conf, "2")
        clear_query_caches()
        narrow = _rows(spark, name)
        spark.conf.set(conf, "17")
        clear_query_caches()
        wide = _rows(spark, name)
    finally:
        spark.conf.set(conf, prior)
        clear_query_caches()
    assert narrow == wide, f"{name}: result depends on shuffle width"
    assert narrow, f"{name}: empty result makes the invariance vacuous"
