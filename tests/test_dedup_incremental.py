"""Incremental deduplication against a persisted LSH index.

The corpus-refresh shape: the standing corpus is shingled/signed once
(``build_minhash_index`` → bucketed tables), each delta batch computes
signatures only for itself and probes the index.  Tests cover result
parity with the inline twin, the cross-side-only contract, and the
no-shuffle property of the corpus side of the probe joins.
"""

import pytest
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators import dedup
from hadoop_logfile_inputformat_spark.operators.tables import load

SF = "/root/testdata/sf0.001"


def _split(spark):
    docs = load(spark, SF, "documents")
    is_delta = F.col("doc_id") % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM
    return docs.filter(~is_delta), docs.filter(is_delta)


def test_incremental_pairs_are_cross_side_only(spark):
    rows = dedup.dedup_incremental_pairs(spark, SF).collect()
    assert rows, "the test corpus must produce at least one cross pair"
    for r in rows:
        assert r.doc_a % dedup.INCR_SPLIT_MOD != dedup.INCR_DELTA_REM
        assert r.doc_b % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM


def test_incremental_equals_full_lsh_restricted(spark):
    """Signing corpus and delta separately must find exactly the pairs
    the full-corpus portable LSH run finds between the two sides (a
    signature is a per-doc property, so banding is split-invariant)."""
    full = dedup.minhash_lsh_pairs(spark, SF, hash_fn="md5").collect()
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in full
        if (r.doc_a % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM)
        != (r.doc_b % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM)
    }
    # full-run pairs are doc_a < doc_b; incremental is (corpus, delta) —
    # orient both as (corpus_doc, delta_doc)
    want = {
        (a, b, j) if b % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM
        else (b, a, j)
        for a, b, j in want
    }
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_incremental_pairs(spark, SF).collect()
    }
    assert got == want


def test_include_delta_pairs_adds_exactly_intra_delta(spark, tmp_path):
    """With the flag, the probe ALSO reports delta-internal pairs —
    and exactly the ones the full-corpus LSH finds with both ends in
    the delta."""
    corpus, delta = _split(spark)
    dedup.build_minhash_index(
        spark, corpus, "t_incr_flag", n_buckets=4, path=str(tmp_path)
    )
    try:
        base = {
            (r.doc_a, r.doc_b)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_incr_flag"
            ).collect()
        }
        both = {
            (r.doc_a, r.doc_b)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_incr_flag", include_delta_pairs=True
            ).collect()
        }
        is_delta = lambda d: d % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM
        extra = both - base
        assert all(is_delta(a) and is_delta(b) and a < b for a, b in extra)
        full = dedup.minhash_lsh_pairs(spark, SF).collect()
        want_intra = {
            (r.doc_a, r.doc_b)
            for r in full
            if is_delta(r.doc_a) and is_delta(r.doc_b)
        }
        assert extra == want_intra
    finally:
        spark.sql("DROP TABLE IF EXISTS t_incr_flag_buckets")
        spark.sql("DROP TABLE IF EXISTS t_incr_flag_sets")
        spark.sql("DROP TABLE IF EXISTS t_incr_flag_batches")


def test_index_probe_equals_inline(spark, tmp_path):
    """Round-trip through the bucketed on-disk index: identical pairs to
    the inline (no-materialization) computation, for the default
    xxhash64 family."""
    corpus, delta = _split(spark)
    dedup.build_minhash_index(
        spark, corpus, "t_incr_idx", n_buckets=4, path=str(tmp_path)
    )
    try:
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_incr_idx"
            ).collect()
        }
        inline = dedup._incremental_pairs_from_sets(
            corpus_sets=dedup._shingle_sets(corpus),
            delta_sets=dedup._shingle_sets(delta),
            corpus_buckets=dedup._band_buckets(
                dedup._signatures_from_sets(
                    dedup._shingle_sets(corpus), "xxhash64"
                ),
                "xxhash64",
            ),
            threshold=dedup.JACCARD_THRESHOLD,
            hash_fn="xxhash64",
        )
        want = {(r.doc_a, r.doc_b, r.jaccard) for r in inline.collect()}
        assert got == want
        assert got  # non-vacuous
    finally:
        spark.sql("DROP TABLE IF EXISTS t_incr_idx_buckets")
        spark.sql("DROP TABLE IF EXISTS t_incr_idx_sets")


def test_index_corpus_side_reads_without_exchange(spark, tmp_path):
    """The reason the index is BUCKETED tables: at 100 TB the corpus
    side of the probe join must not shuffle.  Assert the candidate
    join's plan has no Exchange between the index-table scan and the
    join (only the delta side is exchanged)."""
    corpus, delta = _split(spark)
    dedup.build_minhash_index(
        spark, corpus, "t_incr_plan", n_buckets=4, path=str(tmp_path)
    )
    # At test scale the tiny delta side broadcasts, and a broadcast-hash
    # join never consumes bucketing (the planner then rightly disables
    # the bucketed scan).  Force the 100 TB shape — sort-merge joins —
    # to assert the property that matters there.
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = dedup.incremental_near_dups(spark, delta, "t_incr_plan")
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        scans = [
            line
            for line in plan.splitlines()
            if "FileScan" in line and "t_incr_plan_" in line
        ]
        assert scans, plan
        for line in scans:
            assert "Bucketed: true" in line, line
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS t_incr_plan_buckets")
        spark.sql("DROP TABLE IF EXISTS t_incr_plan_sets")
