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


def _lsh_drop(spark, name):
    for s in ("_buckets", "_sets", "_batches", "_tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_delete_from_minhash_index_equals_never_held(spark, tmp_path):
    """Takedown semantics on the LSH index: after delete_from_dedup_index
    the probe must equal an index that NEVER held the victims (banding
    is a per-doc property, so never-held == filtered exactly).  Pins
    re-delete idempotence, compaction folding (banding AND shingle-set
    rows reclaimed, tombstones dropped, probe unchanged) and the
    fresh-generation contract of a rebuild."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_minhash_index,
    )

    corpus, delta = _split(spark)
    base_pairs = dedup.dedup_incremental_pairs(spark, SF).collect()
    victims_ids = sorted({r.doc_a for r in base_pairs})[0::2]
    assert victims_ids, "fixture must produce index-side partners"
    victims = corpus.filter(F.col("doc_id").isin(victims_ids))
    n_victims = victims.count()
    try:
        dedup.build_minhash_index(
            spark, corpus, "t_del_lsh", n_buckets=4,
            path=str(tmp_path / "a"),
        )
        assert dedup.delete_from_dedup_index(
            spark, "t_del_lsh", ids=victims
        ) == n_victims
        assert dedup.delete_from_dedup_index(
            spark, "t_del_lsh", ids=victims
        ) == 0
        after = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_del_lsh"
            ).collect()
        }
        assert not any(a in victims_ids for a, _, _ in after)
        dedup.build_minhash_index(
            spark,
            corpus.join(victims.select("doc_id"), "doc_id", "left_anti"),
            "t_del_lsh2", n_buckets=4, path=str(tmp_path / "b"),
        )
        never_held = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_del_lsh2"
            ).collect()
        }
        assert after == never_held and after
        pre_b = spark.table("t_del_lsh_buckets").count()
        pre_s = spark.table("t_del_lsh_sets").count()
        compact_minhash_index(spark, "t_del_lsh")
        assert not spark.catalog.tableExists("t_del_lsh_tombstones")
        assert spark.table("t_del_lsh_sets").count() == pre_s - n_victims
        assert spark.table("t_del_lsh_buckets").count() < pre_b
        assert spark.table("t_del_lsh_buckets").filter(
            F.col("doc_id").isin(victims_ids)
        ).count() == 0
        post = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_del_lsh"
            ).collect()
        }
        assert post == after
        # rebuild under the same name: fresh generation, empty set
        dedup.delete_from_dedup_index(spark, "t_del_lsh", ids=victims)
        dedup.build_minhash_index(
            spark, corpus, "t_del_lsh", n_buckets=4,
            path=str(tmp_path / "c"),
        )
        assert not spark.catalog.tableExists("t_del_lsh_tombstones")
    finally:
        _lsh_drop(spark, "t_del_lsh")
        _lsh_drop(spark, "t_del_lsh2")


def test_lsh_append_of_pending_tombstoned_doc_fails_fast(spark, tmp_path):
    """Re-appending a doc_id with a pending takedown tombstone must
    fail the batch (the banding rows would be silently hidden until
    the next fold); unrelated batches still append fine with deletes
    pending."""
    import pytest

    from hadoop_logfile_inputformat_spark.streaming import (
        near_dup_stream_batch,
    )

    corpus, delta = _split(spark)
    victims = corpus.limit(2)
    try:
        dedup.build_minhash_index(
            spark, corpus, "t_del_gd", n_buckets=4, path=str(tmp_path / "i")
        )
        assert dedup.delete_from_dedup_index(
            spark, "t_del_gd", ids=victims
        ) == 2
        with pytest.raises(ValueError, match="PENDING tombstones"):
            near_dup_stream_batch(
                victims, "t_del_gd", str(tmp_path / "p"), batch_id=1
            )
        near_dup_stream_batch(
            delta, "t_del_gd", str(tmp_path / "p"), batch_id=2
        )
    finally:
        _lsh_drop(spark, "t_del_gd")


def test_delete_from_exact_index_unblocks_reingestion(spark, tmp_path):
    """Takedown on the exact-hash index: a deleted document's content
    hash must stop blocking re-ingestion (the curate_stream probe sees
    the index as if it never held the victim), the delete_filter form
    expresses delete-by-content, and compaction reclaims the rows."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_exact_index,
    )
    from hadoop_logfile_inputformat_spark.streaming import curate_stream_batch

    good = (
        "the quick brown fox jumps over the lazy dog beside the calm river"
    )
    schema = "doc_id long, text string"
    seed = spark.createDataFrame([(1, good)], schema)
    sink = str(tmp_path / "corpus")
    try:
        dedup.build_exact_index(
            spark, seed, "t_del_ex", n_buckets=2, path=str(tmp_path / "idx")
        )
        # blocked while the seed doc is live
        curate_stream_batch(
            spark.createDataFrame([(101, good)], schema),
            "t_del_ex", sink, batch_id=0,
        )
        assert {r.doc_id for r in spark.read.parquet(sink).collect()} == set()
        # delete-by-content (predicate over what the index holds)
        import hashlib

        h = hashlib.sha256(good.encode()).hexdigest()
        assert dedup.delete_from_dedup_index(
            spark, "t_del_ex", delete_filter=f"text_hash = '{h}'"
        ) == 1
        # the same content is now admissible again
        curate_stream_batch(
            spark.createDataFrame([(201, good)], schema),
            "t_del_ex", sink, batch_id=1,
        )
        assert {r.doc_id for r in spark.read.parquet(sink).collect()} == {201}
        # compaction reclaims the tombstoned row (201's re-insert stays)
        compact_exact_index(spark, "t_del_ex")
        assert not spark.catalog.tableExists("t_del_ex_tombstones")
        held = spark.table("t_del_ex_hashes").collect()
        assert {r.doc_id for r in held} == {201}
    finally:
        for s in ("_hashes", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS t_del_ex{s}")


def test_deleted_table_path_matches_inline_twin(spark, tmp_path):
    """The takedown oracle gate's equality: build the md5-family index
    over the standing corpus, delete_from_dedup_index the victim split
    (corpus docs with doc_id % 3 == 2), probe the delta — equal to the
    inline registry twin dedup_deleted_pairs, so the `deleted` member's
    DuckDB value-hash gates the tombstone exclusion of the table path."""
    corpus, delta = _split(spark)
    victims = corpus.filter(
        F.col("doc_id") % dedup.DEL_SPLIT_MOD == dedup.DEL_REM
    )
    try:
        dedup.build_minhash_index(
            spark, corpus, "t_del_tw", hash_fn="md5", n_buckets=4,
            path=str(tmp_path),
        )
        assert dedup.delete_from_dedup_index(
            spark, "t_del_tw", ids=victims
        ) == victims.count()
        table_path = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(
                spark, delta, "t_del_tw", hash_fn="md5"
            ).collect()
        }
        inline = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.dedup_deleted_pairs(spark, SF).collect()
        }
        assert table_path == inline and inline
        # and the twin differs from the no-delete incremental member
        # (the victim split removes at least one index-side partner)
        base = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.dedup_incremental_pairs(spark, SF).collect()
        }
        assert inline < base
    finally:
        _lsh_drop(spark, "t_del_tw")
