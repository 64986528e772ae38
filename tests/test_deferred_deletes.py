"""Out-of-order takedowns (delete-before-ingest) — the `_deferred` set.

A takedown stream can race ahead of the ingest stream: a delete
arrives for an id the index has never held.  Tombstoning it would
hard-fail the very append that finally delivers the id
(`_reject_tombstoned_delta`) until a compaction fold silently dropped
the intent.  The fix pinned here: `delete_from_index` /
`delete_from_dedup_index` tombstone only MEMBER ids and record
never-seen ids in `<name>_deferred`; the append verbs consume that set
— the victim rows are dropped from the arriving delta before they ever
become probe-visible, and the entry retires with them (AFTER
bookkeeping, so a crash mid-append replays with the intent intact).
"""

import pyspark.sql.functions as F
import pytest

from hadoop_logfile_inputformat_spark.operators import dedup as D
from hadoop_logfile_inputformat_spark.operators import similarity as S
from hadoop_logfile_inputformat_spark.operators import maintenance as M

SF = "/root/testdata/sf0.001"

IVF_SUFFIXES = (
    "_lists", "_centroids", "_batches", "_stats", "_tombstones", "_deferred"
)


def _drop(spark, name, suffixes=IVF_SUFFIXES):
    for s in suffixes:
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _split(spark):
    v = S._vectors(spark, SF)
    is_delta = F.col("vec_id") % S.INCR_SPLIT_MOD == S.INCR_DELTA_REM
    return (
        v.filter(~is_delta).select("vec_id", "embedding"),
        v.filter(is_delta).select("vec_id", "embedding"),
        v.filter(F.col("vec_id") % S.INCR_QUERY_MODULUS == S.INCR_DELTA_REM)
        .select(F.col("vec_id").alias("query_id"), "embedding"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_out_of_order_takedown_defers_and_append_consumes(spark):
    """Delete ids the index never ingested → nothing tombstoned (the
    verb returns 0), the intent lands in `_deferred`, and the append
    that finally delivers them neither raises nor admits the victims:
    the post-append index probes bit-equal to one that never held
    them, and the consumed deferred table is gone."""
    seed, delta, queries = _split(spark)
    victims = delta.select("vec_id").limit(4)
    try:
        S.build_ivf_index(spark, seed, "tdf_a")
        # takedown races ahead: victims are not members yet
        assert S.delete_from_index(spark, "tdf_a", ids=victims) == 0
        assert not spark.catalog.tableExists("tdf_a_tombstones")
        assert spark.catalog.tableExists("tdf_a_deferred")
        assert spark.table("tdf_a_deferred").count() == 4
        # the delivering append consumes the intent instead of raising
        assert S.append_to_ivf_index(spark, delta, "tdf_a", batch_id=1)
        assert not spark.catalog.tableExists("tdf_a_deferred")
        vic = {r["vec_id"] for r in victims.collect()}
        held = {
            r["vec_id"] for r in spark.table("tdf_a_lists").collect()
        }
        assert not (vic & held)
        # probe == an index that never held the victims
        after = _rows(S.ann_ivf_probe(spark, queries, "tdf_a"))
        cents = spark.table("tdf_a_centroids").select("centroid_id", "c_emb")
        never = delta.join(F.broadcast(victims), "vec_id", "left_anti")
        S.build_ivf_index(
            spark, seed.unionByName(never), "tdf_b", centroids=cents
        )
        assert after == _rows(S.ann_ivf_probe(spark, queries, "tdf_b"))
        assert after
    finally:
        _drop(spark, "tdf_a")
        _drop(spark, "tdf_b")


def test_mixed_delete_splits_members_from_unseen(spark):
    """One request naming both member and never-seen ids: members
    tombstone (counted), unseen defer — and a re-request of either is
    an idempotent no-op."""
    seed, delta, _ = _split(spark)
    members = seed.select("vec_id").limit(2)
    unseen = delta.select("vec_id").limit(3)
    req = members.unionByName(unseen)
    try:
        S.build_ivf_index(spark, seed, "tdf_m")
        assert S.delete_from_index(spark, "tdf_m", ids=req) == 2
        assert spark.table("tdf_m_tombstones").count() == 2
        assert spark.table("tdf_m_deferred").count() == 3
        assert S.delete_from_index(spark, "tdf_m", ids=req) == 0
        assert spark.table("tdf_m_deferred").count() == 3
        info = M.index_info(spark, "tdf_m")
        assert info["pending_tombstones"] == 2
        assert info["deferred_deletes"] == 3
    finally:
        _drop(spark, "tdf_m")


def test_deferred_survives_retrain_and_resets_on_rebuild(spark):
    """A retrain keeps the id space, so pending deferred intents must
    survive its in-place rebuild and still consume a later append; a
    user REBUILD starts a fresh generation and clears them."""
    seed, delta, _ = _split(spark)
    victims = delta.select("vec_id").limit(2)
    try:
        S.build_ivf_index(spark, seed, "tdf_r")
        S.delete_from_index(spark, "tdf_r", ids=victims)
        assert spark.table("tdf_r_deferred").count() == 2
        S.retrain_ivf_index(spark, "tdf_r", iters=1, n_centroids=2)
        assert spark.table("tdf_r_deferred").count() == 2
        S.append_to_ivf_index(spark, delta, "tdf_r", batch_id=7)
        assert not spark.catalog.tableExists("tdf_r_deferred")
        vic = {r["vec_id"] for r in victims.collect()}
        held = {r["vec_id"] for r in spark.table("tdf_r_lists").collect()}
        assert not (vic & held)
        # rebuild = fresh generation: deferred clears with the ledgers
        S.delete_from_index(spark, "tdf_r", ids=spark.range(10**9, 10**9 + 2)
                            .select(F.col("id").alias("vec_id")))
        assert spark.catalog.tableExists("tdf_r_deferred")
        S.build_ivf_index(spark, seed, "tdf_r")
        assert not spark.catalog.tableExists("tdf_r_deferred")
    finally:
        _drop(spark, "tdf_r")


def test_dedup_out_of_order_takedown_defers(spark, tmp_path):
    """Text-index twin: deleting a doc_id the exact-hash index never
    ingested defers (returns 0, no tombstone); the curate batch that
    delivers it appends every OTHER doc's hash but never the victim's,
    without raising, and the deferred entry retires."""
    from hadoop_logfile_inputformat_spark.streaming.pipelines import (
        curate_stream_batch,
    )

    good = (
        "the quick brown fox jumps over the lazy dog beside the calm river"
    )
    good2 = (
        "many colorful parrots squawk loudly above the ancient temple"
        " ruins in the warm morning light"
    )
    schema = "doc_id long, text string"
    seed = spark.createDataFrame([(1, good)], schema)
    arriving = spark.createDataFrame([(11, good2)], schema)
    sfx = ("_hashes", "_batches", "_tombstones", "_deferred")
    try:
        D.build_exact_index(spark, seed, "tdf_x", n_buckets=2)
        victim = spark.createDataFrame([(11,)], "doc_id long")
        assert D.delete_from_dedup_index(spark, "tdf_x", ids=victim) == 0
        assert not spark.catalog.tableExists("tdf_x_tombstones")
        assert spark.catalog.tableExists("tdf_x_deferred")
        curate_stream_batch(
            arriving, "tdf_x", str(tmp_path / "corpus"), batch_id=0
        )
        assert (
            spark.table("tdf_x_hashes").filter(F.col("doc_id") == 11).count()
            == 0
        )
        assert not spark.catalog.tableExists("tdf_x_deferred")
    finally:
        _drop(spark, "tdf_x", sfx)


def test_takedown_stream_audits_deferred_and_skips_count(spark, tmp_path):
    """takedown_stream_batch with a mix of member and unseen ids:
    dispositions are tombstoned / deferred respectively, and the
    running-counter `state` carries pending across calls without a
    per-batch count() (folding resets it)."""
    from hadoop_logfile_inputformat_spark.streaming.pipelines import (
        takedown_stream_batch,
    )

    seed, delta, _ = _split(spark)
    members = seed.select("vec_id").limit(2)
    unseen = delta.select("vec_id").limit(2)
    try:
        S.build_ivf_index(spark, seed, "tdf_s")
        state: dict = {"pending": None}
        sink = str(tmp_path / "audit")
        n = takedown_stream_batch(
            members.unionByName(unseen), "tdf_s", 0,
            compact_at=100, audit_sink=sink, state=state,
        )
        assert n == 2 and state["pending"] == 2
        audit = {
            r["id"]: r["disposition"]
            for r in spark.read.parquet(f"{sink}/batch_id=0").collect()
        }
        mem = {r["vec_id"] for r in members.collect()}
        uns = {r["vec_id"] for r in unseen.collect()}
        assert all(audit[i] == "tombstoned" for i in mem)
        assert all(audit[i] == "deferred" for i in uns)
        # second batch: more members, counter advances then fold resets
        more = seed.select("vec_id").limit(5).join(
            F.broadcast(members), "vec_id", "left_anti"
        )
        n2 = takedown_stream_batch(
            more, "tdf_s", 1, compact_at=4, audit_sink=sink, state=state,
        )
        assert n2 == 3
        assert state["pending"] == 0  # 2 + 3 >= 4 → folded, reset
        assert not spark.catalog.tableExists("tdf_s_tombstones")
    finally:
        _drop(spark, "tdf_s")


def test_drift_tolerates_null_mean_sim_rows(spark):
    """A non-empty append whose every c_sim is NULL (all zero-norm
    embeddings) writes n_vecs>0 with mean_sim NULL — the drift read
    must skip it, not TypeError."""
    seed, _, _ = _split(spark)
    try:
        S.build_ivf_index(spark, seed, "tdf_n")
        spark.createDataFrame(
            [(9, 5, None)], "batch_id BIGINT, n_vecs BIGINT, mean_sim DOUBLE"
        ).write.mode("append").insertInto("tdf_n_stats")
        d = S.ivf_index_drift(spark, "tdf_n")
        assert d["seed_mean_sim"] is not None
        info = M.index_info(spark, "tdf_n")
        assert "drift" in info
    finally:
        _drop(spark, "tdf_n")


def test_spec_rebuild_spares_prefix_nested_sibling(spark, tmp_path):
    """write_index_spec(clean_compact_siblings=True) for index 'idx'
    must delete only ITS OWN stale __compact siblings — not the LIVE
    `idx_v2_lists__compact` dir of a prefix-nested sibling index."""
    root = str(tmp_path)
    import os

    own_stale = os.path.join(root, "idx_lists__compact")
    sibling_live = os.path.join(root, "idx_v2_lists__compact")
    os.makedirs(own_stale)
    os.makedirs(sibling_live)
    M.write_index_spec(spark, "idx", root, "ivf", 4)
    assert not os.path.exists(own_stale)
    assert os.path.exists(sibling_live)


def test_ephemeral_table_result_has_stable_name(spark):
    """materialize='table' on an ephemeral lifecycle lands in ONE
    stable per-operator table (`<op>_result`) that the next run
    overwrites — not a fresh undiscoverable <uuid>_result per run."""
    try:
        a = S.ann_ivf_append_lifecycle(spark, SF, materialize="table")
        assert spark.catalog.tableExists("ann_ivf_append_result")
        ra = _rows(a)  # read BEFORE run 2 overwrites the stable table
        assert ra
        b = S.ann_ivf_append_lifecycle(spark, SF, materialize="table")
        assert ra == _rows(b)
        leaked = [
            t.name
            for t in spark.catalog.listTables()
            if t.name.endswith("_result")
            and t.name != "ann_ivf_append_result"
        ]
        assert not leaked
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_ivf_append_result")
