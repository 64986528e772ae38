"""Crash-point sweep of the STREAMING batch protocols (r14, the r13
verdict's ask — test_crash_sweep.py covers compact/swap/lease/retrain;
this module enumerates the foreachBatch pipelines' own mutation
boundaries: the matches/audit sink overwrites, the index append's
bucketed inserts, the drift-ledger and replay-log rows, the tombstone
append, and the in-stream compaction handoff).

The recovery verb under test is the one Structured Streaming actually
provides: REPLAY.  foreachBatch is at-least-once — after a crash the
restarted query re-delivers the same (batch_df, batch_id) — so every
sweep kills the batch protocol after its N-th mutation and then calls
the same batch function again with the same batch_id, asserting the
replayed state is EXACTLY the never-crashed run's state: matches
partitions rewritten not duplicated, the index appended exactly once
(the ``<name>_batches`` replay guard), tombstones/deferred sets exact,
victims never probe-visible, the audit trail covering exactly the
requested ids.  Never data loss, never a double-apply.

Injection model is test_crash_sweep's counting injector with the
``insertInto`` seam added (the streaming verbs mutate through bucketed
inserts); granularity is the same boundary-state semantics — a kill
INSIDE one mutation is Spark's staged-commit territory.
"""

import pytest
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators import maintenance as M
from hadoop_logfile_inputformat_spark.operators import similarity as S
from hadoop_logfile_inputformat_spark.operators.tables import load
from hadoop_logfile_inputformat_spark.streaming import pipelines as P

from test_crash_sweep import _Injector, _run_patched

SF = "/root/testdata/sf0.001"

SFX = ("_lists", "_centroids", "_batches", "_stats", "_tombstones",
       "_deferred", "_codes", "_quantized", "_codebooks", "_qstats",
       "_lists__compact_tmp")


def _drop_all(spark, name, sfx=SFX):
    # force_drop_table, not DROP TABLE IF EXISTS: an interrupted prior
    # run strands managed-table DIRECTORIES without catalog entries,
    # which a plain drop cannot clear and which fail the next CREATE
    # with "location already exists" — the r14 as-found pytest red.
    # Setup must tolerate the same debris the sweeps inject.
    for s in sfx:
        M.force_drop_table(spark, f"{name}{s}")


def _assert_intent_boundaries_enumerated(log):
    """The intent protocol's OWN boundaries must be in the sweep's
    enumeration (r15, the r14 verdict's ask for the text-stream verbs):
    the counting injector's log must show the marker CREATE before the
    first bucketed insert (so some k kills between marker create and
    first insert), the replay-log insertInto as the LAST insert (so
    some k kills between the last data insert and the log row), and
    the marker DELETE after it (so some k kills between the log row
    and the marker delete).  The injector routes the marker's
    filesystem ops through the same seam as the data mutations
    (``maintenance._hadoop_fs``), so these are counted kill points,
    not just observed ones."""
    creates = [i for i, d in enumerate(log) if d == "fs.create"]
    deletes = [i for i, d in enumerate(log) if d == "fs.delete"]
    inserts = [i for i, d in enumerate(log) if d.startswith("insertInto")]
    assert creates and deletes and inserts, log
    assert creates[0] < inserts[0], ("marker create must precede the "
                                     "first insert", log)
    assert "_batches" in log[inserts[-1]], ("the replay-log row must be "
                                            "the last insert", log)
    assert inserts[-1] < deletes[-1], ("marker delete must follow the "
                                       "log row", log)


def _lists_ids(spark, name):
    spark.catalog.refreshTable(f"{name}_lists")
    return sorted(
        r["vec_id"]
        for r in spark.table(f"{name}_lists").select("vec_id").collect()
    )


def _table_ids(spark, name, suffix, col="vec_id"):
    t = f"{name}{suffix}"
    if not spark.catalog.tableExists(t):
        return []
    spark.catalog.refreshTable(t)
    return sorted(r[col] for r in spark.table(t).select(col).collect())


def _matches(spark, sink, batch_id):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in spark.read.parquet(f"{sink}/batch_id={batch_id}").collect()
    )


# ------------------------------------------------------------------ #
# embedding_index_stream_batch: matches-sink overwrite, list append,  #
# drift-ledger row, replay-log row — replay must land exactly once    #
# ------------------------------------------------------------------ #

def test_crash_sweep_embedding_index_stream_batch(spark, tmp_path):
    """Kill the ingest-stream batch protocol after every mutation;
    replaying the SAME batch (what a restarted stream does) must
    reproduce the never-crashed state exactly: identical match set
    (the replay ranks against exactly the pre-batch corpus via
    exclude_ids even when its append already landed), the index
    appended once (never doubled), one replay-log row."""
    name = "t_sweep_ingest"
    v = load(spark, SF, "embeddings").select("vec_id", "embedding")
    seed = v.filter(F.col("vec_id") % 2 == 0)
    batch = v.filter(F.col("vec_id") % 2 == 1).limit(20)
    batch = batch.localCheckpoint(eager=True)

    def setup():
        _drop_all(spark, name)
        S.build_ivf_index(spark, seed, name, n_buckets=4)

    def run():
        P.embedding_index_stream_batch(
            batch, name, str(tmp_path / "m"), batch_id=1, k=2, nprobe=2
        )

    # golden pass: the never-crashed state
    setup()
    run()
    want_matches = _matches(spark, str(tmp_path / "m"), 1)
    want_lists = _lists_ids(spark, name)
    assert want_matches, "golden batch produced no matches"
    assert _table_ids(spark, name, "_batches", "batch_id") == [1]

    # count pass
    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 3, counter.log
    total = counter.count
    _assert_intent_boundaries_enumerated(counter.log)

    for k in range(1, total + 1):
        setup()
        inj = _Injector(k)
        crashed = _run_patched(inj, run, insert_into=True)
        assert crashed, (k, inj.log)
        # REPLAY: the restarted stream re-delivers the same batch
        run()
        assert _matches(spark, str(tmp_path / "m"), 1) == want_matches, (
            k, inj.log)
        assert _lists_ids(spark, name) == want_lists, (
            k, "append must land exactly once", inj.log)
        assert _table_ids(spark, name, "_batches", "batch_id") == [1], (
            k, "replay log must hold the batch exactly once")
    _drop_all(spark, name)


# ------------------------------------------------------------------- #
# ingest batch + in-stream compaction handoff: kill anywhere across    #
# the append -> fold boundary; vacuum + replay must heal               #
# ------------------------------------------------------------------- #

def test_crash_sweep_ingest_with_inline_compaction(spark, tmp_path):
    """The handoff the mixed-lifecycle soak exercises at volume, swept
    at every boundary: one stream batch whose cadence triggers the
    in-stream fold (``_maybe_compact`` with every=1).  After any kill:
    vacuum_index reports no ambiguity, re-register if the swap lost
    the catalog entry, replay the batch — membership and replay log
    must equal the never-crashed run's, and the index must serve."""
    name = "t_sweep_ingestc"
    root = f"{tmp_path}/ingestc"
    v = load(spark, SF, "embeddings").select("vec_id", "embedding")
    seed = v.filter(F.col("vec_id") % 2 == 0)
    batch = v.filter(F.col("vec_id") % 2 == 1).limit(20)
    batch = batch.localCheckpoint(eager=True)

    def setup():
        _drop_all(spark, name)
        fs, jvm = M._hadoop_fs(spark, root)
        fs.delete(jvm.org.apache.hadoop.fs.Path(root), True)
        S.build_ivf_index(spark, seed, name, n_buckets=4, path=root)

    def run():
        P.embedding_index_stream_batch(
            batch, name, str(tmp_path / "mc"), batch_id=1, k=2, nprobe=2
        )
        P._maybe_compact(spark, name, 1, 1, M.compact_ivf_index)

    setup()
    run()
    want_lists = _lists_ids(spark, name)
    want_matches = _matches(spark, str(tmp_path / "mc"), 1)

    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 6, counter.log
    total = counter.count

    q = seed.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    try:
        for k in range(1, total + 1):
            setup()
            inj = _Injector(k)
            crashed = _run_patched(inj, run, insert_into=True)
            assert crashed, (k, inj.log)
            rep = M.vacuum_index(spark, name, path=root)
            assert rep["ambiguous"] == [], (k, rep, inj.log)
            if not spark.catalog.tableExists(f"{name}_lists"):
                M.register_index(spark, name, root)
            run()  # replay
            assert _lists_ids(spark, name) == want_lists, (k, inj.log)
            assert _matches(spark, str(tmp_path / "mc"), 1) == (
                want_matches), (k, inj.log)
            assert _table_ids(spark, name, "_batches", "batch_id") == [1], k
            got = S.ann_ivf_probe(spark, q, name, k=2).count()
            assert got == 6, (k, got)
    finally:
        _drop_all(spark, name)


# ------------------------------------------------------------------- #
# near_dup_stream_batch (text LSH): pairs-sink overwrite, buckets/sets #
# appends, replay-log row — no duplicate banding/shingle rows ever     #
# ------------------------------------------------------------------- #

def test_crash_sweep_near_dup_stream_batch(spark, tmp_path):
    """Kill the LSH ingest batch after every mutation and replay.  The
    r13 docstring called duplicate shingle-set rows in this window
    'only arising there' — with the shared intent protocol they can no
    longer arise at all: buckets/sets/pairs/log all land exactly
    once."""
    from hadoop_logfile_inputformat_spark.operators import dedup

    name = "t_sweep_lsh"
    base = ("the quick brown fox jumps over the lazy dog beside the"
            " river today")
    alt = ("many colorful parrots squawk loudly above the ancient"
           " temple ruins at dawn")
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, base)], schema)
    batch = spark.createDataFrame(
        [(101, base + " extra"), (102, alt)], schema
    ).localCheckpoint(eager=True)
    sink = str(tmp_path / "pairs")

    def drop_all():
        _drop_all(spark, name, ("_buckets", "_sets", "_batches",
                                "_tombstones", "_deferred"))

    def setup():
        drop_all()
        dedup.build_minhash_index(spark, corpus, name, n_buckets=2)

    def run():
        P.near_dup_stream_batch(batch, name, sink, batch_id=1)

    def state():
        spark.catalog.refreshTable(f"{name}_buckets")
        spark.catalog.refreshTable(f"{name}_sets")
        return (
            sorted((r["doc_a"], r["doc_b"]) for r in
                   spark.read.parquet(f"{sink}/batch_id=1").collect()),
            sorted(map(tuple, spark.table(f"{name}_buckets")
                       .select("doc_id", "band", "bucket").collect())),
            sorted(r["doc_id"] for r in spark.table(f"{name}_sets")
                   .select("doc_id").collect()),
            _table_ids(spark, name, "_batches", "batch_id"),
        )

    setup()
    run()
    want = state()
    assert (1, 101) in want[0] and want[3] == [1]

    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 4, counter.log
    total = counter.count
    _assert_intent_boundaries_enumerated(counter.log)

    try:
        for k in range(1, total + 1):
            setup()
            inj = _Injector(k)
            crashed = _run_patched(inj, run, insert_into=True)
            assert crashed, (k, inj.log)
            run()  # replay
            assert state() == want, (k, inj.log)
    finally:
        drop_all()


# ------------------------------------------------------------------- #
# curate_stream_batch (exact-hash): corpus-sink overwrite, hash-row    #
# append, replay-log row — survivors and hashes exactly once           #
# ------------------------------------------------------------------- #

def test_crash_sweep_curate_stream_batch(spark, tmp_path):
    """Kill the curation batch after every mutation and replay: the
    corpus partition holds exactly the gated+deduped survivors, the
    hash index holds this batch's hashes once (batch_id-tagged rows
    make the resume probe a pruned filter), the log holds the batch
    once."""
    from hadoop_logfile_inputformat_spark.operators import dedup

    name = "t_sweep_cur"
    good = ("the quick brown fox jumps over the lazy dog beside the"
            " calm river")
    good2 = ("many colorful parrots squawk loudly above the ancient"
             " temple ruins in the warm morning light")
    junk = "1234 5678 9012 3456 7890"
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, good)], schema)
    batch = spark.createDataFrame(
        [(201, good2), (202, good), (203, junk)], schema
    ).localCheckpoint(eager=True)
    sink = str(tmp_path / "corpus")

    def drop_all():
        _drop_all(spark, name, ("_hashes", "_batches", "_tombstones",
                                "_deferred"))

    def setup():
        drop_all()
        dedup.build_exact_index(spark, corpus, name, n_buckets=2)

    def run():
        P.curate_stream_batch(batch, name, sink, batch_id=4)

    def state():
        spark.catalog.refreshTable(f"{name}_hashes")
        return (
            sorted(r["doc_id"] for r in spark.read.parquet(
                f"{sink}/batch_id=4").collect()),
            sorted(map(tuple, spark.table(f"{name}_hashes")
                       .select("doc_id", "batch_id").collect())),
            _table_ids(spark, name, "_batches", "batch_id"),
        )

    setup()
    run()
    want = state()
    # 201 survives; 202 is a cross-batch dup of the corpus doc; 203
    # fails the quality gate
    assert want[0] == [201] and want[2] == [4], want

    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 3, counter.log
    total = counter.count
    _assert_intent_boundaries_enumerated(counter.log)

    try:
        for k in range(1, total + 1):
            setup()
            inj = _Injector(k)
            crashed = _run_patched(inj, run, insert_into=True)
            assert crashed, (k, inj.log)
            run()  # replay
            assert state() == want, (k, inj.log)
    finally:
        drop_all()


# ------------------------------------------------------------------- #
# takedown_stream_batch: tombstone append, deferred intent, audit      #
# overwrite — victims never probe-visible, trail exactly-once          #
# ------------------------------------------------------------------- #

def test_crash_sweep_takedown_stream_batch(spark, tmp_path):
    """Kill the takedown batch protocol after every mutation, then
    replay (re-deletes are idempotent by the delete verbs' contract).
    Invariants at every kill point, post-replay: the tombstone set is
    exactly the member victims (no dupes, no loss), never-ingested
    victims sit in the deferred set, the audit partition covers
    exactly the requested ids with a valid disposition, and no victim
    is probe-visible."""
    name = "t_sweep_td"
    v = load(spark, SF, "embeddings").select("vec_id", "embedding")
    member_victims = [r["vec_id"] for r in
                      v.select("vec_id").orderBy("vec_id").limit(8)
                      .collect()]
    unseen_victims = [1_000_001, 1_000_002]
    victims = member_victims + unseen_victims
    req = spark.createDataFrame(
        [(i,) for i in victims], "vec_id BIGINT"
    ).localCheckpoint(eager=True)
    audit = str(tmp_path / "audit")

    def setup():
        _drop_all(spark, name)
        S.build_ivf_index(spark, v, name, n_buckets=4)

    def run():
        P.takedown_stream_batch(
            req, name, batch_id=7, compact_at=None, audit_sink=audit
        )

    setup()
    run()
    assert _table_ids(spark, name, "_tombstones") == sorted(member_victims)
    assert _table_ids(spark, name, "_deferred") == sorted(unseen_victims)

    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 2, counter.log
    total = counter.count

    try:
        for k in range(1, total + 1):
            setup()
            inj = _Injector(k)
            crashed = _run_patched(inj, run, insert_into=True)
            assert crashed, (k, inj.log)
            run()  # replay: idempotent re-delete + audit rewrite
            assert _table_ids(spark, name, "_tombstones") == sorted(
                member_victims), (k, inj.log)
            assert _table_ids(spark, name, "_deferred") == sorted(
                unseen_victims), (k, inj.log)
            rows = spark.read.parquet(f"{audit}/batch_id=7").collect()
            assert sorted(r["id"] for r in rows) == sorted(victims), (
                k, "audit must cover exactly the requested ids")
            # a replay's dispositions legitimately differ from the
            # original's (already_deleted / deferred), but every one
            # must be a valid verdict — and deferred ids audit deferred
            disp = {r["id"]: r["disposition"] for r in rows}
            assert set(disp.values()) <= {
                "tombstoned", "already_deleted", "deferred"
            }, (k, disp)
            for i in unseen_victims:
                assert disp[i] == "deferred", (k, disp)
            # victims never probe-visible once the batch landed
            q = v.filter(F.col("vec_id").isin(member_victims)).limit(
                3
            ).select(F.col("vec_id").alias("query_id"), "embedding")
            seen = {
                r["neighbor_id"]
                for r in S.ann_ivf_probe(spark, q, name, k=5).collect()
            }
            assert not (seen & set(victims)), (k, seen & set(victims))
    finally:
        _drop_all(spark, name)


# ------------------------------------------------------------------- #
# takedown fold crossing: pending set past compact_at — kill anywhere  #
# across tombstone append -> fold; vacuum + replay must reclaim        #
# ------------------------------------------------------------------- #

def test_crash_sweep_takedown_fold_crossing(spark, tmp_path):
    """The batch that CROSSES the compact_at threshold folds the
    pending set into a physical reclaim (bucketed-table swap) inline.
    Kill at every boundary across that composition; recovery is
    vacuum + re-register + replay, after which membership must be
    exactly seed − victims with the pending set drained (fold done) or
    exactly the victims (fold still pending — the next batch folds),
    and never anything else."""
    name = "t_sweep_tdf"
    root = f"{tmp_path}/tdf"
    v = load(spark, SF, "embeddings").select("vec_id", "embedding")
    all_ids = sorted(r["vec_id"] for r in v.select("vec_id").collect())
    victims = all_ids[:6]
    req = spark.createDataFrame(
        [(i,) for i in victims], "vec_id BIGINT"
    ).localCheckpoint(eager=True)
    survivors = sorted(set(all_ids) - set(victims))

    def setup():
        _drop_all(spark, name)
        fs, jvm = M._hadoop_fs(spark, root)
        fs.delete(jvm.org.apache.hadoop.fs.Path(root), True)
        S.build_ivf_index(spark, v, name, n_buckets=4, path=root)

    def run():
        # compact_at=1: this batch's own tombstones cross the
        # threshold, so the fold runs inside the same batch
        P.takedown_stream_batch(req, name, batch_id=3, compact_at=1)

    setup()
    run()
    assert _lists_ids(spark, name) == survivors
    assert _table_ids(spark, name, "_tombstones") == []

    setup()
    counter = _Injector(0)
    crashed = _run_patched(counter, run, insert_into=True)
    assert not crashed and counter.count >= 5, counter.log
    total = counter.count

    q = v.filter(~F.col("vec_id").isin(victims)).limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    try:
        for k in range(1, total + 1):
            setup()
            inj = _Injector(k)
            crashed = _run_patched(inj, run, insert_into=True)
            assert crashed, (k, inj.log)
            rep = M.vacuum_index(spark, name, path=root)
            assert rep["ambiguous"] == [], (k, rep, inj.log)
            if not spark.catalog.tableExists(f"{name}_lists"):
                M.register_index(spark, name, root)
            run()  # replay
            lists = _lists_ids(spark, name)
            pend = _table_ids(spark, name, "_tombstones")
            if pend:
                # fold didn't complete this cycle: victims pending,
                # probe-invisible, membership physically intact
                assert pend == sorted(victims), (k, pend)
                assert lists == all_ids, (k, "no partial reclaim")
            else:
                assert lists == survivors, (k, inj.log)
            # either way: victims never probe-visible
            seen = {
                r["neighbor_id"]
                for r in S.ann_ivf_probe(spark, q, name, k=5).collect()
            }
            assert not (seen & set(victims)), (k, seen & set(victims))
    finally:
        _drop_all(spark, name)
