"""Single-writer lease enforcement (`<name>_lock`).

SCALING.md documents that two concurrent writer APPLICATIONS corrupt
the replay-log/drift-ledger/tombstone semantics; these tests pin that
the assumption is now ENFORCED: a writer acquires the lease, and every
mutation-verb class (build, append, delete, compact, retrain) run from
a different application fails fast with IndexLeaseHeld instead of
silently interleaving.  A crashed writer's lease expires by TTL.
"""

import json
import time

import pyspark.sql.functions as F
import pytest

from hadoop_logfile_inputformat_spark.operators import similarity as S
from hadoop_logfile_inputformat_spark.operators import maintenance as M

SF = "/root/testdata/sf0.001"
SUFFIXES = ("_lists", "_centroids", "_batches", "_stats",
            "_tombstones", "_deferred")


def _drop(spark, name):
    for s in SUFFIXES:
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _write_foreign_lease(spark, name, ttl_s=600, epoch=None):
    """Simulate another APPLICATION's lease by writing the lock file
    with a foreign owner (the API stamps this session's app id, so a
    genuinely foreign owner can only come from outside — or from this
    direct write)."""
    site = M._lease_site(spark, name)
    fs, jvm = M._hadoop_fs(spark, site)
    p = jvm.org.apache.hadoop.fs.Path(site)
    if fs.exists(p):
        fs.delete(p, False)
    out = fs.create(p, False)
    lease = {"owner": "app-other-writer", "ttl_s": ttl_s,
             "epoch": time.time() if epoch is None else epoch}
    out.write(bytearray(json.dumps(lease).encode("utf-8")))
    out.close()
    return site


def _clear_lease(spark, name):
    site = M._lease_site(spark, name)
    fs, jvm = M._hadoop_fs(spark, site)
    p = jvm.org.apache.hadoop.fs.Path(site)
    if fs.exists(p):
        fs.delete(p, False)


def test_every_mutation_class_fails_fast_under_foreign_lease(spark):
    """With a live foreign lease, all five mutation classes raise
    IndexLeaseHeld BEFORE touching any table; probes (reads) stay
    unaffected; once the lease EXPIRES the same verbs proceed (crashed
    writer recovery)."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    seed = v.filter(F.col("vec_id") % 4 != 3)
    delta = v.filter(F.col("vec_id") % 4 == 3)
    q = v.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    try:
        S.build_ivf_index(spark, seed, "tlk")
        rows_before = spark.table("tlk_lists").count()
        _write_foreign_lease(spark, "tlk")
        with pytest.raises(M.IndexLeaseHeld):
            S.append_to_ivf_index(spark, delta, "tlk", batch_id=1)
        with pytest.raises(M.IndexLeaseHeld):
            S.delete_from_index(spark, "tlk", ids=seed.select("vec_id").limit(1))
        with pytest.raises(M.IndexLeaseHeld):
            M.compact_ivf_index(spark, "tlk")
        with pytest.raises(M.IndexLeaseHeld):
            S.retrain_ivf_index(spark, "tlk", iters=1, n_centroids=2)
        with pytest.raises(M.IndexLeaseHeld):
            S.build_ivf_index(spark, seed, "tlk")
        # nothing landed, nothing was tombstoned, reads still serve
        assert spark.table("tlk_lists").count() == rows_before
        assert not spark.catalog.tableExists("tlk_tombstones")
        assert S.ann_ivf_probe(spark, q, "tlk").count() > 0
        # TTL elapsed → crashed-writer recovery: verbs proceed
        _write_foreign_lease(spark, "tlk", ttl_s=1, epoch=time.time() - 10)
        assert S.append_to_ivf_index(spark, delta, "tlk", batch_id=1)
    finally:
        _clear_lease(spark, "tlk")
        _drop(spark, "tlk")


def test_acquire_refresh_release_cycle(spark):
    """acquire → own mutations pass; re-acquire refreshes the epoch;
    a foreign UNEXPIRED lease refuses acquisition; release removes the
    manifest (and never steals a foreign one)."""
    v = S._vectors(spark, SF).select("vec_id", "embedding").filter(
        F.col("vec_id") % 10 == 0
    )
    victim_id = v.agg(F.min("vec_id")).collect()[0][0]
    try:
        S.build_ivf_index(spark, v, "tlk2")
        lease = M.acquire_index_lease(spark, "tlk2", ttl_s=120)
        assert lease["owner"] == spark.sparkContext.applicationId
        # own lease: mutation passes
        assert S.delete_from_index(
            spark, "tlk2",
            ids=v.filter(F.col("vec_id") == victim_id).select("vec_id"),
        ) == 1
        # refresh moves the epoch forward
        later = M.acquire_index_lease(spark, "tlk2", ttl_s=120)
        assert later["epoch"] >= lease["epoch"]
        M.release_index_lease(spark, "tlk2")
        site = M._lease_site(spark, "tlk2")
        assert M._read_lease(spark, site) is None
        # a live foreign lease refuses acquisition...
        _write_foreign_lease(spark, "tlk2")
        with pytest.raises(M.IndexLeaseHeld):
            M.acquire_index_lease(spark, "tlk2")
        # ...and release of a foreign lease is a no-op, not a steal
        M.release_index_lease(spark, "tlk2")
        assert M._read_lease(spark, site) is not None
    finally:
        _clear_lease(spark, "tlk2")
        _drop(spark, "tlk2")


def test_dedup_and_pq_families_are_guarded_too(spark):
    """The guard is family-wide: exact-hash (curate path) and IVFPQ
    verbs fail fast under a foreign lease as well."""
    from hadoop_logfile_inputformat_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog by the river")],
        "doc_id long, text string",
    )
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    try:
        D.build_exact_index(spark, docs, "tlk3", n_buckets=2)
        _write_foreign_lease(spark, "tlk3")
        with pytest.raises(M.IndexLeaseHeld):
            D.delete_from_dedup_index(
                spark, "tlk3",
                ids=spark.createDataFrame([(1,)], "doc_id long"),
            )
        with pytest.raises(M.IndexLeaseHeld):
            M.compact_exact_index(spark, "tlk3")
        S.build_ivfpq_index(spark, v, "tlk4")
        _write_foreign_lease(spark, "tlk4")
        with pytest.raises(M.IndexLeaseHeld):
            S.append_to_ivfpq_index(spark, v.limit(5), "tlk4", batch_id=9)
        with pytest.raises(M.IndexLeaseHeld):
            M.compact_ivfpq_index(spark, "tlk4")
    finally:
        _clear_lease(spark, "tlk3")
        _clear_lease(spark, "tlk4")
        for s in ("_hashes", "_batches", "_tombstones", "_deferred"):
            spark.sql(f"DROP TABLE IF EXISTS tlk3{s}")
        for s in ("_codes", "_quantized", "_centroids", "_codebooks",
                  "_batches", "_stats", "_qstats", "_tombstones",
                  "_deferred"):
            spark.sql(f"DROP TABLE IF EXISTS tlk4{s}")


def test_cross_process_second_writer_fails_fast(spark, tmp_path):
    """The real two-APPLICATION story: a separate python/Spark process
    builds an EXTERNAL index at a shared root and acquires the lease
    with a long TTL, then exits WITHOUT releasing (a crashed or
    long-running writer).  This session re-attaches the index and must
    fail fast on its first mutation — until the TTL expires."""
    import subprocess
    import sys
    import textwrap

    root = str(tmp_path / "idx")
    script = textwrap.dedent(f"""
        import sys; sys.path.insert(0, "/root/repo")
        import pyspark.sql.functions as F
        from hadoop_logfile_inputformat_spark.session import get_spark
        from hadoop_logfile_inputformat_spark.operators import similarity as S
        from hadoop_logfile_inputformat_spark.operators import maintenance as M
        spark = get_spark(app_name="writer-a", master="local[2]",
                          shuffle_partitions=2)
        v = S._vectors(spark, "{SF}").select("vec_id", "embedding")
        S.build_ivf_index(spark, v.filter(F.col("vec_id") % 4 != 3),
                          "tlkx", path="{root}", n_buckets=4)
        M.acquire_index_lease(spark, "tlkx", ttl_s=600, path="{root}")
        print("LEASED", M._read_lease(spark, "{root}/tlkx_lock")["owner"])
        spark.stop()
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300, cwd="/tmp",
    )
    assert "LEASED" in proc.stdout, proc.stderr[-2000:]
    try:
        assert M.register_index(spark, "tlkx", root) == "ivf"
        v = S._vectors(spark, SF).select("vec_id", "embedding")
        delta = v.filter(F.col("vec_id") % 4 == 3)
        # second application: first mutation fails fast
        with pytest.raises(M.IndexLeaseHeld):
            S.append_to_ivf_index(spark, delta, "tlkx", batch_id=1)
        # writer A's crash recovery: its TTL elapses → we may write
        site = f"{root}/tlkx_lock"
        lease = M._read_lease(spark, site)
        fs, jvm = M._hadoop_fs(spark, site)
        p = jvm.org.apache.hadoop.fs.Path(site)
        fs.delete(p, False)
        lease["epoch"] = time.time() - lease["ttl_s"] - 1
        out = fs.create(p, False)
        out.write(bytearray(json.dumps(lease).encode("utf-8")))
        out.close()
        assert S.append_to_ivf_index(spark, delta, "tlkx", batch_id=1)
    finally:
        _clear_lease(spark, "tlkx")
        _drop(spark, "tlkx")


def test_owner_refresh_is_rename_over_never_a_gap(spark):
    """r12 ADVICE fix: an owner's re-acquire must NOT delete-then-create
    (the old form left the lock momentarily absent, letting a racing
    check_index_lease pass mid-refresh).  The refresh path writes a
    sibling temp and atomically renames over — pin that the temp never
    lingers, the manifest content swaps, and the lock file is present
    immediately after (the rename-over mechanism, not a gap)."""
    name = "tlk_refresh"
    try:
        first = M.acquire_index_lease(spark, name, ttl_s=60)
        site = M._lease_site(spark, name)
        fs, jvm = M._hadoop_fs(spark, site)
        refreshed = M.acquire_index_lease(spark, name, ttl_s=120)
        assert refreshed["epoch"] >= first["epoch"]
        assert refreshed["ttl_s"] == 120
        # the manifest swapped in place and the temp did not linger
        on_disk = M._read_lease(spark, site)
        assert on_disk["ttl_s"] == 120
        assert not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{site}.tmp"))
    finally:
        _clear_lease(spark, name)


def test_lost_create_race_raises_lease_held_not_py4j(spark):
    """r12 ADVICE fix: losing the atomic create(overwrite=false) race
    surfaces as IndexLeaseHeld (with the winner's owner in the
    message), never a raw Py4J FileAlreadyExistsException."""
    name = "tlk_race"
    site = _write_foreign_lease(spark, name)
    try:
        with pytest.raises(M.IndexLeaseHeld, match="app-other-writer"):
            M._write_lease(
                spark, site,
                {"owner": "me", "epoch": time.time(), "ttl_s": 60},
                overwrite=False,
            )
    finally:
        _clear_lease(spark, name)


def test_torn_or_non_dict_lock_reads_as_absent(spark):
    """A torn write mid-create (invalid JSON) or a non-object payload
    reads as NO lease — check passes, acquire re-creates; but a real
    read does not silently disable the guard for valid manifests."""
    name = "tlk_torn"
    site = M._lease_site(spark, name)
    fs, jvm = M._hadoop_fs(spark, site)
    p = jvm.org.apache.hadoop.fs.Path(site)
    try:
        for payload in (b"{truncated", b"[1, 2]", b""):
            if fs.exists(p):
                fs.delete(p, False)
            out = fs.create(p, False)
            out.write(bytearray(payload))
            out.close()
            assert M._read_lease(spark, site) is None
            M.check_index_lease(spark, name)  # passes: no valid lease
        # a FRESH invalid manifest is indistinguishable from a racing
        # winner whose payload write is still in flight: acquire must
        # fail fast, NOT steal it (r12 review fix — the old heal let
        # two same-instant acquirers both win)
        with pytest.raises(M.IndexLeaseHeld, match="in flight"):
            M.acquire_index_lease(spark, name, ttl_s=60)
        # once the debris is OLD (no writer finishes a create that
        # slowly), acquire self-heals: clears it, retries the create
        import os

        local = site.removeprefix("file:")
        past = time.time() - 60
        os.utime(local, (past, past))
        lease = M.acquire_index_lease(spark, name, ttl_s=60)
        assert lease["owner"] == spark.sparkContext.applicationId
    finally:
        _clear_lease(spark, name)


def test_expired_lease_steal_is_rename_claimed(spark):
    """r13 ADVICE fix: stealing an EXPIRED lease first claims the
    stale manifest via an atomic rename to a stealer-unique name —
    exactly one concurrent stealer can win under every interleaving,
    so a loser's cleanup can never remove a winner's fresh lease (the
    r12 delete-then-create hole).  After a successful steal the claim
    debris is gone and the lock is ours."""
    name = "tlk_steal13"
    site = _write_foreign_lease(
        spark, name, ttl_s=1, epoch=time.time() - 100
    )
    try:
        lease = M.acquire_index_lease(spark, name)
        assert lease["owner"] == spark.sparkContext.applicationId
        fs, jvm = M._hadoop_fs(spark, site)
        P = jvm.org.apache.hadoop.fs.Path
        debris = fs.globStatus(P(f"{site}.steal.*"))
        assert debris is None or len(debris) == 0
        cur = M._read_lease(spark, site)
        assert cur["owner"] == spark.sparkContext.applicationId
    finally:
        M.release_index_lease(spark, name)


def test_claim_stale_lock_verifies_content(spark):
    """The rename-claim only wins when the claimed manifest is STILL
    the one the caller decided to steal; a mismatch (the owner
    refreshed between read and rename) fails the claim and puts the
    manifest back.  Absent source = lost race = False."""
    name = "tlk_claim13"
    site = _write_foreign_lease(spark, name, ttl_s=600)
    try:
        # absent source: a rival already acted
        assert not M._claim_stale_lock(spark, f"{site}.nope", None)
        # expected-lease mismatch: fails and restores the manifest
        assert not M._claim_stale_lock(
            spark, site, {"owner": "app-other-writer", "epoch": -1.0}
        )
        live = M._read_lease(spark, site)
        assert live is not None and live["owner"] == "app-other-writer"
        # torn-debris claim (expect None) on a VALID manifest: a real
        # lease landed since the caller's read — fails and restores
        assert not M._claim_stale_lock(spark, site, None)
        assert M._read_lease(spark, site)["owner"] == "app-other-writer"
        # matching expectation: the claim wins and consumes the file
        assert M._claim_stale_lock(spark, site, live)
        assert M._read_lease(spark, site) is None
    finally:
        _clear_lease(spark, name)
