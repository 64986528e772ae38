"""Small-file compaction: parquet sinks and the bucketed LSH index."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators import dedup, maintenance


def _parquet_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]


def test_compact_parquet_dir_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "sink")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(16).write.parquet(path)
    assert len(_parquet_files(path)) >= 16
    before = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())

    n_out = maintenance.compact_parquet_dir(spark, path, target_mb=256)
    assert n_out == 1
    assert len(_parquet_files(path)) == 1
    after = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    assert after == before
    # swap artifacts must not remain
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_parquet_dir_keeps_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "psink")
    df = spark.range(1_000).select(
        F.col("id"), (F.col("id") % 3).alias("batch_id")
    )
    df.repartition(8).write.partitionBy("batch_id").parquet(path)
    before = sorted((r.id, r.batch_id) for r in spark.read.parquet(path).collect())
    maintenance.compact_parquet_dir(
        spark, path, target_mb=256, partition_by=["batch_id"]
    )
    assert sorted(
        d for d in os.listdir(path) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1", "batch_id=2"]
    after = sorted((r.id, r.batch_id) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_minhash_index_shrinks_files_same_pairs(spark, tmp_path):
    """After streaming appends inflate the index, compaction must cut
    the file count, keep the bucket spec (probe still shuffle-free on
    the corpus side), and leave probe results identical."""
    from hadoop_logfile_inputformat_spark.streaming import near_dup_stream_batch

    for t in ("t_cmp_idx_buckets", "t_cmp_idx_sets", "t_cmp_idx_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    schema = "doc_id long, text string"
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet pink brown black",
    ]
    idx_root = str(tmp_path / "idx")
    dedup.build_minhash_index(
        spark,
        spark.createDataFrame([(1, texts[0])], schema),
        "t_cmp_idx",
        n_buckets=2,
        path=idx_root,
    )
    sink = str(tmp_path / "pairs")
    # several appends -> n_buckets files each
    for b, (off, t) in enumerate([(100, texts[1]), (200, texts[2]),
                                  (300, texts[0] + " mu"), (400, texts[1] + " more")]):
        near_dup_stream_batch(
            spark.createDataFrame([(off, t)], schema),
            "t_cmp_idx",
            sink,
            batch_id=b,
        )
    probe = spark.createDataFrame([(999, texts[2] + " extra")], schema)
    try:
        before_files = len(_parquet_files(os.path.join(idx_root, "t_cmp_idx_buckets")))
        assert before_files > 2  # appends really did accrete files
        want = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(spark, probe, "t_cmp_idx").collect()
        }
        assert any(a == 200 for a, _, _ in want)  # non-vacuous probe

        maintenance.compact_minhash_index(spark, "t_cmp_idx")

        # location alternated to the __compact sibling; one file per bucket
        new_files = _parquet_files(os.path.join(idx_root, "t_cmp_idx_buckets__compact"))
        assert len(new_files) == 2
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(spark, probe, "t_cmp_idx").collect()
        }
        assert got == want
        # bucket spec survived: probe scan still bucketed under SMJ
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                dedup.incremental_near_dups(spark, probe, "t_cmp_idx")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        scans = [
            line
            for line in plan.splitlines()
            if "FileScan" in line and "t_cmp_idx_" in line
        ]
        assert scans
        for line in scans:
            assert "Bucketed: true" in line, line
    finally:
        for t in ("t_cmp_idx_buckets", "t_cmp_idx_sets", "t_cmp_idx_batches"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_exact_index_shrinks_files_same_decisions(spark, tmp_path):
    """Streaming curation appends accrete hash-index files; compaction
    must cut the file count while leaving dedup decisions identical."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_exact_index,
    )
    from hadoop_logfile_inputformat_spark.streaming import curate_stream_batch

    for t in ("t_cex_idx_hashes", "t_cex_idx_batches"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    schema = "doc_id long, text string"
    good = [
        "the quick brown fox jumps over the lazy dog beside the calm river",
        "a small boat drifted slowly into the quiet harbor before the storm",
        "many colorful parrots squawk loudly above the ancient temple ruins"
        " in the warm morning light",
    ]
    idx_root = str(tmp_path / "idx")
    dedup.build_exact_index(
        spark,
        spark.createDataFrame([(1, good[0])], schema),
        "t_cex_idx",
        n_buckets=2,
        path=idx_root,
    )
    sink = str(tmp_path / "corpus")
    for b, (off, t) in enumerate([(100, good[1]), (200, good[2])]):
        curate_stream_batch(
            spark.createDataFrame([(off, t)], schema),
            "t_cex_idx", sink, batch_id=b,
        )
    try:
        before = len(_parquet_files(os.path.join(idx_root, "t_cex_idx_hashes")))
        assert before > 2
        rows_before = {
            tuple(r) for r in spark.table("t_cex_idx_hashes").collect()
        }
        compact_exact_index(spark, "t_cex_idx")
        rows_after = {
            tuple(r) for r in spark.table("t_cex_idx_hashes").collect()
        }
        assert rows_after == rows_before
        loc = [r for r in spark.sql(
            "DESCRIBE FORMATTED t_cex_idx_hashes").collect()
            if r.col_name == "Location"][0].data_type
        after = len(_parquet_files(loc.replace("file:", "")))
        assert after < before
        # a resubmission of already-ingested content is still caught
        curate_stream_batch(
            spark.createDataFrame([(300, good[2])], schema),
            "t_cex_idx", sink, batch_id=2,
        )
        kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
        assert kept == {100, 200}
    finally:
        for t in ("t_cex_idx_hashes", "t_cex_idx_batches"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_clear_orphaned_table_is_conservative_and_db_aware(spark):
    """clear_orphaned_table must only delete directories that LOOK like
    table remnants (parquet part / _SUCCESS / _temporary staging /
    empty), must leave a same-named non-table directory alone, and must
    resolve the location under the CURRENT database's {db}.db/ prefix —
    the bare {warehouse}/{table} guess is wrong for any non-default
    database."""
    from hadoop_logfile_inputformat_spark.operators.tables import (
        clear_orphaned_table,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh_local = wh[len("file:"):] if wh.startswith("file:") else wh

    # 1. a non-table directory with the candidate name survives
    plain = os.path.join(wh_local, "t_orphan_plain")
    os.makedirs(plain, exist_ok=True)
    with open(os.path.join(plain, "notes.txt"), "w") as fh:
        fh.write("user data, not a table")
    clear_orphaned_table(spark, "t_orphan_plain")
    assert os.path.exists(os.path.join(plain, "notes.txt"))

    # 2. an orphaned table remnant (parquet part, no catalog entry) is
    # removed so the subsequent overwrite-saveAsTable can proceed
    orphan = os.path.join(wh_local, "t_orphan_tbl")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-00000.snappy.parquet"), "wb") as fh:
        fh.write(b"PAR1")
    clear_orphaned_table(spark, "t_orphan_tbl")
    assert not os.path.exists(orphan)

    # 2b. a write that crashed BEFORE committing any part file leaves
    # only a _temporary/ staging subtree — the exact orphan this helper
    # exists for; it must be removed even with zero committed files
    crashed = os.path.join(wh_local, "t_orphan_crashed")
    os.makedirs(os.path.join(crashed, "_temporary", "0", "task_x"),
                exist_ok=True)
    with open(
        os.path.join(crashed, "_temporary", "0", "task_x", "part-0.inflight"),
        "wb",
    ) as fh:
        fh.write(b"x")
    clear_orphaned_table(spark, "t_orphan_crashed")
    assert not os.path.exists(crashed)

    # 2c. an entirely empty directory cannot be user data either
    empty = os.path.join(wh_local, "t_orphan_empty")
    os.makedirs(empty, exist_ok=True)
    clear_orphaned_table(spark, "t_orphan_empty")
    assert not os.path.exists(empty)

    # 3. db-qualified name resolves under {db}.db/, not the warehouse
    # root; a same-named root dir must NOT be the victim
    spark.sql("CREATE DATABASE IF NOT EXISTS odb_orphan_test")
    try:
        dbdir = os.path.join(wh_local, "odb_orphan_test.db", "t_orphan_q")
        os.makedirs(dbdir, exist_ok=True)
        with open(os.path.join(dbdir, "_SUCCESS"), "w") as fh:
            fh.write("")
        decoy = os.path.join(wh_local, "t_orphan_q")
        os.makedirs(decoy, exist_ok=True)
        with open(os.path.join(decoy, "part-0.parquet"), "wb") as fh:
            fh.write(b"PAR1")
        clear_orphaned_table(spark, "odb_orphan_test.t_orphan_q")
        assert not os.path.exists(dbdir)
        assert os.path.exists(decoy)  # root-level decoy untouched
    finally:
        import shutil

        spark.sql("DROP DATABASE IF EXISTS odb_orphan_test CASCADE")
        shutil.rmtree(os.path.join(wh_local, "t_orphan_plain"), True)
        shutil.rmtree(os.path.join(wh_local, "t_orphan_q"), True)
        shutil.rmtree(os.path.join(wh_local, "t_orphan_crashed"), True)
        shutil.rmtree(os.path.join(wh_local, "t_orphan_empty"), True)
        shutil.rmtree(os.path.join(wh_local, "odb_orphan_test.db"), True)


def test_soak_build_skewed_produces_documented_hot_keys(spark, tmp_path):
    """tools/soak.py --skew corpus builder: the skew fractions SCALING's
    measured-skew section cites must actually hold — one customer with
    ~10% of orders, one order with ~10% of line items, ~5% of documents
    sharing the boilerplate paragraph (but NOT byte-identical), all
    other tables byte-copied."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools")
    )
    import soak

    base = "/root/testdata/sf0.001"
    out = str(tmp_path / "skew")
    soak.build_skewed(spark, base, out)
    o = spark.read.parquet(os.path.join(out, "orders.parquet"))
    n = o.count()
    top = (
        o.groupBy("o_custkey").count().orderBy(F.desc("count")).first()
    )
    assert abs(top["count"] / n - 0.1) < 0.03, (top, n)
    l = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    nl = l.count()
    topl = l.groupBy("l_orderkey").count().orderBy(F.desc("count")).first()
    assert abs(topl["count"] / nl - 0.1) < 0.03, (topl, nl)
    d = spark.read.parquet(os.path.join(out, "documents.parquet"))
    nd = d.count()
    boiler = d.filter(F.col("text").startswith(soak.BOILERPLATE))
    assert abs(boiler.count() / nd - 0.05) < 0.01
    # hot docs are near-dups, never exact dups (unique tail)
    assert boiler.select("text").distinct().count() == boiler.count()
    # hot embedding ball: ~10% of vectors inside one tight cosine
    # cluster, all DISTINCT (jittered), and — the property the SemDeDup
    # mega-cluster hazard needs — no hot id is a modulus centroid
    e = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    ne = e.count()
    hot = e.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 3)
    nh = hot.count()
    assert abs(nh / ne - 0.1) < 0.02, (nh, ne)
    assert hot.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0).count() == 0
    assert hot.select("embedding").distinct().count() == nh
    two = hot.limit(2).collect()
    a, b = two[0]["embedding"], two[1]["embedding"]
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = sum(float(x) ** 2 for x in a) ** 0.5
    nb = sum(float(x) ** 2 for x in b) ** 0.5
    assert dot / (na * nb) > 0.99, "hot ball not tight"
    # untouched tables byte-copied
    for t in ("customer", "nation", "region"):
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        assert os.path.getsize(src) == os.path.getsize(dst)
    # idempotent: marker short-circuits the rebuild
    m0 = os.path.getmtime(os.path.join(out, "orders.parquet"))
    soak.build_skewed(spark, base, out)
    assert os.path.getmtime(os.path.join(out, "orders.parquet")) == m0


def test_index_info_describes_every_family(spark, tmp_path):
    """index_info resolves the family from the catalog signature and
    reports footprint + lifecycle state without scanning payloads:
    corpus tables flagged, pending tombstones counted (and zeroed by a
    fold), applied batches and the drift verdict surfaced for the
    embedding tiers.  The limit(0) append also pins the empty-batch
    ledger row (n_vecs=0, NULL mean_sim — streams deliver empty
    micro-batches) being weight-0-skipped by ivf_index_drift instead
    of poisoning the weighted means."""
    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_ivf_index,
        index_family,
        index_info,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    try:
        dedup.build_minhash_index(
            spark, docs, "t_info_lsh", n_buckets=4, path=str(tmp_path)
        )
        info = index_info(spark, "t_info_lsh")
        assert info["family"] == "minhash_lsh"
        assert info["tables"]["t_info_lsh_buckets"]["corpus_sized"]
        assert info["tables"]["t_info_lsh_sets"]["rows"] > 0
        assert info["tables"]["t_info_lsh_sets"]["files"] >= 1
        assert info["pending_tombstones"] == 0
        assert info["applied_batches"] == 0

        S.build_ivf_index(spark, v, "t_info_ivf")
        S.append_to_ivf_index(spark, v.limit(0), "t_info_ivf", batch_id=1)
        n = S.delete_from_index(spark, "t_info_ivf", ids=v.limit(3))
        info = index_info(spark, "t_info_ivf")
        assert info["family"] == "ivf"
        assert info["pending_tombstones"] == n == 3
        assert info["applied_batches"] == 1
        assert "retrain_recommended" in info["drift"]
        compact_ivf_index(spark, "t_info_ivf")
        assert index_info(spark, "t_info_ivf")["pending_tombstones"] == 0

        import pytest as _pytest

        with _pytest.raises(ValueError, match="no persisted index"):
            index_family(spark, "t_info_nothere")
    finally:
        for s in ("_buckets", "_sets", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS t_info_lsh{s}")
        for s in ("_lists", "_centroids", "_batches", "_stats",
                  "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS t_info_ivf{s}")


def test_register_index_resurrects_catalog_entries(spark, tmp_path):
    """The restart story: an EXTERNAL index's parquet files outlive the
    session-scoped metastore; register_index must recreate the catalog
    entries FROM the files + the _spec manifest — probe results
    bit-equal, the re-declared bucket spec still carrying the
    no-index-side-shuffle property, and the full lifecycle (append,
    delete, compact) working against the re-registered index."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_ivf_index,
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    seed = v.filter(F.col("vec_id") % 4 != 3)
    delta = v.filter(F.col("vec_id") % 4 == 3)
    queries = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name, root = "t_reg_ivf", str(tmp_path / "idx")
    suffixes = ("_lists", "_centroids", "_batches", "_stats", "_tombstones")
    try:
        S.build_ivf_index(spark, seed, name, path=root)
        before = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, queries, name).collect()
        )
        # simulate a fresh session: catalog entries gone, files remain
        # (EXTERNAL tables — DROP leaves the location intact)
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        assert register_index(spark, name, root) == "ivf"
        after = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, queries, name).collect()
        )
        assert after == before and after
        # bucket spec survived re-registration: probe scan bucketed
        # under sort-merge joins
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                S.ann_ivf_probe(spark, queries, name)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        scans = [
            ln for ln in plan.splitlines()
            if "FileScan" in ln and f"{name}_lists" in ln
        ]
        assert scans and all("Bucketed: true" in ln for ln in scans)
        # the whole lifecycle works against the re-registered index:
        # append (insertInto applies the re-declared bucketing),
        # delete, compact-fold
        assert S.append_to_ivf_index(spark, delta, name, batch_id=1)
        n = S.delete_from_index(spark, name, ids=delta.limit(2))
        assert n == 2
        compact_ivf_index(spark, name)
        assert not spark.catalog.tableExists(f"{name}_tombstones")
        assert S.ann_ivf_probe(spark, queries, name).count() > 0
    finally:
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_register_index_minhash_family(spark, tmp_path):
    """register_index on the LSH triple: probe parity through a
    catalog wipe, incremental probe still bucketed-scan-backed."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    is_delta = F.col("doc_id") % dedup.INCR_SPLIT_MOD == dedup.INCR_DELTA_REM
    corpus, delta = docs.filter(~is_delta), docs.filter(is_delta)
    name, root = "t_reg_lsh", str(tmp_path / "idx")
    suffixes = ("_buckets", "_sets", "_batches", "_tombstones")
    try:
        dedup.build_minhash_index(spark, corpus, name, n_buckets=4, path=root)
        want = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(spark, delta, name).collect()
        }
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        assert register_index(spark, name, root) == "minhash_lsh"
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.incremental_near_dups(spark, delta, name).collect()
        }
        assert got == want and got
    finally:
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_register_index_follows_compaction_alternation(spark, tmp_path):
    """compact_bucketed_table alternates EXTERNAL locations between
    <dir> and <dir>__compact; register_index must resolve the live
    sibling after a compaction (and still probe identically)."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_ivf_index,
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name, root = "t_reg_alt", str(tmp_path / "idx")
    suffixes = ("_lists", "_centroids", "_batches", "_stats", "_tombstones")
    try:
        S.build_ivf_index(spark, v, name, path=root)
        compact_ivf_index(spark, name)  # lists now at _lists__compact
        assert os.path.isdir(os.path.join(root, f"{name}_lists__compact"))
        want = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, queries, name).collect()
        )
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        assert register_index(spark, name, root) == "ivf"
        got = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, queries, name).collect()
        )
        assert got == want and got
    finally:
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_register_index_exact_family_keeps_stream_decisions(spark, tmp_path):
    """register_index on the exact-hash index: after a catalog wipe
    and re-registration, curate_stream_batch still rejects
    already-ingested content (the probe anti-join reads through the
    re-declared text_hash bucketing)."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        register_index,
    )
    from hadoop_logfile_inputformat_spark.streaming import curate_stream_batch

    good = (
        "a small boat drifted slowly into the quiet harbor before the storm"
    )
    schema = "doc_id long, text string"
    name, root = "t_reg_ex", str(tmp_path / "idx")
    sink = str(tmp_path / "corpus")
    try:
        dedup.build_exact_index(
            spark, spark.createDataFrame([(1, good)], schema),
            name, n_buckets=2, path=root,
        )
        for s in ("_hashes", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        assert register_index(spark, name, root) == "exact_hash"
        curate_stream_batch(
            spark.createDataFrame([(101, good)], schema),
            name, sink, batch_id=0,
        )
        assert {r.doc_id for r in spark.read.parquet(sink).collect()} == set()
    finally:
        for s in ("_hashes", "_batches", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_register_index_ivfpq_two_bucket_specs(spark, tmp_path):
    """IVFPQ is the one family with TWO different bucket keys (codes by
    centroid_id, quantized by vec_id): registration must re-declare
    each correctly — pinned by bit-equal probes through a catalog
    wipe."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name, root = "t_reg_ivfpq", str(tmp_path / "idx")
    suffixes = ("_codes", "_quantized", "_centroids", "_codebooks",
                "_batches", "_stats", "_qstats", "_tombstones")
    try:
        S.build_ivfpq_index(spark, v, name, path=root)
        want = sorted(
            tuple(r)
            for r in S.ann_ivfpq_probe(spark, queries, name).collect()
        )
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        assert register_index(spark, name, root) == "ivfpq"
        got = sorted(
            tuple(r)
            for r in S.ann_ivfpq_probe(spark, queries, name).collect()
        )
        assert got == want and got
    finally:
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_drop_index_keep_vs_delete_files(spark, tmp_path):
    """drop_index removes every catalog entry of the family without
    suffix enumeration; with delete_files=False the external files
    stay re-attachable (register_index round-trip), with True the
    locations and the _spec manifest go too."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        drop_index,
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    name, root = "t_drop_ix", str(tmp_path / "idx")
    S.build_ivf_index(spark, v, name, path=root)
    S.delete_from_index(spark, name, ids=v.limit(1))
    dropped = drop_index(spark, name)
    assert f"{name}_lists" in dropped and f"{name}_tombstones" in dropped
    assert not any(
        t.name.startswith(name) for t in spark.catalog.listTables()
    )
    # files intact: re-attachable
    assert register_index(spark, name, root) == "ivf"
    # destructive path: catalog AND files AND manifest gone
    dropped = drop_index(spark, name, delete_files=True)
    assert f"{name}_lists" in dropped
    assert not os.path.isdir(os.path.join(root, f"{name}_lists"))
    assert not os.path.isdir(os.path.join(root, f"{name}_spec"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no persisted index"):
        drop_index(spark, name)


def test_restart_story_pending_deletes_and_respec_and_retrain(spark, tmp_path):
    """The three restart-story hazards, each pinned through a catalog
    wipe + register_index round-trip on an EXTERNAL index:

    1. PENDING tombstones survive a metastore loss (written at the
       index root) — a re-registered probe still excludes the victims;
    2. a bucket-count-changing compaction refreshes the _spec manifest,
       so re-registration declares the NEW count;
    3. a retrain rebuilds AT THE ROOT (stays external, spec'd count),
       so re-registration resurrects the live post-retrain generation
       — not a stranded pre-retrain one — with the folded deletes gone.
    """
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_ivf_index,
        register_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = v.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name, root = "t_rst", str(tmp_path / "idx")
    suffixes = ("_lists", "_centroids", "_batches", "_stats", "_tombstones")

    def _wipe_and_register():
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        return register_index(spark, name, root)

    try:
        S.build_ivf_index(spark, v, name, path=root, n_buckets=4)
        # pin victim ids BEFORE deleting (limit() without order is not
        # deterministic across invocations)
        vids = {r.vec_id for r in v.limit(3).collect()}
        victims = v.filter(F.col("vec_id").isin(list(vids)))
        assert S.delete_from_index(spark, name, ids=victims) == 3
        # (1) pending deletes live AT THE ROOT and survive the wipe
        assert os.path.isdir(os.path.join(root, f"{name}_tombstones"))
        want = _probe_rows(S, spark, queries, name)
        assert _wipe_and_register() == "ivf"
        got = _probe_rows(S, spark, queries, name)
        assert got == want and got
        assert not any(r[1] in vids for r in got)
        # (2) re-bucketing compaction (also folds the deletes) must
        # refresh the spec: re-registration declares the new count
        compact_ivf_index(spark, name, n_buckets=2)
        want = _probe_rows(S, spark, queries, name)
        assert _wipe_and_register() == "ivf"
        detail = spark.sql(f"DESCRIBE FORMATTED {name}_lists").collect()
        nb = next(r.data_type for r in detail if r.col_name == "Num Buckets")
        assert int(nb) == 2
        assert _probe_rows(S, spark, queries, name) == want
        # (3) retrain stays external at the root with the spec'd count;
        # re-registration resurrects the LIVE generation
        S.delete_from_index(spark, name, ids=v.limit(5))
        S.retrain_ivf_index(spark, name, iters=1)
        assert os.path.isdir(os.path.join(root, f"{name}_lists"))
        want = _probe_rows(S, spark, queries, name)
        assert _wipe_and_register() == "ivf"
        assert _probe_rows(S, spark, queries, name) == want and want
        assert not spark.catalog.tableExists(f"{name}_tombstones")
        detail = spark.sql(f"DESCRIBE FORMATTED {name}_lists").collect()
        nb = next(r.data_type for r in detail if r.col_name == "Num Buckets")
        assert int(nb) == 2  # the compaction's re-bucketed count stuck
    finally:
        for s in suffixes:
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _probe_rows(S, spark, queries, name):
    return sorted(
        tuple(r) for r in S.ann_ivf_probe(spark, queries, name).collect()
    )


def test_index_info_reports_lease_state(spark, tmp_path):
    """r12: index_info surfaces the writer lease — None when unleased,
    the owner/ttl/expired verdict when held, expired=True after the
    TTL elapses — so an operator never reads `<name>_lock` by hand."""
    import json
    import time

    from hadoop_logfile_inputformat_spark.operators import dedup
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        _hadoop_fs,
        _lease_site,
        acquire_index_lease,
        index_info,
        release_index_lease,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    name = "t_lease_info"
    try:
        dedup.build_minhash_index(spark, docs, name, n_buckets=4)
        assert index_info(spark, name)["lease"] is None
        acquire_index_lease(spark, name, ttl_s=600)
        got = index_info(spark, name)["lease"]
        assert got["owner"] == spark.sparkContext.applicationId
        assert got["ttl_s"] == 600
        assert got["expired"] is False
        assert got["held_by_this_application"] is True
        # a foreign EXPIRED lease reads as expired, not held
        site = _lease_site(spark, name)
        fs, jvm = _hadoop_fs(spark, site)
        p = jvm.org.apache.hadoop.fs.Path(site)
        fs.delete(p, False)
        out = fs.create(p, False)
        out.write(bytearray(json.dumps(
            {"owner": "app-x", "epoch": time.time() - 100, "ttl_s": 1}
        ).encode()))
        out.close()
        got = index_info(spark, name)["lease"]
        assert got["owner"] == "app-x"
        assert got["expired"] is True
        assert got["held_by_this_application"] is False
        fs.delete(p, False)
    finally:
        release_index_lease(spark, name)
        for s in ("_buckets", "_sets", "_batches"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_vacuum_index_cleans_crashed_swaps_then_register_succeeds(
    spark, tmp_path
):
    """r12: vacuum_index removes the crashed-swap leftovers
    register_index refuses on.  Fixtures built by hand to mimic each
    crash state: (a) stranded __compact_tmp/__compact_old next to a
    live base → removed, base untouched; (b) both bucketed siblings
    with no catalog arbiter → reported ambiguous, then resolved by an
    explicit prefer=, after which register_index succeeds."""
    import os
    import shutil

    from hadoop_logfile_inputformat_spark.operators import (
        maintenance as M,
        similarity as S,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "idx")
    name = "t_vac"
    try:
        S.build_ivf_index(spark, v, name, path=root, n_buckets=4)
        probe_q = v.limit(5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        before = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, probe_q, name).collect()
        )
        lists_dir = f"{root}/{name}_lists"
        # (a) compact_parquet_dir-style debris next to the live base
        shutil.copytree(lists_dir, f"{lists_dir}__compact_tmp")
        shutil.copytree(lists_dir, f"{lists_dir}__compact_old")
        rep = M.vacuum_index(spark, name)
        removed = [r.removeprefix("file:") for r in rep["removed"]]
        assert f"{lists_dir}__compact_tmp" in removed
        assert f"{lists_dir}__compact_old" in removed
        assert not os.path.exists(f"{lists_dir}__compact_tmp")
        assert os.path.exists(lists_dir)
        # live catalog + both siblings: catalog location arbitrates
        shutil.copytree(lists_dir, f"{lists_dir}__compact")
        rep = M.vacuum_index(spark, name)
        assert f"{lists_dir}__compact" in [
            r.removeprefix("file:") for r in rep["removed"]
        ]
        assert not os.path.exists(f"{lists_dir}__compact")
        # (b) the register-refusal state: drop catalog, strand BOTH
        # siblings, vacuum without prefer reports ambiguous + register
        # still refuses; prefer='base' resolves; register succeeds
        M.drop_index(spark, name)
        shutil.copytree(lists_dir, f"{lists_dir}__compact")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="crashed"):
            M.register_index(spark, name, root)
        rep = M.vacuum_index(spark, name, path=root)
        assert rep["ambiguous"], rep
        assert os.path.exists(f"{lists_dir}__compact")
        rep = M.vacuum_index(spark, name, path=root, prefer="base")
        assert f"{lists_dir}__compact" in [
            r.removeprefix("file:") for r in rep["removed"]
        ]
        assert M.register_index(spark, name, root) == "ivf"
        after = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, probe_q, name).collect()
        )
        assert after == before and after
    finally:
        for s in ("_lists", "_centroids", "_batches", "_stats",
                  "_tombstones", "_deferred"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_vacuum_index_completes_a_crashed_bucketed_swap(spark, tmp_path):
    """r12: the one data-preserving recovery — compact_bucketed_table
    crashed AFTER dropping the original table (old files gone) but
    BEFORE renaming its committed __compact_tmp table: the tmp copy is
    the only complete one, so vacuum completes the swap and the index
    serves again; with the original still live, a stranded tmp is
    debris and is dropped instead."""
    from hadoop_logfile_inputformat_spark.operators import (
        maintenance as M,
        similarity as S,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    name = "t_vacswap"
    try:
        S.build_ivf_index(spark, v, name, n_buckets=4)
        rows = spark.table(f"{name}_lists").count()
        # crash state: tmp committed, original dropped (managed table —
        # replay compact_bucketed_table's steps 1-2 by hand)
        spark.table(f"{name}_lists").write.bucketBy(
            4, "centroid_id"
        ).sortBy("centroid_id").format("parquet").saveAsTable(
            f"{name}_lists__compact_tmp"
        )
        spark.sql(f"DROP TABLE {name}_lists")
        rep = M.vacuum_index(spark, name)
        assert f"{name}_lists" in rep["completed_swaps"]
        assert spark.catalog.tableExists(f"{name}_lists")
        assert not spark.catalog.tableExists(f"{name}_lists__compact_tmp")
        assert spark.table(f"{name}_lists").count() == rows
        # debris state: original live, stranded tmp → dropped
        spark.table(f"{name}_lists").limit(1).write.saveAsTable(
            f"{name}_lists__compact_tmp"
        )
        rep = M.vacuum_index(spark, name)
        assert f"{name}_lists__compact_tmp" in rep["dropped_tables"]
        assert not spark.catalog.tableExists(f"{name}_lists__compact_tmp")
        assert spark.table(f"{name}_lists").count() == rows
    finally:
        for s in ("_lists", "_lists__compact_tmp", "_centroids",
                  "_batches", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_vacuum_respects_the_writer_lease(spark, tmp_path):
    """Vacuum is a mutation: a LIVE foreign writer's in-flight
    __compact_tmp is work-in-progress, not debris — vacuum must fail
    fast under an unexpired foreign lease and proceed once it
    expires."""
    import json
    import time

    import pytest as _pytest

    from hadoop_logfile_inputformat_spark.operators import (
        maintenance as M,
        similarity as S,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    name = "t_vaclease"
    try:
        S.build_ivf_index(spark, v, name, n_buckets=4)
        site = M._lease_site(spark, name)
        fs, jvm = M._hadoop_fs(spark, site)
        p = jvm.org.apache.hadoop.fs.Path(site)
        out = fs.create(p, True)
        out.write(bytearray(json.dumps(
            {"owner": "app-live-writer", "epoch": time.time(),
             "ttl_s": 600}
        ).encode()))
        out.close()
        with _pytest.raises(M.IndexLeaseHeld):
            M.vacuum_index(spark, name)
        # expired: the crashed-writer case vacuum exists for
        out = fs.create(p, True)
        out.write(bytearray(json.dumps(
            {"owner": "app-live-writer", "epoch": time.time() - 100,
             "ttl_s": 1}
        ).encode()))
        out.close()
        rep = M.vacuum_index(spark, name)
        assert rep["ambiguous"] == []
        fs.delete(p, False)
        # a writer that crashed mid-REFRESH strands <name>_lock.tmp;
        # vacuum (running leaseless) removes it
        tmp = jvm.org.apache.hadoop.fs.Path(f"{site}.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(b"{half"))
        out.close()
        rep = M.vacuum_index(spark, name)
        assert f"{site}.tmp" in rep["removed"]
        assert not fs.exists(tmp)
    finally:
        for s in ("_lists", "_centroids", "_batches", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_vacuum_holds_the_lease_and_cleans_steal_debris(spark, tmp_path):
    """r13 ADVICE fix: vacuum ACQUIRES the writer lease for its
    duration (was check-only — a concurrent leased verb now fails
    fast instead of interleaving with vacuum's renames), releases it
    on exit unless this application already owned it, and removes a
    crashed stealer's `<lock>.steal.<app>` claim debris."""
    from hadoop_logfile_inputformat_spark.operators import (
        maintenance as M,
        similarity as S,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    name = "t_vaclease13"
    try:
        S.build_ivf_index(spark, v, name, n_buckets=4)
        site = M._lease_site(spark, name)
        fs, jvm = M._hadoop_fs(spark, site)
        P = jvm.org.apache.hadoop.fs.Path
        out = fs.create(P(f"{site}.steal.app-crashed-stealer"), True)
        out.write(bytearray(b"{}"))
        out.close()
        rep = M.vacuum_index(spark, name)
        assert any(
            x.endswith(".steal.app-crashed-stealer")
            for x in rep["removed"]
        )
        assert not fs.exists(P(f"{site}.steal.app-crashed-stealer"))
        # vacuum took + released the lease: none remains afterwards
        assert M._read_lease(spark, site) is None
        # ... unless the application owned it BEFORE: then it survives
        M.acquire_index_lease(spark, name)
        M.vacuum_index(spark, name)
        lease = M._read_lease(spark, site)
        assert (
            lease is not None
            and lease["owner"] == spark.sparkContext.applicationId
        )
    finally:
        M.release_index_lease(spark, name)
        for s in ("_lists", "_centroids", "_batches", "_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def test_force_drop_table_clears_orphaned_location(spark):
    """The r14 as-found pytest red, pinned at the product level: an
    interrupted writer strands a managed table's DIRECTORY without its
    catalog entry; DROP TABLE IF EXISTS is then a no-op and the next
    managed CREATE fails with "location already exists".
    force_drop_table must clear both the registered and the orphaned
    state, and be a safe no-op when neither exists."""
    name = "t_fdrop"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, name)

    # orphaned state: directory exists, catalog entry does not
    maintenance.force_drop_table(spark, name)  # no-op from clean
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "part-orphan.parquet"), "wb") as f:
        f.write(b"debris")
    assert not spark.catalog.tableExists(name)
    maintenance.force_drop_table(spark, name)
    assert not os.path.exists(loc)

    # the next managed CREATE must succeed
    spark.createDataFrame([(1,)], "a long").write.saveAsTable(name)
    assert spark.table(name).count() == 1

    # registered state: drops catalog entry AND files
    maintenance.force_drop_table(spark, name)
    assert not spark.catalog.tableExists(name)
    assert not os.path.exists(loc)

    # safety: a same-named directory that was never a table (no part
    # files / _SUCCESS / _temporary, not empty) is LEFT ALONE — the
    # next CREATE fails loudly instead of the verb eating user data
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "not-a-table.txt"), "w") as f:
        f.write("user data")
    maintenance.force_drop_table(spark, name)
    assert os.path.exists(os.path.join(loc, "not-a-table.txt"))
    shutil.rmtree(loc)


def test_vacuum_reports_orphaned_managed_locations(spark):
    """vacuum_index REPORTS (never deletes) a managed-table directory
    of the index's own suffixes that lost its catalog entry — the
    debris that blocks the next managed CREATE.  Exact suffixes only:
    a sibling index's same-prefix dir must not appear."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    name = "t_vac_orph"
    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    sfx = ("_lists", "_centroids", "_batches", "_stats")
    try:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")
        S.build_ivf_index(spark, v, name, n_buckets=4)
        rep = maintenance.vacuum_index(spark, name)
        assert rep["orphaned_locations"] == [], rep
        # strand _stats: drop the catalog entry but leave the dir (the
        # interrupted-writer state), then vacuum must name it — and
        # leave it on disk
        loc = os.path.join(wh, f"{name}_stats")
        os.makedirs(loc + ".save", exist_ok=True)
        for f in os.listdir(loc):
            shutil.copy(os.path.join(loc, f), os.path.join(loc + ".save", f))
        spark.sql(f"DROP TABLE {name}_stats")
        shutil.rmtree(loc, ignore_errors=True)
        os.rename(loc + ".save", loc)
        rep = maintenance.vacuum_index(spark, name)
        assert [x for x in rep["orphaned_locations"]
                if x.rstrip("/").endswith(f"{name}_stats")], rep
        assert os.path.exists(loc), "vacuum must not delete the orphan"
        # a sibling index's same-prefix dir is not this index's orphan
        assert all(f"{name}_stats" in x or not x for x in
                   rep["orphaned_locations"])
    finally:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")


def test_drop_index_delete_files_clears_orphaned_family_slots(spark):
    """drop_index(delete_files=True) declares destruction intent for
    the whole index, so an ORPHANED family slot (table dir whose
    catalog entry a crash lost) goes too — otherwise the next build's
    CREATE fails on the stranded location.  The default keeps it."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    name = "t_dropi_orph"
    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    sfx = ("_lists", "_centroids", "_batches", "_stats")
    try:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")
        S.build_ivf_index(spark, v, name, n_buckets=4)
        # orphan _stats: drop its entry, keep its dir
        loc = os.path.join(wh, f"{name}_stats")
        shutil.copytree(loc, loc + ".save")
        spark.sql(f"DROP TABLE {name}_stats")
        shutil.rmtree(loc, ignore_errors=True)
        os.rename(loc + ".save", loc)
        dropped = maintenance.drop_index(spark, name, delete_files=True)
        assert f"{name}_lists" in dropped and f"{name}_stats" not in dropped
        assert not os.path.exists(loc), "orphan slot must be cleared"
        # and the next build succeeds from a clean slate
        S.build_ivf_index(spark, v, name, n_buckets=4)
        assert spark.table(f"{name}_stats").count() >= 1
    finally:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")


def test_managed_table_location_resolves_current_db(spark):
    """The shared resolver (r15 ADVICE: vacuum's orphan scan built the
    bare {warehouse}/{table} guess, missing real orphans under a
    non-default db's {db}.db/ prefix)."""
    from hadoop_logfile_inputformat_spark.operators.tables import (
        managed_table_location,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
    assert managed_table_location(spark, "t_mtl_x") == f"{wh}/t_mtl_x"
    assert (
        managed_table_location(spark, "otherdb.t_mtl_x")
        == f"{wh}/otherdb.db/t_mtl_x"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS t_mtl_db")
    spark.catalog.setCurrentDatabase("t_mtl_db")
    try:
        assert (
            managed_table_location(spark, "t_mtl_x")
            == f"{wh}/t_mtl_db.db/t_mtl_x"
        )
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE IF EXISTS t_mtl_db CASCADE")


def test_vacuum_orphan_scan_is_db_aware(spark):
    """vacuum_index's orphan scan must resolve the managed location
    under the CURRENT database (r15 ADVICE): an index living in a
    non-default db keeps its table dirs under {db}.db/ — the bare
    warehouse-root guess would miss a real stranded suffix there."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    name = "t_vacdb"
    v = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    sfx = ("_lists", "_centroids", "_batches", "_stats")
    spark.sql("CREATE DATABASE IF NOT EXISTS t_vac_db")
    spark.catalog.setCurrentDatabase("t_vac_db")
    try:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")
        S.build_ivf_index(spark, v, name, n_buckets=4)
        rep = maintenance.vacuum_index(spark, name)
        assert rep["orphaned_locations"] == [], rep
        # strand _stats under the db's .db/ prefix: drop the catalog
        # entry, leave the directory
        loc = os.path.join(wh, "t_vac_db.db", f"{name}_stats")
        assert os.path.isdir(loc), loc
        os.makedirs(loc + ".save", exist_ok=True)
        for f in os.listdir(loc):
            shutil.copy(os.path.join(loc, f), os.path.join(loc + ".save", f))
        spark.sql(f"DROP TABLE {name}_stats")
        shutil.rmtree(loc, ignore_errors=True)
        os.rename(loc + ".save", loc)
        rep = maintenance.vacuum_index(spark, name)
        assert [x for x in rep["orphaned_locations"]
                if x.rstrip("/").endswith(f"t_vac_db.db/{name}_stats")], rep
        assert os.path.exists(loc), "vacuum must not delete the orphan"
    finally:
        for s in sfx:
            maintenance.force_drop_table(spark, f"{name}{s}")
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE IF EXISTS t_vac_db CASCADE")
