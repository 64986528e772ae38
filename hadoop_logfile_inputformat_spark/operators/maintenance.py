"""Storage maintenance: small-file compaction for sinks and indexes.

Streaming sinks and bucketed-table appends both accrete files — the
LSH index gains ``n_buckets`` files per micro-batch, a foreachBatch
pairs sink one file per task per batch.  At 100 TB scan cost is
dominated by file count long before byte count (driver listing +
footer reads + task scheduling), so periodic compaction is part of the
pipeline, not an afterthought.  Both entry points here rewrite data
without changing its logical content, and are safe to re-run.
"""

from __future__ import annotations

import json
import math
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.tables import _table_sizes


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    partition_by: list | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb`` files; returns
    the output file count.

    Swap protocol: write to ``<path>__compact_tmp``, rename the
    original to ``<path>__compact_old``, rename tmp into place, delete
    old.  Rename is atomic on local/HDFS; on object stores it is a
    copy — run compaction from a single maintenance job there (the
    same caveat every rewrite-in-place tool carries).  A crash between
    the renames leaves ``__compact_old`` next to an incomplete swap —
    both suffixed dirs are recovery artifacts, never silently read.

    ``partition_by`` preserves hive-partitioned layouts (the
    foreachBatch pairs sink's ``batch_id=N`` dirs): files compact
    WITHIN partitions, so per-batch overwrite idempotence of future
    replays is unaffected.
    """
    _, total = _table_sizes(spark, path)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp, old = f"{path}__compact_tmp", f"{path}__compact_old"
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    fs, jvm = _hadoop_fs(spark, path)
    p = jvm.org.apache.hadoop.fs.Path
    if not fs.rename(p(path), p(old)):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(p(tmp), p(path)):
        # roll back so the original stays readable
        fs.rename(p(old), p(path))
        raise IOError(f"compaction swap failed: could not move {tmp} into place")
    fs.delete(p(old), True)
    return n_out


def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    keys: list,
    n_buckets: int | None = None,
    minus=None,
) -> None:
    """Rewrite ONE bucketed catalog table to one file per bucket while
    KEEPING its bucket spec, so whatever no-shuffle join property the
    bucketing provides survives the rewrite.  The shared engine behind
    every index compaction here (LSH banding/sets, exact-hash, IVF
    lists, PQ quantized vectors — any ``bucketBy`` table that accretes
    files through appends).

    Protocol: materialize a bucketed twin of the current contents under
    a temp name (and, for EXTERNAL tables, a sibling ``__compact``
    location), then swap catalog entries — the rewritten files are
    fully on disk before the original is dropped.

    ``n_buckets`` defaults to the existing bucket count (no-shuffle
    rewrite); changing it pays the one repartition the change requires.

    ``minus`` (a DataFrame of id columns, e.g. ``(vec_id)`` or
    ``(doc_id)``) drops matching rows during the rewrite — how the
    index compactions fold pending tombstones
    (``similarity.delete_from_index`` / ``dedup.delete_from_dedup_index``)
    into the pass they were already making.  The anti-join is broadcast
    (tombstone sets are bounded by compaction cadence) and joins on
    the ``minus`` frame's own columns regardless of the bucket keys:
    removing rows never perturbs the surviving rows' bucket
    assignment, and with the bucketed scan pinned each task still
    holds exactly one bucket, so the one-file-per-bucket output shape
    is unchanged.
    """
    # the table may have been rewritten by another session's fold
    # since this session last read it (per-session relation cache)
    spark.catalog.refreshTable(table)
    detail = spark.sql(f"DESCRIBE FORMATTED {table}").collect()

    def _field(col, detail=detail):
        row = next((r for r in detail if r.col_name == col), None)
        return None if row is None else row.data_type

    raw = _field("Num Buckets")
    if raw is None:
        raise ValueError(f"{table} is not a bucketed table")
    nb = int(raw) if n_buckets is None else n_buckets
    same_nb = nb == int(raw)
    external = (_field("Type") or "").strip().upper() == "EXTERNAL"
    location = _field("Location")
    tmp = f"{table}__compact_tmp"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    if same_nb:
        # same bucket count: keep the bucketed scan (one partition
        # per storage bucket) and the rewrite needs NO shuffle —
        # each task merges exactly its bucket's files.
        frame = spark.table(table)
    else:
        # changing the bucket count: read by PATH (no bucket spec,
        # so the explicit repartition onto the new bucket hash is
        # not elided) and pay the one shuffle the change requires
        frame = spark.read.parquet(location).repartition(nb, *keys)
    if minus is not None:
        frame = frame.join(F.broadcast(minus), list(minus.columns), "left_anti")
    writer = (
        frame.write.bucketBy(nb, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if external:
        # alternate between <base> and <base>__compact so repeated
        # compactions don't grow the path
        base = location[: -len("__compact")] if location.endswith(
            "__compact"
        ) else location
        new_loc = base if location.endswith("__compact") else f"{base}__compact"
        writer = writer.option("path", new_loc)
    if same_nb:
        # a v1 write declares no distribution requirement, so
        # DisableUnnecessaryBucketedScan would switch the scan to
        # file-based splits and misalign the output buckets; pin
        # the bucketed read for the duration of THIS write (the
        # decision is made when the write job plans, not when the
        # DataFrame is built)
        auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prior = spark.conf.get(auto, "true")
        spark.conf.set(auto, "false")
        try:
            writer.saveAsTable(tmp)
        finally:
            spark.conf.set(auto, prior)
    else:
        writer.saveAsTable(tmp)
    spark.sql(f"DROP TABLE {table}")  # external: old files remain...
    if external and location:
        fs, jvm = _hadoop_fs(spark, location)
        fs.delete(jvm.org.apache.hadoop.fs.Path(location), True)  # ...gone
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    # drop this session's cached relation (files moved for EXTERNAL
    # tables).  Spark's relation cache is PER SESSION: any OTHER
    # session that read the table before this compaction must
    # spark.catalog.refreshTable(table) itself — the foreachBatch
    # streams compact inside the stream's cloned session, so a driver
    # session inspecting the index mid-stream is exactly that case.
    spark.catalog.refreshTable(table)


def _refresh_spec_buckets(
    spark: SparkSession, name: str, anchor_table: str, n_buckets: int | None
) -> None:
    """Keep the ``_spec`` restart manifest truthful after a compaction
    that CHANGED the bucket count: a stale count would make a later
    :func:`register_index` declare ``INTO <old> BUCKETS`` over files
    physically bucketed into the new count — and Spark trusts declared
    bucketing, so bucketed joins would silently misroute rows.  No-op
    for managed indexes (no spec) or count-preserving compactions."""
    if n_buckets is None:
        return
    root = _external_root(spark, anchor_table)
    if root is None:
        return
    spec_path = f"{root}/{name}_spec"
    fs, jvm = _hadoop_fs(spark, spec_path)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(spec_path)):
        return
    family = spark.read.parquet(spec_path).collect()[0]["family"]
    write_index_spec(
        spark, name, root, family, n_buckets, clean_compact_siblings=False
    )


def compact_minhash_index(
    spark: SparkSession,
    name: str,
    n_buckets: int | None = None,
) -> None:
    """Rewrite the LSH index tables (``dedup.build_minhash_index``
    triple) after streaming appends: each micro-batch appended
    ``n_buckets`` files per table, and a long-running ``near_dup_stream``
    turns every probe into a many-file scan.  The applied-batch log is
    left untouched.  See :func:`compact_bucketed_table`.

    Pending document tombstones (``dedup.delete_from_dedup_index``)
    fold into both rewrites — the banding rows AND the shingle sets of
    deleted docs go — and the tombstone table drops LAST (a crash
    mid-fold leaves deletes pending; re-folding is a no-op)."""
    check_index_lease(spark, name)
    ts = _pending_tombstones(spark, name, "doc_id")
    for suffix, keys in (("buckets", ["band", "bucket"]), ("sets", ["doc_id"])):
        compact_bucketed_table(
            spark, f"{name}_{suffix}", keys, n_buckets, minus=ts
        )
    if ts is not None:
        drop_tombstones(spark, name)
    _refresh_spec_buckets(spark, name, f"{name}_buckets", n_buckets)


def compact_exact_index(
    spark: SparkSession,
    name: str,
    n_buckets: int | None = None,
) -> None:
    """Compact the exact-dedup hash index (``dedup.build_exact_index``)
    after ``curate_stream`` appends — same accretion pattern as the LSH
    triple, one table.  The applied-batch log is left untouched.
    Pending document tombstones fold into the rewrite and drop last
    (idempotent — see :func:`compact_minhash_index`)."""
    check_index_lease(spark, name)
    ts = _pending_tombstones(spark, name, "doc_id")
    compact_bucketed_table(
        spark, f"{name}_hashes", ["text_hash"], n_buckets, minus=ts
    )
    if ts is not None:
        drop_tombstones(spark, name)
    _refresh_spec_buckets(spark, name, f"{name}_hashes", n_buckets)


def _pending_tombstones(
    spark: SparkSession,
    name: str,
    col: str = "vec_id",
    suffix: str = "_tombstones",
):
    """The index's logical-delete set, if any deletes are pending —
    folding it into the compaction rewrite is what reclaims the rows
    (``similarity.delete_from_index`` / ``dedup.delete_from_dedup_index``
    only ever append ids).  ``col`` is the index family's id column
    (``vec_id`` for the embedding tiers, ``doc_id`` for the text
    indexes).  ``suffix="_deferred"`` reads the out-of-order takedown
    set instead (ids deleted BEFORE ever being ingested — consumed by
    the append verbs, never by compaction).

    Always re-resolved through a ``refreshTable``: these tables are
    rewritten by OTHER sessions (an ingest stream retiring deferred
    entries, a fold dropping tombstones in a stream's cloned session),
    and Spark's relation cache is per-session — without the refresh, a
    takedown stream reading after the ingest stream's maintenance sees
    a deleted file listing (surfaced by the mixed-lifecycle soak as
    FILE_NOT_EXIST).  The tables are tiny (bounded by compaction
    cadence), so the re-listing is noise."""
    t = f"{name}{suffix}"
    if not spark.catalog.tableExists(t):
        return None
    spark.catalog.refreshTable(t)
    return spark.table(t).select(col)


def compact_ivf_index(
    spark: SparkSession,
    name: str,
    n_buckets: int | None = None,
) -> None:
    """Compact the IVF embedding index (``similarity.build_ivf_index``)
    after ``append_to_ivf_index`` streaming appends: the inverted-lists
    table accretes ``n_buckets`` files per applied batch exactly like
    the LSH triple.  Centroids and the batch/stats ledgers are tiny and
    append-bounded — left untouched.  See :func:`compact_bucketed_table`
    (the bucket spec, and with it the probe's no-index-side-shuffle
    property, survives the rewrite).

    Pending tombstones fold into the rewrite (the logical deletes
    become physical) and the tombstone table drops LAST — a crash
    mid-compaction leaves them pending, and re-folding an
    already-folded id is a no-op, so the sequence is idempotent."""
    check_index_lease(spark, name)
    ts = _pending_tombstones(spark, name)
    compact_bucketed_table(
        spark, f"{name}_lists", ["centroid_id"], n_buckets, minus=ts
    )
    if ts is not None:
        drop_tombstones(spark, name)
    _refresh_spec_buckets(spark, name, f"{name}_lists", n_buckets)


def compact_ivfpq_index(
    spark: SparkSession,
    name: str,
    n_buckets: int | None = None,
) -> None:
    """Compact the IVFADC index (``similarity.build_ivfpq_index``) after
    ``append_to_ivfpq_index`` appends: both corpus-sized tables — the
    residual codes (bucketed by centroid_id) and the re-rank quantized
    vectors (bucketed by vec_id) — are rewritten back to one file per
    bucket; codebooks/centroids/ledgers untouched.  Pending tombstones
    fold into both rewrites and drop last (idempotent — see
    :func:`compact_ivf_index`)."""
    check_index_lease(spark, name)
    ts = _pending_tombstones(spark, name)
    compact_bucketed_table(
        spark, f"{name}_codes", ["centroid_id"], n_buckets, minus=ts
    )
    compact_bucketed_table(
        spark, f"{name}_quantized", ["vec_id"], n_buckets, minus=ts
    )
    if ts is not None:
        drop_tombstones(spark, name)
    _refresh_spec_buckets(spark, name, f"{name}_codes", n_buckets)


def compact_pq_index(
    spark: SparkSession,
    name: str,
    n_buckets: int | None = None,
) -> None:
    """Compact the flat-PQ index (``similarity.build_pq_index``) after
    ``append_to_pq_index`` appends: both corpus-sized tables — the
    codes and the re-rank quantized vectors, each bucketed by vec_id —
    rewrite to one file per bucket; codebooks/ledgers untouched.
    Pending tombstones fold into both rewrites and drop last
    (idempotent — see :func:`compact_ivf_index`)."""
    check_index_lease(spark, name)
    ts = _pending_tombstones(spark, name)
    compact_bucketed_table(
        spark, f"{name}_codes", ["vec_id"], n_buckets, minus=ts
    )
    compact_bucketed_table(
        spark, f"{name}_quantized", ["vec_id"], n_buckets, minus=ts
    )
    if ts is not None:
        drop_tombstones(spark, name)
    _refresh_spec_buckets(spark, name, f"{name}_codes", n_buckets)


#: Table suffixes per persisted index family, split into the
#: corpus-sized tables (compacted, tombstone-foldable) and the small
#: aux tables (centroids/codebooks/ledgers — append-bounded).
INDEX_FAMILIES = {
    "minhash_lsh": (("_buckets", "_sets"), ("_batches",)),
    "exact_hash": (("_hashes",), ("_batches",)),
    "ivf": (("_lists",), ("_centroids", "_batches", "_stats")),
    "ivfpq": (
        ("_codes", "_quantized"),
        ("_centroids", "_codebooks", "_batches", "_stats", "_qstats"),
    ),
    "pq": (
        ("_codes", "_quantized"),
        ("_codebooks", "_batches", "_stats", "_qstats"),
    ),
}


def index_family(spark: SparkSession, name: str) -> str:
    """Which persisted index family ``name`` is, resolved from its
    catalog table signature (each build writes a distinct suffix set).
    Raises if no family's signature matches."""
    def has(suffix: str) -> bool:
        return spark.catalog.tableExists(f"{name}{suffix}")

    if has("_buckets") and has("_sets"):
        return "minhash_lsh"
    if has("_hashes"):
        return "exact_hash"
    if has("_lists"):
        return "ivf"
    if has("_codes") and has("_centroids"):
        return "ivfpq"
    if has("_codes"):
        return "pq"
    raise ValueError(f"no persisted index named '{name}' found in the catalog")


class IndexLeaseHeld(RuntimeError):
    """Another live session holds the index's writer lease."""


def _lease_site(spark: SparkSession, name: str, path: str | None = None) -> str:
    """Where the index's ``<name>_lock`` manifest lives: next to the
    tables — the EXTERNAL root for ``path=`` indexes (so the lease is
    visible to every session that can see the index), the warehouse
    dir for managed ones."""
    if path is not None:
        sep = "" if path.endswith("/") else "/"
        return f"{path}{sep}{name}_lock"
    for suffix in ("_lists", "_codes", "_quantized", "_hashes",
                   "_buckets", "_sets"):
        t = f"{name}{suffix}"
        if spark.catalog.tableExists(t):
            root = _external_root(spark, t)
            if root is not None:
                return f"{root}/{name}_lock"
            loc = _table_location(spark, t)
            if loc:
                return loc.rsplit("/", 1)[0] + f"/{name}_lock"
    wh = spark.conf.get("spark.sql.warehouse.dir")
    sep = "" if wh.endswith("/") else "/"
    return f"{wh}{sep}{name}_lock"


def _read_lease(spark: SparkSession, site: str) -> dict | None:
    """Read the lock manifest; ``None`` means NO LEASE.  Only two
    conditions map to None: the file is absent (including a
    FileNotFound race with a concurrent release), or its content
    isn't a JSON object (torn write mid-create).  Real IO errors
    (permission, network) PROPAGATE — swallowing them would silently
    disable the single-writer guard exactly when the filesystem is
    least trustworthy."""
    fs, jvm = _hadoop_fs(spark, site)
    p = jvm.org.apache.hadoop.fs.Path(site)
    if not fs.exists(p):
        return None
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(
            fs.open(p), "UTF-8"
        )
    except Exception as e:  # py4j surfaces java exceptions generically
        cls = getattr(getattr(e, "java_exception", None), "getClass", None)
        name = cls().getName() if cls is not None else ""
        if "FileNotFoundException" in name:
            return None  # deleted between exists() and open(): released
        raise
    try:
        lease = json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return None  # torn write mid-create: treat as absent
    return lease if isinstance(lease, dict) else None


def _write_lease(
    spark: SparkSession, site: str, lease: dict, overwrite: bool
) -> None:
    """Write the lock manifest.  ``overwrite=False`` is the atomic
    create-if-absent (``FileSystem.create(overwrite=false)``) — losing
    that race raises :class:`IndexLeaseHeld`, never a raw Java
    exception.  ``overwrite=True`` is the OWNER-REFRESH path: write a
    sibling temp file and atomically rename it over the lock
    (``FileContext.rename(OVERWRITE)``), so a healthy writer's lock is
    never momentarily absent during a periodic re-acquire — a
    concurrent ``check_index_lease`` always sees either the old or the
    new manifest."""
    fs, jvm = _hadoop_fs(spark, site)
    payload = bytearray(json.dumps(lease).encode("utf-8"))
    if not overwrite:
        p = jvm.org.apache.hadoop.fs.Path(site)
        try:
            out = fs.create(p, False)  # atomic create-if-absent
        except Exception as e:
            cls = getattr(getattr(e, "java_exception", None), "getClass", None)
            name = cls().getName() if cls is not None else ""
            if "AlreadyExists" in name:
                raced = _read_lease(spark, site)
                raise IndexLeaseHeld(
                    f"lost the lease-create race at {site!r}"
                    + (f" to {raced['owner']!r}" if raced else "")
                ) from None
            raise
        try:
            out.write(payload)
        finally:
            out.close()
        return
    tmp = jvm.org.apache.hadoop.fs.Path(f"{site}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(payload)
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri(), spark._jsc.hadoopConfiguration()
    )
    opts = spark._sc._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, jvm.org.apache.hadoop.fs.Path(site), opts)


def _lease_owner(spark: SparkSession) -> str:
    # per-APPLICATION identity: a stream's cloned session shares the
    # driver's applicationId, so in-app maintenance never self-blocks
    return spark.sparkContext.applicationId


def _claim_stale_lock(spark: SparkSession, site: str, expect) -> bool:
    """Atomically CLAIM a stale ``<name>_lock`` before stealing it:
    rename the manifest to a stealer-unique sibling
    (``<site>.steal.<applicationId>``) — Hadoop ``rename`` of the same
    source succeeds for exactly one concurrent caller (the losers get
    ``False``), which is what the r12 delete-then-create steal lacked:
    stealer B's ``delete`` could land AFTER stealer A's fresh create,
    removing A's live lease so B's create also succeeded and BOTH
    writers proceeded (r12 ADVICE, medium).

    After winning the rename, the claimed content is verified to
    still be the stale manifest the caller decided to steal —
    ``expect`` is the expired lease dict (owner + epoch compared), or
    ``None`` for torn-JSON debris.  A mismatch means the owner
    refreshed between the caller's read and the rename (rename-over
    replaces the file at ``site``, so a refresh can retarget what we
    renamed): the manifest is renamed back best-effort and the claim
    fails — the refreshed owner keeps its lease.

    Returns True only when this caller owns the (now deleted) stale
    debris and may proceed to the atomic create; False means another
    actor got there first — treat as a lost race."""
    fs, jvm = _hadoop_fs(spark, site)
    P = jvm.org.apache.hadoop.fs.Path
    claim = f"{site}.steal.{_lease_owner(spark)}"
    cp = P(claim)
    if fs.exists(cp):
        # only ever OUR OWN debris (the name embeds our identity): a
        # prior steal by this application crashed between rename and
        # delete — clear it so the rename below has a free target
        fs.delete(cp, False)
    try:
        won = fs.rename(P(site), cp)
    except Exception:
        return False  # source vanished mid-claim: a rival acted first
    if not won:
        return False
    claimed = _read_lease(spark, claim)
    stale = (
        claimed is None
        if expect is None
        else (
            claimed is not None
            and claimed.get("owner") == expect.get("owner")
            and claimed.get("epoch") == expect.get("epoch")
        )
    )
    if not stale:
        # the owner refreshed mid-claim — give the manifest back (if
        # the rename-back loses to a fresh create at `site`, the live
        # owner's next periodic refresh rewrites it via rename-over)
        fs.rename(cp, P(site))
        return False
    fs.delete(cp, False)
    return True


def acquire_index_lease(
    spark: SparkSession,
    name: str,
    ttl_s: int = 3600,
    path: str | None = None,
) -> dict:
    """Take the SINGLE-WRITER lease on an index: writes the
    ``<name>_lock`` manifest (owner = this Spark application, epoch,
    TTL) that every mutation verb checks (:func:`check_index_lease`) —
    a second application touching the index while the lease is live
    gets a hard :class:`IndexLeaseHeld` instead of silently
    interleaving with the replay log / drift ledger / tombstone
    writes.  Re-acquiring refreshes the epoch; a lease whose TTL
    elapsed is treated as a CRASHED writer and stolen (set ``ttl_s``
    comfortably above the longest maintenance job, and re-acquire
    periodically from long-lived writers).

    This is fail-fast protection, not a distributed lock: a fresh
    lease rides the atomic ``FileSystem.create(overwrite=false)``, and
    stealing an EXPIRED one first CLAIMS the stale manifest via an
    atomic rename to a stealer-unique name (:func:`_claim_stale_lock`,
    r13) — of any number of same-instant stealers exactly one wins
    under every interleaving (losers get :class:`IndexLeaseHeld`) and
    a loser's cleanup can never remove a winner's fresh lease.  Expiry
    still compares wall clocks across machines, the conceded
    approximation.  An owner's periodic re-acquire refreshes
    via temp-file + atomic rename-over, so the lock file is never
    momentarily absent mid-refresh — a healthy writer's lifetime is
    fully protected and a second writer fails before its first
    mutation lands, the enforcement SCALING.md's single-writer
    assumption needs.  Release with :func:`release_index_lease`."""
    site = _lease_site(spark, name, path)
    me = _lease_owner(spark)
    existing = _read_lease(spark, site)
    lease = {"owner": me, "epoch": time.time(), "ttl_s": ttl_s}
    if existing is None:
        try:
            _write_lease(spark, site, lease, overwrite=False)
        except IndexLeaseHeld:
            # The file exists but read as no-lease: either a racer won
            # the create THIS INSTANT and its payload write is still
            # in flight, or it is TORN debris from a crashed create.
            # Distinguish by age (r12 review fix): a same-instant
            # winner's write completes in milliseconds, so an invalid
            # manifest OLDER than the grace window is debris — clear
            # and retry the atomic create once; a RECENT one is the
            # racing winner — fail fast instead of stealing its lock
            # out from under it (which would let both writers win).
            time.sleep(0.2)
            if _read_lease(spark, site) is not None:
                raise
            fs, jvm = _hadoop_fs(spark, site)
            p = jvm.org.apache.hadoop.fs.Path(site)
            try:
                age_s = time.time() - fs.getFileStatus(
                    p
                ).getModificationTime() / 1000.0
            except Exception:
                raise IndexLeaseHeld(
                    f"lost the lease-create race at {site!r}"
                ) from None
            if age_s < 5.0:
                raise IndexLeaseHeld(
                    f"lost the lease-create race at {site!r} (winner's "
                    "manifest still in flight)"
                ) from None
            # rename-claim the debris (r13: atomic — two concurrent
            # debris-clearers can't both proceed the way the old
            # delete-then-create pair could), then take the lock
            if not _claim_stale_lock(spark, site, None):
                raise IndexLeaseHeld(
                    f"lost the torn-debris claim race at {site!r}"
                ) from None
            _write_lease(spark, site, lease, overwrite=False)
        return lease
    if existing.get("owner") == me:
        # OWN REFRESH: atomic rename-over, the lock is never absent —
        # a concurrent check_index_lease sees old or new, never a gap.
        _write_lease(spark, site, lease, overwrite=True)
        return lease
    if time.time() <= existing.get("epoch", 0) + existing.get("ttl_s", 0):
        raise IndexLeaseHeld(
            f"index '{name}' writer lease is held by "
            f"{existing['owner']!r} (expires in "
            f"{existing['epoch'] + existing['ttl_s'] - time.time():.0f}s)"
        )
    # expired FOREIGN lease: crashed writer — STEAL via rename-claim
    # then atomic create (r13, replacing delete-then-create: the
    # rename of the expired manifest succeeds for exactly ONE of any
    # number of concurrent stealers under EVERY interleaving, so a
    # loser's cleanup can never remove a winner's fresh lease; the
    # create can still lose to a brand-new acquirer that arrived after
    # our claim — that acquirer legitimately owns the lock)
    if not _claim_stale_lock(spark, site, existing):
        raise IndexLeaseHeld(
            f"lost the expired-lease steal race at {site!r}"
        )
    _write_lease(spark, site, lease, overwrite=False)
    return lease


def release_index_lease(
    spark: SparkSession, name: str, path: str | None = None
) -> None:
    """Drop this application's lease (no-op if absent or foreign —
    releasing never steals)."""
    site = _lease_site(spark, name, path)
    lease = _read_lease(spark, site)
    if lease is not None and lease.get("owner") == _lease_owner(spark):
        fs, jvm = _hadoop_fs(spark, site)
        fs.delete(jvm.org.apache.hadoop.fs.Path(site), False)


def check_index_lease(
    spark: SparkSession, name: str, path: str | None = None
) -> None:
    """The guard every index MUTATION verb runs first (builds, appends,
    deletes, compactions, retrains): raise :class:`IndexLeaseHeld` if
    ANOTHER application holds an unexpired ``<name>_lock`` lease.  An
    absent lease passes (locking is opt-in — a solo batch job needn't
    acquire), as does an expired one (crashed writer).  Cost: one
    existence probe, plus one tiny read only when a lock exists."""
    site = _lease_site(spark, name, path)
    lease = _read_lease(spark, site)
    if lease is None:
        return
    if lease.get("owner") == _lease_owner(spark):
        return
    if time.time() > lease.get("epoch", 0) + lease.get("ttl_s", 0):
        return  # expired: crashed writer, safe to proceed
    raise IndexLeaseHeld(
        f"index '{name}' writer lease is held by {lease['owner']!r} — "
        "a second concurrent writer would corrupt the replay log / "
        "drift ledger / tombstone semantics. Wait for the lease to "
        "expire or release it from the owning application."
    )


def _table_location(spark: SparkSession, table: str) -> str | None:
    detail = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    row = next((r for r in detail if r.col_name == "Location"), None)
    return None if row is None else row.data_type


def _external_root(spark: SparkSession, table: str) -> str | None:
    """Parent directory of ``table``'s location when it is EXTERNAL —
    i.e. the index root a ``path=`` build used (location basename may
    carry the compaction ``__compact`` suffix; the parent is the root
    either way) — else None (managed table)."""
    if not spark.catalog.tableExists(table):
        return None
    detail = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    typ = next((r.data_type for r in detail if r.col_name == "Type"), "")
    if typ.strip().upper() != "EXTERNAL":
        return None
    loc = next((r.data_type for r in detail if r.col_name == "Location"), None)
    return None if loc is None else loc.rsplit("/", 1)[0]


def append_tombstones(
    spark: SparkSession,
    name: str,
    new_ids,
    pending,
    member_table: str,
    suffix: str = "_tombstones",
) -> int:
    """Shared tombstone writer behind ``similarity.delete_from_index``
    and ``dedup.delete_from_dedup_index`` (one sequence, fixed once):
    pin the delta (breaks lineage to the tombstones table — no
    read-while-append hazard; a crash here changes nothing), count it,
    and create-or-append ``<name>_tombstones``.  For an EXTERNAL index
    (``member_table`` lives under a ``path=`` root) the tombstone
    table is created AT THAT ROOT, so the pending delete set survives
    a metastore loss and :func:`register_index` re-attaches it —
    without this, a restart would silently resurrect deleted rows in
    every probe.  ``suffix="_deferred"`` writes the out-of-order
    takedown set (same sites, same restart story) instead."""
    from hadoop_logfile_inputformat_spark.operators.tables import (
        clear_orphaned_table,
    )

    check_index_lease(spark, name)
    new_ids = new_ids.localCheckpoint(eager=True)
    n = new_ids.count()
    if n == 0:
        return 0
    t = f"{name}{suffix}"
    if pending is None:
        w = new_ids.write.mode("overwrite").format("parquet")
        root = _external_root(spark, member_table)
        if root is not None:
            w = w.option("path", f"{root}/{name}{suffix}")
        else:
            clear_orphaned_table(spark, t)
        w.saveAsTable(t)
    else:
        new_ids.write.mode("append").format("parquet").saveAsTable(t)
    return n


def deferred_split(
    spark: SparkSession,
    name: str,
    delta,
    id_col: str = "vec_id",
):
    """Phase 1 of applying pending OUT-OF-ORDER takedowns
    (``<name>_deferred`` — written by the delete verbs for ids the
    index had never ingested) to an arriving append delta: returns
    ``(filtered_delta, hit)`` where the hit rows (a pinned id frame,
    or None) are dropped from the delta before they ever become
    probe-visible — the same end state as delete-after-ingest plus
    fold.  READ-ONLY: the deferred table is untouched, so a crash
    anywhere in the append replays with the intent intact.  Call
    :func:`retire_deferred` with the hit AFTER the append's
    bookkeeping lands (retiring earlier opens a window where a crash
    between retire and bookkeeping makes the replay re-admit the
    victim).  Cost: one broadcast semi-join against a bounded set."""
    dfd = _pending_tombstones(spark, name, id_col, suffix="_deferred")
    if dfd is None:
        return delta, None
    hit = (
        delta.select(id_col)
        .join(F.broadcast(dfd), id_col, "left_semi")
        .distinct()
        .localCheckpoint(eager=True)
    )
    if hit.count() == 0:
        return delta, None
    return delta.join(F.broadcast(hit), id_col, "left_anti"), hit


def retire_deferred(
    spark: SparkSession,
    name: str,
    hit,
    id_col: str = "vec_id",
) -> None:
    """Phase 2: remove consumed entries from ``<name>_deferred`` (drop
    the table when it empties).  Idempotent — retiring an id twice, or
    after another writer already folded it, removes nothing extra.  A
    crash BEFORE this (append + bookkeeping already landed) leaves the
    entry pending forever for an id that will never arrive again —
    harmless (it can never match) and retired by the next rebuild."""
    if hit is None:
        return
    dfd = _pending_tombstones(spark, name, id_col, suffix="_deferred")
    if dfd is None:
        return
    # pin before the rewrite: `remaining` must not lazily re-read the
    # files the overwrite below replaces
    dfd = dfd.localCheckpoint(eager=True)
    remaining = dfd.join(F.broadcast(hit), id_col, "left_anti")
    if remaining.count() == 0:
        drop_tombstones(spark, name, suffix="_deferred")
    else:
        # insertInto keeps the table definition (and an external
        # table's location) — a saveAsTable overwrite would not
        remaining.write.mode("overwrite").insertInto(f"{name}_deferred")


def drop_tombstones(
    spark: SparkSession, name: str, suffix: str = "_tombstones"
) -> None:
    """Remove ``<name>_tombstones`` — catalog entry AND files.  Every
    site that retires a delete set (compaction folds, retrain resets,
    rebuilds starting a fresh generation) must go through this: a bare
    ``DROP TABLE`` on an EXTERNAL tombstone table leaves its files at
    the index root, and the next :func:`register_index` would
    resurrect a stale delete set into the new generation — hiding
    live rows.  ``suffix="_deferred"`` retires the out-of-order
    takedown set instead — REBUILD sites only (compaction folds must
    leave it: its ids are not in the corpus, so a fold cannot consume
    them)."""
    t = f"{name}{suffix}"
    if not spark.catalog.tableExists(t):
        return
    loc = _table_location(spark, t)
    external = _external_root(spark, t) is not None
    spark.sql(f"DROP TABLE {t}")
    if external and loc:
        fs, jvm = _hadoop_fs(spark, loc)
        fs.delete(jvm.org.apache.hadoop.fs.Path(loc), True)


def force_drop_table(spark: SparkSession, table: str) -> None:
    """``DROP TABLE IF EXISTS`` that also clears ORPHANED managed-table
    debris.  An interrupted writer can leave a managed table's data
    directory in the warehouse without its catalog entry (the metastore
    write is what crashed, or the catalog was session-scoped and the
    session died); a plain ``DROP TABLE IF EXISTS`` is then a no-op and
    the next managed ``CREATE TABLE`` fails with "location already
    exists" (SQLSTATE 42710).  This verb makes drop idempotent against
    that debris class: drop the catalog entry if present, then delete
    whatever still sits at the warehouse location a managed re-CREATE
    of ``table`` would claim.

    An EXTERNAL table's own data is intentionally NOT touched (DROP on
    an external table preserves data by contract; use
    :func:`drop_tombstones`-style explicit deletes for that) — but the
    warehouse slot for ``table``'s NAME is cleared either way, because
    that slot is what blocks the next managed create.

    The orphan removal delegates to ``tables.clear_orphaned_table``
    (the builders' pre-``saveAsTable`` guard), inheriting its safety
    property: only a directory that LOOKS like a table remnant
    (parquet part / ``_SUCCESS`` / ``_temporary`` staging / empty) is
    removed — a same-named directory holding anything else was never
    a table, stays put, and the next CREATE fails loudly instead of
    this verb silently eating user data.
    """
    from hadoop_logfile_inputformat_spark.operators.tables import (
        clear_orphaned_table,
    )

    # unconditional IF EXISTS, identifier quoted (r15 ADVICE): a
    # tableExists-then-DROP pair is a cross-session TOCTOU — a
    # concurrent drop between the check and the DROP raised here
    quoted = ".".join(f"`{p}`" for p in table.split("."))
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
    clear_orphaned_table(spark, table)


def index_info(spark: SparkSession, name: str) -> dict:
    """DESCRIBE INDEX — the one operational read an index owner runs
    before deciding on maintenance: per-table row/file/byte footprint
    (file fan-in is what compaction bounds — at 100 TB a probe's cost
    is dominated by file count long before byte count), pending
    tombstones (what the next compaction folds; probes pay a broadcast
    anti-join this size until then), applied append batches, and the
    drift ledger's retrain verdict for the embedding tiers
    (``similarity.ivf_index_drift``).

    Driver-side cost: catalog lookups, one count per table (parquet
    footer statistics — no row materialization), one bytes-sized
    ledger read.  Never scans vector/shingle payloads.
    """
    family = index_family(spark, name)
    corpus, aux = INDEX_FAMILIES[family]
    out = {"name": name, "family": family, "tables": {}}
    for suffix in corpus + aux:
        t = f"{name}{suffix}"
        if not spark.catalog.tableExists(t):
            continue
        spark.catalog.refreshTable(t)  # per-session relation cache
        loc = _table_location(spark, t)
        n_files, n_bytes = (None, None)
        if loc:
            try:
                n_files, n_bytes = _table_sizes(
                    spark, loc.removeprefix("file:")
                )
            except OSError:
                pass
        out["tables"][t] = {
            "rows": spark.table(t).count(),
            "corpus_sized": suffix in corpus,
            "files": n_files,
            "bytes": n_bytes,
        }
    t = f"{name}_tombstones"
    out["pending_tombstones"] = (
        spark.table(t).count() if spark.catalog.tableExists(t) else 0
    )
    d = f"{name}_deferred"
    out["deferred_deletes"] = (
        spark.table(d).count() if spark.catalog.tableExists(d) else 0
    )
    b = f"{name}_batches"
    out["applied_batches"] = (
        spark.table(b).count() if spark.catalog.tableExists(b) else None
    )
    if spark.catalog.tableExists(f"{name}_stats"):
        from hadoop_logfile_inputformat_spark.operators.similarity import (
            ivf_index_drift,
        )

        out["drift"] = ivf_index_drift(spark, name)
    # quantization-quality verdict for the PQ families (r13): the seed
    # build's ADC/residual self-similarity and entry budget from the
    # one-row _qstats ledger.  budget_limited is the third verdict an
    # operator sizes against — drift says "retrain", the nprobe curve
    # says "probe wider", this says "the codes themselves can't
    # describe the corpus: rebuild with more entries (or a rotation)".
    # Calibration: SCALING.md's recall-vs-budget table (soak.py
    # --budget-curve) — self-sim tracks recall@5 monotonically.
    if spark.catalog.tableExists(f"{name}_qstats"):
        from hadoop_logfile_inputformat_spark.operators.similarity import (
            pq_budget_floor,
            recommended_rerank,
            tier_limited,
        )

        spark.catalog.refreshTable(f"{name}_qstats")
        # tolerate an EMPTY ledger (torn write between table creation
        # and data commit — the crash-sweep scenario class; r13 ADVICE):
        # a missing row degrades to no quantization block, same as a
        # missing table, instead of raising out of DESCRIBE-INDEX
        qrows = spark.table(f"{name}_qstats").collect()
        q = qrows[0] if qrows else None
        if q is not None:
            # live corpus size for the rerank hint: the _quantized
            # count this call already made (appends move it; the
            # seed-only _qstats n_vecs is the fallback).  `is None`,
            # not `or`: a genuinely EMPTY corpus (rows == 0, fully
            # reclaimed) must not fall back to the stale seed-time
            # n_vecs (r14 ADVICE).
            rows = out["tables"].get(f"{name}_quantized", {}).get("rows")
            live_n = rows if rows is not None else q["n_vecs"]
            out["quantization"] = {
                "kind": q["kind"],
                "self_sim": q["self_sim"],
                "n_entries": q["n_entries"],
                "m": q["m"],
                "rotated": q["rotated"],
                # seed mean nearest-centroid cosine (r16) — the tier
                # verdict's geometry input, metric-independent; None
                # for flat indexes and pre-r16 rows
                "routing_cos": q.asDict().get("routing_cos"),
                "budget_limited": (
                    q["self_sim"] is not None
                    and q["self_sim"] < pq_budget_floor(q["kind"])
                ),
                # corpus-size-aware exact-rerank depth (r14): the
                # measured law — recall at a fixed depth falls ~1/2.5
                # per 10x corpus while deepening is probe-cost-free to
                # first order.  budget_limited prices the CODES;
                # this prices the SHORTLIST — the r13 gap where the
                # budget verdict cleared while recall@5 sat at 0.05
                # because the shortlist, not the codes, was binding.
                "rerank_hint": recommended_rerank(live_n),
                # tier verdict (r15): fires when the ADC tier's
                # MEASURED ceiling binds — clustered routing geometry
                # (the _stats seed row's mean nearest-centroid cosine)
                # at >=x100 live scale, where no budget/rerank/nprobe
                # composition escapes recall ~0.27 but the flat tier
                # reads 0.44-0.58 (SCALING.md composed-remedy grid).
                # budget_limited prices the CODES, rerank_hint the
                # SHORTLIST; this prices the one decision that
                # dominates both at that geometry: tier choice.
                # geometry comes from the qstats row's routing_cos
                # (r16: recorded under EVERY serving metric — the x100
                # clustered l2 grid measured the same ceiling, see
                # SCALING.md); pre-r16 indexes fall back to the
                # cosine-only _stats seed read
                "tier_hint": (
                    "flat-pq"
                    if tier_limited(
                        q["kind"],
                        q.asDict().get("routing_cos")
                        if q.asDict().get("routing_cos") is not None
                        else (
                            (out.get("drift") or {}).get("seed_mean_sim")
                            if (out.get("drift") or {}).get("metric")
                            == "cosine"
                            else None
                        ),
                        live_n,
                    )
                    else None
                ),
            }
    # writer lease state (r12): the one operational fact an owner had
    # to read from `<name>_lock` by hand — who may mutate, until when
    lease = _read_lease(spark, _lease_site(spark, name))
    out["lease"] = (
        None
        if lease is None
        else {
            "owner": lease.get("owner"),
            "epoch": lease.get("epoch"),
            "ttl_s": lease.get("ttl_s"),
            "expired": time.time()
            > lease.get("epoch", 0) + lease.get("ttl_s", 0),
            "held_by_this_application": lease.get("owner")
            == _lease_owner(spark),
        }
    )
    return out


#: Bucket spec per (family, corpus table suffix): the keys each build
#: bucketBy+sortBy's on.  Aux tables (ledgers, centroids, codebooks,
#: tombstones) are plain parquet.
INDEX_BUCKET_KEYS = {
    "minhash_lsh": {"_buckets": ["band", "bucket"], "_sets": ["doc_id"]},
    "exact_hash": {"_hashes": ["text_hash"]},
    "ivf": {"_lists": ["centroid_id"]},
    "ivfpq": {"_codes": ["centroid_id"], "_quantized": ["vec_id"]},
    "pq": {"_codes": ["vec_id"], "_quantized": ["vec_id"]},
}


def write_index_spec(
    spark: SparkSession,
    name: str,
    path: str,
    family: str,
    n_buckets: int,
    clean_compact_siblings: bool = True,
) -> None:
    """Persist the one fact about an EXTERNAL index that its parquet
    files cannot carry: the bucket COUNT (keys are family-determined,
    schemas are in the footers, but an empty bucket writes no file —
    the count is unrecoverable from a listing).  Every ``path=`` build
    writes this 1-row ``<name>_spec`` dir so :func:`register_index`
    can resurrect the catalog entries in a fresh session/metastore.

    A FULL build also lands every table at its BASE location, so any
    ``__compact`` sibling a pre-rebuild compaction left behind is now
    stale — removed when ``clean_compact_siblings`` (the builders'
    default), or a later :func:`register_index` would see both
    siblings and refuse (its crashed-swap guard).  A spec REFRESH
    after a re-bucketing compaction (:func:`_refresh_spec_buckets`)
    must pass False: there the ``__compact`` sibling IS the live
    data."""
    if clean_compact_siblings:
        # Match only THIS index's exact table suffixes: a broad
        # "{name}_*__compact" prefix match would also hit a sibling
        # index whose name is prefix-nested (building 'idx' must not
        # delete 'idx_v2's live 'idx_v2_lists__compact' location).
        corpus, aux = INDEX_FAMILIES[family]
        fs, jvm = _hadoop_fs(spark, path)
        P = jvm.org.apache.hadoop.fs.Path
        for suffix in corpus + aux + ("_tombstones", "_deferred"):
            sib = P(f"{path}/{name}{suffix}__compact")
            if fs.exists(sib):
                fs.delete(sib, True)
    from hadoop_logfile_inputformat_spark.operators.tables import local_df

    local_df(
        spark, [(family, n_buckets)], "family STRING, n_buckets INT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/{name}_spec")


def register_index(spark: SparkSession, name: str, path: str) -> str:
    """Re-attach an EXTERNAL index (any family built with ``path=``) to
    THIS session's catalog — the restart story for a standing index.

    The metastore here is session-scoped (and on a real cluster an
    index may move warehouses, or a disaster-recovery site may attach
    a replicated bucket): the parquet files under ``path`` outlive any
    catalog, but the catalog entry is what carries the BUCKET SPEC,
    and with it every probe's no-index-side-shuffle property.  This
    reads the ``<name>_spec`` manifest the build wrote (family +
    bucket count — the one fact not recoverable from the files), then
    issues ``CREATE TABLE ... USING parquet CLUSTERED BY ... SORTED BY
    ... INTO n BUCKETS LOCATION ...`` for each corpus table and a
    plain external table for each aux table present.  Schemas are
    inferred from the parquet footers, so carry columns ride along
    unchanged.  Returns the family.  Probes, appends (``insertInto``
    applies the re-declared bucketing), deletes, and compactions all
    work against the re-registered index — pinned in
    tests/test_maintenance.py including bit-equal probe results and a
    still-bucketed scan under sort-merge joins.
    """
    spec = spark.read.parquet(f"{path}/{name}_spec").collect()[0]
    family, nb = spec["family"], spec["n_buckets"]
    bucketed = INDEX_BUCKET_KEYS[family]
    corpus, aux = INDEX_FAMILIES[family]
    fs, jvm = _hadoop_fs(spark, path)

    def _exists(p: str) -> bool:
        return fs.exists(jvm.org.apache.hadoop.fs.Path(p))

    for suffix in corpus + aux + ("_tombstones", "_deferred"):
        # compact_bucketed_table alternates EXTERNAL locations between
        # <dir> and <dir>__compact (deleting the other after the swap)
        # — resolve whichever sibling is live.  Both present means a
        # crash mid-swap: refuse to guess, the recovery artifacts need
        # a human eye.
        base = f"{path}/{name}{suffix}"
        candidates = [p for p in (base, f"{base}__compact") if _exists(p)]
        if not candidates:
            continue
        if len(candidates) == 2:
            raise ValueError(
                f"both {base} and {base}__compact exist (crashed "
                "compaction swap) — remove the stale one before "
                "re-registering"
            )
        loc = candidates[0]
        schema = spark.read.parquet(loc).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        keys = bucketed.get(suffix)
        clause = (
            f"CLUSTERED BY ({', '.join(keys)}) "
            f"SORTED BY ({', '.join(keys)}) INTO {nb} BUCKETS "
            if keys
            else ""
        )
        spark.sql(
            f"CREATE TABLE {name}{suffix} ({cols}) USING parquet "
            f"{clause}LOCATION '{loc}'"
        )
    return family


def drop_index(spark: SparkSession, name: str, delete_files: bool = False) -> list:
    """Drop every catalog entry of a persisted index (the inverse of
    the builders and of :func:`register_index`) and return the dropped
    table names.  ``delete_files=False`` (default) leaves EXTERNAL
    files on disk — the index stays re-attachable via
    :func:`register_index`; ``delete_files=True`` also removes each
    table's location AND the ``_spec`` manifest (managed tables delete
    their files on DROP either way).

    Resolves the family from the catalog signature, so the caller
    never enumerates suffixes; unknown names raise (nothing to drop is
    a caller bug worth hearing about).

    ``delete_files=True`` also clears ORPHANED managed slots of the
    family's suffixes (r15): a crashed writer can strand a family
    table's warehouse directory without its catalog entry — invisible
    to the catalog walk above but fatal to the next build's CREATE
    ("location already exists").  Destruction intent is explicit here,
    so the orphans go too (via ``tables.clear_orphaned_table``'s
    conservative remnant check — a same-named non-table directory
    stays).  The default keeps them: an orphan may be a crashed
    build's sole surviving data, and :func:`vacuum_index` reports it."""
    family = index_family(spark, name)
    corpus, aux = INDEX_FAMILIES[family]
    dropped = []
    spec_loc = None
    for suffix in corpus + aux + ("_tombstones", "_deferred"):
        t = f"{name}{suffix}"
        if not spark.catalog.tableExists(t):
            continue
        loc = _table_location(spark, t)
        external = any(
            r.data_type.strip().upper() == "EXTERNAL"
            for r in spark.sql(f"DESCRIBE FORMATTED {t}").collect()
            if r.col_name == "Type"
        )
        spark.sql(f"DROP TABLE {t}")
        dropped.append(t)
        if delete_files and external and loc:
            fs, jvm = _hadoop_fs(spark, loc)
            fs.delete(jvm.org.apache.hadoop.fs.Path(loc), True)
            if spec_loc is None:
                # the _spec manifest sits next to the tables
                spec_loc = loc.rsplit("/", 1)[0] + f"/{name}_spec"
    if delete_files and spec_loc is not None:
        fs, jvm = _hadoop_fs(spark, spec_loc)
        p = jvm.org.apache.hadoop.fs.Path(spec_loc)
        if fs.exists(p):
            fs.delete(p, True)
    if delete_files:
        from hadoop_logfile_inputformat_spark.operators.tables import (
            clear_orphaned_table,
        )

        for suffix in corpus + aux + ("_tombstones", "_deferred"):
            t = f"{name}{suffix}"
            if not spark.catalog.tableExists(t):
                clear_orphaned_table(spark, t)
    return dropped


def recover_compact_dir(spark: SparkSession, base: str,
                        live: str | None = None) -> dict:
    """Recover a directory from a crashed :func:`compact_parquet_dir`
    swap — the dir-protocol half of :func:`vacuum_index`, public (r13)
    so non-index compaction targets (e.g. a streaming pairs sink dir)
    get the same crash recovery.  The protocol's three mutation
    boundaries leave exactly these states, all handled:

    - crash before the first rename: ``<base>__compact_tmp`` next to an
      intact ``base`` → tmp is debris, removed;
    - crash between the renames: ``base`` ABSENT, ``__compact_old``
      holds the pre-compaction data → old is RESTORED to ``base``
      (checked rename — a failure aborts loudly, never deletes), tmp
      removed;
    - crash after the second rename: ``base`` holds the compacted
      data, ``__compact_old`` is stale → old removed.

    ``live`` (optional) is a catalog-served location that counts as
    the authoritative copy when ``base`` itself is absent (the
    bucketed-sibling case vacuum passes).  Debris is only ever deleted
    when an authoritative copy EXISTS.  Returns ``{"restored": [...],
    "removed": [...]}``."""
    fs, jvm = _hadoop_fs(spark, base)
    P = jvm.org.apache.hadoop.fs.Path

    def _exists(p):
        return fs.exists(P(p))

    report = {"restored": [], "removed": []}
    tmp_d, old_d = f"{base}__compact_tmp", f"{base}__compact_old"
    if not _exists(base) and _exists(old_d):
        # crash mid-swap: restore the pre-compaction data, then clear
        # the unswapped copy.  Hadoop rename signals failure by
        # RETURNING FALSE (r12 review fix): a silent failure here
        # followed by the debris deletes below would destroy the only
        # complete copy — hard-error instead.
        if not fs.rename(P(old_d), P(base)):
            raise RuntimeError(
                f"could not restore {old_d} -> {base}; "
                "leaving all artifacts untouched"
            )
        report["restored"].append(base)
    # debris deletes require the authoritative copy to EXIST — base on
    # disk, or the catalog table serving from elsewhere
    if _exists(base) or (live is not None and _exists(live)):
        for d in (tmp_d, old_d):
            if _exists(d):
                fs.delete(P(d), True)
                report["removed"].append(d)
    return report


def vacuum_index(
    spark: SparkSession,
    name: str,
    path: str | None = None,
    prefer: str | None = None,
) -> dict:
    """Clean the crashed-swap leftovers a killed compaction strands —
    the artifacts :func:`register_index` refuses on and nothing
    previously removed (r12).  Handles, per table of the index (EXACT
    suffixes only — never a prefix glob, the r11 sibling-index
    lesson):

    - ``<loc>__compact_tmp`` / ``<loc>__compact_old`` dirs
      (:func:`compact_parquet_dir` protocol): with the base dir
      present, both are debris (tmp = unswapped copy, old = stale
      post-swap leftover) → removed.  Base absent + old present =
      crash mid-swap → ``old`` is RESTORED to the base (the
      pre-compaction authoritative data) and tmp removed.
    - a stranded ``<table>__compact_tmp`` CATALOG entry
      (:func:`compact_bucketed_table` crashed between its saveAsTable
      and the rename): if the real table is GONE from the catalog the
      tmp copy is the only complete one — the swap is COMPLETED
      (rename tmp → table); if the real table still exists the tmp is
      debris → dropped (with its files when external).
    - both bucketed-location siblings (``<dir>`` and
      ``<dir>__compact``) present with no catalog entry to arbitrate:
      resolved only when the caller passes ``prefer`` (``"base"`` or
      ``"compact"`` — an explicit human decision, now executable);
      otherwise reported under ``"ambiguous"`` and left untouched.
      When the table IS in the catalog its current location wins and
      the other sibling is removed.

    Vacuum is a MUTATION verb and ACQUIRES the writer lease for its
    duration (r13, was check-only): a LIVE writer's in-flight
    compaction legitimately holds a ``__compact_tmp`` that is
    work-in-progress, not debris — vacuuming under it would destroy a
    running swap.  A foreign live lease raises
    :class:`IndexLeaseHeld`; an expired one is stolen (the
    crashed-writer case vacuum exists for); holding the lease means
    concurrent LEASED mutation verbs fail fast for the vacuum's
    duration instead of interleaving with its renames.  The lease is
    released on exit unless this application already held it (a
    maintenance session that acquired before vacuuming keeps its
    lease).  CAVEAT (unchanged from r12): locking is opt-in — a live
    writer that never acquired a lease is invisible to this guard;
    never run vacuum while any unleased writer may be mutating the
    index.

    Pass ``path=`` for an external index that is not (yet) registered
    in this session.  Returns ``{"removed": [...], "restored": [...],
    "completed_swaps": [...], "dropped_tables": [...],
    "ambiguous": [...], "retrain_snapshots": [...],
    "pending_appends": [...], "orphaned_locations": [...]}`` —
    ``orphaned_locations`` (r15) lists managed-table directories of
    this index's exact suffixes that have NO catalog entry (an
    interrupted writer's or dead session's debris — they block the
    next managed CREATE with "location already exists"); vacuum only
    reports them (the dir may be a crashed build's sole surviving
    data) — :func:`force_drop_table` is the explicit destruction
    verb.  ``pending_appends`` (r14) lists
    ``_append_intent_*`` markers of crashed HALF-APPENDS whose batch
    never reached the replay log: vacuum never deletes those (the
    marker is what makes the stream's replay resume instead of
    double-append); markers whose batch IS logged are debris and are
    removed.  ``retrain_snapshots`` (r13)
    lists a stranded ``<name>_retrain_tmp``, the signal that a RETRAIN
    crashed mid-rebuild and the index may hold mixed table
    generations; vacuum never deletes it (it is the recovery corpus) —
    re-run the matching ``retrain_*_index`` verb to rebuild every
    table consistently.  After a clean vacuum, a previously refusing
    :func:`register_index` succeeds — pinned in
    tests/test_maintenance.py."""
    if prefer not in (None, "base", "compact"):
        raise ValueError("prefer must be None, 'base', or 'compact'")
    # take the lease for the vacuum's duration (r13): acquire raises
    # IndexLeaseHeld on a foreign LIVE lease (same refusal as the old
    # check) and steals an expired one; release on exit only if we
    # were not already the owner going in
    _site = _lease_site(spark, name, path)
    _prior = _read_lease(spark, _site)
    _owned_before = (
        _prior is not None
        and _prior.get("owner") == _lease_owner(spark)
        and time.time() <= _prior.get("epoch", 0) + _prior.get("ttl_s", 0)
    )
    acquire_index_lease(spark, name, path=path)
    try:
        return _vacuum_index_leased(spark, name, path, prefer)
    finally:
        if not _owned_before:
            release_index_lease(spark, name, path)


def _vacuum_index_leased(
    spark: SparkSession,
    name: str,
    path: str | None,
    prefer: str | None,
) -> dict:
    """:func:`vacuum_index` body, entered holding the writer lease."""
    try:
        family = index_family(spark, name)
    except ValueError:
        if path is not None:
            family = spark.read.parquet(f"{path}/{name}_spec").collect()[0][
                "family"
            ]
        else:
            # the crash state may have dropped the very corpus table
            # the signature detection keys on (compact_bucketed_table
            # dies between its DROP and RENAME): detect the family
            # from the stranded __compact_tmp debris instead
            family = next(
                (
                    fam
                    for fam, (corpus, _aux) in INDEX_FAMILIES.items()
                    if any(
                        spark.catalog.tableExists(
                            f"{name}{s}__compact_tmp"
                        )
                        for s in corpus
                    )
                ),
                None,
            )
            if family is None:
                raise
    corpus, aux = INDEX_FAMILIES[family]
    report = {
        "removed": [],
        "restored": [],
        "completed_swaps": [],
        "dropped_tables": [],
        "ambiguous": [],
        "retrain_snapshots": [],
    }
    # a retrain that crashed mid-rebuild KEEPS its `<name>_retrain_tmp`
    # snapshot (r13): the rebuild overwrites several tables, so a kill
    # between them leaves mixed generations (e.g. codes encoded against
    # codebooks that never landed) that no rename can repair — the
    # snapshot is both the torn-retrain SIGNAL and the recovery corpus.
    # Vacuum REPORTS it and never deletes it; re-running the matching
    # retrain_*_index verb rebuilds every table consistently and drops
    # the snapshot itself.
    if spark.catalog.tableExists(f"{name}_retrain_tmp"):
        report["retrain_snapshots"].append(f"{name}_retrain_tmp")
    for suffix in corpus + aux + ("_tombstones", "_deferred"):
        t = f"{name}{suffix}"
        tmp_table = f"{t}__compact_tmp"
        # stranded tmp CATALOG entry from a crashed bucketed compaction
        if spark.catalog.tableExists(tmp_table):
            if spark.catalog.tableExists(t):
                # real table still live → tmp is debris
                loc = _table_location(spark, tmp_table)
                external = any(
                    r.data_type.strip().upper() == "EXTERNAL"
                    for r in spark.sql(
                        f"DESCRIBE FORMATTED {tmp_table}"
                    ).collect()
                    if r.col_name == "Type"
                )
                spark.sql(f"DROP TABLE {tmp_table}")
                report["dropped_tables"].append(tmp_table)
                if external and loc:
                    fs, jvm = _hadoop_fs(spark, loc)
                    p = jvm.org.apache.hadoop.fs.Path(loc)
                    if fs.exists(p):
                        fs.delete(p, True)
                        report["removed"].append(loc)
            else:
                # crash AFTER the old table/files were dropped: the tmp
                # copy is the only complete one — finish the swap
                spark.sql(f"ALTER TABLE {tmp_table} RENAME TO {t}")
                spark.catalog.refreshTable(t)
                report["completed_swaps"].append(t)
        # location-level artifacts
        if spark.catalog.tableExists(t):
            loc = _table_location(spark, t)
            if not loc:
                continue
            base = (
                loc[: -len("__compact")]
                if loc.endswith("__compact")
                else loc
            )
            live = loc
        elif path is not None:
            base = f"{path}/{name}{suffix}"
            live = None
        else:
            continue
        # dir-protocol artifacts (__compact_tmp / __compact_old):
        # the shared recovery verb (r13 — also public for sink dirs)
        sub = recover_compact_dir(spark, base, live=live)
        report["restored"].extend(sub["restored"])
        report["removed"].extend(sub["removed"])
        fs, jvm = _hadoop_fs(spark, base)
        P = jvm.org.apache.hadoop.fs.Path

        def _exists(p, fs=fs, P=P):
            return fs.exists(P(p))

        sib = f"{base}__compact"
        # both bucketed siblings present: catalog location arbitrates;
        # otherwise only an explicit prefer= does
        if _exists(base) and _exists(sib):
            if live is not None:
                stale = sib if live == base else base
                fs.delete(P(stale), True)
                report["removed"].append(stale)
            elif prefer is not None:
                stale = sib if prefer == "base" else base
                fs.delete(P(stale), True)
                report["removed"].append(stale)
            else:
                report["ambiguous"].append((base, sib))
    # lease-machinery debris the lease itself never revisits: a
    # writer crashed mid-REFRESH strands `<name>_lock.tmp` (the
    # rename-over's temp); a stealer crashed mid-CLAIM strands
    # `<name>_lock.steal.<app>` (r13).  Vacuum HOLDS the lease here,
    # so no rival refresh is in flight; a rival's in-flight steal
    # losing its claim file mid-protocol fails closed (its
    # verify-read misses -> IndexLeaseHeld), never double-acquires.
    site = _lease_site(spark, name, path)
    fs, jvm = _hadoop_fs(spark, site)
    P = jvm.org.apache.hadoop.fs.Path
    lock_tmp = f"{site}.tmp"
    if fs.exists(P(lock_tmp)):
        fs.delete(P(lock_tmp), False)
        report["removed"].append(lock_tmp)
    for st in fs.globStatus(P(f"{site}.steal.*")) or []:
        sp = st.getPath()
        fs.delete(sp, False)
        report["removed"].append(sp.toString())
    # append-INTENT markers (r14, similarity._begin_guarded_append):
    # `_append_intent_<batch>` in the _batches dir.  One whose batch id
    # already sits in the replay log is debris (crash between the log
    # row and the marker delete) → removed.  One whose batch is NOT yet
    # logged marks a crashed half-append whose replay will RESUME
    # through it — deleting it would re-open the double-append window,
    # so vacuum only REPORTS it (the retrain-snapshot discipline).
    report["pending_appends"] = []
    bt = f"{name}_batches"
    bloc = _table_location(spark, bt) if spark.catalog.tableExists(
        bt
    ) else None
    if bloc is not None:
        # refresh first: a stale in-session relation cache would miss
        # freshly-logged batch ids and misreport their (deletable)
        # debris markers as pending (r14 ADVICE) — deletion stays
        # correct either way, but the report must not cry wolf
        spark.catalog.refreshTable(bt)
        applied = {
            r["batch_id"] for r in spark.table(bt).collect()
        }
        bfs, bjvm = _hadoop_fs(spark, bloc)
        BP = bjvm.org.apache.hadoop.fs.Path
        for st in bfs.globStatus(BP(f"{bloc}/_append_intent_*")) or []:
            sp = st.getPath()
            try:
                bid = int(sp.getName().rsplit("_", 1)[-1])
            except ValueError:
                continue
            if bid in applied:
                bfs.delete(sp, False)
                report["removed"].append(sp.toString())
            else:
                report["pending_appends"].append(sp.toString())
    # ORPHANED managed locations (r15): a table directory in the
    # warehouse with no catalog entry — an interrupted writer's (or a
    # dead session's) debris that silently blocks the next managed
    # CREATE of the same name with "location already exists".  REPORT
    # only (the pending-appends/retrain-snapshot discipline: vacuum
    # never deletes data it cannot attribute — the dir may be the only
    # surviving copy of a crashed build); force_drop_table is the
    # explicit destruction verb.  Exact suffixes of THIS family only
    # (the sibling-index lesson).  External ``path=`` indexes keep
    # their files at the root by design — not orphans.
    report["orphaned_locations"] = []
    if path is None:
        from hadoop_logfile_inputformat_spark.operators.tables import (
            managed_table_location,
        )

        for suffix in corpus + aux + ("_tombstones", "_deferred"):
            t = f"{name}{suffix}"
            if spark.catalog.tableExists(t):
                continue
            # db-aware resolution shared with clear_orphaned_table
            # (r15 ADVICE: the bare {warehouse}/{table} guess missed
            # real orphans under a non-default db's {db}.db/ prefix
            # and could report an unrelated same-named root directory)
            loc = managed_table_location(spark, t)
            ofs, ojvm = _hadoop_fs(spark, loc)
            if ofs.exists(ojvm.org.apache.hadoop.fs.Path(loc)):
                report["orphaned_locations"].append(loc)
    return report
