"""Streaming transformation pipelines: watermarked windows,
sessionization, bounded-state dedup, and stream joins over an event
stream.

Streaming twins of the batch operators (``q_events_hourly`` /
``q_events_sessionize`` / ``dedup_exact`` / ``asof_purchase_last_click``)
— same logic, expressed over an unbounded source with late-data
handling and provably bounded state.  Tested in
``tests/test_streaming.py`` with a file source feeding deterministic
events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.tables import local_df


def events_hourly_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data bound.

    State is dropped once the watermark passes a window's end — bounded
    state at any input volume.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    the key's state once the watermark passes its last-seen event time —
    the streaming twin of ``dedup.exact_dedup``.  With plain
    ``dropDuplicates`` the key set grows forever; the watermarked form
    is the only shape that survives an unbounded stream.  Duplicates
    arriving farther apart than the watermark delay are NOT caught —
    that is the documented trade for bounded state; run the batch
    exact dedup over the sink for a full pass.
    """
    keys = keys or ["user_id", "event_type", "value"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def purchases_joined_to_clicks_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks at most ``horizon`` before it.

    The streaming twin of the batch as-of join
    (``relational_ext.asof_purchase_last_click``), with the one-match
    relaxation streams require: an as-of "latest click only" needs the
    full click history per user (unbounded state), while the interval
    form lets Spark expire any click older than watermark+horizon.
    Both sides carry watermarks and the join condition bounds event
    time on both ends, so state is provably bounded — the planner
    rejects the query otherwise.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("user_id", "purchase_ts", "click_ts", "click_value")


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment.

    The static side re-resolves per micro-batch (a dim refresh is
    picked up without restarting the query) and broadcasts, so the
    stream side never shuffles — the standard shape for attaching
    bounded reference data to an unbounded stream.
    """
    from pyspark.sql.functions import broadcast

    return events.join(broadcast(dim), "user_id", "left")


def near_dup_stream_batch(
    batch_docs: DataFrame,
    index_name: str,
    pairs_sink: str,
    batch_id: int,
    threshold: float | None = None,
    hash_fn: str = "xxhash64",
    update_index: bool = True,
) -> None:
    """Process ONE micro-batch of documents against the persisted LSH
    index: write near-dup pairs under ``pairs_sink``, then append the
    batch's own banding/shingle rows to the index tables so the NEXT
    batch dedups against this one too (a self-maintaining index).

    This is the ``foreachBatch`` body of :func:`near_dup_stream`,
    exposed separately so batch replays/backfills and tests can drive
    it with static frames.  Per batch the work is O(batch) signatures
    plus index probes — the corpus is never recomputed (same contract
    as ``dedup.incremental_near_dups``; pairs WITHIN one micro-batch
    are out of scope, run the batch operator over the sink for those).

    Idempotence under foreachBatch's at-least-once replay:

    - pairs land in ``pairs_sink/batch_id=<id>`` with OVERWRITE, so a
      replayed batch rewrites its own partition instead of appending
      duplicates;
    - the index append is guarded by a ``<index>_batches`` bookkeeping
      table of applied batch ids — a replay skips the append — and the
      crash window BETWEEN the index append and the bookkeeping write
      is closed by the append-INTENT marker (r14, shared with the
      vector appends — ``similarity._begin_guarded_append``): a replay
      that finds the marker re-checks each table for this batch's rows
      and skips the ones that already landed, so neither duplicate
      banding rows nor duplicate shingle-set rows can arise.
    """
    from hadoop_logfile_inputformat_spark.operators import dedup

    spark = batch_docs.sparkSession
    kwargs = {} if threshold is None else {"threshold": threshold}
    pairs = dedup.incremental_near_dups(
        spark, batch_docs, index_name, hash_fn=hash_fn, **kwargs
    )
    pairs.write.mode("overwrite").parquet(f"{pairs_sink}/batch_id={batch_id}")
    if not update_index:
        return
    from hadoop_logfile_inputformat_spark.operators.similarity import (
        _begin_guarded_append,
        _delta_missing_from,
        _finish_guarded_append,
    )

    log = f"{index_name}_batches"  # part of the index triple (build_minhash_index)
    if spark.table(log).filter(F.col("batch_id") == batch_id).count() > 0:
        _finish_guarded_append(spark, index_name, batch_id)  # debris
        return  # replayed batch: index rows already applied
    # re-appending a doc_id with a PENDING takedown tombstone is the
    # one append the lifecycle contract excludes — fail the batch fast
    # rather than write rows the probes silently hide
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        check_index_lease,
    )

    check_index_lease(spark, index_name)
    recovering = _begin_guarded_append(spark, index_name, batch_id)
    dedup._reject_tombstoned_docs(spark, index_name, batch_docs)
    # out-of-order takedowns (a takedown stream racing ahead of this
    # ingest) consume here: the victim doc never joins the INDEX (the
    # pairs sink above is the caller's batch output and is unaffected).
    # The hit retires only after the bookkeeping row lands, so a crash
    # mid-append replays with the delete intent intact.
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        deferred_split,
        retire_deferred,
    )

    batch_docs, _dhit = deferred_split(
        spark, index_name, batch_docs, "doc_id"
    )
    from hadoop_logfile_inputformat_spark.operators.tables import scoped_persist

    # same key as incremental_near_dups uses internally, so the probe
    # above and this append share ONE cached shingle-set frame
    sets = scoped_persist(
        dedup._shingle_sets(batch_docs), ("incr_delta_sets", index_name)
    )
    bands = dedup._band_buckets(
        dedup._signatures_from_sets(sets, hash_fn), hash_fn
    )
    # insertInto applies the catalog table's bucket spec, so the
    # appended files keep the index's no-shuffle probe property
    from hadoop_logfile_inputformat_spark.operators.similarity import (
        _bucket_aligned,
    )

    if not recovering or _delta_missing_from(
        spark, f"{index_name}_buckets", sets, "doc_id"
    ):
        _bucket_aligned(
            spark, bands, f"{index_name}_buckets", "band", "bucket"
        ).write.mode("append").insertInto(f"{index_name}_buckets")
    if not recovering or _delta_missing_from(
        spark, f"{index_name}_sets", sets, "doc_id"
    ):
        _bucket_aligned(
            spark, sets, f"{index_name}_sets", "doc_id"
        ).write.mode("append").insertInto(f"{index_name}_sets")
    local_df(spark, [(batch_id,)], "batch_id BIGINT").write.mode(
        "append"
    ).insertInto(log)
    _finish_guarded_append(spark, index_name, batch_id)
    retire_deferred(spark, index_name, _dhit, "doc_id")


#: Default compaction cadence for the streaming index pipelines: every
#: N applied batches the index tables are rewritten back to their
#: target bucket count.  Each micro-batch append adds ``n_buckets``
#: files per index table, so without maintenance a long-running stream
#: degrades every probe into an O(batches x buckets)-file scan; with
#: it the file count is bounded by O((N + 1) x buckets).
COMPACT_EVERY = 16


def _maybe_compact(spark, index_name: str, batch_id: int, every, fn) -> None:
    """Run index compaction every ``every`` APPLIED batches (skipped on
    replays: the bookkeeping row for ``batch_id`` is written before
    this runs, so the count grows once per distinct batch).  Compaction
    itself is idempotent/crash-safe (tmp-table swap in maintenance.py),
    so a crash mid-compact at worst leaves the pre-compact files."""
    if not every:
        return
    n = spark.table(f"{index_name}_batches").count()
    if n and n % every == 0:
        fn(spark, index_name)


def near_dup_stream(
    docs: DataFrame,
    index_name: str,
    pairs_sink: str,
    checkpoint: str,
    threshold: float | None = None,
    hash_fn: str = "xxhash64",
    update_index: bool = True,
    compact_every: int | None = COMPACT_EVERY,
):
    """Streaming incremental deduplication: each arriving micro-batch
    of documents is probed against (and appended to) the persisted LSH
    index built by ``dedup.build_minhash_index``.

    The LSH probe needs multi-stage joins and a catalog-table append —
    shapes Structured Streaming cannot express natively — so this is a
    ``foreachBatch`` pipeline, made effectively-once by per-batch
    overwrite partitions and the index bookkeeping table (see
    :func:`near_dup_stream_batch`).  Returns the started
    ``StreamingQuery``.

    Index maintenance is part of the lifecycle: every ``compact_every``
    applied batches the buckets/sets tables are rewritten back to their
    bucket count (``maintenance.compact_minhash_index``), bounding the
    per-probe file fan-in of a long-running stream at
    O(compact_every x buckets) instead of O(batches x buckets).  The
    compacting batch pays the rewrite inline (one corpus-sized index
    scan); pass ``None`` to disable and run maintenance out-of-band.
    """
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_minhash_index,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        near_dup_stream_batch(
            batch_df,
            index_name,
            pairs_sink,
            batch_id,
            threshold=threshold,
            hash_fn=hash_fn,
            update_index=update_index,
        )
        if update_index:
            _maybe_compact(
                batch_df.sparkSession,
                index_name,
                batch_id,
                compact_every,
                compact_minhash_index,
            )

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def curate_stream_batch(
    batch_docs: DataFrame,
    index_name: str,
    corpus_sink: str,
    batch_id: int,
) -> None:
    """Gate + exact-dedup ONE micro-batch of documents and append the
    survivors to the corpus sink: quality and Gopher rule gates
    (stateless per-row projections), within-batch exact dedup (lowest
    doc_id survives), then an anti-join against the persisted
    ``build_exact_index`` hash table so re-submitted content never
    re-enters the corpus.  New hashes append to the index under the
    same replay-log guard as :func:`near_dup_stream_batch`; survivors
    land in ``corpus_sink/batch_id=<id>`` with OVERWRITE, so a
    replayed batch rewrites its own partition (effectively-once).

    Per batch the work is O(batch) projections plus one bucketed
    anti-join probe — the standing corpus is never rescanned.
    """
    from hadoop_logfile_inputformat_spark.operators import text as T

    spark = batch_docs.sparkSession
    flags = (
        T.quality_flags(batch_docs).select("doc_id", "quality_keep")
        .join(T.gopher_flags(batch_docs).select("doc_id", "gopher_keep"), "doc_id")
    )
    gated = (
        batch_docs.join(flags, "doc_id")
        .filter((F.col("quality_keep") == 1) & (F.col("gopher_keep") == 1))
        .drop("quality_keep", "gopher_keep")
        .withColumn("text_hash", F.sha2(F.col("text"), 256))
    )
    # within-batch exact dedup, deterministic survivor (lowest doc_id)
    gated = (
        gated.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("text_hash").orderBy("doc_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # exclude this batch's OWN prior contribution: a replay then
    # reproduces the identical survivor set (the overwrite below stays
    # idempotent) instead of anti-joining against itself to empty.
    # Refresh first (the _refresh_index_relations discipline): the
    # index is mutated across sessions and a stale file listing for
    # the reused location fails the probe with FILE_NOT_EXIST (r15).
    from hadoop_logfile_inputformat_spark.operators.similarity import (
        _refresh_index_relations,
    )

    _refresh_index_relations(
        spark, index_name, "_hashes", "_tombstones"
    )
    seen = (
        spark.table(f"{index_name}_hashes")
        .filter(F.col("batch_id") != batch_id)
    )
    # pending takedowns (dedup.delete_from_dedup_index): a deleted
    # document's content hash must stop blocking re-ingestion — the
    # probe sees the index as if it never held the victims (broadcast;
    # the set is bounded by compaction cadence)
    from hadoop_logfile_inputformat_spark.operators.dedup import (
        _doc_tombstones,
    )

    tombs = _doc_tombstones(spark, index_name)
    if tombs is not None:
        seen = seen.join(F.broadcast(tombs), "doc_id", "left_anti")
    seen = seen.select("text_hash")
    fresh = gated.join(seen, "text_hash", "left_anti")
    fresh.drop("text_hash").write.mode("overwrite").parquet(
        f"{corpus_sink}/batch_id={batch_id}"
    )
    from hadoop_logfile_inputformat_spark.operators.similarity import (
        _begin_guarded_append,
        _finish_guarded_append,
    )

    log = f"{index_name}_batches"
    if spark.table(log).filter(F.col("batch_id") == batch_id).count() > 0:
        _finish_guarded_append(spark, index_name, batch_id)  # debris
        return  # replayed batch: hashes already applied
    # doc_id reuse under a PENDING tombstone would append a hash row
    # the probes exclude AND the next compaction fold deletes — fail
    # fast instead (same contract as the LSH/embedding appends)
    from hadoop_logfile_inputformat_spark.operators.dedup import (
        _reject_tombstoned_docs,
    )

    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        check_index_lease,
    )

    check_index_lease(spark, index_name)
    recovering = _begin_guarded_append(spark, index_name, batch_id)
    _reject_tombstoned_docs(spark, index_name, fresh)
    # out-of-order takedowns: the victim's hash never joins the index
    # (so identical future content stays admissible — "the index never
    # held it"); the corpus sink above is the caller's batch output.
    # Retire after bookkeeping (crash-safe replay keeps the intent).
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        deferred_split,
        retire_deferred,
    )

    fresh, _dhit = deferred_split(spark, index_name, fresh, "doc_id")
    from hadoop_logfile_inputformat_spark.operators.similarity import (
        _bucket_aligned,
    )

    # recovery resume probe: the hash rows carry their batch_id, so
    # "did the crashed attempt's insert land" is one pruned filter
    spark.catalog.refreshTable(f"{index_name}_hashes")
    if not recovering or (
        spark.table(f"{index_name}_hashes")
        .filter(F.col("batch_id") == batch_id)
        .limit(1)
        .count()
        == 0
    ):
        _bucket_aligned(
            spark,
            fresh.select(
                "text_hash", "doc_id",
                F.lit(batch_id).cast("long").alias("batch_id"),
            ),
            f"{index_name}_hashes", "text_hash",
        ).write.mode("append").insertInto(f"{index_name}_hashes")
    local_df(spark, [(batch_id,)], "batch_id BIGINT").write.mode(
        "append"
    ).insertInto(log)
    _finish_guarded_append(spark, index_name, batch_id)
    retire_deferred(spark, index_name, _dhit, "doc_id")


def curate_stream(
    docs: DataFrame,
    index_name: str,
    corpus_sink: str,
    checkpoint: str,
    compact_every: int | None = COMPACT_EVERY,
):
    """Continuous corpus ingestion: documents arrive as a stream, pass
    the stateless quality gates, are exact-deduped within the batch and
    against the full ingestion history (persisted hash index — bounded
    per-batch work, unlike ``dropDuplicates``'s ever-growing state),
    and the survivors append to a partitioned corpus sink.  Returns the
    started ``StreamingQuery``; compose with :func:`near_dup_stream`
    on the sink for the approximate layer.

    Every ``compact_every`` applied batches the hash-index table is
    rewritten back to its bucket count
    (``maintenance.compact_exact_index``) so the anti-join probe's file
    fan-in stays O(compact_every x buckets) on a long-running stream;
    ``None`` disables inline maintenance.
    """
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_exact_index,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        curate_stream_batch(batch_df, index_name, corpus_sink, batch_id)
        _maybe_compact(
            batch_df.sparkSession,
            index_name,
            batch_id,
            compact_every,
            compact_exact_index,
        )

    return (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    silence (built-in ``session_window`` — the streaming analogue of
    the batch gaps-and-islands operator)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def embedding_index_stream_batch(
    batch_vectors: DataFrame,
    index_name: str,
    matches_sink: str,
    batch_id: int,
    k: int = 5,
    nprobe: int = 3,
    update_index: bool = True,
    family: str | None = None,
) -> None:
    """Process ONE micro-batch of new embeddings against a persisted
    vector index — ANY of the three embedding families (r13, was
    IVF-only): ``similarity.build_ivf_index`` /
    ``build_ivfpq_index`` / ``build_pq_index``, detected from the
    catalog (or pinned via ``family`` so a long-running stream pays
    the detection once).  Write each vector's top-k matches in the
    STANDING corpus under ``matches_sink``, then append the batch to
    the index so the next batch searches against this one too — the
    vector twin of :func:`near_dup_stream_batch`, with the same
    effectively-once protocol (per-batch overwrite partitions; the
    ``<index>_batches`` replay guard lives inside the append verbs).
    For a ROTATED (OPQ) PQ-family index the appends encode through
    the STORED rotation matrix (append == rebuild-with-that-rotation
    stays bit-equal — the batch contract, now exercised under
    streaming in tests/test_streaming.py).

    Matches are restricted to the PRE-BATCH corpus (the batch's own
    vec_ids are excluded from the candidate set BEFORE ranking, via
    ``ann_ivf_probe``'s ``exclude_ids``): within-batch pairs are out
    of scope exactly as in the LSH stream, and — the property that
    matters under replay — a batch whose index append already landed
    ranks against exactly the pre-batch corpus and reproduces the
    identical match set instead of seeing itself.

    Per batch: |batch| x |centroids| probe scoring + one bucketed
    lists join + delta-sized writes — the standing lists are never
    read beyond the probed buckets, never rewritten.
    """
    from hadoop_logfile_inputformat_spark.operators import similarity
    from hadoop_logfile_inputformat_spark.operators import maintenance as M

    spark = batch_vectors.sparkSession
    fam = family or M.index_family(spark, index_name)
    queries = batch_vectors.select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    excl = batch_vectors.select("vec_id")
    if fam == "ivf":
        matches = similarity.ann_ivf_probe(
            spark, queries, index_name, k=k, nprobe=nprobe,
            exclude_ids=excl,
        )
    elif fam == "ivfpq":
        matches = similarity.ann_ivfpq_probe(
            spark, queries, index_name, k=k, nprobe=nprobe,
            exclude_ids=excl,
        )
    elif fam == "pq":
        matches = similarity.ann_pq_probe(
            spark, queries, index_name, k=k, exclude_ids=excl
        )
    else:
        raise ValueError(
            f"'{index_name}' is a {fam!r} index — embedding_index_stream"
            " serves the ivf/ivfpq/pq families"
        )
    matches.write.mode("overwrite").parquet(
        f"{matches_sink}/batch_id={batch_id}"
    )
    if update_index:
        append = {
            "ivf": similarity.append_to_ivf_index,
            "ivfpq": similarity.append_to_ivfpq_index,
            "pq": similarity.append_to_pq_index,
        }[fam]
        append(spark, batch_vectors, index_name, batch_id=batch_id)


def embedding_index_stream(
    vectors: DataFrame,
    index_name: str,
    matches_sink: str,
    checkpoint: str,
    k: int = 5,
    nprobe: int = 3,
    update_index: bool = True,
    compact_every: int | None = COMPACT_EVERY,
    drift_threshold: float = 0.05,
    on_retrain=None,
):
    """Streaming incremental vector search: each arriving micro-batch
    of embeddings probes (and is appended to) the persisted vector
    index — any of the IVF / IVFPQ / flat-PQ families (r13, was
    IVF-only; family detected once at stream start) — the
    embedding-family counterpart of :func:`near_dup_stream`, built
    on the same foreachBatch + bookkeeping-table machinery.  Returns
    the started ``StreamingQuery``.

    Index maintenance mirrors the LSH stream: every ``compact_every``
    applied batches the corpus-sized tables are rewritten back to
    their bucket count (the family's ``maintenance.compact_*_index``
    verb), bounding probe file fan-in on a long-running stream.
    Additionally the ``_stats`` drift ledger is consulted after each
    applied batch (``similarity.ivf_index_drift`` — a bytes-sized
    driver read, family-aware): when appended batches quantize
    against the frozen model worse than ``drift_threshold`` below the
    seed corpus, ``on_retrain(drift)`` fires (once per crossing) so
    the operator owner can schedule the family's
    ``similarity.retrain_*_index`` out-of-band — the stream itself
    never retrains inline, because a model swap mid-stream would
    make in-flight probe results incomparable across one batch
    boundary.  A completed retrain resets the ledger, which re-arms
    the hook for the next crossing; for a ROTATED (OPQ) index the
    retrain re-learns the rotation and subsequent appends encode
    through the NEW stored matrix transparently.
    """
    from hadoop_logfile_inputformat_spark.operators import similarity
    from hadoop_logfile_inputformat_spark.operators import maintenance as M

    fam = M.index_family(vectors.sparkSession, index_name)
    if fam not in ("ivf", "ivfpq", "pq"):
        raise ValueError(
            f"'{index_name}' is a {fam!r} index — embedding_index_stream"
            " serves the ivf/ivfpq/pq families (use near_dup_stream /"
            " curate_stream for the text indexes)"
        )
    compact_fn = {
        "ivf": M.compact_ivf_index,
        "ivfpq": M.compact_ivfpq_index,
        "pq": M.compact_pq_index,
    }[fam]
    state = {"retrain_flagged": False}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        embedding_index_stream_batch(
            batch_df,
            index_name,
            matches_sink,
            batch_id,
            k=k,
            nprobe=nprobe,
            update_index=update_index,
            family=fam,
        )
        if not update_index:
            return
        spark = batch_df.sparkSession
        _maybe_compact(
            spark, index_name, batch_id, compact_every, compact_fn
        )
        drift = similarity.ivf_index_drift(
            spark, index_name, threshold=drift_threshold
        )
        if drift["retrain_recommended"] and not state["retrain_flagged"]:
            state["retrain_flagged"] = True
            if on_retrain is not None:
                on_retrain(drift)
        elif not drift["retrain_recommended"]:
            state["retrain_flagged"] = False

    return (
        vectors.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _index_kind(spark, name: str) -> tuple:
    """Resolve which index family ``name`` is, returning
    ``(id_col, delete_fn, compact_fn)`` — so the takedown stream works
    unchanged against every persisted index this package builds.
    Detection is ``maintenance.index_family`` (catalog table
    signature)."""
    from hadoop_logfile_inputformat_spark.operators import dedup, similarity
    from hadoop_logfile_inputformat_spark.operators import maintenance as M

    fam = M.index_family(spark, name)
    if fam in ("minhash_lsh", "exact_hash"):
        compact = (
            M.compact_minhash_index
            if fam == "minhash_lsh"
            else M.compact_exact_index
        )
        return "doc_id", dedup.delete_from_dedup_index, compact
    compact = {
        "ivf": M.compact_ivf_index,
        "ivfpq": M.compact_ivfpq_index,
        "pq": M.compact_pq_index,
    }[fam]
    return "vec_id", similarity.delete_from_index, compact


def takedown_stream_batch(
    batch_ids: DataFrame,
    index_name: str,
    batch_id: int,
    compact_at: int | None = None,
    audit_sink: str | None = None,
    state: dict | None = None,
) -> int:
    """Apply ONE micro-batch of takedown requests (a frame carrying the
    index family's id column — ``doc_id`` for the text indexes,
    ``vec_id`` for the embedding tiers) to the persisted index:
    tombstone the ids, then fold when the pending set has grown past
    ``compact_at``.  Returns the number of newly tombstoned ids.

    Replay safety needs NO bookkeeping table here: a re-delivered
    batch re-deletes ids that are already tombstoned (or already
    folded), which is an idempotent no-op by the delete verbs'
    contract — the one lifecycle verb where at-least-once is free.

    ``audit_sink`` writes the erasure trail a takedown pipeline owes
    its compliance owner: every REQUESTED id of the batch with its
    disposition — ``tombstoned`` (appended to the pending set this
    batch: hidden from probes from the next query on; a re-request
    whose earlier tombstone was already folded re-lands here, which is
    harmless and still truthful) or ``already_deleted`` (the id was
    already pending — an idempotent re-request) — to
    ``<audit_sink>/batch_id=<id>`` with OVERWRITE, so a replayed batch
    rewrites its own partition and the trail stays exactly-once even
    though a replay's dispositions differ from the original's.  A
    request for an id the index never ingested (takedown racing ahead
    of ingest) audits as ``deferred``: the intent is recorded in
    ``<name>_deferred`` and the matching append will drop the victim
    before it ever lands (see the delete verbs).

    ``state`` (a mutable dict the stream owns) carries the pending-
    tombstone count across batches so ``compact_at`` needs no per-batch
    ``count()`` job: seeded from one table count on the first batch,
    advanced by the delete verb's return, reset to 0 by a fold.
    Without it (bare batch-API calls) the count runs per call.
    """
    spark = batch_ids.sparkSession
    id_col, delete_fn, compact_fn = _index_kind(spark, index_name)
    requested = batch_ids.select(id_col).distinct()
    pending_before = None
    if audit_sink is not None:
        t = f"{index_name}_tombstones"
        pending_before = (
            spark.table(t).select(id_col).localCheckpoint(eager=True)
            if spark.catalog.tableExists(t)
            else None
        )
    n = delete_fn(spark, index_name, ids=requested)
    if audit_sink is not None:
        # newly tombstoned = requested minus what was already pending;
        # ids sitting in the deferred set were never ingested (the
        # delete verb recorded the intent for the append to consume);
        # everything else in the request is an idempotent re-request
        new_ids = requested
        if pending_before is not None:
            new_ids = requested.join(
                F.broadcast(pending_before), id_col, "left_anti"
            )
        audit = requested.join(
            F.broadcast(new_ids.withColumn("_new", F.lit(True))),
            id_col,
            "left",
        )
        dt = f"{index_name}_deferred"
        if spark.catalog.tableExists(dt):
            audit = audit.join(
                F.broadcast(
                    spark.table(dt)
                    .select(id_col)
                    .withColumn("_dfd", F.lit(True))
                ),
                id_col,
                "left",
            )
        else:
            audit = audit.withColumn("_dfd", F.lit(None).cast("boolean"))
        audit = audit.select(
            F.col(id_col).alias("id"),
            F.when(F.col("_dfd"), F.lit("deferred"))
            .when(F.col("_new"), F.lit("tombstoned"))
            .otherwise(F.lit("already_deleted"))
            .alias("disposition"),
        )
        audit.write.mode("overwrite").parquet(
            f"{audit_sink}/batch_id={batch_id}"
        )
    if compact_at:
        t = f"{index_name}_tombstones"
        if state is not None:
            # running counter: one seed count on the first batch, then
            # the delete verb's return advances it — no per-batch job
            if state.get("pending") is None:
                state["pending"] = (
                    spark.table(t).count()
                    if spark.catalog.tableExists(t)
                    else 0
                )
            else:
                state["pending"] += n
            pending = state["pending"]
        else:
            pending = (
                spark.table(t).count()
                if spark.catalog.tableExists(t)
                else 0
            )
        if pending >= compact_at:
            if not spark.catalog.tableExists(t):
                # FOREIGN FOLD: another actor (an ingest stream's
                # in-stream compaction in the same deployment) already
                # folded and dropped the tombstone table — the running
                # counter is stale-high.  Reseed, don't rewrite.
                if state is not None:
                    state["pending"] = 0
            else:
                if state is not None:
                    # cheap re-verify before the corpus-rewriting fold:
                    # one count per would-be fold (NOT per batch), only
                    # when the running counter crosses the threshold —
                    # catches a foreign fold that left the table
                    # recreated by this batch's own small append
                    spark.catalog.refreshTable(t)
                    actual = spark.table(t).count()
                    if actual < compact_at:
                        state["pending"] = actual  # reseed, skip fold
                        return n
                # the fold reclaims the rows and drops the tombstone
                # table; crash-safe (tmp-table swap) and idempotent
                # (re-folding an already-folded id removes nothing)
                compact_fn(spark, index_name)
                if state is not None:
                    state["pending"] = 0
    return n


def takedown_stream(
    requests: DataFrame,
    index_name: str,
    checkpoint: str,
    compact_at: int | None = 10_000,
    audit_sink: str | None = None,
):
    """Continuous takedown: deletion requests (GDPR erasure, DMCA,
    policy flags) arrive as a stream of ids and are tombstoned out of
    the persisted index as they land — the delete-side counterpart of
    :func:`near_dup_stream` / :func:`curate_stream` /
    :func:`embedding_index_stream`, completing the streaming lifecycle
    (ingest, search, takedown).  Works against EVERY index family this
    package persists (LSH triple, exact-hash, IVF, flat PQ, IVFPQ —
    resolved from the catalog signature).  Returns the started
    ``StreamingQuery``.

    Per batch the work is O(batch): a semi-join against pending
    tombstones plus a delta-sized append — probes begin excluding the
    victims at the NEXT query with no index rewrite on the takedown
    path.  ``compact_at`` bounds the pending set: when it exceeds this
    many ids the batch folds it into the index's compaction (physical
    reclaim), keeping the probe-side broadcast anti-join permanently
    small.  The measured worst case (SCALING.md, 10% of corpus
    pending) bounds any sane setting from far above.  ``audit_sink``
    adds the per-batch erasure trail (requested id → disposition) a
    compliance owner needs — see :func:`takedown_stream_batch`.

    Session caveat (shared with every in-stream compaction here): the
    fold runs in the stream's CLONED session, and Spark's relation
    cache is per-session — any OTHER session that read the index
    tables before a fold must ``spark.catalog.refreshTable`` them
    before its next probe, or its cached file listing points at the
    pre-fold files (see ``maintenance.compact_bucketed_table``).
    """

    # stream-lifetime pending counter (seeded once, advanced by each
    # batch's return) — replaces a per-batch tombstone count() job
    state: dict = {"pending": None}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        takedown_stream_batch(
            batch_df, index_name, batch_id,
            compact_at=compact_at, audit_sink=audit_sink, state=state,
        )

    return (
        requests.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
