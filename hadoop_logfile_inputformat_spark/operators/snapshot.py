"""Snapshot diffing: content drift between two corpus versions.

A recurring ingestion (re-crawl, nightly dump, upstream refresh) needs
to answer "what changed since the last snapshot?" before deciding what
to re-process — re-running dedup/quality/packing over 100 TB because
0.1% of documents moved is the failure mode this audit prevents.

``snapshot_diff`` is the generic frame-level operator; the registry
query derives two deterministic snapshot views from the ``documents``
fixture so the whole audit is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.tables import load


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content: str = "text",
) -> DataFrame:
    """(key, status, old_md5, new_md5) per document across snapshots;
    ``status`` ∈ added / removed / changed / unchanged.

    Scale shape: each side reduces to (key, md5) — 2 narrow columns
    regardless of document size — then ONE full-outer hash join on
    the key.  Both sides shuffle once and co-partition; there is no
    content comparison across the wire, only 32-byte digests.  At
    100 TB the md5 projection runs at parquet-scan speed and the join
    moves |keys| rows, so the audit costs two scans + one shuffle.
    """
    o = old.select(
        F.col(key).alias(key),
        F.md5(F.col(content)).alias("old_md5"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias(key),
        F.md5(F.col(content)).alias("new_md5"),
        F.lit(1).alias("_in_new"),
    )
    # Presence comes from the join flags, NOT from digest NULL-ness:
    # md5(NULL content) is NULL, and deriving status from it would
    # report a doc with NULL text as perpetually 'added' (re-entering
    # the delta every refresh) or a doc whose fetch failed as
    # 'removed' while it still exists.  Digest comparison is
    # null-safe for the same reason.
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(~F.col("old_md5").eqNullSafe(F.col("new_md5")), "changed")
        .otherwise("unchanged")
    )
    return o.join(n, key, "full_outer").select(
        key, status.alias("status"), "old_md5", "new_md5"
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: diff two deterministic snapshot views of the
    ``documents`` table, exercising all four statuses.

    The "old" snapshot lacks ``doc_id % 97 == 3`` (those appear as
    added) and carries prefixed text for ``doc_id % 89 == 0`` (those
    appear as changed); the "new" snapshot lacks ``doc_id % 93 == 5``
    (those appear as removed).  Both derivations are pure projections
    the oracle replays exactly.  The synthetic change is a prefix
    concat — NOT ``reverse``, whose semantics differ cross-engine on
    non-ASCII text (Spark reverses UTF-16 code units and can split
    surrogate pairs; DuckDB reverses grapheme clusters).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 97 != 3).select(
        "doc_id",
        F.when(F.col("doc_id") % 89 == 0, F.concat(F.lit("X|"), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = d.filter(F.col("doc_id") % 93 != 5)
    return snapshot_diff(old, new)
