"""Corpus publication: the final write of a curated training corpus.

A training job consumes the corpus as hive-partitioned parquet — one
directory per (split, ...) partition, file sizes bounded so loader
workers parallelize evenly, plus a row-count manifest the consumer can
verify against before training starts (the cheap guard against a
partially-published corpus).  ``write_corpus`` produces exactly that
layout; ``verify_manifest`` re-counts a published corpus against its
manifest.

Scale shape: the write is one hive-partitioned parquet job —
``repartition(partition cols)`` co-locates each output partition's
rows so every directory is written by the tasks that own its data
(without it, every task holds a writer per partition — the
many-small-files failure at 1000 executors), and
``maxRecordsPerFile`` bounds file size task-side with no extra
shuffle.  The manifest is one small aggregate over the same frame.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_DIR = "_manifest"


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("split",),
    sort_by: Sequence[str] = ("doc_id",),
    max_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Publish ``df`` as hive-partitioned parquet plus a manifest.

    - ``partition_by``: hive layout keys (``split=train/...``).
    - ``sort_by``: within-file ordering (``sortWithinPartitions``) —
      deterministic file contents and better column compression for
      id-clustered corpora; no global sort is ever planned.
    - ``max_records_per_file``: upper-bounds file row count so one fat
      partition still yields loader-parallel files.

    Returns the manifest DataFrame ``(partition cols..., n_rows)`` —
    also written under ``<path>/_manifest`` as single-file parquet
    (it is one row per partition, by construction tiny).
    """
    pcols = list(partition_by)
    (
        df.repartition(*[F.col(c) for c in pcols])
        .sortWithinPartitions(*pcols, *sort_by)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*pcols)
        .parquet(path)
    )
    manifest = df.groupBy(*pcols).agg(F.count("*").alias("n_rows"))
    (
        manifest.coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, MANIFEST_DIR))
    )
    return manifest


def verify_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Re-count a published corpus against its manifest.

    Returns ``(partition cols..., n_rows, manifest_rows, ok)`` — a
    consumer gates on ``ok`` for every expected partition before
    training.  Reading the data back costs one partition-pruned count
    aggregate; the manifest side is a single tiny file.
    """
    manifest = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    pcols = [c for c in manifest.columns if c != "n_rows"]
    data = spark.read.parquet(path)
    counts = data.groupBy(*pcols).agg(F.count("*").alias("actual_rows"))
    return (
        manifest.withColumnRenamed("n_rows", "manifest_rows")
        .join(counts, pcols, "full_outer")
        .select(
            *pcols,
            F.coalesce("actual_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("manifest_rows", F.lit(0)).alias("manifest_rows"),
            (
                F.coalesce("actual_rows", F.lit(0))
                == F.coalesce("manifest_rows", F.lit(0))
            ).alias("ok"),
        )
    )
