"""Deterministic train/validation/test splitting for corpus curation.

A training-data pipeline needs document-level splits that are (a)
stable across runs and engines — re-running assignment must never move
a document between splits, or eval sets silently leak into training —
and (b) computable without any shuffle at 100 TB.  Both follow from
hashing the document KEY rather than sampling: ``md5`` is identical in
Spark and DuckDB (and everywhere else), so the assignment is a pure
per-row projection — embarrassingly parallel, no state, no seed file —
and the oracle can recompute it exactly.

Bucketing: the first 4 hex chars of ``md5(cast(doc_id as string))``
give 16 bits (65536 buckets) — granular enough to hit split weights
within ±0.4% on large corpora while keeping the hex→int conversion in
32-bit-safe territory in every engine.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.tables import load

#: (name, cumulative upper bound in per-mille of bucket space).
DEFAULT_SPLITS: Tuple[Tuple[str, int], ...] = (
    ("train", 800),
    ("val", 900),
    ("test", 1000),
)


def split_bucket(key_col) -> "F.Column":
    """0..999 bucket from a portable hash of ``key_col``.

    ``conv(substr(md5(k), 1, 4), 16, 10) % 1000`` — identical value in
    DuckDB as ``CAST('0x' || substr(md5(k), 1, 4) AS INT) % 1000``.
    """
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 1000
    )


def assign_split(
    df: DataFrame,
    key: str = "doc_id",
    splits: Sequence[Tuple[str, int]] = DEFAULT_SPLITS,
) -> DataFrame:
    """Add ``bucket`` (0..999) and ``split`` columns keyed on ``key``."""
    bucket = split_bucket(F.col(key))
    expr = None
    for name, hi in splits:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("bucket", bucket).withColumn("split", expr)


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-document split assignment over ``documents``.

    Shuffle-free per-row projection; rides in ``distribution_stats_pack``
    (tag ``corpus_split``) with the per-doc assignment fully
    value-hashed against the DuckDB recomputation.
    """
    d = load(spark, sf_dir, "documents")
    return assign_split(d.select("doc_id")).select(
        "doc_id", "split", F.col("bucket").cast("long").alias("bucket")
    )


N_SHARDS = 8


def _hash60(prefix: str, key_col) -> "F.Column":
    """60-bit portable hash of ``prefix || key`` (engine-identical:
    DuckDB spells it ``('0x' || substr(md5(...), 1, 15))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def shard_corpus(
    spark: SparkSession, sf_dir: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Deterministic training-shard assignment with pseudo-random
    intra-shard order: ``(doc_id, shard, pos)``.

    The step after packing in a training-data pipeline: data loaders
    consume N shards, each in an order that must be (a) pseudo-random —
    adjacent source documents must not stay adjacent in training — and
    (b) reproducible across runs/engines without a global sort or a
    seed file.  Both come from hashing the document key twice with
    independent salts: ``shard`` is a bucket of one hash, ``pos`` ranks
    a second, independent hash within the shard.

    Scale shape: one hash-partition shuffle on ``shard`` plus a
    partition-local sort; each window group is one shard ≈ |corpus| /
    ``n_shards`` rows.  Production picks ``n_shards`` in the thousands
    (loader parallelism), so groups stay bounded; the 100 TB variant of
    a *global* pseudo-random order is exactly this with pos read
    shard-major — no single-task sort anywhere.
    """
    d = load(spark, sf_dir, "documents").select("doc_id")
    shard = (_hash60("shard|", F.col("doc_id")) % n_shards).alias("shard")
    okey = _hash60("order|", F.col("doc_id"))
    keyed = d.select("doc_id", shard, okey.alias("okey"))
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
