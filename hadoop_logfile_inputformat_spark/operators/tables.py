"""Parquet table access for the driver's TPC-H-ish testdata.

One place to attach scan-level scale decisions: every query goes
through ``load`` so column pruning and filter pushdown reach the
parquet reader (verify with ``.explain``: ``PushedFilters`` /
``ReadSchema``), and small dimensions are tagged for broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimensions small enough to broadcast at ANY scale factor (they grow
#: sublinearly or are bounded: 5 regions, 25 nations).  customer/part/
#: supplier grow with SF — those are broadcast per-query only when the
#: filtered side is provably small, otherwise left to AQE.
ALWAYS_BROADCAST = {"region", "nation"}

#: Tables feeding compute-dense per-row operators — see ``load``.
COMPUTE_HEAVY = {"documents", "embeddings"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects
        # outright; read it as raw nanos and downcast to a micros
        # timestamp (Spark's native precision). Session-level conf, set
        # lazily so it works under any caller-provided SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    if name in COMPUTE_HEAVY:
        # documents/embeddings feed compute-dense per-row operators
        # (shingling, 32-way hashing, vector math).  A small corpus in
        # one parquet file would otherwise pin that work to ONE task;
        # fan it out to the cluster.  Guarded so it never adds a
        # shuffle when the scan is already parallel (the 100 TB case).
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, target // 2):
            df = df.repartition(target)
    if name in ALWAYS_BROADCAST:
        return F.broadcast(df)
    return df
