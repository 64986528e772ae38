"""Bucketed-table support: shuffle-free co-located fact joins.

The biggest repeated cost in the relational surface is the
orders⋈lineitem shuffle on orderkey.  Writing both facts bucketed by
the join key makes every subsequent join on that key exchange-free:
Spark reads matching buckets pairwise and sort-merge joins in place.
At 100 TB this converts an O(data) network shuffle per query into a
one-time layout decision at ingest.

``write_bucketed`` is the ingest-side helper; ``bucketed`` reads a
bucketed table back.  The plan property (no Exchange above either scan
of a bucketed join) is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by ``key``.  Sorting within buckets lets the
    sort-merge join skip its sort as well."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planned
    without any Exchange when bucket counts match."""
    return bucketed(spark, left_table).join(bucketed(spark, right_table), on)
