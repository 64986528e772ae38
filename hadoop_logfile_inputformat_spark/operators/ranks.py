"""Distributed global ranking — the scale-path replacement for
``Window.orderBy(...)`` with no ``partitionBy``.

A window over a global order forces every row into ONE partition
(Spark even warns: "No Partition Defined for Window operation").  Fine
at sf0.1, a one-task bottleneck at 100 TB.  The classic MPP alternative
implemented here:

1. ``repartitionByRange`` on the sort keys — the range shuffle gives
   partition *p* strictly smaller keys than partition *p+1*;
2. partition-local row number (each task sorts only its slice — via
   the ``monotonically_increasing_id`` encoding, NOT a window over
   ``spark_partition_id()``, which would re-shuffle the data a second
   time; see :func:`_with_partition_rank`);
3. global row number = local row number + the total count of all
   earlier partitions.  The per-partition counts are a ≤#partitions-row
   DataFrame; offsets come from a broadcast theta self-join, so NO
   single-partition exchange touches data-sized input anywhere.

Exact NTILE / percent_rank / cume_dist then follow arithmetically from
the global row number and total count, reproducing SQL semantics
bit-for-bit when the ordering is total (callers tie-break, e.g. on the
primary key):

- ``ntile(b)``: first ``n mod b`` buckets get ``ceil(n/b)`` rows, the
  rest ``floor(n/b)``;
- with a total order rank == row_number, so
  ``percent_rank = (rn-1)/(n-1)`` and ``cume_dist = rn/n``.

The reference has no window operators at all (SURVEY.md §2.5); this
module exists so the extension surface's ranking queries hold the same
shape at 1000 executors that they show at local[32].
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_MID = "__rank_mid"
_LRN = "__rank_local_rn"
_OFF = "__rank_offset"
_CNT = "__rank_count"
_TOT = "__rank_total"


def _with_partition_rank(part: DataFrame, cols: Sequence[Column]) -> DataFrame:
    """``(…, _PID, _LRN)`` — partition id and 1-based LOCAL row number
    under ``cols`` — via the ``monotonically_increasing_id`` encoding
    (``pid·2³³ + local_index``, computed AFTER an intra-partition sort)
    instead of ``row_number() OVER (PARTITION BY spark_partition_id())``.

    The window form forces Catalyst to insert ``Exchange
    hashpartitioning(_PID)`` — a DATA-SIZED shuffle that is
    semantically a no-op (rows are already grouped by their own
    partition id, but the optimizer cannot know that) — plus a second
    sort.  The mid encoding keeps everything in the range-shuffle's
    map task: Sort → Project, one data shuffle total instead of two
    (guide §2.1: remove shuffles outright).  The nondeterministic
    ``monotonically_increasing_id`` also pins the Sort below it
    (EliminateSorts cannot reorder across nondeterministic
    projections), so the local ordering the ids encode is exactly
    ``cols`` — verified bit-identical to the windowed form and pinned
    by tests/test_rank_suite plan + value asserts.

    Bound: the encoding reserves 33 bits for the per-partition record
    index — a single range partition past 2³³ (~8.6B) rows silently
    overflows into the pid bits and corrupts both _PID and _LRN.
    Callers size ``num_partitions`` so no range approaches that (see
    SCALING.md's rank note; the windowed form it replaced overflowed
    at 2³¹ anyway).
    """
    return (
        part.sortWithinPartitions(*cols)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftrightunsigned(F.col(_MID), 33))
        .withColumn(
            _LRN,
            F.col(_MID)
            - F.shiftleft(F.shiftrightunsigned(F.col(_MID), 33), 33)
            + F.lit(1),
        )
        .drop(_MID)
    )


def with_global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    rn_col: str = "rn",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number under ``order_by`` without a
    single-partition sort.

    ``order_by`` must define a TOTAL order (add a unique tie-break key)
    for the row numbering to be deterministic.  When ``total_col`` is
    given, the total row count is attached as a column too (a one-row
    free ride on the offsets join — no extra pass).
    """
    cols = list(order_by)
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    local = _with_partition_rank(part, cols)
    counts = local.groupBy(_PID).agg(F.count("*").alias(_CNT))
    a, b = counts.alias("a"), counts.alias("b")
    # offset(p) = Σ counts of partitions before p; total = Σ all counts.
    # Broadcast theta join over a ≤#partitions-row input: bounded work,
    # and crucially no Exchange SinglePartition over data-sized input.
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID), F.col(f"a.{_CNT}").alias(_CNT))
        .agg(F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF))
    )
    totals = offsets.groupBy().agg(F.max(F.col(_OFF) + F.col(_CNT)).alias(_TOT))
    offsets = offsets.join(F.broadcast(totals), how="cross")
    out = local.join(F.broadcast(offsets), _PID).withColumn(
        rn_col, F.col(_LRN) + F.col(_OFF)
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOT))
    return out.drop(_PID, _LRN, _OFF, _CNT, _TOT)


def with_global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an INCLUSIVE global running sum of ``value_col`` under
    ``order_by`` without a single-partition sort.

    Same two-phase shape as :func:`with_global_row_number`, with the
    per-partition COUNT replaced by the per-partition SUM of
    ``value_col``: range-shuffle on the order keys, partition-local
    cumulative sum, then add the broadcast sum of all earlier
    partitions.  ``order_by`` must be a total order for determinism.
    """
    cols = list(order_by)
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    local = part.withColumn(_PID, F.spark_partition_id()).withColumn(
        _LRN,
        F.sum(value_col).over(
            Window.partitionBy(_PID)
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sums = local.groupBy(_PID).agg(F.sum(value_col).alias(_CNT))
    a, b = sums.alias("a"), sums.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID), F.col(f"a.{_CNT}").alias(_CNT))
        .agg(F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF))
    )
    out = local.join(F.broadcast(offsets), _PID).withColumn(
        cum_col, F.col(_LRN) + F.col(_OFF)
    )
    return out.drop(_PID, _LRN, _OFF, _CNT)


def ntile_from_rank(rn: Column, total: Column, buckets: int) -> Column:
    """Exact SQL ``NTILE(buckets)`` from a global row number.

    SQL semantics: the first ``total mod buckets`` buckets hold
    ``ceil(total/buckets)`` rows, the remaining ones
    ``floor(total/buckets)``.
    """
    b = F.lit(buckets)
    q = (total / b).cast("long")  # floor(total / buckets)
    rem = total % b
    big = q + 1  # size of the first `rem` buckets
    boundary = big * rem  # rows living in big buckets
    return (
        F.when(rn <= boundary, F.ceil(rn / big))
        .otherwise(rem + F.ceil((rn - boundary) / q))
        .cast("int")
    )


def percent_rank_from_rank(rn: Column, total: Column) -> Column:
    """``percent_rank()`` under a TOTAL order (rank == row_number):
    ``(rn - 1) / (n - 1)`` (0.0 for a single-row input, per SQL)."""
    return F.when(total == 1, F.lit(0.0)).otherwise(
        (rn - F.lit(1)).cast("double") / (total - F.lit(1)).cast("double")
    )


def cume_dist_from_rank(rn: Column, total: Column) -> Column:
    """``cume_dist()`` under a TOTAL order: ``rn / n``."""
    return rn.cast("double") / total.cast("double")
