"""Correctness packs: tagged unions of schema-aligned queries.

The driver's correctness gate consumes at most 50 registry keys per
round; the engine implements more distinct query shapes than that.  A
*pack* folds several member queries into ONE registry key without
losing any checking: each member's full result is projected onto a
generic ``(tag, k1..k3 string, v1..v6 double)`` schema and unioned, and
the DuckDB oracle applies the SAME projection to each member's oracle
SQL (wrapped as a subquery) — so every member row is still value-hashed
against the oracle, just under a shared key.

The member builders and their individual oracle SQL remain exported and
individually tested (tests/test_operators.py); packs are a reporting
shape, not a semantic merge.  A pack never mixes member *execution*:
``unionByName`` of independently-built DataFrames keeps each member's
physical plan (broadcasts, partial aggs, windows) exactly what it was
standalone — Spark unions are metadata-only, no shuffle.

Cross-engine cast rules (both sides apply the identical expression):
- key columns (``k*``): CAST to string.  Integers render identically in
  Spark and DuckDB; timestamps go through explicit ``date_format`` /
  ``strftime`` so no engine-default formatting is trusted.
- value columns (``v*``): CAST to double.  Members pre-round their
  doubles; BIGINT counts are exact in double far beyond these scales.
- absent columns: typed NULL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

KEY_COLS = ("k1", "k2", "k3")
VAL_COLS = ("v1", "v2", "v3", "v4", "v5", "v6")
GENERIC_COLS = KEY_COLS + VAL_COLS


@dataclass
class Member:
    """One query inside a pack.

    ``colmap`` maps a generic column to either a member output column
    name (used verbatim on both engines) or a ``(spark_expr, sql_expr)``
    pair when the two engines need different spellings (timestamp
    formatting being the only current case).
    """

    tag: str
    builder: Callable[[SparkSession, str], DataFrame]
    sql: str
    colmap: Dict[str, object] = field(default_factory=dict)

    def _exprs(self, generic: str) -> Tuple[str, str]:
        spec = self.colmap[generic]
        if isinstance(spec, tuple):
            return spec
        return spec, spec


def _ts(col: str) -> Tuple[str, str]:
    """Timestamp → string, spelled per engine (identical output)."""
    return (
        f"date_format({col}, 'yyyy-MM-dd HH:mm:ss')",
        f"strftime({col}, '%Y-%m-%d %H:%M:%S')",
    )


def pack_query(members: List[Member]) -> Callable[[SparkSession, str], DataFrame]:
    """(spark, sf_dir) -> union of every member projected generically."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = []
        for m in members:
            df = m.builder(spark, sf_dir)
            cols = [F.lit(m.tag).alias("tag")]
            for g in GENERIC_COLS:
                typ = "string" if g in KEY_COLS else "double"
                if g in m.colmap:
                    spark_expr, _ = m._exprs(g)
                    cols.append(F.expr(spark_expr).cast(typ).alias(g))
                else:
                    cols.append(F.lit(None).cast(typ).alias(g))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return run


def pack_oracle(members: List[Member]) -> str:
    """UNION ALL of every member's oracle under the generic projection."""
    selects = []
    for m in members:
        exprs = [f"'{m.tag}' AS tag"]
        for g in GENERIC_COLS:
            typ = "VARCHAR" if g in KEY_COLS else "DOUBLE"
            if g in m.colmap:
                _, sql_expr = m._exprs(g)
                exprs.append(f"CAST({sql_expr} AS {typ}) AS {g}")
            else:
                exprs.append(f"CAST(NULL AS {typ}) AS {g}")
        selects.append(
            f"SELECT {', '.join(exprs)} FROM ({m.sql}\n) AS _m_{m.tag}"
        )
    return "\nUNION ALL\n".join(selects)
