"""Skew mitigation: salted equi join.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
moderate skew automatically, but only for sort-merge joins it can
re-plan.  When one key dominates a shuffle (the classic one-customer-
is-10%-of-orders case) and the build side cannot broadcast, salting is
the standard manual fix: spread the hot key's rows across ``n_salts``
sub-keys and replicate the build side once per salt, so the hot key's
work lands on ``n_salts`` tasks instead of one.

Cost model: build side is shuffled/replicated ``n_salts``×, so use
this when |build| × n_salts ≪ |probe-side hot key|.  See SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join ``probe ⋈ build on probe[on] == build[on]`` with the
    probe side's hot keys spread across ``n_salts`` shuffle sub-keys.

    Semantics are identical to ``probe.join(build, on, how)`` for
    ``inner`` and ``left`` joins (asserted in tests); the build side is
    replicated per salt, so every (key, salt) probe row still finds its
    match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = probe.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    replicated = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [on, "_salt"], how).drop("_salt")
