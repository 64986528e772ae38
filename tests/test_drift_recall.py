"""Drift → recall: the quality outcome the append/drift/retrain
lifecycle exists to protect, measured instead of assumed.

Two measured facts, both against brute-force ground truth:

1. **IVF routing recall degrades only modestly under drift.**  A query
   drawn from the drifted distribution routes by the same (mismatched)
   centroid scores its true neighbors were assigned by, so they mostly
   co-locate and recall slips ~0.1 absolute rather than collapsing —
   four drift constructions (coordinate reversal, reflection isometry,
   dim-zeroing, clustered+jitter) all reproduced this during
   development, the same mechanism as the r9 skew soak's "IVF probes
   don't care about a hot ball".  The dominant cost of drift on the
   IVF tier is list balance / probe cost, not recall.

2. **IVFPQ ADC recall DEGRADES under drift and retrain recovers it.**
   Appended vectors residual-encode against FROZEN codebooks; in a
   drifted region the codes mis-rank the ADC shortlist, so true
   neighbors fall outside ``rerank`` and no exact re-rank can bring
   them back.  This is exactly the quantization error the ``_stats``
   drift ledger measures (mean assignment cosine / ADC self-sim) — the
   ledger's retrain recommendation and the recall loss have the same
   cause, which is what makes acting on the verdict correct.

The x10 numbers live in SCALING.md (tools/soak.py --drift-recall).
"""

import pyspark.sql.functions as F
from pyspark.sql import Window

from hadoop_logfile_inputformat_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"
TOPK = 5
RERANK = 20  # small enough that shortlist (ADC) quality binds

#: reflection isometry: negate every even coordinate.  Preserves every
#: drifted-vs-drifted dot product (an isometry), so the drifted
#: region's internal neighbor structure is exactly as learnable as the
#: original corpus — retrain CAN recover it — while being maximally
#: mismatched to codebooks trained on the original region.
REFL = (
    "transform(zip_with(embedding, sequence(1, size(embedding)),"
    " (a, i) -> CASE WHEN i % 2 = 0 THEN -CAST(a AS DOUBLE)"
    " ELSE CAST(a AS DOUBLE) END), x -> CAST(x AS FLOAT))"
)


def _reflected(df, id_off):
    return df.select(
        (F.col("vec_id") + id_off).alias("vec_id"),
        F.expr(REFL).alias("embedding"),
    )


def _recall(spark, queries, name, probe_fn, live, **kw):
    """Mean recall@TOPK of ``probe_fn`` vs brute-force cosine ground
    truth over ``live`` (the index's current members)."""
    got = {}
    for r in probe_fn(spark, queries, name, k=TOPK, **kw).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    q2 = queries.select("query_id", F.col("embedding").alias("qe"))
    q2 = q2.withColumn("qn", F.expr(
        "sqrt(aggregate(zip_with(qe, qe, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"
    ))
    pairs = (
        q2.crossJoin(live)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            (F.expr(
                "aggregate(zip_with(qe, embedding, (x, y) ->"
                " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            ) / (F.col("qn") * F.col("nrm"))).alias("s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    truth = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= TOPK
    )
    want = {}
    for r in truth.collect():
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    per = [len(got.get(q, set()) & ww) / len(ww) for q, ww in want.items()]
    return sum(per) / len(per)


def _pq_live(spark, name):
    live = spark.table(f"{name}_quantized").select(
        "vec_id", F.col("q").alias("embedding")
    )
    return live.withColumn("nrm", F.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v))"
    ))


def _queries(df):
    return df.filter(F.col("vec_id") % 20 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_drifted_appends_degrade_ivfpq_recall_and_retrain_recovers(spark):
    """The lifecycle's central claim, end to end: (a) a drifted append
    pushes the drift ledger over the retrain threshold, (b) recall@k
    through the frozen codebooks is measurably BELOW the seed
    baseline, (c) acting on the verdict (retrain_ivfpq_index) recovers
    a measurable share of the loss and resets the ledger.  All inputs
    deterministic (fixed corpus, reflection drift, deterministic
    Lloyd's), so the asserted margins are stable."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    sfx = ("_codes", "_quantized", "_centroids", "_codebooks",
           "_batches", "_stats", "_qstats", "_tombstones", "_deferred")
    try:
        S.build_ivfpq_index(spark, v, "tdr", iters=3)
        base = _recall(
            spark, _queries(v), "tdr", S.ann_ivfpq_probe,
            _pq_live(spark, "tdr"), rerank=RERANK,
        )
        d = _reflected(v, 100000)
        S.append_to_ivfpq_index(spark, d, "tdr", batch_id=1)
        dr = S.ivf_index_drift(spark, "tdr")
        assert dr["retrain_recommended"] and dr["drift"] > 0.05
        pre = _recall(
            spark, _queries(d), "tdr", S.ann_ivfpq_probe,
            _pq_live(spark, "tdr"), rerank=RERANK,
        )
        # (b) the drift the ledger flagged is a real recall loss
        assert pre <= base - 0.05, (base, pre)
        S.retrain_ivfpq_index(spark, "tdr", iters=3)
        dr2 = S.ivf_index_drift(spark, "tdr")
        assert dr2["n_appended"] == 0 and not dr2["retrain_recommended"]
        post = _recall(
            spark, _queries(d), "tdr", S.ann_ivfpq_probe,
            _pq_live(spark, "tdr"), rerank=RERANK,
        )
        # (c) acting on the verdict recovers recall (measured margins
        # at sf0.001: base 0.440, drifted 0.312, retrained 0.392)
        assert post >= pre + 0.05, (pre, post)
    finally:
        for s in sfx:
            spark.sql(f"DROP TABLE IF EXISTS tdr{s}")


def test_ivf_routing_recall_is_drift_robust(spark):
    """The honest comparison point: the IVF (full-vector) tier's
    recall degrades only MODESTLY under the same flagged drift
    (measured ~0.12 absolute here vs the quantized tier's collapse-
    and-recover) — queries from the drifted distribution mis-route
    consistently WITH their true neighbors, so routing errors mostly
    cancel.  Pinning the bound stops a future round from 'fixing' IVF
    recall that was never the broken tier, and documents that the
    IVF-tier drift cost is list balance and bounded recall slippage,
    not the codebook mismatch the retrain verb exists for."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    sfx = ("_lists", "_centroids", "_batches", "_stats",
           "_tombstones", "_deferred")
    try:
        # LEARNED centroids (they fit the seed tightly, so the ledger
        # flags the reflected appends; modulus centroids are corpus
        # vectors and score the reflection symmetrically — no flag)
        cents = S.kmeans_centroids(v, k=12, iters=3, metric="cosine")
        S.build_ivf_index(spark, v, "tdrr", centroids=cents)
        live0 = spark.table("tdrr_lists").select("vec_id", "embedding", "nrm")
        base = _recall(
            spark, _queries(v), "tdrr", S.ann_ivf_probe, live0
        )
        d = _reflected(v, 100000)
        S.append_to_ivf_index(spark, d, "tdrr", batch_id=1)
        dr = S.ivf_index_drift(spark, "tdrr")
        assert dr["retrain_recommended"]  # the ledger still flags it
        live1 = spark.table("tdrr_lists").select("vec_id", "embedding", "nrm")
        drifted = _recall(
            spark, _queries(d), "tdrr", S.ann_ivf_probe, live1
        )
        # drifted-query recall slips, bounded: within 0.15 of the
        # seed baseline (measured 0.56 -> 0.44 at sf0.001), while the
        # quantized tier's drop-and-recover is the actionable signal
        assert drifted >= base - 0.15, (base, drifted)
    finally:
        for s in sfx:
            spark.sql(f"DROP TABLE IF EXISTS tdrr{s}")
