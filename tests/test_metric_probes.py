"""L2 / inner-product serving metrics for the IVF index family.

The probe's `sim` is higher-is-better under every metric (L2 is the
NEGATED squared distance), the metric is an INDEX property stored on
the centroids table (build fixes it; appends assign and probes
route/rank with it automatically), and recall against brute-force
ground truth gates that the routing actually works — the twin
expressions here are written in raw SQL strings, independent of the
library helpers, so they pin the arithmetic, not just the plumbing.
"""

import math

import pyspark.sql.functions as F
import pytest

from hadoop_logfile_inputformat_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"
SUFFIXES = ("_lists", "_centroids", "_batches", "_stats", "_tombstones")

L2SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _drop(spark, name):
    for s in SUFFIXES:
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _queries(v):
    return v.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _brute_topk(v, queries, score_sql, k):
    """Ground truth: exact top-k of every query against the FULL
    corpus under a raw-SQL score expression (higher is better)."""
    from pyspark.sql import Window

    pairs = (
        queries.select("query_id", F.col("embedding").alias("q"))
        .crossJoin(v.select("vec_id", F.col("embedding").alias("e")))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(score_sql.format(a="q", b="e")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    return pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )


def _recall(probe_rows, truth_rows, k):
    got, want = {}, {}
    for r in probe_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in truth_rows:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    per = [len(got.get(q, set()) & w) / len(w) for q, w in want.items()]
    return sum(per) / len(per)


def test_l2_index_recall_and_raw_sql_twin(spark):
    """An L2-metric IVF index routes AND ranks by (negated) squared
    distance: recall@10 vs brute-force L2 ground truth clears the same
    gate the cosine index does, and the probe's sim values equal the
    raw-SQL negated-L2 expression bit-exactly for the pairs it
    returns."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    try:
        S.build_ivf_index(spark, v, "tmp_l2", metric="l2")
        assert S._index_metric(spark, "tmp_l2") == "l2"
        q = _queries(v)
        probe = S.ann_ivf_probe(spark, q, "tmp_l2", k=10).collect()
        truth = _brute_topk(v, q, "-" + L2SQ, 10).collect()
        assert _recall(probe, truth, 10) >= 0.8
        # sims strictly non-positive (negated distance), rank 1 nearest
        assert all(r["sim"] <= 0 for r in probe)
        # raw-SQL twin: recompute -L2 for every returned pair
        emb = {r["vec_id"]: r["embedding"] for r in v.collect()}
        twin = {
            (r["query_id"], r["vec_id"]): r["score"]
            for r in _brute_topk(v, q, "-" + L2SQ, 10**6).collect()
        }
        for r in probe:
            # _round4_portable twin: floor half-up in IEEE doubles (r12)
            x = twin[(r["query_id"], r["neighbor_id"])]
            assert r["sim"] == math.floor(x * 10000.0 + 0.5) / 10000.0
    finally:
        _drop(spark, "tmp_l2")


def test_ip_index_recall(spark):
    """Inner-product serving: ranking by the raw dot product, gated by
    recall against brute-force IP ground truth."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    try:
        S.build_ivf_index(spark, v, "tmp_ip", metric="ip")
        q = _queries(v)
        probe = S.ann_ivf_probe(spark, q, "tmp_ip", k=10).collect()
        truth = _brute_topk(v, q, DOT, 10).collect()
        assert _recall(probe, truth, 10) >= 0.8
    finally:
        _drop(spark, "tmp_ip")


def test_l2_append_equals_rebuild_bit_exact(spark):
    """The metric rides appends: a delta appended to an L2 index
    assigns by L2 against the frozen centroids (not cosine), so the
    post-append probe is BIT-equal to a full L2 rebuild over the union
    with the same centroids — the metric twin of the append == rebuild
    pin that transfers correctness onto the table path."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    is_delta = F.col("vec_id") % S.INCR_SPLIT_MOD == S.INCR_DELTA_REM
    seed, delta = v.filter(~is_delta), v.filter(is_delta)
    q = _queries(v)
    try:
        S.build_ivf_index(spark, seed, "tmp_l2a", metric="l2")
        assert S.append_to_ivf_index(spark, delta, "tmp_l2a", batch_id=1)
        cents = spark.table("tmp_l2a_centroids").select(
            "centroid_id", "c_emb"
        )
        S.build_ivf_index(
            spark, v, "tmp_l2b", centroids=cents, metric="l2"
        )
        a = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, q, "tmp_l2a").collect()
        )
        b = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, q, "tmp_l2b").collect()
        )
        assert a == b and a
        # drift ledger stays coherent under the negated-L2 convention
        d = S.ivf_index_drift(spark, "tmp_l2a")
        assert d["seed_mean_sim"] is not None
        assert d["appended_mean_sim"] is not None
        # r12 ADVICE: l2/ip verdicts threshold RELATIVE drift — the
        # raw negated-squared-distance gap is data-dependent in
        # magnitude, so the absolute 0.05 default would be always-on
        # or never-on.  Same-distribution delta → relative drift well
        # under 5% → no retrain flag despite |raw drift| >> 0.05 scale
        assert d["metric"] == "l2"
        assert d["drift_relative"] == pytest.approx(
            d["drift"] / abs(d["seed_mean_sim"])
        )
        assert abs(d["drift_relative"]) < 0.05
        assert not d["retrain_recommended"]
        # and the knob still bites on the relative gauge: a threshold
        # below the observed relative drift flags (when drift is the
        # worse-than-seed direction)
        if d["drift_relative"] > 0:
            tight = S.ivf_index_drift(
                spark, "tmp_l2a", threshold=d["drift_relative"] / 2
            )
            assert tight["retrain_recommended"]
    finally:
        _drop(spark, "tmp_l2a")
        _drop(spark, "tmp_l2b")


def test_metric_probe_keeps_bucketed_no_shuffle_plan(spark):
    """Plan parity: the L2 probe reads the lists through their
    bucketing exactly like the cosine probe (no index-side Exchange
    under forced sort-merge) — the metric changes expressions, never
    the distribution shape."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    q = _queries(v)
    try:
        S.build_ivf_index(spark, v, "tmp_pl", metric="l2")
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                S.ann_ivf_probe(spark, q, "tmp_pl")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            scans = [
                line for line in plan.splitlines()
                if "FileScan" in line and "tmp_pl_lists" in line
            ]
            assert scans, plan
            for line in scans:
                assert "Bucketed: true" in line, line
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    finally:
        _drop(spark, "tmp_pl")


def test_cosine_default_is_unchanged(spark):
    """A metric-less build serves cosine and its probe output is
    byte-identical to an explicit metric='cosine' build — the new
    parameter cannot move any gated plan."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    q = _queries(v)
    try:
        S.build_ivf_index(spark, v, "tmp_c0")
        S.build_ivf_index(spark, v, "tmp_c1", metric="cosine")
        assert S._index_metric(spark, "tmp_c0") == "cosine"
        assert "metric" not in spark.table("tmp_c1_centroids").columns
        a = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, q, "tmp_c0").collect()
        )
        b = sorted(
            tuple(r) for r in S.ann_ivf_probe(spark, q, "tmp_c1").collect()
        )
        assert a == b and a
    finally:
        _drop(spark, "tmp_c0")
        _drop(spark, "tmp_c1")


def test_full_coverage_metric_probes_equal_oracled_brute_force(spark):
    """At nprobe == |centroids| the IVF probe IS brute force — so the
    L2/IP index probes must be BIT-EQUAL to the oracled pack members
    (similarity.l2_topk / ip_topk), which transfers those members'
    DuckDB value-hashes onto the metric probes' ranking arithmetic."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    try:
        for metric, brute in (("l2", S.l2_topk), ("ip", S.ip_topk)):
            name = f"tmp_fc_{metric}"
            S.build_ivf_index(spark, v, name, metric=metric)
            n_cent = spark.table(f"{name}_centroids").count()
            q = v.filter(F.col("vec_id") % 50 == 0).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            probe = sorted(
                tuple(r)
                for r in S.ann_ivf_probe(
                    spark, q, name, k=5, nprobe=n_cent
                ).collect()
            )
            oracle = sorted(tuple(r) for r in brute(spark, SF).collect())
            assert probe == oracle and probe, metric
            _drop(spark, name)
    finally:
        for metric in ("l2", "ip"):
            _drop(spark, f"tmp_fc_{metric}")


PQ_SFX = ("_codes", "_quantized", "_centroids", "_codebooks",
          "_batches", "_stats", "_qstats", "_tombstones")


def _drop_pq(spark, name):
    for s in PQ_SFX:
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _quantized_brute(spark, name, queries, metric, k):
    """Ground truth for the PQ families: exact top-k under ``metric``
    over the QUANTIZED corpus (the ``_quantized`` re-rank table — the
    vectors the exact re-rank actually scores; per-vector int8 scaling
    means raw-embedding l2/ip ground truth would be a different
    question).  Score arithmetic mirrors _exact_rerank's column form:
    higher-is-better, portable rounding off-cosine."""
    from pyspark.sql import Window

    qv = S.quantize_frame(
        queries.select(F.col("query_id").alias("vec_id"), "embedding")
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("q_q"),
        F.col("nrm").alias("q_nrm"),
    )
    ns = spark.table(f"{name}_quantized").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("n_q"),
        F.col("nrm").alias("n_nrm"),
    )
    dot = S._dot("q_q", "n_q")
    if metric == "l2":
        sim = S._round4_portable(
            -(F.col("q_nrm") * F.col("q_nrm")
              + F.col("n_nrm") * F.col("n_nrm") - F.lit(2.0) * dot)
        )
    else:  # ip
        sim = S._round4_portable(dot)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        qv.crossJoin(ns)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def test_ivfpq_l2_ip_full_coverage_equals_quantized_brute_force(spark):
    """At nprobe == |centroids| and rerank == |corpus| the IVFPQ probe
    degenerates to exact search under the index's serving metric — so
    an l2/ip IVFPQ index (r16) must be BIT-EQUAL to brute force over
    the quantized corpus, pinning routing + ADC + re-rank arithmetic
    in one equality per metric."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    n = v.count()
    for metric in ("l2", "ip"):
        name = f"tmp_pqm_{metric}"
        _drop_pq(spark, name)
        try:
            S.build_ivfpq_index(spark, v, name, iters=2, metric=metric)
            assert S._index_metric(spark, name) == metric
            n_cent = spark.table(f"{name}_centroids").count()
            q = _queries(v)
            probe = sorted(
                tuple(r)
                for r in S.ann_ivfpq_probe(
                    spark, q, name, k=5, nprobe=n_cent, rerank=n
                ).collect()
            )
            brute = sorted(
                tuple(r)
                for r in _quantized_brute(spark, name, q, metric, 5).collect()
            )
            assert probe == brute and probe, metric
        finally:
            _drop_pq(spark, name)


def test_flat_pq_l2_ip_full_coverage_equals_quantized_brute_force(spark):
    """Flat-PQ twin of the IVFPQ equality: rerank == |corpus| makes
    the ADC shortlist a pass-through, so the l2/ip probe must equal
    exact search over the quantized corpus; the serving metric is
    recovered from the codebooks table, not re-passed per probe."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    n = v.count()
    for metric in ("l2", "ip"):
        name = f"tmp_fpqm_{metric}"
        _drop_pq(spark, name)
        try:
            S.build_pq_index(spark, v, name, metric=metric)
            assert S._pq_index_metric(spark, name) == metric
            q = _queries(v)
            probe = sorted(
                tuple(r)
                for r in S.ann_pq_probe(
                    spark, q, name, k=5, rerank=n
                ).collect()
            )
            brute = sorted(
                tuple(r)
                for r in _quantized_brute(spark, name, q, metric, 5).collect()
            )
            assert probe == brute and probe, metric
        finally:
            _drop_pq(spark, name)


def test_ivfpq_l2_append_assigns_under_index_metric(spark):
    """An append to an l2-serving IVFPQ index must assign the delta
    under l2 (the seed's metric), so append == rebuild stays bit-equal
    — probed at full coverage under the recovered metric."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    n = v.count()
    is_delta = F.col("vec_id") % S.INCR_SPLIT_MOD == S.INCR_DELTA_REM
    seed = v.filter(~is_delta)
    delta = v.filter(is_delta)
    a, b = "tmp_l2app_a", "tmp_l2app_b"
    for name in (a, b):
        _drop_pq(spark, name)
    try:
        S.build_ivfpq_index(spark, seed, a, iters=2, metric="l2")
        S.append_to_ivfpq_index(spark, delta, a, batch_id=1)
        # rebuild over the union with the SAME model (centroids +
        # codebooks reused) — the appended index must match it exactly
        cent = spark.table(f"{a}_centroids").select(
            "centroid_id", "c_emb"
        )
        cb = spark.table(f"{a}_codebooks").where("m >= 0")
        S.build_ivfpq_index(
            spark, v, b, centroids=cent, codebooks=cb, metric="l2"
        )
        q = _queries(v)
        n_cent = spark.table(f"{a}_centroids").count()
        ra = sorted(
            tuple(r) for r in S.ann_ivfpq_probe(
                spark, q, a, k=5, nprobe=n_cent, rerank=n
            ).collect()
        )
        rb = sorted(
            tuple(r) for r in S.ann_ivfpq_probe(
                spark, q, b, k=5, nprobe=n_cent, rerank=n
            ).collect()
        )
        assert ra == rb and ra
        # and the codes themselves are identical (assignment + encode)
        ca = sorted(
            tuple(r)
            for r in spark.table(f"{a}_codes")
            .select("vec_id", "centroid_id", "m", "code")
            .collect()
        )
        cbb = sorted(
            tuple(r)
            for r in spark.table(f"{b}_codes")
            .select("vec_id", "centroid_id", "m", "code")
            .collect()
        )
        assert ca == cbb
    finally:
        for name in (a, b):
            _drop_pq(spark, name)


def test_metric_survives_retrain_and_routing_cos_recorded(spark):
    """The serving metric is an index property across the whole
    lifecycle (r16): retrain re-learns under it and re-stores it; and
    every IVFPQ build — any metric — records the seed's mean routing
    COSINE in _qstats (the tier verdict's metric-independent geometry
    statistic), bit-equal to the _stats seed row on a cosine index."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        index_info,
    )

    v = S._vectors(spark, SF).select("vec_id", "embedding")
    name = "tmp_l2life"
    _drop_pq(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2, metric="l2")
        q = spark.table(f"{name}_qstats").collect()[0]
        assert q["routing_cos"] is not None
        assert -1.0 <= q["routing_cos"] <= 1.0
        info = index_info(spark, name)
        assert info["quantization"]["routing_cos"] == q["routing_cos"]
        S.retrain_ivfpq_index(spark, name, iters=2)
        assert S._index_metric(spark, name) == "l2"
        q2 = spark.table(f"{name}_qstats").collect()[0]
        assert q2["routing_cos"] is not None
    finally:
        _drop_pq(spark, name)
    # cosine twin: routing_cos IS the _stats seed mean, same aggregate
    name = "tmp_coslife"
    _drop_pq(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        q = spark.table(f"{name}_qstats").collect()[0]
        seed = (
            spark.table(f"{name}_stats").where("batch_id = -1").collect()
        )[0]["mean_sim"]
        assert q["routing_cos"] == seed
    finally:
        _drop_pq(spark, name)


def test_tier_verdict_reaches_l2_indexes(spark, monkeypatch):
    """The r15 cosine gate is dropped (r16): the tier verdict's
    geometry input now comes from _qstats.routing_cos, which an
    l2-serving IVFPQ build records too — measured on the x100
    clustered l2 grid (SCALING.md) to hit the same ADC ceiling.  With
    the floors lowered to the fixture's own statistics, an l2 index
    must surface tier_hint 'flat-pq' exactly like its cosine twin."""
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        index_info,
    )

    v = S._vectors(spark, SF).select("vec_id", "embedding")
    name = "tmp_l2tier"
    _drop_pq(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2, metric="l2")
        rc = spark.table(f"{name}_qstats").collect()[0]["routing_cos"]
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(S, "TIER_ROUTING_CONCENTRATION_FLOOR", rc)
        info = index_info(spark, name)
        assert info["quantization"]["tier_hint"] == "flat-pq"
    finally:
        _drop_pq(spark, name)


def test_cached_metric_invalidates_on_rebuild(spark):
    """The probe-path metric memo (r16: one 1-row job per index
    GENERATION, not per probe) must re-read when the index is rebuilt
    under a different metric — the file-signature key changes with the
    rebuild, same discipline as _read_rotation_cached."""
    v = S._vectors(spark, SF).select("vec_id", "embedding")
    name = "tmp_mcache"
    _drop_pq(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2, metric="l2")
        assert S._serving_metric_cached(spark, name) == "l2"
        # memo hit returns the same answer
        assert S._serving_metric_cached(spark, name) == "l2"
        S.build_ivfpq_index(spark, v, name, iters=2)  # cosine rebuild
        S._refresh_index_relations(spark, name, "_centroids")
        assert S._serving_metric_cached(spark, name) == "cosine"
        # flat twin
        S.build_pq_index(spark, v, name, metric="ip")
        S._refresh_index_relations(spark, name, "_codebooks")
        assert S._serving_metric_cached(spark, name, flat=True) == "ip"
    finally:
        _drop_pq(spark, name)
