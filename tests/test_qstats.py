"""The PQ families' quantization-quality ledger (r13): every
``build_pq_index`` / ``build_ivfpq_index`` writes a one-row
``<name>_qstats`` table (seed ADC / residual self-similarity + entry
budget + rotation flag) and ``maintenance.index_info`` turns it into
the ``budget_limited`` verdict — the third sizing verdict next to the
drift ledger's ``retrain_recommended`` and the nprobe curve.
Calibrated against the measured recall-vs-budget table in SCALING.md
(tools/soak.py --budget-curve)."""

from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators import similarity as S
from hadoop_logfile_inputformat_spark.operators.maintenance import (
    index_info,
    register_index,
    drop_index,
)
from hadoop_logfile_inputformat_spark.operators.tables import load

SFX = ("_codes", "_quantized", "_centroids", "_codebooks", "_batches",
       "_stats", "_qstats", "_tombstones", "_lists")


def _drop(spark, name):
    for s in SFX:
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")


def _vecs(spark):
    return load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )


def test_pq_build_writes_adc_qstats_and_info_surfaces_it(spark):
    v = _vecs(spark)
    name = "t_qs_pq"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        row = spark.table(f"{name}_qstats").collect()
        assert len(row) == 1
        row = row[0]
        assert row["kind"] == "adc"
        assert row["m"] == S.PQ_M
        assert not row["rotated"]
        assert row["n_vecs"] == v.count()
        # the ledger value IS the _stats seed row's self-sim (flat PQ's
        # drift signal and its quantization signal are the same number)
        seed = (
            spark.table(f"{name}_stats")
            .where("batch_id = -1")
            .collect()[0]
        )
        assert abs(row["self_sim"] - seed["mean_sim"]) < 1e-12
        q = index_info(spark, name)["quantization"]
        assert q["kind"] == "adc"
        # the verdict applies the PER-KIND floor (r14): flat PQ's
        # full-vector self-sim is a higher-running statistic than
        # IVFPQ's residual one — the residual floor would never fire
        assert q["budget_limited"] == (
            q["self_sim"] < S.pq_budget_floor("adc")
        )
    finally:
        _drop(spark, name)


def test_ivfpq_qstats_residual_self_sim_grows_with_budget(spark):
    """The calibration premise: residual self-sim is monotone in the
    entry budget (more entries -> the codes explain more of the
    residual), so index_info's floor comparison orders budgets the
    same way the measured recall table does."""
    v = _vecs(spark)
    name = "t_qs_ivfpq"
    sims = {}
    for ne in (2, 24):
        _drop(spark, name)
        try:
            S.build_ivfpq_index(spark, v, name, n_entries=ne, iters=2)
            q = index_info(spark, name)["quantization"]
            assert q["kind"] == "residual"
            assert q["n_entries"] == ne
            assert 0.0 <= q["self_sim"] <= 1.0
            sims[ne] = q["self_sim"]
        finally:
            _drop(spark, name)
    assert sims[24] > sims[2]


def test_rotated_build_flags_rotated_and_register_round_trips(
    spark, tmp_path
):
    v = _vecs(spark)
    name = "t_qs_rot"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(
            spark, v, name, iters=2, rotation="opq", path=str(tmp_path)
        )
        q1 = index_info(spark, name)["quantization"]
        assert q1["rotated"]
        drop_index(spark, name)
        assert register_index(spark, name, str(tmp_path)) == "ivfpq"
        q2 = index_info(spark, name)["quantization"]
        assert q1 == q2
    finally:
        _drop(spark, name)


def test_ivf_rebuild_over_pq_name_clears_stale_qstats(spark):
    """A rebuild defines a new generation for the quantization ledger
    too: an IVF build over a name that used to be a PQ-family index
    must not leave the old family's budget verdict behind."""
    v = _vecs(spark)
    name = "t_qs_stale"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        assert spark.catalog.tableExists(f"{name}_qstats")
        # simulate the family change: drop the pq corpus tables, then
        # build ivf under the same name (its family signature wins)
        for s in ("_codes", "_quantized", "_codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
        S.build_ivf_index(spark, v, name)
        assert not spark.catalog.tableExists(f"{name}_qstats")
        assert "quantization" not in index_info(spark, name)
    finally:
        _drop(spark, name)


def test_retrain_refreshes_qstats_budget(spark):
    """A retrain rebuilds through the builder, so the quantization
    ledger reflects the NEW codebooks (entry budget included)."""
    v = _vecs(spark)
    name = "t_qs_retrain"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, n_entries=4, iters=2)
        before = index_info(spark, name)["quantization"]
        assert before["n_entries"] == 4
        S.retrain_ivfpq_index(spark, name, n_entries=12, iters=2)
        after = index_info(spark, name)["quantization"]
        assert after["n_entries"] == 12
        assert after["self_sim"] > before["self_sim"]
    finally:
        _drop(spark, name)
        spark.sql(f"DROP TABLE IF EXISTS {name}_retrain_tmp")


def test_recommended_rerank_monotone_and_floored():
    """The corpus-size-aware shortlist law (r14, SCALING.md's rerank
    tables): depth is PQ_RERANK at and below the 20k anchor (every
    fixture/gate/bench scale — frozen plans), then monotone
    non-decreasing ∝ n^0.4 (depth x2.5 per 10x corpus, the measured
    recall-at-fixed-depth decay), never below the base."""
    ladder = [1, 500, 2_000, 8_000, S.RERANK_REF_CORPUS,
              50_000, 200_000, 2_000_000, 20_000_000]
    depths = [S.recommended_rerank(n) for n in ladder]
    assert depths == sorted(depths)  # monotone in corpus size
    for n, d in zip(ladder, depths):
        if n <= S.RERANK_REF_CORPUS:
            assert d == S.PQ_RERANK  # fixture scales: exactly the base
        else:
            assert d > S.PQ_RERANK
    # the published law's x100 point: 200k -> ~2.5x the base
    assert 120 <= S.recommended_rerank(200_000) <= 130
    assert S.recommended_rerank(None) == S.PQ_RERANK
    # respects a caller's base depth
    assert S.recommended_rerank(10, base=7) == 7


def test_index_info_surfaces_rerank_hint(spark):
    """index_info prices the SHORTLIST next to the budget (r14): the
    quantization block carries rerank_hint = recommended_rerank(live
    corpus rows), so an operator who reads budget_limited also sees
    the lever that was actually binding at scale in the r13 tables."""
    v = _vecs(spark)
    name = "t_qs_hint"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        info = index_info(spark, name)
        q = info["quantization"]
        live = info["tables"][f"{name}_quantized"]["rows"]
        assert q["rerank_hint"] == S.recommended_rerank(live)
        assert q["rerank_hint"] == S.PQ_RERANK  # fixture scale
    finally:
        _drop(spark, name)


def test_probe_default_rerank_resolves_to_recommended(spark):
    """rerank=None (the r14 probe default) must resolve to the
    corpus-size recommendation — at fixture scale that is exactly the
    old fixed PQ_RERANK, so gated values are unchanged by
    construction; the explicit-depth path stays available."""
    v = _vecs(spark)
    name = "t_qs_auto"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        queries = v.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        auto = S.ann_pq_probe(spark, queries, name, k=5).collect()
        explicit = S.ann_pq_probe(
            spark, queries, name, k=5, rerank=S.PQ_RERANK
        ).collect()
        assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
        assert len(auto) > 0
    finally:
        _drop(spark, name)


def test_index_info_tolerates_empty_qstats(spark):
    """Torn write between qstats table creation and data commit (the
    crash-sweep scenario class, r13 ADVICE): an EMPTY ledger degrades
    to no quantization block — index_info must stay a read-only
    describe verb, never raise, under any crash debris."""
    v = _vecs(spark)
    name = "t_qs_torn"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        empty = spark.table(f"{name}_qstats").limit(0)
        empty.write.mode("overwrite").saveAsTable(f"{name}_qstats_e")
        spark.sql(f"DROP TABLE {name}_qstats")
        spark.sql(f"ALTER TABLE {name}_qstats_e RENAME TO {name}_qstats")
        info = index_info(spark, name)
        assert "quantization" not in info
    finally:
        _drop(spark, name)
        spark.sql(f"DROP TABLE IF EXISTS {name}_qstats_e")


def test_append_leaves_qstats_alone(spark):
    """qstats is seed-only by design: codebook fitness doesn't move on
    appends (frozen codebooks) — appended-data fit is the _stats drift
    ledger's job."""
    v = _vecs(spark)
    name = "t_qs_append"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        before = spark.table(f"{name}_qstats").collect()
        delta = v.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        ).limit(5)
        assert S.append_to_pq_index(spark, delta, name, batch_id=1)
        assert spark.table(f"{name}_qstats").collect() == before
    finally:
        _drop(spark, name)


def test_tier_limited_monotone_and_kind_gated():
    """The tier verdict (r15, the r14 verdict's gap #1): pure and
    monotone in both inputs, never fires for the flat kinds, and
    reproduces the measured calibration cells — clustered x100
    (routing 0.932, n=200k) BINDS, clustered x10 (n=20k) and uniform
    (routing 0.396) do not (SCALING.md composed-remedy grid + the x1
    geometry calibration in the constant's docstring)."""
    # the measured cells (r16: the scale boundary is a bracket now —
    # the 640x200 composed cell ESCAPES at 20k (0.704) and CAPS at 60k
    # (0.388 vs flat 0.668), so the floor moved 100k -> 40k)
    assert S.tier_limited("residual", 0.932, 200_000)
    assert S.tier_limited("residual", 0.927, 60_000)       # x30: binds
    assert not S.tier_limited("residual", 0.928, 20_000)   # x10: escapes
    assert not S.tier_limited("residual", 0.396, 200_000)  # uniform
    # kind gate: adc IS the escape tier; unknown kinds stay silent
    assert not S.tier_limited("adc", 0.99, 10_000_000)
    assert not S.tier_limited("other", 0.99, 10_000_000)
    # missing measurements are not evidence
    assert not S.tier_limited("residual", None, 200_000)
    assert not S.tier_limited("residual", 0.932, None)
    # monotone: once fired, more concentration / more corpus never
    # un-fires; below a firing cell in either coordinate, at most fires
    routings = [0.0, 0.4, 0.75, 0.9, 1.0]
    scales = [1, 20_000, 100_000, 200_000, 10_000_000]
    for i, r in enumerate(routings):
        for j, n in enumerate(scales):
            if S.tier_limited("residual", r, n):
                assert S.tier_limited("residual", routings[-1], n)
                assert S.tier_limited("residual", r, scales[-1])
    # exact floor edges fire (>=, documented)
    assert S.tier_limited(
        "residual", S.TIER_ROUTING_CONCENTRATION_FLOOR, S.TIER_SCALE_FLOOR
    )


def test_index_info_surfaces_tier_hint(spark, monkeypatch):
    """index_info prices TIER CHOICE next to codes and shortlist
    (r15): silent at fixture scale/geometry (both floors unmet), and
    the end-to-end wiring — _stats seed routing cosine + live
    _quantized count into tier_limited — fires when the floors are
    lowered to the fixture's own statistics.  Flat PQ never carries a
    hint (it IS the escape tier)."""
    v = _vecs(spark)
    name = "t_qs_tier"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        q = index_info(spark, name)["quantization"]
        assert q["tier_hint"] is None  # fixture scale: silent
        seed = (
            spark.table(f"{name}_stats").where("batch_id = -1").collect()
        )[0]
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(
            S, "TIER_ROUTING_CONCENTRATION_FLOOR", seed["mean_sim"]
        )
        q = index_info(spark, name)["quantization"]
        assert q["tier_hint"] == "flat-pq"
    finally:
        _drop(spark, name)
    name = "t_qs_tierf"
    _drop(spark, name)
    try:
        S.build_pq_index(spark, v, name)
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(S, "TIER_ROUTING_CONCENTRATION_FLOOR", 0.0)
        q = index_info(spark, name)["quantization"]
        assert q["tier_hint"] is None  # kind gate: adc never hints
    finally:
        _drop(spark, name)


def test_probe_warns_once_when_tier_limited(spark, monkeypatch):
    """The default-rerank probe path surfaces the tier verdict as a
    one-per-generation warning (r15): silent at fixture scale, fires
    once when the floors are met, memoized so a serving loop is not
    spammed.  Results are untouched either way."""
    import warnings as W

    v = _vecs(spark)
    name = "t_qs_tierw"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        queries = v.limit(3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            S.ann_ivfpq_probe(spark, queries, name, k=2).collect()
        assert not [x for x in rec if "ceiling" in str(x.message)]
        # a NEW generation (rebuild) with the floors lowered to the
        # fixture's own statistics must warn exactly once
        _drop(spark, name)
        S.build_ivfpq_index(spark, v, name, iters=2)
        seed = (
            spark.table(f"{name}_stats").where("batch_id = -1").collect()
        )[0]
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(
            S, "TIER_ROUTING_CONCENTRATION_FLOOR", seed["mean_sim"]
        )
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            a = S.ann_ivfpq_probe(spark, queries, name, k=2).collect()
            n1 = len([x for x in rec if "ceiling" in str(x.message)])
            b = S.ann_ivfpq_probe(spark, queries, name, k=2).collect()
            n2 = len([x for x in rec if "ceiling" in str(x.message)])
        assert n1 == 1, [str(x.message) for x in rec]
        assert n2 == 1  # memoized: once per index generation
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        _drop(spark, name)


def test_tier_warning_memo_survives_render_cache_pressure(
    spark, monkeypatch
):
    """The once-per-generation memo lives in a DEDICATED store (r15
    ADVICE): eviction pressure on the shared 32-entry render cache —
    argmin renders and rotations across many indexes — must not
    re-arm a warning that already fired for this generation."""
    import warnings as W

    v = _vecs(spark)
    name = "t_qs_tierw2"
    _drop(spark, name)
    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        seed = (
            spark.table(f"{name}_stats").where("batch_id = -1").collect()
        )[0]
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(
            S, "TIER_ROUTING_CONCENTRATION_FLOOR", seed["mean_sim"]
        )
        queries = v.limit(3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            S.ann_ivfpq_probe(spark, queries, name, k=2).collect()
            assert len(
                [x for x in rec if "ceiling" in str(x.message)]
            ) == 1
            # flood the render cache far past its cap — the old memo
            # site; the dedicated store must be unaffected
            for i in range(3 * S._ASSIGN_RENDER_CACHE_MAX):
                S._ASSIGN_RENDER_CACHE[("pressure", i)] = ("x",)
            while len(S._ASSIGN_RENDER_CACHE) > S._ASSIGN_RENDER_CACHE_MAX:
                S._ASSIGN_RENDER_CACHE.popitem(last=False)
            S.ann_ivfpq_probe(spark, queries, name, k=2).collect()
            assert len(
                [x for x in rec if "ceiling" in str(x.message)]
            ) == 1
    finally:
        _drop(spark, name)


def test_tier_hint_stays_fresh_across_drift_lifecycle(spark, monkeypatch):
    """The r15 verdict's freshness question, pinned: the tier verdict
    reads the SEED ``_stats`` routing statistic plus the LIVE corpus
    count — so (A) at seed it reflects the build's own geometry, (B) a
    drifted-not-yet-retrained index verdicts on the UNCHANGED seed row
    at the GROWN live count (appends must not rewrite the seed row, and
    the scale input must move), and (C) retrain resets the ledger —
    every held vector becomes seed data — so the hint recomputes from
    the post-retrain geometry.  At every point the surfaced hint must
    equal ``tier_limited`` applied to the CURRENT persisted statistics,
    never a cached generation's."""
    v = _vecs(spark)
    name = "t_qs_fresh"
    _drop(spark, name)

    def surfaced():
        info = index_info(spark, name)
        seed = (
            spark.table(f"{name}_stats")
            .where("batch_id = -1")
            .collect()[0]["mean_sim"]
        )
        live = info["tables"][f"{name}_quantized"]["rows"]
        assert abs(info["drift"]["seed_mean_sim"] - seed) < 1e-12
        expected = (
            "flat-pq" if S.tier_limited("residual", seed, live) else None
        )
        assert info["quantization"]["tier_hint"] == expected
        return seed, live

    try:
        S.build_ivfpq_index(spark, v, name, iters=2)
        s0 = (
            spark.table(f"{name}_stats")
            .where("batch_id = -1")
            .collect()[0]["mean_sim"]
        )
        monkeypatch.setattr(S, "TIER_SCALE_FLOOR", 1)
        monkeypatch.setattr(S, "TIER_ROUTING_CONCENTRATION_FLOOR", s0)
        seed_a, live_a = surfaced()
        assert seed_a == s0

        # drift: a reflected delta changes live geometry, NOT the seed
        delta = v.select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, x -> CAST(-x AS FLOAT))"
            ).alias("embedding"),
        )
        S.append_to_ivfpq_index(spark, delta, name, batch_id=1)
        seed_b, live_b = surfaced()
        assert seed_b == s0, "appends must not rewrite the seed row"
        assert live_b == 2 * live_a, "scale input must track live rows"

        # retrain: ledger reset — the hint must recompute from the NEW
        # seed geometry (seed + reflected delta re-trained together)
        S.retrain_ivfpq_index(spark, name, iters=2)
        seed_c, live_c = surfaced()
        assert live_c == live_b
        rows = spark.table(f"{name}_stats").collect()
        assert {r["batch_id"] for r in rows} == {-1}, (
            "retrain must leave only the new seed generation's ledger"
        )
    finally:
        _drop(spark, name)
