"""sf1-order scale soak: turn SCALING.md's projections into measurements.

Builds deterministic xT replicas of the sf0.1 corpus (default T in
{10, 100} -> roughly sf1 / sf10 volume), runs the heaviest registry /
bench keys at each scale with bench.py's timing methodology (cold
materialization + min of warm re-runs over a full ``collect``), and
reports wall-clock plus per-key shuffle volume scraped from the Spark
UI REST API — so an operator whose cost curve bends worse than ~linear
is visible as a number, not a hypothesis.

Tiling rules (all deterministic, no RNG — rebuilding bit-identical):

- Every key column is shifted by ``tile * stride`` where ``stride`` is
  ``max(key) + 1`` in the base table, foreign keys shifted by the SAME
  stride as the table they reference: joins stay tile-local and every
  join/group cardinality grows exactly linearly with T.
- ``documents.text`` passes through a per-tile AFFINE alphabet
  permutation ``c -> alpha[(a_t * idx(c) + b_t) % 26]`` (a_t from the
  12 units mod 26, b_t = t % 26: 312 distinct letter mappings) plus a
  digit rotation.  Byte length, token boundaries, case and
  punctuation — and hence the ``n_chars`` column and every
  quality-score distribution — are preserved exactly, but lowercase
  3-word shingles decorrelate across tiles, so near-dup output volume
  stays LINEAR in T.  Verbatim copies would put every document in a
  T-sized LSH bucket and grow pair volume quadratically, poisoning the
  very curve this tool exists to measure.  (v1 used a plain rotation,
  period 26: at T=100 tiles {t, t+26, ...} shared the letter mapping,
  manufacturing ~25% real near-duplicates — which the curation
  pipeline correctly deduped, at quadratic candidate cost.)
- ``embeddings.embedding`` gets a per-(tile, element) sign pattern:
  both vectors of any within-tile pair flip the same signs, so every
  within-tile cosine (and norm) is preserved EXACTLY, while cross-tile
  cosines decorrelate to ~0.  Same linearity argument as text.
- ``nation`` / ``region`` (broadcast dims — dims don't multiply with
  fact volume on a real cluster either) and ``events`` (parquet
  TIMESTAMP(NANOS); byte-copied to preserve the physical type, unused
  by the soak keys) are copied as-is.

Usage::

    python tools/soak.py                  # build + measure 1x/10x/100x
    python tools/soak.py --tiles 10       # quicker: 1x/10x only
    python tools/soak.py --keys q9_profit_by_nation_year --tiles 10

Output: one ``{"soak": ...}`` JSON line per (key, scale) with cold /
steady wall, result rows, and the cold run's shuffle-write /
shuffle-read / input bytes plus the single largest stage shuffle
write; then a markdown table (the SCALING.md "measured" section) and a
final summary JSON line with per-key scaling exponents
``log(t_100x / t_10x) / log(10)`` (1.0 = perfectly linear).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the query-resolution chain + fixture-corpus rules
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.maintenance import (
    force_drop_table,  # interrupted soaks strand managed dirs (r15)
)
from hadoop_logfile_inputformat_spark.operators.tables import clear_query_caches
from hadoop_logfile_inputformat_spark.session import get_spark

#: The ten heaviest keys per BENCH_r06 steady extras + headline — the
#: set VERDICT r6 prescribes for the soak.
HEAVY_KEYS = [
    "training_corpus",
    "dedup_incremental",
    "embedding_near_dup_scale",
    "substring_dedup",
    "bpe_merges",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "ann_pq_topk",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
]

ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"

#: key columns to shift per table -> the table whose stride applies
#: (foreign keys use the referenced table's stride so joins stay
#: tile-local)
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
#: primary-key column per table, for the stride computation
PRIMARY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_AS_IS = ["nation", "region", "events"]


def _rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


#: units mod 26 — multipliers for the affine per-tile letter permutation
_AFFINE_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _tile_alpha(t: int) -> str:
    """The tile-t letter mapping: affine permutation of the alphabet,
    pairwise distinct for t < 12*26 = 312 (a plain rotation repeats at
    period 26 and silently manufactures cross-tile near-duplicates)."""
    a = _AFFINE_A[(t // 26) % len(_AFFINE_A)]
    b = t % 26
    return "".join(ALPHA[(a * i + b) % 26] for i in range(26))


def _tile_text(col, t: int):
    """Length-preserving per-tile content decorrelation (see module
    docstring).  t=0 is the identity: tile 0 IS the base corpus."""
    if t == 0:
        return col
    a = _tile_alpha(t)
    d = _rot(DIGITS, t % 10)
    out = F.translate(col, ALPHA, a)
    out = F.translate(out, ALPHA.upper(), a.upper())
    return F.translate(out, DIGITS, d)


def _tile_embedding(col, t: int):
    """Per-(tile, element) sign pattern: cosine/norm structure inside a
    tile is preserved exactly, cross-tile cosine decorrelates."""
    if t == 0:
        return col
    return F.transform(
        col,
        lambda x, i: (
            x * (F.pmod(F.xxhash64(F.lit(t), i), F.lit(2)) * 2 - 1)
        ).cast("float"),
    )


def _strides(spark, base: str) -> dict:
    out = {}
    for table, pk in PRIMARY.items():
        row = (
            spark.read.parquet(os.path.join(base, f"{table}.parquet"))
            .agg(F.max(pk))
            .collect()[0]
        )
        out[table] = int(row[0]) + 1
    return out


def build_tiled(spark, base: str, out_dir: str, tiles: int) -> str:
    """Materialize the xT corpus under ``out_dir`` (idempotent: a
    marker file records the tile count; rebuilds only on mismatch)."""
    marker = os.path.join(out_dir, "_SOAK_OK")
    stamp = f"v2-affine:{tiles}"  # bump on any tiling-rule change
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    strides = _strides(spark, base)
    for table in COPY_AS_IS:
        shutil.copyfile(
            os.path.join(base, f"{table}.parquet"),
            os.path.join(out_dir, f"{table}.parquet"),
        )
    for table, shifts in KEY_SHIFTS.items():
        src = os.path.join(base, f"{table}.parquet")
        branches = []
        for t in range(tiles):
            df = spark.read.parquet(src)
            for col, ref in shifts.items():
                df = df.withColumn(
                    col, (F.col(col) + t * strides[ref]).cast("long")
                )
            if table == "documents":
                df = df.withColumn("text", _tile_text(F.col("text"), t))
            if table == "embeddings":
                df = df.withColumn(
                    "embedding", _tile_embedding(F.col("embedding"), t)
                )
            branches.append(df)
        u = branches[0]
        for b in branches[1:]:
            u = u.unionByName(b)
        u.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir


def build_clustered(
    spark,
    src: str,
    out_dir: str,
    m: int = 16,
    base_w: float = 0.6,
    span_w: float = 0.25,
) -> str:
    """Materialize a CLUSTER-STRUCTURED variant of ``src``'s embeddings
    — the geometry real encoder embeddings exhibit and IVF exists to
    exploit (a query's neighbors concentrated in FEW inverted lists),
    versus the near-uniform synthetic fixture, which is IVF's worst
    case (every list holds ~uniform probability mass, so recall grows
    only ~linearly with nprobe).  Every recall number published before
    r12 rode the worst case; this mode makes the sizing evidence
    representative.

    Deterministic, no RNG (the tiler's discipline): the ``m``
    lowest-id vectors become concept ANCHORS; every vector blends
    toward its ``vec_id % m`` anchor with a per-vector weight
    ``w = base_w + span_w * ((vec_id * 7919) % 101) / 101`` (7919 =
    the 1000th prime; bounded spread so clusters have interior
    structure instead of collapsing to m points).  At dim=64 the
    fixture's vectors are near-orthogonal, so intra-cluster cosine
    lands around ``w^2 / (w^2 + (1-w)^2)`` ≈ 0.7-0.9 and cross-cluster
    stays ≈ anchor-cosine ≈ 0 — tight-but-not-degenerate concept
    clusters.  Only ``embeddings.parquet`` is transformed (the recall
    suites read nothing else); idempotent via the marker scheme."""
    marker = os.path.join(out_dir, "_SOAK_OK")
    stamp = f"v1-clustered:{m}:{base_w}:{span_w}:{src}"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    from pyspark.sql import Window

    v = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    anchors = (
        v.orderBy("vec_id")
        .limit(m)
        .select(
            (
                F.row_number().over(Window.orderBy("vec_id")) - 1
            ).alias("cluster"),
            F.col("embedding").alias("anchor"),
        )
    )
    w_expr = (
        f"(CAST({base_w} AS DOUBLE) + CAST({span_w} AS DOUBLE)"
        f" * CAST((vec_id * 7919) % 101 AS DOUBLE) / 101.0)"
    )
    blended = (
        v.withColumn("cluster", (F.col("vec_id") % m).cast("int"))
        .join(F.broadcast(anchors), "cluster")
        .selectExpr(
            "vec_id",
            f"transform(zip_with(embedding, anchor, (a, b) ->"
            f" (1.0 - {w_expr}) * CAST(a AS DOUBLE)"
            f" + {w_expr} * CAST(b AS DOUBLE)),"
            f" x -> CAST(x AS FLOAT)) AS embedding",
            *[c for c in v.columns if c not in ("vec_id", "embedding")],
        )
    )
    blended.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir


#: ~420 chars of deterministic boilerplate: long enough to dominate a
#: document's 3-word shingle set (so sharing it puts two docs above the
#: Jaccard threshold and into the same LSH buckets) and to pass the
#: paragraph-dedup min-length filter.
BOILERPLATE = (
    "subscribe to our newsletter for weekly updates and exclusive offers "
    "terms of service apply to all content on this site all rights "
    "reserved reproduction without permission is prohibited contact the "
    "editorial team for licensing questions cookie preferences can be "
    "managed in your account settings this page was generated "
    "automatically and is updated every day without further notice "
    "please review the community guidelines before posting"
)


def _copy_table(src: str, dst: str) -> None:
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copyfile(src, dst)


def build_skewed(spark, src: str, out_dir: str) -> str:
    """Materialize a SKEWED variant of corpus ``src`` (idempotent, same
    marker scheme as :func:`build_tiled`) — the hazard class the
    uniform tiling cannot produce:

    - ``orders``: one hot customer owns ~10% of orders
      (``o_orderkey % 10 == 0`` → the min custkey) — the classic
      one-customer join/group skew;
    - ``lineitem``: one hot order owns ~10% of line items
      (``xxhash64(l_orderkey, l_linenumber) % 10 == 0`` → the min
      orderkey) — a hot groupBy(l_orderkey) group AND a hot join key
      against orders;
    - ``documents``: ~5% of docs (``doc_id % 20 == 0``) become one
      shared boilerplate paragraph plus a short unique tail — one hot
      LSH bucket (minhash/simhash) and one hot paragraph-hash group,
      while staying NON-identical (exact dedup untouched);
    - ``embeddings``: ~10% of vectors (``vec_id % 10 == 3``) collapse
      into ONE dense semantic cluster (the min-vec_id vector plus a
      tiny deterministic per-(id, position) jitter, cosine ≳0.999
      within the cluster) — one mega-cluster for SemDeDup (its
      ``max_cluster_size`` guard's hazard class) and one hot inverted
      list for IVF.  The hot residue 3 is chosen so NO hot id is a
      modulus centroid (ids ≡3 mod 10 are never ≡0 mod 25): with
      centroids sampled from the corpus (the modulus subset), a dense
      ball would otherwise contain ~|ball|/50 centroids and auto-split
      across them — measured exactly that on the first cut (capped vs
      uncapped within noise), which is itself a real finding:
      density-proportional centroid sampling dilutes dense balls for
      free; the mega-cluster hazard needs the ball to sit AWAY from
      every centroid.

    Everything else copies as-is.  All transforms are deterministic —
    rebuilds are bit-identical.
    """
    marker = os.path.join(out_dir, "_SKEW_OK")
    stamp = f"skew-v3:{src}"  # v3: hot embedding ball off-centroid
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    tables = list(KEY_SHIFTS) + COPY_AS_IS
    for table in tables:
        sp = os.path.join(src, f"{table}.parquet")
        dp = os.path.join(out_dir, f"{table}.parquet")
        if table == "orders":
            o = spark.read.parquet(sp)
            hot = o.agg(F.min("o_custkey")).collect()[0][0]
            o.withColumn(
                "o_custkey",
                F.when(
                    F.pmod(F.col("o_orderkey"), F.lit(10)) == 0, F.lit(hot)
                )
                .otherwise(F.col("o_custkey"))
                .cast("long"),
            ).write.mode("overwrite").parquet(dp)
        elif table == "lineitem":
            l = spark.read.parquet(sp)
            hot = l.agg(F.min("l_orderkey")).collect()[0][0]
            l.withColumn(
                "l_orderkey",
                F.when(
                    F.pmod(
                        F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)
                    )
                    == 0,
                    F.lit(hot),
                )
                .otherwise(F.col("l_orderkey"))
                .cast("long"),
            ).write.mode("overwrite").parquet(dp)
        elif table == "documents":
            d = spark.read.parquet(sp)
            d.withColumn(
                "text",
                F.when(
                    F.pmod(F.col("doc_id"), F.lit(20)) == 0,
                    F.concat(
                        F.lit(BOILERPLATE + "\n\nrecord id "),
                        F.col("doc_id").cast("string"),
                    ),
                ).otherwise(F.col("text")),
            ).write.mode("overwrite").parquet(dp)
        elif table == "embeddings":
            e = spark.read.parquet(sp)
            cid = e.agg(F.min("vec_id")).collect()[0][0]
            center = (
                e.filter(F.col("vec_id") == cid)
                .select("embedding")
                .collect()[0][0]
            )
            c_lit = (
                "array(" + ",".join(f"{float(x)!r}D" for x in center) + ")"
            )
            # jitter ±0.01 per (vec_id, position): deterministic, keeps
            # cluster members NON-identical (cos ≳0.999, so every pair
            # crosses the 0.9 near-dup threshold and SemDeDup's tau)
            hot = F.expr(
                f"transform({c_lit}, (x, i) -> CAST(x"
                " + (pmod(xxhash64(vec_id * 131 + i), 1000) / 1000.0"
                " - 0.5) * 0.02 AS FLOAT))"
            )
            e.withColumn(
                "embedding",
                F.when(
                    F.pmod(F.col("vec_id"), F.lit(10)) == 3, hot
                ).otherwise(F.col("embedding")),
            ).write.mode("overwrite").parquet(dp)
        else:
            _copy_table(sp, dp)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir


def _timed(spark, make_df, confs: dict | None = None, warm: int = 1) -> dict:
    """min-of-warm steady timing of ``make_df() -> DataFrame`` under
    temporary conf overrides (restored after)."""
    saved = {}
    try:
        for k, v in (confs or {}).items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        clear_query_caches()
        t0 = time.monotonic()
        rows = len(make_df().collect())
        cold = time.monotonic() - t0
        steady = None
        for _ in range(warm):
            t0 = time.monotonic()
            rows = len(make_df().collect())
            dt = time.monotonic() - t0
            steady = dt if steady is None else min(steady, dt)
        return {"cold": round(cold, 2), "steady": round(steady, 2), "rows": rows}
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


#: Join-isolation conf sets: broadcast disabled so the join MUST
#: shuffle both sides (the regime salting/AQE-skew exist for).  AQE
#: skew thresholds lowered to engage at soak volume (defaults target
#: 256 MB partitions; the x10 hot key is ~tens of MB).
_NO_BROADCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}
_SKEW_OFF = {**_NO_BROADCAST, "spark.sql.adaptive.skewJoin.enabled": "false"}
_SKEW_ON = {
    **_NO_BROADCAST,
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
}


def run_skew_suite(spark, base_dir: str, skew_dir: str, warm: int = 1) -> list:
    """Measure the skew hazard class and every shipped mitigation knob
    doing its job — emits one JSON line per case, returns the list."""
    import bench as _b
    from hadoop_logfile_inputformat_spark.operators import dedup, similarity
    from hadoop_logfile_inputformat_spark.operators.skew import salted_join
    from hadoop_logfile_inputformat_spark.operators.tables import load

    q18 = _b.QUERIES["q18_large_volume_customers"]
    para = _b.MEMBER_QUERIES["paragraph_dedup"]

    def join_frames(d):
        l = load(spark, d, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, d, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        return l, o

    def plain_join(d):
        l, o = join_frames(d)
        return l.join(o, "l_orderkey").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("s")
        )

    def salted(d):
        l, o = join_frames(d)
        return salted_join(l, o, "l_orderkey").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("s")
        )

    cases = [
        # hot groupBy group + hot join key, absorbed by partial agg +
        # broadcast dims: q18 must NOT degrade under skew
        ("q18_base", lambda: q18(spark, base_dir), None),
        ("q18_skew", lambda: q18(spark, skew_dir), None),
        # hot paragraph-hash group: map-side partials absorb it
        ("paragraph_dedup_base", lambda: para(spark, base_dir), None),
        ("paragraph_dedup_skew", lambda: para(spark, skew_dir), None),
        # hot LSH bucket: quadratic uncapped, linear with the cap
        (
            "minhash_skew_uncapped",
            lambda: dedup.minhash_lsh_pairs(spark, skew_dir),
            None,
        ),
        (
            "minhash_skew_cap64",
            lambda: dedup.minhash_lsh_pairs(
                spark, skew_dir, max_bucket_size=64
            ),
            None,
        ),
        (
            "simhash_skew_uncapped",
            lambda: dedup.simhash_pairs(spark, skew_dir),
            None,
        ),
        (
            "simhash_skew_cap64",
            lambda: dedup.simhash_pairs(spark, skew_dir, max_bucket_size=64),
            None,
        ),
        # join-skew isolation (broadcast off => both sides shuffle):
        # plain vs AQE skew split vs manual salting, same query
        ("join_skew_plain", lambda: plain_join(skew_dir), _SKEW_OFF),
        ("join_skew_aqe", lambda: plain_join(skew_dir), _SKEW_ON),
        ("join_skew_salted", lambda: salted(skew_dir), _SKEW_OFF),
        ("join_base_plain", lambda: plain_join(base_dir), _SKEW_OFF),
        # hot embedding cluster (~10% of vectors in one cosine-0.999
        # ball): SemDeDup's one-mega-cluster hazard is quadratic in
        # cluster size uncapped; max_cluster_size (library default)
        # skips the pairwise stage for oversized clusters.
        # Hierarchical assignment throughout — the flat O(N·k) pass is
        # the already-measured r7 finding, not the subject here.
        (
            "semdedup_skew_uncapped",
            lambda: similarity.semantic_dedup(
                spark, skew_dir, max_cluster_size=None,
                assignment="hierarchical",
            ),
            None,
        ),
        # explicit cap sized to engage at this volume (the 10k library
        # default is production sizing; the x10 mega-cluster is ~2k)
        (
            "semdedup_skew_cap256",
            lambda: similarity.semantic_dedup(
                spark, skew_dir, assignment="hierarchical",
                max_cluster_size=256,
            ),
            None,
        ),
        (
            "semdedup_base_capped",
            lambda: similarity.semantic_dedup(
                spark, base_dir, assignment="hierarchical"
            ),
            None,
        ),
        # hot IVF inverted list: the cluster's centroid-modulus members
        # all quantize to the same list, so probes routed there scan
        # ~10% of the corpus instead of 1/|centroids| — measured as
        # the top-k probe end to end (bounded output: |q| x k rows)
        ("ann_ivf_skew", lambda: similarity.ann_ivf_topk(spark, skew_dir), None),
        ("ann_ivf_base", lambda: similarity.ann_ivf_topk(spark, base_dir), None),
    ]
    out = []
    for name, fn, confs in cases:
        try:
            m = _timed(spark, fn, confs, warm=warm)
        except Exception as exc:  # noqa: BLE001 - record, keep going
            m = {"error": str(exc).split("\n", 1)[0][:160]}
        rec = {"skew_case": name, **m}
        out.append(rec)
        print(json.dumps(rec))
    return out


def run_delete_suite(spark, src: str, warm: int = 1) -> dict:
    """Measure the tombstone-delete lifecycle end to end on the IVF
    index at soak volume: clean-probe latency, the delete cost itself,
    the pending-tombstone probe overhead (the broadcast anti-join the
    'bounded by compaction cadence' claim rests on — here at a WORST
    CASE 10% of the corpus pending, far past any sane compaction
    cadence), the compaction fold's wall, and the post-fold probe.
    Emits one JSON line, returns the dict for SCALING.md's measured
    table."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.maintenance import (
        compact_ivf_index,
    )
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    n_corpus = v.count()
    queries = v.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    name = "soak_del_idx"
    for s in ("_lists", "_centroids", "_batches", "_stats", "_tombstones"):
        force_drop_table(spark, f"{name}{s}")
    t0 = time.monotonic()
    S.build_ivf_index(spark, v, name)
    build_wall = round(time.monotonic() - t0, 2)

    def probe():
        return S.ann_ivf_probe(spark, queries, name)

    out = {"detail": "delete_soak", "n_corpus": n_corpus,
           "build_s": build_wall}
    out["probe_clean"] = _timed(spark, probe, warm=warm)
    victims = v.filter(F.col("vec_id") % 10 == 3)
    t0 = time.monotonic()
    out["n_deleted"] = S.delete_from_index(spark, name, ids=victims)
    out["delete_s"] = round(time.monotonic() - t0, 2)
    out["probe_pending"] = _timed(spark, probe, warm=warm)
    t0 = time.monotonic()
    compact_ivf_index(spark, name)
    out["compact_s"] = round(time.monotonic() - t0, 2)
    out["probe_folded"] = _timed(spark, probe, warm=warm)
    for s in ("_lists", "_centroids", "_batches", "_stats", "_tombstones"):
        force_drop_table(spark, f"{name}{s}")
    print(json.dumps(out))
    return out


REFL = (
    "transform(zip_with(embedding, sequence(1, size(embedding)),"
    " (a, i) -> CASE WHEN i % 2 = 0 THEN -CAST(a AS DOUBLE)"
    " ELSE CAST(a AS DOUBLE) END), x -> CAST(x AS FLOAT))"
)


def _brute_recall(spark, queries, probe_df, live, topk: int) -> float:
    """Mean recall@topk of a probe result vs brute-force cosine ground
    truth over ``live`` (vec_id, embedding, nrm)."""
    got = {}
    for r in probe_df.collect():
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
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    truth = pairs.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= topk
    )
    want = {}
    for r in truth.collect():
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    per = [len(got.get(q, set()) & ww) / len(ww) for q, ww in want.items()]
    return round(sum(per) / len(per), 3)


def run_drift_recall_suite(spark, src: str, topk: int = 5,
                           rerank: int = 20,
                           alphas=(0.25, 0.5, 0.75, 1.0),
                           retrain: bool = True) -> dict:
    """Close the drift→recall loop at soak volume: build the IVFPQ
    index on the corpus, append INCREASINGLY drifted deltas (α-blends
    toward the reflection isometry — internally as learnable as the
    seed, maximally mismatched to the frozen codebooks at α=1), and at
    each step record the drift ledger's verdict NEXT TO measured
    recall@k vs brute-force ground truth; then retrain and measure the
    same queries again.  One JSON line per step; returns the dict for
    SCALING.md's table.  The IVF (full-vector) tier is probed alongside
    to document its measured drift-ROBUSTNESS (routing follows the
    data — the recall cost of drift is an ADC/codebook effect)."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S

    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    n = v.count()
    name = "soak_drift_idx"
    sfx = ("_codes", "_quantized", "_centroids", "_codebooks",
           "_batches", "_stats", "_qstats", "_lists")
    for s in sfx:
        force_drop_table(spark, f"{name}{s}")
        force_drop_table(spark, f"{name}_ivf{s}")

    def blend(df, alpha: float, id_off: int):
        e = (f"transform(zip_with(embedding, {REFL}, (a, b) ->"
             f" (1.0 - {alpha}) * CAST(a AS DOUBLE) + {alpha} * b),"
             " x -> CAST(x AS FLOAT))")
        return df.select((F.col("vec_id") + id_off).alias("vec_id"),
                         F.expr(e).alias("embedding"))

    t0 = time.monotonic()
    S.build_ivfpq_index(spark, v, name, iters=2)
    S.build_ivf_index(spark, v, f"{name}_ivf")
    out = {"detail": "drift_recall_soak", "n_corpus": n,
           "build_s": round(time.monotonic() - t0, 2), "steps": []}

    def tier_point(label: str) -> dict:
        """The tier verdict at a lifecycle point (r16, the r15
        verdict's freshness question): the verdict reads the SEED
        ``_stats`` routing statistic and the LIVE corpus count, so a
        drifted-not-yet-retrained index verdicts on pre-drift geometry
        at the post-drift size; retrain resets the ledger (every held
        vector becomes seed data).  Log all three points so SCALING.md
        can say whether the hint stays truthful across the lifecycle."""
        from hadoop_logfile_inputformat_spark.operators.maintenance import (
            index_info,
        )

        info = index_info(spark, name)
        pt = {
            "detail": "drift_tier_point", "point": label,
            "tier_hint": (info.get("quantization") or {}).get("tier_hint"),
            "rerank_hint": (info.get("quantization") or {}).get(
                "rerank_hint"),
            "budget_limited": (info.get("quantization") or {}).get(
                "budget_limited"),
            "seed_mean_sim": (info.get("drift") or {}).get("seed_mean_sim"),
            "live_n": (info.get("tables") or {}).get(
                f"{name}_quantized", {}).get("rows"),
        }
        print(json.dumps(pt))
        return pt

    out["tier_points"] = [tier_point("seed")]

    def pq_live():
        live = spark.table(f"{name}_quantized").select(
            "vec_id", F.col("q").alias("embedding"))
        return live.withColumn("nrm", F.expr(
            "sqrt(aggregate(zip_with(embedding, embedding, (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (a, v) -> a + v))"))

    def step_queries(d):
        return d.filter(F.col("vec_id") % 101 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding")

    base_q = step_queries(v)
    base = _brute_recall(
        spark, base_q,
        S.ann_ivfpq_probe(spark, base_q, name, k=topk, rerank=rerank),
        pq_live(), topk)
    out["recall_seed"] = base
    deltas = []
    for i, alpha in enumerate(alphas, start=1):
        d = blend(v, alpha, 1_000_000 * i)
        deltas.append((alpha, d))
        S.append_to_ivfpq_index(spark, d, name, batch_id=i)
        S.append_to_ivf_index(spark, d, f"{name}_ivf", batch_id=i)
        dr = S.ivf_index_drift(spark, name)
        dq = step_queries(d)
        rec = _brute_recall(
            spark, dq,
            S.ann_ivfpq_probe(spark, dq, name, k=topk, rerank=rerank),
            pq_live(), topk)
        ivf_live = spark.table(f"{name}_ivf_lists").select(
            "vec_id", "embedding", "nrm")
        rec_ivf = _brute_recall(
            spark, dq, S.ann_ivf_probe(spark, dq, f"{name}_ivf", k=topk),
            ivf_live, topk)
        row = {"alpha": alpha, "drift": round(dr["drift"], 4),
               "last_batch_drift": round(dr["last_batch_drift"], 4),
               "flag": dr["retrain_recommended"],
               "recall_ivfpq": rec, "recall_ivf": rec_ivf}
        out["steps"].append(row)
        print(json.dumps({"detail": "drift_step", **row}))
    out["tier_points"].append(tier_point("post_drift_pre_retrain"))
    if not retrain:
        for s in sfx:
            force_drop_table(spark, f"{name}{s}")
            force_drop_table(spark, f"{name}_ivf{s}")
        print(json.dumps(out))
        return out
    t0 = time.monotonic()
    S.retrain_ivfpq_index(spark, name, iters=2)
    out["retrain_s"] = round(time.monotonic() - t0, 2)
    out["tier_points"].append(tier_point("post_retrain"))
    out["post"] = []
    # the post-retrain corpus holds the seed plus every appended delta;
    # probe at BOTH the pinned comparability depth and the r14 law's
    # recommendation for that size — at large scale the post-retrain
    # recall is shortlist-bound (the r14 x100 cell: retrain lifted
    # recall 0.003 -> 0.008 at rerank=20 while the seed band was 0.053;
    # the depth the law prescribes is what separates "retrain failed"
    # from "retrain fixed drift and the shortlist needs its lawful
    # depth")
    n_post = n * (1 + len(deltas))
    rr_rec = S.recommended_rerank(n_post)
    out["post_rec_depth"] = rr_rec
    for alpha, d in deltas:
        dq = step_queries(d)
        rec = _brute_recall(
            spark, dq,
            S.ann_ivfpq_probe(spark, dq, name, k=topk, rerank=rerank),
            pq_live(), topk)
        rec_law = rec if rr_rec == rerank else _brute_recall(
            spark, dq,
            S.ann_ivfpq_probe(spark, dq, name, k=topk, rerank=rr_rec),
            pq_live(), topk)
        out["post"].append({"alpha": alpha, "recall_ivfpq": rec,
                            "recall_ivfpq_rec_depth": rec_law})
        print(json.dumps({"detail": "drift_post_retrain",
                          "alpha": alpha, "recall_ivfpq": rec,
                          "rec_depth": rr_rec,
                          "recall_ivfpq_rec_depth": rec_law}))
    dr = S.ivf_index_drift(spark, name)
    out["post_drift"] = dr["drift"]
    for s in sfx:
        force_drop_table(spark, f"{name}{s}")
        force_drop_table(spark, f"{name}_ivf{s}")
    print(json.dumps(out))
    return out


def run_mixed_stream_suite(
    spark,
    src: str,
    out_dir: str,
    n_batches: int = 50,
    check_every: int = 10,
    compact_every: int = 8,
    compact_at: int = 400,
) -> dict:
    """Mixed-lifecycle streaming soak: ONE standing IVF index served by
    an ``embedding_index_stream`` (ingest) AND a ``takedown_stream``
    (delete) simultaneously, ≥``n_batches`` micro-batches, with
    in-stream compaction (both streams trigger their own) and a
    DRIVER-SESSION retrain crossing mid-soak — the writer-interleaving
    surface a production index actually lives on.  Every
    ``check_every`` batches the soak asserts the invariants that
    interleaving bugs break first:

    - MEMBERSHIP: live lists == ingested − deleted, exactly (and the
      pending tombstone set is the delete backlog, no more, no less);
    - LEDGER MONOTONE: the applied-batch count never regresses
      (resets only at the retrain crossing, by contract);
    - FILE FAN-IN BOUNDED: lists file count stays O(compact cadence ×
      buckets) — the property compaction exists for;
    - PROBE = NEVER-HELD TWIN (final): top-k over the standing index
      bit-equals an inline probe over exactly the live member set
      under the same centroids.

    A slice of takedowns targets ids that have NOT been ingested yet
    (the out-of-order race), so the deferred-delete path is exercised
    in-stream: those victims must never become probe-visible once
    their batch lands.
    """
    import shutil

    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators import maintenance as M
    from hadoop_logfile_inputformat_spark.operators.tables import load
    from hadoop_logfile_inputformat_spark.streaming.pipelines import (
        embedding_index_stream,
        takedown_stream,
    )

    name = "soak_mixed_idx"
    sfx = ("_lists", "_centroids", "_batches", "_stats",
           "_tombstones", "_deferred")
    for s in sfx:
        force_drop_table(spark, f"{name}{s}")
    base = os.path.join(out_dir, "mixed_stream")
    shutil.rmtree(base, ignore_errors=True)
    dirs = {d: os.path.join(base, d) for d in
            ("ingest", "takedown", "matches", "audit", "ck1", "ck2")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    ids = [r["vec_id"] for r in v.select("vec_id").collect()]
    ids.sort()
    n = len(ids)
    seed_n = max(200, n // 5)
    per_batch = max(20, (n - seed_n) // n_batches)
    seed_ids = set(ids[:seed_n])
    batches = [ids[seed_n + i * per_batch: seed_n + (i + 1) * per_batch]
               for i in range(n_batches)]
    batches = [b for b in batches if b]
    S.build_ivf_index(spark, v.filter(F.col("vec_id").isin(list(seed_ids))),
                      name)

    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    # glob sources: each micro-batch lands as its own subdirectory
    q_ing = embedding_index_stream(
        spark.readStream.schema(schema).parquet(f"{dirs['ingest']}/*"),
        name, dirs["matches"], dirs["ck1"], compact_every=compact_every,
    )
    q_del = takedown_stream(
        spark.readStream.schema("vec_id LONG").parquet(
            f"{dirs['takedown']}/*"),
        name, dirs["ck2"], compact_at=compact_at, audit_sink=dirs["audit"],
    )

    ingested: set = set(seed_ids)
    deleted: set = set()
    deferred_sent: set = set()
    out = {"detail": "mixed_stream_soak", "n_corpus": n,
           "n_batches": len(batches), "per_batch": per_batch,
           "checks": [], "events": []}
    t_start = time.monotonic()
    try:
        for i, batch_ids in enumerate(batches):
            v.filter(F.col("vec_id").isin(batch_ids)).coalesce(1)\
                .write.mode("overwrite").parquet(f"{dirs['ingest']}/b{i:04d}")
            q_ing.processAllAvailable()
            ingested.update(batch_ids)
            # consume any out-of-order takedowns that just landed
            deleted.update(deferred_sent & set(batch_ids))
            if i >= 3 and i % 2 == 1:
                # delete ~5% of an OLD batch + (every 8th) a few ids
                # from the NEXT batch that hasn't been ingested yet
                victims = [x for x in batches[i - 3][:per_batch // 20 + 2]
                           if x not in deleted]
                future = []
                if i % 8 == 1 and i + 1 < len(batches):
                    future = batches[i + 1][:2]
                    deferred_sent.update(future)
                spark.createDataFrame(
                    [(x,) for x in victims + future], "vec_id LONG"
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{dirs['takedown']}/t{i:04d}")
                q_del.processAllAvailable()
                deleted.update(victims)
            if i == len(batches) // 2:
                # retrain crossing, from the DRIVER session, streams
                # live — the interleaving case the soak exists for
                t0 = time.monotonic()
                S.retrain_ivf_index(spark, name, iters=1)
                out["events"].append(
                    {"batch": i, "retrain_s": round(time.monotonic() - t0, 2)})
                # pending tombstones became PHYSICAL in the rebuild's
                # snapshot subtraction — the victims stay deleted
            if i % check_every == 0 or i == len(batches) - 1:
                live_expected = ingested - deleted
                spark.catalog.refreshTable(f"{name}_lists")
                held = {r["vec_id"] for r in
                        spark.table(f"{name}_lists").select("vec_id").collect()}
                tomb = set()
                if spark.catalog.tableExists(f"{name}_tombstones"):
                    spark.catalog.refreshTable(f"{name}_tombstones")
                    tomb = {r["vec_id"] for r in
                            spark.table(f"{name}_tombstones").collect()}
                live = held - tomb
                info = M.index_info(spark, name)
                n_files = info["tables"][f"{name}_lists"]["files"]
                check = {"batch": i, "live": len(live),
                         "expected": len(live_expected),
                         "membership_ok": live == live_expected,
                         "pending_tombstones": info["pending_tombstones"],
                         "deferred": info["deferred_deletes"],
                         "lists_files": n_files,
                         "applied_batches": info["applied_batches"]}
                out["checks"].append(check)
                print(json.dumps({"detail": "mixed_check", **check}))
                if not check["membership_ok"]:
                    missing = sorted(live_expected - live)[:5]
                    extra = sorted(live - live_expected)[:5]
                    print(json.dumps({"detail": "mixed_mismatch",
                                      "missing": missing, "extra": extra}))
    finally:
        q_ing.stop()
        q_del.stop()
    out["wall_s"] = round(time.monotonic() - t_start, 2)
    # final: probe == never-held twin (inline probe over exactly the
    # live member set under the same centroids), bit-equal
    for s in ("_lists", "_tombstones", "_centroids"):
        if spark.catalog.tableExists(f"{name}{s}"):
            spark.catalog.refreshTable(f"{name}{s}")
    queries = v.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    probe = sorted(tuple(r) for r in
                   S.ann_ivf_probe(spark, queries, name).collect())
    cents = spark.table(f"{name}_centroids").select("centroid_id", "c_emb")
    held = {r["vec_id"] for r in
            spark.table(f"{name}_lists").select("vec_id").collect()}
    tomb = set()
    if spark.catalog.tableExists(f"{name}_tombstones"):
        tomb = {r["vec_id"] for r in
                spark.table(f"{name}_tombstones").collect()}
    live_v = v.filter(F.col("vec_id").isin(list(held - tomb)))
    S.build_ivf_index(spark, live_v, f"{name}_twin", centroids=cents)
    twin = sorted(tuple(r) for r in
                  S.ann_ivf_probe(spark, queries, f"{name}_twin").collect())
    out["probe_equals_never_held_twin"] = probe == twin and bool(probe)
    out["all_membership_ok"] = all(c["membership_ok"] for c in out["checks"])
    out["max_lists_files"] = max(
        c["lists_files"] for c in out["checks"] if c["lists_files"])
    for s in sfx:
        force_drop_table(spark, f"{name}{s}")
        force_drop_table(spark, f"{name}_twin{s}")
    print(json.dumps(out))
    return out


def run_nprobe_curve(spark, src: str, topk: int = 5, warm: int = 1) -> dict:
    """The recall/nprobe sizing table an operator needs: build the IVF
    index at soak volume, sweep nprobe, and record recall@k vs
    brute-force ground truth NEXT TO the steady probe wall — the
    tradeoff curve that turns 'pick nprobe' from folklore into a
    lookup.  One JSON line per point; returns the dict for
    SCALING.md."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    n = v.count()
    name = "soak_np_idx"
    for s in ("_lists", "_centroids", "_batches", "_stats"):
        force_drop_table(spark, f"{name}{s}")
    t0 = time.monotonic()
    S.build_ivf_index(spark, v, name)
    out = {"detail": "nprobe_curve", "n_corpus": n,
           "n_centroids": spark.table(f"{name}_centroids").count(),
           "build_s": round(time.monotonic() - t0, 2), "points": []}
    queries = v.filter(F.col("vec_id") % 1009 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out["n_queries"] = queries.count()
    live = spark.table(f"{name}_lists").select("vec_id", "embedding", "nrm")
    # ground truth once — recall of every nprobe point shares it
    got_truth: dict = {}
    from pyspark.sql import Window

    q2 = queries.select("query_id", F.col("embedding").alias("qe"))
    q2 = q2.withColumn("qn", F.expr(
        "sqrt(aggregate(zip_with(qe, qe, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"))
    pairs = q2.crossJoin(live).filter(
        F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id",
        (F.expr("aggregate(zip_with(qe, embedding, (x, y) ->"
                " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
         / (F.col("qn") * F.col("nrm"))).alias("s"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    for r in pairs.withColumn("r", F.row_number().over(w)).filter(
            F.col("r") <= topk).collect():
        got_truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    for nprobe in (1, 2, 4, 8, 16):
        timing = _timed(
            spark,
            lambda np=nprobe: S.ann_ivf_probe(spark, queries, name,
                                              k=topk, nprobe=np),
            warm=warm,
        )
        got: dict = {}
        for r in S.ann_ivf_probe(spark, queries, name, k=topk,
                                 nprobe=nprobe).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        per = [len(got.get(q, set()) & ww) / len(ww)
               for q, ww in got_truth.items()]
        point = {"nprobe": nprobe,
                 "recall": round(sum(per) / len(per), 3),
                 "probe_steady_s": timing.get("steady")}
        out["points"].append(point)
        print(json.dumps({"detail": "nprobe_point", **point}))
    for s in ("_lists", "_centroids", "_batches", "_stats"):
        force_drop_table(spark, f"{name}{s}")
    print(json.dumps(out))
    return out


def _ground_truth(spark, queries, live, topk: int,
                  metric: str = "cosine") -> dict:
    """query_id -> set of the true top-``topk`` neighbors under
    ``metric`` over ``live`` (vec_id, embedding, nrm) — computed ONCE
    so every point of a sizing curve shares it (the nprobe-curve
    pattern, factored).  Truth is over the RAW embeddings under every
    metric (the operator's question is "do I find my true neighbors",
    not "my true quantized neighbors") — the published cosine tables
    use the same convention."""
    from pyspark.sql import Window

    q2 = queries.select("query_id", F.col("embedding").alias("qe"))
    q2 = q2.withColumn("qn", F.expr(
        "sqrt(aggregate(zip_with(qe, qe, (x, y) -> CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"))
    dot = F.expr("aggregate(zip_with(qe, embedding, (x, y) ->"
                 " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                 " CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
    if metric == "cosine":
        score = dot / (F.col("qn") * F.col("nrm"))
    elif metric == "ip":
        score = dot
    else:  # l2, negated squared distance (higher is better)
        score = -(F.col("qn") * F.col("qn")
                  + F.col("nrm") * F.col("nrm") - F.lit(2.0) * dot)
    pairs = q2.crossJoin(live).filter(
        F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", score.alias("s"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    truth: dict = {}
    for r in pairs.withColumn("r", F.row_number().over(w)).filter(
            F.col("r") <= topk).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    return truth


def _recall_against(truth: dict, probe_df) -> float:
    got: dict = {}
    for r in probe_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per = [len(got.get(q, set()) & ww) / len(ww)
           for q, ww in truth.items()]
    return round(sum(per) / len(per), 3)


def _with_nrm(df):
    return df.withColumn("nrm", F.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v))"))


def run_budget_curve(spark, src: str, topk: int = 5, rerank: int = 20,
                     multipliers=(1, 2, 4, 8), rotations=(None, "opq"),
                     warm: int = 1, tier: str = "ivfpq",
                     reranks=None, metric: str = "cosine") -> dict:
    """The ENTRY-BUDGET sizing table (r13, the r12 verdict's top ask):
    build the IVFPQ index at 1x/2x/4x/8x the legacy ~80-entry budget,
    with and without the OPQ rotation, and record recall@k vs
    brute-force ground truth NEXT TO the build wall, steady probe wall,
    and the ``_qstats`` residual self-similarity — the signal
    ``index_info`` surfaces, calibrated here against measured recall.
    One JSON line per point; returns the dict for SCALING.md.

    ``tier="pq"`` (r14) runs the same grid on the FLAT-PQ tier —
    codebooks learned at the same entry budgets, whole-corpus ADC —
    recording the ``kind="adc"`` full-vector self-sim: the calibration
    data the per-kind ``budget_limited`` floor needs (r13 ADVICE: the
    residual floor never fires on the higher-running full-vector
    statistic).

    ``reranks`` (r14): probe each build at SEVERAL shortlist depths
    instead of the single ``rerank`` — one build, len(reranks) recall
    points — the plumbing that prices the COMPOSED remedy (e.g. 8x
    entries x rerank 200) without a rebuild per depth."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    n = v.count()
    # the LEGACY (pre-r13) default budget the multipliers scale from:
    # n // max(25, n // IVF_CENTROID_TARGET) == min(n/25, ~80) entries
    # per subspace (the routing target IS the pre-r13 PQ-entry target)
    base = max(2, n // max(S.PQ_CODEBOOK_MODULUS,
                           n // S.IVF_CENTROID_TARGET))
    name = "soak_budget_idx"
    sfx = ("_codes", "_quantized", "_centroids", "_codebooks",
           "_batches", "_stats", "_qstats")
    # ~200 queries at every scale: recall@5 resolution ~0.001 (a fixed
    # 1009 modulus left only ~20 queries at x10 — +/-0.05 noise)
    qmod = max(1, n // 200)
    queries = v.filter(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    reranks = tuple(reranks) if reranks else (rerank,)
    out = {"detail": "budget_curve", "n_corpus": n, "base_entries": base,
           "n_queries": queries.count(), "rerank": reranks[0],
           "reranks": list(reranks), "tier": tier, "metric": metric,
           "points": []}
    truth = _ground_truth(spark, queries, _with_nrm(v), topk, metric=metric)
    for mult in multipliers:
        for rot in rotations:
            for s in sfx:
                force_drop_table(spark, f"{name}{s}")
            t0 = time.monotonic()
            if tier == "pq":
                qv = S.quantize_frame(v)
                R = None
                if rot is not None:
                    # external codebooks must train in the SAME space
                    # they'll encode in: learn the rotation here, train
                    # rotated, hand build_pq_index the explicit matrix
                    R = S.learn_opq_rotation(
                        qv, sample_modulus=S._opq_sample_modulus(n),
                        refine_iters=2 if rot == "opq-np" else 0,
                        n_entries=base * mult)
                src_q = qv if R is None else qv.withColumn(
                    "q", F.expr(S._rotate_expr("q", R)))
                cb = S.pq_codebooks_kmeans(
                    src_q, n_entries=base * mult, iters=2)
                S.build_pq_index(spark, v, name, codebooks=cb,
                                 rotation=R,
                                 rotation_kind=rot if R is not None
                                 else None, metric=metric)
                probe = lambda rr: S.ann_pq_probe(  # noqa: E731
                    spark, queries, name, k=topk, rerank=rr)
            else:
                S.build_ivfpq_index(spark, v, name,
                                    n_entries=base * mult,
                                    iters=2, rotation=rot,
                                    metric=metric)
                probe = lambda rr: S.ann_ivfpq_probe(  # noqa: E731
                    spark, queries, name, k=topk, rerank=rr)
            build_s = round(time.monotonic() - t0, 2)
            qrow = spark.table(f"{name}_qstats").collect()[0]
            for rr in reranks:
                timing = _timed(spark, lambda r=rr: probe(r), warm=warm)
                rec = _recall_against(truth, probe(rr))
                point = {"n_entries": base * mult, "mult": mult,
                         "rotation": rot or "none", "tier": tier,
                         "rerank": rr, "build_s": build_s,
                         "recall": rec,
                         "self_sim_kind": qrow["kind"],
                         "resid_self_sim": round(qrow["self_sim"], 4),
                         "probe_steady_s": timing.get("steady")}
                out["points"].append(point)
                print(json.dumps({"detail": "budget_point", **point}))
    for s in sfx:
        force_drop_table(spark, f"{name}{s}")
    print(json.dumps(out))
    return out


def run_rerank_curve(spark, src: str, topk: int = 5,
                     reranks=(20, 50, 100, 200), warm: int = 1,
                     tiers=("pq", "ivfpq"), metric: str = "cosine") -> dict:
    """The RERANK-DEPTH sizing table (r13): one flat-PQ build (learned
    codebooks) + one IVFPQ build at their default budgets, probed at
    rerank 20/50/100/200 — recall@k and steady probe wall per point.
    Deepening the exact re-rank shortlist is the only recall lever
    that needs NO rebuild; this prices it against the budget and
    nprobe tables.  ``reranks``/``tiers`` are CLI-settable (r15) so a
    single curve cell — e.g. the seed law-depth point at rerank=165
    the r14 retrain-recovery narrative interpolated — is one command
    without re-paying the other tier's build.  Each build also prints
    its ``index_info`` quantization/drift verdicts (``rerank_hint``,
    ``budget_limited``, ``tier_hint``) so the programmatic guidance
    can be read against the measured recall in the same log."""
    from hadoop_logfile_inputformat_spark.operators import similarity as S
    from hadoop_logfile_inputformat_spark.operators.tables import load

    v = load(spark, src, "embeddings").select("vec_id", "embedding")
    n = v.count()
    qmod = max(1, n // 200)  # ~200 queries at every scale
    queries = v.filter(F.col("vec_id") % qmod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = {"detail": "rerank_curve", "n_corpus": n,
           "n_queries": queries.count(), "metric": metric, "tiers": {}}
    truth = _ground_truth(spark, queries, _with_nrm(v), topk, metric=metric)
    sfx = ("_codes", "_quantized", "_centroids", "_codebooks",
           "_batches", "_stats", "_qstats")
    for tier in tiers:
        name = f"soak_rerank_{tier}"
        for s in sfx:
            force_drop_table(spark, f"{name}{s}")
        t0 = time.monotonic()
        if tier == "pq":
            qv = S.quantize_frame(v)
            # at the PQ-ENTRY default budget (r14 ADVICE fix: the
            # target defaulted to the ~80 ROUTING cap here, so the
            # published x100 flat-vs-IVFPQ rerank table compared an
            # 80-entry flat build against a 320-entry IVFPQ — the
            # corrected table is in SCALING.md)
            cb = S.pq_codebooks_kmeans(
                qv,
                n_entries=max(2, n // S._effective_modulus(
                    n, S.PQ_CODEBOOK_MODULUS, S.PQ_ENTRY_TARGET)),
                iters=2)
            S.build_pq_index(spark, v, name, codebooks=cb, metric=metric)
            probe = lambda rr: S.ann_pq_probe(  # noqa: E731
                spark, queries, name, k=topk, rerank=rr)
        else:
            S.build_ivfpq_index(spark, v, name, iters=2, metric=metric)
            probe = lambda rr: S.ann_ivfpq_probe(  # noqa: E731
                spark, queries, name, k=topk, rerank=rr)
        build_s = round(time.monotonic() - t0, 2)
        from hadoop_logfile_inputformat_spark.operators.maintenance import (
            index_info,
        )

        info = index_info(spark, name)
        print(json.dumps({
            "detail": "rerank_tier_info", "tier": tier,
            "quantization": info.get("quantization"),
            "seed_mean_sim": (info.get("drift") or {}).get("seed_mean_sim"),
            "retrain_recommended":
                (info.get("drift") or {}).get("retrain_recommended"),
        }))
        points = []
        for rr in reranks:
            timing = _timed(spark, lambda r=rr: probe(r), warm=warm)
            point = {"rerank": rr,
                     "recall": _recall_against(truth, probe(rr)),
                     "probe_steady_s": timing.get("steady")}
            points.append(point)
            print(json.dumps({"detail": "rerank_point", "tier": tier,
                              **point}))
        out["tiers"][tier] = {"build_s": build_s, "points": points}
        for s in sfx:
            force_drop_table(spark, f"{name}{s}")
    print(json.dumps(out))
    return out


def _stages(spark) -> dict:
    """stageId -> StageData from the UI REST API (local-mode UI)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        data = json.load(r)
    return {s["stageId"]: s for s in data}


def _resolve(name, scale: int = 1):
    # The ann_* modulus query sets grow WITH the corpus (vec_id % 50),
    # so their total inline work is quadratic in T by construction —
    # per-QUERY cost is the scale-relevant number.  Hold the query
    # count at its x1 value by scaling the modulus with the tiling.
    if scale > 1:
        from hadoop_logfile_inputformat_spark.operators import similarity

        scaled = {
            "ann_pq_topk": similarity.ann_pq_topk,
            "ann_ivf_topk": similarity.ann_ivf_topk,
            "ann_cosine_topk_arrow": similarity.cosine_topk_arrow,
            "ann_ivf_topk_kmeans": similarity.ann_ivf_topk_kmeans,
            "ann_pq_topk_kmeans": similarity.ann_pq_topk_kmeans,
            "ann_ivfpq_topk": similarity.ann_ivfpq_topk,
        }
        if name in scaled:
            fn = scaled[name]
            return lambda spark, d: fn(
                spark, d, query_modulus=similarity.QUERY_MODULUS * scale
            )
    return (
        bench.FAST_PATH.get(name)
        or bench.PORTABLE_TWINS.get(name)
        or bench.LIBRARY_ONLY.get(name)
        or bench.QUERIES.get(name)
        or bench.MEMBER_QUERIES[name]
    )


def measure(spark, sf_dir: str, key: str, warm: int = 2, scale: int = 1) -> dict:
    """bench-methodology timing + cold-run shuffle volume for one key."""
    clear_query_caches()
    fn = _resolve(key, scale)
    try:
        before = set(_stages(spark))
    except Exception:
        before = None
    t0 = time.monotonic()
    rows = len(fn(spark, sf_dir).collect())
    cold = time.monotonic() - t0
    shuffle = {}
    if before is not None:
        try:
            new = [s for i, s in _stages(spark).items() if i not in before]
            shuffle = {
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
                ),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
                ),
                "input_mb": round(
                    sum(s.get("inputBytes", 0) for s in new) / 1e6, 1
                ),
                "peak_stage_shuffle_mb": round(
                    max(
                        (s.get("shuffleWriteBytes", 0) for s in new),
                        default=0,
                    )
                    / 1e6,
                    1,
                ),
                "n_stages": len(new),
            }
        except Exception:
            pass
    steady = None
    for _ in range(warm):
        t0 = time.monotonic()
        rows = len(fn(spark, sf_dir).collect())
        dt = time.monotonic() - t0
        steady = dt if steady is None else min(steady, dt)
    return {
        "cold": round(cold, 2),
        "steady": round(steady, 2),
        "rows": rows,
        **shuffle,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_soak")
    ap.add_argument("--tiles", type=int, nargs="*", default=[10, 100])
    ap.add_argument("--keys", nargs="*", default=HEAVY_KEYS)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument(
        "--skew",
        action="store_true",
        help="build a skewed variant of the LARGEST scale dir and run "
        "the skew mitigation suite instead of the uniform key sweep",
    )
    ap.add_argument(
        "--deletes",
        action="store_true",
        help="run the tombstone-delete lifecycle measurement on the "
        "LARGEST scale dir instead of the uniform key sweep",
    )
    ap.add_argument(
        "--mixed-stream",
        action="store_true",
        help="run the mixed ingest+takedown streaming soak (>=50 "
        "micro-batches, compaction + retrain crossing) on the LARGEST "
        "scale dir",
    )
    ap.add_argument(
        "--drift-recall",
        action="store_true",
        help="run the drift→recall lifecycle measurement (IVFPQ "
        "degrade/retrain-recover + IVF robustness) on the LARGEST "
        "scale dir",
    )
    ap.add_argument(
        "--nprobe-curve",
        action="store_true",
        help="sweep nprobe on the LARGEST scale dir recording "
        "recall@k and steady probe wall",
    )
    ap.add_argument(
        "--budget-curve",
        action="store_true",
        help="sweep the PQ entry budget (1x/2x/4x/8x, rotation "
        "on/off) on the LARGEST scale dir recording recall@k, build "
        "wall, probe wall, and the _qstats residual self-sim",
    )
    ap.add_argument(
        "--rerank-curve",
        action="store_true",
        help="sweep the exact-rerank depth (20/50/100/200) on flat-PQ "
        "and IVFPQ indexes at the LARGEST scale dir",
    )
    ap.add_argument(
        "--reranks",
        type=int,
        nargs="*",
        default=None,
        help="rerank curve: probe at these shortlist depths instead "
        "of the default 20/50/100/200 ladder — one cell (e.g. the "
        "law depth 165 on the clustered seed) is one command",
    )
    ap.add_argument(
        "--rerank-tiers",
        nargs="*",
        choices=["pq", "ivfpq"],
        default=None,
        help="rerank curve: which tiers to build+probe (default both) "
        "— a single-tier cell skips the other tier's build wall",
    )
    ap.add_argument(
        "--alphas",
        type=float,
        nargs="*",
        default=None,
        help="drift-recall suite: the α-blend steps to append "
        "(default: the suite's 0.25/0.5/0.75/1.0 ladder) — lets a "
        "single missing cell (e.g. 1.0) be bought solo",
    )
    ap.add_argument(
        "--no-retrain",
        action="store_true",
        help="drift-recall suite: stop after the drift/recall steps "
        "(skip the retrain + post-retrain recovery columns)",
    )
    ap.add_argument(
        "--budget-tier",
        choices=["ivfpq", "pq"],
        default="ivfpq",
        help="budget curve: which PQ tier to sweep — 'pq' records the "
        "flat tier's kind=adc full-vector self-sim (the per-kind "
        "budget_limited floor's calibration data)",
    )
    ap.add_argument(
        "--budget-multipliers",
        type=int,
        nargs="*",
        default=None,
        help="budget curve: entry-budget multipliers over the legacy "
        "~80-entry base (default 1 2 4 8)",
    )
    ap.add_argument(
        "--budget-rotations",
        nargs="*",
        default=None,
        help="budget curve: rotation variants — 'none' and/or 'opq' "
        "(default both)",
    )
    ap.add_argument(
        "--budget-reranks",
        type=int,
        nargs="*",
        default=None,
        help="budget curve: probe each build at these shortlist "
        "depths (default: the single legacy 20) — one build, many "
        "recall points: prices the COMPOSED remedy (entries x rerank)",
    )
    ap.add_argument(
        "--metric",
        choices=["cosine", "l2", "ip"],
        default="cosine",
        help="budget/rerank curves: the index SERVING metric — builds "
        "pass it through, probes recover it from the index, ground "
        "truth ranks raw embeddings under it (r16: the l2 ADC-ceiling "
        "measurement)",
    )
    ap.add_argument(
        "--geometry",
        choices=["uniform", "clustered"],
        default="uniform",
        help="embedding geometry for the recall suites: 'uniform' = "
        "the fixture as-is (near-orthogonal — IVF's worst case), "
        "'clustered' = deterministic concept-cluster variant "
        "(build_clustered — the geometry real encoder embeddings "
        "exhibit)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="spark-graft-soak")
    dirs = [(1, args.base)]
    for t in args.tiles:
        d = os.path.join(args.out, f"x{t}")
        print(f"# building x{t} at {d} ...", file=sys.stderr)
        b0 = time.monotonic()
        build_tiled(spark, args.base, d, t)
        print(
            f"# built x{t} in {time.monotonic() - b0:.1f}s", file=sys.stderr
        )
        dirs.append((t, d))

    if args.deletes:
        scale, src = dirs[-1]
        out = run_delete_suite(spark, src, warm=args.warm)
        out["scale"] = scale
        print(json.dumps({**out, "detail": "delete_soak_summary"}))
        spark.stop()
        return

    if args.mixed_stream:
        scale, src = dirs[-1]
        if args.geometry == "clustered":
            cl = os.path.join(args.out, f"x{scale}_clustered")
            print(f"# building clustered x{scale} at {cl} ...",
                  file=sys.stderr)
            # the mixed soak reads only embeddings.parquet, which is
            # exactly what build_clustered rewrites
            build_clustered(spark, src, cl)
            src = cl
        out = run_mixed_stream_suite(spark, src, args.out)
        out["scale"], out["geometry"] = scale, args.geometry
        print(json.dumps({**out, "detail": "mixed_stream_summary"}))
        spark.stop()
        return

    if (args.drift_recall or args.nprobe_curve or args.budget_curve
            or args.rerank_curve):
        scale, src = dirs[-1]
        if args.geometry == "clustered":
            cl = os.path.join(args.out, f"x{scale}_clustered")
            print(f"# building clustered x{scale} at {cl} ...",
                  file=sys.stderr)
            build_clustered(spark, src, cl)
            src = cl
        if args.drift_recall:
            kw = {}
            if args.alphas:
                kw["alphas"] = tuple(args.alphas)
            if args.no_retrain:
                kw["retrain"] = False
            out = run_drift_recall_suite(spark, src, **kw)
            out["scale"], out["geometry"] = scale, args.geometry
            print(json.dumps({**out, "detail": "drift_recall_summary"}))
        if args.nprobe_curve:
            out = run_nprobe_curve(spark, src, warm=args.warm)
            out["scale"], out["geometry"] = scale, args.geometry
            print(json.dumps({**out, "detail": "nprobe_curve_summary"}))
        if args.budget_curve:
            kw = {"tier": args.budget_tier, "metric": args.metric}
            if args.budget_multipliers:
                kw["multipliers"] = tuple(args.budget_multipliers)
            if args.budget_rotations:
                kw["rotations"] = tuple(
                    None if r == "none" else r
                    for r in args.budget_rotations
                )
            if args.budget_reranks:
                kw["reranks"] = tuple(args.budget_reranks)
            out = run_budget_curve(spark, src, warm=args.warm, **kw)
            out["scale"], out["geometry"] = scale, args.geometry
            print(json.dumps({**out, "detail": "budget_curve_summary"}))
        if args.rerank_curve:
            kw = {"metric": args.metric}
            if args.reranks:
                kw["reranks"] = tuple(args.reranks)
            if args.rerank_tiers:
                kw["tiers"] = tuple(args.rerank_tiers)
            out = run_rerank_curve(spark, src, warm=args.warm, **kw)
            out["scale"], out["geometry"] = scale, args.geometry
            print(json.dumps({**out, "detail": "rerank_curve_summary"}))
        spark.stop()
        return

    if args.skew:
        scale, src = dirs[-1]
        sk = os.path.join(args.out, f"x{scale}_skew")
        print(f"# building skewed x{scale} at {sk} ...", file=sys.stderr)
        b0 = time.monotonic()
        build_skewed(spark, src, sk)
        print(
            f"# built skew in {time.monotonic() - b0:.1f}s", file=sys.stderr
        )
        results = run_skew_suite(spark, src, sk, warm=args.warm)
        print(
            json.dumps(
                {
                    "detail": "skew_summary",
                    "scale": scale,
                    "cases": {
                        r["skew_case"]: r.get("steady", r.get("error"))
                        for r in results
                    },
                }
            )
        )
        spark.stop()
        return

    results: dict[str, dict[int, dict]] = {k: {} for k in args.keys}
    for scale, d in dirs:
        for key in args.keys:
            try:
                m = measure(spark, d, key, warm=args.warm, scale=scale)
            except Exception as exc:  # noqa: BLE001 - record, keep going
                m = {"error": str(exc).split("\n", 1)[0][:160]}
            results[key][scale] = m
            print(json.dumps({"soak": key, "scale": scale, **m}))

    # markdown table for SCALING.md's measured section
    scales = [s for s, _ in dirs]
    hdr = ["key"] + [f"x{s} steady" for s in scales] + [
        f"x{scales[-1]} shuf W/R MB",
        "exponent",
    ]
    print("\n| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    exponents = {}
    for key in args.keys:
        cells = [key]
        for s in scales:
            m = results[key].get(s, {})
            cells.append(
                f"{m['steady']}s" if "steady" in m else m.get("error", "-")
            )
        last = results[key].get(scales[-1], {})
        cells.append(
            f"{last.get('shuffle_write_mb', '-')}/{last.get('shuffle_read_mb', '-')}"
        )
        if len(scales) >= 2:
            a, b = scales[-2], scales[-1]
            ma, mb = results[key].get(a, {}), results[key].get(b, {})
            if "steady" in ma and "steady" in mb and ma["steady"] > 0:
                exp = math.log(max(mb["steady"], 1e-3) / ma["steady"]) / math.log(
                    b / a
                )
                exponents[key] = round(exp, 2)
                cells.append(f"{exponents[key]}")
            else:
                cells.append("-")
        print("| " + " | ".join(str(c) for c in cells) + " |")
    print(
        json.dumps(
            {
                "detail": "soak_summary",
                "scales": scales,
                "exponents": exponents,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
