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
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
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
        spark.sql(f"DROP TABLE IF EXISTS {name}{s}")
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
