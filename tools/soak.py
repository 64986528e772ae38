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
