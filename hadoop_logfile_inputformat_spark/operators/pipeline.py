"""End-to-end training-corpus materialization.

The capstone composition a pretraining data pipeline runs over 100 TB:

    quality filter ∩ exact-dedup survivors ∩ near-dup representatives
        (operators/dedup.py:curate_documents)
    − benchmark-contaminated docs  (operators/text.py:decontaminate)
    − held-out benchmark docs      (doc_id % DECONTAM_MOD == 0)
    ∩ train split                  (operators/splits.py:corpus_split)
    → chunk + concat-and-cut pack  (operators/text.py:pack_chunks)

Every stage is an independently oracle-checked operator; the
composition adds only doc_id semi/anti joins (the eligible-doc set is
tiny relative to the corpus and hash-joins on the dedup'd key).  The
output is the actual training artifact: chunk rows with global token
offsets and context-window bin assignments over ONLY the curated,
decontaminated train-split documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.operators.dedup import curate_documents
from hadoop_logfile_inputformat_spark.operators.splits import corpus_split
from hadoop_logfile_inputformat_spark.operators.tables import load
from hadoop_logfile_inputformat_spark.operators.text import (
    DECONTAM_MOD,
    PACK_BUDGET,
    chunk_documents,
    decontaminate,
    pack_chunks,
)


def training_corpus(
    spark: SparkSession, sf_dir: str, budget: int = PACK_BUDGET
) -> DataFrame:
    """Packed training chunks over the curated train-split corpus.

    Scale shape: the only data-sized operations are the underlying
    stages' own (already bounded) shuffles plus one range shuffle for
    the pack cumsum; the eligibility reduction itself is two semi
    joins and one anti join on doc_id.
    """
    kept = curate_documents(spark, sf_dir)
    contaminated = decontaminate(spark, sf_dir).select("doc_id")
    train = (
        corpus_split(spark, sf_dir)
        .filter(F.col("split") == "train")
        .select("doc_id")
    )
    eligible = (
        kept.filter(F.col("doc_id") % DECONTAM_MOD != 0)
        .join(train, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
    )
    chunks = chunk_documents(spark, sf_dir).join(eligible, "doc_id", "left_semi")
    return pack_chunks(chunks, budget)


def curation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation audit: every gate's keep/drop flag side by
    side plus the conjunction — the row-level provenance a pipeline
    needs to answer "WHY was this document dropped?" (and to tune one
    gate without re-running the others).

    One row per document: heuristic quality, Gopher rules, unigram
    rarity, paragraph dedup, exact-substring dedup, and exact-hash
    survivorship.  All members are per-doc frames joined doc_id-equi —
    co-partitioned after the first shuffle, same plan at 100 TB.
    ``final_keep`` is the AND of all gates (the strictest composition;
    real runs pick their subset).
    """
    from hadoop_logfile_inputformat_spark.operators import dedup, text

    q = text.text_quality(spark, sf_dir).select("doc_id", "quality_keep")
    g = text.gopher_quality(spark, sf_dir).select("doc_id", "gopher_keep")
    r = text.rare_token_profile(spark, sf_dir).select("doc_id", "freq_keep")
    p = text.paragraph_dedup(spark, sf_dir).select("doc_id", "para_keep")
    s = text.substring_dedup(spark, sf_dir).select("doc_id", "substr_keep")
    e = dedup.exact_dedup(spark, sf_dir).select(
        "doc_id", (1 - F.col("is_dup")).cast("int").alias("exact_keep")
    )
    out = (
        q.join(g, "doc_id")
        .join(r, "doc_id")
        # paragraph_dedup emits no row for docs with zero >=min_chars
        # paragraphs: nothing to dedup there, so they default to keep
        .join(p, "doc_id", "left")
        .withColumn("para_keep", F.coalesce("para_keep", F.lit(1)))
        .join(s, "doc_id")
        .join(e, "doc_id")
    )
    gates = ["quality_keep", "gopher_keep", "freq_keep", "para_keep",
             "substr_keep", "exact_keep"]
    final = F.lit(1)
    for c in gates:
        final = final * F.col(c)
    return out.select("doc_id", *gates, final.cast("int").alias("final_keep"))


def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(language, source) corpus data card: document / character /
    token volume and the keep counts of each quality gate — the summary
    table a training-data run publishes alongside the corpus (mixture
    weights, filter hit rates, dedup rates per slice).

    Composition of the per-doc operators (language_id, text_quality,
    gopher_quality, token_counts, exact_dedup) joined on doc_id, then
    ONE groupBy on the (lang_pred, source) pair.  Every member join is
    doc_id-equi (co-partitioned after the first shuffle); the final
    aggregate is low-cardinality with map-side partials.  At 100 TB
    this is the same plan — the per-doc frames are one projection each
    over the same scan, and AQE coalesces the doc_id exchanges.
    """
    from hadoop_logfile_inputformat_spark.operators import dedup, text

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("n_chars")
    )
    lang = text.language_id(spark, sf_dir).select("doc_id", "lang_pred")
    quality = text.text_quality(spark, sf_dir).select("doc_id", "quality_keep")
    gopher = text.gopher_quality(spark, sf_dir).select("doc_id", "gopher_keep")
    toks = text.token_counts(spark, sf_dir).select("doc_id", "n_ws_tokens")
    ded = dedup.exact_dedup(spark, sf_dir).select("doc_id", "is_dup")
    joined = (
        d.join(lang, "doc_id")
        .join(quality, "doc_id")
        .join(gopher, "doc_id")
        .join(toks, "doc_id")
        .join(ded, "doc_id")
    )
    return joined.groupBy("lang_pred", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_ws_tokens").cast("long").alias("total_tokens"),
        F.sum("quality_keep").cast("long").alias("n_quality_keep"),
        F.sum("gopher_keep").cast("long").alias("n_gopher_keep"),
        F.sum(1 - F.col("is_dup")).cast("long").alias("n_exact_unique"),
    )
