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
