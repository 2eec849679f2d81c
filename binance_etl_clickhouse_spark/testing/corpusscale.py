"""Shared 10x-corpus synthesizer for the per-round scaling bench.

The dedup/similarity designs claim near-linear scaling (bucketed joins,
no all-pairs). bench.py and scripts/corpus_scale_rehearsal.py MEASURE
that claim against a synthesized 10x corpus; the synthesizer lives here
so the two can't drift.

Each source document is replicated ``replicas`` times with per-replica id
offsets; odd replicas get a per-replica unique token appended (NOT exact
dups of anything, still near-dups of their source) while even replicas
stay exact dups — the realistic re-post-heavy ingest shape, containing
both true near-dup groups and distinct content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synth_replicated_corpus(
    docs: DataFrame, scratch_path: str, replicas: int = 10
) -> DataFrame:
    """Replicate ``docs`` (doc_id, text) ``replicas``x into ``scratch_path``
    and return the reloaded frame (materialized so timing runs don't pay
    the synthesis)."""
    spark = docs.sparkSession
    docs = docs.select("doc_id", "text")
    n = docs.count()
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    # new_id must be materialized BEFORE the perturbation references it:
    # sibling aliases inside one select() don't shadow input columns, so a
    # single-select version would suffix the ORIGINAL doc_id and make all
    # odd replicas of a document identical to each other
    big = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("new_id", F.col("doc_id") + F.col("rep") * n)
        .select(
            F.col("new_id").alias("doc_id"),
            F.when(
                F.col("rep") % 2 == 1,
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("uniq"), F.col("new_id"))
                ),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    big.write.mode("overwrite").parquet(scratch_path)
    return spark.read.parquet(scratch_path)
