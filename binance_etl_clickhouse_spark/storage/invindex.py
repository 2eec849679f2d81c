"""Materialized inverted index for keyword retrieval — the search-engine
read path, expressed as a partitioned-parquet layout.

BM25 over the raw corpus (`operators/corpus.bm25_topk`) re-tokenizes every
document per query batch. A search deployment instead materializes the
postings ONCE and answers every query from them — this module is that
layout, following the same design as the IVF cell-partitioned ANN table
(`operators/ivf.py`): the pruning dimension IS the partition key.

Layout:

- ``postings/`` — one row per (doc, term): ``(term, doc_id, tf, dl)``,
  parquet-partitioned by ``tbucket = hash60(term) % n_buckets``. A query
  for terms T reads only T's buckets — PartitionFilters prune the rest of
  the corpus driver-side before any task is scheduled. Bucketing by hash
  (not raw term) bounds the partition count and spreads hot terms' buckets
  evenly; within a bucket files are term-sorted so footer stats prune
  further.
- ``_invindex_meta.json`` — the two corpus scalars BM25 needs (n_docs,
  total_tokens) plus the bucket count and build seq; document frequency is
  computed from the pruned postings themselves at query time (exactly the
  same value as a full-corpus scan, because df only involves the queried
  terms — the pruning is EXACT for retrieval, not approximate).

Query-time scores are bit-identical to `operators/corpus.bm25_topk` over
the raw corpus: same idf/tf-norm expressions, same rounding, same
tie-breaks — pinned by `tests/test_invindex.py`. The index is rebuildable
at any time (`build()` overwrites atomically via a tmp dir + rename, same
crash-safety contract as ServingTable.compact).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.corpus import BM25_B, BM25_K1
from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
from binance_etl_clickhouse_spark.operators.texthash import hash60, tokens

META = "_invindex_meta.json"
TBUCKET = "tbucket"


class InvertedIndex:
    """Term-bucket-partitioned postings table + stats sidecar."""

    def __init__(self, path: str, n_buckets: int = 64):
        self.path = path
        self.n_buckets = n_buckets

    # -- build -------------------------------------------------------------

    def build(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """Tokenize once, write postings partitioned by term bucket.

        One explode + one (doc, term) partial-aggregated shuffle — the same
        cost as a single BM25 query over the raw corpus; every query after
        that reads only its own term buckets. Atomic swap via tmp+rename.
        """
        spark = df.sparkSession
        stats = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(tokens(text_col))).alias("t"),
        ).first()
        tok = ensure_min_parallelism(df).select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        postings = (
            tok.groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .withColumn(TBUCKET, (hash60("term") % self.n_buckets).cast("int"))
        )
        tmp = self.path + ".build.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            postings.repartition(TBUCKET)
            .sortWithinPartitions(TBUCKET, "term", "doc_id")
            .write.mode("overwrite")
            .partitionBy(TBUCKET)
            .parquet(os.path.join(tmp, "postings"))
        )
        meta = {
            "n_docs": int(stats["n"]),
            "total_tokens": int(stats["t"]),
            "n_buckets": self.n_buckets,
        }
        with open(os.path.join(tmp, META), "w") as f:
            json.dump(meta, f)
        old = self.path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(self.path):
            os.replace(self.path, old)
        os.replace(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return meta

    def append(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """Incrementally index NEW documents: their postings append into the
        existing bucket partitions (no rebuild, no read of old postings) and
        the stats sidecar advances by the delta. Query answers afterwards
        are identical to a from-scratch build over the union — document
        frequency is recomputed from the (now larger) pruned postings at
        query time, and the sidecar carries exact corpus totals.

        Caller contract: ``df`` contains only doc_ids not yet indexed
        (the same contract as ServingTable.append's ingest batches; the
        streaming corpus dedup produces exactly such batches).
        """
        stats = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(tokens(text_col))).alias("t"),
        ).first()
        tok = ensure_min_parallelism(df).select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        postings = (
            tok.groupBy("doc_id", "dl", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .withColumn(TBUCKET, (hash60("term") % self.n_buckets).cast("int"))
        )
        (
            postings.repartition(TBUCKET)
            .sortWithinPartitions(TBUCKET, "term", "doc_id")
            .write.mode("append")
            .partitionBy(TBUCKET)
            .parquet(os.path.join(self.path, "postings"))
        )
        m = self.meta()
        m["n_docs"] = int(m["n_docs"]) + int(stats["n"])
        m["total_tokens"] = int(m["total_tokens"]) + int(stats["t"])
        tmp = os.path.join(self.path, META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.path, META))
        return m

    def meta(self) -> dict:
        with open(os.path.join(self.path, META)) as f:
            return json.load(f)

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "postings"))

    # -- query -------------------------------------------------------------

    def bm25_topk(
        self,
        spark: SparkSession,
        queries: list[tuple[str, str]],
        k: int = 5,
    ) -> DataFrame:
        """Top-``k`` docs per query, answered FROM THE INDEX: the postings
        scan carries a PartitionFilter on the queried terms' buckets (plus
        a pushed term filter within them), so cost scales with the queried
        terms' posting lists, not the corpus. Scores are bit-identical to
        the raw-corpus `operators/corpus.bm25_topk` (same expressions,
        rounding, ties)."""
        from pyspark.sql import Window

        m = self.meta()
        n = float(m["n_docs"])
        t_tot = float(m["total_tokens"])
        n_buckets = int(m["n_buckets"])

        qterms = sorted({t for _, qtext in queries for t in qtext.split(" ")})
        buckets = sorted(
            {self._bucket_of(t, n_buckets) for t in qterms}
        )
        qt = spark.createDataFrame(
            [(qid, t) for qid, qtext in queries for t in sorted(set(qtext.split(" ")))],
            "query_id string, term string",
        )
        post = (
            self.postings(spark)
            .filter(F.col(TBUCKET).isin(buckets))  # -> PartitionFilters
            .filter(F.col("term").isin(qterms))  # -> PushedFilters in-bucket
        )
        dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_count"))
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n) - F.col("df_count") + F.lit(0.5)) / (F.col("df_count") + F.lit(0.5))
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * (F.col("dl").cast("double") * F.lit(n) / F.lit(t_tot))
        )
        contrib = F.round(
            idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (F.col("tf") + norm), 6
        )
        scored = (
            post.join(F.broadcast(dfreq), "term")
            .join(F.broadcast(qt), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col("doc_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
            .select("query_id", "doc_id", "bm25", "rnk")
        )

    @staticmethod
    def _bucket_of(term: str, n_buckets: int) -> int:
        """Driver-side twin of the hash60(term) % n_buckets bucket id."""
        import hashlib

        return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets
