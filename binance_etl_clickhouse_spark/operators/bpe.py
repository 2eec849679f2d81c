"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The missing tokenizer-side piece of the training-data pipeline family
(token COUNTING lives in operators/text.py): learn the merge table itself
from the corpus, then encode documents with it.

Scale design (the part that matters at 100 TB):

- Training never iterates over the corpus. One corpus pass builds the
  word-frequency dictionary (explode + count — a partial-aggregated
  shuffle); every BPE iteration after that runs on the DISTINCT-WORD
  frame, whose cardinality is corpus vocabulary (tens of millions of rows
  at web scale — thousands of times smaller than the corpus) and which
  only ever shrinks in bytes as symbols merge.
- One iteration = one pair-count shuffle over the word frame + a 1-row
  argmax collect (the only driver round-trip, same shape as k-means'
  centroid update in operators/ivf.py) + a JVM-side fold projection that
  applies the merge. Lineage is truncated per iteration with an eager
  localCheckpoint so plan depth stays O(1), not O(n_merges).
- Encoding never replays merges over the corpus either: the trained word
  frame IS the encode dictionary (word -> final subword array), so
  encoding is a single broadcast (small vocab) or shuffle (huge vocab)
  equi-join on the word column — one pass over the corpus regardless of
  merge count.

Everything is integer/count arithmetic on deterministic orderings (ties
break on (freq DESC, left ASC, right ASC)), so a pure-Python reference
implementation reproduces results exactly (pinned in tests/test_bpe.py).
BPE training is a genuinely iterative algorithm — per the driver contract
it registers rows-only (no single-statement SQL twin exists); the
round-0 pair statistics, which ARE one aggregation, get a full DuckDB
oracle (queries/llm.py bpe_pair_stats).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.checkpoints import release as release_checkpoint
from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
from binance_etl_clickhouse_spark.operators.texthash import tokens

#: end-of-word marker, appended as a standalone symbol so merges can learn
#: word-final subwords ("ing</w>") distinctly from word-internal ones
EOW = "</w>"


def chars_with_eow(word: Column | str) -> Column:
    """Initial symbol sequence of a word: its characters + the EOW marker."""
    w = F.col(word) if isinstance(word, str) else word
    cs = F.filter(F.split(w, ""), lambda x: x != "")
    return F.concat(cs, F.array(F.lit(EOW)))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> word-frequency dictionary with initial symbol arrays.

    The ONE corpus-wide pass of BPE training: explode whitespace words,
    partial-aggregated count shuffle, then a per-row char split. Output
    columns: word, cnt, syms (array<string>).
    """
    w = ensure_min_parallelism(df).select(F.explode(tokens(text_col)).alias("word"))
    wc = w.filter(F.col("word") != "").groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.withColumn("syms", chars_with_eow("word"))


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies over the word dictionary, weighted
    by word count. One shuffle on (left, right) with map-side partials.
    Output: left, right, freq — the BPE merge-candidate table.

    The ``n >= 2`` guard is unreachable through :func:`word_counts` (every
    word carries at least one char + EOW) but defends direct callers
    passing 1-symbol arrays, where Spark's descending ``sequence(1, 0)``
    would otherwise emit a bogus (sym, null) pair.
    """
    n = F.size("syms")
    idx = F.sequence(F.lit(1), n - 1)
    pairs = F.when(
        n >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at("syms", i).alias("left"),
                F.element_at("syms", i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    ex = words.select(F.col("cnt"), F.explode(pairs).alias("p"))
    return ex.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("cnt").alias("freq")
    )


def merge_pair_expr(syms: Column | str, left: str, right: str) -> Column:
    """Greedy left-to-right single-pair merge over a symbol array.

    A pure JVM-side fold (F.aggregate) with a (out, carry) accumulator:
    carry holds the last unconsumed symbol; when (carry, x) equals the
    merge pair the fused symbol is emitted and carry clears, so overlapping
    occurrences resolve leftmost-first exactly like reference BPE
    ("aaa" + (a,a) -> ["aa","a"]). No UDF, no shuffle — a projection.
    """
    s = F.col(syms) if isinstance(syms, str) else syms
    fused = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, x):
        hit = acc.carry.isNotNull() & (acc.carry == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.struct(
                F.concat(acc.out, F.array(F.lit(fused))).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc.carry.isNotNull(), F.concat(acc.out, F.array(acc.carry)))
                .otherwise(acc.out)
                .alias("out"),
                x.alias("carry"),
            )
        )

    def finish(acc):
        return F.when(
            acc.carry.isNotNull(), F.concat(acc.out, F.array(acc.carry))
        ).otherwise(acc.out)

    return F.aggregate(s, init, step, finish)


@dataclass(frozen=True)
class BpeModel:
    """Learned merge table + the final word->subwords dictionary."""

    merges: list[tuple[str, str, int]]  # (left, right, freq) in learned order
    words: DataFrame  # word, cnt, syms (post-merge symbol arrays)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_freq: int = 2,
) -> BpeModel:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Driver loop over the distinct-word frame (see module docstring for the
    scale argument). Stops early when the best pair's frequency drops
    below ``min_freq``. Deterministic: argmax ties break on
    (freq DESC, left ASC, right ASC).
    """
    words = word_counts(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(words)
            .filter(F.col("left") != EOW)  # EOW never starts a merged symbol
            .orderBy(F.desc("freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        left, right, freq = top[0]["left"], top[0]["right"], int(top[0]["freq"])
        merges.append((left, right, freq))
        nxt = words.withColumn("syms", merge_pair_expr("syms", left, right))
        # eager localCheckpoint: truncates lineage so plan/analysis depth
        # stays O(1) across iterations. The previous iteration's blocks
        # must be freed EXPLICITLY — neither unpersist() nor the
        # ContextCleaner reclaims locally-checkpointed RDDs (verified; see
        # checkpoints.py) — or every iteration's full word frame would
        # stay pinned in executor storage for the app's lifetime.
        prev, words = words, nxt.localCheckpoint(eager=True)
        release_checkpoint(prev)
    return BpeModel(merges=merges, words=words)


def merges_df(spark: SparkSession, model: BpeModel) -> DataFrame:
    rows = [
        (i + 1, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(model.merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, freq long"
    )


def oov_subword_counts(oov_words: DataFrame, model: BpeModel) -> DataFrame:
    """word -> |subwords| for words OUTSIDE the training dictionary:
    replay the learned merges, in order, over each word's char+EOW array —
    exactly reference BPE's behavior on unseen words (each merge is the
    same greedy leftmost fold training used). Runs over the DISTINCT
    unseen-word frame only, so the replay cost is |OOV vocab| x n_merges
    projections, never corpus-sized. Input: a ``word`` column; output:
    (word, n_sub)."""
    syms: Column = chars_with_eow("word")
    for left, right, _freq in model.merges:
        syms = merge_pair_expr(syms, left, right)
    return oov_words.select("word", F.size(syms).alias("n_sub"))


def encode_token_counts(
    df: DataFrame, model: BpeModel, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document BPE token count via the dictionary join (no corpus-wide
    merge replay): explode words -> equi-join word->|subwords| -> per-doc
    sum. The dict side carries one small int per word, so Catalyst
    broadcasts it at test scale; a web-scale vocabulary falls back to a
    plain shuffled join on the same plan.

    Lossless on ANY corpus: words missing from the training dictionary
    (OOV — encoding a different corpus than the one trained on) are not
    silently dropped; the distinct unseen words get their subword counts
    from :func:`oov_subword_counts` (merge replay over the OOV vocabulary
    only — reference-BPE behavior for unseen words) and rejoin the same
    plan, so ``n_words`` always equals the corpus word count.
    """
    dict_df = model.words.select("word", F.size("syms").alias("n_sub"))
    ex = df.select(id_col, F.explode(tokens(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    oov = ex.select("word").distinct().join(dict_df.select("word"), "word", "left_anti")
    full_dict = dict_df.unionByName(oov_subword_counts(oov, model))
    return (
        ex.join(full_dict, "word")
        .groupBy(id_col)
        .agg(F.sum("n_sub").alias("n_bpe_tokens"), F.count(F.lit(1)).alias("n_words"))
    )


# ---------------------------------------------------------------------------
# Pure-Python reference (the pytest oracle for the iterative trainer).
# ---------------------------------------------------------------------------
def py_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Single-process twin of :func:`merge_pair_expr` (same fold)."""
    out: list[str] = []
    carry: str | None = None
    for x in syms:
        if carry is not None and carry == left and x == right:
            out.append(left + right)
            carry = None
        else:
            if carry is not None:
                out.append(carry)
            carry = x
    if carry is not None:
        out.append(carry)
    return out


def reference_bpe(
    word_cnt: dict[str, int], n_merges: int = 20, min_freq: int = 2
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """Exact single-process twin of :func:`train_bpe` (tests only).

    Returns (merge list, final word -> subword-array dictionary)."""
    words: dict[str, tuple[list[str], int]] = {
        w: (list(w) + [EOW], c) for w, c in word_cnt.items()
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        freqs: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                if a == EOW:
                    continue
                freqs[(a, b)] = freqs.get((a, b), 0) + c
        if not freqs:
            break
        (left, right), freq = min(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_freq:
            break
        merges.append((left, right, freq))
        for w, (syms, c) in words.items():
            words[w] = (py_merge(syms, left, right), c)
    return merges, {w: syms for w, (syms, _) in words.items()}
