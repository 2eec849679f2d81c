"""Distributed unigram-LM tokenizer (Kudo 2018, SentencePiece's unigram
model): seed a substring vocabulary, EM-fit piece probabilities, prune to a
target vocab, encode by Viterbi segmentation.

The subword-tokenizer counterpart to operators/bpe.py, sharing its scale
architecture:

- **Training never iterates over the corpus.** One corpus pass builds the
  distinct-word frequency dictionary (explode + partial-aggregated count);
  seeding and every EM step run on that word frame, whose cardinality is
  corpus vocabulary — thousands of times smaller than the corpus at web
  scale.
- **One EM step** = a mapInPandas Viterbi pass over the word frame with the
  current piece table captured in the closure (vocab-sized — broadcast
  weight class), a piece-count shuffle (partial agg on the piece key), and
  one vocab-sized collect for the next iteration's table. Counts are
  integers (word_freq * usage), so every step is deterministic.
- **Encoding never re-segments the corpus.** The trained word frame IS the
  encode dictionary (word -> final piece array): encoding is one equi-join
  on the word column. OOV words fall back to per-character pieces (the
  single-char floor the vocab always retains), counted — never silently
  dropped (the BPE-OOV lesson).

Viterbi tie-break spec (shared by the engine pass and the independent
reference in tests/test_unigram.py): maximize total log-prob; on exact
float ties prefer FEWER pieces, then the lexicographically-smallest piece
sequence; the DP compares full (score, -n_pieces, seq) composites at every
node. Smoothing is additive (ALPHA over retained pieces), so zero-count
survivors keep a finite floor and probabilities renormalize exactly.

Like BPE training, the EM fit is genuinely iterative — the trainer
registers rows-only under the driver contract; the round-0 seed statistics
ARE a single aggregation and carry a full DuckDB oracle
(queries/corpus.py unigram_seed_piece_stats).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
from binance_etl_clickhouse_spark.operators.texthash import tokens

PIECE_MAX_LEN = 6
SEED_TOP = 40
VOCAB_TARGET = 48
EM_ITERS = 2
ALPHA = 0.1


@dataclass(frozen=True)
class UnigramModel:
    #: (piece, logp) sorted by (logp desc, piece) — rank order
    pieces: tuple[tuple[str, float], ...]

    @property
    def logp(self) -> dict[str, float]:
        return dict(self.pieces)


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq) distinct-word dictionary (one corpus pass)."""
    return (
        ensure_min_parallelism(df)
        .select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def seed_piece_stats(words: DataFrame, max_len: int = PIECE_MAX_LEN) -> DataFrame:
    """All substrings up to ``max_len`` with corpus-weighted occurrence
    counts — the seed-vocabulary statistic (piece, freq, n_words)."""
    w = F.col("word")
    n = F.length(w)
    # positions x lengths, flattened: substr(word, i, l) for every valid (i, l)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_len), n - i + 1)),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    exploded = words.select("word", "freq", F.explode(pieces).alias("piece"))
    return exploded.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("freq"),
        F.count_distinct("word").cast("long").alias("n_words"),
    )


def viterbi(word: str, logp: dict[str, float], max_len: int = PIECE_MAX_LEN):
    """Best segmentation per the tie-break spec; None if uncoverable.

    best[i] is the composite (score, -n_pieces, seq) for word[:i]; the
    final seq is returned. Pure function shared by EM and encoding.
    """
    n = len(word)
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand_best = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            s, neg_n, seq = best[j]
            cand = (s + lp, neg_n - 1, seq + (piece,))
            if cand_best is None or cand > cand_best:
                cand_best = cand
        best[i] = cand_best
    return None if best[n] is None else list(best[n][2])


def _segment_or_chars(word: str, logp: dict[str, float]) -> list[str]:
    seg = viterbi(word, logp)
    return seg if seg is not None else list(word)


def _em_counts(words: DataFrame, logp: dict[str, float]) -> DataFrame:
    """E-step: Viterbi-segment the word frame, emit (piece, weighted count)."""
    import pandas as pd

    lp = dict(logp)  # captured vocab-sized table

    def run(iterator):
        for pdf in iterator:
            counts: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in _segment_or_chars(str(word), lp):
                    counts[piece] = counts.get(piece, 0) + int(freq)
            if counts:
                yield pd.DataFrame(
                    {"piece": list(counts), "cnt": list(counts.values())}
                )

    part = words.mapInPandas(run, schema="piece string, cnt long")
    return part.groupBy("piece").agg(F.sum("cnt").cast("long").alias("cnt"))


def _normalize(counts: dict[str, int], vocab: list[str]) -> dict[str, float]:
    total = sum(counts.get(p, 0) for p in vocab)
    v = len(vocab)
    return {
        p: math.log((counts.get(p, 0) + ALPHA) / (total + ALPHA * v)) for p in vocab
    }


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    seed_top: int = SEED_TOP,
    vocab_target: int = VOCAB_TARGET,
    em_iters: int = EM_ITERS,
) -> UnigramModel:
    words = word_freqs(df, text_col)
    stats = seed_piece_stats(words)
    # seed vocab: top pieces by (freq desc, piece) + every single character
    top = (
        stats.orderBy(F.col("freq").desc(), "piece")
        .limit(seed_top)
        .select("piece", "freq")
        .collect()
    )
    chars = (
        stats.filter(F.length("piece") == 1).select("piece", "freq").collect()
    )
    seed_counts: dict[str, int] = {}
    for r in [*top, *chars]:
        seed_counts[r.piece] = int(r.freq)
    vocab = sorted(seed_counts)
    logp = _normalize(seed_counts, vocab)
    counted: dict[str, int] = dict(seed_counts)
    for _ in range(em_iters):
        counted = {
            r.piece: int(r.cnt) for r in _em_counts(words, logp).collect()
        }
        logp = _normalize(counted, vocab)
    # prune to target: keep all single chars, then best multi-char pieces
    chars_v = [p for p in vocab if len(p) == 1]
    multi = sorted(
        [p for p in vocab if len(p) > 1], key=lambda p: (-logp[p], p)
    )[: max(0, vocab_target - len(chars_v))]
    kept = sorted([*chars_v, *multi])
    final_counts = {p: counted.get(p, 0) for p in kept}
    final_logp = _normalize(final_counts, kept)
    ordered = sorted(final_logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return UnigramModel(pieces=tuple(ordered))


def word_segments(words: DataFrame, model: UnigramModel) -> DataFrame:
    """Trained word dictionary -> (word, pieces array) via the final vocab."""
    import pandas as pd

    lp = model.logp

    def run(iterator):
        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [
                        _segment_or_chars(str(w), lp) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(run, schema="word string, pieces array<string>")


def encode_piece_counts(
    df: DataFrame, model: UnigramModel, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document encoding stats through a word-dictionary equi-join.

    The dictionary is the CORPUS's own distinct-word frame segmented with
    the trained vocab (so words unseen at training time — OOV — still
    segment, via the char-level floor inside the segmenter; a word whose
    characters are all unseen falls back to its raw characters). The
    corpus itself is touched once: explode + one broadcast join on the
    word column.
    """
    corpus_words = (
        ensure_min_parallelism(df)
        .select(id_col, F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
    )
    dict_words = corpus_words.select("word").distinct()
    segs = word_segments(dict_words, model)
    joined = corpus_words.join(F.broadcast(segs), "word", "left")
    n_pieces = F.coalesce(F.size("pieces"), F.length("word")).cast("long")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(n_pieces).cast("long").alias("n_pieces"),
            F.round(
                F.sum(F.length("word")) / F.sum(n_pieces).cast("double"), 6
            ).alias("chars_per_piece"),
        )
    )
