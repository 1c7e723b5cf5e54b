"""Trained BPE tokenizer (X4): byte-pair-encoding merges learned from
the corpus, applied executor-side.

`text.token_count_re` is a regex PROXY for tokenizer cost; this module
is the real thing, Spark-first in the way production tokenizer training
actually is (HF tokenizers, SentencePiece): the distributed part of BPE
training is exactly ONE word-count aggregation — merge learning then
runs on the (vocabulary-sized, corpus-size-free) word-frequency table.

* **Training**: one scan + one shuffle produces (word, count); the top
  ``max_vocab_words`` by (count desc, word asc) — a deterministic,
  geometry-bounded table — is collected and classic BPE runs on it
  driver-side: repeatedly merge the most frequent adjacent symbol pair
  (ties break lexicographically, so training is bit-reproducible).
  Corpus size only affects the one aggregation; merge learning costs
  O(n_merges · vocab · avg_word_len) regardless of corpus bytes.
* **Encoding**: an Arrow-batched pandas UDF applies merges by rank
  (lowest-rank pair first — the standard greedy BPE apply) with a
  per-word memo cache, so a batch with Zipfian word repetition encodes
  each distinct word once. Map-only, no shuffle.
* **Persistence**: merges as (rank, left, right) parquet rows through
  the Arrow path — any engine can read the model; load→encode is
  identical to train→encode (pinned).

Scale: training = one word-count shuffle (the same cost class as
TF-IDF's df pass) + a bounded collect declared by ``max_vocab_words``;
encoding = embarrassingly parallel. The 100 TB spelling trains on a
corpus sample or capped vocabulary (as every production tokenizer does)
and encodes the full corpus in one pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from realtime_data_pipeline_spark import text


def word_counts(
    df: DataFrame, text_col: str, max_vocab_words: int = 50_000
) -> list[tuple[str, int]]:
    """Deterministic top-``max_vocab_words`` (word, count) table: one
    explode + one groupBy shuffle, ordered (count desc, word asc) so the
    cap is a pure function of the corpus. The collect is bounded by the
    cap, not the corpus."""
    rows = (
        df.select(F.explode(text.words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_vocab_words)
        .collect()
    )
    return [(r["w"], int(r["n"])) for r in rows]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + n
    return pairs


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_vocab_words: int = 50_000,
) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus word counts.
    Returns ``{"merges": [(left, right), ...], "n_merges", "vocab_words"}``
    — merge order IS the rank table the encoder applies. Deterministic:
    the word table is capped by (count desc, word asc) and pair ties
    break by (count desc, pair lexicographic)."""
    wc = word_counts(df, text_col, max_vocab_words=max_vocab_words)
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in wc:
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # deterministic choice: max count, ties to the lexicographically
        # smallest pair
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        if pairs[best] < 2:
            break  # nothing repeats: further merges are noise
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return {
        "merges": merges,
        "n_merges": len(merges),
        "vocab_words": len(wc),
    }


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        r, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode_udf(model: dict):
    """Arrow-batched encoder: text → array of BPE tokens. Merges apply
    lowest-rank-first (standard greedy BPE); a per-word memo makes
    Zipfian batches cheap. Unseen characters pass through as singleton
    symbols — no OOV failure mode."""
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}

    @pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            toks: list[str] = []
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return encode


def bpe_token_count(model: dict, col: Column) -> Column:
    return F.size(bpe_encode_udf(model)(col))


def save_bpe(spark, model: dict, path: str) -> None:
    """Merges as (rank, left, right) parquet rows via the Arrow path —
    engine-portable; load→encode ≡ train→encode (pinned)."""
    pdf = pd.DataFrame(
        {
            "rank": np.arange(len(model["merges"]), dtype=np.int64),
            "left": [a for a, _ in model["merges"]],
            "right": [b for _, b in model["merges"]],
        }
    )
    spark.createDataFrame(
        pdf, "rank long, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> dict:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    merges = [(r["left"], r["right"]) for r in rows]
    return {"merges": merges, "n_merges": len(merges), "vocab_words": -1}
