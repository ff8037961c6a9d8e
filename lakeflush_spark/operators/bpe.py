"""BPE tokenizer training and encoding, Spark-first.

A training-data pipeline ships token counts and packing decisions in
TOKENIZER tokens, not whitespace words; `functions/text.py`'s
`bpe_token_count` is a regex APPROXIMATION. This module trains a real
byte-pair-encoding tokenizer on the corpus itself — the published BPE
recipe (Sennrich et al. 2016), split the way every production trainer
splits it:

- **The corpus-scale part runs in Spark**: one explode + map-side-
  combined groupBy builds the word histogram, and the distributed
  grouped top-k caps it at ``max_words`` distinct words (the standard
  trainer cap) — the only passes that touch the corpus, both linear.
- **The merge loop runs on the driver over the BOUNDED histogram**:
  classic pair-count/merge iterations on at most ``max_words``
  (word, count) entries — pure Python on kilobytes-to-megabytes of
  state, exactly how sentencepiece/HF trainers do it. No per-merge
  corpus scan (the naive distributed formulation would re-shuffle the
  corpus once per merge — 10k merges = 10k shuffles).
- **Encoding** applies the learned merge ranks per word inside an
  Arrow-batched ``mapInPandas`` (the declared Python-UDF surface):
  merges broadcast with the closure, no shuffle, output partitioning
  == input partitioning. A size-bounded per-partition word cache
  memoizes repeated words — Zipf makes the hit rate high, and the
  bound keeps high-cardinality "words" (URLs, ids) from growing
  executor memory.

Determinism: ties in pair frequency break lexicographically, so the
same corpus always learns the same merge table on any cluster layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakeflush_spark.functions.text import TOKEN_SEP, tokens

#: end-of-word marker (the classic </w>) — keeps merges from crossing
#: word boundaries while letting suffixes ("ing</w>") become tokens.
#: NB the standard-convention marker is a TEXT string: a corpus whose
#: words literally contain "</w>" (raw TEI/XML word tags) makes
#: ``"".join(tokens)`` ambiguous to DECODE. This engine only encodes
#: (token counting/packing); pre-escape the marker in such corpora if
#: detokenization matters.
EOW = "</w>"

#: bpe_encode's per-partition word-cache bound: Zipf means the hot
#: words fit long before this; high-cardinality "words" (URLs, ids)
#: must not grow executor memory without bound
_ENCODE_CACHE_MAX = 100_000


def word_histogram(
    docs: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
    counts: DataFrame | None = None,
) -> list[tuple[str, int]]:
    """(word, count) for the ``max_words`` most frequent corpus words —
    the bounded state the driver-side merge loop runs on. One explode +
    one groupBy; the cap is the two-phase grouped top-k (global group),
    so no single task sorts the full vocabulary. A caller that already
    holds the corpus word-count frame (columns ``w``, ``cnt``) passes
    it via ``counts`` and skips the second corpus scan (q41 shares one
    count between its 'word' and 'bpe' labels this way)."""
    from lakeflush_spark.operators.topk import grouped_top_k

    if counts is None:
        counts = (
            docs.select(F.explode(tokens(text_col)).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    top = grouped_top_k(
        counts.withColumn("_g", F.lit(1)),
        group_cols=["_g"],
        order_cols=[F.desc("cnt"), F.asc("w")],
        k=max_words,
        salt_cols=["w"],
    )
    return [(r.w, int(r.cnt)) for r in top.select("w", "cnt").collect()]


def train_bpe(
    docs: DataFrame,
    n_merges: int = 256,
    text_col: str = "text",
    max_words: int = 100_000,
    counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns the ordered merge table ``[(left, right), ...]`` — rank =
    list position, the artifact to persist alongside the corpus.
    Stops early when no pair occurs twice. ``counts`` forwards to
    :func:`word_histogram` (reuse a precomputed word-count frame).
    """
    vocab = {}
    for w, c in word_histogram(docs, text_col, max_words, counts=counts):
        vocab[tuple(list(w) + [EOW])] = c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _encode_schema(id_field: StructField) -> StructType:
    # the id column keeps its INPUT type (string ids, ints, uuids all
    # pass through unconverted) — hardcoding LongType failed at runtime
    # inside executors for non-long ids
    return StructType(
        [
            id_field,
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe", LongType()),
        ]
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(<id_col>, bpe_tokens, n_bpe) — the corpus encoded with the
    learned merge table. Arrow-batched ``mapInPandas``; the merge
    ranks ride the closure (broadcast, tiny), a size-bounded
    per-partition word cache exploits Zipf. Map-only: no shuffle,
    partitioning preserved. Word splitting follows the engine-wide
    ``TOKEN_SEP`` convention (functions/text.py)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = _encode_schema(docs.schema[id_col])

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is None:
                if len(cache) >= _ENCODE_CACHE_MAX:
                    cache.clear()  # Zipf: the hot set repopulates fast
                hit = cache[w] = _encode_word(w, ranks)
            return hit

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                for w in (text or "").split(TOKEN_SEP):
                    if w:
                        toks.extend(enc_word(w))
                rows.append((did, toks, len(toks)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return docs.select(id_col, text_col).mapInPandas(encode, schema)
