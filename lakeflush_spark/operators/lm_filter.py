"""N-gram language-model quality filtering (the CCNet recipe).

Published web-scale pipelines (CCNet, RefinedWeb, FineWeb) filter or
bucket documents by language-model perplexity: fluent in-domain text
scores high, boilerplate/gibberish/SEO spam scores low. The full
recipe uses a KenLM model; this is the Spark-native equivalent with a
bigram LM TRAINED IN THE SAME ENGINE — no external model artifact,
fully deterministic, and good enough to rank fluent vs degenerate
text (the published threshold step is a quantile cut on these scores,
e.g. ``F.percentile_approx`` over ``avg_logprob``).

Model = add-alpha-smoothed bigram over HASHED tokens:

    P(w2 | w1) = (c(w1, w2) + alpha) / (c(w1·) + alpha * B)

Tokens are hashed into ``B`` buckets (``xxhash64 % B``), so the
vocabulary — and with it every frame below — is BOUNDED regardless of
corpus size: no top-K vocab collection, no driver-side state.

Scale shapes:

- **train**: explode docs to bigram rows, ONE map-side-combined
  groupBy on the (h1, h2) hash pair (plus the unigram context counts
  derived from the same frame — no second corpus scan). Output is
  observed-bigram-sized, ≪ corpus.
- **score**: explode docs to bigram rows, equi-join the LM (one row
  per key — hot bigrams like "of the" skew the shuffle but cannot
  explode it; AQE splits them), then groupBy doc_id mean. Bodies
  never shuffle — only (doc_id, h1, h2) triples.

The reference has no analog (opaque string records).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from lakeflush_spark.functions.text import token_hash, tokens


def _tok_hash(t: Column, buckets: int, hash_fn: str) -> Column:
    """Token → [0, buckets) bucket id. ``"xxhash64"`` (default) is the
    fast JVM path; ``"md5"`` uses the engine-wide
    ``conv(substring(md5, 1, 8), 16, 10)`` trick so DuckDB can rebuild
    identical bucket ids (the q41 oracle twin)."""
    if hash_fn == "md5":
        return F.pmod(token_hash(t), F.lit(buckets))
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(t), F.lit(buckets))
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def _hashed_bigrams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, h1, h2) rows — one per adjacent token pair. Docs with < 2
    tokens contribute nothing (their score is NULL downstream).

    The pair array is built over the first size-1 tokens so the last
    token never fabricates a phantom pair (NB: ``xxhash64(NULL)``
    returns the hash seed, NOT NULL — a trailing-element filter on the
    hash cannot work)."""
    tk = tokens(text_col)
    heads = F.when(F.size(tk) >= 2, F.slice(tk, 1, F.size(tk) - 1)).otherwise(
        F.array().cast("array<string>")
    )
    pairs = F.transform(
        heads,
        lambda t, i: F.struct(
            _tok_hash(t, buckets, hash_fn).alias("h1"),
            _tok_hash(F.get(tk, i + 1), buckets, hash_fn).alias("h2"),
        ),
    )
    return docs.select(F.col(id_col).alias("_id"), F.explode(pairs).alias("_bg")).select(
        "_id", F.col("_bg.h1").alias("h1"), F.col("_bg.h2").alias("h2")
    )


def train_bigram_lm(
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1 << 20,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bigram count table ``(h1, h2, c12, c1)`` over hashed tokens.

    ``c12`` = count of the (h1, h2) pair; ``c1`` = total count of
    context h1 (sum of its outgoing pairs — attached via a window over
    the already-aggregated count frame, so the corpus is scanned
    once). Persist/write the result for reuse across scoring runs.
    """
    counts = (
        _hashed_bigrams(train_docs, id_col, text_col, buckets, hash_fn)
        .groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    ctx = counts.groupBy("h1").agg(F.sum("c12").alias("c1"))
    # both sides are observed-bigram/context-sized (≪ corpus); the
    # equi-join on h1 re-uses the groupBy partitioning
    return counts.join(ctx, "h1").select("h1", "h2", "c12", "c1")


def _smoothed_logprob(c12: Column, c1: Column, alpha: float, buckets: int) -> Column:
    return F.log(
        (c12 + F.lit(alpha)) / (c1 + F.lit(float(alpha) * buckets))
    )


def lm_logprob_scores(
    lm: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1 << 20,
    alpha: float = 0.1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Attach ``avg_logprob`` (mean per-bigram log P, 4 dp) to every
    doc: the LM-quality score — higher = more fluent under the
    training corpus; ``exp(-avg_logprob)`` is the perplexity.

    ``buckets`` and ``hash_fn`` MUST match the values the LM was
    trained with (hashes must agree). Unseen bigrams get the smoothed floor
    ``alpha / (c1 + alpha·B)`` (or the uniform ``1/B`` for unseen
    contexts), so no score is -inf. Docs with < 2 tokens get NULL.
    """
    bg = _hashed_bigrams(docs, id_col, text_col, buckets, hash_fn)
    # left-join pair counts, then context counts for pairs unseen in
    # training (both LM-sized frames, one row per key)
    pair_lp = bg.join(lm.select("h1", "h2", "c12", "c1"), ["h1", "h2"], "left")
    ctx = lm.select("h1", "c1").dropDuplicates(["h1"])
    pair_lp = (
        pair_lp.withColumnRenamed("c1", "_c1_hit")
        .join(ctx, "h1", "left")
        .withColumn(
            "_lp",
            F.coalesce(
                _smoothed_logprob(F.col("c12"), F.col("_c1_hit"), alpha, buckets),
                # bigram unseen, context seen: alpha / (c1 + alpha·B)
                _smoothed_logprob(F.lit(0), F.col("c1"), alpha, buckets),
                # context unseen: uniform over the bucket space
                F.lit(math.log(1.0 / buckets)),
            ),
        )
    )
    scores = pair_lp.groupBy(F.col("_id").alias(id_col)).agg(
        F.round(F.avg("_lp"), 4).alias("avg_logprob")
    )
    return docs.join(scores, id_col, "left")
