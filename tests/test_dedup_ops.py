"""Dedup operator units beyond the oracle queries: the SimHash
pigeonhole chunk join must find EXACTLY the pairs the all-pairs scan
finds (the guarantee is exact, not probabilistic)."""

import pyspark.sql.functions as F

from lakeflush_spark.io import load_table
from lakeflush_spark.operators.dedup import hamming64, simhash, simhash_near_dups


def _all_pairs_hamming(docs, max_hamming):
    sh = docs.select(F.col("doc_id").alias("doc"), simhash("text").alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id1"),
            F.col("b.doc").alias("id2"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def test_pigeonhole_equals_all_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for max_hamming in (2, 6):
        exact = {
            (r.id1, r.id2, r.hamming)
            for r in _all_pairs_hamming(docs, max_hamming).collect()
        }
        chunked = {
            (r.id1, r.id2, r.hamming)
            for r in simhash_near_dups(docs, max_hamming=max_hamming).collect()
        }
        assert chunked == exact
        assert exact  # non-trivial: planted near-dups collide at low distance


def test_pigeonhole_max_hamming_guard(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        simhash_near_dups(docs, max_hamming=40)
