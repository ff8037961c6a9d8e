"""Every declared query with an oracle must hash-match DuckDB (t2 gate)."""

import pytest

from lakeflush_spark.plans import QUERIES
from lakeflush_spark.testing import run_query_vs_oracle

ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    problems = run_query_vs_oracle(spark, sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name].builder(spark, sf_dir)
    assert df.count() >= 0
