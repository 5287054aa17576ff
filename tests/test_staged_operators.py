"""Oracle differential tests for the STAGED operator pack
(operators/staged.py) — same gate as tests/test_query_oracle.py, run
locally this round; the driver sees these keys when round 7 adds
``staged`` to ``operators._modules()``.
"""

from __future__ import annotations

import pytest

from parquet_stream_writer_spark.operators import staged

from tests.conftest import assert_results_match


@pytest.mark.parametrize("name", sorted(staged.QUERIES))
def test_staged_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = staged.QUERIES[name](spark, sf_dir)
    assert name in staged.ORACLE
    assert_results_match(df, oracle_con, staged.ORACLE[name])


def test_staged_keys_not_yet_registered():
    """While staged, these keys must NOT appear in the driver registry
    (they would displace this round's window composition)."""
    from parquet_stream_writer_spark.operators import all_queries

    live = set(all_queries())
    assert not (set(staged.QUERIES) & live)
