"""The main correctness gate, run locally at sf0.001 (driver runs sf0.01).

Every registered query with an oracle must hash-match DuckDB; queries
without an oracle must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from spark_hadoop_automation_in_cloud_spark import queries as q
from tests.oracle import compare, duck_con

SPECS = q.specs()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, sf_dir, con, spec):
    df = spec.fn(spark, sf_dir)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    errs = compare(df, con, spec.sql, spec.name)
    assert not errs, "\n".join(errs)
