"""The main correctness gate, run locally at sf0.001 (driver runs sf0.01).

Every registered query must hash-match its DuckDB oracle.  The driver
contract permits oracle-less (rows-only) specs for non-SQL-expressible
ops, and the smoke branch below keeps that path working — but the repo's
standing claim is stronger: test_registry_contract asserts ZERO such
specs exist today, so adding one means consciously relaxing that
assertion, not silently downgrading a query's check.
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


def test_registry_contract():
    """Registry invariants the driver gate depends on, pinned without a
    Spark session:

    - ``_ROTATE_FIRST`` is exactly the 50-entry driver window, every name
      registered, and ``specs()`` leads with it in order (the driver
      verifies the FIRST 50 of ``queries()`` — a typo here silently
      un-stamps a row for the round);
    - every spec's fn is the function it names (the decorator binds to
      whatever ``def`` follows it — a helper defined inside a register
      block silently re-points the registry entry, which happened once);
    - no duplicate registrations, and every spec carries an oracle (the
      repo's standing claim: zero rows-only checks).
    """
    names = [s.name for s in SPECS]
    rf = list(q._ROTATE_FIRST)
    assert len(rf) == 50 and len(set(rf)) == 50
    assert names[:50] == rf
    assert len(names) == len(set(names))
    for s in SPECS:
        assert s.fn.__name__ == s.name, (s.name, s.fn.__name__)
        assert s.sql is not None, f"{s.name} lost its oracle"
