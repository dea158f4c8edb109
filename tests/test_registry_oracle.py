"""The main correctness gate, run locally: every registered query with
an oracle must hash-match DuckDB on the same fixtures (mirrors the
driver's CORRECTNESS check at sf0.01; we run sf0.001 for speed —
override with SPARK_GRAFT_TEST_SF_DIR)."""

from __future__ import annotations

import pytest

from flink_engagement_pipeline_spark import plans

from .oracle_utils import assert_matches_oracle

SPECS = sorted(plans.REGISTRY.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, sf_dir, spec):
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
    else:
        assert_matches_oracle(df, spec.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
