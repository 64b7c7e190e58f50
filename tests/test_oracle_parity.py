"""Every ORACLES entry must hash-match its Spark twin — the same check the
driver's t2 gate runs (at sf0.01; here sf0.001 for speed, sf0.01 in CI via
SPARK_GRAFT_TEST_SF)."""

from __future__ import annotations

import pytest

from datapipeline_omnichanneltobigquery_spark.plans.queries import ORACLES, QUERIES

from tests.conftest import SF_DIR
from tests.helpers import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    compare_spark_duckdb(sdf, duck, ORACLES[name])


def test_every_query_runs(spark):
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
