"""Every ORACLES entry must hash-match its Spark twin — the same check the
driver's t2 gate runs (at sf0.01; here sf0.001 for speed, sf0.01 in CI via
SPARK_GRAFT_TEST_SF).

Covers BOTH registries: the ≤50 driver-exported entries (QUERIES/ORACLES)
and the fine-grained driver=False variants (EXTRA_*) that were merged into
them — the merge must never silently break the underlying operator.
"""

from __future__ import annotations

import pytest

from datapipeline_omnichanneltobigquery_spark.plans.queries import (
    DRIVER_CAP,
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

from tests.conftest import SF_DIR
from tests.helpers import compare_spark_duckdb

_ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
_ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}


def test_registry_within_driver_cap():
    """The driver verifies only the first DRIVER_CAP exported entries —
    exporting more would leave queries invisibly unverified."""
    assert len(QUERIES) <= DRIVER_CAP, (
        f"{len(QUERIES)} driver entries > cap {DRIVER_CAP}; "
        "merge or mark driver=False"
    )
    assert not set(QUERIES) & set(EXTRA_QUERIES)


def _hugeint_cols(duck, sql: str) -> list[str]:
    rel = duck.sql(sql)
    return [c for c, t in zip(rel.columns, rel.types) if str(t) in ("HUGEINT", "UHUGEINT")]


def test_no_hugeint_oracle_outputs(duck):
    """Registry lint (VERDICT r8 #2): no oracle may expose an uncast integer
    SUM (or other HUGEINT-typed expression) as a final output column —
    DuckDB renders HUGEINT through Arrow as decimal128, which the driver's
    value hash sees as ``N.0`` while Spark's BIGINT renders ``N`` (the r8
    ``events_overlap_duration`` red row). Binding is lazy: no execution."""
    # self-check: the detector must flag a deliberately-broken fixture
    assert _hugeint_cols(duck, "SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)") == ["s"]
    assert _hugeint_cols(
        duck, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)"
    ) == []
    offenders = {}
    for name, sql in _ALL_ORACLES.items():
        bad = _hugeint_cols(duck, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles with HUGEINT output columns (add CAST(... AS BIGINT)): {offenders}"
    )


def test_no_truncating_div_on_signed_epochs():
    """Registry lint (VERDICT r9 #3): Spark's ``div`` truncates toward zero
    while DuckDB's ``//`` floors, so any ``unix_micros(...) div`` /
    ``epoch_us(...) div`` bucketing silently disagrees with its oracle for
    pre-1970 timestamps.  Epoch bucketing must use the floor-consistent
    ``a - pmod(a, w)`` idiom (rate_cap / streaming_rate_cap precedent);
    this sweep pins that no source file reintroduces the trap.  Same class
    as the r8 signed-% and HUGEINT sweeps."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / "datapipeline_omnichanneltobigquery_spark"
    pat = re.compile(r"(unix_micros|unix_millis|epoch_us|epoch_ms)\s*\([^)]*\)\s*div\b")
    offenders = [
        f"{p.relative_to(pkg)}:{i}"
        for p in sorted(pkg.rglob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line)
    ]
    assert not offenders, (
        f"truncating `div` on signed epoch values (use a - pmod(a, w)): {offenders}"
    )


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = _ALL_QUERIES[name](spark, SF_DIR)
    compare_spark_duckdb(sdf, duck, _ALL_ORACLES[name])


def test_every_query_runs(spark):
    for name, fn in _ALL_QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
