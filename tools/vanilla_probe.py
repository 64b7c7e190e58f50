"""Strict vanilla-session parity probe — pre-clear a rotation queue.

Runs named registry entries (or every driver=False extra) against their
DuckDB oracles on a BARE SparkSession (local[4]) with the
America/Los_Angeles timezone — the driver's worst case for timestamp
rendering — using the same Arrow-strict compare as the pytest parity
suite.  The r10 workflow: run this over the round's new families before
queueing them for rotation, so first-contact driver failures of the r9
class (vanilla-session/timezone surprises) are impossible.

Usage:
    python tools/vanilla_probe.py name1,name2,...   # specific entries
    python tools/vanilla_probe.py --all-extras       # every extra with an oracle
    python tools/vanilla_probe.py ... /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(argv: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from datapipeline_omnichanneltobigquery_spark.plans.queries import (
        EXTRA_ORACLES,
        EXTRA_QUERIES,
        ORACLES,
        QUERIES,
    )
    from tests.helpers import compare_spark_duckdb

    args = [a for a in argv if not a.startswith("--")]
    all_q = {**QUERIES, **EXTRA_QUERIES}
    all_o = {**ORACLES, **EXTRA_ORACLES}
    # a dataset dir is whatever argument IS a directory AND is not a
    # registry name (ADVICE r12: a query named like a CWD subdir must not
    # be silently rerouted as the dataset path; ADVICE r11: the older
    # leading-slash heuristic silently ate relative paths as names)
    def _is_dataset_dir(a: str) -> bool:
        # a.split(",") yields [a] when comma-free, so the any() covers the
        # whole-argument case too
        return os.path.isdir(a) and not any(part in all_q for part in a.split(","))

    sf = next((a for a in args if _is_dataset_dir(a)), "/root/testdata/sf0.01")
    args = [a for a in args if a != sf]
    if "--all-extras" in argv:
        names = sorted(k for k in EXTRA_QUERIES if k in EXTRA_ORACLES)
    else:
        named = next(iter(args), None)
        if not named:
            print(__doc__)
            return 2
        names = named.split(",")

    spark = SparkSession.builder.master("local[4]").appName("vanilla_probe").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    fails = []
    for name in names:
        if name not in all_o:
            print(f"  {name:40s} SKIP (no oracle)")
            continue
        try:
            compare_spark_duckdb(all_q[name](spark, sf), duck, all_o[name])
            print(f"  {name:40s} OK")
        except Exception as exc:  # noqa: BLE001 — report-and-continue probe
            fails.append(name)
            print(f"  {name:40s} FAIL: {str(exc)[:200]}")
    print("ALL OK" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
