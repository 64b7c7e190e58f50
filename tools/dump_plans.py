"""Dump .explain("formatted") for gated queries into plans/<round>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]   # default: all gated

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1, the bench scale)
so size-driven planner decisions (broadcast thresholds, AQE) match what the
bench actually executes.  Queries whose builders run eager jobs (the HITS
power loop localCheckpoints each round) still produce a plan: the file then
shows the post-checkpoint tail, and the in-loop shape is documented in
OPTIMIZATION_r15.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_omnichanneltobigquery_spark.plans.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)
from datapipeline_omnichanneltobigquery_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:] or sorted(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r16")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{tag}", master="local[8]")
    for name in names:
        fn = QUERIES.get(name) or EXTRA_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
