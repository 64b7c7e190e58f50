"""Time individual gated queries idle, bench-identically (noop sink,
local[$SPARK_GRAFT_CPUS], 2x shuffle partitions, min of N passes).

Usage: python tools/time_queries.py [-nN] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_omnichanneltobigquery_spark.plans.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)
from datapipeline_omnichanneltobigquery_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="time_queries",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy().count().collect()
    for name in args:
        fn = QUERIES.get(name) or EXTRA_QUERIES[name]
        times = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        print(
            f"TIMED {name}: min={min(times):.3f} "
            f"all=[{', '.join(f'{t:.3f}' for t in times)}]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
