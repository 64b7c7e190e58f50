"""Paginated-API source with the reference's termination/retry semantics.

Reproduces ``CaresoftAPIClient.fetch_data`` (omnichannel_to_bq.py:33-61):

* pages are fetched ``page=1..n`` with an event-time window pushed to the
  source as parameters (:41) — predicate pushdown at the source boundary;
* per-page retry up to ``max_retries`` attempts (:38-57);
* termination on empty page (:46-48) or short page ``len < count`` (:58-59);
* retries exhausted → the *partial* accumulated result is returned — fetch
  is best-effort (:55-57, :61).

Scale design: the reference fetches sequentially on one thread.  Here the
sequential driver loop exists only to *discover* the page count cheaply
(:func:`fetch_paginated`); when the caller already knows the page range,
:func:`paginated_to_df` distributes page fetches across executors with
``spark.range(n_pages)`` + ``mapInPandas`` so a 1000-executor cluster pulls
1000 pages concurrently, and rows never accumulate on the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# A page function: (page_number) -> list of JSON-ish record dicts.
# Raising signals a transient failure (the reference's requests exception).
PageFn = Callable[[int], list[dict]]


def fetch_paginated(
    fetch_page: PageFn,
    count: int = 500,
    max_retries: int = 10,
    max_pages: int | None = None,
) -> list[dict]:
    """Sequential best-effort pagination — the reference's exact control flow.

    Returns the accumulated records.  ``max_pages`` is a safety valve the
    reference lacks (it can loop forever on a misbehaving API).
    """
    all_objs: list[dict] = []
    page = 1
    while max_pages is None or page <= max_pages:
        data = None
        retries = 0
        while retries < max_retries:
            try:
                data = fetch_page(page)
                if not data:
                    return all_objs  # empty page → done (:46-48)
                all_objs.extend(data)
                page += 1
                break
            except Exception:
                retries += 1
                data = None
        if data is None:
            break  # retries exhausted → partial result (:55-57)
        if len(data) < count:
            break  # short page → done (:58-59)
    return all_objs


def paginated_to_df(
    spark: SparkSession,
    fetch_page: PageFn,
    n_pages: int,
    schema: StructType | str,
    count: int = 500,
    max_retries: int = 10,
) -> DataFrame:
    """Distributed page fetch: each executor task pulls a slice of pages.

    ``fetch_page`` must be picklable (a module-level function or closure over
    simple state).  Per-page retry/best-effort semantics match the reference;
    an exhausted page yields no rows rather than failing the job.
    """

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for page in pdf["id"].tolist():
                page = int(page) + 1  # spark.range is 0-based; pages are 1-based
                retries = 0
                while retries < max_retries:
                    try:
                        data = fetch_page(page)
                        if data:
                            yield pd.DataFrame(data)
                        break
                    except Exception:
                        retries += 1

    # One page per task: page fetches are network-bound, so fine-grained
    # tasks keep executors busy and let stragglers be retried independently.
    pages = spark.range(0, n_pages, numPartitions=max(1, n_pages))
    return pages.mapInPandas(fetch_partition, schema=schema)
