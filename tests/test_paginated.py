"""Paginated source semantics (SURVEY.md §2.3 item 7): empty-page stop,
short-page stop, retry-exhaustion → best-effort partial result."""

from __future__ import annotations

import pytest

from datapipeline_omnichanneltobigquery_spark.sources.paginated import (
    fetch_paginated,
    paginated_to_df,
)


def _pages(pages: dict[int, list[dict]]):
    def fetch(page: int) -> list[dict]:
        return pages.get(page, [])

    return fetch


def test_stops_on_empty_page():
    fetch = _pages({1: [{"id": 1}], 2: [{"id": 2}]})
    # count=1 means full pages; page 3 is empty → stop, keep everything
    assert [r["id"] for r in fetch_paginated(fetch, count=1)] == [1, 2]


def test_stops_on_short_page():
    fetch = _pages({1: [{"id": 1}, {"id": 2}], 2: [{"id": 3}]})
    assert [r["id"] for r in fetch_paginated(fetch, count=2)] == [1, 2, 3]


def test_retry_exhaustion_returns_partial():
    calls = {"n": 0}

    def flaky(page: int) -> list[dict]:
        if page == 2:
            calls["n"] += 1
            raise ConnectionError("boom")
        return [{"id": page}] if page == 1 else []

    got = fetch_paginated(flaky, count=1, max_retries=3)
    assert [r["id"] for r in got] == [1]  # partial, no raise (:55-57, :61)
    assert calls["n"] == 3


def test_transient_failure_then_success():
    state = {"fails": 2}

    def flaky(page: int) -> list[dict]:
        if page == 1 and state["fails"] > 0:
            state["fails"] -= 1
            raise TimeoutError
        return [{"id": page}] if page <= 2 else []

    assert [r["id"] for r in fetch_paginated(flaky, count=1, max_retries=5)] == [1, 2]


def test_distributed_page_fetch(spark):
    def fetch(page: int) -> list[dict]:
        return [{"id": page * 10 + i} for i in range(3)] if page <= 4 else []

    df = paginated_to_df(spark, fetch, n_pages=6, schema="id long", count=3)
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(p * 10 + i for p in range(1, 5) for i in range(3))


# module-level page functions for the Data Source API tests: data-source
# options are strings, so the source imports these by "module:function"
# name on each executor (python workers are separate processes — the
# function must be importable, not pickled).
def ds_pages(page: int) -> list[dict]:
    if page > 4:
        return []
    return [{"id": page * 10 + i, "name": f"r{page}_{i}"} for i in range(3)]


def ds_pages_page2_broken(page: int) -> list[dict]:
    if page == 2:
        raise TimeoutError("transient")
    return ds_pages(page)


def test_datasource_paginated_rest_reads_all_pages(spark):
    """The Python Data Source form: one input partition per page, rows
    streamed from executors, result identical to the sequential fetch."""
    from datapipeline_omnichanneltobigquery_spark.sources.paginated import (
        fetch_paginated,
        register_paginated_source,
    )

    register_paginated_source(spark)
    df = (
        spark.read.format("paginated_rest")
        .schema("id long, name string")
        .option("page_fn", "tests.test_paginated:ds_pages")
        .option("n_pages", "4")
        .load()
    )
    got = sorted((r.id, r.name) for r in df.collect())
    seq = sorted((r["id"], r["name"]) for r in fetch_paginated(ds_pages, count=3, max_pages=4))
    assert got == seq and len(got) == 12
    assert df.rdd.getNumPartitions() == 4  # one partition per page


def test_datasource_paginated_rest_partial_on_exhausted_page(spark):
    """A page that fails past the retry budget yields nothing; the other
    pages still load — the reference's best-effort partial fetch."""
    from datapipeline_omnichanneltobigquery_spark.sources.paginated import (
        register_paginated_source,
    )

    register_paginated_source(spark)
    df = (
        spark.read.format("paginated_rest")
        .schema("id long, name string")
        .option("page_fn", "tests.test_paginated:ds_pages_page2_broken")
        .option("n_pages", "4")
        .option("max_retries", "2")
        .load()
    )
    pages_seen = sorted({r.id // 10 for r in df.collect()})
    assert pages_seen == [1, 3, 4]
