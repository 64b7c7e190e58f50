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
