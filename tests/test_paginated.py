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


# ---------------------------------------------------------------------------
# Socket-level HTTP tests (r5 VERDICT #5): a real in-process HTTP server
# serving paginated JSON with injected failures, driven both through the
# sequential fetch and through spark.read.format("paginated_rest") —
# omnichannel_to_bq.py:33-61 is the reference's whole ingestion story, so it
# gets exercised over an actual socket, not just the injectable page fn.
# ---------------------------------------------------------------------------

import json as _json
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

# Executors are separate processes, so the server port travels through a
# file (data-source options are strings).  The path derives from this
# file's location (works on any checkout) plus a per-run suffix from
# SPARK_GRAFT_TEST_RUN_ID (set in conftest BEFORE the JVM starts, so
# executor workers inherit it) — concurrent runs don't race on one file.


def _port_file() -> str:
    import os

    run_id = os.environ.get("SPARK_GRAFT_TEST_RUN_ID", "0")
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scratch",
        f"http_test_port.{run_id}",
    )


def http_page_fn(page: int) -> list[dict]:
    """Module-level page fetcher the data source imports on executors:
    GET /items?page=N against the test server, raising on HTTP 5xx (the
    reference's requests exception → retry signal)."""
    with open(_port_file()) as f:
        port = int(f.read().strip())
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/items?page={page}", timeout=10) as r:
        return _json.loads(r.read().decode())


class _PagedHandler(BaseHTTPRequestHandler):
    """Paginated API: pages 1-3 full (3 records), page 4 short (1), page 5+
    empty.  fail_plan maps page -> number of 500s to serve before success
    (-1 = always fail).  hits counts requests per page."""

    fail_plan: dict[int, int] = {}
    hits: dict[int, int] = {}

    def do_GET(self):  # noqa: N802 (stdlib naming)
        page = int(parse_qs(urlparse(self.path).query)["page"][0])
        cls = type(self)
        cls.hits[page] = cls.hits.get(page, 0) + 1
        remaining = cls.fail_plan.get(page, 0)
        if remaining == -1 or remaining > 0:
            if remaining > 0:
                cls.fail_plan[page] = remaining - 1
            self.send_response(500)
            self.end_headers()
            return
        if page <= 3:
            recs = [{"id": page * 10 + i, "name": f"r{page}_{i}"} for i in range(3)]
        elif page == 4:
            recs = [{"id": 41, "name": "r4_0"}]
        else:
            recs = []
        body = _json.dumps(recs).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture
def http_api():
    """In-process HTTP server on an ephemeral port, port published through
    the port file; yields the handler class for fail_plan/hits access."""
    import os

    _PagedHandler.fail_plan = {}
    _PagedHandler.hits = {}
    srv = HTTPServer(("127.0.0.1", 0), _PagedHandler)
    pf = _port_file()
    os.makedirs(os.path.dirname(pf), exist_ok=True)
    with open(pf, "w") as f:
        f.write(str(srv.server_address[1]))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield _PagedHandler
    finally:
        srv.shutdown()
        t.join(timeout=5)
        srv.server_close()
        try:  # don't accumulate per-run scratch files on disk
            os.remove(pf)
        except OSError:
            pass


def test_http_sequential_fetch_retries_then_short_page_stops(http_api):
    """Over a real socket: page 2 serves two 500s then succeeds (retry
    absorbs it), page 4 is short → termination; all 10 records arrive."""
    http_api.fail_plan = {2: 2}
    got = fetch_paginated(http_page_fn, count=3, max_retries=5)
    assert sorted(r["id"] for r in got) == [10, 11, 12, 20, 21, 22, 30, 31, 32, 41]
    assert http_api.hits[2] == 3  # two failures + one success
    assert 5 not in http_api.hits  # short page 4 stopped the loop


def test_http_datasource_retry_exhaustion_partial(spark, http_api):
    """spark.read.format('paginated_rest') against the live server: a page
    failing past the retry budget contributes nothing, the rest load —
    best-effort partial over an actual socket, executor-side imports and
    all."""
    from datapipeline_omnichanneltobigquery_spark.sources.paginated import (
        register_paginated_source,
    )

    http_api.fail_plan = {3: -1}
    register_paginated_source(spark)
    df = (
        spark.read.format("paginated_rest")
        .schema("id long, name string")
        .option("page_fn", "tests.test_paginated:http_page_fn")
        .option("n_pages", "5")
        .option("max_retries", "2")
        .load()
    )
    pages_seen = sorted({r.id // 10 for r in df.collect()})
    assert pages_seen == [1, 2, 4]
    assert http_api.hits[3] == 2  # exactly the retry budget
