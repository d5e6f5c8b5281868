"""Sink tests against a local HTTP stub (SURVEY §5 item 5): batch
boundaries, gzip NDJSON shape, retry schedule, 4xx DLQ, exhaustion."""

from __future__ import annotations

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from gcs_parquet_dataflow_spark.sinks.http_batch import (
    HttpSinkConfig,
    post_events,
    post_partition,
    _send_with_retry,
)

pytestmark = pytest.mark.fast  # driver quick-gate module (r13)


class StubHandler(BaseHTTPRequestHandler):
    """Scriptable responses: the server pops from ``script`` per request;
    empty script → 200."""

    requests_seen: list[bytes] = []
    script: list[int] = []

    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = self.rfile.read(length)
        type(self).requests_seen.append(body)
        status = type(self).script.pop(0) if type(self).script else 200
        self.send_response(status)
        self.end_headers()
        self.wfile.write(b"ok" if status == 200 else b"nope")

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def stub_server():
    StubHandler.requests_seen = []
    StubHandler.script = []
    server = HTTPServer(("127.0.0.1", 0), StubHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/import", StubHandler
    server.shutdown()


def no_sleep(_):
    pass


def test_batch_boundaries_and_gzip_shape(stub_server):
    url, handler = stub_server
    cfg = HttpSinkConfig(url=url, batch_events=3)
    events = [json.dumps({"event": f"e{i}"}) for i in range(7)]
    out = list(post_partition(events, cfg, sleep_fn=no_sleep))
    assert [s for _, s, _ in out] == ["sent"] * 7
    # 7 events at batch_events=3 → 3 POSTs (3+3+1)
    assert len(handler.requests_seen) == 3
    first = gzip.decompress(handler.requests_seen[0]).decode()
    assert first.count("\n") == 2  # 3 NDJSON lines
    assert json.loads(first.splitlines()[0]) == {"event": "e0"}


def test_byte_threshold_flush(stub_server):
    url, handler = stub_server
    cfg = HttpSinkConfig(url=url, batch_events=10_000, batch_bytes=100)
    events = ["x" * 60, "y" * 60, "z" * 10]
    out = list(post_partition(events, cfg, sleep_fn=no_sleep))
    assert [s for _, s, _ in out] == ["sent"] * 3
    assert len(handler.requests_seen) == 2  # flush after 2nd event (120B>100)


def test_retry_on_5xx_then_success(stub_server):
    url, handler = stub_server
    handler.script = [500, 503, 200]
    cfg = HttpSinkConfig(url=url)
    out = list(post_partition(["{}"], cfg, sleep_fn=no_sleep))
    assert out == [("{}", "sent", "")]
    assert len(handler.requests_seen) == 3


def test_429_retries(stub_server):
    url, handler = stub_server
    handler.script = [429, 200]
    cfg = HttpSinkConfig(url=url)
    out = list(post_partition(["{}"], cfg, sleep_fn=no_sleep))
    assert out == [("{}", "sent", "")]
    assert len(handler.requests_seen) == 2


def test_4xx_goes_to_dlq_without_retry(stub_server):
    url, handler = stub_server
    handler.script = [400]
    cfg = HttpSinkConfig(url=url)
    out = list(post_partition(["{}", "{}"], cfg, sleep_fn=no_sleep))
    assert [s for _, s, _ in out] == ["dlq", "dlq"]
    assert "http_400" in out[0][2]
    assert len(handler.requests_seen) == 1  # no retry on 400


def test_retries_exhausted_dlq(stub_server):
    url, handler = stub_server
    handler.script = [500] * 5
    cfg = HttpSinkConfig(url=url, max_retries=5)
    out = list(post_partition(["{}"], cfg, sleep_fn=no_sleep))
    assert out[0][1] == "dlq"
    assert "retries_exhausted" in out[0][2]
    assert len(handler.requests_seen) == 5


def test_backoff_schedule_capped():
    sleeps = []
    cfg = HttpSinkConfig(url="http://unused", max_retries=5, backoff_cap_s=4.0)

    def failing_post(cfg, payload):
        return 500, "boom"

    _send_with_retry(cfg, ["{}"], failing_post, sleep_fn=sleeps.append)
    # sleeps happen BETWEEN attempts only — no sleep after the final try
    assert len(sleeps) == 4
    # 2^n + U(0,1), capped: attempts 0..3 → bounds [1,2],[2,3],[4,4],[4,4]
    assert 1 <= sleeps[0] <= 2 and 2 <= sleeps[1] <= 3
    assert sleeps[2] == sleeps[3] == 4.0


def test_post_events_distributed(spark, stub_server):
    url, handler = stub_server
    df = spark.createDataFrame(
        [(json.dumps({"event": f"e{i}"}),) for i in range(50)],
        "event_json string",
    ).repartition(4)
    out = post_events(df, HttpSinkConfig(url=url, batch_events=10))
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["status"] == "sent" for r in rows)
    # each of 4 partitions flushes ceil(events/10) times; total ≥ 5
    assert len(handler.requests_seen) >= 5
