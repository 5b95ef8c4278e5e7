"""End-to-end HTTP serving tests — the reference dashboards' endpoints
(`dashboard/app.py:21-50`, `streaming_dashboard/app.py:162-172`) served
from engine queries over stdlib http.server, payloads JSON-equal to the
serving-layer dicts."""

from __future__ import annotations

import json
import urllib.request

import pytest

from data_pipeline_example_spark import serving
from data_pipeline_example_spark.http_serving import DashboardServer, serve_dashboards
from data_pipeline_example_spark.operators import retail, windows
from data_pipeline_example_spark.plans.queries import _events_retail


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as resp:
        return resp.status, json.loads(resp.read().decode("utf-8"))


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = serve_dashboards(spark, sf_dir)
    yield srv
    srv.stop()


def test_health(server):
    status, body = _get(server.port, "/health")
    assert status == 200
    assert body == {"status": "ok"}


def test_daily_endpoint_equals_serving_payload(spark, sf_dir, server):
    status, body = _get(server.port, "/api/daily")
    assert status == 200
    expected = serving.daily_payload(
        retail.daily_revenue(_events_retail(spark, sf_dir))
    )
    assert body == json.loads(json.dumps(expected))  # same JSON round-trip
    assert body["status"] == "ok"
    assert len(body["daily"]) > 0
    assert len(body["top_products"]) <= 10


def test_stream_endpoint_equals_serving_payload(spark, sf_dir, server):
    status, body = _get(server.port, "/api/stream")
    assert status == 200
    expected = serving.stream_payload(
        windows.sliding_window_agg(_events_retail(spark, sf_dir), rounded=True)
    )
    assert body == json.loads(json.dumps(expected))
    assert body["status"] == "ok"
    assert len(body["window_health"]) <= serving.MAX_WINDOWS
    assert len(body["leaderboard"]) <= serving.MAX_LEADERBOARD


def test_unknown_route_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _get(server.port, "/api/nope")
    assert exc_info.value.code == 404


def test_refresh_is_atomic(server):
    server.refresh()
    status, body = _get(server.port, "/api/daily")
    assert status == 200 and body["status"] == "ok"


def test_server_without_stream_fn():
    srv = DashboardServer(daily_fn=lambda: {"status": "ok", "daily": []})
    srv.start()
    try:
        status, body = _get(srv.port, "/api/daily")
        assert status == 200 and body["daily"] == []
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            _get(srv.port, "/api/stream")
    finally:
        srv.stop()


def test_stop_without_start_does_not_hang():
    import threading

    from data_pipeline_example_spark.http_serving import DashboardServer

    srv = DashboardServer(daily_fn=lambda: {"x": 1})
    t = threading.Thread(target=srv.stop, daemon=True)
    t.start()
    t.join(timeout=5)
    assert not t.is_alive(), "stop() deadlocked without a started server"
