"""Render/find JSON payload parity (http/graphite.go shapes)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def catalog(spark):
    rows = []
    for name in ("web.h1.hits", "web.h2.hits"):
        for t in range(60, 360, 60):
            rows.append((name, t, float(t)))
    return spark.createDataFrame(rows, "name string, t long, value double")


def test_render_json_shape(catalog):
    from tgres_spark.render import render_json

    out = json.loads(render_json(catalog, ["sumSeries(web.*.hits)"]))
    assert len(out) == 1
    assert out[0]["target"] == "sumSeries()"
    pts = out[0]["datapoints"]
    assert pts[0] == [120.0, 60] and pts[-1] == [600.0, 300]


def test_render_multiple_targets(catalog):
    from tgres_spark.render import render_df

    df = render_df(catalog, ["web.h1.hits", "scale(web.h2.hits, 2)"])
    tgts = {r["target"] for r in df.select("target").distinct().collect()}
    assert tgts == {"web.h1.hits", "scale(web.h2.hits, 2)"}


def test_render_respects_range(catalog):
    from tgres_spark.render import render_df

    df = render_df(catalog, ["web.h1.hits"], t_from=120, t_to=240)
    ts = sorted(r["t"] for r in df.collect())
    assert ts == [120, 180, 240]


def test_find_json_tree(catalog):
    from tgres_spark.render import find_json

    nodes = json.loads(find_json(catalog, "web.*"))
    assert {n["id"] for n in nodes} == {"web.h1", "web.h2"}
    assert all(n["leaf"] == 0 and n["expandable"] == 1 for n in nodes)
    leaves = json.loads(find_json(catalog, "web.h1.*"))
    assert leaves == [
        {"text": "hits", "id": "web.h1.hits", "leaf": 1, "expandable": 0}
    ]


def test_render_max_points_consolidates(catalog):
    from tgres_spark.render import render_df

    # 5 points over 240s; maxDataPoints=2 → ~120s step consolidation
    df = render_df(catalog, ["web.h1.hits"], t_from=60, t_to=300, max_points=2)
    rows = sorted(df.collect(), key=lambda r: r["t"])
    assert len(rows) <= 3  # consolidated well below the raw 5 points
    ts = [r["t"] for r in rows]
    assert all(t % 120 == 0 for t in ts)  # 120s slot ends


def test_http_facade_render_and_find(catalog):
    """One real socket round-trip per endpoint: the stdlib HTTP
    façade (http_api.serve) must return byte-identical payloads to
    the library calls it wraps (http/graphite.go's /render and
    /metrics/find surface), plus sane error codes."""
    from urllib.request import urlopen
    from urllib.error import HTTPError

    from tgres_spark.http_api import serve
    from tgres_spark.render import find_json, render_json

    server = serve(catalog, now=300)
    try:
        host, port = server.server_address

        def get(path):
            with urlopen(f"http://{host}:{port}{path}", timeout=60) as r:
                return r.status, r.read().decode()

        st, body = get("/render?target=sumSeries(web.*.hits)&from=-3m&until=now")
        assert st == 200
        assert body == render_json(
            catalog, ["sumSeries(web.*.hits)"], t_from="-3m", t_to="now", now=300
        )
        pts = json.loads(body)[0]["datapoints"]
        assert [p[1] for p in pts] == [120, 180, 240, 300]

        st, body = get("/metrics/find?query=web.*")
        assert st == 200
        assert body == find_json(catalog, "web.*")
        assert {n["id"] for n in json.loads(body)} == {"web.h1", "web.h2"}

        for path, want in (
            ("/render", 400),           # no target
            ("/metrics/find", 400),     # no query
            ("/nope", 404),
        ):
            try:
                st, _ = get(path)
            except HTTPError as e:
                st = e.code
            assert st == want, path

        # pixel endpoint (http/pixel.go): GIF back, count-1 datapoint
        # recorded; name sanitization happens in pixel_datapoints
        with urlopen(
            f"http://{host}:{port}/pixel/app.signup?t=120", timeout=60
        ) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "image/gif"
            assert r.read().startswith(b"GIF89a")
        with urlopen(
            f"http://{host}:{port}/pixel/app.signup", timeout=60
        ) as r:
            assert r.status == 200  # no ?t= → server's pinned now=300
        assert server.pixel_hits == [("app.signup", 120), ("app.signup", 300)]
    finally:
        server.shutdown()


def test_pixel_hits_become_datapoints(spark, catalog):
    from tgres_spark.http_api import serve
    from tgres_spark.render import pixel_datapoints
    from urllib.request import urlopen

    server = serve(catalog, now=60)
    try:
        host, port = server.server_address
        for m in ("web hits/page", "web hits/page", "db.io"):
            from urllib.parse import quote

            with urlopen(
                f"http://{host}:{port}/pixel/{quote(m)}", timeout=60
            ) as r:
                assert r.status == 200
        hits = spark.createDataFrame(
            server.pixel_hits, "metric string, t long"
        )
        rows = sorted(
            (r["name"], r["t"], r["value"])
            for r in pixel_datapoints(spark, hits).collect()
        )
        # misc.SanitizeName: whitespace→_, /→-
        assert rows == [
            ("db.io", 60, 1.0),
            ("web_hits-page", 60, 1.0),
            ("web_hits-page", 60, 1.0),
        ]
    finally:
        server.shutdown()


def test_render_relative_from_until(catalog):
    """Graphite-style from=-3m&until=now (parseTime parity) — every
    interactive render request uses these forms."""
    from tgres_spark.render import render_df, render_json

    df = render_df(catalog, ["web.h1.hits"], t_from="-3m", t_to="now", now=300)
    ts = sorted(r["t"] for r in df.collect())
    assert ts == [120, 180, 240, 300]

    out = json.loads(
        render_json(catalog, ["web.h1.hits"], t_from="-4m", t_to="-2m", now=360)
    )
    pts = out[0]["datapoints"]
    assert [p[1] for p in pts] == [120, 180, 240]


def test_http_facade_tail_routes(catalog):
    """/ping (daemon/http.go:45), /events/get_data (http/graphite.go:
    188-195 — the reference stubs annotations to []), and the four
    pixel aggregator routes (http/pixel.go:87-105): pixel always comes
    back, each form pair queues one command, bad values drop the pair
    only."""
    from urllib.request import Request, urlopen

    from tgres_spark.http_api import serve

    server = serve(catalog, now=300)
    try:
        host, port = server.server_address

        def get(path):
            with urlopen(f"http://{host}:{port}{path}", timeout=60) as r:
                return r.status, r.headers["Content-Type"], r.read()

        st, ct, body = get("/ping")
        assert (st, body) == (200, b"OK\n") and ct.startswith("text/plain")
        for p in ("/events/get_data", "/events/get_data/"):
            st, _, body = get(p)
            assert (st, body) == (200, b"[]\n"), p

        # GET with query-string form pairs — one command per pair
        st, ct, body = get("/pixel/add?app.req=1&app.err=2.5")
        assert st == 200 and ct == "image/gif" and body.startswith(b"GIF89a")
        get("/pixel/addgauge?pool.size=-3")
        get("/pixel/setgauge?pool.size=10")
        # bad value drops the pair, never the response (pixel.go
        # recovers and still serves the pixel)
        st, _, body = get("/pixel/append?lat=12.5&lat=oops")
        assert st == 200 and body.startswith(b"GIF89a")

        # POST urlencoded body, like the reference's ParseForm
        req = Request(
            f"http://{host}:{port}/pixel/append",
            data=b"lat=40", method="POST",
        )
        with urlopen(req, timeout=60) as r:
            assert r.status == 200 and r.read().startswith(b"GIF89a")

        assert server.agg_commands == [
            ("add", "app.req", 1.0, 300),
            ("add", "app.err", 2.5, 300),
            ("addgauge", "pool.size", -3.0, 300),
            ("setgauge", "pool.size", 10.0, 300),
            ("append", "lat", 12.5, 300),
            ("append", "lat", 40.0, 300),
        ]
    finally:
        server.shutdown()


def test_pixel_agg_commands_flow_through_statsd_flush(spark, catalog):
    """The queued pixel agg commands flush through the SAME statsd
    engine as the socket sources: add → counter rate, setgauge/addgauge
    → gauge set+delta, append → timer stats (aggregator.go:217-220)."""
    import math

    from tgres_spark.aggregator import pixel_agg_frame, statsd_flush
    from tgres_spark.http_api import serve
    from urllib.request import urlopen

    server = serve(catalog, now=30)
    try:
        host, port = server.server_address
        for path in (
            "/pixel/add?req|s=6",      # name sanitized like statsd
            "/pixel/setgauge?depth=100",
            "/pixel/addgauge?depth=%2B7",   # +7
            "/pixel/addgauge?depth=-2",
            "/pixel/append?lat=10&lat=30",
        ):
            with urlopen(f"http://{host}:{port}{path}", timeout=60) as r:
                assert r.status == 200
        # the handler responds BEFORE queueing (reference parity:
        # pixel.go sends the gif first), so the last request's
        # commands may still be in flight when urlopen returns —
        # wait for all 6 (observed as a rare full-suite flake)
        import time as _time

        deadline = _time.monotonic() + 30
        while len(server.agg_commands) < 6 and _time.monotonic() < deadline:
            _time.sleep(0.05)
        assert len(server.agg_commands) == 6
        out = statsd_flush(
            pixel_agg_frame(spark, server.agg_commands), 60
        )
        r = {x["name"]: x for x in out.collect()}
        assert math.isclose(r["stats.reqs"]["value"], 6.0 / 60.0)
        assert r["stats.gauges.depth"]["value"] == 105.0  # 100 +7 -2
        assert r["stats.timers.lat.count"]["value"] == 2.0
        assert r["stats.timers.lat.mean"]["value"] == 20.0
        assert all(x["t"] == 60 for x in r.values())
    finally:
        server.shutdown()
