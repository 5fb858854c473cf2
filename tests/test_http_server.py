"""Socket-level HTTP server tests: real TCP, keep-alive, rate limiting."""

import asyncio
import json
import threading
import urllib.request

import pytest

from ocr_system_tpu.api.http import App, BackgroundTasks, Request, Response
from ocr_system_tpu.api.middleware import (
    RateLimitConfig,
    RateLimiter,
    rate_limit_middleware,
    timing_middleware,
)


@pytest.fixture()
def server():
    """Run a small App on a real socket in a background thread."""
    app = App()
    app.use(
        rate_limit_middleware(
            RateLimiter(RateLimitConfig(requests_per_minute=5, exclude_paths=("/",)))
        )
    )
    app.use(timing_middleware)

    @app.router.get("/")
    async def root(req: Request, bg: BackgroundTasks) -> Response:
        return Response.json({"ok": True})

    @app.router.get("/echo/{name}")
    async def echo(req: Request, bg: BackgroundTasks) -> Response:
        return Response.json(
            {"name": req.path_params["name"], "q": req.query.get("q")}
        )

    @app.router.post("/post")
    async def post(req: Request, bg: BackgroundTasks) -> Response:
        return Response.json({"got": req.json()}, status=201)

    @app.router.get("/boom")
    async def boom(req: Request, bg: BackgroundTasks) -> Response:
        raise RuntimeError("deliberate")

    loop = asyncio.new_event_loop()
    started = threading.Event()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            # a stop Event (created in-loop) ends main() cleanly; stopping
            # the loop out from under run_until_complete raises
            # "Event loop stopped before Future completed" in this thread,
            # which pytest surfaces as an unhandled-thread-exception warning
            # in whatever test runs next
            holder["stop"] = asyncio.Event()
            srv = await app.serve("127.0.0.1", 0)
            holder["port"] = srv.sockets[0].getsockname()[1]
            started.set()
            async with srv:
                await holder["stop"].wait()

        try:
            loop.run_until_complete(main())
        finally:
            loop.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(5)
    yield f"http://127.0.0.1:{holder['port']}"
    loop.call_soon_threadsafe(holder["stop"].set)
    t.join(5)


def get(url, **kw):
    try:
        with urllib.request.urlopen(url, **kw) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


class TestSocketServer:
    def test_basic_get(self, server):
        status, headers, body = get(server + "/")
        assert status == 200
        assert json.loads(body) == {"ok": True}
        assert "X-Process-Time" in headers

    def test_path_params_and_query(self, server):
        status, _, body = get(server + "/echo/world?q=1")
        assert json.loads(body) == {"name": "world", "q": "1"}

    def test_post_json(self, server):
        req = urllib.request.Request(
            server + "/post",
            data=json.dumps({"a": 1}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        status, _, body = get(req)
        assert status == 201
        assert json.loads(body) == {"got": {"a": 1}}

    def test_404_detail_shape(self, server):
        status, _, body = get(server + "/nope")
        assert status == 404
        assert "detail" in json.loads(body)

    def test_unhandled_error_500(self, server):
        status, _, body = get(server + "/boom")
        assert status == 500
        assert json.loads(body)["detail"] == "Internal server error"

    def test_keep_alive_reuses_connection(self, server):
        import http.client

        host = server.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=5)
        for _ in range(3):
            conn.request("GET", "/")
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
        conn.close()

    def test_rate_limit_429(self, server):
        # limit is 5/min on non-excluded paths
        codes = [get(server + "/echo/x")[0] for _ in range(7)]
        assert codes.count(429) >= 1
        status, headers, body = get(server + "/echo/y")
        if status == 429:
            assert "Retry-After" in headers
            assert headers.get("X-RateLimit-Remaining") == "0"

    def test_rate_limit_excludes_root(self, server):
        codes = [get(server + "/")[0] for _ in range(10)]
        assert all(c == 200 for c in codes)

    def test_concurrent_requests(self, server):
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(lambda _: get(server + "/")[0], range(16)))
        assert all(c == 200 for c in results)


def test_oversized_body_413(server):
    import http.client

    host = server.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=5)
    conn.putrequest("POST", "/post")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", str(100 * 1024 * 1024))
    conn.endheaders()
    # server rejects based on the header before the body arrives
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()
