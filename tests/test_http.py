"""Real-HTTP transport tests: HttpWeb against a localhost http.server
(the reference's fetch path is real sockets — src/crawler.ts:1548-1644;
these mirror its status-dispatch behavior over actual HTTP)."""

import gzip
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from simplecrawler_ray.pipelines.crawl import CrawlEngine
from simplecrawler_ray.sources.http import HttpWeb

BODY_HOME = b"Home. <a href='/page2'>p2</a> <a href='/redir'>r</a> <a href='/nope'>x</a> <a href='/gz'>gz</a>"
BIG = b"x" * 5000


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body=b"", ct="text/html", extra=()):
        self.send_response(code)
        self.send_header("Content-Type", ct)
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        p = self.path
        if p == "/robots.txt":
            self._send(200, b"User-agent: *\nDisallow: /private\n", "text/plain")
        elif p == "/":
            self._send(200, BODY_HOME)
        elif p == "/page2":
            self._send(200, b"page2: <a href='/target'>t</a>")
        elif p == "/redir":
            self._send(301, b"moved", extra=[("Location", "/target")])
        elif p == "/target":
            self._send(200, b"target reached")
        elif p == "/private":
            self._send(200, b"should never be fetched")
        elif p == "/gz":
            gz = gzip.compress(b"gzipped body <a href='/page2'>dup</a>")
            self._send(200, gz, extra=[("Content-Encoding", "gzip")])
        elif p == "/big":
            self._send(200, BIG)
        elif p == "/slow":
            time.sleep(2)
            self._send(200, b"slow")
        else:
            self._send(404, b"Page not found.")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_httpweb_basic_and_404(server):
    web = HttpWeb()
    r = web.get(server + "/")
    assert r.code == 200 and b"Home." in r.body
    assert "text/html" in r.headers["Content-Type"]
    r = web.get(server + "/nope")
    assert r.code == 404
    r = web.get(server + "/redir")
    assert r.code == 301 and r.headers["Location"] == "/target"


def test_httpweb_oversize_header_abort(server):
    web = HttpWeb(max_resource_size=1000)
    r = web.get(server + "/big")
    assert r.code == 200
    assert r.body == b""  # streaming abort: body never read
    assert r.content_length == len(BIG)  # header value reported


def test_httpweb_timeout_and_unreachable(server):
    web = HttpWeb(timeout_ms=300)
    assert web.get(server + "/slow") is None  # -> STATUS_TIMEOUT
    r = HttpWeb(timeout_ms=500).get("http://127.0.0.1:1/x")
    assert r is not None and r.code == -1  # conn refused -> code-600 path


def test_crawl_over_real_http(server):
    """Full engine crawl over real sockets: discovery, redirect follow,
    robots Disallow, 404 dispatch, gzip decompression."""
    eng = CrawlEngine(HttpWeb(), server + "/", seen_shards=2)
    res = eng.run(max_rounds=20)
    t = res.fetched_table()
    st = dict(zip(t.column("url").to_pylist(), t.column("status").to_pylist()))
    base = server
    assert st[base + "/"] == "downloaded"
    assert st[base + "/page2"] == "downloaded"
    assert st[base + "/redir"] == "redirected"
    assert st[base + "/target"] == "downloaded"   # via redirect re-queue
    assert st[base + "/nope"] == "notfound"
    assert st[base + "/gz"] == "downloaded"
    assert base + "/private" not in st            # robots Disallow
    caps = dict(zip(t.column("url").to_pylist(), t.column("caption").to_pylist()))
    assert "gzipped body" in caps[base + "/gz"]   # Content-Encoding handled
    eng.seen.shutdown()


def test_crawl_timeout_over_real_http(server):
    eng = CrawlEngine(HttpWeb(timeout_ms=300), server + "/slow",
                      seen_shards=2, discover=False)
    res = eng.run(max_rounds=3)
    t = res.fetched_table()
    assert t.column("status")[0].as_py() == "timeout"
    eng.seen.shutdown()


def test_crawl_with_fetch_threads(server):
    """Threaded batch I/O (fetch_threads>1) crawls the same URL set."""
    eng = CrawlEngine(HttpWeb(), server + "/", seen_shards=2, fetch_threads=8)
    res = eng.run(max_rounds=20)
    t = res.fetched_table()
    st = dict(zip(t.column("url").to_pylist(), t.column("status").to_pylist()))
    assert st[server + "/"] == "downloaded"
    assert st[server + "/target"] == "downloaded"
    assert server + "/private" not in st
    eng.seen.shutdown()
