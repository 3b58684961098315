"""Real HTTP transport: ``HttpWeb`` speaks the same ``get(url,
request_headers) -> Optional[WebResponse]`` protocol as the synthetic
webs, over actual sockets (stdlib ``http.client`` — no third-party
deps, and NO automatic redirect following: the engine owns redirect
semantics, crawler.ts:1930-1970).

Behavior parity with the reference's fetch path
(src/crawler.ts:1548-1644, 1725-1752):

* connect/read timeout -> ``None`` (the Fetcher maps it to
  STATUS_TIMEOUT / ``fetchtimeout``),
* DNS / connection errors -> ``WebResponse(-1)`` (the code-600
  ``fetchclienterror`` path),
* streaming ``max_resource_size`` abort: if the Content-Length header
  already exceeds the cap the body is never read (the header value is
  reported via ``content_length_override``); otherwise the body is
  read in chunks and the stream is dropped one chunk past the cap —
  the Fetcher sees ``len(body) > max_resource_size`` and emits
  ``fetchdataerror``, exactly like the synthetic oversize route,
* basic auth, custom headers, HTTP proxy (absolute-URI request form),
  gzip/deflate passthrough (the Fetcher decompresses by
  Content-Encoding).

The object is cheap and picklable (connections are per-call), so it
broadcasts through ``ray.put`` to fetcher tasks like any other web.
"""

from __future__ import annotations

import base64
import socket
import ssl
from typing import Optional

from ..urlnorm import Uri
from .web import WebResponse

_CHUNK = 64 * 1024


class HttpWeb:
    def __init__(self, timeout_ms: int = 300_000,
                 max_resource_size: int = 16 * 1024 * 1024,
                 user_agent: str = "simplecrawler-ray/1.0",
                 auth_user: Optional[str] = None,
                 auth_pass: Optional[str] = None,
                 custom_headers: Optional[dict] = None,
                 use_proxy: bool = False,
                 proxy_hostname: str = "127.0.0.1",
                 proxy_port: int = 8123,
                 proxy_user: Optional[str] = None,
                 proxy_pass: Optional[str] = None,
                 verify_tls: bool = True):
        self.timeout_s = max(timeout_ms, 1) / 1000.0
        self.max_resource_size = max_resource_size
        self.user_agent = user_agent
        self.auth_user, self.auth_pass = auth_user, auth_pass
        self.custom_headers = dict(custom_headers or {})
        self.use_proxy = use_proxy
        self.proxy_hostname, self.proxy_port = proxy_hostname, proxy_port
        self.proxy_user, self.proxy_pass = proxy_user, proxy_pass
        self.verify_tls = verify_tls

    @classmethod
    def from_config(cls, cfg: dict) -> "HttpWeb":
        """Build from a CrawlEngine config dict — makes the reference's
        timeout / proxy / auth knobs live instead of inert."""
        return cls(
            timeout_ms=cfg.get("timeout", 300_000),
            max_resource_size=cfg.get("max_resource_size", 16 * 1024 * 1024),
            user_agent=cfg.get("user_agent", "simplecrawler-ray/1.0"),
            auth_user=cfg.get("auth_user") if cfg.get("needs_auth") else None,
            auth_pass=cfg.get("auth_pass") if cfg.get("needs_auth") else None,
            custom_headers=cfg.get("custom_headers"),
            use_proxy=cfg.get("use_proxy", False),
            proxy_hostname=cfg.get("proxy_hostname", "127.0.0.1"),
            proxy_port=cfg.get("proxy_port", 8123),
            proxy_user=cfg.get("proxy_user"),
            proxy_pass=cfg.get("proxy_pass"),
        )

    # ------------------------------------------------------------ internals

    def _connect(self, scheme: str, host: str, port: int):
        import http.client

        if self.use_proxy:
            return http.client.HTTPConnection(
                self.proxy_hostname, self.proxy_port, timeout=self.timeout_s)
        if scheme == "https":
            ctx = None if self.verify_tls else ssl._create_unverified_context()
            return http.client.HTTPSConnection(host, port, timeout=self.timeout_s,
                                               context=ctx)
        return http.client.HTTPConnection(host, port, timeout=self.timeout_s)

    def _headers(self, request_headers: Optional[dict]) -> dict:
        h = {"user-agent": self.user_agent, **self.custom_headers}
        if self.auth_user is not None:
            cred = f"{self.auth_user}:{self.auth_pass or ''}"
            h["authorization"] = "Basic " + base64.b64encode(cred.encode()).decode()
        if self.use_proxy and self.proxy_user is not None:
            cred = f"{self.proxy_user}:{self.proxy_pass or ''}"
            h["proxy-authorization"] = ("Basic "
                                        + base64.b64encode(cred.encode()).decode())
        h.update(request_headers or {})
        return h

    # -------------------------------------------------------------- fetch

    def get(self, url: str, request_headers: Optional[dict] = None
            ) -> Optional[WebResponse]:
        u = Uri.parse(url)
        scheme = (u.protocol or "http").lower()
        host = u.hostname or ""
        if not host:
            return WebResponse(-1)
        port = u.port or (443 if scheme == "https" else 80)
        pathq = (u.path or "/") + (("?" + u.query) if u.query else "")
        target = url if self.use_proxy else pathq
        conn = None
        try:
            conn = self._connect(scheme, host, int(port))
            conn.request("GET", target, headers=self._headers(request_headers))
            r = conn.getresponse()

            headers_out: dict = {}
            set_cookies: list[str] = []
            for k, v in r.getheaders():
                tk = k.title()
                if tk == "Set-Cookie":
                    set_cookies.append(v)
                elif tk in headers_out:
                    headers_out[tk] += ", " + v
                else:
                    headers_out[tk] = v
            if set_cookies:
                headers_out["Set-Cookie"] = (set_cookies[0]
                                             if len(set_cookies) == 1
                                             else set_cookies)
            ct = headers_out.get("Content-Type", "")

            clen = headers_out.get("Content-Length")
            if clen is not None and clen.isdigit() \
                    and int(clen) > self.max_resource_size:
                # header oversize: never read the body (streaming abort)
                return WebResponse(r.status, b"", ct, headers_out,
                                   content_length_override=int(clen))

            chunks, total = [], 0
            while True:
                chunk = r.read(_CHUNK)
                if not chunk:
                    break
                chunks.append(chunk)
                total += len(chunk)
                if total > self.max_resource_size:
                    break  # drop the stream one chunk past the cap
            body = b"".join(chunks)
            return WebResponse(r.status, body, ct, headers_out)
        except (socket.timeout, TimeoutError):
            return None  # Fetcher -> STATUS_TIMEOUT / fetchtimeout
        except (OSError, ConnectionError, ssl.SSLError):
            return WebResponse(-1)  # Fetcher -> code 600 fetchclienterror
        finally:
            if conn is not None:
                try:
                    conn.close()
                except Exception:
                    pass
