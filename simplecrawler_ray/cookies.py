"""Cookie jar — parse/serialize/match semantics of the reference.

Parity targets:
* ``Cookie``              -> src/cookies.ts:180-331 (fromString parse,
  toString round-trip, expiry as ms-epoch int, reversed-string domain
  suffix matching, path prefix matching)
* ``CookieJar``           -> src/cookies.ts:17-177 (upsert keyed on
  (name, matchDomain), getAsHeader filtering)

Round-trip goldens pinned by test/specs/cookies.unit.spec.ts:9-74
(e.g. RMID expires == 4080259914000 ms).

One jar lives inside each fetcher actor (T3, SURVEY §2.3); host-
partitioned fetching keeps per-host cookies consistent across actors.
"""

from __future__ import annotations

import re
import time
from email.utils import parsedate_to_datetime
from typing import Optional

NEVER = -1


def parse_http_date_ms(s: str) -> float:
    """JS ``new Date(s).getTime()`` for HTTP cookie dates -> ms epoch
    (NaN -> float('nan'))."""
    s = s.strip()
    try:
        # rfc2822/rfc850 variants incl. "19-Apr-2099" dashes
        dt = parsedate_to_datetime(s.replace("-", " ", 2) if re.match(
            r"^\w+,\s*\d{1,2}-\w{3}-\d{2,4}", s) else s)
        return dt.timestamp() * 1000.0
    except (ValueError, TypeError):
        return float("nan")


def _parse_keyval(s: str) -> tuple[str, str]:
    parts = s.split("=")
    return parts[0], "=".join(parts[1:])


class CookieError(ValueError):
    pass


class Cookie:
    def __init__(self, name: str, value: str = "", expires: "str|float|int" = NEVER,
                 path: str = "/", domain: str = "*", httponly: bool = False):
        if not name:
            raise CookieError("A name is required to create a cookie.")
        if expires:
            if not isinstance(expires, (int, float)):
                expires = parse_http_date_ms(str(expires))
        else:
            expires = NEVER
        self.name = name
        self.value = value
        self.expires = expires
        self.path = path if path is not None else "/"
        self.domain = domain if domain is not None else "*"
        self.httponly = bool(httponly)

    @classmethod
    def from_string(cls, s: str) -> "Cookie":
        if not s or not isinstance(s, str):
            raise CookieError("String must be supplied to generate a cookie.")
        s = re.sub(r"^\s*set-cookie\s*:\s*", "", s, flags=re.I)
        parts = re.split(r"\s*;\s*", s)
        name, value = _parse_keyval(parts.pop(0) if parts else "")
        attrs: dict[str, str] = {}
        for p in parts:
            if not re.sub(r"\s+", "", p):
                continue
            k, v = _parse_keyval(p)
            k = re.sub(r"[^a-z0-9]", "", k.lower())
            attrs[k] = v or ""
        return cls(
            name or "",
            value or "",
            attrs.get("expires") or attrs.get("expiry") or NEVER,
            attrs.get("path", "/"),
            attrs.get("domain", "*"),
            "httponly" in attrs,
        )

    def to_outbound(self) -> str:
        return f"{self.name}={self.value}"

    def to_string(self, include_header: bool = False) -> str:
        res = "Set-Cookie: " if include_header else ""
        res += f"{self.to_outbound()}; "
        if isinstance(self.expires, (int, float)) and self.expires > 0:
            t = time.gmtime(self.expires / 1000.0)
            res += "Expires=" + time.strftime("%a, %d %b %Y %H:%M:%S GMT", t) + "; "
        if self.path:
            res += f"Path={self.path}; "
        if self.domain:
            res += f"Domain={self.domain}; "
        if self.httponly:
            res += "Httponly; "
        return res

    def is_expired(self, now_ms: Optional[float] = None) -> bool:
        if self.expires < 0:
            return False
        return self.expires < (now_ms if now_ms is not None else time.time() * 1000)

    def match_domain(self, domain: str) -> bool:
        if self.domain == "*":
            return True
        return self.domain[::-1].startswith(domain[::-1])

    def match_path(self, path: str) -> bool:
        if not self.path:
            return True
        return path.startswith(self.path)


class CookieJar:
    def __init__(self):
        self.cookies: list[Cookie] = []

    def add(self, cookie: "Cookie|str") -> Cookie:
        if isinstance(cookie, str):
            cookie = Cookie.from_string(cookie)
        for i, c in enumerate(self.cookies):
            if c.name == cookie.name and c.match_domain(cookie.domain):
                self.cookies[i] = cookie
                return cookie
        self.cookies.append(cookie)
        return cookie

    def add_from_headers(self, headers: "str|list[str]") -> list[Exception]:
        """Returns parse errors (-> cookieerror events, crawler.ts:1807-1814)."""
        if isinstance(headers, str):
            headers = [headers]
        errors = []
        for h in headers:
            try:
                self.add(h)
            except CookieError as e:
                errors.append(e)
        return errors

    def get(self, name: Optional[str] = None, domain: Optional[str] = None) -> list[Cookie]:
        return [
            c for c in self.cookies
            if (not name or c.name == name) and (not domain or c.match_domain(domain))
        ]

    def get_as_header(self, domain: Optional[str] = None, path: Optional[str] = None) -> list[str]:
        out = []
        for c in self.cookies:
            if c.is_expired():
                continue
            if not domain and not path:
                out.append(c.to_outbound())
            elif domain:
                if c.match_domain(domain):
                    out.append(c.to_outbound())
            elif path and c.match_path(path):
                out.append(c.to_outbound())
        return out
