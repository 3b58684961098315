"""Sharded robots-rules actor pool (T2, SURVEY §2.3 — the scale path).

The driver-side robots cache in pipelines/crawl.py is right when
#hosts is small (one tiny fetch per host per crawl).  At web scale
(~10^7 hosts, ~1 KB of parsed rules each => ~10 GB) the cache itself
must shard: ``RobotsShard`` actors hold rules for ``hash(host) % n``
and fetch robots.txt themselves on first touch — so robots fetching is
distributed too, and rule lookups are an actor RPC instead of a
driver broadcast.

fetch-once-per-host holds because a host always maps to the same shard
and the actor serializes its calls.
"""

from __future__ import annotations

import ray

from ..robots import RobotsRules
from ..sources.web import url_hash64
from ..urlnorm import process_url


def _fetch_and_parse(web, hk: str, user_agent: str,
                     scheme: "str | None" = None) -> tuple[RobotsRules, list[str], str]:
    """One robots.txt fetch+parse (redirect-following; cross-domain
    redirect => error entry).  Returns (rules, sitemaps, error_msg).

    THE robots-fetch implementation — the driver cache path
    (pipelines/crawl.py ``_fetch_robots``) and the sharded pool both
    call it, so fixes apply to both.  ``scheme`` comes from the
    frontier rows' protocol column; unset, port 443 implies https
    (plaintext HTTP against a TLS port would fail and silently yield
    allow-all rules)."""
    host, _, port = hk.partition(":")
    portpart = f":{port}" if port else ""
    if scheme is None:
        scheme = "https" if port == "443" else "http"
    rurl = f"{scheme}://{host}{portpart}/robots.txt"
    resp = web.get(rurl)
    hops = 0
    from ..robots import host_key

    while (resp is not None and 300 <= resp.code < 400
           and resp.headers.get("Location") and hops < 5):
        loc = resp.headers["Location"]
        target = process_url(loc, rurl)
        if target is None or host_key(target.url) != hk:
            return (RobotsRules(url=rurl), [],
                    f"Robots.txt for {hk} redirected to a disallowed domain: {loc}")
        rurl = target.url
        resp = web.get(rurl)
        hops += 1
    if resp is None or resp.code != 200:
        return RobotsRules(url=rurl), [], ""
    try:
        rules = RobotsRules.parse(rurl, resp.body.decode("utf-8", errors="replace"),
                                  user_agent)
        return rules, list(rules.sitemaps), ""
    except Exception:
        return RobotsRules.error_rules(rurl), [], "robots parse error"


@ray.remote(num_cpus=0.25)
class RobotsShard:
    def __init__(self, web_ref, user_agent: str = "*"):
        self.web = ray.get(web_ref) if isinstance(web_ref, ray.ObjectRef) else web_ref
        self.user_agent = user_agent
        self.rules: dict[str, RobotsRules] = {}
        self.sitemaps: list[tuple[str, str]] = []   # (robots_url, sitemap)
        self.errors: list[str] = []

    def ensure(self, host_keys: list[str],
               schemes: "dict[str, str] | None" = None) -> dict:
        """Fetch-once-per-host; returns {host_key: RobotsRules}."""
        out = {}
        for hk in host_keys:
            r = self.rules.get(hk)
            if r is None:
                r, sitemaps, err = _fetch_and_parse(
                    self.web, hk, self.user_agent,
                    scheme=(schemes or {}).get(hk))
                self.rules[hk] = r
                for sm in sitemaps:
                    self.sitemaps.append((r.url, sm))
                if err:
                    self.errors.append(err)
            out[hk] = r
        return out

    def drain_sitemaps(self) -> list[tuple[str, str]]:
        out, self.sitemaps = self.sitemaps, []
        return out

    def drain_errors(self) -> list[str]:
        out, self.errors = self.errors, []
        return out

    def size(self) -> int:
        return len(self.rules)


class RobotsPool:
    """Driver handle: scatter host-keys to shards, gather rules."""

    def __init__(self, web_ref, num_shards: int = 4, user_agent: str = "*"):
        self.num_shards = num_shards
        self.shards = [RobotsShard.remote(web_ref, user_agent)
                       for _ in range(num_shards)]

    def _shard_of(self, hk: str) -> int:
        return url_hash64(hk) % self.num_shards

    def ensure(self, host_keys: "set[str] | list[str]",
               schemes: "dict[str, str] | None" = None) -> dict:
        by_shard: dict[int, list[str]] = {}
        for hk in host_keys:
            by_shard.setdefault(self._shard_of(hk), []).append(hk)
        refs = [self.shards[s].ensure.remote(
                    hks, {h: schemes[h] for h in hks if h in schemes}
                    if schemes else None)
                for s, hks in by_shard.items()]
        out: dict = {}
        for d in ray.get(refs):
            out.update(d)
        return out

    def drain_sitemaps(self) -> list[tuple[str, str]]:
        out = []
        for part in ray.get([s.drain_sitemaps.remote() for s in self.shards]):
            out.extend(part)
        return out

    def drain_errors(self) -> list[str]:
        out = []
        for part in ray.get([s.drain_errors.remote() for s in self.shards]):
            out.extend(part)
        return out

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []
