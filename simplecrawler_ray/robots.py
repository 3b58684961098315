"""robots.txt parsing and per-host rule application.

The reference delegates to the ``robots-parser`` npm package
(src/crawler.ts:17,1308-1309) and keeps one parsed rule-set per touched
host (``_robotsTxts``, src/crawler.ts:602-603).  This is a from-scratch
parser of the same public spec (Google's robots.txt RFC 9309 subset):
User-agent groups, Allow/Disallow with ``*`` wildcards and ``$``
anchors, longest-match-wins precedence (Allow wins ties), and Sitemap
directives (which the reference re-queues, src/crawler.ts:1311-1317).

Parse errors disallow (``urlIsAllowed`` src/crawler.ts:683-701: an
errored entry yields allowed=False).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .urlnorm import Uri


def _rule_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


@dataclass
class RobotsRules:
    url: str                       # the robots.txt URL these rules came from
    sitemaps: list[str] = field(default_factory=list)
    error: bool = False
    # [(is_allow, pattern_len, regex)]
    _rules: list[tuple[bool, int, re.Pattern]] = field(default_factory=list)

    @classmethod
    def parse(cls, robots_url: str, text: str, user_agent: str = "*") -> "RobotsRules":
        rules = cls(url=robots_url)
        ua_token = user_agent.split("/")[0].lower().strip()
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        cur_agents: list[str] = []
        cur_rules: list[tuple[bool, str]] = []
        last_was_agent = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if not last_was_agent and cur_agents:
                    groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                if val:
                    # a bare "User-agent:" is malformed; recording "" would
                    # substring-match EVERY crawler and outrank "*"
                    cur_agents.append(val.lower())
                last_was_agent = True
            elif key in ("allow", "disallow"):
                last_was_agent = False
                if cur_agents:
                    cur_rules.append((key == "allow", val))
            elif key == "sitemap":
                last_was_agent = False
                rules.sitemaps.append(val)
            # any other directive (crawl-delay, host...) is IGNORED as if
            # absent (RFC 9309 §2.2.4) — so "UA: a / crawl-delay / UA: b"
            # still forms ONE group with both agents, matching the RFC
            # (some parsers instead end the agent list at any directive)
        if cur_agents:
            groups.append((cur_agents, cur_rules))

        # pick the most specific matching group, '*' as fallback
        best: list[tuple[bool, str]] | None = None
        best_len = -1
        for agents, rl in groups:
            for a in agents:
                if a == "*":
                    if best_len < 0:
                        best = rl
                elif a in ua_token or ua_token in a:
                    if len(a) > best_len:
                        best, best_len = rl, len(a)
        for is_allow, pattern in best or []:
            if not pattern:
                continue  # "Disallow:" empty == allow all
            rules._rules.append((is_allow, len(pattern), _rule_regex(pattern)))
        return rules

    @classmethod
    def error_rules(cls, robots_url: str) -> "RobotsRules":
        return cls(url=robots_url, error=True)

    def is_allowed(self, url: str) -> bool:
        if self.error:
            return False  # parse/fetch error => disallow (crawler.ts:694-697)
        u = Uri.parse(url)
        path = (u.path or "/") + (("?" + u.query) if u.query else "")
        return self.is_allowed_path(path)

    def is_allowed_path(self, pathq: str) -> bool:
        """Same check on an already-extracted path(+query) — avoids a URL
        re-parse in the per-candidate hot loop."""
        if self.error:
            return False
        if not self._rules:
            return True
        verdict = True
        best_len = -1
        for is_allow, plen, rx in self._rules:
            if rx.match(pathq or "/"):
                if plen > best_len or (plen == best_len and is_allow and not verdict):
                    verdict, best_len = is_allow, plen
        return verdict


def robots_txt_url(any_url: str) -> str:
    u = Uri.parse(any_url)
    port = f":{u.port}" if u.port else ""
    return f"{u.protocol or 'http'}://{u.hostname}{port}/robots.txt"


def host_key(url: str) -> str:
    """Per-host key used for the robots cache / politeness partitioning."""
    u = Uri.parse(url)
    return f"{u.hostname or ''}:{u.port or ''}"
