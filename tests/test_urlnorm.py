"""URL canonicalization conformance goldens.

Transcribed from reference test/specs/resourcevalidity.integration.spec.ts
(processURL / domainValid / protocolSupported sections).
"""

import pytest

from simplecrawler_ray.urlnorm import (
    CanonOpts,
    Uri,
    domain_valid,
    process_url,
    protocol_supported,
)


def test_strip_www():
    opts = CanonOpts(strip_www_domain=True)
    assert process_url("http://www.example.com", "http://example.com:3000", opts=opts).host == "example.com"
    assert process_url("http://example.com", "http://example.com:3000", opts=opts).host == "example.com"
    assert process_url("http://www.example.com", "http://example.com:3000").host == "www.example.com"


def test_strip_querystring():
    opts = CanonOpts(strip_querystring=True)
    assert process_url("http://example.com/example?q=crawler", opts=opts).path == "/example"
    assert process_url("http://example.com/test?q=crawler&foo=bar", opts=opts).path == "/test"
    assert process_url("http://example.com/example?q=crawler").path == "/example?q=crawler"
    assert process_url("http://example.com/test?q=crawler&foo=bar").path == "/test?q=crawler&foo=bar"


def test_sort_query_parameters():
    opts = CanonOpts(sort_query_parameters=True)
    assert process_url("http://example.com/example?s=1&r=9&b=3&r=2&r=7", opts=opts).path == "/example?b=3&r=9&r=2&r=7&s=1"
    assert process_url("http://example.com/test?q=crawler&foo=bar", opts=opts).path == "/test?foo=bar&q=crawler"
    # urijs normalize() groups same-name params even when not sorting
    assert process_url("http://example.com/example?s=1&r=9&b=3&r=2&r=7").path == "/example?s=1&r=9&r=2&r=7&b=3"
    assert process_url("http://example.com/test?q=crawler&foo=bar").path == "/test?q=crawler&foo=bar"


def test_junk_urls_rejected():
    ctx = "http://www.example.com"
    assert process_url("", ctx) is None
    assert process_url("\n\n", ctx) is None
    assert process_url("ur34nfie4985:s////dsf/", ctx) is None


def test_no_referrer():
    r = process_url("/stage2", "http://127.0.0.1:3000")
    assert r.url == "http://127.0.0.1:3000/stage2"
    assert r.depth == 1

    r = process_url("http://example.com/blurp", "http://127.0.0.1:3000")
    assert r.url == "http://example.com/blurp"
    assert r.depth == 1

    r = process_url("/test", "http://example.com", referrer_depth=2)
    assert r.url == "http://example.com/test"
    assert r.depth == 3


def test_port_and_fields():
    r = process_url("http://127.0.0.1:3000/stage/3", "http://127.0.0.1:3000/")
    assert (r.host, r.port, r.protocol, r.uri_path) == ("127.0.0.1", 3000, "http", "/stage/3")


def test_protocol_supported():
    assert protocol_supported("http://google.com")
    assert protocol_supported("https://google.com")
    assert protocol_supported("rss://google.com")
    assert protocol_supported("feed://google.com")
    assert protocol_supported("atom://google.com")
    assert not protocol_supported("gopher://google.com")
    assert not protocol_supported("ws://google.com")
    assert not protocol_supported("javascript:void(0);")
    assert not protocol_supported("undefined://example.com")
    # unspecified protocol assumed http
    assert protocol_supported("google.com")


def test_domain_valid():
    assert domain_valid("example.com", "example.com")
    assert domain_valid("www.example.com", "example.com")  # ignoreWWW default
    assert not domain_valid("other.com", "example.com")
    assert domain_valid("other.com", "example.com", filter_by_domain=False)
    assert domain_valid("foo.com", "example.com", domain_whitelist=["foo.com"])
    assert domain_valid("sub.example.com", "example.com", scan_subdomains=True)
    assert not domain_valid("sub.example.com", "example.com")


def test_relative_parent_resolution():
    r = process_url("../stage5", "http://127.0.0.1:3000/stage/4", referrer_depth=3)
    assert r.url == "http://127.0.0.1:3000/stage5"
    assert r.depth == 4


def test_empty_path_gets_slash():
    # urijs href() adds "/" for empty path on absolute URLs
    assert Uri.parse("http://example.com").normalize().href() == "http://example.com/"


def test_redirect_relative():
    r = process_url("/stage6", "http://127.0.0.1:3000/stage5")
    assert r.url == "http://127.0.0.1:3000/stage6"


def test_iso8859_url_encoding():
    # urijs .iso8859(): UTF-8 escapes re-encoded as latin-1 %XX
    opts = CanonOpts(url_encoding="iso8859")
    r = process_url("http://example.com/caf%C3%A9?x=%C3%A8", opts=opts)
    assert r.uri_path == "/caf%E9"
    assert r.path == "/caf%E9?x=%E8"
