"""Link-discovery conformance goldens.

Transcribed from reference test/specs/discovery.unit.spec.ts:22-189 —
exact expected URL lists including ordering.
"""

from simplecrawler_ray.discovery import discover_resources, clean_expand_resources


def discover(text, url="", protocol=None, **opts):
    return clean_expand_resources(discover_resources(text, **opts), url, protocol)


def test_http_prefixed_urls():
    links = discover(
        "  blah blah http://google.com/  blah blah https://fish.com/resource blah  //example.com"
    )
    assert links == ["http://google.com/", "https://fish.com/resource"]


def test_quoted_attributes():
    links = discover(
        "  <a href='google.com'>  <img src=\"http://example.com/resource with spaces.txt\">  url('thingo.com/test.html')"
    )
    assert len(links) == 4
    assert links[0] == "google.com"
    assert links[1] == "http://example.com/resource%20with%20spaces.txt"
    assert links[2] == "thingo.com/test.html"


def test_unquoted_attributes():
    links = discover(
        "  <a href=google.com>  <img src=http://example.com/resource with spaces.txt>  url(thingo.com/test.html)"
    )
    assert links == ["google.com", "http://example.com/resource", "thingo.com/test.html"]


def test_amp_entity():
    links = discover(
        "<a href='http://example.com/resource?with&amp;query=params&amp;and=entities'>"
    )
    assert links == [
        "http://example.com/resource?with&query=params&and=entities",
        "http://example.com/resource",
    ]


def test_numeric_entities():
    links = discover(
        "<a href='http://example.com/resource?with&#38;query=params&#x00026;and=entities'>"
    )
    assert links == [
        "http://example.com/resource?with&query=params&and=entities",
        "http://example.com/resource",
    ]


def test_slash_entity():
    links = discover("<a href='http:&#x2f;&#x2f;example.com&#x2f;resource'>")
    assert links == ["http://example.com/resource"]


def test_meta_redirect():
    links = discover(
        "<meta http-equiv='refresh' content='0; url=/my/other/page.html'>",
        url="http://example.com/",
    )
    assert links == ["http://example.com/my/other/page.html"]


def test_html_comments_disabled():
    links = discover(
        "  <!-- http://example.com/oneline_comment -->  <a href=google.com>  <!--  http://example.com/resource  <a href=example.com>  -->",
        parse_html_comments=False,
    )
    assert links == ["google.com"]


def test_script_tags_disabled():
    links = discover(
        "  <script>var a = \"<a href='http://example.com/oneline_script'></a>\";</script>  <a href=google.com>  <script type='text/javascript'>  http://example.com/resource  <a href=example.com>  </SCRIPT>",
        parse_script_tags=False,
    )
    assert links == ["google.com"]


def test_quote_paren_encoding():
    links = discover(
        "<a href='example.com/resource?with(parentheses)'>"
        " <a href='example.com/resource?with\"double quotes\"'>"
        " <a href=\"example.com/resource?with'single quotes'\">"
    )
    assert links == [
        "example.com/resource?with%28parentheses%29",
        "example.com/resource?with%22double+quotes%22",
        "example.com/resource?with%27single+quotes%27",
    ]


def test_javascript_links():
    links = discover(
        "<a href='javascript:;'>"
        " <a href='javascript: void(0);'>"
        " <a href='javascript: goToURL(\"/page/one\")'>",
        url="http://example.com/",
    )
    assert links == ["http://example.com/", "http://example.com/page/one"]


def test_src_in_query_not_attr():
    links = discover("<a href='https://example.com/?src=3'>My web page</a>")
    assert links == ["https://example.com/?src=3", "https://example.com/"]


def test_fragment_stripping():
    links = discover(
        "<a href='https://example.com/#section'>My web page</a>"
        "<a href='/other/page#blabla'>Link</a>"
        "<a href='#section'>Section</a>",
        url="https://example.com/",
    )
    assert links == ["https://example.com/", "https://example.com/other/page"]


def test_srcset():
    links = discover(
        "<img src='pic.png' srcset='https://example.com/pic-200.png, /pic-400.png 400w, pic-800.png 2x'>",
        url="https://example.com/",
    )
    assert links == [
        "https://example.com/pic.png",
        "https://example.com/pic-200.png",
        "https://example.com/pic-400.png",
        "https://example.com/pic-800.png",
    ]


def test_nofollow():
    assert discover("<meta name='robots' content='nofollow'><a href='/stage2'>Don't follow me!</a>") == []
    assert discover("<meta name='robots' content='nofollow, noindex'><a href='/stage2'>Don't follow me!</a>") == []


def test_relative_url_with_embedded_scheme_not_cached_cross_referrer():
    """'?next=http://x.com/' is RELATIVE (the scheme is in the query);
    the old substring test cached hostA's resolution and served it to
    every other referrer."""
    from simplecrawler_ray.discovery import clean_expand_resources

    a = clean_expand_resources(["?next=http://x.com/"],
                               "http://hosta.com/page")
    b = clean_expand_resources(["?next=http://x.com/"],
                               "http://hostb.com/page")
    assert a and b
    assert "hosta.com" in a[0] and "hostb.com" in b[0]


def test_candidate_row_cache_not_poisoned_cross_referrer():
    from simplecrawler_ray.stages.candidates import (CandidateProcessor,
                                                     candidate_table)

    proc = CandidateProcessor({"filter_by_domain": False,
                               "respect_robots_txt": False}, {})
    t = candidate_table([
        dict(candidate="?next=http://x.com/",
             referrer_url="http://hosta.com/page", referrer_depth=1,
             parent_seq=0, pos=0),
        dict(candidate="?next=http://x.com/",
             referrer_url="http://hostb.com/page", referrer_depth=1,
             parent_seq=0, pos=1),
    ])
    out = proc(t)
    hosts = sorted(out.column("host").to_pylist())
    assert hosts == ["hosta.com", "hostb.com"]


def test_process_url_rejects_out_of_range_port():
    from simplecrawler_ray.urlnorm import process_url

    assert process_url("http://h.com:99999999999/x",
                       "http://h.com/") is None
    assert process_url("http://h.com:65536/x", "http://h.com/") is None
    row = process_url("http://h.com:65535/x", "http://h.com/")
    assert row is not None and row.port == 65535
