"""Property-based invariants for the urijs-parity canonicalizer.

These guard the canonical-URL function that everything hashes off:
* normalize is idempotent (canonical form is a fixed point)
* href -> parse -> href round-trips
* process_url output re-canonicalizes to itself (url_hash stability)
"""

import string

from hypothesis import given, settings, strategies as st

from simplecrawler_ray.urlnorm import Uri, process_url

# URL-ish alphabet incl. chars that exercise encode/decode paths
_path_chars = string.ascii_letters + string.digits + "-._~!$&'()*+,;=:@% /"
_query_chars = string.ascii_letters + string.digits + "-._~&=+%"
_host_chars = string.ascii_lowercase + string.digits + "-."


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", ""]))
    host = draw(st.text(_host_chars, min_size=1, max_size=20)).strip("-.") or "h"
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(st.text(_path_chars, max_size=30)).replace(" ", "%20")
    query = draw(st.sampled_from(["", "?a=1", "?b=2&a=1&a=3", "?x"]))
    frag = draw(st.sampled_from(["", "#f"]))
    if scheme:
        return f"{scheme}://{host}{port}/{path}{query}{frag}"
    return f"/{path}{query}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(u):
    try:
        once = Uri.parse(u).normalize().href()
    except (ValueError, UnicodeDecodeError):
        return
    twice = Uri.parse(once).normalize().href()
    assert once == twice


@given(urls())
@settings(max_examples=300, deadline=None)
def test_parse_href_roundtrip_stable(u):
    try:
        h1 = Uri.parse(u).href()
    except (ValueError, UnicodeDecodeError):
        return
    h2 = Uri.parse(h1).href()
    assert h1 == h2


@given(urls(), st.sampled_from(["http://base.example/dir/page", ""]))
@settings(max_examples=300, deadline=None)
def test_process_url_fixed_point(u, ref):
    row = process_url(u, ref)
    if row is None:
        return
    again = process_url(row.url, ref)
    assert again is not None
    # canonical form is a fixed point => url_hash is stable
    assert again.url == row.url
    assert (again.host, again.port, again.protocol) == (row.host, row.port, row.protocol)
