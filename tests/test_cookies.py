"""Cookie parse/serialize round-trip goldens.

Transcribed from reference test/specs/cookies.unit.spec.ts:9-74
(real-world Set-Cookie strings; RMID expires == 4080259914000 ms).
"""

import time

import pytest

from simplecrawler_ray.cookies import Cookie, CookieError, CookieJar

COOKIES = [
    "Set-Cookie: RMID=007f010019155170d6ca005f; Expires=Sat, 19 Apr 2099 05:31:54 GMT; Path=/; Domain=.nytimes.com;",
    "Set-cookie: adxcs=-; path=/; domain=.nytimes.com",
    "Set-Cookie: PREF=ID=8c63f2522e22574d:FF=0:TM=1366349569:LM=1366349569:S=p1Urbmfwfs-R573P; expires=Sun, 19-Apr-2099 05:32:49 GMT; path=/; domain=.google.com",
    "Set-Cookie: NID=67=DhLO04YPAMlhETrTIe2oFPqWZfypQXLZfCIPItOvf70zhtUEMEItYfdVh6aROEzRHqtd9jHT6HJ7Oo93eqP3cjYNp8GgShfa6r0WVbsmQQRUvutbjBOPwzo7ybwYcWdB; expires=Sat, 19-Oct-2099 05:32:49 GMT; path=/; domain=.google.com; HttpOnly",
    "Set-Cookie: fpc=d=Yq1z8hbA9WextmPFlb7suMTfMRgtSc2FyzAB7now1ExfUZ.eW7s4QSwSKlB6ZB0juN8OLZxWf_XXEIcspYaQmVVD0mD0xJ.xpXBCSw5Dl_Ql6n.RLoM.7CnTbNSsiSr2fkNiCN47tRUB4j8iWevNwQdFDn1hB8z8t1xwWt76n.sLIRY9p2_jTBhukfSD4SBpBkJhI1o-&v=2; expires=Sat, 19-Apr-2099 05:48:42 GMT; path=/; domain=www.yahoo.com",
    "Set-Cookie: test=test; path=/test; domain=test.com",
]


def test_parse_rmid():
    c = Cookie.from_string(COOKIES[0])
    assert c.name == "RMID"
    assert c.value == "007f010019155170d6ca005f"
    assert c.expires == 4080259914000
    assert c.path == "/"
    assert c.domain == ".nytimes.com"
    assert c.httponly is False


def test_parse_no_expiry():
    c = Cookie.from_string(COOKIES[1])
    assert (c.name, c.value, c.expires, c.path, c.domain, c.httponly) == (
        "adxcs", "-", -1, "/", ".nytimes.com", False)


def test_parse_value_with_equals():
    c = Cookie.from_string(COOKIES[2])
    assert c.value.startswith("ID=8c63f2522e22574d:FF=0")


def test_httponly():
    assert Cookie.from_string(COOKIES[3]).httponly is True


def test_expiry_check():
    now = time.time() * 1000
    assert Cookie("test", "test", now - 1000).is_expired()
    assert not Cookie("test", "test", now + 20000).is_expired()
    assert not Cookie("test", "test").is_expired()  # -1 == never


def test_roundtrip_all():
    for s in COOKIES:
        a = Cookie.from_string(s)
        b = Cookie.from_string(a.to_string(include_header=True))
        assert (a.name, a.value, a.expires, a.path, a.domain, a.httponly) == (
            b.name, b.value, b.expires, b.path, b.domain, b.httponly)


def test_faulty_cookie_raises():
    # the /stage2 route's "=test; ..." cookie (routes.ts:26-31)
    with pytest.raises(CookieError):
        Cookie.from_string("=test; path=/stage2; domain=test.com")


def test_jar_upsert_and_header():
    jar = CookieJar()
    for s in COOKIES:
        jar.add(s)
    assert len(jar.cookies) == 6
    # upsert by (name, domain)
    jar.add("Set-Cookie: test=other; path=/test; domain=test.com")
    assert len(jar.cookies) == 6
    assert jar.get("test")[0].value == "other"
    hdrs = jar.get_as_header(domain="nytimes.com")
    assert any(h.startswith("RMID=") for h in hdrs)
    assert not any(h.startswith("test=") for h in hdrs)


def test_domain_matching():
    # reference semantics (src/cookies.ts:305-312): cookie-domain reversed
    # must START WITH request-domain reversed — so ".nytimes.com" matches
    # "nytimes.com" but NOT "www.nytimes.com"
    c = Cookie.from_string(COOKIES[0])
    assert c.match_domain("nytimes.com") is True
    assert c.match_domain("www.nytimes.com") is False
    assert Cookie("a", "b").match_domain("anything")  # "*" matches all
