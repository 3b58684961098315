"""Corpus materialization + corpus-backed crawl (the Lance-table path)."""

import numpy as np
import pytest

from simplecrawler_ray.functions.imagecodec import decode_image, psnr
from simplecrawler_ray.pipelines.crawl import CrawlEngine
from simplecrawler_ray.sources.corpus import CorpusReader, CorpusWeb, build_corpus
from simplecrawler_ray.sources.sinks import sanitise_path
from simplecrawler_ray.sources.web import ScaleWeb


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    sw = ScaleWeb(n_pages=60, n_hosts=4, out_degree=3)
    out = str(tmp_path_factory.mktemp("corpus"))
    build_corpus(sw, out, n_buckets=4, rows_per_block=20)
    return sw, out


def test_corpus_reader_lookup(corpus):
    sw, out = corpus
    r = CorpusReader(out, n_buckets=4, max_cached_buckets=2)
    for i in (0, 13, 59):
        row = r.lookup(sw.url_of(i))
        assert row is not None
        assert row["caption"] == sw.caption_of(i)
        dec = decode_image(row["bytes"])
        px = sw.pixels_of(i)
        if row["fmt"] == "png":
            assert np.array_equal(dec, px)
        else:
            assert psnr(px, dec) >= 40.0
    assert r.lookup("http://host0.test/p/99999") is None


def test_corpus_backed_crawl_matches_generator(corpus):
    """CorpusWeb fetch (keyed lookup) == ScaleWeb fetch (generator):
    the crawl over the materialized corpus yields identical captions."""
    sw, out = corpus
    cw = CorpusWeb(out, n_buckets=4)
    eng = CrawlEngine(cw, sw.url_of(0), filter_by_domain=False, seen_shards=2,
                      store_body=False)
    res = eng.run(max_rounds=80)
    t = res.fetched_table()
    caps = dict(zip(t.column("url").to_pylist(), t.column("caption").to_pylist()))
    assert len(res.downloaded_urls()) == 60
    for i in (0, 7, 42):
        assert caps[sw.url_of(i)] == sw.caption_of(i)
    eng.seen.shutdown()


def test_sanitise_path():
    # src/cache-backend-fs.ts:20-69 semantics
    assert sanitise_path("", "") == "index.html"
    assert sanitise_path("/a/b.css", "text/css") == "a/b.css"
    out = sanitise_path("/page?x=1&y=2", "text/html")
    # querystring sha1-hashed, then .html appended (no recognized extension)
    assert out.startswith("page?") and out.endswith(".html")
    assert len(out.split("?")[1]) == 40 + len(".html")
    assert sanitise_path("/dir/", "text/html") == "dir/index.html"
    assert sanitise_path("/about", "text/html") == "about.html"
    assert sanitise_path("/img/1", "image/png") == "img/1.png"
    long = "x" * 260
    assert len(sanitise_path(f"/{long}", "").split("/")[0]) == 40


def test_corpus_reader_missing_bucket_is_a_miss(tmp_path, ray_session):
    """A URL hashing to an empty (never-written) bucket is a 404, not a
    FileNotFoundError out of the fetch task."""
    from simplecrawler_ray.sources.corpus import CorpusReader, build_corpus
    from simplecrawler_ray.sources.web import ScaleWeb

    sw = ScaleWeb(n_pages=5)
    d = str(tmp_path / "corpus")
    build_corpus(sw, d, n_buckets=64, rows_per_block=10)
    rd_ = CorpusReader(d, n_buckets=64)
    # scan urls until one hashes to a bucket with no directory
    import os

    from simplecrawler_ray.sources.web import url_hash64
    missing = {b for b in range(64)
               if not os.path.isdir(os.path.join(d, f"bucket={b}"))}
    assert missing  # 5 pages over 64 buckets must leave gaps
    probe = next(u for u in (f"http://h{i}.test/x" for i in range(1000))
                 if url_hash64(u) % 64 in missing)
    assert rd_.lookup(probe) is None
