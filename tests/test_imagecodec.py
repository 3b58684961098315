"""Image codec + corpus fidelity (north-rule invariant: decoded pixels
allclose for lossless, PSNR >= 40 dB for lossy; caption equality)."""

import numpy as np
import pytest

from simplecrawler_ray.functions.imagecodec import (
    decode_fakejpeg,
    decode_image,
    decode_png,
    encode_fakejpeg,
    encode_image,
    encode_png,
    phash64,
    psnr,
)
from simplecrawler_ray.sources.web import ScaleWeb


def _test_image(seed=42, side=48):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (side // 8, side // 8, 3)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8, 1)))
    img = np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)
    return img


def test_png_roundtrip_exact():
    img = _test_image()
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_odd_dims():
    img = _test_image()[:37, :41]
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_fakejpeg_lossy_psnr():
    img = _test_image()
    dec = decode_fakejpeg(encode_fakejpeg(img, quality=95))
    assert psnr(img, dec) >= 40.0


def test_fakejpeg_quality_ordering():
    img = _test_image()
    p50 = psnr(img, decode_fakejpeg(encode_fakejpeg(img, 50)))
    p95 = psnr(img, decode_fakejpeg(encode_fakejpeg(img, 95)))
    assert p95 > p50


def test_decode_dispatch_and_jpeg_stub():
    img = _test_image()
    assert np.array_equal(decode_image(encode_image(img, "png")), img)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0fakejpegheader")
    with pytest.raises(ValueError):
        decode_image(b"garbage")


def test_phash_stability_and_similarity():
    img = _test_image()
    h1 = phash64(img)
    assert h1 == phash64(img)  # deterministic
    lossy = decode_fakejpeg(encode_fakejpeg(img, 85))
    h2 = phash64(lossy)
    # near-dup: small hamming distance
    assert bin(np.uint64(h1 ^ h2) & np.uint64(0xFFFFFFFFFFFFFFFF)).count("1") <= 6
    other = _test_image(seed=99)
    h3 = phash64(other)
    assert bin(np.uint64(h1 ^ h3) & np.uint64(0xFFFFFFFFFFFFFFFF)).count("1") > 10


def test_corpus_row_fidelity():
    """The north-rule per-row invariant over ScaleWeb corpus rows."""
    sw = ScaleWeb(n_pages=20, n_hosts=2)
    for i in range(20):
        row = sw.corpus_row(i)
        px = sw.pixels_of(i)
        dec = decode_image(row["bytes"])
        if row["fmt"] == "png":
            assert np.array_equal(dec, px), f"png row {i} not lossless"
        else:
            assert psnr(px, dec) >= 40.0, f"jpeg row {i} PSNR < 40"
        assert row["caption"] == sw.caption_of(i)
        assert row["phash"] == phash64(px)
        assert (row["w"], row["h"]) == (px.shape[1], px.shape[0])
