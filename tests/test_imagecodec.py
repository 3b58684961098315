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


def test_wav_roundtrip_fidelity():
    """Real WAV/PCM codec: int16 round-trip within quantization, float32
    lossless, stereo interleave preserved — the audio analogue of the
    image PSNR fidelity contract."""
    import numpy as np

    from simplecrawler_ray.functions.audiocodec import decode_wav, encode_wav

    t = np.linspace(0, 1, 8000, dtype=np.float32)
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    blob = encode_wav(mono, sample_rate=8000, bits=16)
    pcm, rate = decode_wav(blob)
    assert rate == 8000 and pcm.shape == (8000, 1)
    assert np.abs(pcm[:, 0] - mono).max() <= 1.0 / 32767 + 1e-6

    stereo = np.stack([mono, -mono], axis=1)
    pcm2, _ = decode_wav(encode_wav(stereo, sample_rate=8000, bits=32))
    assert pcm2.shape == (8000, 2)
    assert np.allclose(pcm2, stereo)  # float32 container: lossless

    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_audio_feature_stage_real_wav():
    import numpy as np
    import pyarrow as pa

    from simplecrawler_ray.functions.audiocodec import encode_wav
    from simplecrawler_ray.functions.multimodal import AudioFeatureStage

    t = np.linspace(0, 1, 4000, dtype=np.float32)
    tone = (0.25 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    loud = (0.9 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    batch = pa.table({"bytes": pa.array(
        [encode_wav(tone, 4000), encode_wav(loud, 4000), b"zzz-not-audio"],
        pa.binary())})
    out = AudioFeatureStage()(batch)
    rms = out.column("audio_rms").to_pylist()
    srs = out.column("audio_sr").to_pylist()
    assert srs[0] == 4000 and srs[1] == 4000 and srs[2] == 0
    assert abs(rms[0] - 0.25 / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    assert abs(rms[1] - 0.9 / np.sqrt(2)) < 0.03
    # real_decode demands a true codec for non-WAV -> per-row error
    out2 = AudioFeatureStage(real_decode=True)(batch)
    errs = out2.column("audio_decode_error").to_pylist()
    assert errs[0] == "" and "stubbed" in errs[2]


def test_framepack_roundtrip_and_sampling():
    """FPK1 container: real demux, uniform K-frame sampling, pixel
    fidelity through the pack (PNG frames lossless)."""
    import numpy as np
    import pyarrow as pa

    from simplecrawler_ray.functions.imagecodec import decode_image
    from simplecrawler_ray.functions.multimodal import (
        VideoFrameSampleStage, decode_framepack, encode_framepack)

    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (6, 6, 3)).astype("uint8") for _ in range(9)]
    blob = encode_framepack(frames, "png")
    back = decode_framepack(blob)
    assert len(back) == 9
    assert np.array_equal(decode_image(back[4]), frames[4])  # lossless

    batch = pa.table({"bytes": pa.array([blob, b"\x00\x00fakevid"], pa.binary())})
    out = VideoFrameSampleStage(k=3)(batch)
    counts = out.column("frame_count").to_pylist()
    assert counts[0] == 3  # sampled down from 9
    sampled = out.column("frames").to_pylist()[0]
    # uniform sampling hits first and last frames
    assert np.array_equal(decode_image(sampled[0]), frames[0])
    assert np.array_equal(decode_image(sampled[2]), frames[8])
    # real_decode: non-FPK container -> per-row error, no fake frames
    out2 = VideoFrameSampleStage(k=3, real_decode=True)(batch)
    assert out2.column("frame_count").to_pylist()[1] == 0
    assert "stubbed" in out2.column("video_decode_error").to_pylist()[1]


def test_pluggable_decoders_injection():
    """Round-2 verdict #8: production codecs plug in through stage
    constructors — no stage edits.  A fake 'real JPEG' decoder, audio
    decoder and video demuxer are injected and drive the same plumbing."""
    import numpy as np
    import pyarrow as pa

    from simplecrawler_ray.functions.imagecodec import encode_image
    from simplecrawler_ray.functions.multimodal import (
        AudioFeatureStage, ImageDecodeStage, VideoFrameSampleStage)

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)

    def jpeg_decoder(blob):
        assert blob == b"\xff\xd8fakejpeg"
        return rgb

    batch = pa.table({"bytes": pa.array([b"\xff\xd8fakejpeg"], pa.binary())})
    out = ImageDecodeStage(decoder=jpeg_decoder)(batch)
    assert out.column("decode_error")[0].as_py() == ""
    assert out.column("img_w")[0].as_py() == 4

    def mp3_decoder(blob):
        return np.ones(256, np.float32) * 0.5, 22050

    abatch = pa.table({"bytes": pa.array([b"ID3fakemp3"], pa.binary())})
    aout = AudioFeatureStage(decoder=mp3_decoder)(abatch)
    assert aout.column("audio_sr")[0].as_py() == 22050
    assert abs(aout.column("audio_rms")[0].as_py() - 0.5) < 1e-6

    def mp4_demuxer(blob):
        return [encode_image(rgb, "png") for _ in range(7)]

    vbatch = pa.table({"bytes": pa.array([b"\x00\x00\x00 ftypisom"], pa.binary())})
    vout = VideoFrameSampleStage(k=3, demuxer=mp4_demuxer)(vbatch)
    assert vout.column("frame_count")[0].as_py() == 3
    assert vout.column("video_decode_error")[0].as_py() == ""


def test_video_demuxer_per_row_errors():
    """Round-3 advice #2: a plugged-in demuxer is never called for empty
    blobs, and its exceptions become per-row video_decode_error rows —
    the ImageDecodeStage contract, not a whole-batch failure."""
    import pyarrow as pa

    from simplecrawler_ray.functions.multimodal import VideoFrameSampleStage

    calls = []

    def bad_demux(blob):
        calls.append(blob)
        raise RuntimeError("boom")

    t = pa.table({"bytes": pa.array([b"", b"notfpk"], pa.binary())})
    out = VideoFrameSampleStage(demuxer=bad_demux)(t)
    errs = out.column("video_decode_error").to_pylist()
    assert errs[0] == "empty"
    assert errs[1].startswith("demux failed")
    assert calls == [b"notfpk"]  # empty blob skipped the demuxer
    assert out.column("frame_count").to_pylist() == [0, 0]


def test_corrupt_framepack_is_per_row_error():
    import pyarrow as pa

    from simplecrawler_ray.functions.multimodal import (
        VideoFrameSampleStage, encode_framepack)

    good = encode_framepack([_test_image(1, 8)], "png")
    corrupt = good[:10]  # truncated pack
    t = pa.table({"bytes": pa.array([good, corrupt], pa.binary())})
    out = VideoFrameSampleStage(k=2)(t)
    assert out.column("frame_count").to_pylist()[0] == 1
    assert out.column("video_decode_error").to_pylist()[0] == ""
    assert out.column("frame_count").to_pylist()[1] == 0
    assert out.column("video_decode_error").to_pylist()[1].startswith(
        "demux failed")


def test_pillow_decoder_real_codec_gate():
    """Round-3 verdict #6: the real-codec swap path is exercised, not
    just faked — with pillow installed the factory's decoder round-trips
    our PNG bytes through the stage; without it the factory raises a
    clear ImportError.  Green in both environments."""
    import importlib.util

    import pyarrow as pa

    from simplecrawler_ray.functions.multimodal import (
        ImageDecodeStage, pillow_decoder)

    arr = _test_image(9, 16)
    blob = encode_image(arr, "png")
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(ImportError, match="pillow"):
            pillow_decoder()
        return
    dec = pillow_decoder()
    np.testing.assert_array_equal(dec(blob), arr)
    out = ImageDecodeStage(decoder=dec)(
        pa.table({"bytes": pa.array([blob], pa.binary())}))
    assert out.column("decode_error")[0].as_py() == ""
    assert out.column("img_w")[0].as_py() == arr.shape[1]


def test_soundfile_decoder_real_codec_gate():
    """Audio analogue of the pillow gate: with soundfile installed the
    factory's decoder round-trips WAV bytes through AudioFeatureStage;
    without it the factory raises a clear ImportError.  Green in both
    environments."""
    import importlib.util

    import pyarrow as pa

    from simplecrawler_ray.functions.audiocodec import encode_wav
    from simplecrawler_ray.functions.multimodal import (
        AudioFeatureStage, soundfile_decoder)

    if importlib.util.find_spec("soundfile") is None:
        with pytest.raises(ImportError, match="soundfile"):
            soundfile_decoder()
        return
    dec = soundfile_decoder()
    t = np.linspace(0, 1, 8000, dtype=np.float32)
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).reshape(-1, 1)
    blob = encode_wav(pcm, sample_rate=8000)
    got, rate = dec(blob)
    assert rate == 8000 and abs(len(got) - 8000) <= 1
    out = AudioFeatureStage(decoder=dec, real_decode=True)(
        pa.table({"bytes": pa.array([blob], pa.binary())}))
    assert out.column("audio_decode_error")[0].as_py() == ""
    assert out.column("audio_rms")[0].as_py() > 0.1


def test_pyav_demuxer_real_container_gate():
    """Video analogue of the pillow gate: with PyAV installed the
    factory demuxes a container it muxed itself through
    VideoFrameSampleStage; without it the factory raises a clear
    ImportError.  Green in both environments."""
    import importlib.util

    import pyarrow as pa

    from simplecrawler_ray.functions.multimodal import (
        VideoFrameSampleStage, pyav_demuxer)

    if importlib.util.find_spec("av") is None:
        with pytest.raises(ImportError, match="pyav"):
            pyav_demuxer()
        return
    import io

    import av

    demux = pyav_demuxer()
    buf = io.BytesIO()
    try:
        with av.open(buf, "w", format="avi") as container:
            stream = container.add_stream("mpeg4", rate=4)
            stream.width, stream.height = 32, 32
            stream.pix_fmt = "yuv420p"
            for i in range(6):
                arr = np.full((32, 32, 3), i * 40, np.uint8)
                frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
    except getattr(av, "FFmpegError", getattr(av, "AVError", OSError)) as e:
        # codec not built in (AVError renamed FFmpegError in PyAV >= 14)
        pytest.skip(f"pyav present but mpeg4 encoder unavailable: {e}")
    blob = buf.getvalue()
    frames = demux(blob)
    assert len(frames) == 6
    out = VideoFrameSampleStage(k=3, demuxer=demux, real_decode=True)(
        pa.table({"bytes": pa.array([blob], pa.binary())}))
    assert out.column("frame_count")[0].as_py() == 3
    assert out.column("video_decode_error")[0].as_py() == ""


def test_image_decode_stage_corrupt_blob_is_per_row(ray_session):
    """A corrupt blob with a valid PNG signature (struct/zlib errors)
    must fill decode_error, never kill the batch."""
    import pyarrow as pa
    import ray.data as rd

    from simplecrawler_ray.functions.imagecodec import encode_png
    from simplecrawler_ray.functions.multimodal import ImageDecodeStage

    good = encode_png(np.full((4, 4, 3), 7, np.uint8))
    corrupt = good[:8] + b"\x00\x01\x02"          # signature ok, body junk
    ds = rd.from_arrow(pa.table({"bytes": pa.array(
        [good, corrupt, b"", None], pa.binary())}))
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out["decode_error"].tolist()[0] == ""
    assert out["decode_error"][1] != ""           # reported, not raised
    assert out["decode_error"].tolist()[2:] == ["empty", "empty"]
    assert out["phash_decoded"][0] != 0


def test_audio_stage_malformed_and_empty_per_row(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from simplecrawler_ray.functions.audiocodec import encode_wav
    from simplecrawler_ray.functions.multimodal import AudioFeatureStage

    good = encode_wav(np.sin(np.linspace(0, 20, 400)).astype(np.float32))
    truncated = b"RIFF" + b"\x04\x00\x00\x00" + b"WAVEfmt " + b"\x04\x00\x00\x00"
    ds = rd.from_arrow(pa.table({"bytes": pa.array(
        [good, truncated, b"", None], pa.binary())}))
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert out["audio_decode_error"][0] == ""
    assert out["audio_decode_error"][1] != ""     # struct.error per-row
    assert out["audio_decode_error"].tolist()[2:] == ["empty", "empty"]
