"""Pure-numpy WAV/PCM audio codec — REAL, no audio libraries needed.

RIFF/WAVE PCM is a struct-packed container around raw samples, so
encode/decode are exact numpy operations (like the PNG path in
imagecodec.py).  Supported: PCM 8/16/32-bit int and 32-bit float,
mono or interleaved multichannel.  Compressed codecs (MP3/AAC/OGG)
would need external libraries and stay behind the multimodal stubs.

Fidelity contract mirrors the image codec: int16 round-trip is exact
up to quantization (|err| <= 1/32767 in float), float32 is lossless.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(pcm: np.ndarray, sample_rate: int = 16_000,
               bits: int = 16) -> bytes:
    """float PCM in [-1, 1] (shape (n,) or (n, channels)) -> WAV bytes."""
    pcm = np.asarray(pcm, dtype=np.float32)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if bits == 16:
        data = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype("<i2").tobytes()
        fmt_code, bytes_per = 1, 2
    elif bits == 32:
        data = pcm.astype("<f4").tobytes()
        fmt_code, bytes_per = 3, 4  # IEEE float
    elif bits == 8:
        data = np.clip(np.rint(pcm * 127.0) + 128, 0, 255).astype(np.uint8).tobytes()
        fmt_code, bytes_per = 1, 1
    else:
        raise ValueError(f"unsupported bits {bits}")
    block_align = ch * bytes_per
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate, byte_rate,
                      block_align, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(blob: bytes) -> "tuple[np.ndarray, int]":
    """WAV bytes -> (float32 PCM in [-1, 1] shape (n, channels), rate)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_code = ch = rate = bits = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt_code, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    elif fmt_code == 1 and bits == 8:
        pcm = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    elif fmt_code == 1 and bits == 32:
        pcm = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483647.0
    elif fmt_code == 3 and bits == 32:
        pcm = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code={fmt_code} bits={bits}")
    if ch and ch > 1:
        pcm = pcm.reshape(-1, ch)
    else:
        pcm = pcm.reshape(-1, 1)
    return pcm, int(rate)
