"""Minimal pure-Python decoders for public container formats (BMP, WAV).

Real parsers over documented public file layouts — BMP's
BITMAPINFOHEADER and the RIFF/WAVE chunk structure — with no third-party
media libraries, so the ``decode_media(decoder=...)`` hook
(:mod:`polars_grouper_spark.functions.multimodal`) is exercised end-to-end
with genuine bytes instead of the deterministic stub.  A production
deployment swaps :func:`decode_bmp_wav` for a PIL/ffmpeg-backed function
with the same signature; the Spark plumbing (Arrow batches, schema,
per-element dispatch) is identical.

Returned dict matches ``multimodal.DECODED_SCHEMA``:
``{width, height, sample_rate, n_frames, features}`` — features are
``FEATURE_DIM`` doubles derived from the decoded payload content (first
pixels / samples, normalized), real content-derived values rather than
hash fakes.
"""

from __future__ import annotations

import struct

FEATURE_DIM = 8

_NULL = {
    "width": None,
    "height": None,
    "sample_rate": None,
    "n_frames": None,
    "features": None,
}


def parse_bmp(payload: bytes) -> dict:
    """Parse a BMP file's BITMAPINFOHEADER: (width, height) plus features
    from the first pixel bytes.  Negative height (top-down rows) reports
    its magnitude, as image libraries do."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    pixels = payload[data_offset:]
    feats = [b / 255.0 for b in pixels[:FEATURE_DIM]]
    feats += [0.0] * (FEATURE_DIM - len(feats))
    return {
        "width": width,
        "height": abs(height),
        "sample_rate": None,
        "n_frames": 1,
        "features": feats,
    }


def parse_wav(payload: bytes) -> dict:
    """Walk a RIFF/WAVE file's chunks: sample_rate from ``fmt ``,
    n_frames = data bytes / block align; features from the first PCM
    samples (16-bit LE, normalized to [-1, 1])."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    sample_rate = block_align = bits = None
    data = b""
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            _fmt, _ch, sample_rate, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or not block_align:
        raise ValueError("WAV payload has no fmt chunk")
    n_frames = len(data) // block_align
    if bits == 16:
        n = min(FEATURE_DIM, len(data) // 2)
        samples = struct.unpack_from(f"<{n}h", data, 0) if n else ()
        feats = [s / 32768.0 for s in samples]
    else:  # 8-bit PCM is unsigned
        feats = [(b - 128) / 128.0 for b in data[:FEATURE_DIM]]
    feats += [0.0] * (FEATURE_DIM - len(feats))
    return {
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "features": feats,
    }


def decode_bmp_wav(payload: bytes | None, kind: str) -> dict:
    """``decode_media(decoder=...)``-compatible decoder: sniffs the payload
    magic (the ``kind`` tag is advisory, as with real files) and parses
    BMP or WAV; anything else raises — honest failure, not a fake."""
    if payload is None:
        return dict(_NULL)
    if payload[:2] == b"BM":
        return parse_bmp(payload)
    if payload[:4] == b"RIFF":
        return parse_wav(payload)
    raise ValueError(
        f"unrecognized payload magic {payload[:4]!r}; decode_bmp_wav handles "
        "BMP and RIFF/WAVE only — plug a full codec via decode_media(decoder=...)"
    )
