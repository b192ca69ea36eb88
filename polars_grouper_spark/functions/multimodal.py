"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas`` kernels, partitioning discipline — while the actual codec
work (PIL/ffmpeg/torchaudio) is STUBBED behind ``_decode_bytes_stub``:
this container has no media libraries, so decode produces a deterministic
fake derived from the payload bytes, and the real-codec path raises
``NotImplementedError`` with a clear message.  Swapping in a real decoder
changes one function, not the plumbing — and the hook is proven with real
bytes: :mod:`polars_grouper_spark.functions.codecs` ships pure-Python BMP
and RIFF/WAVE parsers (public formats, no deps) driven end-to-end through
``decode_media(decoder=codecs.decode_bmp_wav)`` in ``tests/test_multimodal``.

Schema convention::

    media: struct<media_id: long, kind: string, payload: binary,
                  meta: struct<width: int, height: int, sample_rate: int,
                               n_frames: int>>

Scale notes: payloads stay columnar end-to-end (parquet binary → Arrow →
pandas ``bytes``); never collect payloads to the driver; decode kernels
are ``mapInPandas`` so one task streams batches, keeping peak memory at
batch size × decoded size.  Repartition by size-classes upstream if
payload skew (one 4 GB video vs thousands of thumbnails) unbalances tasks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 8


def attach_fake_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a deterministic binary payload per row (for plumbing tests on
    tables that have no real media)."""
    payload = F.to_binary(F.md5(F.col(text_col)), F.lit("hex"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.struct(
            F.col(id_col).cast("long").alias("media_id"),
            kind.alias("kind"),
            payload.alias("payload"),
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("int").alias("n_frames"),
            ).alias("meta"),
        ).alias("media"),
    )


def _decode_bytes_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode. Real decoders are not available in this
    environment — see module docstring."""
    if payload is None:
        return {"width": None, "height": None, "sample_rate": None, "n_frames": None,
                "features": None}
    # Hash the hex encoding (not the raw bytes): deterministic either way,
    # but hex keeps the fake meta reproducible in engines whose md5() only
    # accepts strings (the DuckDB oracle).
    digest = hashlib.md5(payload.hex().encode()).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    sample_rate = 8000 + (digest[2] % 4) * 8000
    n_frames = 1 + digest[3] % 32
    features = [
        (int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0) for i in range(FEATURE_DIM)
    ]
    return {
        "width": width if kind == "image" or kind == "video" else None,
        "height": height if kind == "image" or kind == "video" else None,
        "sample_rate": sample_rate if kind == "audio" else None,
        "n_frames": n_frames if kind == "video" else 1,
        "features": features,
    }


def _decode_bytes_real(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "Real media decoding (PIL/ffmpeg) is not available in this "
        "environment; use use_stub=True (deterministic fake) or plug a "
        "decoder into decode_media(decoder=...)"
    )


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    f"n_frames int, features array<double>"
)


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    use_stub: bool = True,
    decoder=None,
) -> DataFrame:
    """Decode/feature-extract media payloads → one row per media item.

    Arrow-batched ``mapInPandas``; the decode function runs per element
    inside a batch (vectorized transfer, scalar codec work — the codec is
    the bottleneck, not the transfer).
    """
    decode = decoder or (_decode_bytes_stub if use_stub else _decode_bytes_real)
    flat = df.select(
        F.col(f"{media_col}.media_id").alias("media_id"),
        F.col(f"{media_col}.kind").alias("kind"),
        F.col(f"{media_col}.payload").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "width": [], "height": [],
                "sample_rate": [], "n_frames": [], "features": [],
            }
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = decode(bytes(payload) if payload is not None else None, kind)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["sample_rate"].append(d["sample_rate"])
                out["n_frames"].append(d["n_frames"])
                out["features"].append(d["features"])
            yield pd.DataFrame(out)

    return flat.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    every_nth: int = 4,
    frame_bytes: int = 4,
) -> DataFrame:
    """Sample every n-th fixed-size block of a video payload → one row per
    sampled frame (media_id, frame_no, frame binary).

    The blocking is the stub stand-in for real frame boundaries; the
    explode/partition shape is what a real ffmpeg-based splitter produces.
    """
    flat = df.select(
        F.col(f"{media_col}.media_id").alias("media_id"),
        F.col(f"{media_col}.payload").alias("payload"),
    ).where(F.col(f"{media_col}.kind") == "video")
    n_blocks = (F.length("payload") / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_blocks - 1, F.lit(0)))
    sampled = F.filter(idx, lambda i: i % every_nth == 0)
    return flat.select(
        "media_id",
        F.explode(sampled).alias("frame_no"),
        F.col("payload").alias("_p"),
    ).select(
        "media_id",
        "frame_no",
        F.substring(
            F.col("_p"), F.col("frame_no") * frame_bytes + 1, F.lit(frame_bytes)
        ).alias("frame"),
    )
