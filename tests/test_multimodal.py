import pytest

from polars_grouper_spark.functions import multimodal as mm


def _docs(spark):
    rows = [(i, f"document number {i} with some content") for i in range(9)]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_attach_and_decode_stub(spark):
    media = mm.attach_fake_media(_docs(spark))
    decoded = mm.decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 9
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert set(by_kind) == {"image", "audio", "video"}
    for r in by_kind["image"]:
        assert r["width"] is not None and r["sample_rate"] is None
    for r in by_kind["audio"]:
        assert r["sample_rate"] is not None and r["width"] is None
    for r in rows:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])


def test_decode_deterministic(spark):
    media = mm.attach_fake_media(_docs(spark))
    a = {r["media_id"]: r["features"] for r in mm.decode_media(media).collect()}
    b = {r["media_id"]: r["features"] for r in mm.decode_media(media).collect()}
    assert a == b


def test_real_decoder_raises(spark):
    media = mm.attach_fake_media(_docs(spark)).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_media(media, use_stub=False).collect()


def test_frame_sample(spark):
    media = mm.attach_fake_media(_docs(spark))
    frames = mm.frame_sample(media, every_nth=2, frame_bytes=4).collect()
    assert frames  # md5 payload = 16 bytes -> 4 blocks -> blocks 0 and 2
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_no"])
    for frame_nos in per_media.values():
        assert frame_nos == [0, 2]
