import pytest
from pyspark.sql import functions as F

from etl_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x00\x01\x02\x03" * 100, ("image", "png", 10, 10, None, None)),
        (2, b"\xff" * 50, ("audio", "wav", None, None, 2500, 16000)),
        (3, b"\xaa\xbb" * 200, ("video", "mp4", 640, 480, 3500, None)),
        (4, None, ("image", "png", 1, 1, None, None)),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_extract_features_fake(spark, media):
    out = multimodal.extract_features(media, decode_stub="fake")
    assert out.schema == multimodal.FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 400
    assert len(rows[1].features) == 8
    assert abs(sum(rows[1].features) - 1.0) < 1e-5  # histogram normalized
    assert rows[4].n_bytes is None and rows[4].features is None
    # deterministic
    again = {r.media_id: r.content_hash for r in
             multimodal.extract_features(media, decode_stub="fake").collect()}
    assert again[2] == rows[2].content_hash


def test_extract_features_raise(spark, media):
    out = multimodal.extract_features(media, decode_stub="raise")
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        out.collect()


def test_frame_sample_plan(spark, media):
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert {r.media_id for r in rows} == {3}  # only the video
    assert [r.frame_ts_ms for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1000, 2000]


def test_repartition_by_bytes(spark, media):
    out = multimodal.repartition_by_bytes(media, target_partition_bytes=300)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == 4


def test_resize_images_stub(spark, media):
    out = multimodal.resize_images(media, width=4, height=4)
    rows = {r.media_id: r for r in out.collect()}
    # only image rows survive the filter
    src = {r.media_id for r in media.filter("meta.media_type = 'image'").collect()}
    assert set(rows) == src
    for r in rows.values():
        if r.payload is not None:
            assert len(r.payload) == 16
        assert (r.width, r.height) == (4, 4)


def test_resize_images_raise(spark, media):
    import pytest as _pytest

    out = multimodal.resize_images(media, 4, 4, decode_stub="raise")
    with _pytest.raises(Exception, match="NotImplementedError|codecs"):
        out.collect()
