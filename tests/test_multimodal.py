"""Multimodal plumbing: schema, metadata fan-out, stubbed decode, plans."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from changepoynt_spark.operators import multimodal


@pytest.fixture(scope='module')
def media(spark):
    df = multimodal.synthetic_media_table(spark, n_items=24)
    df.cache().count()
    return df


def test_extract_features_deterministic_and_shaped(spark, media):
    a = multimodal.extract_features(media).toPandas().sort_values('media_id')
    b = multimodal.extract_features(media).toPandas().sort_values('media_id')
    assert a['media_id'].tolist() == b['media_id'].tolist()
    for fa, fb in zip(a['feature'], b['feature']):
        np.testing.assert_array_equal(fa, fb)
        assert len(fa) == 16
    assert (a['n_bytes'] > 0).all()


def test_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception):
        multimodal.extract_features(media, deterministic_fake=False).count()


def test_frame_plan_counts_match_durations(spark, media):
    plan = multimodal.frame_sample_plan(media, every_ms=5000).toPandas()
    vids = media.filter("modality = 'video'").select('media_id', 'duration_ms') \
                .toPandas()
    for _, r in vids.iterrows():
        expect = r['duration_ms'] // 5000 + 1
        assert (plan['media_id'] == r['media_id']).sum() == expect


def test_resize_plan_fits_and_preserves_aspect(spark, media):
    plan = multimodal.resize_plan(media, max_side=256).toPandas()
    imgs = media.filter("modality = 'image'").count()
    assert len(plan) == imgs
    for _, r in plan.iterrows():
        assert 1 <= r['out_width'] <= 256 and 1 <= r['out_height'] <= 256
        if max(r['width'], r['height']) <= 256:
            assert r['scale'] == 1.0           # never upscale
            assert (r['out_width'], r['out_height']) == (r['width'], r['height'])
        else:
            # aspect preserved within ceil rounding
            ar_in = r['width'] / r['height']
            ar_out = r['out_width'] / r['out_height']
            assert abs(ar_in - ar_out) / ar_in < 0.1


def test_plans_prune_payload_from_parquet_scan(spark, media, tmp_path):
    """The binary payload column must not be READ for metadata-only plans:
    on a parquet-backed table the scan's ReadSchema excludes it (column
    pruning reaches the file format)."""
    import contextlib, io, re
    path = str(tmp_path / 'media')
    media.write.parquet(path)
    disk = spark.read.parquet(path)
    for plan_df in (multimodal.frame_sample_plan(disk),
                    multimodal.resize_plan(disk)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain(mode='formatted')
        txt = buf.getvalue()
        read_schema = re.search(r'ReadSchema: ([^\n]*)', txt).group(1)
        assert 'payload' not in read_schema, read_schema
