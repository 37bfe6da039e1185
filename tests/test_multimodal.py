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


def test_avi_roundtrip_and_guards():
    """Uncompressed AVI encode/decode is bit-exact; compressed or corrupt
    payloads raise instead of decoding garbage."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 19, 27, 3)).astype(np.uint8)
    payload = multimodal.encode_avi(frames, fps=25)
    dec, fps = multimodal.decode_avi(payload)
    assert fps == 25.0
    np.testing.assert_array_equal(dec, frames)
    # odd width exercises the 4-byte DIB row padding
    odd = rng.integers(0, 256, size=(3, 10, 13, 3)).astype(np.uint8)
    np.testing.assert_array_equal(multimodal.decode_avi(multimodal.encode_avi(odd, 5))[0], odd)
    with pytest.raises(ValueError):
        multimodal.decode_avi(b'RIFF\x00\x00\x00\x00WAVE')
    # flip biCompression to a nonzero fourcc -> must refuse
    bad = bytearray(payload)
    strf_at = payload.index(b'strf')
    bad[strf_at + 8 + 16:strf_at + 8 + 20] = b'MJPG'
    with pytest.raises(ValueError, match='BI_RGB'):
        multimodal.decode_avi(bytes(bad))


def test_video_features_are_real_content_features():
    """A static video has zero motion; a rolling gradient has positive
    motion energy; geometry/rate/duration come from the real headers."""
    base = (np.linspace(0, 255, 32)[None, :, None]
            * np.ones((16, 1, 3))).astype(np.uint8)
    static = np.stack([base] * 6)
    moving = np.stack([np.roll(base, 4 * f, axis=1) for f in range(6)])
    f_static = multimodal.video_features(*multimodal.decode_avi(
        multimodal.encode_avi(static, fps=10)))
    f_moving = multimodal.video_features(*multimodal.decode_avi(
        multimodal.encode_avi(moving, fps=10)))
    assert (f_static[0], f_static[1], f_static[2], f_static[3]) == (32, 16, 6, 10)
    assert abs(f_static[4] - 0.6) < 1e-6          # duration = n/fps
    assert f_static[8] == 0.0                     # zero motion
    assert f_moving[8] > 1.0                      # real motion energy
    np.testing.assert_allclose(f_static[5], f_moving[5], rtol=1e-6)  # same pixels overall


def test_sample_frames_decodes_real_frames(spark, media):
    """sample_frames emits one row per sampled frame with that frame's
    IMAGE features — re-derive driver-side from the same payloads."""
    got = multimodal.sample_frames(media, every_ms=200).toPandas()
    src = media.filter("modality = 'video'") \
               .select('media_id', 'payload').toPandas()
    assert set(got['media_id']) == set(src['media_id'])
    checked = 0
    for _, r in src.iterrows():
        frames, fps = multimodal.decode_avi(bytes(r['payload']))
        sub = got[got['media_id'] == r['media_id']].sort_values('frame_idx')
        assert sub['frame_idx'].iloc[0] == 0
        assert sub['frame_idx'].max() <= len(frames) - 1
        for _, rr in sub.iterrows():
            np.testing.assert_array_equal(
                np.asarray(rr['feature'], dtype=np.float32),
                multimodal.image_features(frames[rr['frame_idx']]))
            checked += 1
    assert checked >= 8


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


# -- real decoders (round 4: image/audio decode is no longer stubbed) --------

def test_ppm_wav_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(21, 17)).astype(np.uint8)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(gray)), gray)
    # netpbm comment in header
    p = b'P6\n# a comment\n4 2\n255\n' + bytes(range(24))
    assert multimodal.decode_ppm(p).shape == (2, 4, 3)
    stereo = rng.integers(-32768, 32767, size=(1000, 2)).astype(np.int16)
    dec, sr = multimodal.decode_wav(multimodal.encode_wav(stereo, 16000))
    assert sr == 16000 and np.array_equal(dec, stereo)


def test_image_audio_features_are_real_content_features():
    """Features must derive from DECODED CONTENT, not payload hashes: a
    constant-color image yields exact channel means and zero stds/gradient;
    a pure sine yields its frequency as the spectral centroid and ~2f/sr
    zero-crossing rate."""
    const = np.full((10, 10, 3), 128, dtype=np.uint8)
    f = multimodal.image_features(const)
    np.testing.assert_allclose(f[3:6], 128.0)     # channel means
    np.testing.assert_allclose(f[6:9], 0.0)       # channel stds
    assert f[11] == 0.0                           # gradient energy
    sr, freq = 16000, 500
    sine = (np.sin(np.arange(sr) / sr * 2 * np.pi * freq) * 30000).astype(np.int16)
    fa = multimodal.audio_features(sine, sr)
    assert fa[0] == sr and fa[1] == sr and abs(fa[2] - 1.0) < 1e-6
    assert abs(fa[6] - freq) < 1.0                # spectral centroid == f
    assert abs(fa[5] - 2 * freq / sr) < 0.005     # zero-crossing rate ~ 2f/sr


def test_extract_features_decodes_synthetic_payloads_for_real(spark, media):
    """extract_features on the synthetic table must produce content-derived
    features for image/audio rows: re-derive them driver-side from the same
    payloads and compare exactly."""
    got = multimodal.extract_features(media).toPandas().set_index('media_id')
    src = media.select('media_id', 'modality', 'payload').toPandas()
    checked = 0
    for _, r in src.iterrows():
        expect = multimodal.decode_features(bytes(r['payload']), r['modality'])
        np.testing.assert_array_equal(
            np.asarray(got.loc[r['media_id'], 'feature'], dtype=np.float32), expect)
        checked += 1
    assert checked == 24  # every row, all three modalities, for real


def test_resize_images_applies_plan(spark, media):
    plan = (multimodal.resize_plan(media, max_side=64).toPandas()
            .set_index('media_id'))
    out = multimodal.resize_images(media, max_side=64).toPandas()
    assert len(out) == len(plan)
    for _, r in out.iterrows():
        img = multimodal.decode_ppm(bytes(r['payload']))
        p = plan.loc[r['media_id']]
        assert img.shape[:2] == (p['out_height'], p['out_width'])
        assert (r['width'], r['height']) == (p['out_width'], p['out_height'])
        assert max(r['width'], r['height']) <= 64
