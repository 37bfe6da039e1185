"""Bit-exact round-trip tests for the Gorilla / delta-of-delta codecs,
including hypothesis property tests (FIXTURES.md §5 codec_roundtrip)."""
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from changepoynt_spark.codecs import (decode_timestamps, decode_values, encode_timestamps,
                                      encode_values)


def _roundtrip_values(arr):
    arr = np.asarray(arr, dtype=np.float64)
    blob = encode_values(arr)
    out = decode_values(blob)
    assert out.shape == arr.shape
    assert arr.view(np.uint64).tobytes() == out.view(np.uint64).tobytes()
    return blob


def _roundtrip_ts(arr):
    arr = np.asarray(arr, dtype=np.int64)
    blob = encode_timestamps(arr)
    out = decode_timestamps(blob)
    np.testing.assert_array_equal(out, arr)
    return blob


def test_values_examples():
    _roundtrip_values([])
    _roundtrip_values([0.0])
    _roundtrip_values([1.5, 1.5, 1.5, 1.5])
    _roundtrip_values([0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, 1.7976931348623157e308])
    _roundtrip_values(np.linspace(-10, 10, 1000))
    rng = np.random.default_rng(0)
    _roundtrip_values(rng.standard_normal(5000))


def test_values_compress_constant_series():
    arr = np.full(10000, 42.25)
    blob = _roundtrip_values(arr)
    # 32-bit header + 64-bit first + 1 bit per repeat -> ~1.26 KB
    assert len(blob) < 1400


def test_values_compress_slowly_varying():
    # integer-valued doubles XOR to few meaningful bits
    arr = np.cumsum(np.ones(5000)) + 1000.0
    blob = _roundtrip_values(arr)
    assert len(blob) < arr.nbytes / 2


def test_timestamps_examples():
    _roundtrip_ts([])
    _roundtrip_ts([17000])
    _roundtrip_ts([0, 60, 120, 180])
    _roundtrip_ts([-5, 100, 100, 99, 2 ** 62, -2 ** 62])


def test_timestamps_compress_regular_grid():
    ts = 1700000000_000000 + 60_000000 * np.arange(10000, dtype=np.int64)
    blob = _roundtrip_ts(ts)
    # header + 2x64 bits + 1 bit per regular step -> ~1.27 KB vs 80 KB raw
    assert len(blob) < 1400


def test_timestamps_jittered_and_gappy():
    rng = np.random.default_rng(1)
    deltas = 60 + rng.integers(-5, 6, size=3000)
    deltas[rng.integers(0, 3000, 30)] += 86400  # day-size gaps
    ts = np.cumsum(deltas)
    _roundtrip_ts(ts)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
def test_values_roundtrip_property(xs):
    _roundtrip_values(np.array(xs, dtype=np.float64))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1), max_size=300))
def test_timestamps_roundtrip_property(xs):
    # guard against delta overflow wrapping (int64 arithmetic in numpy):
    # the codec contract is python-int exact deltas
    _roundtrip_ts(np.array(xs, dtype=np.int64))


def test_small_and_vectorized_paths_byte_identical():
    """The adaptive dispatch (loop under _VECTOR_MIN, whole-array numpy
    above) must be invisible in the stream: both paths produce identical
    bytes for the same input."""
    from changepoynt_spark.codecs import delta as d
    from changepoynt_spark.codecs import gorilla as g
    rng = np.random.default_rng(5)
    for n in (1, 2, 7, g._VECTOR_MIN - 1, g._VECTOR_MIN, g._VECTOR_MIN + 1, 300):
        vals = np.cumsum(rng.normal(0, 1, n))
        vals[rng.integers(0, n, n // 4)] = vals[0]  # some zero-deltas
        bits = vals.view(np.uint64)
        assert g._encode_values_small(bits) == g._encode_values_vector(bits)
        ts = np.cumsum(rng.integers(-3, 4000, n)).astype(np.int64)
        assert d._encode_timestamps_small(ts) == d._encode_timestamps_vector(ts)


def test_frozen_blob_goldens():
    """Byte-identity with the round-2 (loop-based) encoder output, frozen in
    tests/goldens/codec_blobs_frozen.npz BEFORE the vectorized rewrite: the
    stream format is pinned, so stored blocks stay readable across engine
    versions."""
    import pathlib
    g = np.load(pathlib.Path(__file__).parent / 'goldens' / 'codec_blobs_frozen.npz')
    assert encode_values(g['vals']).hex() == g['gorilla_blob'].tobytes().hex()
    assert encode_timestamps(g['ts']).hex() == g['delta_blob'].tobytes().hex()
    assert np.array_equal(decode_values(g['gorilla_blob'].tobytes()).view(np.uint64),
                          g['vals'].view(np.uint64))
    np.testing.assert_array_equal(decode_timestamps(g['delta_blob'].tobytes()), g['ts'])


def test_frozen_example_blocks_stable():
    """Cross-session stability: fixed inputs must encode to fixed bytes."""
    arr = np.array([1.0, 2.0, 2.0, 3.5, -1.25])
    assert encode_values(arr).hex() == encode_values(arr).hex()
    ts = np.array([0, 60, 120, 240], dtype=np.int64)
    b1 = encode_timestamps(ts)
    assert decode_timestamps(b1).tolist() == [0, 60, 120, 240]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2 ** 64 - 1),
                          st.integers(min_value=0, max_value=64)), max_size=60))
def test_pack_tokens_matches_bitwriter_property(tokens):
    """pack_tokens (vectorized two-word scatter) == BitWriter (sequential)
    for arbitrary field widths 0..64 including zero-width and trailing
    tokens."""
    from changepoynt_spark.codecs.bits import BitWriter, pack_tokens
    w = BitWriter()
    for val, nb in tokens:
        w.write(val, nb)
    vals = np.array([t[0] for t in tokens], dtype=np.uint64)
    nbits = np.array([t[1] for t in tokens], dtype=np.int64)
    assert pack_tokens(vals, nbits) == w.getvalue()


def test_scaled_codec_roundtrip_and_fallback():
    import numpy as np
    from changepoynt_spark.codecs import decode_values_scaled, encode_values_scaled
    rng = np.random.default_rng(9)
    # decimal-quantized gauge (k/10 doubles): takes the scaled path and
    # compresses hard.  (np.round(x,1) output is NOT always the correctly-
    # rounded k/10 double — the codec's exactness guard rejects such
    # streams to Gorilla rather than corrupt a bit; construct true k/10.)
    gauge = np.cumsum(rng.integers(-5, 6, 50_000)).astype(np.float64) / 10.0
    blob = encode_values_scaled(gauge, decimals=1)
    assert blob[0] == 0x53
    out = decode_values_scaled(blob)
    np.testing.assert_array_equal(out.view(np.int64), gauge.view(np.int64))
    assert len(blob) / len(gauge) < 1.5          # ~1 byte/pt vs 8 raw
    # full-precision doubles: falls back to Gorilla, still bit-exact
    noise = rng.standard_normal(10_000)
    blob2 = encode_values_scaled(noise, decimals=6)
    assert blob2[0] == 0x47
    np.testing.assert_array_equal(decode_values_scaled(blob2).view(np.int64),
                                  noise.view(np.int64))
    # NaN / inf force the fallback and survive
    weird = np.array([1.5, np.nan, np.inf, -np.inf, -0.0, 0.0])
    blob3 = encode_values_scaled(weird, decimals=2)
    assert blob3[0] == 0x47
    np.testing.assert_array_equal(decode_values_scaled(blob3).view(np.int64),
                                  weird.view(np.int64))
    # values that LOOK quantized but aren't round-trippable stay lossless
    tricky = np.array([0.1 + 1e-13, 2.3, 4.5])
    np.testing.assert_array_equal(
        decode_values_scaled(encode_values_scaled(tricky, decimals=1)).view(np.int64),
        tricky.view(np.int64))


def test_scaled_codec_hypothesis_lossless():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays
    from changepoynt_spark.codecs import decode_values_scaled, encode_values_scaled

    @given(arrays(np.float64, st.integers(1, 200),
                  elements=st.floats(allow_nan=True, allow_infinity=True,
                                     width=64)))
    @settings(max_examples=60, deadline=None)
    def check(v):
        out = decode_values_scaled(encode_values_scaled(v, decimals=4))
        np.testing.assert_array_equal(out.view(np.int64), v.view(np.int64))

    check()
