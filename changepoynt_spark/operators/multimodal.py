"""Multimodal columns: image/audio/video as binary columns with typed
metadata, processed by Arrow-batched kernels.

ALL THREE modalities decode for real with numpy-only parsers of
container-free / uncompressed formats (round 5 closed the last stub):

- :func:`decode_ppm` / :func:`encode_ppm` — binary PPM (P6) and PGM (P5),
  the canonical headerless-raster interchange format (netpbm),
- :func:`decode_wav` / :func:`encode_wav` — RIFF/WAVE PCM16, parsed
  directly from the chunk structure,
- :func:`decode_avi` / :func:`encode_avi` — uncompressed RIFF/AVI
  (BI_RGB 24-bit DIB frames), sharing the WAV path's RIFF chunk walk;
  compressed codecs would need ffmpeg, which this environment lacks, and
  raise a clear error instead of decoding garbage.

:func:`extract_features` therefore computes REAL content features for
images (per-channel statistics, luminance, gradient energy, quadrant
means), audio (RMS/peak/zero-crossings, spectral centroid/bandwidth, log
band energies) and video (frame geometry/rate, luminance level + spread,
spatial gradient, temporal motion energy, channel means, first/last/
extreme frame levels).  :func:`sample_frames` decodes sampled frames and
emits per-frame image features (the executable twin of the metadata-only
:func:`frame_sample_plan`).
"""
from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField('media_id', T.StringType(), False),
    T.StructField('modality', T.StringType(), False),   # image | audio | video
    T.StructField('payload', T.BinaryType(), False),    # encoded bytes
    T.StructField('mime', T.StringType(), True),
    T.StructField('width', T.IntegerType(), True),
    T.StructField('height', T.IntegerType(), True),
    T.StructField('duration_ms', T.IntegerType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField('media_id', T.StringType(), False),
    T.StructField('modality', T.StringType(), False),
    T.StructField('n_bytes', T.LongType(), False),
    T.StructField('feature', T.ArrayType(T.FloatType()), True),
])

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# image: binary PPM (P6) / PGM (P5)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 -> binary PPM (P6) / PGM (P5) bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic, h, w = b'P5', *img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, (h, w) = b'P6', img.shape[:2]
    else:
        raise ValueError(f'expected (h, w) or (h, w, 3) uint8, got {img.shape}')
    return magic + f'\n{w} {h}\n255\n'.encode('ascii') + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8; PGM (P5) -> (h, w) uint8.
    Handles netpbm whitespace/comment rules in the header."""
    if payload[:2] not in (b'P5', b'P6'):
        raise ValueError(f'not a binary PPM/PGM payload (magic {payload[:2]!r})')
    channels = 3 if payload[:2] == b'P6' else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b'#':                 # comment to EOL
            while payload[pos:pos + 1] not in (b'\n', b''):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    # netpbm: EXACTLY ONE whitespace character separates maxval from the
    # raster (a raster byte may itself look like whitespace, so we must not
    # skip a run).  Validate the separator and the raster length so a
    # malformed header corrupts loudly, not silently.
    if not payload[pos:pos + 1].isspace():
        raise ValueError('missing whitespace separator after maxval')
    pos += 1
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f'only maxval 255 supported, got {maxval}')
    n = w * h * channels
    if len(payload) - pos < n:
        raise ValueError(f'short raster: need {n} bytes, have {len(payload) - pos}')
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


# ---------------------------------------------------------------------------
# audio: RIFF/WAVE PCM16
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE PCM16 bytes."""
    x = np.asarray(samples, dtype='<i2')
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack('<HHIIHH', 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (b'WAVE'
            + b'fmt ' + struct.pack('<I', len(fmt)) + fmt
            + b'data' + struct.pack('<I', len(data)) + data)
    return b'RIFF' + struct.pack('<I', len(body)) + body


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 -> ((n, ch) int16 array, sample_rate).  Walks the
    chunk list, so extra chunks (LIST/INFO...) are skipped correctly."""
    if payload[:4] != b'RIFF' or payload[8:12] != b'WAVE':
        raise ValueError('not a RIFF/WAVE payload')
    pos, ch, sample_rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack('<I', payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b'fmt ':
            audio_fmt, ch, sample_rate, _, _, bits = struct.unpack('<HHIIHH', body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f'only PCM16 supported (fmt={audio_fmt}, bits={bits})')
        elif cid == b'data':
            data = body
        pos += 8 + size + (size & 1)                     # chunks are word-aligned
    if ch is None or data is None:
        raise ValueError('missing fmt/data chunk')
    x = np.frombuffer(data, dtype='<i2')
    return x.reshape(-1, ch).copy(), sample_rate


# ---------------------------------------------------------------------------
# video: uncompressed RIFF/AVI (BI_RGB 24-bit DIB frames)
# ---------------------------------------------------------------------------

def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    """One RIFF chunk: id + little-endian size + body + word-align pad."""
    return cid + struct.pack('<I', len(body)) + body + (b'\x00' * (len(body) & 1))


def _riff_walk(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) over a RIFF chunk run —
    the same walk :func:`decode_wav` does, factored for AVI's nesting."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack('<I', buf[pos + 4:pos + 8])[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)                     # chunks are word-aligned


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> uncompressed RIFF/AVI bytes
    (BI_RGB 24-bit bottom-up DIB frames, rows padded to 4 bytes)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f'expected (n, h, w, 3) uint8, got {frames.shape}')
    n, h, w, _ = frames.shape
    fps = int(fps)
    stride = (w * 3 + 3) & ~3
    size_image = stride * h

    def dib(frame: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        # bottom-up row order, BGR channel order (the DIB convention)
        rows[:, :w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    avih = struct.pack('<14I', 1_000_000 // fps, size_image * fps, 0,
                       0x10, n, 0, 1, size_image, w, h, 0, 0, 0, 0)
    strh = (b'vids' + b'DIB ' +
            struct.pack('<IHH8I4H', 0, 0, 0,                # flags, pri, lang
                        0, 1, fps, 0, n, size_image, 0, 0,  # init,scale,rate,start,len,buf,qual,smp
                        0, 0, w, h))                        # rcFrame
    strf = struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0, size_image,
                       0, 0, 0, 0)
    hdrl = _riff_chunk(b'LIST', b'hdrl'
                       + _riff_chunk(b'avih', avih)
                       + _riff_chunk(b'LIST', b'strl'
                                     + _riff_chunk(b'strh', strh)
                                     + _riff_chunk(b'strf', strf)))
    movi = _riff_chunk(b'LIST', b'movi'
                       + b''.join(_riff_chunk(b'00db', dib(f)) for f in frames))
    body = b'AVI ' + hdrl + movi
    return b'RIFF' + struct.pack('<I', len(body)) + body


def decode_avi(payload: bytes):
    """Uncompressed RIFF/AVI -> ((n, h, w, 3) uint8 RGB frames, fps).
    Walks the nested chunk lists (hdrl -> avih/strl, movi -> 00db frames);
    raises on compressed streams (BI_RGB only — no ffmpeg here) rather
    than decoding garbage."""
    if payload[:4] != b'RIFF' or payload[8:12] != b'AVI ':
        raise ValueError('not a RIFF/AVI payload')
    w = h = None
    rate = scale = None
    bitcount = compression = None
    frame_bodies = []

    def walk_list(pos, end):
        nonlocal w, h, rate, scale, bitcount, compression
        for cid, body_pos, size in _riff_walk(payload, pos, end):
            body_end = body_pos + size
            if cid == b'LIST':
                walk_list(body_pos + 4, body_end)        # skip the list type
            elif cid == b'avih':
                fields = struct.unpack('<14I', payload[body_pos:body_pos + 56])
                w, h = fields[8], fields[9]
            elif cid == b'strh' and payload[body_pos:body_pos + 4] == b'vids':
                scale, rate = struct.unpack('<II', payload[body_pos + 20:body_pos + 28])
            elif cid == b'strf' and bitcount is None:
                (_, bw, bh, _, bitcount,
                 compression) = struct.unpack('<IiiHHI', payload[body_pos:body_pos + 20])
                if w is None:
                    w, h = bw, abs(bh)
            elif cid[2:4] in (b'db', b'dc'):             # '00db'/'00dc' frame
                frame_bodies.append((body_pos, size))

    walk_list(12, len(payload))
    if w is None or not frame_bodies:
        raise ValueError('missing AVI headers or frames')
    if compression not in (0, None) or (bitcount or 24) != 24:
        raise ValueError(f'only uncompressed 24-bit BI_RGB AVI supported '
                         f'(biCompression={compression}, biBitCount={bitcount})')
    stride = (w * 3 + 3) & ~3
    frames = np.empty((len(frame_bodies), h, w, 3), dtype=np.uint8)
    for i, (pos, size) in enumerate(frame_bodies):
        if size < stride * h:
            raise ValueError(f'short DIB frame {i}: need {stride * h}, have {size}')
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                             offset=pos).reshape(h, stride)
        frames[i] = rows[:, :w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    fps = (rate / scale) if (rate and scale) else 0.0
    return frames, fps


# ---------------------------------------------------------------------------
# content features
# ---------------------------------------------------------------------------

def image_features(img: np.ndarray) -> np.ndarray:
    """16 real content features from a decoded raster: dims/aspect,
    per-channel mean/std, luminance mean/std, mean absolute gradient
    (h+v), and the four quadrant luminance means."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    x = img.astype(np.float64)
    h, w = x.shape[:2]
    lum = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    grad = 0.0
    if w > 1:
        grad += float(np.abs(np.diff(lum, axis=1)).mean())
    if h > 1:
        grad += float(np.abs(np.diff(lum, axis=0)).mean())
    hh, wh = max(h // 2, 1), max(w // 2, 1)
    quads = [float(lum[:hh, :wh].mean()), float(lum[:hh, wh:].mean() if w > 1 else lum.mean()),
             float(lum[hh:, :wh].mean() if h > 1 else lum.mean()),
             float(lum[hh:, wh:].mean() if h > 1 and w > 1 else lum.mean())]
    feats = [float(w), float(h), w / h,
             *(float(x[:, :, c].mean()) for c in range(3)),
             *(float(x[:, :, c].std()) for c in range(3)),
             float(lum.mean()), float(lum.std()), grad, *quads]
    return np.asarray(feats, dtype=np.float32)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """16 real content features from decoded PCM: rate/length/duration,
    RMS/peak/zero-crossing rate, spectral centroid and bandwidth (Hz), and
    8 log-power band energies over equal slices of the spectrum."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)                               # mono mixdown
    n = x.shape[0]
    x_n = x / 32768.0
    rms = float(np.sqrt(np.mean(x_n ** 2))) if n else 0.0
    peak = float(np.max(np.abs(x_n))) if n else 0.0
    zcr = float(np.mean(np.signbit(x_n[1:]) != np.signbit(x_n[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x_n)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate) if n else np.zeros(1)
    total = float(spec.sum())
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    bandwidth = (float(np.sqrt(((freqs - centroid) ** 2 * spec).sum() / total))
                 if total > 0 else 0.0)
    bands = np.zeros(8)
    if spec.size >= 8:
        for b, chunk in enumerate(np.array_split(spec, 8)):
            bands[b] = np.log10(1.0 + chunk.sum())
    feats = [float(sample_rate), float(n), n / sample_rate,
             rms, peak, zcr, centroid, bandwidth, *bands]
    return np.asarray(feats, dtype=np.float32)


def video_features(frames: np.ndarray, fps: float) -> np.ndarray:
    """16 real content features from decoded frames: geometry/rate/duration,
    luminance mean/std over all pixels of all frames, mean spatial gradient,
    temporal motion energy (mean |Δ| between consecutive frame luminances),
    per-channel means, and first/last/max/min per-frame luminance levels."""
    x = np.asarray(frames, dtype=np.float64)
    n, h, w = x.shape[:3]
    lum = 0.299 * x[:, :, :, 0] + 0.587 * x[:, :, :, 1] + 0.114 * x[:, :, :, 2]
    grad = 0.0
    if w > 1:
        grad += float(np.abs(np.diff(lum, axis=2)).mean())
    if h > 1:
        grad += float(np.abs(np.diff(lum, axis=1)).mean())
    motion = float(np.abs(np.diff(lum, axis=0)).mean()) if n > 1 else 0.0
    per_frame = lum.mean(axis=(1, 2))
    feats = [float(w), float(h), float(n), float(fps),
             (n / fps) if fps else 0.0,
             float(lum.mean()), float(lum.std()), grad, motion,
             *(float(x[:, :, :, c].mean()) for c in range(3)),
             float(per_frame[0]), float(per_frame[-1]),
             float(per_frame.max()), float(per_frame.min())]
    return np.asarray(feats, dtype=np.float32)


def decode_features(payload: bytes, modality: str) -> np.ndarray:
    """Decode one payload and compute its 16 content features.  All three
    modalities decode for REAL: image (PPM/PGM), audio (WAV/PCM16), video
    (uncompressed AVI).  Unknown modalities raise."""
    if modality == 'image':
        return image_features(decode_ppm(payload))
    if modality == 'audio':
        return audio_features(*decode_wav(payload))
    if modality == 'video':
        return video_features(*decode_avi(payload))
    raise ValueError(f'unknown modality {modality!r}')


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def extract_features(df: DataFrame, feature_dim: int = FEATURE_DIM) -> DataFrame:
    """media table -> per-item feature vectors via mapInPandas (no shuffle;
    binary payloads stream through Arrow in batches).  All features are
    computed from the REAL decoded content (PPM/WAV/AVI parsers above)."""

    def kernel(batches):
        for pdf in batches:
            feats = [
                decode_features(bytes(p), m).tolist()
                for p, m in zip(pdf['payload'], pdf['modality'])]
            yield pd.DataFrame({
                'media_id': pdf['media_id'],
                'modality': pdf['modality'],
                'n_bytes': pdf['payload'].map(len).astype('int64'),
                'feature': feats,
            })

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType([
    T.StructField('media_id', T.StringType(), False),
    T.StructField('frame_idx', T.IntegerType(), False),
    T.StructField('frame_ts_ms', T.IntegerType(), False),
    T.StructField('feature', T.ArrayType(T.FloatType()), False),
])


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """The executable twin of :func:`frame_sample_plan`: decode each video
    payload (uncompressed AVI), take one frame per ``every_ms`` of content
    time, and emit per-frame IMAGE features — one row per (media_id,
    frame).  Same zero-shuffle mapInPandas shape as extract_features; at
    corpus scale the videos column rides Arrow batches and the per-frame
    fan-out happens kernel-side, never as a row explode of raw rasters."""

    def kernel(batches):
        for pdf in batches:
            ids, idxs, tss, feats = [], [], [], []
            for mid, p in zip(pdf['media_id'], pdf['payload']):
                frames, fps = decode_avi(bytes(p))
                step_ms = 1000.0 / fps if fps else 1000.0
                want = np.arange(0, len(frames) * step_ms, every_ms)
                fidx = np.minimum((want / step_ms).astype(int), len(frames) - 1)
                fidx = np.unique(fidx)
                for i in fidx:
                    ids.append(mid)
                    idxs.append(int(i))
                    tss.append(int(round(i * step_ms)))
                    feats.append(image_features(frames[i]).tolist())
            yield pd.DataFrame({'media_id': ids,
                                'frame_idx': pd.array(idxs, dtype='int32'),
                                'frame_ts_ms': pd.array(tss, dtype='int32'),
                                'feature': feats})

    return (df.filter(F.col('modality') == 'video')
              .select('media_id', 'payload')
              .mapInPandas(kernel, schema=FRAME_FEATURE_SCHEMA))


def resize_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w) — the numpy-only resize
    kernel behind :func:`resize_images` (swap for a real resampler where
    PIL exists; the operator contract is unchanged)."""
    h, w = img.shape[:2]
    yy = (np.arange(out_h) * h) // out_h
    xx = (np.arange(out_w) * w) // out_w
    return img[yy][:, xx]


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Apply :func:`resize_plan` to the payloads: decode each PPM, resize to
    the plan's target box, re-encode.  Same zero-shuffle mapInPandas shape
    as extract_features; output keeps MEDIA_SCHEMA with updated payload and
    dimensions."""

    def kernel(batches):
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for p, width, height in zip(pdf['payload'], pdf['width'], pdf['height']):
                img = decode_ppm(bytes(p))
                scale = min(1.0, float(max_side) / max(width, height))
                out_w = max(1, int(np.ceil(width * scale)))
                out_h = max(1, int(np.ceil(height * scale)))
                payloads.append(encode_ppm(resize_image(img, out_w, out_h)))
                widths.append(out_w)
                heights.append(out_h)
            out = pdf.copy()
            out['payload'] = payloads
            out['width'] = pd.array(widths, dtype='int32')
            out['height'] = pd.array(heights, dtype='int32')
            yield out

    return df.filter(F.col('modality') == 'image').mapInPandas(kernel, schema=df.schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the explode is native (sequence), only the decode itself would be a
    kernel.  Demonstrates metadata-driven fan-out without touching payloads
    (column pruning keeps the binary column out of this scan entirely)."""
    return (df.filter(F.col('modality') == 'video')
              .select('media_id',
                      F.explode(F.sequence(F.lit(0), F.col('duration_ms'),
                                           F.lit(every_ms))).alias('frame_ts_ms')))


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plan: target dimensions that fit ``max_side`` preserving
    aspect ratio (never upscaled), plus the scale factor — pure native
    metadata arithmetic; like frame_sample_plan, the binary payload column
    is pruned from this scan entirely, so planning a 100 TB image corpus
    reads only the (tiny) metadata columns."""
    scale = F.least(F.lit(1.0),
                    F.lit(float(max_side)) / F.greatest('width', 'height'))
    return (df.filter(F.col('modality') == 'image')
              .select('media_id', 'width', 'height',
                      F.round(scale, 6).alias('scale'),
                      F.greatest(F.lit(1), F.ceil(F.col('width') * scale))
                       .cast('int').alias('out_width'),
                      F.greatest(F.lit(1), F.ceil(F.col('height') * scale))
                       .cast('int').alias('out_height')))


def synthetic_media_table(spark, n_items: int = 24, seed: int = 13) -> DataFrame:
    """Deterministic media rows with REAL payloads for every modality:
    images are genuine binary PPMs (seeded gradient+noise rasters), audio
    is genuine WAV/PCM16 (seeded sine+noise), video is genuine uncompressed
    RIFF/AVI (seeded drifting-gradient frames — real motion for the
    temporal features).  Metadata (width/height/duration_ms) is consistent
    with the actual encoded content."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_items):
        modality = ('image', 'audio', 'video')[i % 3]
        if modality == 'image':
            w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
            ramp = (np.linspace(0, 255, w)[None, :, None]
                    + np.linspace(0, 64, h)[:, None, None])
            img = np.clip(ramp + rng.integers(0, 64, size=(h, w, 3)), 0, 255) \
                .astype(np.uint8)
            payload, duration = encode_ppm(img), None
        elif modality == 'audio':
            sr = int(rng.choice([8000, 16000]))
            duration = int(rng.integers(250, 3000))
            n = sr * duration // 1000
            t = np.arange(n) / sr
            freq = float(rng.integers(100, 2000))
            x = (0.5 * np.sin(2 * np.pi * freq * t)
                 + 0.05 * rng.standard_normal(n))
            payload = encode_wav((np.clip(x, -1, 1) * 32767).astype(np.int16), sr)
            w = h = None
        else:
            w, h = int(rng.integers(16, 128)), int(rng.integers(16, 128))
            n_frames = int(rng.integers(4, 16))
            fps = int(rng.choice([5, 10, 25]))
            base = (np.linspace(0, 255, w)[None, :, None]
                    + np.linspace(0, 64, h)[:, None, None]
                    + rng.integers(0, 64, size=(h, w, 3)))
            base = np.clip(base, 0, 255).astype(np.uint8)
            shift = int(rng.integers(1, max(2, w // 4)))
            frames = np.stack([np.roll(base, f * shift, axis=1)
                               for f in range(n_frames)])
            payload = encode_avi(frames, fps=fps)
            duration = int(round(n_frames * 1000 / fps))
        rows.append((f'media_{i:06d}', modality, bytearray(payload),
                     {'image': 'image/x-portable-pixmap', 'audio': 'audio/wav',
                      'video': 'video/x-msvideo'}[modality], w, h, duration))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
