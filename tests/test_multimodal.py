"""Multimodal tests (north star §2.11): schema, Arrow batch shape,
decode determinism, feature wiring into similarity search, frame
sampling row expansion — plus the REAL stdlib codecs (PNG/BMP/PNM/WAV
exact decode, nearest-neighbor resize) and the NotImplementedError
boundary for formats that need a native library (JPEG)."""

from __future__ import annotations

import pytest

from etl_airbnb_mex_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = make_fake_media(spark, 30)
    df.persist()
    yield df
    df.unpersist()


def test_media_schema(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_deterministic(media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert len(rows) == 30
    # payload sizes follow the construction: 64 + 16*(id%5) bytes
    assert rows[0]["n_bytes"] == 10 + 64           # magic + payload
    assert len(rows[0]["pixels"]) == 64
    assert len(rows[4]["pixels"]) == 64 + 16 * 4
    # determinism: re-decode equals first decode
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert rows[7]["pixels"] == again[7]["pixels"]


def test_features_feed_knn(media, spark):
    """Features are array<double> and plug straight into knn_cosine."""
    from pyspark.sql import functions as F

    from etl_airbnb_mex_spark.operators.similarity import knn_cosine

    feats = extract_features(media, dim=8)
    row = feats.collect()[0]
    assert len(row["features"]) == 8
    emb = feats.select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = knn_cosine(emb, emb.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(top) == 5
    assert all(r["vec_id"] != 0 for r in top)


def test_resize_updates_meta(media):
    out = resize_images(media, 8, 6).collect()
    assert len(out) == 10                      # only image rows
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 6 for r in out)


def test_sample_frames_expands_rows(media):
    frames = sample_frames(media, every_n=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert len(by_media) == 10                 # video rows only
    for nos in by_media.values():
        assert nos == [0, 2, 4, 6]             # every 2nd of 8 frames


def test_codec_raises_on_formats_needing_native_libs(spark):
    """Payloads in formats that genuinely need a native codec (JPEG
    magic here) hit the clearly-marked NotImplementedError — the
    documented codec boundary, not silent garbage."""
    df = spark.createDataFrame(
        [(99, "image", b"\xff\xd8\xff\xe0jfif-ish", (1, 1, None, 1, "jpg"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="(?i)no codec"):
        decode_media(df).collect()


# ---------------------------------------------------------------------------
# REAL stdlib codecs (multimodal/codecs.py): exact decode, no PIL/libav
# ---------------------------------------------------------------------------


def _checker(h, w, c):
    import numpy as np

    img = np.zeros((h, w, c), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = [(y * 31 + x * 7 + ch * 13) % 256 for ch in range(c)]
    return img


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_exact(channels):
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import png_decode, png_encode

    img = _checker(13, 7, channels)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_decode_all_filter_types():
    """Decode a PNG whose scanlines use every filter type (0-4),
    built by applying the spec's filter math to known pixels — the
    decoder must invert each one exactly."""
    import struct
    import zlib

    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import _paeth, png_decode

    img = _checker(5, 6, 3)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(int)
    raw = b""
    prev = [0] * stride
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = list(flat[y])
        enc = []
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) >> 1,
                4: _paeth(left, up, ul),
            }[ftype]
            enc.append((line[i] - pred) & 0xFF)
        raw += bytes([ftype]) + bytes(enc)
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(png), img)


def test_bmp_decode_matches_reference_layout():
    """Hand-assemble a 3×2 24-bit bottom-up BMP with row padding; the
    decoder must return top-down RGB."""
    import struct

    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import bmp_decode

    img = _checker(2, 3, 3)
    row_bytes = (3 * 3 + 3) & ~3  # 12
    pixel_data = b""
    for y in (1, 0):  # bottom-up
        row = b"".join(bytes(img[y, x][::-1]) for x in range(3))  # BGR
        pixel_data += row + b"\x00" * (row_bytes - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixel_data),
                      2835, 2835, 0, 0)
    )
    assert np.array_equal(bmp_decode(header + pixel_data), img)


def test_pnm_roundtrip():
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import pnm_decode

    img = _checker(4, 5, 3)
    ppm = b"P6\n# comment\n5 4\n255\n" + img.tobytes()
    assert np.array_equal(pnm_decode(ppm), img)
    gray = _checker(4, 5, 1)
    pgm = b"P5 5 4 255\n" + gray.tobytes()
    assert np.array_equal(pnm_decode(pgm), gray)


def test_wav_roundtrip_16bit():
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import wav_decode, wav_encode

    t = np.arange(400) / 400.0
    sig = 0.5 * np.sin(2 * np.pi * 5 * t)
    out, rate = wav_decode(wav_encode(sig, sample_rate=8000))
    assert rate == 8000
    assert out.shape == (400, 1)
    assert np.abs(out[:, 0] - sig).max() < 1.0 / 32768

def test_resize_nearest_exact_downscale():
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import resize_nearest

    img = _checker(4, 4, 3)
    out = resize_nearest(img, 2, 2)
    assert np.array_equal(out, img[::2, ::2])


def test_spark_decode_real_png_payloads(spark):
    """End-to-end: real PNG bytes flow through the Arrow-batched
    decode_media and come back as the exact pixel values."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import png_encode

    imgs = {i: _checker(6, 5, 3) + i for i in range(4)}
    df = spark.createDataFrame(
        [
            (i, "image", png_encode(img % 256), (5, 6, None, 1, "png"))
            for i, img in imgs.items()
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["pixels"] for r in decode_media(df).collect()}
    for i, img in imgs.items():
        assert rows[i] == [float(x) for x in (img % 256).ravel()]


def test_spark_resize_real_png_resamples_pixels(spark):
    """resize_images on a real PNG actually resamples: output payload
    decodes to the nearest-neighbor grid at the target size."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import (
        png_decode,
        png_encode,
        resize_nearest,
    )

    img = _checker(8, 8, 3)
    df = spark.createDataFrame(
        [(7, "image", png_encode(img), (8, 8, None, 1, "png"))],
        MEDIA_SCHEMA,
    )
    (row,) = resize_images(df, 4, 4).collect()
    assert row["meta"]["width"] == 4 and row["meta"]["height"] == 4
    assert np.array_equal(
        png_decode(bytes(row["data"])), resize_nearest(img, 4, 4)
    )


def test_spark_decode_wav_payloads(spark):
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import wav_encode

    sig = np.linspace(-0.9, 0.9, 256)
    df = spark.createDataFrame(
        [(11, "audio", wav_encode(sig, 16000), (None, None, 16000, None, "wav"))],
        MEDIA_SCHEMA,
    )
    (row,) = decode_media(df).collect()
    got = np.asarray(row["pixels"])
    assert got.shape == (256,)
    # encode scales by 32767, decode by 1/32768: worst case |x|/32768
    # quantizer-mismatch bias + 0.5/32768 rounding
    assert np.abs(got - sig).max() < 2.0 / 32768


def test_image_dhash_near_dup_detection(spark):
    """dhash must cluster near-duplicate images (same picture + light
    noise / re-encode) and separate unrelated pictures; the banded
    join's pair set must equal the brute-force hamming pair set
    (recall guarantee: max_hamming < bands)."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import png_encode
    from etl_airbnb_mex_spark.multimodal.ops import (
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.RandomState(3)
    rows = []
    # 5 base images; each contributes the original + a lightly-noised
    # near-duplicate. Use smooth gradients so dhash is noise-stable.
    for b in range(5):
        base = np.add.outer(
            np.linspace(0, 255, 24), np.linspace(0, 255 - b * 40, 32)
        ) / 2 + b * 7
        base = base.astype(np.uint8)
        noisy = base.astype(np.int16) + rng.randint(-2, 3, base.shape)
        noisy = np.clip(noisy, 0, 255).astype(np.uint8)
        rows.append((2 * b, "image", bytearray(png_encode(base)),
                     (32, 24, None, 1, "png")))
        rows.append((2 * b + 1, "image", bytearray(png_encode(noisy)),
                     (32, 24, None, 1, "png")))
    from etl_airbnb_mex_spark.multimodal.ops import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = image_dhash(df)
    hv = {r.media_id: r.dhash for r in hashes.collect()}
    assert len(hv) == 10
    got = {
        (r.id_a, r.id_b)
        for r in image_near_dup_pairs(hashes, max_hamming=6).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    want = {
        (i, j)
        for i in hv for j in hv
        if i < j and ham(hv[i], hv[j]) <= 6
    }
    assert got == want                      # banded join == brute force
    for b in range(5):
        assert (2 * b, 2 * b + 1) in want   # noised twin is a near-dup


def test_audio_features_detect_tone_frequency(spark):
    """Spectral centroid of a pure tone ~ the tone's frequency; a
    louder clip has higher RMS; higher-pitch tones cross zero more."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import wav_encode
    from etl_airbnb_mex_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_features,
    )

    rate = 16000
    t = np.arange(rate) / rate  # 1 second
    rows = []
    for mid, (freq, amp) in enumerate([(440.0, 0.2), (2000.0, 0.8)]):
        samples = amp * np.sin(2 * np.pi * freq * t)  # floats in [-1, 1]
        rows.append(
            (mid, "audio", bytearray(wav_encode(samples, rate)),
             (None, None, rate, None, "wav"))
        )
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_features(df).collect()}
    assert got[0].spectral_centroid_hz == pytest.approx(440, rel=0.15)
    assert got[1].spectral_centroid_hz == pytest.approx(2000, rel=0.15)
    assert got[1].rms > got[0].rms * 2
    assert got[1].zero_cross_rate > got[0].zero_cross_rate * 2


def test_video_pngseq_frame_dedup(spark):
    """Real video plumbing: a PNGSEQ1 container of real PNG frames —
    static runs collapse to their first frame, scene changes survive.
    Frames: A, A+noise, B, A, C, C  →  kept = A, B, A, C (the noised A
    and the second C are temporal dups of the previous kept frame)."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        pack_video_pngseq,
        video_frame_dedup,
    )

    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    a = ((xx * 16) % 256).astype("uint8")            # vertical ramp
    a_noise = a.copy()
    a_noise[0, 0] ^= 1                                # 1-bit pixel nudge
    b = ((xx % 2) * 255).astype("uint8")  # alternating columns
    c = (255 - a).astype("uint8")  # inverted ramp: gradients reversed
    frames = [a, a_noise, b, a, c, c]
    data = pack_video_pngseq(frames)
    df = spark.createDataFrame(
        [(0, "video", data, (w, h, None, len(frames), "pngseq"))],
        MEDIA_SCHEMA,
    )
    out = (
        video_frame_dedup(df, every_n=1, max_hamming=4)
        .toPandas()
        .sort_values("frame_no")
    )
    assert len(out) == 6
    assert out["kept"].tolist() == [True, False, True, True, True, False]
    # sampling: every_n=2 sees frames 0,2,4 — all distinct scenes
    out2 = (
        video_frame_dedup(df, every_n=2, max_hamming=4)
        .toPandas()
        .sort_values("frame_no")
    )
    assert out2["frame_no"].tolist() == [0, 2, 4]
    assert out2["kept"].all()


def test_video_frame_dedup_driver_query(spark, sf_dir):
    """The rows-only driver registration (queries/advanced.py): per
    planted video, kept == scene count and sampled == scenes*run_len;
    the mixed-kind poison image rows prove the kind gate on the driver
    path (without it _iter_pngseq would raise on the PNG payloads)."""
    from etl_airbnb_mex_spark.queries import all_queries

    out = (
        all_queries()["video_frame_dedup"](spark, sf_dir)
        .toPandas()
        .sort_values("media_id")
    )
    assert len(out) > 0
    for r in out.itertuples():
        scenes = 2 + r.media_id % 3
        run_len = 1 + r.media_id % 3
        assert r.n_kept == scenes
        assert r.n_sampled == scenes * run_len


def test_audio_resample_preserves_tone_and_length(spark):
    """16 kHz -> 8 kHz halves the sample count and keeps a speech-band
    tone's spectral centroid; an already-at-rate clip round-trips with
    identical length; upsampling 8k -> 16k doubles it. Feature check
    runs through audio_features ON the resampled payloads - the real
    downstream consumer."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import wav_encode
    from etl_airbnb_mex_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_features,
        audio_resample,
    )

    tone = 440.0
    rows = []
    for mid, rate in [(0, 16000), (1, 8000)]:
        t = np.arange(rate) / rate  # 1 second at the native rate
        samples = 0.5 * np.sin(2 * np.pi * tone * t)
        rows.append(
            (mid, "audio", bytearray(wav_encode(samples, rate)),
             (None, None, rate, None, "wav"))
        )
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in audio_resample(df, 8000).collect()}
    assert out[0].sr_in == 16000 and out[0].sr_out == 8000
    assert out[0].n_in == 16000 and out[0].n_out == 8000
    # at-rate clip untouched in length
    assert out[1].n_in == 8000 and out[1].n_out == 8000

    # resampled payloads are real WAVs the feature op consumes; the
    # 440 Hz tone (well under the 4 kHz Nyquist) survives
    res_rows = [
        (mid, "audio", bytearray(bytes(r.data)),
         (None, None, r.sr_out, None, "wav"))
        for mid, r in out.items()
    ]
    rdf = spark.createDataFrame(res_rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in audio_features(rdf).collect()}
    assert feats[0].spectral_centroid_hz == pytest.approx(tone, rel=0.15)

    # upsample doubles the count
    up = {r.media_id: r for r in audio_resample(df, 16000).collect()}
    assert up[1].n_out == 16000


def test_image_augment_variants_are_real_pixel_math(spark):
    """Three deterministic variants per decodable image: hflip is the
    exact mirror, crop keeps the original dimensions, bright raises
    mean luminance and clips; every payload round-trips through the
    PNG codec; non-image kinds are gated out."""
    import numpy as np

    from etl_airbnb_mex_spark.multimodal.codecs import (
        png_decode,
        png_encode,
    )
    from etl_airbnb_mex_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        image_augment,
    )

    # a 8x6 horizontal gradient (asymmetric so hflip is detectable)
    img = np.zeros((6, 8, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(8, dtype=np.uint8)[None, :] * 30
    img[:, :, 1] = 100
    rows = [
        (0, "image", bytearray(png_encode(img)),
         (8, 6, None, None, "png")),
        (1, "audio", bytearray(b"\x00" * 16), (None, None, 16000, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.variant: r for r in image_augment(df).collect()}
    assert set(got) == {"hflip", "crop", "bright"}  # audio row gated out
    for r in got.values():
        assert (r.media_id, r.width, r.height) == (0, 8, 6)
    flipped = png_decode(bytes(got["hflip"].data))
    assert np.array_equal(flipped, img[:, ::-1])
    cropped = png_decode(bytes(got["crop"].data))
    assert cropped.shape == img.shape
    bright = png_decode(bytes(got["bright"].data))
    assert bright.mean() > img.mean()
    assert bright.max() <= 255
