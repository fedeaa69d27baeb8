"""Multimodal operators (north star §2.11 'multimodal columns').

Model: media rows are ``(media_id, kind, data binary, meta struct)`` —
the payload is opaque to Spark SQL; decode / feature-extraction / resize
/ frame-sampling run as Arrow-batched pandas transforms via
``mapInPandas`` so the binary never round-trips through Python row by
row and the operator parallelizes per input partition.

CODECS: PNG / BMP / PGM / PPM / WAV decode (and PNG/WAV encode +
nearest-neighbor resize) are REAL, implemented from the wire formats
with stdlib zlib/struct/wave + numpy (:mod:`.codecs`) — no PIL/libav in
this container, none needed for these formats. Formats that genuinely
require a native library (JPEG, H.264, ...) raise NotImplementedError
from the same dispatch point, and the deterministic ``FAKEMEDIA1``
payload remains as a codec-free test fixture. Everything Spark-side —
schema, partitioning, UDF signatures, Arrow batch shape, explode
semantics — is shared by all formats; adding a JPEG decoder is one
dispatch-table entry.

Scale notes: batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set to a small value
for fat binaries); repartition on media_id upstream if payload sizes are
skewed. Features come back as plain ``array<double>`` columns feeding
the similarity-search operators (operators.similarity).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Typed metadata struct accompanying every binary payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

_FAKE_MAGIC = b"FAKEMEDIA1"


def _fake_payload(media_id: int, n: int = 64) -> bytes:
    """Deterministic pseudo-payload: sha256 counter stream (no RNG)."""
    out = b""
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(f"{media_id}:{counter}".encode()).digest()
        counter += 1
    return _FAKE_MAGIC + out[: n]


def make_fake_media(spark: SparkSession, n: int = 30) -> DataFrame:
    """Deterministic fake media table for tests/demos (kinds cycle
    image/audio/video; payload sized by kind)."""
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        meta = {
            "image": (32, 24, None, 1, "fake-img"),
            "audio": (None, None, 16000, None, "fake-pcm"),
            "video": (16, 12, None, 8, "fake-vid"),
        }[kind]
        rows.append((i, kind, _fake_payload(i, 64 + 16 * (i % 5)), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(data: bytes) -> list[float]:
    """Codec dispatch. REAL stdlib decoders cover PNG / BMP / PGM / PPM
    / WAV (:mod:`etl_airbnb_mex_spark.multimodal.codecs` — exact byte
    math, no PIL/libav needed); the deterministic ``FAKEMEDIA1`` stub
    remains for test fixtures; anything else (JPEG, H.264, ...) raises
    like a real decoder missing its codec would — those formats
    genuinely need a native library this container doesn't ship."""
    from . import codecs

    if data is None:
        raise NotImplementedError("NULL media payload")
    raw = bytes(data)
    fmt = codecs.sniff_format(raw)
    if fmt == "png":
        return [float(x) for x in codecs.png_decode(raw).ravel()]
    if fmt == "bmp":
        return [float(x) for x in codecs.bmp_decode(raw).ravel()]
    if fmt == "pnm":
        return [float(x) for x in codecs.pnm_decode(raw).ravel()]
    if fmt == "wav":
        samples, _rate = codecs.wav_decode(raw)
        return [float(x) for x in samples.ravel()]
    if raw.startswith(_FAKE_MAGIC):
        return [float(b) for b in raw[len(_FAKE_MAGIC):]]
    raise NotImplementedError(
        "no codec for this payload (supported here: PNG, BMP, PGM/PPM, "
        "WAV PCM, FAKEMEDIA1; JPEG/video need a native library)"
    )


_DECODED_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, pixels array<double>"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Decode the binary payload into a numeric array column
    (mapInPandas: one Arrow batch in, one out; binary stays columnar)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(
                        lambda d: len(bytes(d)) if d is not None else 0
                    ),
                    "pixels": pdf["data"].map(_decode_payload),
                }
            )

    return df.mapInPandas(batches, _DECODED_SCHEMA)


_FEATURES_SCHEMA = "media_id bigint, kind string, features array<double>"


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Fixed-dim feature vector per media row: chunked byte means over
    the decoded payload (vectorized numpy inside the Arrow batch). The
    output feeds operators.similarity.knn_cosine directly."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def feat(data) -> list[float]:
            px = np.asarray(_decode_payload(data), dtype="float64")
            chunks = np.array_split(px, dim)
            return [float(c.mean()) if len(c) else 0.0 for c in chunks]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["data"].map(feat),
                }
            )

    return df.mapInPandas(batches, _FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize images to (width, height). For REAL image payloads (PNG /
    BMP / PGM / PPM) the pixels are actually resampled —
    nearest-neighbor via :func:`codecs.resize_nearest` — and re-encoded
    as PNG; ``FAKEMEDIA1`` fixtures pass their payload through
    unchanged (no pixel grid to resample). Undecodable formats raise,
    like every codec op here.

    Returns (media_id, data, meta with width/height replaced)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from . import codecs

        def resample(data) -> bytes:
            raw = bytes(data)
            fmt = codecs.sniff_format(raw)
            if fmt in ("png", "bmp", "pnm"):
                img = {
                    "png": codecs.png_decode,
                    "bmp": codecs.bmp_decode,
                    "pnm": codecs.pnm_decode,
                }[fmt](raw)
                return codecs.png_encode(
                    codecs.resize_nearest(img, width, height)
                )
            _decode_payload(raw)  # raises on undecodable formats
            return raw

        for pdf in it:
            data = pdf["data"].map(resample)
            meta = pdf["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "data": data, "meta": meta}
            )

    schema = T.StructType(
        [f for f in MEDIA_SCHEMA.fields if f.name in ("media_id", "data", "meta")]
    )
    return df.filter(df["kind"] == "image").mapInPandas(batches, schema)


_FRAMES_SCHEMA = "media_id bigint, frame_no int, frame array<double>"


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: one output ROW per kept frame (table-valued
    shape — mapInPandas naturally emits more rows than it consumes).
    Frames = equal slices of the decoded payload by meta.n_frames."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out_ids, out_nos, out_frames = [], [], []
            for _, row in pdf.iterrows():
                n_frames = int(row["meta"]["n_frames"] or 1)
                px = np.asarray(_decode_payload(row["data"]), dtype="float64")
                for frame_no, frame in enumerate(np.array_split(px, n_frames)):
                    if frame_no % every_n == 0:
                        out_ids.append(row["media_id"])
                        out_nos.append(frame_no)
                        out_frames.append([float(x) for x in frame])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_no": out_nos, "frame": out_frames}
            )

    return df.filter(df["kind"] == "video").mapInPandas(batches, _FRAMES_SCHEMA)
