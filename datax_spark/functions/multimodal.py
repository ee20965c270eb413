"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus typed metadata —
the pattern a 100 TB training-data pipeline needs: blobs never pass
through Python row-at-a-time; they move in Arrow record batches
through ``mapInPandas``, and heavy codecs run vectorized per batch.

The actual codec libraries (Pillow/librosa/ffmpeg) are NOT in this
container, so the decode step is a clearly-marked stub: when the lib
is importable we decode for real, otherwise we derive deterministic
fake features from the raw bytes (so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signature — is fully real and tested,
and the fake is oracle-checkable).

The reference has no media support at all; the closest analog is its
BytesColumn passthrough (``common/.../element/BytesColumn.java``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # real codec, absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # pragma: no cover - environment-dependent
    _HAVE_PIL = False

IMAGE_FEATURE_FIELDS = [
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("mode", T.StringType()),
]


def decode_image_real(payload: bytes):  # pragma: no cover - no codec here
    """Real decode path; requires Pillow. Kept separate so the stub
    boundary is explicit."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use the deterministic fake-feature path"
        )
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, img.mode


def _fake_features(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in 'decode': features are pure functions of
    the byte length, so results are reproducible and SQL-checkable."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "width": (n_bytes % 640 + 1).astype("int64"),
            "height": (n_bytes % 480 + 1).astype("int64"),
            "mode": "RGB",
        }
    )


def with_fake_image_features(df: DataFrame, payload_col: str) -> DataFrame:
    """Append image-feature columns to a frame with a binary payload
    column, via ``mapInPandas`` (Arrow-batched; blobs never leave the
    batch as Python objects one by one)."""
    out_schema = T.StructType(list(df.schema.fields) + IMAGE_FEATURE_FIELDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(lambda b: len(b) if b is not None else 0)
            feats = _fake_features(n)
            feats.index = pdf.index
            yield pd.concat([pdf, feats], axis=1)

    return df.mapInPandas(gen, schema=out_schema)


AUDIO_FEATURE_FIELDS = [
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("channels", T.LongType()),
]


def with_fake_audio_features(df: DataFrame, payload_col: str) -> DataFrame:
    """Audio analog of ``with_fake_image_features``: opaque binary ->
    typed metadata columns via Arrow-batched mapInPandas. Deterministic
    fake 'decode' (real audio codecs absent in this container): treat
    the payload as 16-bit mono PCM at 16 kHz, so features are pure
    functions of byte length and SQL-checkable."""
    out_schema = T.StructType(list(df.schema.fields) + AUDIO_FEATURE_FIELDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(lambda b: len(b) if b is not None else 0).astype("int64")
            feats = pd.DataFrame(
                {
                    "n_bytes": n,
                    "sample_rate": 16_000,
                    "duration_ms": (n // 2) * 1000 // 16_000,
                    "channels": 1,
                }
            )
            feats.index = pdf.index
            yield pd.concat([pdf, feats], axis=1)

    return df.mapInPandas(gen, schema=out_schema)


def frame_sample_indices(n_frames_col: pd.Series, every: int) -> pd.Series:
    """Video frame-sampling helper (pandas side): indices 0, every,
    2*every … < n_frames, as list values. Used inside mapInPandas for
    frame-sample pipelines; pure and vectorizable."""
    return n_frames_col.map(lambda n: list(range(0, int(n), every)) if n else [])
