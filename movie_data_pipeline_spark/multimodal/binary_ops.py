"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side machinery here is REAL and tested — schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing — while the
codec step is stubbed: the container has no image/audio libraries, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic fake decoder (byte
statistics standing in for pixels/samples). Swapping in PIL/libsndfile
later only changes the inner function, not the Spark plan.

Scale posture: binary payloads stay in executor memory one Arrow batch
at a time (``maxRecordsPerBatch`` bounds peak memory); metadata-only
queries never touch the payload column thanks to parquet column
pruning.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, "
    "mean_byte double, byte_hist array<long>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def _fake_decode_bytes(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: the payload bytes
    themselves act as the 'pixel' array."""
    return np.frombuffer(payload, dtype=np.uint8)


def _require_codec(fake: bool, what: str, dep: str) -> None:
    """Fail fast on the DRIVER at plan-build time. The real codecs are
    not in this container, so ``fake=False`` can never succeed — and a
    raise deferred into the per-row executor loop would surface only
    at action time, or never on an empty / all-null-payload input
    (silently returning an empty result instead of erroring). This is
    how a missing codec dependency should fail: once, immediately,
    where the op is built."""
    if not fake:
        raise NotImplementedError(
            f"real {what} requires {dep} (not in container); "
            "pass fake=True for the deterministic stand-in"
        )


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-image features via mapInPandas (Arrow batches of payloads).

    With a real codec this would decode + pool pixels; the fake path
    computes the same-shaped features from raw bytes so the plan,
    schema, and batch handling are fully exercised.
    """
    _require_codec(fake, "image decode", "PIL/opencv")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, 0, None, 0.0, [0] * 16))
                    continue
                # real codec slots in here, replacing _fake_decode_bytes
                arr = _fake_decode_bytes(bytes(payload))
                hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                rows.append(
                    (
                        media_id,
                        len(arr),
                        hashlib.sha256(bytes(payload)).hexdigest(),
                        float(arr.mean()) if len(arr) else 0.0,
                        hist.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "sha256", "mean_byte", "byte_hist"]
            )

    return df.select("media_id", "payload").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled
    'frame' (fixed-stride byte slices under the fake codec)."""
    _require_codec(fake, "video decode", "ffmpeg bindings")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # real codec slots in here, replacing the byte striding
                data = bytes(payload)
                for idx, off in enumerate(range(0, len(data), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    rows.append(
                        (media_id, idx, hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256"])

    return df.select("media_id", "payload").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def metadata_only_stats(df: DataFrame) -> DataFrame:
    """Metadata aggregation that never reads the payload column — the
    scan should show ReadSchema without 'payload' (column pruning)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.avg(F.col("meta.width")).alias("avg_width"),
            F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
        )
    )


RESIZED_SCHEMA = "media_id long, payload binary, n_bytes_out long"


def resize_media(df: DataFrame, factor: int = 4, fake: bool = False) -> DataFrame:
    """Resize/downsample pass: decode → subsample → re-encode, emitted
    as a new binary column (the real pipeline would decode pixels and
    bilinear-resample; the fake codec strides the byte array). Shape,
    batch handling, and output schema are the production ones."""
    _require_codec(fake, "resize", "an image library")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, 0))
                    continue
                # real codec slots in here, replacing the byte stride
                arr = _fake_decode_bytes(bytes(payload))[::factor]
                out = arr.tobytes()
                rows.append((media_id, bytearray(out), len(out)))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "n_bytes_out"]
            )

    return df.select("media_id", "payload").mapInPandas(op, RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "media_id long, window_idx int, n_samples int, rms double, peak int"
)


def window_audio(
    df: DataFrame, window_samples: int = 2048, fake: bool = False
) -> DataFrame:
    """Fixed-length PCM windowing for audio payloads: one row per
    window with sample count, RMS energy, and peak amplitude — the
    standard front end for VAD / loudness filtering in an audio
    training pipeline. Under the fake codec the payload bytes act as
    8-bit unsigned PCM; a real decoder slots into the same mapInPandas
    batch shape (Arrow in, Arrow out, no driver involvement)."""
    _require_codec(fake, "audio decode", "soundfile/ffmpeg")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # real codec slots in here, replacing byte-as-PCM
                pcm = _fake_decode_bytes(bytes(payload)).astype(np.float64)
                # center on 0 like signed PCM so RMS measures energy
                pcm -= 128.0
                for idx in range(0, max(len(pcm), 1), window_samples):
                    w = pcm[idx : idx + window_samples]
                    if len(w) == 0:
                        continue
                    rows.append(
                        (
                            media_id,
                            idx // window_samples,
                            int(len(w)),
                            float(np.sqrt((w * w).mean())),
                            int(np.abs(w).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "n_samples", "rms", "peak"],
            )

    return df.select("media_id", "payload").mapInPandas(op, AUDIO_WINDOW_SCHEMA)


FRAME_DHASH_SCHEMA = "media_id long, frame_idx int, dhash string"


def frame_dhash(
    df: DataFrame, frame_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Perceptual difference-hash per sampled frame: 64 bits, bit j =
    (sample[j] > sample[j+stride_offset]) over a fixed downsampling of
    the decoded frame — the video-dedup primitive (identical dhash ⇒
    near-identical frames; Hamming-near dhashes ⇒ visually similar).
    Emits the hash as a 64-char bit-string (cross-engine-stable — no
    signed-int64 overflow games). Frames shorter than ``frame_bytes``
    (tails) carry no stable 64-sample grid and are skipped, mirroring
    real phash pipelines that drop partial trailing frames.

    Under the fake codec a 'frame' is a byte slice and 'pixels' are
    the bytes themselves, so the hash is a pure function of payload
    bytes that DuckDB recomputes exactly (ASCII precondition as for
    frame_samples)."""
    _require_codec(fake, "video frame decode", "pyav/opencv")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                if payload is None:
                    continue
                arr = _fake_decode_bytes(bytes(payload))
                for idx in range(len(arr) // frame_bytes):
                    f = arr[idx * frame_bytes : (idx + 1) * frame_bytes]
                    a = f[0:frame_bytes:4][:64].astype(np.int16)
                    c = f[3:frame_bytes:4][:64].astype(np.int16)
                    bits = "".join(
                        "1" if x > y else "0" for x, y in zip(a, c)
                    )
                    rows.append((int(mid), idx, bits))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "dhash"])

    return df.select("media_id", "payload").mapInPandas(op, FRAME_DHASH_SCHEMA)
