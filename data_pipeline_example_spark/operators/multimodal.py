"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension surface (BASELINE.json north star): treat image/audio/video as
``binary`` columns and run decode / feature-extraction as Arrow-batched
pandas iterators via ``mapInPandas`` — the idiomatic Spark shape for
Python-only media libraries at scale (each task pulls batches through
Arrow once, the Python worker is reused, and output schema is declared
up front so Catalyst can plan around the black box).

The actual media decoding libraries (PIL/opencv/librosa) are NOT in this
container, so ``decode_image`` is a clearly-marked stub behind an
import-try (NotImplementedError), and ``extract_features`` uses a
deterministic byte-level fake (length, md5, fake dimensions derived from
the payload) — the Spark-side plumbing (schema, batching, partitioning,
UDF signature) is real and tested, and because the fake is a pure
function of the bytes it is even oracle-checkable in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def attach_binary(documents: DataFrame) -> DataFrame:
    """Wrap a text corpus as a media table: content = utf-8 bytes of the
    text. Stands in for reading real image/audio payloads; preserves the
    (id, media_type, binary) contract end-to-end."""
    return documents.select(
        F.col("doc_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("content"),
    )


def decode_image(content: bytes) -> object:
    """Decode image bytes → PIL Image (loaded into memory, file handle
    closed). The single seam where the real decoder lives; raises
    NotImplementedError when PIL is absent (this sandbox) so callers fail
    loudly instead of silently skipping payloads. The PIL path itself is
    covered by a ``pytest.importorskip("PIL")`` test that runs the moment
    the cluster image carries PIL.
    """
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; install it on the cluster image"
        ) from exc
    import io

    img = Image.open(io.BytesIO(content))
    img.load()  # force decode now; surface corrupt payloads here
    return img


def extract_features(media: DataFrame, batch_limit: int | None = None) -> DataFrame:
    """Deterministic per-payload features via Arrow-batched mapInPandas.

    The fake 'decode' derives width/height from the byte length — stands
    in for a real decoder while keeping outputs reproducible (and
    SQL-checkable: md5(bytes) == md5(text) for utf-8 payloads).
    """

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if batch_limit is not None:
                pdf = pdf.head(batch_limit)
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": (content.map(len) % 640 + 1).astype("int32"),
                    "fake_height": (content.map(len) * 7 % 480 + 1).astype("int32"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def media_features(documents: DataFrame) -> DataFrame:
    """End-to-end multimodal pipeline: text → binary column → Arrow
    batches → per-payload features."""
    return extract_features(attach_binary(documents))


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """Decode → resize → re-encode (PNG) image bytes. Same seam contract
    as ``decode_image``: raises NotImplementedError without PIL; the real
    path is covered by the PIL-gated test."""
    import io

    img = decode_image(content)
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format=fmt)
    return buf.getvalue()


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def decoded_image_features(media: DataFrame) -> DataFrame:
    """REAL decoder path: Arrow-batched ``mapInPandas`` over binary image
    payloads, one ``decode_image`` per row inside the batch loop —
    exactly the plan shape of ``extract_features`` but with the live
    decoder in place of the deterministic fake. Requires PIL on the
    executors, so it is not a registered query in this sandbox; the
    PIL-gated test runs it end-to-end (tiny generated PNGs → widths/
    heights/modes) wherever the image library exists.
    """

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            imgs = [decode_image(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([i.width for i in imgs], dtype="int32"),
                    "height": pd.array([i.height for i in imgs], dtype="int32"),
                    "mode": pd.array([i.mode for i in imgs], dtype=object),
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("n_samples", LongType()),
        StructField("window_md5", StringType()),
    ]
)


def audio_windows(
    media: DataFrame, window_ms: int = 1000, sample_rate: int = 16_000
) -> DataFrame:
    """Audio windowing plumbing — the third modality next to images
    (``extract_features``/``decoded_image_features``) and video
    (``sample_frames``): one payload row fans out to one row per
    fixed-duration analysis window, the shape a real PCM decoder /
    feature extractor (fbank, VAD, diarization) plugs into.

    The deterministic fake treats the payload as PCM16 mono at
    ``sample_rate``: n_samples = len(bytes) // 2, windows of
    ``window_ms`` each; the last partial window is kept (real feature
    pipelines pad it). window_md5 = md5(bytes ':' idx) stands in for
    the window's content digest — a pure function of the bytes, so the
    whole fan-out is SQL-checkable like the frame sampler.
    """
    spw = sample_rate * window_ms // 1000  # samples per window

    def _windows(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            starts: list[int] = []
            counts: list[int] = []
            md5s: list[str] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                n_samples = len(raw) // 2
                n_windows = max((n_samples + spw - 1) // spw, 0)
                for i in range(n_windows):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    starts.append(i * window_ms)
                    counts.append(min(spw, n_samples - i * spw))
                    md5s.append(hashlib.md5(raw + b":" + str(i).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "window_idx": pd.array(idxs, dtype="int32"),
                    "start_ms": pd.array(starts, dtype="int64"),
                    "n_samples": pd.array(counts, dtype="int64"),
                    "window_md5": pd.array(md5s, dtype=object),
                }
            )

    return media.mapInPandas(_windows, schema=AUDIO_SCHEMA)


def sample_frames(media: DataFrame, every: int = 10, modulus: int = 100) -> DataFrame:
    """Video-frame sampling plumbing: one payload row fans out to one row
    per sampled frame through ``mapInPandas`` (the shape a real decoder
    plugs into — per-task Arrow batches in, variable-cardinality batches
    out, schema declared up front).

    The deterministic fake treats the payload as ``len(bytes) % modulus
    + 1`` frames and samples every ``every``-th; frame_md5 =
    md5(bytes + ':' + idx) stands in for the frame content hash. Pure
    function of the bytes → SQL-checkable.
    """

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            md5s: list[str] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                for i in range(0, len(b) % modulus + 1, every):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(b + b":%d" % i).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_md5": pd.array(md5s, dtype=object),
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def frame_samples(documents: DataFrame) -> DataFrame:
    """End-to-end: text corpus as binary payloads → sampled frames."""
    return sample_frames(attach_binary(documents))
