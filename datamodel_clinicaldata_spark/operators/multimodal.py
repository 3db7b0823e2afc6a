"""Multimodal columns — image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (the sanctioned
Python path: one Arrow batch per hop, never per-row pickling).

Design (the 100 TB shape):
- Media rides as ``content: binary`` next to a ``media_meta`` struct
  (width/height/channels/sample_rate/duration_ms/format). Parquet stores
  the blobs inline; at scale the table is partitioned by ``kind`` and
  date so decode jobs prune to the modality they need, and
  ``spark.sql.files.maxPartitionBytes`` keeps one task's blobs in memory.
- Feature extraction = ``mapInPandas`` over the pruned projection
  (media_id + content only — column pruning matters more than usual when
  one column is megabytes wide).
- REAL codec decode (JPEG/PNG/WAV) is stubbed: the image/audio libraries
  are not in this container. ``decode_image`` raises NotImplementedError
  unless PIL is importable; every OTHER operator computes real,
  deterministic byte-level features (histogram, RMS energy, frame
  slicing) so the full Spark plumbing — schema, batching, explode
  cardinality, partition parallelism — is genuinely exercised and
  oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table derived from ``documents``: the text body
    as the binary payload plus a typed metadata struct. Stands in for a
    real (media_id, content, meta) table so every downstream operator runs
    against genuine binary columns."""
    n = F.length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16_000).alias("sample_rate"),
            (n * 10).cast("int").alias("duration_ms"),
            F.lit("raw").alias("format"),
        ).alias("media_meta"),
    )


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL image decode — requires PIL, which this environment does not
    ship. The plumbing (Arrow batch → PIL → pixel array) is what a
    cluster with the codec installed would run; here it raises so callers
    fall back to ``byte_histogram`` features."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec libraries are not available in this environment; "
            "use byte_histogram/frame_sample for deterministic features"
        ) from e
    raise NotImplementedError("real decode path reserved for codec-enabled clusters")


def byte_histogram(
    media: DataFrame,
    bins: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-media byte-value histogram: (media_id, bin, n) with
    bin = byte_value // (256/bins). The deterministic stand-in for
    image feature extraction; numpy-vectorized inside each Arrow batch."""
    import numpy as np

    width = 256 // bins
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("bin", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_bin, out_n = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                arr = np.frombuffer(blob, dtype=np.uint8) // width
                vals, counts = np.unique(arr, return_counts=True)
                out_id.extend([mid] * len(vals))
                out_bin.extend(int(v) for v in vals)
                out_n.extend(int(c) for c in counts)
            yield pd.DataFrame({id_col: out_id, "bin": out_bin, "n": out_n})

    return media.select(id_col, content_col).mapInPandas(extract, schema)


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 128,
    max_frames: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video-style frame sampling: every ``stride`` bytes take a
    ``frame_bytes`` slice ("frame"), up to ``max_frames`` per media;
    output (media_id, frame_idx, frame_md5, frame_len). Pure byte
    plumbing — a real pipeline would decode each slice; the sampling
    cardinality, batching and hashing are the part Spark owns either way."""
    import hashlib

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
            T.StructField("frame_len", T.LongType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "frame_md5": [], "frame_len": []}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                for i in range(max_frames):
                    start = i * stride
                    if start >= len(b):
                        break
                    frame = b[start : start + frame_bytes]
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_md5"].append(hashlib.md5(frame).hexdigest())
                    rows["frame_len"].append(len(frame))
            yield pd.DataFrame(rows)

    return media.select(id_col, content_col).mapInPandas(sample, schema)


def audio_rms_windows(
    media: DataFrame,
    window: int = 256,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Audio-style windowed RMS energy over the byte "waveform":
    (media_id, window_idx, n_samples, sum_sq). The energy is delivered as
    the exact integer sum of squares (cross-engine exact); RMS =
    sqrt(sum_sq / n_samples) is a trivial derived column left to callers
    so the oracle comparison stays integer-exact."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("window_idx", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sum_sq", T.LongType()),
        ]
    )

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "window_idx": [], "n_samples": [], "sum_sq": []}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                arr = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                for w in range(0, len(arr), window):
                    chunk = arr[w : w + window]
                    rows[id_col].append(mid)
                    rows["window_idx"].append(w // window)
                    rows["n_samples"].append(len(chunk))
                    rows["sum_sq"].append(int((chunk * chunk).sum()))
            yield pd.DataFrame(rows)

    return media.select(id_col, content_col).mapInPandas(rms, schema)


def resize_nearest(
    media: DataFrame,
    src_width: int = 32,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Nearest-neighbour resize over the byte-grid view of each blob: the
    payload is treated as a row-major ``src_width``-wide grid (height =
    ceil(len/src_width)) and sampled down to ``out_w``×``out_h``. Real
    image resize swaps the per-pixel gather for a codec + interpolation
    kernel; the Spark-side contract — Arrow batching, binary in/out,
    per-media metadata — is identical and is what this operator pins.

    Output: (media_id, out_w, out_h, resized_md5, resized_len).
    """
    import hashlib

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("out_w", T.LongType()),
            T.StructField("out_h", T.LongType()),
            T.StructField("resized_md5", T.StringType()),
            T.StructField("resized_len", T.LongType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                id_col: [],
                "out_w": [],
                "out_h": [],
                "resized_md5": [],
                "resized_len": [],
            }
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                b = bytes(blob)
                n = len(b)
                h = -(-n // src_width)
                out = bytes(
                    b[
                        min(
                            (r * h) // out_h * src_width
                            + (c * src_width) // out_w,
                            n - 1,
                        )
                    ]
                    for r in range(out_h)
                    for c in range(out_w)
                )
                rows[id_col].append(mid)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["resized_md5"].append(hashlib.md5(out).hexdigest())
                rows["resized_len"].append(len(out))
            yield pd.DataFrame(rows)

    return media.select(id_col, content_col).mapInPandas(resize, schema)
