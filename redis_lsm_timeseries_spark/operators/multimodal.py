"""Multimodal column plumbing (north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over ``mapInPandas`` — the slot where a
real deployment plugs Pillow / torchaudio / decord. Those libraries are
not in this container, so the DECODE step is stubbed with a
deterministic byte-statistics "decoder" (clearly marked); everything
Spark-side — schema, batch iteration, partition parallelism, UDF
signature — is real and tested.

Scale notes: mapInPandas streams Arrow batches, so peak memory is one
batch per core, not one partition; binary payloads never pass through
Python row-by-row. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Input: (doc_id, payload: binary). Output: FEATURE_SCHEMA rows.

    The closure is deliberately SELF-CONTAINED (no references to this
    module's globals): Spark pickles nested functions by value, so the
    executors never need this package importable — the engine works
    from any driver process regardless of worker PYTHONPATH.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def decode_stub(payload: bytes) -> dict:
            # STUB decoder: a real deployment replaces this with e.g.
            # PIL.Image.open(io.BytesIO(payload)). Deterministic fake:
            # byte statistics + size-derived fake dimensions.
            n = len(payload)
            mean = (sum(payload) / n) if n else 0.0
            width = 16 + (n % 64)
            height = 16 + ((n // 64) % 64)
            hist = [0] * 8  # 8-bucket byte histogram as the "feature"
            for b in payload:
                hist[b >> 5] += 1
            feature = [h / n if n else 0.0 for h in hist]
            return {
                "n_bytes": n,
                "mean_byte": mean,
                "width": width,
                "height": height,
                "feature": feature,
            }

        for pdf in batches:
            decoded = pdf[payload_col].map(lambda p: decode_stub(bytes(p)))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": decoded.map(lambda d: d["n_bytes"]).astype("int64"),
                    "mean_byte": decoded.map(lambda d: d["mean_byte"]),
                    "width": decoded.map(lambda d: d["width"]).astype("int32"),
                    "height": decoded.map(lambda d: d["height"]).astype("int32"),
                    "feature": decoded.map(lambda d: d["feature"]),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_size: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling over a binary column via ``mapInPandas`` — the
    1-row-in / N-rows-out multimodal shape (a video decoder emitting
    every ``stride``-th frame plugs into exactly this slot; the stub
    treats the payload as fixed-size byte frames and digests each
    sampled one).

    Output: (doc_id, frame_idx, frame_bytes, frame_digest) — one row
    per sampled frame. Arrow-batched; the payload bytes never pass
    through Python row-by-row driver-side."""

    def run(batches):
        import hashlib as _hashlib
        import math as _math

        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_digest": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                n_frames = _math.ceil(len(data) / frame_size)
                for idx in range(0, n_frames, stride):
                    frame = data[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frame))
                    out["frame_digest"].append(
                        _hashlib.md5(frame).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
