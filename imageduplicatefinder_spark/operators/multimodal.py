"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The reference decodes images with ImageIO + EXIF normalization
(ref: src/main/java/core/ImageLoader.java:7-12, core/Exif.java:62-75)
before hashing. This container has no image/audio codecs, so the decode
kernel is STUBBED: ``decode="fake"`` produces a deterministic feature
vector derived from the bytes (so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is fully real and
tested), while ``decode="real"`` raises NotImplementedError where a
PIL/ffmpeg call would go.

Schema conventions:
    media table:    id:long, kind:string, meta:struct<...>, data:binary
    features out:   id:long, kind:string, width:int, height:int,
                    feature:array<float>  (fixed FEATURE_DIM)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 32

FEATURES_SCHEMA = (
    "id long, kind string, width int, height int, feature array<float>"
)


def _fake_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decode: derives a pseudo
    (width, height) and a FEATURE_DIM feature vector from the bytes.
    Replaces ``PIL.Image.open`` + resize (ref: core/Resize.java:6-13)."""
    if data is None or len(data) == 0:
        return 0, 0, np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(data, dtype=np.uint8)
    width = int(arr[: 4].sum()) % 1024 + 1
    height = int(arr[4:8].sum()) % 1024 + 1 if len(arr) > 4 else 1
    # bucket-mean "thumbnail": pad to a multiple of FEATURE_DIM, mean pool
    pad = (-len(arr)) % FEATURE_DIM
    padded = np.pad(arr, (0, pad)).astype(np.float32)
    feature = padded.reshape(FEATURE_DIM, -1).mean(axis=1)
    return width, height, feature


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """media(id, kind, data:binary) -> per-item feature rows.

    ``mapInPandas`` so one Arrow batch is one numpy workload; a real
    deployment swaps ``_fake_decode`` for the codec call and nothing
    else changes (same schema, same batching, same partitioning).
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, absent in this "
                    "container; use decode='fake' for plumbing tests"
                )
            out = {"id": [], "kind": [], "width": [], "height": [], "feature": []}
            for _id, kind, data in zip(pdf["id"], pdf["kind"], pdf["data"]):
                w, h, feat = _fake_decode(data)
                out["id"].append(_id)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.select("id", "kind", "data").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-frame-sampling analog over opaque bytes: emits one row per
    sampled "frame" offset (UDTF-like cardinality change via mapInPandas).
    Real frame extraction would replace the offset slicing with a
    demuxer call; the exploded schema and batch shape are the real part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offsets, checksums = [], [], []
            for _id, data in zip(pdf["id"], pdf["data"]):
                blob = data or b""
                for off in range(0, max(len(blob), 1), every_n_bytes):
                    chunk = blob[off : off + every_n_bytes]
                    ids.append(_id)
                    offsets.append(off)
                    words = np.frombuffer(
                        np.pad(np.frombuffer(chunk, dtype=np.uint8),
                               (0, (-len(chunk)) % 8)).tobytes(),
                        dtype=np.uint64,
                    )
                    checksums.append(int(words.sum()) & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame({"id": ids, "frame_offset": offsets,
                                "frame_checksum": checksums})

    return media.select("id", "data").mapInPandas(
        run, "id long, frame_offset long, frame_checksum long"
    )


def media_dedup_by_feature(
    features: DataFrame, threshold: float = 0.999, n_blocks: int = 8
) -> DataFrame:
    """Near-dup pairs among media items by feature cosine — routed
    through the embedding similarity machinery
    (``operators.similarity.blocked_cosine_pairs``): exact, no
    cartesian product, no driver collect. Zero-norm features (empty
    payloads) produce NaN cosine and fail the threshold, matching the
    old ``try_divide``-null semantics."""
    from imageduplicatefinder_spark.operators.similarity import blocked_cosine_pairs

    return blocked_cosine_pairs(
        features,
        threshold=threshold,
        id_col="id",
        vec_col="feature",
        n_blocks=n_blocks,
        out_a="id_a",
        out_b="id_b",
    )
