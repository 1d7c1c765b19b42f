"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The reference decodes images with ImageIO + EXIF normalization
(ref: src/main/java/core/ImageLoader.java:7-12, core/Exif.java:62-75)
before hashing. ``decode="real"`` is import-guarded on PIL: when
Pillow is installed it decodes, EXIF-transposes, grayscales and
resizes to an 8x8 luminance block (64 floats — exactly the block
``phash64`` consumes, so the black-image -> sketch 0 / constant-image
-> sketch 1 reference goldens hold end-to-end,
ref: src/test/java/hash/PHashDctTest.java:49-99); without PIL it
raises NotImplementedError (this container ships no codecs — the
gate is honest, and the PIL tests skip). ``decode="fake"`` produces a
deterministic feature vector derived from the bytes so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
is fully real and tested everywhere.

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

#: real-decode feature length: an 8x8 grayscale block, row-major —
#: the exact input shape of phash64 (no padding/trim on this path)
REAL_FEATURE_DIM = 64

FEATURES_SCHEMA = (
    "id long, kind string, width int, height int, feature array<float>"
)

try:  # optional codec dependency — absent in the test container
    from PIL import Image as _PILImage  # noqa: N813

    HAS_PIL = True
except ImportError:  # pragma: no cover - exercised when PIL installed
    _PILImage = None
    HAS_PIL = False


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


def _real_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """PIL decode (ref: core/ImageLoader.java:7-12): EXIF-orientation
    normalize (ref: core/Exif.java:62-75), luminance convert
    (ref: core/Gray.java:6-10), resize to the 8x8 block phash64 hashes
    (ref: core/Resize.java:6-13). A malformed payload degrades to the
    (0, 0, zeros) degenerate row — the per-file error-skip analog
    (ref: app/Commands.java:76-84) — instead of failing the task."""
    import io

    from PIL import ImageOps

    if data is None or len(data) == 0:
        return 0, 0, np.zeros(REAL_FEATURE_DIM, dtype=np.float32)
    try:
        img = _PILImage.open(io.BytesIO(bytes(data)))
        img = ImageOps.exif_transpose(img)
        width, height = img.size
        block = img.convert("L").resize((8, 8), _PILImage.BILINEAR)
        feature = np.asarray(block, dtype=np.float32).reshape(
            REAL_FEATURE_DIM
        )
        return width, height, feature
    except Exception:  # noqa: BLE001 - decode errors are per-row data errors
        return 0, 0, np.zeros(REAL_FEATURE_DIM, dtype=np.float32)


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """media(id, kind, data:binary) -> per-item feature rows.

    ``mapInPandas`` so one Arrow batch is one numpy workload;
    ``decode="real"`` (needs Pillow) and ``decode="fake"`` share the
    schema, batching and partitioning — only the per-row kernel
    differs.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {decode!r}")
    if decode == "real" and not HAS_PIL:
        # raise at PLAN time, driver-side: an executor-side surprise
        # after a long upstream job would be strictly worse
        raise NotImplementedError(
            "decode='real' requires Pillow, which is not installed in "
            "this environment; use decode='fake' for plumbing tests"
        )
    kernel = _real_decode if decode == "real" else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "kind": [], "width": [], "height": [], "feature": []}
            for _id, kind, data in zip(pdf["id"], pdf["kind"], pdf["data"]):
                w, h, feat = kernel(data)
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


def _dct8_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C (C @ X @ C.T = 2-D DCT of X) —
    the numpy form of the reference's naive O(N^4) double loop
    (ref: src/main/java/hash/PHashDct.java:59-78)."""
    n = 8
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


def phash64(
    features: DataFrame, id_col: str = "id", vec_col: str = "feature"
) -> DataFrame:
    """64-bit pHash-DCT sketch over decoded feature blocks
    (ref: src/main/java/hash/PHashDct.java:13-57): the feature vector is
    zero-padded/trimmed to an 8x8 block, 2-D DCT-II'd (one einsum per
    Arrow batch), the mean of the AC coefficients is taken skipping the
    DC term and |v| < 1e-9 entries (ref :45-48), and bit i is set iff
    coefficient i (INCLUDING the DC term, exactly as the reference's
    loop from i=0) exceeds that mean by > 1e-9, packed LSB-first
    (``bits |= 1L << i``, ref :51-56). An all-zero block -> sketch 0,
    matching the reference's black-image golden
    (ref: src/test/java/hash/PHashDctTest.java:49-60); a constant
    non-zero block has only DC energy -> sketch 1 (bit 0).

    Output: (id, phash:long). Pairs within a Hamming radius come from
    the generic bit-chunk LSH (operators/hamming_lsh.py) — no new join
    machinery.
    """
    basis = _dct8_basis()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "phash": []})
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mat.ndim != 2:
                # ragged feature lengths would otherwise collapse to a
                # 1-D object array and silently drop the batch
                raise ValueError(
                    "phash64: feature vectors must all have the same "
                    "length within a batch (got ragged arrays)"
                )
            n, d = mat.shape
            if d < 64:
                mat = np.pad(mat, ((0, 0), (0, 64 - d)))
            else:
                mat = mat[:, :64]
            blocks = mat.reshape(n, 8, 8)
            dct = np.einsum("ij,njk,lk->nil", basis, blocks, basis)
            flat = dct.reshape(n, 64)
            flat[np.abs(flat) < 1e-9] = 0.0  # ref :38-41 noise zeroing
            ac = flat[:, 1:]
            valid = np.abs(ac) >= 1e-9
            cnt = valid.sum(axis=1)
            mean = np.where(
                cnt > 0, (ac * valid).sum(axis=1) / np.maximum(cnt, 1), 0.0
            )
            bits = (flat - mean[:, None] > 1e-9).astype(np.uint64)
            weights = np.left_shift(
                np.uint64(1), np.arange(64, dtype=np.uint64)
            )
            ph = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64) \
                .view(np.int64)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(dtype=np.int64), "phash": ph}
            )

    return features.select(id_col, vec_col).mapInPandas(run, "id long, phash long")


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
