"""From-spec baseline JPEG codec tests (operators/jpeg.py) + its wiring
into the multimodal decode tier."""

import numpy as np
import pytest

from imageduplicatefinder_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def test_jpeg_roundtrip_shapes_and_quality():
    """encode -> decode is near-lossless at quality=100 (all-ones quant
    table: error bounded by DCT float rounding) across padded and
    unpadded shapes; error grows monotonically as quality drops."""
    rng = np.random.default_rng(42)
    for shape in ((8, 8), (16, 24), (13, 21), (5, 1), (1, 7), (32, 32)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        w, h, gray = decode_jpeg(encode_jpeg(img, quality=100))
        assert (w, h) == (shape[1], shape[0])
        assert np.abs(gray - img).max() < 3.0
    smooth = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    errs = [
        float(np.abs(decode_jpeg(encode_jpeg(smooth, quality=q))[2]
                     - smooth).mean())
        for q in (100, 50, 10)
    ]
    assert errs == sorted(errs)
    assert errs[0] < 0.5


def test_jpeg_rgb_input_encodes_luminance():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    _, _, gray = decode_jpeg(encode_jpeg(rgb, quality=100))
    assert np.abs(gray - luma).max() < 3.0


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn path: every restart interval byte-aligns, resets the DC
    prediction, and the decoder resynchronizes — output identical to
    the no-restart encoding within quantization error."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)  # 15 MCUs
    base = decode_jpeg(encode_jpeg(img, quality=100))[2]
    for ri in (1, 2, 7):
        blob = encode_jpeg(img, quality=100, restart_interval=ri)
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
        _, _, gray = decode_jpeg(blob)
        assert np.abs(gray - base).max() < 1e-9  # same coefficients
        assert np.abs(gray - img).max() < 3.0


def test_jpeg_goldens_black_and_constant():
    assert decode_jpeg(encode_jpeg(np.zeros((32, 32), np.uint8)))[2].max() == 0
    const = decode_jpeg(encode_jpeg(np.full((32, 32), 200, np.uint8)))[2]
    assert np.allclose(const, 200.0, atol=1.0)


def test_jpeg_malformed_payloads_raise():
    full = encode_jpeg(np.zeros((16, 16), np.uint8))
    progressive = bytearray(full)
    sof = progressive.find(b"\xff\xc0")
    progressive[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    for bad in (
        b"", b"\xff\xd8", b"BM not a jpeg" * 4,
        full[:40],                 # truncated in the header
        full[:-30],                # truncated entropy stream
        bytes(progressive),
    ):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


@pytest.mark.skipif(
    not __import__(
        "imageduplicatefinder_spark.operators.multimodal",
        fromlist=["HAS_PIL"],
    ).HAS_PIL,
    reason="Pillow not installed",
)
def test_jpeg_cross_check_vs_pil():
    """With Pillow present, our encoder's output must decode in PIL to
    the same pixels (within quant error), and a PIL-encoded JPEG must
    decode in our reader."""
    import io

    from PIL import Image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    pil_img = Image.open(io.BytesIO(encode_jpeg(img, quality=100)))
    assert np.abs(np.asarray(pil_img, dtype=np.float64) - img).max() < 3.0
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=95)
    w, h, gray = decode_jpeg(buf.getvalue())
    assert (w, h) == (24, 24)
    assert np.abs(gray - img).mean() < 8.0


def test_jpeg_auto_dispatch_and_family_e2e(spark):
    """decode="auto" routes JPEG payloads; a perturbation family of
    real JPEGs groups under pHash Hamming pairs and excludes unrelated
    noise — the compressed-codec twin of the BMP family E2E."""
    from imageduplicatefinder_spark.operators.hamming_lsh import hamming_pairs
    from imageduplicatefinder_spark.operators.multimodal import (
        REAL_FEATURE_DIM,
        extract_features,
        phash64,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    rows = []
    for i in range(4):
        noisy = np.clip(
            base.astype(np.int16) + rng.integers(-6, 7, base.shape), 0, 255
        ).astype(np.uint8)
        rows.append((i + 1, "image", encode_jpeg(noisy, quality=95)))
    for i in range(4):
        rows.append((101 + i, "image",
                     encode_jpeg(rng.integers(0, 256, (32, 32),
                                              dtype=np.uint8))))
    rows.append((999, "image", b"neither bmp nor png nor jpeg"))
    media = spark.createDataFrame(rows, "id long, kind string, data binary")
    feats = extract_features(media, decode="auto")
    got = {r.id: r for r in feats.collect()}
    assert got[1].width == 32
    assert got[999].width == 0
    assert got[999].feature == [0.0] * REAL_FEATURE_DIM
    pairs = {
        (r.doc_a, r.doc_b)
        for r in hamming_pairs(phash64(feats), radius=6,
                               id_col="id", sketch_col="phash").collect()
    }
    fam = {1, 2, 3, 4}
    from itertools import combinations

    for a, b in combinations(sorted(fam), 2):
        assert (a, b) in pairs, f"family pair {(a, b)} missing"
    assert not any((a in fam) != (b in fam) for a, b in pairs if b != 999)


def test_jpeg_structural_lies_raise_valueerror_not_parser_errors():
    """Segment lengths that lie about their payload must surface as the
    contract ValueError, not struct.error/IndexError (the per-row skip
    catches only ValueError)."""
    import struct

    short_sof = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC0, 4) + b"\x08\x00"
    lying_dht = b"\xff\xd8" + struct.pack(">BBH", 0xFF, 0xC4, 5) + b"\x00\x05\x01"
    for blob in (short_sof, lying_dht):
        with pytest.raises(ValueError):
            decode_jpeg(blob)


def test_jpeg_color_modes_exercise_multicomponent_decode():
    """4:4:4 and 4:2:0 YCbCr encodings must decode to the same
    luminance as the grayscale encoding of the identical image — this
    is the in-container coverage of the decoder's multi-component path:
    interleaved MCU geometry, generic sampling factors, chroma
    bitstream sync with luma-only IDCT, and multi-predictor restarts."""
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, (21, 29, 3), dtype=np.uint8)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for sub in ("gray", "444", "420"):
        w, h, gray = decode_jpeg(
            encode_jpeg(rgb, quality=100, subsampling=sub)
        )
        assert (w, h) == (29, 21)
        assert np.abs(gray - luma).max() < 3.0, sub
    # restart markers across a 3-component interleave reset ALL DC preds
    _, _, gray = decode_jpeg(
        encode_jpeg(rgb, quality=100, subsampling="420", restart_interval=1)
    )
    assert np.abs(gray - luma).max() < 3.0
    with pytest.raises(ValueError):
        encode_jpeg(rgb, subsampling="422")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), np.uint8), subsampling="444")
