"""Property-based hardening of the codec-free decode tier
(hypothesis): the per-row error-isolation contract — decode kernels
NEVER raise, they degrade to the (0, 0, zeros) row
(ref: app/Commands.java:76-84) — must hold for arbitrary byte blobs,
including blobs that start with each format's magic bytes; and
round-trips must hold for arbitrary pixel content, not just the
hand-picked test images."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imageduplicatefinder_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from imageduplicatefinder_spark.operators.multimodal import (
    REAL_FEATURE_DIM,
    _auto_decode,
    _bmp_decode,
    _jpeg_decode,
    _png_decode,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
)

_dims = st.integers(min_value=1, max_value=24)


@st.composite
def _gray_images(draw):
    h, w = draw(_dims), draw(_dims)
    flat = draw(
        st.lists(st.integers(0, 255), min_size=h * w, max_size=h * w)
    )
    return np.array(flat, dtype=np.uint8).reshape(h, w)


@settings(max_examples=30, deadline=None)
@given(_gray_images())
def test_bmp_png_roundtrip_exact_any_image(img):
    for enc, dec in ((encode_bmp, decode_bmp), (encode_png, decode_png)):
        w, h, gray = dec(enc(img))
        assert (w, h) == (img.shape[1], img.shape[0])
        # grayscale input: BMP replicates the channel (BT.601 of
        # (v,v,v) == v up to float rounding), PNG stores it directly
        assert np.abs(gray - img).max() < 1e-9


@settings(max_examples=15, deadline=None)
@given(_gray_images())
def test_jpeg_roundtrip_bounded_any_image(img):
    w, h, gray = decode_jpeg(encode_jpeg(img, quality=100))
    assert (w, h) == (img.shape[1], img.shape[0])
    assert np.abs(gray - img).max() < 3.0


_magic = st.sampled_from(
    [b"", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0"]
)


@settings(max_examples=80, deadline=None)
@given(_magic, st.binary(min_size=0, max_size=400))
def test_decode_kernels_never_raise_on_garbage(prefix, blob):
    payload = prefix + blob
    for kernel in (_bmp_decode, _png_decode, _jpeg_decode, _auto_decode):
        w, h, feat = kernel(payload)
        assert feat.shape == (REAL_FEATURE_DIM,)
        if w == 0:
            assert not feat.any()


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.data())
def test_decode_kernels_never_raise_on_corrupted_real_payloads(tail, data):
    """Take a REAL encoded payload, truncate it at an arbitrary point
    and append arbitrary bytes — the kernels must still degrade, never
    raise (this walks error paths deep inside the parsers, past the
    magic check)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    for enc, kernel in (
        (encode_bmp, _bmp_decode),
        (encode_png, _png_decode),
        (encode_jpeg, _jpeg_decode),
    ):
        blob = enc(img)
        cut = data.draw(st.integers(0, len(blob)))
        payload = blob[:cut] + tail
        w, h, feat = kernel(payload)
        assert feat.shape == (REAL_FEATURE_DIM,)
        _auto_decode(payload)


def test_declared_size_bombs_raise_valueerror_not_memoryerror():
    """A tiny payload whose header declares a huge image must fail as
    the contract ValueError BEFORE any large allocation (review
    finding: MemoryError would escape the per-row isolation)."""
    import struct
    import zlib

    import pytest as _pytest

    # JPEG: real blob with SOF dimensions patched to 65535x65535
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof = bytes(blob).find(b"\xff\xc0")
    struct.pack_into(">HH", blob, sof + 5, 0xFFFF, 0xFFFF)
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(blob))

    # PNG: header declaring 2^15 x 2^15 RGB (dimension-product bound)
    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(bomb)

    # PNG: stream decompressing LONGER than the declared size is cut
    # off by the bounded inflate and rejected
    from imageduplicatefinder_spark.operators.multimodal import _PNG_SIG

    real = encode_png(np.zeros((4, 4), np.uint8))
    small_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    lying = (_PNG_SIG + chunk(b"IHDR", small_ihdr)
             + real[real.find(b"IDAT") - 4 : real.find(b"IEND") - 4]
             + chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png(lying)


def test_single_component_jpeg_ignores_declared_sampling_factors():
    """T.81 A.2.2: an Ns=1 scan is non-interleaved; a grayscale JPEG
    declaring 2x2 sampling factors (jpegtran -grayscale shape) must
    decode identically to the 1x1 declaration."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    blob = bytearray(encode_jpeg(img, quality=100))
    sof = bytes(blob).find(b"\xff\xc0")
    assert blob[sof + 11] == 0x11  # (h<<4)|v of component 1
    base = decode_jpeg(bytes(blob))[2]
    blob[sof + 11] = 0x22
    w, h, patched = decode_jpeg(bytes(blob))
    assert (w, h) == (40, 24)
    assert np.array_equal(patched, base)


def test_gray_content_decodes_bit_identically_across_codecs():
    """True-gray pixels must produce bit-identical luminance planes
    through the BMP (BGR replicate) and PNG (gray channel) paths — the
    invariant the mixed-format media query relies on (1-ulp weighted-
    sum drift could flip pHash bits on exact DCT/median ties)."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    _, _, via_bmp = decode_bmp(encode_bmp(img))
    _, _, via_png = decode_png(encode_png(img))
    assert np.array_equal(via_bmp, via_png)
    assert np.array_equal(via_bmp, img.astype(np.float64))
    # RGB input with some gray pixels: those pixels exact, rest weighted
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    rgb[0, :] = 77  # a true-gray row
    _, _, g1 = decode_bmp(encode_bmp(rgb))
    _, _, g2 = decode_png(encode_png(rgb))
    assert np.array_equal(g1[0], np.full(8, 77.0))
    assert np.abs(g1 - g2).max() < 1e-9
