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
