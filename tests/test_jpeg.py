"""Baseline JPEG codec (sources/jpeg.py): adversarial round-trips and
loud-failure contracts, the PNG-codec test pattern (test_formats.py).
The encoder is the decoder's harness; the decoder itself is generic
(tables rebuilt from the stream's DHT), so header-mutation tests prove
the guardrails, not just the happy path."""

from __future__ import annotations

import numpy as np
import pytest

from emails_to_vector_db_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from emails_to_vector_db_spark.sources.multimodal import decode_image


def _gradient(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / (w - 1),
            yy * 255 / (h - 1),
            (xx + yy) * 255 / (w + h - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_flat_image_roundtrips_exactly():
    # a flat block is pure DC: quantization cannot move it
    flat = np.full((16, 16, 3), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(flat))
    assert out.shape == flat.shape
    assert int(np.max(np.abs(out.astype(int) - 120))) <= 1


def test_smooth_gradient_within_quantization_error():
    img = _gradient()
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert int(err.max()) <= 12  # Annex-K luma quantization bound-ish
    assert float(err.mean()) <= 4.0


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (17, 19, 3)


def test_checkerboard_exercises_zrl_run_coding():
    """±amplitude checkerboard concentrates energy in the (7,7) basis —
    zigzag index 63 — forcing three ZRL (16-zero-run) symbols per block
    before the coefficient; a broken run path would shear the pattern."""
    yy, xx = np.mgrid[0:16, 0:16]
    img = (128 + 40 * ((-1.0) ** (xx + yy))).clip(0, 255)
    img = np.repeat(img[..., None], 3, axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img)).astype(float) - 128.0
    ref = img.astype(float) - 128.0
    # sign pattern must correlate strongly with the original
    corr = float(np.mean(np.sign(out[..., 0]) == np.sign(ref[..., 0])))
    assert corr > 0.9


def test_decode_image_dispatch_handles_jpeg():
    img = _gradient(8, 8)
    out = decode_image(encode_jpeg(img))
    assert out.shape == (8, 8, 3)


def test_progressive_marker_rejected():
    enc = bytearray(encode_jpeg(_gradient(8, 8)))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(enc))


def test_subsampled_stream_rejected():
    enc = bytearray(encode_jpeg(_gradient(8, 8)))
    i = bytes(enc).find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) then (id, samp, tq)*
    enc[i + 2 + 2 + 5 + 1 + 1] = 0x22  # Y component sampling 2x2
    with pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(enc))


def test_truncated_stream_rejected():
    enc = encode_jpeg(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) - 30])


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"P6 1 1 255 abc")


def test_truncated_after_ff_rejected_as_truncation():
    """An entropy stream whose LAST byte is 0xFF must raise the
    truncation ValueError, not IndexError on the destuffing
    lookahead."""
    from emails_to_vector_db_spark.sources.jpeg import _BitReader

    br = _BitReader(b"\x12\xff", 0)
    br.bits(8)  # consumes 0x12
    with pytest.raises(ValueError, match="truncated"):
        br.bits(8)  # 0xFF with no lookahead byte


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    marker; a conformant foreign encoder using them must still parse."""
    img = _gradient(8, 8)
    enc = encode_jpeg(img)
    # inject fill bytes before the SOF0 marker: FF C0 -> FF FF FF C0
    i = enc.find(b"\xff\xc0")
    padded = enc[:i] + b"\xff\xff" + enc[i:]
    out = decode_jpeg(padded)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, decode_jpeg(enc))


def test_property_smooth_images_bounded_error():
    """Property sweep: random low-frequency images (flat base + ramp)
    across sizes/phases round-trip within the quantization bound."""
    rng = np.random.default_rng(99)
    for trial in range(12):
        h = int(rng.integers(4, 30))
        w = int(rng.integers(4, 30))
        base = rng.integers(30, 220, size=3)
        slope = rng.uniform(-2.0, 2.0, size=3)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(
            base[None, None, :] + slope[None, None, :] * (xx + yy)[..., None],
            0,
            255,
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        err = np.abs(out.astype(int) - img.astype(int))
        assert out.shape == img.shape
        assert int(err.max()) <= 24, (trial, h, w, int(err.max()))
        assert float(err.mean()) <= 6.0
