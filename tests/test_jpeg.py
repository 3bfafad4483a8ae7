"""Baseline-JPEG codec tests (core/jpeg.py — pure T.81 spec, no Pillow).

The encoder is the fixture side: it emits spec-conformant streams with
per-image canonical Huffman tables, so the decoder's marker walk, DHT/DQT
table construction, bit unstuffing, MCU interleave, restart handling,
dequant/IDCT and chroma upsampling are all exercised against
independently-computed pixels."""

from __future__ import annotations

import numpy as np
import pytest

from x5_ner_spark.core.jpeg import (
    _A,
    _extend,
    _magnitude,
    _zigzag_order,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.minimum(yy * 5 + xx * 3, 255), np.minimum(yy * 2 + 40, 255),
         np.minimum(xx * 7 + 10, 255)],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_is_the_spec_walk():
    zz = _zigzag_order()
    # spec anchors: DC first, then (0,1), (1,0), (2,0), (1,1), (0,2), ...
    assert zz[0, 0] == 0 and zz[0, 1] == 1 and zz[1, 0] == 2
    assert zz[2, 0] == 3 and zz[1, 1] == 4 and zz[0, 2] == 5
    assert zz[7, 7] == 63
    assert sorted(zz.reshape(-1).tolist()) == list(range(64))


def test_dct_matrix_orthonormal():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)


def test_magnitude_and_extend_are_inverse():
    for v in list(range(-300, 301)) + [1023, -1023]:
        size, bits = _magnitude(v)
        assert _extend(bits, size) == v


def test_roundtrip_444_smooth_image_small_error():
    img = _gradient(24, 20)  # non-multiple-of-8 width -> crop path
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.max() <= 8 and err.mean() < 2.5


def test_roundtrip_420_and_restart_markers():
    img = _gradient(24, 20)
    base = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    rst = decode_jpeg(encode_jpeg(img, subsampling="4:2:0", restart_interval=1))
    # restart layout must not change pixels at all
    assert (base == rst).all()
    err = np.abs(base.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4


def test_unit_quant_noise_near_lossless():
    """All-ones quant tables: the only loss left is coefficient rounding +
    color-transform float error — bounded even on pure noise."""
    ones = np.ones((8, 8), dtype=np.uint8)
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quant_luma=ones, quant_chroma=ones))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 4


def test_grayscale_single_component():
    g = (np.add.outer(np.arange(24) * 7, np.arange(20) * 5) % 200).astype(np.uint8)
    ones = np.ones((8, 8), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(g, quant=ones))
    assert out.shape == (24, 20, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 1] == out[:, :, 2]).all()
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_flat_block_is_exact_dc_only():
    flat = np.full((8, 8, 3), 128, dtype=np.uint8)
    data = encode_jpeg(flat)
    assert (decode_jpeg(data) == flat).all()
    # a flat 128 block is all-zero coefficients -> tiny stream
    assert len(data) < 400


def test_progressive_rejected():
    img = _gradient(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(data))


def test_byte_stuffing_roundtrip():
    """Images whose entropy stream contains 0xFF bytes must unstuff
    correctly — white noise reliably produces them."""
    ones = np.ones((8, 8), dtype=np.uint8)
    rng = np.random.RandomState(123)
    for _ in range(3):
        img = rng.randint(0, 256, (8, 16, 3), dtype=np.uint8)
        data = encode_jpeg(img, quant_luma=ones, quant_chroma=ones)
        out = decode_jpeg(data)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_through_extract_features(spark):
    from x5_ner_spark.core import media as M
    from x5_ner_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    img = _gradient(16, 16)
    payload = encode_jpeg(img, subsampling="4:2:0")
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/jpeg", 16, 16, None)],
        MEDIA_SCHEMA,
    )
    row = extract_features(df, decode="real").collect()[0]
    want = M.image_feature(decode_jpeg(payload))
    assert np.allclose(np.array(row["feature"]), np.array(want), atol=1e-6)
