"""Pure-stdlib media codec laws (operators/multimodal.py).

These run without Spark: encode→decode round-trips for the real
uncompressed codecs (24-bpp BMP, binary PPM, RIFF/WAV), including the
row-padding edge cases that make BMP parsing non-trivial.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_data_eng_proj_spark.operators.multimodal import (
    bmp_stride,
    decode_audio,
    decode_image,
    encode_bmp,
    encode_wav,
)


@given(
    width=st.integers(1, 64),
    height=st.integers(1, 32),
    fill=st.integers(0, 255),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip(width, height, fill):
    payload = encode_bmp(width, height, fill)
    assert len(payload) == 54 + bmp_stride(width) * height
    f = decode_image(payload)
    assert (f["format"], f["width"], f["height"]) == ("bmp", width, height)
    # mean over pixel bytes only — zero padding must be excluded
    assert f["mean_pixel"] == float(fill)


def test_bmp_padding_is_excluded():
    # width 1 → 3 pixel bytes + 1 padding byte per row; a naive
    # whole-row mean would be 255*3/4, not 255
    f = decode_image(encode_bmp(1, 4, 255))
    assert f["mean_pixel"] == 255.0


def test_ppm_roundtrip():
    raster = bytes(range(12))  # 2×2 RGB
    payload = b"P6\n2 2\n255\n" + raster
    f = decode_image(payload)
    assert (f["format"], f["width"], f["height"]) == ("ppm", 2, 2)
    assert f["mean_pixel"] == sum(raster) / 12


def test_unsupported_image_rejected():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


@given(
    n_samples=st.integers(0, 1000),
    amplitude=st.integers(-32768, 32767),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip(n_samples, amplitude, rate):
    payload = encode_wav(n_samples, amplitude, rate)
    assert len(payload) == 44 + 2 * n_samples  # canonical header
    f = decode_audio(payload)
    assert f["n_channels"] == 1
    assert f["sample_rate"] == rate
    assert f["n_samples"] == n_samples
    assert f["duration_ms"] == n_samples * 1000 // rate
    if n_samples:
        assert f["peak_amp"] == amplitude
