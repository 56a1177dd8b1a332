"""Real WAV/BMP codecs: byte-level format checks, round-trip decode vs
analytic values, padding edge cases, and the Arrow mapInPandas feature
extractors end to end."""

import struct

import numpy as np
import pytest

from bcdc2bcdc_spark.multimodal import (
    audio_features,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_features,
    synth_bmp_pixels,
    synth_bmp_table,
    synth_wav_samples,
    synth_wav_table,
)


def test_wav_round_trip_exact():
    s = synth_wav_samples(17)
    blob = encode_wav(s, sample_rate=16000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"  # real container
    d = decode_wav(blob)
    assert d["n_channels"] == 1
    assert d["sample_rate"] == 16000
    assert d["n_samples"] == len(s)
    assert d["sample_min"] == int(s.min())
    assert d["sample_max"] == int(s.max())
    assert d["sample_sum"] == int(s.sum(dtype=np.int64))


def test_wav_rejects_unsupported_width():
    blob = bytearray(encode_wav(synth_wav_samples(3)))
    # patch BitsPerSample (offset 34 in a canonical 44-byte header) to 8
    blob[32:36] = struct.pack("<HH", 1, 8)
    with pytest.raises(Exception):
        decode_wav(bytes(blob))


@pytest.mark.parametrize("mid", [0, 1, 7, 28, 100])  # widths incl. padded rows
def test_bmp_round_trip_exact(mid):
    px = synth_bmp_pixels(mid)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    h, w, _ = px.shape
    # header really carries the dims at the standard offsets
    assert struct.unpack_from("<ii", blob, 18) == (w, h)
    d = decode_bmp(blob)
    assert (d["width"], d["height"]) == (w, h)
    assert d["sum_r"] == int(px[:, :, 0].sum(dtype=np.int64))
    assert d["sum_g"] == int(px[:, :, 1].sum(dtype=np.int64))
    assert d["sum_b"] == int(px[:, :, 2].sum(dtype=np.int64))


def test_bmp_padding_bytes_present():
    # width 5 → row 15 bytes → stride 16: encoder must pad, decoder skip
    px = np.zeros((2, 5, 3), dtype=np.uint8)
    px[0, 0] = (9, 8, 7)
    blob = encode_bmp(px)
    off = struct.unpack_from("<I", blob, 10)[0]
    assert (len(blob) - off) == 2 * 16
    d = decode_bmp(blob)
    assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (9, 8, 7)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG...nope")


def test_spark_audio_features_match_analytic(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    out = audio_features(synth_wav_table(ids)).collect()
    assert len(out) == 40
    for r in out:
        s = synth_wav_samples(r["media_id"])
        assert r["n_samples"] == len(s)
        assert r["sample_sum"] == int(s.sum(dtype=np.int64))
        assert r["sample_min"] == int(s.min())


def test_spark_image_features_match_analytic(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    out = image_features(synth_bmp_table(ids)).collect()
    assert len(out) == 40
    for r in out:
        px = synth_bmp_pixels(r["media_id"])
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["sum_g"] == int(px[:, :, 1].sum(dtype=np.int64))


# ---------------------------------------------------------------------------
# property tests: arbitrary payloads round-trip bit-exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_round_trip_property(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    d = decode_wav(encode_wav(arr, sample_rate=rate))
    assert d["sample_rate"] == rate
    assert d["n_samples"] == len(arr)
    assert d["sample_sum"] == int(arr.sum(dtype=np.int64))
    if len(arr):
        assert d["sample_min"] == int(arr.min())
        assert d["sample_max"] == int(arr.max())


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_round_trip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    d = decode_bmp(encode_bmp(px))
    assert (d["width"], d["height"]) == (w, h)
    for i, ch in enumerate(("sum_r", "sum_g", "sum_b")):
        assert d[ch] == int(px[:, :, i].sum(dtype=np.int64))


def test_bmp_top_down_variant_and_truncation():
    # top-down BMP: biHeight negative, rows stored top-first — a standard
    # valid variant the decoder must flip correctly
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    blob = bytearray(encode_bmp(px))
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    # stored bottom-up by the encoder; negative height says read top-down →
    # decoded image is vertically flipped, channel sums unchanged
    d = decode_bmp(bytes(blob))
    assert (d["width"], d["height"]) == (4, 2)
    assert d["sum_g"] == int(px[:, :, 1].sum(dtype=np.int64))

    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(encode_bmp(px))[:-5])
