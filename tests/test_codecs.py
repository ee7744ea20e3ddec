"""Tests for the pure-stdlib PNG / WAV codecs and their Spark stages.

The PNG decoder is checked by encode→decode round-trips over every
filter type and channel count, plus a cross-check of the WAV codec
against the stdlib ``wave`` module (an independent reference
implementation).  The Spark stages are checked end-to-end against
numpy-computed ground truth from the doc_id formulas.
"""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from kafkastreamsinteractivequeries_spark.functions.codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav_pcm16,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape", [(1, 1), (4, 5), (7, 3, 1), (9, 6, 2), (8, 8, 3), (5, 4, 4), (16, 2, 3)]
)
def test_png_roundtrip_all_shapes(shape):
    a = _rand(shape, seed=sum(shape))
    want = a[:, :, None] if a.ndim == 2 else a
    got = decode_png(encode_png(a))
    assert got.shape == want.shape and (got == want).all()


@pytest.mark.parametrize("ft", range(5))
def test_png_every_filter_type(ft):
    # gradient + noise stresses Sub/Up/Average/Paeth reconstruction
    base = np.add.outer(np.arange(11) * 7, np.arange(13) * 3) % 256
    a = ((base[:, :, None] + _rand((11, 13, 3), seed=ft)) % 256).astype(np.uint8)
    got = decode_png(encode_png(a, filter_for_row=lambda y: ft))
    assert (got == a).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"IMG0" + b"\x00" * 20)
    # 16-bit depth is out of scope and must fail loudly, not silently
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    payload = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(payload)


def test_wav_roundtrip_and_stdlib_cross_check():
    rng = np.random.default_rng(11)
    s = (rng.integers(0, 65536, size=5 * 2) - 32768).astype(np.int16)
    payload = encode_wav_pcm16(s, 22050, 2)
    rate, ch, got = decode_wav(payload)
    assert (rate, ch) == (22050, 2) and (got == s).all()
    # the stdlib wave module is an independent reference decoder
    wf = wave.open(io.BytesIO(payload))
    assert wf.getframerate() == 22050 and wf.getnchannels() == 2
    ref = np.frombuffer(wf.readframes(wf.getnframes()), "<i2")
    assert (ref == s).all()


def test_wav_skips_unknown_chunks():
    s = np.arange(-3, 4, dtype=np.int16)
    payload = bytearray(encode_wav_pcm16(s, 8000, 1))
    # splice an unknown odd-length chunk after 'WAVE' (word-aligned pad)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    payload[12:12] = extra
    import struct

    struct.pack_into("<I", payload, 4, len(payload) - 8)
    rate, ch, got = decode_wav(bytes(payload))
    assert rate == 8000 and ch == 1 and (got == s).all()


def test_decode_image_png_path_needs_no_pillow():
    from kafkastreamsinteractivequeries_spark.operators.multimodal import decode_image

    a = _rand((6, 7, 3), seed=42)
    got = decode_image(encode_png(a))
    assert (np.asarray(got) == a).all()


def test_png_pixel_features_spark(spark):
    from kafkastreamsinteractivequeries_spark.operators.multimodal import (
        png_assets_from_documents,
        png_pixel_features,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 2, 5, 12, 499)], "doc_id long, text string"
    )
    rows = {
        r.asset_id: r
        for r in png_pixel_features(png_assets_from_documents(docs)).collect()
    }
    assert set(rows) == {0, 1, 2, 5, 12, 499}
    for doc_id, r in rows.items():
        w, h, ch = 4 + doc_id % 13, 4 + (doc_id * 7) % 11, 1 + doc_id % 3
        vals = (doc_id * 31 + np.arange(w * h * ch)) % 256
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert r.pixel_min == int(vals.min()) and r.pixel_max == int(vals.max())
        assert r.pixel_mean == (int(vals.sum()) * 1_000_000 // vals.size) / 1e6


def test_wav_sample_features_spark(spark):
    from kafkastreamsinteractivequeries_spark.operators.multimodal import (
        wav_assets_from_documents,
        wav_sample_features,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 3, 7, 96, 250)], "doc_id long, text string"
    )
    rows = {
        r.asset_id: r
        for r in wav_sample_features(wav_assets_from_documents(docs)).collect()
    }
    for doc_id, r in rows.items():
        frames, ch = 64 + doc_id % 97, 1 + doc_id % 2
        v = ((doc_id * 13 + np.arange(frames * ch) * 7) % 65536) - 32768
        assert (r.sample_rate, r.n_channels, r.n_frames) == (
            8000 + (doc_id % 8) * 1000, ch, frames,
        )
        assert r.peak == int(np.abs(v).max())
        shifted = (int((v + 32768).sum()) * 1_000_000 // v.size) / 1e6
        assert r.sample_mean == shifted - 32768.0
        assert r.sample_rms == math.floor(math.sqrt(int((v * v).sum()) / v.size) * 1e6) / 1e6


def test_apng_roundtrip_multiframe():
    from kafkastreamsinteractivequeries_spark.functions.codecs import (
        decode_apng,
        encode_apng,
    )

    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        frames = [
            rng.integers(0, 256, size=(6, 8, ch), dtype=np.uint8) for _ in range(4)
        ]
        got = decode_apng(encode_apng(frames))
        assert len(got) == 4
        assert all((g == f).all() for g, f in zip(got, frames))


def test_apng_plain_png_is_single_frame():
    from kafkastreamsinteractivequeries_spark.functions.codecs import (
        decode_apng,
        encode_png,
    )

    a = _rand((5, 5, 3), seed=9)
    got = decode_apng(encode_png(a))
    assert len(got) == 1 and (got[0] == a).all()


def test_apng_frame_features_spark(spark):
    from kafkastreamsinteractivequeries_spark.operators.multimodal import (
        apng_assets_from_documents,
        apng_frame_features,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 2, 7, 11)], "doc_id long, text string"
    )
    rows = apng_frame_features(apng_assets_from_documents(docs)).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for doc_id, frs in by_asset.items():
        nf, w, h, ch = 2 + doc_id % 4, 4 + doc_id % 9, 4 + (doc_id * 3) % 7, 1 + doc_id % 3
        assert len(frs) == nf
        for r in sorted(frs, key=lambda r: r.frame_idx):
            vals = (doc_id * 31 + r.frame_idx * 97 + np.arange(w * h * ch)) % 256
            assert (r.width, r.height, r.channels, r.n_frames) == (w, h, ch, nf)
            assert r.pixel_min == int(vals.min()) and r.pixel_max == int(vals.max())
            assert r.pixel_mean == (int(vals.sum()) * 1_000_000 // vals.size) / 1e6


# ---- property-based round-trips (hypothesis) ----

try:
    from hypothesis import given, settings, strategies as st

    @st.composite
    def _images(draw):
        h = draw(st.integers(1, 12))
        w = draw(st.integers(1, 12))
        ch = draw(st.sampled_from([1, 2, 3, 4]))
        seed = draw(st.integers(0, 2**32 - 1))
        return np.random.default_rng(seed).integers(
            0, 256, size=(h, w, ch), dtype=np.uint8
        )

    @given(_images())
    @settings(max_examples=30, deadline=None)
    def test_png_roundtrip_property(img):
        assert (decode_png(encode_png(img)) == img).all()

    @given(
        st.integers(1, 400),
        st.sampled_from([1, 2]),
        st.integers(1, 192000),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_roundtrip_property(frames, ch, rate, seed):
        s = (
            np.random.default_rng(seed).integers(0, 65536, size=frames * ch) - 32768
        ).astype(np.int16)
        r, c, got = decode_wav(encode_wav_pcm16(s, rate, ch))
        assert (r, c) == (rate, ch) and (got == s).all()

except ImportError:  # pragma: no cover - hypothesis is baked in per TESTDATA.md
    pass


def test_png_resize_features_spark(spark):
    from kafkastreamsinteractivequeries_spark.operators.multimodal import (
        png_assets_from_documents,
        png_resize_features,
        resample_nearest,
    )

    # pure-numpy resample semantics: NN source index = (t*src)//target
    a = np.arange(4 * 6 * 1, dtype=np.uint8).reshape(4, 6, 1)
    small = resample_nearest(a, 3, 2)
    assert small.shape == (2, 3, 1)
    assert (small == a[[0, 2]][:, [0, 2, 4]]).all()

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 4, 9, 12)], "doc_id long, text string"
    )
    rows = {
        r.asset_id: r
        for r in png_resize_features(
            png_assets_from_documents(docs), max_side=8
        ).collect()
    }
    for doc_id, r in rows.items():
        w, h, ch = 4 + doc_id % 13, 4 + (doc_id * 7) % 11, 1 + doc_id % 3
        longest = max(w, h)
        tw, th = (w, h) if longest <= 8 else (
            max(1, w * 8 // longest), max(1, h * 8 // longest)
        )
        full = ((doc_id * 31 + np.arange(w * h * ch)) % 256).astype(np.uint8).reshape(h, w, ch)
        small = resample_nearest(full, tw, th)
        assert (r.target_width, r.target_height) == (tw, th)
        assert r.pixel_min == int(small.min()) and r.pixel_max == int(small.max())
        assert r.pixel_mean == (int(small.sum(dtype='int64')) * 1_000_000 // small.size) / 1e6


def test_ppm_round_trip_and_header_grammar():
    import numpy as np

    from kafkastreamsinteractivequeries_spark.functions.codecs import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comments and arbitrary whitespace in the header
    manual = b"P6 # inline\n# full-line comment\n 2\t2\n255\n" + bytes(range(12))
    out = decode_ppm(manual)
    assert out.shape == (2, 2, 3)
    assert out[1, 1, 2] == 11
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_decode_image_dispatches_ppm(spark):
    import numpy as np

    from kafkastreamsinteractivequeries_spark.functions.codecs import encode_ppm
    from kafkastreamsinteractivequeries_spark.operators.multimodal import decode_image

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    out = decode_image(encode_ppm(img))
    assert np.array_equal(out, img)


def test_pgm_round_trip_and_dispatch(spark):
    import numpy as np

    from kafkastreamsinteractivequeries_spark.functions.codecs import (
        decode_pgm,
        encode_pgm,
    )
    from kafkastreamsinteractivequeries_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(11, 6), dtype=np.uint8)
    assert np.array_equal(decode_pgm(encode_pgm(img)), img)
    assert np.array_equal(decode_image(encode_pgm(img)), img)


def test_apng_roundtrip_matches_two_stage(spark):
    # the fused encode→decode pass (one mapInPandas) must be
    # row-identical to the two-stage composition it replaced
    from kafkastreamsinteractivequeries_spark.operators.multimodal import (
        apng_assets_from_documents,
        apng_frame_features,
        apng_roundtrip_features,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 2, 5, 7, 11, 23)], "doc_id long, text string"
    )
    key = lambda r: (r.asset_id, r.frame_idx)  # noqa: E731
    fused = sorted(apng_roundtrip_features(docs).collect(), key=key)
    staged = sorted(
        apng_frame_features(apng_assets_from_documents(docs)).collect(), key=key
    )
    assert fused == staged
