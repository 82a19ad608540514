"""Multimodal plumbing: binary payload column + Arrow-batched
mapInPandas feature extraction (the decode itself is a deterministic
stub; the Spark-side schema/batching is the part under test)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark_airflow_weather_etl_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
)


def test_extract_features_roundtrip(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 700), (2, "bytes")],
        ["doc_id", "text"],
    )
    out = {r.asset_id: r for r in extract_features(attach_payload(docs)).collect()}
    assert out[0].media_type == "image"
    assert out[1].media_type == "audio"
    assert out[2].media_type == "video"
    assert out[1].n_bytes == 700
    assert out[1].width == 700 % 640 + 16
    assert out[1].height == (700 * 7) % 480 + 16
    assert out[0].checksum == hashlib.md5(b"hello world").hexdigest()


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def _assets(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "payload bytes " * (10 + i)) for i in range(12)],
        ["doc_id", "text"],
    )
    return attach_payload(docs)


def test_resize_only_touches_images(spark):
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        resize_images,
    )

    assets = _assets(spark)
    out = resize_images(assets, max_bytes=64).collect()
    n_images = assets.where("media_type = 'image'").count()
    assert len(out) == n_images
    assert all(len(r.payload) <= 64 for r in out)
    assert all(16 <= r.width < 656 and 16 <= r.height < 496 for r in out)


def test_frame_sample_row_multiplying(spark):
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        sample_frames,
    )

    assets = _assets(spark)
    out = sample_frames(assets, frame_bytes=50, every=2).collect()
    vids = {r.asset_id: r.payload for r in
            assets.where("media_type = 'video'").collect()}
    assert {r.asset_id for r in out} <= set(vids)
    for r in out:
        b = bytes(vids[r.asset_id])
        assert bytes(r.frame) == b[r.frame_idx * 50:(r.frame_idx + 1) * 50]
        assert r.frame_idx % 2 == 0


def test_decode_ppm_reference():
    """The dependency-free netpbm decoder against the committed
    fixture asset: header (with comment) parses, sample plane is
    complete, and truncation/garbage raise."""
    import pathlib

    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        decode_ppm,
    )

    data = pathlib.Path("fixtures/asset_4x3.ppm").read_bytes()
    w, h, pixels = decode_ppm(data)
    assert (w, h) == (4, 3)
    assert len(pixels) == 4 * 3 * 3
    assert pixels[:3] == bytes([0, 7, 14])  # (x=0,y=0) of the formula
    with pytest.raises(ValueError):
        decode_ppm(data[:-1])  # truncated plane
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")  # wrong magic
    # P5 (grayscale): one channel per sample
    w5, h5, px5 = decode_ppm(b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4]))
    assert (w5, h5, px5) == (2, 2, bytes([1, 2, 3, 4]))


def test_extract_features_real_ppm_decode(spark):
    """The NON-fake branch of extract_features runs end-to-end in CI:
    real header decode inside the Arrow batch, fake branch untouched."""
    import hashlib
    import pathlib

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        extract_features,
    )

    data = pathlib.Path("fixtures/asset_4x3.ppm").read_bytes()
    assets = spark.createDataFrame(
        [(1, "image", bytearray(data)), (2, "image", bytearray(data))],
        "asset_id long, media_type string, payload binary",
    )
    rows = {
        r.asset_id: r
        for r in extract_features(assets, decode="ppm").collect()
    }
    assert rows[1].width == 4 and rows[1].height == 3
    assert rows[1].n_bytes == len(data)
    assert rows[1].checksum == hashlib.md5(data).hexdigest()
    assert rows[2].width == 4  # batch path, not a single-row special case


def test_box_downsample_hand_computed():
    """The real resize kernel against a hand-computable image: a 4x2
    P6 whose 2x2 blocks average to exactly known bytes (floor-mean),
    odd trailing columns cropped, P5 single-channel path, and the
    degenerate too-small / bad-factor errors."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        box_downsample_ppm,
        decode_ppm,
        encode_ppm,
    )

    # rows: (10,20,30)(40,50,60)(70,80,90)(100,110,120)
    #       ( 2, 4, 6)( 8,10,12)(14,16,18)( 20, 22, 24)
    px = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120,
         2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24]
    )
    out = box_downsample_ppm(encode_ppm(4, 2, px), factor=2)
    w, h, opx = decode_ppm(out)
    # block(0,0): ch0 floor((10+40+2+8)/4)=15, ch1 (20+50+4+10)//4=21,
    # ch2 (30+60+6+12)//4=27; block(1,0): (70+100+14+20)//4=51,
    # (80+110+16+22)//4=57, (90+120+18+24)//4=63
    assert (w, h) == (2, 1)
    assert opx == bytes([15, 21, 27, 51, 57, 63])
    # P5: single channel
    g = box_downsample_ppm(
        encode_ppm(2, 2, bytes([1, 2, 3, 5]), channels=1), factor=2
    )
    assert decode_ppm(g) == (1, 1, bytes([2]))  # (1+2+3+5)//4
    # trailing odd column cropped: 3x2 -> 1x1 from the left 2x2 block
    c = box_downsample_ppm(
        encode_ppm(3, 2, bytes(range(18))), factor=2
    )
    assert decode_ppm(c)[:2] == (1, 1)
    with pytest.raises(ValueError):
        box_downsample_ppm(encode_ppm(1, 1, bytes([1, 2, 3])), factor=2)
    with pytest.raises(ValueError):
        box_downsample_ppm(encode_ppm(2, 2, bytes(12)), factor=0)


def test_split_ppm_frames_demux():
    """Real demux of a concatenated-netpbm stream: frames of DIFFERENT
    sizes are found by header parsing (fixed-size chunking would split
    them wrong); truncation and garbage raise."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        encode_ppm,
        split_ppm_frames,
    )

    f0 = encode_ppm(2, 1, bytes([1, 2, 3, 4, 5, 6]))
    f1 = encode_ppm(1, 1, bytes([7]), channels=1)  # P5, different size
    f2 = encode_ppm(2, 2, bytes(range(12)))
    assert split_ppm_frames(f0 + f1 + f2) == [f0, f1, f2]
    with pytest.raises(ValueError):
        split_ppm_frames(f0 + f1[:-1])  # truncated tail frame
    with pytest.raises(ValueError):
        split_ppm_frames(f0 + b"JFIF")  # garbage between frames


def test_resize_images_real_ppm_path(spark):
    """resize_images(decode='ppm') decodes, downsamples, re-encodes —
    verified against a driver-side replay of the same kernel — and
    non-netpbm payloads fall back to the fake truncation path."""
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_ppm_images,
        box_downsample_ppm,
        decode_ppm,
        resize_images,
    )

    docs = spark.createDataFrame(
        [(i, "unused") for i in range(9)], ["doc_id", "text"]
    )
    assets = attach_ppm_images(docs, width=8, height=6)
    src = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    assert set(src) == {0, 3, 6}
    assert decode_ppm(src[3])[:2] == (8, 6)
    out = {
        r.asset_id: r
        for r in resize_images(assets, decode="ppm", factor=2).collect()
    }
    for aid, b in src.items():
        want = box_downsample_ppm(b, 2)
        assert bytes(out[aid].payload) == want
        assert (out[aid].width, out[aid].height) == (4, 3)
    # a non-netpbm payload in ppm mode: fake truncation fallback
    mixed = spark.createDataFrame(
        [(99, "image", bytearray(b"JFIF" + bytes(300)))],
        "asset_id long, media_type string, payload binary",
    )
    r = resize_images(mixed, max_bytes=64, decode="ppm").collect()[0]
    assert len(r.payload) == 64 and r.width == 64 % 640 + 16


def test_sample_frames_real_ppm_path(spark):
    """sample_frames(decode='ppm') emits every 4th COMPLETE frame as a
    standalone netpbm payload with stream-position indexes; frame
    count varies per asset; non-netpbm falls back to the chunker."""
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_ppm_videos,
        sample_frames,
        split_ppm_frames,
    )

    docs = spark.createDataFrame(
        [(i, "unused") for i in range(12)], ["doc_id", "text"]
    )
    assets = attach_ppm_videos(docs)  # doc_id % 3 == 2 -> 2, 5, 8, 11
    src = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    out = sample_frames(assets, every=4, decode="ppm").collect()
    got = {(r.asset_id, r.frame_idx): bytes(r.frame) for r in out}
    for aid, payload in src.items():
        frames = split_ppm_frames(payload)
        assert len(frames) == aid % 7 + 1
        want_idx = list(range(0, len(frames), 4))
        assert sorted(i for a, i in got if a == aid) == want_idx
        for i in want_idx:
            assert got[(aid, i)] == frames[i]
    # doc 5 has 6 frames -> keeps 0 and 4; doc 2 has 3 -> keeps only 0
    assert (5, 4) in got and (2, 4) not in got


def _ref_wav(samples, rate=8000, channels=1, extra_chunk=False):
    """Reference WAV builder (pure struct packing, independent of the
    engine's synthesis path)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    pre = b""
    if extra_chunk:
        pre = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    )
    body = fmt + pre + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_decode_wav_reference():
    """Header walk + sample plane vs hand-built WAVs: chunk padding,
    LIST chunks before data, stereo interleave, and every malformed
    shape raising instead of mis-featurizing."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        decode_wav,
    )

    ch, rate, bits, s = decode_wav(_ref_wav([0, 100, -100, 32767, -32768]))
    assert (ch, rate) == (1, 8000)
    assert list(s) == [0, 100, -100, 32767, -32768]
    # an odd-sized LIST chunk (with pad byte) before data must be
    # skipped by the chunk walk, not break the offsets
    ch, rate, bits, s = decode_wav(_ref_wav([7, -7], extra_chunk=True))
    assert list(s) == [7, -7]
    # stereo interleave comes back flat, whole frames only
    ch, rate, bits, s = decode_wav(_ref_wav([1, 2, 3, 4], channels=2))
    assert ch == 2 and list(s) == [1, 2, 3, 4]
    for bad in (
        b"RIFX" + b"\x00" * 40,                      # wrong magic
        b"RIFF" + (4).to_bytes(4, "little") + b"AIFF",  # not WAVE
        _ref_wav([1, 2])[:-1],                        # truncated data
    ):
        with pytest.raises(ValueError):
            decode_wav(bad)
    # non-PCM format code refuses
    nonpcm = bytearray(_ref_wav([1]))
    nonpcm[20] = 3  # IEEE float format
    with pytest.raises(ValueError):
        decode_wav(bytes(nonpcm))


def test_audio_features_real_wav_path(spark):
    """audio_features(decode='wav') over the JVM-synthesized fixture
    equals a pure-Python replay of decode + integer feature math; the
    synthesized payload itself round-trips through the reference
    decoder (proving _wav_hex_expr emits REAL RIFF bytes); non-WAV
    payloads fall back to the fake featurizer."""
    import math

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_payload,
        attach_wav_audio,
        audio_features,
        decode_wav,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    assets = attach_wav_audio(docs)
    row = assets.first()
    ch, rate, bits, samples = decode_wav(bytes(row.payload))
    assert (ch, rate, len(samples)) == (1, 8000, 480)
    d = row.asset_id
    assert list(samples[:3]) == [
        (d * 7 + i * 13) % 65536 - (
            65536 if (d * 7 + i * 13) % 65536 >= 32768 else 0
        )
        for i in range(3)
    ]
    got = {r.asset_id: r for r in audio_features(assets, decode="wav").collect()}
    for aid, payload in [(r.asset_id, bytes(r.payload))
                         for r in assets.collect()]:
        _, _, _, s = decode_wav(payload)
        ss = int(sum(int(v) * int(v) for v in s))
        r = got[aid]
        assert r.sum_sq == ss
        assert r.peak == max(abs(int(v)) for v in s)
        assert r.duration_ms == 60
        assert r.rms_micro == int(math.sqrt(ss / 480) * 1e6)
    # fake fallback: text-bytes "audio" assets are not RIFF
    fake_assets = attach_payload(docs).where("media_type = 'audio'")
    fb = audio_features(fake_assets, decode="wav").first()
    assert fb.sample_rate == 16000  # the fake featurizer's signature
    import pytest

    with pytest.raises(ValueError):
        audio_features(assets, decode="mp3")


def test_resample_audio_real_wav_path(spark):
    """resample_audio(decode='wav'): 4× decimation keeps exactly
    every 4th frame (verified against the reference decoder on both
    sides), re-encodes a valid WAV at rate/4, refuses non-dividing
    factors, handles stereo frame-wise, and falls back to the fake
    chunker on non-WAV payloads."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_payload,
        attach_wav_audio,
        decode_wav,
        resample_audio,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    assets = attach_wav_audio(docs)
    out = {r.asset_id: r for r in
           resample_audio(assets, factor=4, decode="wav").collect()}
    for r in assets.collect():
        _, rate, _, s = decode_wav(bytes(r.payload))
        got = out[r.asset_id]
        assert got.sample_rate == rate // 4
        ch2, rate2, _, s2 = decode_wav(bytes(got.payload))
        assert (ch2, rate2) == (1, rate // 4)
        assert list(s2) == list(s[::4])
    # stereo: decimation is frame-wise, channels stay interleaved
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        encode_wav,
    )

    stereo = encode_wav([1, 2, 3, 4, 5, 6, 7, 8], 8000, 2)
    sdf = spark.createDataFrame(
        [(0, "audio", bytearray(stereo))],
        "asset_id long, media_type string, payload binary",
    )
    row = resample_audio(sdf, factor=2, decode="wav").first()
    _, _, _, ss = decode_wav(bytes(row.payload))
    assert list(ss) == [1, 2, 5, 6]
    # non-dividing factor refuses
    with pytest.raises(Exception):
        resample_audio(sdf, factor=3, decode="wav").collect()
    # non-WAV payloads fall back to the fake chunker
    fake = attach_payload(docs).where("media_type = 'audio'")
    fb = resample_audio(fake, factor=4, decode="wav").first()
    assert fb.sample_rate == 4000


def test_decode_wav_multi_depth_roundtrip():
    """8/24/32-bit integer PCM round-trips through encode_wav →
    decode_wav (VERDICT r13 #4): 8-bit re-centers through the spec's
    unsigned storage, 24-bit packs/sign-extends 3-byte LE frames,
    32-bit maps straight; an unheard-of depth still refuses."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    cases = {
        8: [0, 1, -1, 127, -128],
        24: [0, 1, -1, 8388607, -8388608, 70000, -70000],
        32: [0, 1, -1, 2147483647, -2147483648, 1 << 24, -(1 << 24)],
    }
    for bits, vals in cases.items():
        payload = encode_wav(vals, 8000, 1, bits)
        ch, rate, got_bits, s = decode_wav(payload)
        assert (ch, rate, got_bits) == (1, 8000, bits)
        assert list(s) == vals, bits
        # stereo frames too
        payload = encode_wav(vals[:4], 8000, 2, bits)
        ch, _, _, s = decode_wav(payload)
        assert ch == 2 and list(s) == vals[:4]
    with pytest.raises(ValueError):
        encode_wav([0], 8000, 1, 12)
    # a claimed 12-bit payload refuses at decode
    bad = bytearray(encode_wav([0, 0], 8000, 1, 16))
    bad[34] = 12  # bits_per_sample field
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_audio_features_24bit_fixture(spark):
    """The width-parameterized fixture at bits=24: payloads decode
    through the reference path with sign extension actually
    triggering, and audio_features matches a pure-Python replay —
    the engine half of the multimodal_audio_features_24bit oracle."""
    import math

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_wav_audio,
        audio_features,
        decode_wav,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    assets = attach_wav_audio(docs, bits=24)
    rows = assets.collect()
    any_negative = False
    got = {
        r.asset_id: r
        for r in audio_features(assets, decode="wav").collect()
    }
    for r in rows:
        ch, rate, bits, s = decode_wav(bytes(r.payload))
        assert (ch, rate, bits, len(s)) == (1, 8000, 24, 480)
        d = r.asset_id
        want = [
            (d * 7 + i * 13) * 40503 % 16777216 for i in range(480)
        ]
        want = [v - 16777216 if v >= 8388608 else v for v in want]
        assert list(s) == want
        any_negative = any_negative or any(v < 0 for v in want)
        ss = sum(v * v for v in want)
        g = got[d]
        assert g.sum_sq == ss
        assert g.peak == max(abs(v) for v in want)
        assert g.rms_micro == int(math.sqrt(ss / 480) * 1e6)
    assert any_negative  # sign extension actually exercised


def test_resample_preserves_bit_depth(spark):
    """resample_audio re-encodes at the INPUT's bit depth — a 24-bit
    archive decimated must not silently clip to 16."""
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        attach_wav_audio,
        decode_wav,
        resample_audio,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    assets = attach_wav_audio(docs, bits=24)
    out = resample_audio(assets, factor=4, decode="wav").collect()
    src = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    for r in out:
        _, _, _, s_in = decode_wav(src[r.asset_id])
        ch, rate, bits, s_out = decode_wav(bytes(r.payload))
        assert (ch, rate, bits) == (1, 2000, 24)
        assert list(s_out) == list(s_in[::4])
