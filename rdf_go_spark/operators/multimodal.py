"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Payload synthesis is deterministic from document text, but all THREE
payloads are real container formats — a minimal valid PNG (signature +
IHDR + IEND), a minimal valid RIFF/WAVE file, and a minimal valid
MP4/ISO-BMFF file (ftyp + moov/trak/tkhd + mdat) — and the decoders parse
the actual bytes: PNG IHDR width/height via ``struct`` (big-endian u32 at
offset 16), WAV sample-rate/channels via the stdlib ``wave`` module, and
MP4 width/height by walking the box tree to ``tkhd`` and reading the
16.16 fixed-point dimensions (v0 and v1 layouts, 64-bit largesize
supported). They work unchanged on any genuine PNG/WAV/MP4 — frame
DECODING (pixels/samples) would need ffmpeg/pillow, which this container
lacks; header/metadata extraction is the real implemented surface.
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), False),    # opaque bytes
    StructField("mime", StringType(), False),
])

META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("magic", StringType(), False),      # first 4 bytes hex
    StructField("width", IntegerType(), True),      # parsed from headers
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),  # audio only
    StructField("channels", IntegerType(), True),     # audio only
])

_PNG_SIG = "89504e470d0a1a0a"
_IHDR = "0000000d49484452"
_IHDR_TAIL = "0802000000"          # bit depth 8, truecolor, no interlace
_IEND = "0000000049454e44ae426082"
_WAV_RATES = [8000, 16000, 22050, 44100]
_WAV_RATE_HEX_LE = ["401f0000", "803e0000", "22560000", "44ac0000"]

# minimal ISO-BMFF skeleton: ftyp(16) + moov(108){trak(100){tkhd(92)}} +
# mdat(16). tkhd v0: width/height are the LAST 8 body bytes (16.16 fixed).
_MP4_FTYP = "00000010" + "66747970" + "69736f6d" + "00000200"
_MP4_MOOV_HDR = "0000006c" + "6d6f6f76"
_MP4_TRAK_HDR = "00000064" + "7472616b"
_MP4_TKHD_HDR = "0000005c" + "746b6864"
_MP4_TKHD_PRE = (
    "00000007"                      # version 0, flags: enabled|movie|preview
    + "00000000" * 2                # creation / modification time
    + "00000001"                    # track ID
    + "00000000"                    # reserved
    + "00000000"                    # duration
    + "00000000" * 2                # reserved[2]
    + "00000000"                    # layer + alternate_group
    + "00000000"                    # volume + reserved
    + "00010000" + "00000000" * 3   # unity matrix
    + "00010000" + "00000000" * 3
    + "40000000")
_MP4_MDAT_HDR = "00000010" + "6d646174"
# file offset of tkhd width: ftyp 16 + hdrs 8*3 + body-pre 76 = 116 bytes
_MP4_WIDTH_OFF_HEXCHARS = 116 * 2 + 1  # 1-indexed substr position = 233


def _lehex16(v: int) -> str:
    return struct.pack("<H", v).hex()


def _lehex32(v: int) -> str:
    return struct.pack("<I", v).hex()


def _behex32(col: Column) -> Column:
    return F.lower(F.lpad(F.hex(col), 8, "0"))


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic payloads derived from document text via md5 bytes:
    images become minimal valid PNGs (real IHDR dims), audio becomes
    minimal valid WAV files (real fmt chunk), video becomes minimal valid
    ISO-BMFF MP4s (real ftyp/moov/trak/tkhd boxes with 16.16 fixed-point
    dims plus an mdat payload) — all three parsed back by the real
    byte-level decoders below."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    h = F.md5(F.col("text"))
    b0 = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    b1 = F.conv(F.substring(h, 3, 2), 16, 10).cast("long")

    width = (F.lit(16) + b0 % 64).cast("long")
    height = (F.lit(16) + b1 % 64).cast("long")
    png_hex = F.concat(
        F.lit(_PNG_SIG), F.lit(_IHDR), _behex32(width), _behex32(height),
        F.lit(_IHDR_TAIL), F.substring(h, 1, 8),  # fake CRC
        F.lit(_IEND))

    n_channels = (F.lit(1) + b0 % 2).cast("int")
    rate_idx = (b1 % 4).cast("int")
    rate_hex = F.element_at(
        F.array(*[F.lit(x) for x in _WAV_RATE_HEX_LE]), rate_idx + 1)
    # byte rate = rate * channels * 2 (16-bit) — 4x2 LE lookup
    brate_hex = F.element_at(
        F.array(*[F.lit(_lehex32(r * c * 2))
                  for r in _WAV_RATES for c in (1, 2)]),
        (rate_idx * 2 + n_channels).cast("int"))
    balign_hex = F.element_at(
        F.array(F.lit(_lehex16(2)), F.lit(_lehex16(4))), n_channels)
    wav_hex = F.concat(
        F.lit("52494646"), F.lit(_lehex32(44)), F.lit("57415645"),
        F.lit("666d7420"), F.lit(_lehex32(16)), F.lit("0100"),
        F.lower(F.lpad(F.hex(n_channels), 2, "0")), F.lit("00"),
        rate_hex, brate_hex, balign_hex, F.lit("1000"),
        F.lit("64617461"), F.lit(_lehex32(8)), F.substring(h, 1, 16))

    vid_w = (F.lit(32) + b0 % 32).cast("long")
    vid_h = (F.lit(32) + b1 % 32).cast("long")
    video_hex = F.concat(
        F.lit(_MP4_FTYP + _MP4_MOOV_HDR + _MP4_TRAK_HDR + _MP4_TKHD_HDR
              + _MP4_TKHD_PRE),
        _behex32(vid_w * 65536), _behex32(vid_h * 65536),  # 16.16 fixed
        F.lit(_MP4_MDAT_HDR), F.substring(h, 1, 16))

    payload_hex = F.when(kind == "image", png_hex) \
        .when(kind == "audio", wav_hex).otherwise(video_hex)
    mime = F.when(kind == "image", F.lit("image/png")) \
        .when(kind == "audio", F.lit("audio/wav")) \
        .otherwise(F.lit("video/mp4"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.to_binary(payload_hex, F.lit("hex")).alias("payload"),
        mime.alias("mime"),
    )


def _decode_png(b: bytes) -> Optional[Tuple[int, int]]:
    """Real PNG IHDR parse: signature check + big-endian u32 width/height
    at offset 16 (works on any genuine PNG, not just the synthetic ones)."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return struct.unpack(">II", b[16:24])


def _decode_wav(b: bytes) -> Optional[Tuple[int, int]]:
    """Real WAV header parse via the stdlib ``wave`` module, with a raw
    struct fallback for files wave rejects (e.g. truncated data chunk)."""
    try:
        with wave_mod.open(io.BytesIO(b)) as wf:
            return wf.getframerate(), wf.getnchannels()
    except Exception:
        if len(b) >= 28 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            channels, = struct.unpack("<H", b[22:24])
            rate, = struct.unpack("<I", b[24:28])
            return rate, channels
        return None


def _find_box(b: bytes, start: int, end: int,
              typ: bytes) -> Optional[Tuple[int, int]]:
    """ISO-BMFF box scan: return (payload_start, payload_end) of the
    first ``typ`` box in [start, end); handles size==1 largesize and
    size==0 run-to-end boxes."""
    off = start
    while off + 8 <= end:
        size, = struct.unpack(">I", b[off:off + 4])
        btyp = b[off + 4:off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                return None
            size, = struct.unpack(">Q", b[off + 8:off + 16])
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            return None
        if btyp == typ:
            return off + hdr, off + size
        off += size
    return None


def _decode_mp4(b: bytes) -> Optional[Tuple[int, int]]:
    """Real ISO-BMFF parse: walk the box tree moov → trak → tkhd and read
    the 16.16 fixed-point width/height (v0 body offset 76, v1 offset 88;
    size==1 largesize and size==0 run-to-end boxes handled). Works on any
    genuine MP4 — no media libs needed for header metadata."""
    if len(b) < 16 or b[4:8] != b"ftyp":
        return None
    span = _find_box(b, 0, len(b), b"moov")
    if span:
        span = _find_box(b, span[0], span[1], b"trak")
    if span:
        span = _find_box(b, span[0], span[1], b"tkhd")
    if not span:
        return None
    body = b[span[0]:span[1]]
    if not body:
        return None
    woff = 88 if body[0] == 1 else 76
    if len(body) < woff + 8:
        return None
    w, h = struct.unpack(">II", body[woff:woff + 8])
    return w >> 16, h >> 16


def extract_metadata_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction; PNG/WAV/MP4 headers are all
    parsed from the actual bytes."""
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "n_bytes", "magic",
                                "width", "height", "sample_rate", "channels")}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            b = bytes(payload)
            w = hgt = rate = ch = None
            if kind == "image":
                dims = _decode_png(b)
                if dims:
                    w, hgt = dims
            elif kind == "audio":
                fmt = _decode_wav(b)
                if fmt:
                    rate, ch = fmt
            else:
                dims = _decode_mp4(b)
                if dims:
                    w, hgt = dims
            rows["media_id"].append(int(mid))
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(b))
            rows["magic"].append(b[:4].hex())
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["sample_rate"].append(rate)
            rows["channels"].append(ch)
        yield pd.DataFrame(rows)


def media_metadata(docs: DataFrame) -> DataFrame:
    media = synth_media(docs)
    return media.mapInPandas(extract_metadata_batches, schema=META_SCHEMA)


# ---------------------------------------------------------------------------
# Audio frame decode + feature extraction (real PCM samples)
# ---------------------------------------------------------------------------

_AUDIO_FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_channels", IntegerType(), False),
    StructField("n_frames", IntegerType(), False),
    StructField("n_samples", IntegerType(), False),
    StructField("first_sample", IntegerType(), False),
    StructField("sum_sq", LongType(), False),
])


def _audio_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched REAL PCM decode: stdlib ``wave`` reads the frames,
    numpy interprets the little-endian int16 samples. Integer features
    (first sample, sum of squares) leave the UDF; the float rms is
    derived JVM-side so both engines round the same doubles."""
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in ("media_id", "n_channels", "n_frames",
                                "n_samples", "first_sample", "sum_sq")}
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            with wave_mod.open(io.BytesIO(bytes(payload))) as wf:
                ch = wf.getnchannels()
                nf = wf.getnframes()
                data = wf.readframes(nf)
            samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
            rows["media_id"].append(int(mid))
            rows["n_channels"].append(ch)
            rows["n_frames"].append(nf)
            rows["n_samples"].append(len(samples))
            rows["first_sample"].append(int(samples[0]) if len(samples) else 0)
            rows["sum_sq"].append(int((samples * samples).sum()))
        yield pd.DataFrame(rows)


def audio_frame_stats(docs: DataFrame) -> DataFrame:
    """Decode + feature-extract over the audio modality: per-clip channel
    count, frame count, first sample, and rms amplitude from the ACTUAL
    PCM bytes (works on any genuine 16-bit WAV). The pre-filter keeps the
    Python stage map-only over the audio third of the corpus."""
    media = synth_media(docs).filter(F.col("kind") == "audio")
    raw = media.select("media_id", "payload").mapInPandas(
        _audio_frame_batches, schema=_AUDIO_FRAMES_SCHEMA)
    return raw.select(
        "media_id", "n_channels", "n_frames", "n_samples", "first_sample",
        F.round(F.sqrt(F.col("sum_sq") / F.col("n_samples")), 4).alias("rms"))


_VIDEO_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("sample_idx", IntegerType(), False),
    StructField("byte_offset", IntegerType(), False),
    StructField("byte_value", IntegerType(), False),
])


def _video_sample_batches(n_samples: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_idx",
                                    "byte_offset", "byte_value")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                span = _find_box(b, 0, len(b), b"mdat")
                if span is None:
                    continue
                s, e = span
                size = e - s
                for i in range(n_samples):
                    off = (i * size) // n_samples
                    rows["media_id"].append(int(mid))
                    rows["sample_idx"].append(i)
                    rows["byte_offset"].append(off)
                    rows["byte_value"].append(b[s + off])
            yield pd.DataFrame(rows)
    return fn


def video_frame_sample(docs: DataFrame, n_samples: int = 4) -> DataFrame:
    """Frame-sampling PLUMBING for the video modality: walk the real box
    tree to the ``mdat`` payload and emit ``n_samples`` evenly spaced
    byte probes per clip (the shape a real frame sampler has — keyed
    output rows per media_id, deterministic offsets, Arrow batching;
    actual frame DECODE would need ffmpeg, absent in this container).
    Works on any MP4 whose mdat is an in-file box."""
    media = synth_media(docs).filter(F.col("kind") == "video")
    return media.select("media_id", "payload").mapInPandas(
        _video_sample_batches(n_samples), schema=_VIDEO_SAMPLE_SCHEMA)


def video_frame_sample_oracle(table: str = "documents",
                              n_samples: int = 4) -> str:
    """The synthetic MP4's mdat payload is md5(text) bytes 0..7; sample i
    probes byte floor(i*8/n) — parsed from the same hex the builder used."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS h
  FROM {table} WHERE doc_id % 3 = 2
)
SELECT media_id, t.i::INT AS sample_idx,
       ((t.i * 8) // {n_samples})::INT AS byte_offset,
       ('0x' || substr(h, ((t.i * 8) // {n_samples}) * 2 + 1, 2))::INT
         AS byte_value
FROM m, LATERAL UNNEST(generate_series(0, {n_samples - 1})) AS t(i)
""".strip()


def audio_frame_stats_oracle(table: str = "documents") -> str:
    """Arithmetic twin: the synthetic WAV's data chunk is md5(text) bytes
    0..7, so the four LE int16 samples are hex-char pairs — signed via
    the two's-complement fold, rms over the same exact integer sum."""
    sample_exprs = []
    for i in range(4):
        lo = 4 * i + 1
        hi = 4 * i + 3
        raw = f"('0x' || substr(h, {hi}, 2) || substr(h, {lo}, 2))::BIGINT"
        sample_exprs.append(
            f"(CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END)")
    s = sample_exprs
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS h,
         (1 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 2)::INT AS ch
  FROM {table} WHERE doc_id % 3 = 1
)
SELECT media_id, ch AS n_channels,
       (4 / ch)::INT AS n_frames,
       4 AS n_samples,
       {s[0]}::INT AS first_sample,
       round(sqrt(({s[0]}*{s[0]} + {s[1]}*{s[1]} + {s[2]}*{s[2]}
                   + {s[3]}*{s[3]}) / 4.0), 4) AS rms
FROM m
""".strip()


def media_metadata_oracle(table: str = "documents") -> str:
    """Header-arithmetic twin: rebuilds the same payload hex, then PARSES
    it the way the decoders do — PNG width/height as big-endian u32 at
    byte 16/20 (hex chars 33/41), WAV channels as LE u16 at byte 22 and
    sample rate as LE u32 at byte 24, MP4 width/height as the 16.16
    fixed-point big-endian u32 pair at the tkhd tail (byte 116 → hex char
    233; >> 16 drops the fraction)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         md5(text) AS h
  FROM {table}
),
b AS (
  SELECT media_id, kind, h,
         ('0x' || substr(h, 1, 2))::BIGINT AS b0,
         ('0x' || substr(h, 3, 2))::BIGINT AS b1
  FROM m
),
payloads AS (
  SELECT media_id, kind,
    CASE kind
      WHEN 'image' THEN '{_PNG_SIG}' || '{_IHDR}'
        || lpad(to_hex(16 + b0 % 64), 8, '0')
        || lpad(to_hex(16 + b1 % 64), 8, '0')
        || '{_IHDR_TAIL}' || substr(h, 1, 8) || '{_IEND}'
      WHEN 'audio' THEN '52494646' || '{_lehex32(44)}' || '57415645'
        || '666d7420' || '{_lehex32(16)}' || '0100'
        || lpad(to_hex(1 + b0 % 2), 2, '0') || '00'
        || ['{_WAV_RATE_HEX_LE[0]}','{_WAV_RATE_HEX_LE[1]}',
            '{_WAV_RATE_HEX_LE[2]}','{_WAV_RATE_HEX_LE[3]}'][(b1 % 4)::INT + 1]
        || ['{_lehex32(8000 * 2)}','{_lehex32(8000 * 4)}',
            '{_lehex32(16000 * 2)}','{_lehex32(16000 * 4)}',
            '{_lehex32(22050 * 2)}','{_lehex32(22050 * 4)}',
            '{_lehex32(44100 * 2)}','{_lehex32(44100 * 4)}']
           [((b1 % 4) * 2 + 1 + b0 % 2)::INT]
        || ['{_lehex16(2)}','{_lehex16(4)}'][(1 + b0 % 2)::INT] || '1000'
        || '64617461' || '{_lehex32(8)}' || substr(h, 1, 16)
      ELSE '{_MP4_FTYP}{_MP4_MOOV_HDR}{_MP4_TRAK_HDR}{_MP4_TKHD_HDR}{_MP4_TKHD_PRE}'
        || lpad(to_hex((32 + b0 % 32) * 65536), 8, '0')
        || lpad(to_hex((32 + b1 % 32) * 65536), 8, '0')
        || '{_MP4_MDAT_HDR}' || substr(h, 1, 16)
    END AS ph
  FROM b
)
SELECT media_id, kind, (length(ph) / 2)::INT AS n_bytes,
       substr(ph, 1, 8) AS magic,
       CASE kind
         WHEN 'image' THEN ('0x' || substr(ph, 33, 8))::BIGINT
         WHEN 'video' THEN ('0x' || substr(ph, {_MP4_WIDTH_OFF_HEXCHARS}, 8))::BIGINT >> 16
       END::INT AS width,
       CASE kind
         WHEN 'image' THEN ('0x' || substr(ph, 41, 8))::BIGINT
         WHEN 'video' THEN ('0x' || substr(ph, {_MP4_WIDTH_OFF_HEXCHARS + 8}, 8))::BIGINT >> 16
       END::INT AS height,
       CASE kind WHEN 'audio' THEN
         ('0x' || substr(ph, 55, 2) || substr(ph, 53, 2)
               || substr(ph, 51, 2) || substr(ph, 49, 2))::BIGINT
       END::INT AS sample_rate,
       CASE kind WHEN 'audio' THEN
         ('0x' || substr(ph, 47, 2) || substr(ph, 45, 2))::BIGINT
       END::INT AS channels
FROM payloads
""".strip()
