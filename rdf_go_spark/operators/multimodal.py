"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Payload synthesis is deterministic from document text, but the IMAGE and
AUDIO payloads are real container formats — a minimal valid PNG (signature
+ IHDR + IEND) and a minimal valid RIFF/WAVE file — and the decoders parse
the actual bytes: PNG IHDR width/height via ``struct`` (big-endian u32 at
offset 16) and WAV sample-rate/channels via the stdlib ``wave`` module.
They work unchanged on any genuine PNG/WAV. Only the VIDEO decode remains
a STUB (no ffmpeg/pyav in this container — clearly marked below); its
Spark-side plumbing (binary column, Arrow batching, magic sniffing) is
real and tested.
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


def _lehex16(v: int) -> str:
    return struct.pack("<H", v).hex()


def _lehex32(v: int) -> str:
    return struct.pack("<I", v).hex()


def _behex32(col: Column) -> Column:
    return F.lower(F.lpad(F.hex(col), 8, "0"))


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic payloads derived from document text via md5 bytes:
    images become minimal valid PNGs (real IHDR dims), audio becomes
    minimal valid WAV files (real fmt chunk), video stays opaque bytes."""
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

    video_hex = F.concat(h, F.md5(F.concat(F.lit("x"), F.col("text"))))

    payload_hex = F.when(kind == "image", png_hex) \
        .when(kind == "audio", wav_hex).otherwise(video_hex)
    mime = F.when(kind == "image", F.lit("image/png")) \
        .when(kind == "audio", F.lit("audio/wav")) \
        .otherwise(F.lit("video/synthetic"))
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


def _decode_stub(payload: bytes, kind: str):
    """STUB — video decoders (ffmpeg / pyav) are unavailable in this
    environment. Deterministic fake dimensions keep the pipeline testable."""
    if kind == "video":
        return 32 + payload[0] % 32, 32 + payload[1] % 32
    return None, None


def extract_metadata_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction; PNG/WAV headers are parsed for
    real, video falls back to the marked stub."""
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
                w, hgt = _decode_stub(b, kind)
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


def media_metadata_oracle(table: str = "documents") -> str:
    """Header-arithmetic twin: rebuilds the same payload hex, then PARSES
    it the way the decoders do — PNG width/height as big-endian u32 at
    byte 16/20 (hex chars 33/41), WAV channels as LE u16 at byte 22 and
    sample rate as LE u32 at byte 24 (video keeps the marked stub's fake
    dims from the first two payload bytes)."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         md5(text) AS h,
         md5(text) || md5('x' || text) AS hex64
  FROM {table}
),
b AS (
  SELECT media_id, kind, h, hex64,
         ('0x' || substr(h, 1, 2))::BIGINT AS b0,
         ('0x' || substr(h, 3, 2))::BIGINT AS b1
  FROM m
),
payloads AS (
  SELECT media_id, kind, b0, b1,
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
      ELSE hex64
    END AS ph
  FROM b
)
SELECT media_id, kind, (length(ph) / 2)::INT AS n_bytes,
       substr(ph, 1, 8) AS magic,
       CASE kind
         WHEN 'image' THEN ('0x' || substr(ph, 33, 8))::BIGINT
         WHEN 'video' THEN 32 + ('0x' || substr(ph, 1, 2))::BIGINT % 32
       END::INT AS width,
       CASE kind
         WHEN 'image' THEN ('0x' || substr(ph, 41, 8))::BIGINT
         WHEN 'video' THEN 32 + ('0x' || substr(ph, 3, 2))::BIGINT % 32
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
