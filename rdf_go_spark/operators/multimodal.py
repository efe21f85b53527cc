"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/frame-sample kernels are STUBS (no image/audio libs in
this container — clearly marked below); everything Spark-side is real and
tested: schema, binary synthesis, Arrow batch shape, mapInPandas signatures,
partition behavior. On a real cluster, replace ``_decode_stub`` with
PIL/ffmpeg calls — the batch plumbing doesn't change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
    StructField("width", IntegerType(), True),      # deterministic fake
    StructField("height", IntegerType(), True),
])


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic opaque payloads derived from document text via
    repeated md5 (stands in for real image/audio bytes; byte-stable)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    payload = F.to_binary(
        F.concat(F.md5(F.col("text")), F.md5(F.concat(F.lit("x"), F.col("text")))),
        F.lit("hex"))
    mime = F.concat(kind, F.lit("/synthetic"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        mime.alias("mime"),
    )


def _decode_stub(payload: bytes, kind: str):
    """STUB — real decoders (PIL / soundfile / pyav) are unavailable in this
    environment. Deterministic fake dimensions keep the pipeline testable."""
    if kind == "image":
        return 16 + payload[0] % 64, 16 + payload[1] % 64
    if kind == "video":
        return 32 + payload[0] % 32, 32 + payload[1] % 32
    return None, None  # audio: no spatial dims


def extract_metadata_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction; the only per-item Python is the
    (stubbed) decode — byte counting and magic sniffing are vectorizable."""
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "n_bytes", "magic",
                                "width", "height")}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            b = bytes(payload)
            w, h = _decode_stub(b, kind)
            rows["media_id"].append(int(mid))
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(b))
            rows["magic"].append(b[:4].hex())
            rows["width"].append(w)
            rows["height"].append(h)
        yield pd.DataFrame(rows)


def media_metadata(docs: DataFrame) -> DataFrame:
    media = synth_media(docs)
    return media.mapInPandas(extract_metadata_batches, schema=META_SCHEMA)


def media_metadata_oracle(table: str = "documents") -> str:
    """Arithmetic twin: payload = unhex(md5(text) || md5('x'||text));
    fake dims derive from the first two payload bytes."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3)::INT + 1] AS kind,
         md5(text) || md5('x' || text) AS hex64
  FROM {table}
),
b AS (
  SELECT media_id, kind,
         ('0x' || substr(hex64, 1, 2))::INT AS b0,
         ('0x' || substr(hex64, 3, 2))::INT AS b1,
         substr(hex64, 1, 8) AS magic
  FROM m
)
SELECT media_id, kind, 32::INT AS n_bytes, magic,
       CASE WHEN kind = 'image' THEN 16 + b0 % 64
            WHEN kind = 'video' THEN 32 + b0 % 32 END::INT AS width,
       CASE WHEN kind = 'image' THEN 16 + b1 % 64
            WHEN kind = 'video' THEN 32 + b1 % 32 END::INT AS height
FROM b
""".strip()
