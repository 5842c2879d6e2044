"""Multimodal corpus: opaque binary payload columns with typed metadata
(the beyond-the-reference training-data surface; see operators.multimodal).

The testdata has no native binary table, so ``documents.text`` is encoded
to UTF-8 bytes as the payload stand-in — the engine-side shape (binary
column + metadata struct + Arrow-batched Python stage) is exactly what a
production image/audio feed would use, and the metadata query q45 has an
exact DuckDB oracle (``encode``/``octet_length``/``md5`` agree between
engines on UTF-8 bytes). The decode/feature stage q46 is deterministic
but sha256-based — not SQL-expressible → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary_payload,
    attach_bmp_payload,
    attach_wav_payload,
    decode_bmp_features,
    decode_wav_features,
    extract_image_features,
)
from ..sources import load_table
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_binary_payload(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


# ---------------------------------------------------------------------------
# q45: binary payload metadata census (byte length, digest, typed dims) —
#      the projection/pruning contract for multimodal columns: only
#      narrow metadata leaves the scan, payload bytes never shuffle.
# ---------------------------------------------------------------------------
@register(
    "q45_multimodal_metadata",
    covers="multimodal-binary P2 P5 A1",
    oracle="""
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS digest
  FROM documents
)
SELECT media_id, n_bytes, digest,
       n_bytes % 64 + 16 AS width,
       n_bytes % 48 + 16 AS height,
       n_bytes % 8 + 1 AS n_frames
FROM m
""",
)
def q45_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        "width",
        "height",
        "n_frames",
    )


# ---------------------------------------------------------------------------
# q46: decode + feature-extract via Arrow-batched mapInPandas (stubbed
#      codec, real plumbing). The stub decoder is sha256-derived, and
#      DuckDB has sha256 — so even the PYTHON stage is value-checked:
#      the oracle re-derives digest bytes from the hex string via nibble
#      lookup and reproduces mean_luma and the first unit-norm feature
#      component with identical IEEE double arithmetic.
# ---------------------------------------------------------------------------
_NIB = "strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1"


@register(
    "q46_multimodal_features",
    covers="multimodal-decode mapInPandas",
    oracle=f"""
WITH h AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         sha256(text) AS hx
  FROM documents
), b AS (
  SELECT media_id, n_bytes, substr(hx, 1, 16) AS digest,
         list_transform(range(1, 17),
           i -> (strpos('0123456789abcdef', substr(hx, 2*i-1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(hx, 2*i, 1)) - 1)) AS bytes16,
         ({_NIB.format(p=1)}) * 16 + ({_NIB.format(p=2)}) AS b0
  FROM h
)
SELECT media_id, n_bytes, digest,
       round(b0 / 255.0, 6) AS mean_luma,
       round(((b0 - 127.5) / 127.5)
         / sqrt(list_aggregate(list_transform(bytes16,
                  x -> ((x - 127.5)/127.5)**2), 'sum')), 4) AS f0
FROM b
""",
)
def q46_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_image_features(_media(spark, sf_dir), dim=16)
    return feats.select(
        "media_id",
        "n_bytes",
        "digest",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.round(F.element_at("feature", 1).cast("double"), 4).alias("f0"),
    )


# ---------------------------------------------------------------------------
# q91/q92: REAL codecs under the oracle gate. The payloads are genuine
#      file formats (uncompressed 24-bpp BMP; PCM16 mono RIFF/WAV) built
#      by the engine, and the decode stage parses the actual headers and
#      pixel/sample arrays with struct+numpy — no image/audio library.
#      Image/audio content is deterministic from the id, so the oracle
#      derives every decoded feature in closed form; both engines compute
#      features as the SAME integer-sum / integer-denominator double
#      division, making the comparison exact (no rounding tolerance).
#      The BMP row gradient additionally pins the bottom-up row flip: a
#      decoder that skips it reads the wrong top_left_luma.
# ---------------------------------------------------------------------------
_Q91_ORACLE = """
WITH p AS (
  SELECT doc_id AS media_id,
         16 + (doc_id % 8) * 4 AS width,
         8 + doc_id % 8 AS height
  FROM documents
), s AS (
  SELECT media_id, width, height,
         list_aggregate(list_transform(range(height),
                                       y -> (media_id + y) % 256), 'sum') AS rowsum
  FROM p
)
SELECT media_id, width, height,
       CAST(rowsum * width * 3 AS DOUBLE) / (width * height * 3 * 255) AS mean_luma,
       CAST(media_id % 256 AS DOUBLE) / 255 AS top_left_luma
FROM s
"""


@register(
    "q91_bmp_decode",
    covers="multimodal-decode mapInPandas multimodal-binary",
    oracle=_Q91_ORACLE,
)
def q91_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_bmp_payload(docs, "media_id")
    return decode_bmp_features(media)


_Q92_ORACLE = """
WITH p AS (
  SELECT doc_id AS media_id, 64 + doc_id % 64 AS n_samples FROM documents
), s AS (
  SELECT media_id, n_samples,
         list_aggregate(list_transform(range(n_samples),
             i -> ((media_id * 37 + i * 101) % 2048 - 1024) ** 2), 'sum') AS ss
  FROM p
)
SELECT media_id, 8000 AS sample_rate, n_samples,
       sqrt(ss / n_samples) AS rms,
       (media_id * 37) % 2048 - 1024 AS first_sample
FROM s
"""


@register(
    "q92_wav_decode",
    covers="multimodal-decode mapInPandas multimodal-binary",
    oracle=_Q92_ORACLE,
)
def q92_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_wav_payload(docs, "media_id")
    return decode_wav_features(media)
