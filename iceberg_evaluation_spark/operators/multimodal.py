"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` operators so each Python worker sees
columnar batches, not rows. The actual codec step is STUBBED in this
environment (no PIL/ffmpeg in the container): ``decode_stub=True``
(default) derives deterministic fake features from the payload bytes so
the Spark-side plumbing — schema, partitioning, batch shape, UDF
signatures — is real and testable; ``decode_stub=False`` raises
``NotImplementedError`` at the exact point a codec library would plug in.

At scale: payload columns dominate I/O, so every operator projects only
(id, payload) before the Python stage, and feature outputs are narrow
columns that downstream joins can shuffle cheaply without dragging bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary_payload",
    "extract_image_features",
    "resize_images",
    "sample_frames",
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
]

#: canonical multimodal column bundle
MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string,"
    " width int, height int, n_frames int"
)
IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes int, digest string, mean_luma double,"
    " feature array<float>"
)
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_payload binary"


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, media_type: str = "image/fake"
) -> DataFrame:
    """Materialize a MEDIA_SCHEMA bundle from any source column (here the
    text is encoded as the payload stand-in). In production this is the
    parquet/tar reader emitting real bytes — the engine only requires the
    (id, payload, metadata) shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        (F.length(payload) % 64 + 16).cast("int").alias("width"),
        (F.length(payload) % 48 + 16).cast("int").alias("height"),
        (F.length(payload) % 8 + 1).cast("int").alias("n_frames"),
    )


def _fake_image_features(payload: bytes, dim: int) -> tuple[str, float, list[float]]:
    """Deterministic stand-in for a real decoder+encoder: digest, a fake
    luminance, and a unit-norm feature vector derived from sha256."""
    h = hashlib.sha256(payload).digest()
    mean_luma = h[0] / 255.0
    raw = [(h[i % 32] - 127.5) / 127.5 for i in range(dim)]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return h.hex()[:16], mean_luma, [x / norm for x in raw]


def extract_image_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    Projects to (media_id, payload) first so only the bytes needed cross
    into Python; output is IMAGE_FEATURE_SCHEMA (narrow). The worker
    closure is self-contained (no references to this module's globals):
    Spark Python workers inherit the driver's environment, not its
    ``sys.path`` edits, so a by-reference pickle of package functions
    would fail under any driver that imports us from a non-installed
    checkout."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_features(payload: bytes) -> tuple[str, float, list[float]]:
            h = _hl.sha256(payload).digest()
            raw = [(h[i % 32] - 127.5) / 127.5 for i in range(dim)]
            norm = sum(x * x for x in raw) ** 0.5 or 1.0
            return h.hex()[:16], h[0] / 255.0, [x / norm for x in raw]

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not present in "
                    "this environment; plug the codec in here"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest, luma, feat = fake_features(bytes(payload))
                rows.append((mid, len(payload), digest, luma, feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "digest", "mean_luma", "feature"]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def resize_images(
    media: DataFrame, target_w: int = 64, target_h: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Resize payloads to target dims as an Arrow-batched mapInPandas stage.

    Emits the full MEDIA_SCHEMA bundle with the payload replaced and
    width/height set to the target — downstream operators (feature
    extraction, frame sampling) compose on the output unchanged. The stub
    'resize' derives a deterministic payload of size ∝ target area where
    a codec would decode→scale→re-encode; the Spark-side contract
    (projection shape, batch flow, schema) is the real one. Closure is
    self-contained — workers never import this package.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires PIL/libvips — plug the codec in here"
                )
            out_payload = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                # deterministic fake: digest-seeded bytes, length ∝ area
                n = max(16, (target_w * target_h) // 64)
                seed = _hl.sha256(b).digest()
                out_payload.append((seed * (n // len(seed) + 1))[:n])
            res = pdf.copy()
            res["payload"] = out_payload
            res["width"] = target_w
            res["height"] = target_h
            yield res

    return media.select(
        "media_id", "payload", "media_type", "width", "height", "n_frames"
    ).mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 2, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video-typed payloads: emits one row per sampled
    frame (media_id, frame_idx, frame_payload). The stub slices the
    payload bytes deterministically where a demuxer would seek keyframes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — plug in here"
                )
            out = []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                b = bytes(payload)
                for idx in range(0, int(n_frames), every_nth):
                    start = (idx * 7) % max(len(b), 1)
                    out.append((mid, idx, b[start : start + 16]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.select("media_id", "payload", "n_frames").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
