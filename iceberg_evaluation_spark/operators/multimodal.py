"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` operators so each Python worker sees
columnar batches, not rows. Codec status (no PIL/ffmpeg in this
container): ``decode_stub=True`` (default) derives deterministic fake
features from the payload bytes so the Spark-side plumbing — schema,
partitioning, batch shape, UDF signatures — is testable on any payload;
``decode_stub=False`` runs a REAL header-parse codec for uncompressed
24-bpp BMP (struct + numpy, no image library; see also the dedicated
:func:`decode_bmp_features` / :func:`decode_wav_features` PCM16 WAV
decoder), and raises ``NotImplementedError`` only for formats that
genuinely need an external library — that remains the plug-point.

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
    "attach_bmp_payload",
    "attach_wav_payload",
    "extract_image_features",
    "decode_bmp_features",
    "decode_wav_features",
    "resize_images",
    "sample_frames",
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "BMP_FEATURE_SCHEMA",
    "WAV_FEATURE_SCHEMA",
]

#: canonical multimodal column bundle
MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string,"
    " width int, height int, n_frames int"
)
# feature is array<double>, not array<float>: the extraction stage's
# contract is exact verifiability (closed-form oracles reproduce every
# component bit-for-bit); compact storage is a SEPARATE, explicit step —
# the int8 quantization operator (corpus_text.py q57) — applied after
# any exactness checks, which is the right order at 100 TB too.
IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, n_bytes int, digest string, mean_luma double,"
    " feature array<double>"
)
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_payload binary"
BMP_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, mean_luma double,"
    " top_left_luma double"
)
WAV_FEATURE_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, rms double,"
    " first_sample int"
)


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


def attach_bmp_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Generate REAL uncompressed 24-bpp BMP payloads (one per row) as an
    Arrow-batched mapInPandas stage — the honest-codec twin of
    :func:`attach_binary_payload`'s text stand-in.

    Image content is deterministic from the id so an oracle can derive
    the decoded features in closed form: width = 16 + (id % 8) * 4,
    height = 8 + id % 8, and every channel byte of image row ``y``
    (y = 0 is the TOP row) equals ``(id + y) % 256``. The row gradient
    makes decoder row-order bugs visible: BMP stores rows bottom-up, so
    a decoder that forgets the vertical flip reads the wrong top-left
    pixel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np

        def make_bmp(mid: int) -> tuple[bytes, int, int]:
            w = 16 + (mid % 8) * 4
            h = 8 + mid % 8
            stride = (w * 3 + 3) // 4 * 4
            # stored bottom-up: stored row j is image row y = h-1-j
            rows = []
            for j in range(h):
                y = h - 1 - j
                row = _np.full(stride, 0, dtype=_np.uint8)
                row[: w * 3] = (mid + y) % 256
                rows.append(row)
            pixels = _np.concatenate(rows).tobytes()
            header = _struct.pack(
                "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54
            ) + _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
            )
            return header + pixels, w, h

        for pdf in batches:
            out = []
            for mid in pdf["media_id"]:
                payload, w, h = make_bmp(int(mid))
                out.append((mid, payload, "image/bmp", w, h, 1))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "payload",
                    "media_type",
                    "width",
                    "height",
                    "n_frames",
                ],
            )

    ids = df.select(F.col(id_col).cast("bigint").alias("media_id"))
    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """REAL BMP decode as an Arrow-batched mapInPandas stage: parse the
    BITMAPFILEHEADER/BITMAPINFOHEADER with struct/numpy (no image
    library), slice the bottom-up padded pixel rows, and emit decoded
    dimensions plus luma features.

    Feature arithmetic is integer-sum / integer-denominator division so
    an oracle reproducing the same integers gets bitwise-identical
    doubles: ``mean_luma = sum(all channel bytes) / (w*h*3*255)`` and
    ``top_left_luma = top-left blue byte / 255``. Only uncompressed
    24-bpp BMPs are supported — anything else raises (the honest limit
    of a header-parse codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np

        def parse(b: bytes) -> tuple[int, int, float, float]:
            if b[:2] != b"BM":
                raise ValueError("not a BMP payload")
            data_off = _struct.unpack_from("<I", b, 10)[0]
            w, h_raw = _struct.unpack_from("<ii", b, 18)
            planes, bpp = _struct.unpack_from("<HH", b, 26)
            compression = _struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or compression != 0:
                raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
            bottom_up = h_raw > 0
            h = abs(h_raw)
            stride = (w * 3 + 3) // 4 * 4
            raw = _np.frombuffer(b, dtype=_np.uint8, count=stride * h, offset=data_off)
            rows = raw.reshape(h, stride)[:, : w * 3]
            if bottom_up:
                rows = rows[::-1]  # stored bottom-up → image order
            total = int(rows.astype(_np.int64).sum())
            mean_luma = total / (w * h * 3 * 255)
            top_left_luma = int(rows[0, 0]) / 255
            return w, h, mean_luma, top_left_luma

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, mean_luma, top_left = parse(bytes(payload))
                out.append((mid, w, h, mean_luma, top_left))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_luma", "top_left_luma"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=BMP_FEATURE_SCHEMA
    )


def attach_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Generate REAL PCM16 mono WAV payloads (RIFF/fmt/data) per row.

    Deterministic content for closed-form oracles: sample_rate = 8000,
    n_samples = 64 + id % 64, sample[i] = (id*37 + i*101) % 2048 - 1024."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np

        def make_wav(mid: int) -> bytes:
            n = 64 + mid % 64
            rate = 8000
            i = _np.arange(n, dtype=_np.int64)
            samples = ((mid * 37 + i * 101) % 2048 - 1024).astype("<i2")
            data = samples.tobytes()
            return (
                _struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
                + _struct.pack(
                    "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
                )
                + _struct.pack("<4sI", b"data", len(data))
                + data
            )

        for pdf in batches:
            out = [
                (mid, make_wav(int(mid)), "audio/wav") for mid in pdf["media_id"]
            ]
            yield pd.DataFrame(out, columns=["media_id", "payload", "media_type"])

    ids = df.select(F.col(id_col).cast("bigint").alias("media_id"))
    return ids.mapInPandas(
        run, schema="media_id bigint, payload binary, media_type string"
    )


def decode_wav_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode: walk the RIFF chunk list (fmt before data, but
    tolerant of extra chunks in between), require PCM16 mono, and compute
    sample stats with the same int-sum/int-denominator discipline as
    :func:`decode_bmp_features` (``rms = sqrt(sum(s²)/n)``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np

        def parse(b: bytes) -> tuple[int, int, float, int]:
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            pos, rate, data = 12, None, None
            while pos + 8 <= len(b):
                cid, size = _struct.unpack_from("<4sI", b, pos)
                body = b[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt, ch, rate = _struct.unpack_from("<HHI", body, 0)
                    bits = _struct.unpack_from("<H", body, 14)[0]
                    if fmt != 1 or ch != 1 or bits != 16:
                        raise ValueError("only PCM16 mono supported")
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size & 1)  # RIFF chunks pad to even
            if rate is None or data is None:
                raise ValueError("missing fmt/data chunk")
            samples = _np.frombuffer(data, dtype="<i2").astype(_np.int64)
            n = len(samples)
            rms = float(_np.sqrt(int((samples * samples).sum()) / n))
            return rate, n, rms, int(samples[0])

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n, rms, first = parse(bytes(payload))
                out.append((mid, rate, n, rms, first))
            yield pd.DataFrame(
                out,
                columns=["media_id", "sample_rate", "n_samples", "rms", "first_sample"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=WAV_FEATURE_SCHEMA
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
        import struct as _struct

        import numpy as _np

        def fake_features(payload: bytes) -> tuple[str, float, list[float]]:
            h = _hl.sha256(payload).digest()
            raw = [(h[i % 32] - 127.5) / 127.5 for i in range(dim)]
            norm = sum(x * x for x in raw) ** 0.5 or 1.0
            return h.hex()[:16], h[0] / 255.0, [x / norm for x in raw]

        def bmp_features(payload: bytes) -> tuple[str, float, list[float]]:
            # the honest codec: uncompressed 24-bpp BMP header parse +
            # numpy pixel decode; feature = per-row mean luma resampled
            # to `dim`, unit-normed. Non-BMP formats stay a plug-point.
            if payload[:2] != b"BM":
                raise NotImplementedError(
                    "decode_stub=False supports uncompressed 24-bpp BMP; "
                    "other formats need PIL/libvips — plug the codec in here"
                )
            data_off = _struct.unpack_from("<I", payload, 10)[0]
            w, h_raw = _struct.unpack_from("<ii", payload, 18)
            bpp = _struct.unpack_from("<H", payload, 28)[0]
            comp = _struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or comp != 0:
                raise NotImplementedError(f"unsupported BMP bpp={bpp} comp={comp}")
            h = abs(h_raw)
            stride = (w * 3 + 3) // 4 * 4
            raw = _np.frombuffer(
                payload, dtype=_np.uint8, count=stride * h, offset=data_off
            )
            rows = raw.reshape(h, stride)[:, : w * 3]
            if h_raw > 0:
                rows = rows[::-1]
            mean_luma = float(rows.astype(_np.int64).sum()) / (w * h * 3 * 255)
            row_means = [
                float(s) / (w * 3 * 255)
                for s in rows.astype(_np.int64).sum(axis=1)
            ]
            # explicit linear resample of per-row means to `dim` taps.
            # Deliberately NOT np.interp/np.sum: every operation here is
            # a fixed left-to-right IEEE double sequence (one multiply-
            # add per tap, sequential norm accumulation) so an exact SQL
            # twin can reproduce the values bit-for-bit — numpy's
            # pairwise summation has no SQL equivalent.
            step = (h - 1) / float(dim - 1)
            feat = []
            for i in range(dim):
                x = i * step
                lo = int(x)
                if lo >= h - 1:
                    feat.append(row_means[h - 1])
                else:
                    feat.append(
                        (row_means[lo + 1] - row_means[lo]) * (x - lo)
                        + row_means[lo]
                    )
            acc = 0.0
            for v in feat:
                acc += v * v
            norm = acc ** 0.5 or 1.0
            digest = _hl.sha256(rows.tobytes()).hexdigest()[:16]
            return digest, mean_luma, [v / norm for v in feat]

        decode = fake_features if decode_stub else bmp_features
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest, luma, feat = decode(bytes(payload))
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
