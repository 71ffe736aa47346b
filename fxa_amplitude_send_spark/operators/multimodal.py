"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

The decode step is REAL for formats the standard library can parse —
WAV audio via ``wave``, and PNG/GIF/JPEG dimensions via their container
headers (plus PIL for anything else, if importable) — and falls back
per-row to a deterministic fake clearly marked ``decode_stub=True`` for
payloads no available parser understands (full pixel/sample codecs like
ffmpeg aren't in this container). One unified schema either way, so mixed
corpora flow through a single plan; swapping in a heavier codec changes
only the inner function body.

At 100 TB the pattern matters more than the codec: mapInPandas streams Arrow
record batches through the Python worker, so peak memory is one batch (bound
by spark.sql.execution.arrow.maxRecordsPerBatch), not one partition, and the
decode parallelism is exactly the scan parallelism — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the fake image-decode: metadata a real decoder would emit.
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int, decode_stub boolean"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the UTF-8 bytes of ``text`` as an opaque media payload column —
    the schema shape (id + binary + metadata) of a real multimodal table."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_meta(with_payload: DataFrame) -> DataFrame:
    """mapInPandas 'decode': binary payload → typed metadata rows.

    REAL for PNG / GIF / JPEG: dimensions come from the container headers,
    parsed with the standard library only (plus PIL for other formats when
    importable). Rows whose payload no parser understands fall back to a
    deterministic fake (pure function of the bytes — width/height from
    byte length, n_frames from the first byte) marked ``decode_stub=True``
    so differential checks can replay it.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # closure-local defs only (executor pickling discipline)
        import struct

        def _real_dims(b: bytes):
            """(width, height, n_frames) from the header, or None."""
            try:
                if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
                    w, h = struct.unpack_from(">II", b, 16)
                    return w, h, 1
                if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
                    w, h = struct.unpack_from("<HH", b, 6)
                    # frame count = number of image descriptors
                    return w, h, max(1, b.count(b"\x2c", 13))
                if b[:2] == b"\xff\xd8":  # JPEG: scan for a SOF marker
                    i = 2
                    while i + 9 < len(b):
                        if b[i] != 0xFF:
                            break
                        marker = b[i + 1]
                        if 0xC0 <= marker <= 0xCF and marker not in (
                            0xC4, 0xC8, 0xCC,
                        ):
                            h, w = struct.unpack_from(">HH", b, i + 5)
                            return w, h, 1
                        (seg_len,) = struct.unpack_from(">H", b, i + 2)
                        i += 2 + seg_len
                try:  # any other format: PIL if the container has it
                    import io

                    from PIL import Image  # type: ignore

                    img = Image.open(io.BytesIO(b))
                    return (
                        img.width,
                        img.height,
                        getattr(img, "n_frames", 1),
                    )
                except Exception:
                    return None
            except Exception:
                return None
            return None

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda b: b[0] if len(b) else 0)
            real = payloads.map(_real_dims)
            is_stub = real.map(lambda r: r is None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": real.combine(
                        64 + n_bytes % 512, lambda r, f: f if r is None else r[0]
                    ).astype("int32"),
                    "height": real.combine(
                        64 + (n_bytes * 7) % 512,
                        lambda r, f: f if r is None else r[1],
                    ).astype("int32"),
                    "n_frames": real.combine(
                        1 + first % 8, lambda r, f: f if r is None else r[2]
                    ).astype("int32"),
                    "decode_stub": is_stub,
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


def frame_sample(meta: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing: expand n_frames → one row per sampled frame
    index (explode of a sequence — pure JVM, no UDF)."""
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


#: Output schema of the fake resize: the dims a real resizer would emit.
RESIZE_SCHEMA = "doc_id bigint, width int, height int, out_width int, out_height int, scale double"


def resize_meta(meta: DataFrame, target: int = 224) -> DataFrame:
    """Resize plumbing (STUB — no codec): compute aspect-preserving output
    dims for a target short side, the exact metadata contract of a real
    resize. mapInPandas so swapping in PIL's resize keeps the plan shape."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            short = pdf[["width", "height"]].min(axis=1)
            scale = target / short
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": (pdf["width"] * scale).round().astype("int32"),
                    "out_height": (pdf["height"] * scale).round().astype("int32"),
                    "scale": scale.round(6),
                }
            )

    return meta.select("doc_id", "width", "height").mapInPandas(
        compute, schema=RESIZE_SCHEMA
    )


def extract_features(with_payload: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing (STUB): binary payload → deterministic
    fake embedding (seeded from the payload's SHA-256), emitted as
    array<float> — the schema/batching contract of a real vision encoder.
    The output feeds the similarity/ANN operators directly, completing the
    binary → embedding → ANN pipeline shape."""
    schema = f"doc_id bigint, features array<float>"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def fake_embed(payload: bytes) -> list[float]:
            out = []
            seed = hashlib.sha256(payload).digest()
            while len(out) < dim:
                seed = hashlib.sha256(seed).digest()
                for i in range(0, min(32, (dim - len(out)) * 4), 4):
                    (v,) = struct.unpack_from("<i", seed, i)
                    out.append(v / 2**31)
            return out[:dim]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": pdf["payload"].map(fake_embed),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(encode, schema=schema)


#: Output schema of the fake audio-decode: metadata a real decoder would emit.
AUDIO_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate int, n_samples bigint,"
    " decode_stub boolean"
)


def decode_audio_meta(with_payload: DataFrame) -> DataFrame:
    """mapInPandas audio 'decode': binary payload → (sample_rate, n_samples).

    REAL for WAV: parsed with the standard library ``wave`` module (no
    external codec needed). Rows whose payload isn't a parseable WAV fall
    back to a deterministic fake (sample_rate from byte parity, n_samples
    = 16 samples per byte — a pure function of the payload so the
    differential oracle can replay it) marked ``decode_stub=True``. Same
    Arrow-batch memory contract as decode_image_meta; compressed formats
    (mp3/ogg) would slot into the same per-row try-parse."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # closure-local defs only (executor pickling discipline)
        import io
        import wave

        def _real_wav(b: bytes):
            """(sample_rate, n_samples) via stdlib wave, or None."""
            try:
                with wave.open(io.BytesIO(b)) as w:
                    return w.getframerate(), w.getnframes()
            except Exception:
                return None

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            real = pdf["payload"].map(_real_wav)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "sample_rate": real.combine(
                        16000 - 8000 * (n_bytes % 2),
                        lambda r, f: f if r is None else r[0],
                    ).astype("int32"),
                    "n_samples": real.combine(
                        n_bytes * 16, lambda r, f: f if r is None else r[1]
                    ).astype("int64"),
                    "decode_stub": real.map(lambda r: r is None),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode, AUDIO_META_SCHEMA
    )


def audio_windows(
    meta: DataFrame, window: int = 16000, hop: int = 8000
) -> DataFrame:
    """Overlapping analysis windows over each clip: the fan-out every
    feature extractor (spectrogram, VAD, ASR chunking) starts from. Pure
    explode-of-sequence — JVM-side, no UDF, no shuffle; output rows =
    total_samples/hop regardless of clip-length skew."""
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("n_samples") - window, F.lit(0).cast("long")),
        F.lit(hop).cast("long"),
    )
    return meta.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.explode(starts).alias("start_sample"),
    ).select(
        "doc_id",
        "sample_rate",
        "start_sample",
        F.least(
            F.col("start_sample") + window, F.col("n_samples")
        ).alias("end_sample"),
        F.round(F.col("start_sample") / F.col("sample_rate"), 3).alias(
            "start_sec"
        ),
    )
