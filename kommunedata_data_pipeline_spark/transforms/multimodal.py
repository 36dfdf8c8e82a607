"""Multimodal columns (north star): image/audio/video as opaque BINARY
columns with typed metadata.

Real here (no external libs needed, fully tested):
- format sniffing from magic bytes (PNG/JPEG/GIF/PDF/WAV/MP4/WEBP);
- PNG dimension extraction from the IHDR chunk;
- WAV sample-rate/channels from the fmt chunk;
- batch plumbing: Arrow-batched ``mapInPandas`` with explicit schema —
  the shape every decode/feature-extract step at 100 TB uses (narrow,
  no shuffle, blobs never leave the scan partition).

Stubbed (decode libraries are not in this container; deterministic fake
keeps tests meaningful): pixel decode, resize, frame sampling, feature
extraction. Each stub produces a deterministic md5-derived vector so the
downstream plumbing (schema, partitioning, batch shape) is exercised
end-to-end; swap `_fake_features` for a real decoder on a cluster image.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id string, fmt string, n_bytes long, width int, height int, "
    "sample_rate int, channels int"
)

FEATURES_SCHEMA = "media_id string, fmt string, features array<float>"


def sniff_format(blob: bytes | None) -> str:
    if not blob:
        return "empty"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if blob[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if blob[:5] == b"%PDF-":
        return "pdf"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        return "webp"
    if len(blob) > 11 and blob[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def _png_dims(blob: bytes) -> tuple[int | None, int | None]:
    # IHDR is always the first chunk: length(4) 'IHDR'(4) width(4) height(4)
    if len(blob) >= 24 and blob[12:16] == b"IHDR":
        w, h = struct.unpack(">II", blob[16:24])
        return int(w), int(h)
    return None, None


def _wav_audio_meta(blob: bytes) -> tuple[int | None, int | None]:
    # RIFF....WAVE then chunks; 'fmt ' holds channels(2 LE) + sample_rate(4 LE)
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 16 <= len(blob):
            (channels,) = struct.unpack("<H", blob[pos + 10 : pos + 12])
            (rate,) = struct.unpack("<I", blob[pos + 12 : pos + 16])
            return int(rate), int(channels)
        pos += 8 + clen + (clen % 2)
    return None, None


def extract_media_meta(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Typed metadata from opaque binary: one narrow Arrow-batched pass
    over the scan — the multimodal analogue of the header-only read."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob) if blob is not None else None
                fmt = sniff_format(blob)
                width = height = sample_rate = channels = None
                if fmt == "png":
                    width, height = _png_dims(blob)
                elif fmt == "wav":
                    sample_rate, channels = _wav_audio_meta(blob)
                rows.append(
                    (str(mid), fmt, len(blob) if blob else 0, width, height, sample_rate, channels)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "fmt", "n_bytes", "width", "height", "sample_rate", "channels",
                ],
            )

    return df.select(
        df[id_col].cast("string").alias(id_col), df[content_col].alias(content_col)
    ).mapInPandas(batches, MEDIA_META_SCHEMA)


def _fake_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder/embedder: md5-derived
    floats in [0,1). STUB — replace with a real decode + model on a
    cluster image that ships the decode libs."""
    h = hashlib.md5(blob or b"").digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65536.0 for i in range(dim)]


def extract_features(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content", dim: int = 8
) -> DataFrame:
    """Decode → feature-extract plumbing (resize/frame-sample collapse to
    the same batch shape). Deterministic fake features exercise schema,
    batching and downstream similarity joins end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (
                    str(mid),
                    sniff_format(bytes(blob) if blob is not None else None),
                    _fake_features(bytes(blob) if blob is not None else b"", dim),
                )
                for mid, blob in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "fmt", "features"])

    return df.select(
        df[id_col].cast("string").alias(id_col), df[content_col].alias(content_col)
    ).mapInPandas(batches, FEATURES_SCHEMA)


def make_png(width: int, height: int) -> bytes:
    """Deterministic minimal PNG (header + IHDR only) for fixtures."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def make_wav(sample_rate: int, channels: int) -> bytes:
    """Deterministic minimal WAV (RIFF + fmt chunk) for fixtures."""
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16)
    return b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt


def _synth_blob(did: int) -> bytes:
    if did % 2 == 0:
        return make_png((did % 16 + 1) * 8, (did % 7 + 1) * 8)
    return make_wav(8000 + (did % 8) * 1000, 2 if did % 4 == 3 else 1)


def synthetic_media_meta(documents: DataFrame) -> DataFrame:
    """Fused synthesize→header-decode in ONE ``mapInPandas`` pass.

    The composable pair (``synthetic_media`` → ``extract_media_meta``)
    crosses the JVM↔Python Arrow boundary twice per row batch; each blob
    is serialized out of Python, into the JVM, and back. For a chain
    whose intermediate is only consumed by the next Python step, fusing
    halves the Arrow traffic and the Python-worker round-trips — the
    pattern any real decode pipeline should use at scale."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                blob = _synth_blob(did)
                fmt = sniff_format(blob)
                width = height = sample_rate = channels = None
                if fmt == "png":
                    width, height = _png_dims(blob)
                elif fmt == "wav":
                    sample_rate, channels = _wav_audio_meta(blob)
                rows.append((str(did), fmt, len(blob), width, height, sample_rate, channels))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "fmt", "n_bytes", "width", "height", "sample_rate", "channels",
                ],
            )

    return documents.select("doc_id").mapInPandas(batches, MEDIA_META_SCHEMA)


def synthetic_media_features(documents: DataFrame, dim: int = 8) -> DataFrame:
    """Fused synthesize→feature-extract (see ``synthetic_media_meta``)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                blob = _synth_blob(int(did))
                rows.append((str(int(did)), sniff_format(blob), _fake_features(blob, dim)))
            yield pd.DataFrame(rows, columns=["media_id", "fmt", "features"])

    return documents.select("doc_id").mapInPandas(batches, FEATURES_SCHEMA)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media corpus derived from the documents table: even
    doc_ids become PNGs (dims arithmetic on doc_id), odd ones WAVs. The
    blob content is an exact function of doc_id, so metadata extraction
    has a pure-SQL oracle — the binary round-trip (encode → sniff →
    header-decode) is what gets verified."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [(str(int(did)), _synth_blob(int(did))) for did in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return documents.select("doc_id").mapInPandas(
        batches, "media_id string, content binary"
    )


FRAMES_SCHEMA = (
    "media_id string, fmt string, n_frames int, frame_idx int, "
    "t_ms long, frame_fp long"
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Evenly-spaced frame sampling over opaque video/audio blobs — the
    ONE-ROW-IN, N-ROWS-OUT member of the multimodal plumbing family
    (meta/features are 1:1; a real frame sampler explodes each blob
    into per-frame rows, and THIS batch shape — pandas frames growing
    n_frames× inside ``mapInPandas``, schema declared up front, blobs
    never crossing a shuffle — is what the stub exercises end-to-end).

    Deterministic stand-ins, clearly marked (decode libs absent here):
    duration_ms = 1000 + (len(blob) * 37) % 9000 (a pure function of
    the blob, as a container parse would be) and the sampled frame is
    represented by an md5-derived BIGINT fingerprint of
    ``{media_id}#{t_ms}`` instead of decoded pixels. Frame timestamps
    are exact integer math: t_ms(i) = i * duration_ms // n_frames.
    Swap the two ``_STUB`` lines for a real demuxer on a cluster image
    — schema and batch shape stay identical."""
    cols = ["media_id", "fmt", "n_frames", "frame_idx", "t_ms", "frame_fp"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                fmt = sniff_format(blob)
                dur = 1000 + (len(blob) * 37) % 9000  # _STUB: container parse
                for i in range(n_frames):
                    t = (i * dur) // n_frames
                    fp = int(
                        hashlib.md5(f"{mid}#{t}".encode()).hexdigest()[:8], 16
                    )  # _STUB: decoded-frame payload
                    rows.append((str(mid), fmt, n_frames, i, t, fp))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, FRAMES_SCHEMA)


def synthetic_frame_sample(documents: DataFrame, n_frames: int = 4) -> DataFrame:
    """Fused synthesize→frame-sample over the documents table (one
    Arrow pass, same fusion argument as synthetic_media_meta): blobs
    from doc_id, frames from the blobs."""
    cols = ["media_id", "fmt", "n_frames", "frame_idx", "t_ms", "frame_fp"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                blob = _synth_blob(int(did))
                fmt = sniff_format(blob)
                dur = 1000 + (len(blob) * 37) % 9000
                for i in range(n_frames):
                    t = (i * dur) // n_frames
                    fp = int(
                        hashlib.md5(f"{did}#{t}".encode()).hexdigest()[:8], 16
                    )
                    rows.append((str(did), fmt, n_frames, i, t, fp))
            yield pd.DataFrame(rows, columns=cols)

    return documents.select("doc_id").mapInPandas(batches, FRAMES_SCHEMA)


def media_dedup_stats(documents: DataFrame) -> DataFrame:
    """Binary-blob exact dedup savings per media format — the
    multimodal sibling of text `dedup_exact`: hash the raw bytes
    (md5 over the BINARY column, computed where the blob lives — no
    decode, no Python in the hot path once blobs exist), count
    distinct blobs per format, and report the bytes a content-
    addressed store saves. The first question any image/audio corpus
    ingest answers ("30% of these crawled images are byte-identical").

    Plan: blob synthesis is the usual fused Arrow pass
    (`synthetic_media`); everything after is JVM-side — md5(binary),
    per-format combinable aggregate with a count-distinct over the
    32-hex digest. Blobs never shuffle: only (fmt, digest, n_bytes)
    rows do. Output: one row per fmt (fmt, n_blobs, n_unique,
    bytes_total, bytes_stored, savings_ratio)."""
    from pyspark.sql import functions as F

    media = synthetic_media(documents)
    rows = media.select(
        F.md5(F.col("content")).alias("digest"),
        F.length(F.col("content")).alias("n_bytes"),
        # JVM-side magic-byte sniff (hex of the first 4 bytes): the
        # SQL twin of sniff_format for the two formats synthesized here
        F.when(F.hex(F.substring(F.col("content"), 1, 4)) == "89504E47", "png")
        .otherwise("wav")
        .alias("fmt"),
    )
    per_digest = rows.groupBy("fmt", "digest").agg(
        F.count(F.lit(1)).alias("n"), F.min("n_bytes").alias("n_bytes")
    )
    return (
        per_digest.groupBy("fmt")
        .agg(
            F.sum("n").cast("bigint").alias("n_blobs"),
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            F.sum(F.col("n") * F.col("n_bytes")).cast("bigint").alias(
                "bytes_total"
            ),
            F.sum("n_bytes").cast("bigint").alias("bytes_stored"),
        )
        .select(
            "fmt",
            "n_blobs",
            "n_unique",
            "bytes_total",
            "bytes_stored",
            F.round(
                1 - F.col("bytes_stored") / F.col("bytes_total"), 6
            ).alias("savings_ratio"),
        )
        .orderBy("fmt")
    )
