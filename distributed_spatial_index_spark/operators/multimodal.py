"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed through Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the CODECS ARE DETERMINISTIC FAKES clearly
marked below — this container has no image/audio libraries, so "decode"
interprets our own synthetic blob layout.  Swapping in PIL/ffmpeg later
only changes the inside of the fake functions.

Blob layout (synthetic): header 8 bytes = (width:uint32le, height:uint32le),
then width*height payload bytes ("pixels" / "samples" / concatenated
"frames" of width*height bytes each for video).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_TYPES = ["image", "audio", "video"]
HEADER = 8


def _parse_header(blob) -> tuple[int, int] | None:
    """(w, h) from a blob, or None when the blob is malformed (short
    header, zero dims, or no payload).  Decoders DROP malformed rows —
    crashing an executor on one corrupt object is never the right
    behavior in a 100-TB media scan; a real build would also count these
    into a metrics sink."""
    b = bytes(blob) if blob is not None else b""
    if len(b) <= HEADER:
        return None
    w, h = struct.unpack("<II", b[:HEADER])
    if w == 0 or h == 0 or len(b) < HEADER + w * h:
        return None
    return int(w), int(h)


def media_row(mid: int, max_dim: int = 16, n_frames: int = 4) -> tuple:
    """One deterministic fake media row for ``mid`` — the single source of
    truth for the synthetic blob layout (scripts/gen_expected.py builds its
    independent expected tables against this exact contract)."""
    rng = np.random.default_rng(1000 + int(mid))
    mtype = MEDIA_TYPES[int(mid) % 3]
    w = 4 + int(mid) % (max_dim - 4)
    h = 4 + (int(mid) // 3) % (max_dim - 4)
    frames = n_frames if mtype == "video" else 1
    payload = rng.integers(0, 256, w * h * frames, dtype=np.uint8)
    blob = struct.pack("<II", w, h) + payload.tobytes()
    return (int(mid), mtype, w, h, blob)


def _media_from_ids(
    base: DataFrame, max_dim: int = 16, n_frames: int = 4
) -> DataFrame:
    """base(media_id long) -> (media_id, media_type, width, height, blob).

    Generated per-partition in mapInPandas (never on the driver) so the
    generator itself scales; contents are a pure function of media_id.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [media_row(mid, max_dim, n_frames) for mid in pdf["media_id"]]
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "width", "height", "blob"]
            )

    return base.mapInPandas(
        gen,
        schema="media_id long, media_type string, width int, height int, blob binary",
    )


def synthetic_media(
    spark: SparkSession, n: int = 200, max_dim: int = 16, n_frames: int = 4
) -> DataFrame:
    """(media_id, media_type, width, height, blob): deterministic fake blobs
    for media_id in [0, n)."""
    return _media_from_ids(
        spark.range(n).select(F.col("id").alias("media_id")), max_dim, n_frames
    )


def media_from_documents(
    spark: SparkSession, sf_dir: str, max_dim: int = 16, n_frames: int = 4
) -> DataFrame:
    """Scale-factor-coupled media table: one fake blob per documents row
    (media_id = doc_id).  This is the driver-gate input.  Note the testdata
    documents doc_id SETS coincide between sf0.001 and sf0.01 (only doc
    bodies differ), so the committed expected parquets for the media gates
    are byte-identical across those sfs — sf dispatch correctness in
    _expected_parquet_sql comes from the lineitem row-count key, not from
    differing media rows."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("media_id")
    )
    return _media_from_ids(base, max_dim, n_frames)


def decode_features(media: DataFrame) -> DataFrame:
    """'Decode' + feature-extract: (media_id, mean, std, histo4 array).

    FAKE CODEC: reads the synthetic header + payload bytes; a real build
    would call PIL/soundfile here (same batch shape, same schema).
    """

    def fx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if _parse_header(blob) is None:
                    continue  # corrupt object: drop, never crash the scan
                px = np.frombuffer(bytes(blob)[HEADER:], dtype=np.uint8)
                hist = np.bincount(px >> 6, minlength=4).astype(np.float64)
                out.append((
                    int(mid), float(px.mean()), float(px.std()),
                    (hist / hist.sum()).tolist(),
                ))
            yield pd.DataFrame(
                out, columns=["media_id", "mean", "std", "histo4"]
            )

    return media.select("media_id", "blob").mapInPandas(
        fx, schema="media_id long, mean double, std double, histo4 array<double>"
    )


def resize_media(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """'Resize' via nearest-neighbor index math on the fake pixel grid —
    the batch plumbing of a real resampler.  Output blob has the same
    layout with the new header."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                wh = _parse_header(blob)
                if wh is None:
                    continue  # corrupt object: drop, never crash the scan
                w, h = wh
                px = np.frombuffer(bytes(blob)[HEADER:HEADER + w * h], dtype=np.uint8)
                img = px.reshape(h, w)
                yi = (np.arange(new_h) * h // new_h)
                xi = (np.arange(new_w) * w // new_w)
                small = img[np.ix_(yi, xi)]
                out.append((
                    int(mid),
                    struct.pack("<II", new_w, new_h) + small.tobytes(),
                ))
            yield pd.DataFrame(out, columns=["media_id", "blob"])

    return media.select("media_id", "blob").mapInPandas(
        rs, schema="media_id long, blob binary"
    )


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for 'video' blobs: one output row per kept frame,
    (media_id, frame_no, frame binary)."""

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                wh = _parse_header(blob)
                if wh is None:
                    continue  # corrupt object: drop, never crash the scan
                w, h = wh
                payload = bytes(blob)[HEADER:]
                fsize = w * h
                n_frames = len(payload) // fsize
                for fno in range(0, n_frames, every_nth):
                    out.append((int(mid), fno,
                                payload[fno * fsize:(fno + 1) * fsize]))
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", "blob")
        .mapInPandas(sf, schema="media_id long, frame_no int, frame binary")
    )
