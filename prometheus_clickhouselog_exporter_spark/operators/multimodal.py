"""Multimodal column plumbing (SURVEY §2.3): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``FAKE1`` media blobs carry a deterministic synthetic payload
the stub "decodes"; any other format raises ``NotImplementedError`` with
the library that a real deployment would plug in. Everything around the
stub — the schema, the Arrow batch shape, the partitioning, the UDF
signatures — is real and tested, so swapping in PIL/ffmpeg is a local
change inside one function.

Scale: media rows are wide (MBs per row); the operators keep binary
columns out of shuffles (derive features first, then drop/aggregate) and
use ``maxPartitionBytes``-sized input splits so one task never holds more
than a bounded number of blobs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media binary, media_format string, media_kind string, "
    "width int, height int, n_frames int, sample_rate int"
)

_MAGIC = b"FAKE1"


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministically synthesize a media blob per row (test fixture).

    Layout: FAKE1 | kind byte | width u16 | height u16 | payload. Width /
    height derive from the id so assertions are computable.
    """
    i = F.col(id_col).cast("long")
    w = (F.pmod(i, 64) + 16).cast("int")
    h = (F.pmod(i * 7, 64) + 16).cast("int")
    kind_byte = {"image": 0, "audio": 1, "video": 2}[kind]
    blob = F.concat(
        F.lit(_MAGIC),
        F.unhex(F.lpad(F.hex(F.lit(kind_byte)), 2, "0")),
        F.unhex(F.lpad(F.hex(w), 4, "0")),
        F.unhex(F.lpad(F.hex(h), 4, "0")),
        F.encode(F.concat(F.lit("payload-"), i.cast("string")), "UTF-8"),
    )
    return df.withColumn("media", blob).withColumn("media_format", F.lit("fake1")).withColumn(
        "media_kind", F.lit(kind)
    )


def _decode_blob(blob: bytes) -> dict:
    """The stub decode. A real deployment replaces this body with
    PIL.Image.open / soundfile.read / av.open — signature stays."""
    if blob[:5] != _MAGIC:
        raise NotImplementedError(
            "non-FAKE1 media decode requires an image/audio library "
            "(PIL / soundfile / pyav) not present in this environment"
        )
    kind = blob[5]
    w, h = struct.unpack(">HH", blob[6:10])
    payload = blob[10:]
    return {
        "width": int(w),
        "height": int(h),
        "kind": ("image", "audio", "video")[kind],
        "payload_bytes": len(payload),
        "checksum": sum(payload) % 65536,
    }


def decode_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """mapInPandas decode → per-row feature struct; binary column dropped
    after decoding so downstream shuffles never carry blobs."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    ) + ", width int, height int, payload_bytes bigint, checksum bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[media_col].map(_decode_blob)
            pdf = pdf.drop(columns=[media_col])
            pdf["width"] = [f["width"] for f in feats]
            pdf["height"] = [f["height"] for f in feats]
            pdf["payload_bytes"] = [f["payload_bytes"] for f in feats]
            pdf["checksum"] = [f["checksum"] for f in feats]
            yield pdf

    return df.mapInPandas(op, out_schema)


def resize_stub(df: DataFrame, media_col: str, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: passes blobs through mapInPandas with the target
    dims recorded; the pixel work is the NotImplementedError stub."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resize(blob: bytes) -> bytes:
                meta = _decode_blob(blob)  # validates format
                # real impl: decode pixels, resample, re-encode
                return blob[:6] + struct.pack(">HH", target_w, target_h) + blob[10:]

            pdf[media_col] = pdf[media_col].map(_resize)
            yield pdf

    return df.mapInPandas(op, df.schema.simpleString()[7:-1].replace(":", " ").replace(",", ", "))


def frame_sample_stub(df: DataFrame, media_col: str, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row in → k frame rows out
    (mapInPandas is the right shape for row-expanding media ops)."""
    out_schema = "doc_id bigint, frame_idx int, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = _decode_blob(row[media_col])
                n_frames = max(meta["payload_bytes"] // 4, 1)  # fake frame count
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {"doc_id": row["doc_id"], "frame_idx": idx,
                         "width": meta["width"], "height": meta["height"]}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "width", "height"])

    return df.mapInPandas(op, out_schema)
