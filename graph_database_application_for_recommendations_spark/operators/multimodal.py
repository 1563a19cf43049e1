"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — binary payload column, typed
metadata struct, Arrow-batched ``mapInPandas`` feature extraction with an
explicit output schema and bounded batch sizes. The actual media *decode*
step is stubbed (this container ships no image/audio libs): decoders are
looked up per kind, and the default deterministic stub extracts
byte-level features (length, crc32, first/last byte) so the distributed
pipeline shape is fully exercisable. Dropping in a real decoder is a
one-function change (see ``DECODERS``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_source", StringType()),
        StructField("meta_lang", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("crc32", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
    ]
)


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table from the documents fixture:
    payload = utf-8 bytes of the text, kind round-robins text/image/audio."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("text"))
        .when(F.col("doc_id") % 3 == 1, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
        F.col("lang").alias("meta_lang"),
    )


def _decode_image(payload: bytes) -> dict:
    """Real image decode would go here (PIL/opencv not in this container)."""
    raise NotImplementedError("image decoding requires an image library; stubbed")


def _decode_audio(payload: bytes) -> dict:
    raise NotImplementedError("audio decoding requires an audio library; stubbed")


def _byte_features(payload: bytes) -> dict:
    import zlib

    return {
        "n_bytes": len(payload),
        "crc32": zlib.crc32(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
    }


# kind -> decoder; unknown/stubbed kinds fall back to deterministic
# byte-level features so the pipeline stays runnable end-to-end.
DECODERS = {"image": _decode_image, "audio": _decode_audio}


def extract_features(
    assets: DataFrame, batch_size: int = 256, rows_per_task: int = 2048
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps the whole batch in one Python call (no per-row
    overhead). The input is repartitioned first so the Python workers fan
    out across the cluster even when the source is a single file — but the
    fan-out is sized to the data via the catalog size estimate
    (``plans.fanout_partitions`` — no pre-scan job), capped at the
    cluster's parallelism: spawning a Python worker per core for a few
    thousand rows pays seconds of interpreter startup for milliseconds of
    work, while at 100 TB the estimate pushes the partition count to the
    cluster-wide cap.
    """
    from ..plans import fanout_partitions

    assets = assets.repartition(fanout_partitions(assets))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                decoder = DECODERS.get(kind)
                if decoder is not None:
                    try:
                        feats = decoder(payload)
                    except NotImplementedError:
                        feats = _byte_features(payload)
                else:
                    feats = _byte_features(payload)
                out.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "n_bytes": feats["n_bytes"],
                        "crc32": feats["crc32"],
                        "first_byte": feats["first_byte"],
                        "last_byte": feats["last_byte"],
                    }
                )
            # bound output batch size to keep Arrow buffers small
            for i in range(0, len(out), batch_size):
                yield pd.DataFrame(out[i : i + batch_size])

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def asset_meta(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, n_bytes): metadata projection that never touches a
    decoder — fully native, oracle-checkable."""
    return assets.select(
        "asset_id", "kind", F.length(F.col("payload")).cast("long").alias("n_bytes")
    )


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """(asset_id, frame_idx, frame_bytes): frame sampling over temporal
    media — video frames and audio chunks (both ``kind`` values expand;
    image/other rows are dropped) — a 1→N `mapInPandas` expansion (each
    input row yields up to ``max_frames`` output rows), the Spark shape
    real frame extraction needs. A real decoder (pyav/ffmpeg — not in this
    container) would replace ``_fake_frames``; the deterministic stub
    slices the payload at fixed strides so tests pin the distributed
    plumbing end-to-end.
    """

    def _fake_frames(payload: bytes) -> list[bytes]:
        return [
            payload[off : off + every_n_bytes]
            for off in range(0, min(len(payload), every_n_bytes * max_frames), every_n_bytes)
        ]

    from ..plans import fanout_partitions

    src = assets.repartition(fanout_partitions(assets))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" and kind != "audio":
                    continue  # frame sampling only applies to temporal media
                payload = bytes(payload) if payload is not None else b""
                for i, fr in enumerate(_fake_frames(payload)):
                    out.append({"asset_id": asset_id, "frame_idx": i, "frame_bytes": fr})
            if out:
                yield pd.DataFrame(out)

    return src.mapInPandas(_extract, FRAME_SCHEMA)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """(asset_id, kind, width, height, payload): image resize plumbing.

    A real decoder (PIL — not in this container) would decode, resize and
    re-encode; the stub deterministically truncates/pads the payload to
    width*height bytes so the output contract (fixed-size payload, typed
    dims) and the Arrow batch shape are fully exercised.
    """
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                payload = bytes(payload) if payload is not None else b""
                resized = payload[:target].ljust(target, b"\0")
                out.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "width": width,
                        "height": height,
                        "payload": resized,
                    }
                )
            if out:
                yield pd.DataFrame(out)

    from ..plans import fanout_partitions

    return assets.repartition(fanout_partitions(assets)).mapInPandas(
        _resize, RESIZE_SCHEMA
    )
