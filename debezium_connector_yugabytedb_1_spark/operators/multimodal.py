"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample operators.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the codec step is STUBBED with a
deterministic fake because no image/audio libraries exist in this container
— swap ``_fake_decode`` for PIL/torchaudio on a real cluster; the operator
contract does not change.

Scale notes: binary payloads ride in parquet as byte arrays; decode happens
inside ``mapInPandas`` so bytes never leave executors, batches stay
Arrow-backed, and partition sizing (``spark.sql.files.maxPartitionBytes``)
bounds executor memory per task.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a deterministic multimodal table from documents: payload =
    utf-8 bytes of the text (stand-in for encoded media), typed metadata
    derived deterministically."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(64)) * 16 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) * 16 + 64).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), F.lit(9000)) + 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB codec: a real deployment decodes image/audio bytes here (PIL /
    libsndfile). The fake is deterministic: bytes → uint8 array."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(
    media: DataFrame, n_features: int = 8, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: per media row, n_features
    deterministic statistics of the decoded byte tensor (mean/std/moments
    stand in for a CNN embedding). Arrow-batched; zero per-row Python at the
    Spark boundary.

    ``carry_cols``: metadata columns passed THROUGH the same Arrow batch so
    consumers need no join back to the media table (a media×features join
    re-shuffles the binary payloads' table for nothing)."""
    carry = list(carry_cols)

    def feats(batches):
        cols = ["doc_id", *carry, "features", "n_bytes"]
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows:
                # Vectorized over the whole Arrow batch: concatenate every
                # decoded payload into one float array, compute per-row chunk
                # boundaries replicating np.array_split (first len%n chunks
                # one element longer), and take chunk means via a single
                # cumulative sum — no per-row numpy calls, no per-row dicts.
                # each payload runs through the codec seam (_fake_decode —
                # swap for PIL/torchaudio on a real cluster); everything
                # AFTER decode stays vectorized over the whole Arrow batch
                decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
                lens = np.fromiter(
                    (d.size for d in decoded), dtype=np.int64, count=n_rows
                )
                big = (
                    np.concatenate(decoded)
                    if decoded
                    else np.zeros(0, dtype=np.uint8)
                )
                csum = np.concatenate(
                    ([0.0], np.cumsum(big, dtype=np.float64))
                )
                q, r = lens // n_features, lens % n_features
                sizes = q[:, None] + (np.arange(n_features)[None, :] < r[:, None])
                row_off = np.concatenate(([0], np.cumsum(lens)))[:-1]
                ends = row_off[:, None] + np.cumsum(sizes, axis=1)
                starts = ends - sizes
                sums = csum[ends] - csum[starts]
                with np.errstate(invalid="ignore", divide="ignore"):
                    means = np.where(sizes > 0, sums / sizes, 0.0)
                features = means.tolist()
            else:
                lens = np.zeros(0, dtype=np.int64)
                features = []
            out = pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": features,
                 "n_bytes": lens}
            )
            for c in carry:
                out[c] = pdf[c].values
            # empty Arrow batches (limit pushdown, empty partitions) must
            # still carry the declared columns
            yield out[cols]

    carry_ddl = "".join(
        f", {c} {media.schema[c].dataType.simpleString()}" for c in carry
    )
    return media.select("doc_id", "payload", *carry).mapInPandas(
        feats, schema=f"doc_id long{carry_ddl}, features array<double>, n_bytes long"
    )


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize operator (STUB codec): output payload is a deterministic
    digest-derived byte block of the target size — the real version calls
    PIL here. Plumbing (binary in → binary out, metadata update) is real."""

    def resize(batches):
        for pdf in batches:
            imgs = pdf[pdf["media_type"] == "image"]
            out = imgs.copy()
            out["payload"] = out["payload"].map(
                lambda p: hashlib.sha256(bytes(p)).digest() * ((target_w * target_h) // 32 + 1)
            ).map(lambda b: b[: target_w * target_h])
            out["width"] = target_w
            out["height"] = target_h
            yield out[["doc_id", "media_type", "payload", "width", "height", "duration_ms"]]

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sample operator for video rows: one output row per sampled
    timestamp (explode on a JVM-side sequence — the codec stub only fills
    the frame payload)."""
    vids = media.where(F.col("media_type") == "video")
    frames = vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
        "payload",
    )

    def cut(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["frame"] = [
                hashlib.md5(bytes(p) + int(m).to_bytes(4, "little")).digest()
                for p, m in zip(pdf["payload"], pdf["frame_ms"])
            ]
            yield pdf[["doc_id", "frame_ms", "frame"]]

    return frames.mapInPandas(cut, schema="doc_id long, frame_ms int, frame binary")
