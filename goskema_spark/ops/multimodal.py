"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image` raises NotImplementedError unless a decoder is injected;
`fake_feature_extract` is the deterministic stand-in used by tests and
benchmarks. Everything around the stub — schemas, batch iteration,
partitioning, output shapes — is real Spark plumbing that a real decoder
(PIL / torchaudio / pyav) would drop into unchanged.

Scale notes: payloads stay opaque bytes end-to-end (no JVM<->Python
base64 churn — Arrow ships binary columns zero-copy); feature extraction
is embarrassingly parallel (no shuffle); downstream dedup/ANN reuse
ops.dedup / ops.similarity on the extracted vectors.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("payload", T.BinaryType(), True),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha", T.StringType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic media table derived from `documents`:
    payload = utf-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), metadata derived from doc stats."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decoder hook — not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; inject a decoder via "
        "extract_features(decoder=...) in an environment that has one")


def fake_feature_extract(payload: bytes, dim: int = FEATURE_DIM) -> list:
    """Deterministic stand-in for an embedding model: md5-chained bytes
    mapped to [-1, 1) floats. Pure function of the payload."""
    out = []
    h = hashlib.md5(payload).digest()
    while len(out) < dim:
        for i in range(0, 16, 4):
            out.append(int.from_bytes(h[i:i + 4], "big") / float(2**31) - 1.0)
            if len(out) == dim:
                break
        h = hashlib.md5(h).digest()
    return out


def extract_features(media: DataFrame,
                     decoder: Optional[Callable] = None,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """media -> (media_id, kind, n_bytes, sha, features). Arrow-batched;
    `decoder(payload) -> bytes` runs before feature extraction when given
    (e.g. decode JPEG -> raw pixels); default path hashes the opaque
    payload directly."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if decoder is not None:
                    raw = decoder(raw)
                rows.append({
                    "media_id": int(mid),
                    "kind": str(kind),
                    "n_bytes": len(raw),
                    "sha": hashlib.sha256(raw).hexdigest(),
                    "features": fake_feature_extract(raw, dim),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000,
                      max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx, ts_ms) — the
    Spark-side fan-out a real frame extractor would consume. Pure
    expressions (sequence + explode), no Python."""
    vids = media.filter(F.col("kind") == "video")
    n = F.least(F.floor(F.col("meta.duration_ms") / every_ms) + 1, F.lit(max_frames))
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), (n - 1).cast("int"))).alias("frame_idx", "_i"),
    ).select(
        "media_id", "frame_idx",
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
    )
