"""Multimodal column plumbing: media spans as typed binary assets.

The reference treats media blocks (image/video/file/pdf) as opaque URLs
rendered into markdown (to_markdown_parser.py:255-348); a training-data
pipeline additionally needs to decode / feature-extract / resize /
frame-sample them. This module makes the SPARK-SIDE plumbing real —
schema, partitioning, Arrow batch shape, UDF signatures — while the codec
step is stubbed (image/audio libs are not in this container):

  - ``media_assets``  : explode media spans → (doc_id, kind, media_ref,
    payload BINARY, meta) — payload synthesized deterministically from the
    ref (stands in for a fetch from blob storage).
  - ``decode_features``: mapInPandas over Arrow batches producing typed
    features (width/height/n_frames/feature vector). With
    ``real_codecs=True`` it raises NotImplementedError at the exact point
    a PIL/ffmpeg call would go; the default path computes deterministic
    fake features from the payload bytes so the distributed plumbing is
    testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knowledge_nexus_spark.schema import MEDIA_KINDS

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_assets(documents: DataFrame) -> DataFrame:
    """Explode media spans into an asset table with a BINARY payload.

    The payload here is a deterministic synthesis of the ref (in
    production: a distributed fetch against blob storage, partitioned by
    hash(media_ref) so one hot asset host doesn't pin one task)."""
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    spans = documents.select(
        "doc_id", F.explode("spans").alias("sp")
    ).filter(F.expr(f"sp.kind IN ({kinds})"))
    return spans.select(
        "doc_id",
        F.col("sp.kind").alias("kind"),
        F.col("sp.media_ref").alias("media_ref"),
        # deterministic fake payload: sha-stretched bytes of the ref
        F.sha2(F.col("sp.media_ref"), 256).cast("binary").alias("payload"),
    ).repartition(F.col("media_ref"))


def _fake_decode(kind: str, payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the codec: derives pseudo-dimensions and
    an 8-dim feature vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    n_frames = 1 if kind in ("image", "pdf", "file") else 1 + d[2] % 120
    feats = [round((b / 255.0) * 2 - 1, 6) for b in d[3:11]]
    return width, height, n_frames, feats


def decode_features(assets: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the asset table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, ref, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["media_ref"], pdf["payload"]
            ):
                if real_codecs:
                    # the PIL/ffmpeg call would go here; libs absent in
                    # this container by design
                    raise NotImplementedError(
                        "real media codecs are not available in this environment"
                    )
                payload = bytes(payload) if payload is not None else b""
                w, h, nf, feats = _fake_decode(kind, payload)
                rows.append((doc_id, kind, ref, len(payload), w, h, nf, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "media_ref", "byte_len",
                    "width", "height", "n_frames", "features",
                ],
            )

    return assets.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video assets: one row per sampled frame
    index — a pure native sequence explode, the real decode would slot
    into a downstream mapInPandas keyed by (media_ref, frame_idx)."""
    vids = features.filter(F.col("kind") == "video")
    return vids.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
