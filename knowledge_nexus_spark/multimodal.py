"""Multimodal column plumbing: media spans as typed binary assets.

The reference treats media blocks (image/video/file/pdf) as opaque URLs
rendered into markdown (to_markdown_parser.py:255-348); a training-data
pipeline additionally needs to decode / feature-extract / resize /
frame-sample them. This module makes the SPARK-SIDE plumbing real —
schema, partitioning, Arrow batch shape, UDF signatures — AND the decode
step executable without external media libraries:

  - ``media_assets``  : explode media spans → (doc_id, kind, media_ref,
    payload BINARY, meta). ``real_payloads=True`` synthesizes VALID
    container bytes per kind (hand-rolled 24-bit BMP for images, PCM WAV
    for audio/video, %PDF skeleton for documents — deterministic functions
    of the ref, standing in for a blob-storage fetch); the default keeps
    the cheap sha-stretched opaque payload.
  - ``decode_features``: mapInPandas over Arrow batches producing typed
    features (width/height/n_frames/feature vector). With
    ``real_codecs=True`` it actually parses the containers: PIL when
    importable, stdlib struct/wave parsing otherwise — so the "real"
    path runs end-to-end in this environment on the synthetic payloads
    and slots a PIL/ffmpeg call in transparently where available. The
    default path computes deterministic fake features from the payload
    digest (no parsing), useful when payloads are opaque.
"""

from __future__ import annotations

import hashlib
import io
import struct
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

WAV_RATE = 16000
FRAME_SAMPLES = WAV_RATE // 10  # 100ms hops → n_frames for audio/video


# ------------------------------------------------------ payload synthesis --

def _stretch(seed: bytes, size: int) -> bytes:
    return (seed * (size // len(seed) + 1))[:size]


def bmp_bytes(width: int, height: int, seed: bytes) -> bytes:
    """Minimal valid 24-bit bottom-up BMP (BITMAPINFOHEADER), no libs."""
    row = width * 3
    pad = (4 - row % 4) % 4
    size_img = (row + pad) * height
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + size_img, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, size_img, 2835, 2835, 0, 0
    )
    return header + info + _stretch(seed, size_img)


def wav_bytes(n_samples: int, seed: bytes) -> bytes:
    """Minimal valid PCM WAV: mono, 16 kHz, 16-bit."""
    data = _stretch(seed, 2 * n_samples)
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_payload_py(kind: str, media_ref: str) -> bytes:
    """Deterministic VALID payload bytes per media kind — the sandbox
    stand-in for fetching the asset from blob storage."""
    d = hashlib.sha256((media_ref or "").encode()).digest()
    if kind == "image":
        return bmp_bytes(64 + d[0] % 64, 64 + d[1] % 64, d)
    if kind in ("video", "audio"):
        # 0.5–4.5s of audio; video frame count derives from duration
        return wav_bytes(WAV_RATE // 2 + d[2] * 256, d)
    body = _stretch(d, 2048 + d[3] * 8)
    if kind == "pdf":
        return b"%PDF-1.4\n" + body + b"\n%%EOF"
    return body  # generic file: opaque bytes


# ------------------------------------------------------------ asset table --

def media_assets(documents: DataFrame, real_payloads: bool = False) -> DataFrame:
    """Explode media spans into an asset table with a BINARY payload.

    ``real_payloads=True`` synthesizes valid container bytes (BMP/WAV/PDF)
    via an Arrow-batched UDF; the default is a cheap opaque sha payload.
    In production this projection is a distributed fetch against blob
    storage — hence the repartition by hash(media_ref), so one hot asset
    host doesn't pin one task."""
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    spans = documents.select(
        "doc_id", F.explode("spans").alias("sp")
    ).filter(F.expr(f"sp.kind IN ({kinds})"))
    base = spans.select(
        "doc_id",
        F.col("sp.kind").alias("kind"),
        F.col("sp.media_ref").alias("media_ref"),
    )
    if real_payloads:
        @F.pandas_udf(T.BinaryType())
        def _payload(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
            for pdf in it:
                yield pd.Series(
                    [synth_payload_py(k, r) for k, r in zip(pdf["kind"], pdf["media_ref"])]
                )

        payload = _payload(F.struct("kind", "media_ref"))
    else:
        payload = F.sha2(F.col("media_ref"), 256).cast("binary")
    # Repartition BEFORE computing the payload: the fetch must execute in
    # the post-shuffle (media_ref-hashed) tasks for the redistribution to
    # spread load across asset hosts — projecting first would run the
    # fetch in the explode's partitioning and shuffle only the fetched
    # bytes (heavier AND still hot-host-pinned). The partition count is
    # pinned (defaultParallelism) because AQE coalesces an unnumbered
    # repartition by BYTES — these rows are ~60 B but cost ~0.2 ms of
    # Python each, so byte-sized coalescing serializes the fetch+decode.
    n = documents.sparkSession.sparkContext.defaultParallelism
    return base.repartition(n, F.col("media_ref")).withColumn("payload", payload)


# ----------------------------------------------------------------- decode --

def _fake_decode(kind: str, payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the codec: derives pseudo-dimensions and
    an 8-dim feature vector from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    n_frames = 1 if kind in ("image", "pdf", "file") else 1 + d[2] % 120
    feats = [round((b / 255.0) * 2 - 1, 6) for b in d[3:11]]
    return width, height, n_frames, feats


def _byte_hist(payload: bytes) -> list[float]:
    """8-bin normalized byte histogram — the deterministic stand-in for a
    learned feature extractor, computed from the DECODED bytes."""
    import numpy as np

    if not payload:
        return [0.0] * 8
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = np.bincount(arr >> 5, minlength=8).astype(np.float64) / len(arr)
    return [round(float(x), 6) for x in h]


def _parse_bmp(payload: bytes) -> tuple[int, int]:
    if payload[:2] != b"BM" or len(payload) < 26:
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    return int(width), abs(int(height))


def _real_decode(kind: str, payload: bytes) -> tuple[int, int, int, list[float]]:
    """Parse the actual container. PIL decodes images when importable
    (absent in this environment by design); the stdlib fallbacks parse the
    BMP header via struct and WAV via the wave module — real header
    parsing either way, so malformed payloads fail loudly."""
    if kind == "image":
        try:
            from PIL import Image  # pragma: no cover - lib absent here

            img = Image.open(io.BytesIO(payload))
            width, height = img.size
        except ImportError:
            width, height = _parse_bmp(payload)
        return width, height, 1, _byte_hist(payload[54:])
    if kind in ("video", "audio"):
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            n_samples, rate = w.getnframes(), w.getframerate()
        n_frames = max(1, n_samples * WAV_RATE // (rate * FRAME_SAMPLES))
        return 0, 0, n_frames, _byte_hist(payload[44:])
    if kind == "pdf":
        if not payload.startswith(b"%PDF"):
            raise ValueError("not a PDF payload")
        return 0, 0, 1, _byte_hist(payload)
    return 0, 0, 1, _byte_hist(payload)


def decode_features(assets: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the asset table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, ref, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["media_ref"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                decode = _real_decode if real_codecs else _fake_decode
                w, h, nf, feats = decode(kind, payload)
                rows.append((doc_id, kind, ref, len(payload), w, h, nf, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "media_ref", "byte_len",
                    "width", "height", "n_frames", "features",
                ],
            )

    return assets.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


def media_features_fused(
    documents: DataFrame, real_codecs: bool = True
) -> DataFrame:
    """Fused synthesize+decode: ONE Python stage computing exactly
    ``decode_features(media_assets(docs, real_payloads=True), real_codecs)``.

    The unfused pair moves every payload across the JVM↔Python boundary
    twice (synth UDF → Arrow → JVM → Arrow → decode UDF) even though no
    JVM operator ever reads the bytes — at ~100 KB/asset that boundary
    traffic dominates the query (guide §4.1: you control how many columns
    cross; §8: heavy opaque payloads should move as few times as
    possible). Here the payload is BORN in Python and CONSUMED in Python,
    so the fused stage keeps it inside one worker and ships only the
    typed features back. The repartition by media_ref is retained — in
    production the synth slot is a blob-storage fetch and the shuffle
    (of the narrow (doc_id, kind, media_ref) rows only) spreads hot asset
    hosts across tasks.

    Equality with the unfused pair is pinned in tests
    (test_multimodal_streaming) and by the media_features hash gate."""
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    base = (
        documents.select("doc_id", F.explode("spans").alias("sp"))
        .filter(F.expr(f"sp.kind IN ({kinds})"))
        .select(
            "doc_id",
            F.col("sp.kind").alias("kind"),
            F.col("sp.media_ref").alias("media_ref"),
        )
        # pinned count: see media_assets — AQE would coalesce the narrow
        # rows to 1-2 byte-sized tasks and serialize the Python stage
        .repartition(
            documents.sparkSession.sparkContext.defaultParallelism,
            F.col("media_ref"),
        )
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if real_codecs else _fake_decode
        for pdf in batches:
            rows = []
            for doc_id, kind, ref in zip(
                pdf["doc_id"], pdf["kind"], pdf["media_ref"]
            ):
                payload = synth_payload_py(kind, ref)
                w, h, nf, feats = decode(kind, payload)
                rows.append((doc_id, kind, ref, len(payload), w, h, nf, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "media_ref", "byte_len",
                    "width", "height", "n_frames", "features",
                ],
            )

    return base.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)


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


def interleave_media_spans(
    flat: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Lift a flat (doc_id, text) corpus into an INTERLEAVED text+media
    span sequence (BASELINE.json input_hint shape) with a deterministic,
    fully native construction — every span is a pure function of the row,
    so a SQL oracle can reproduce the expected caption pairing in closed
    form. Layout per doc (array position = offset):

      0 paragraph  substr(text, 1, 60)
      1 image      img://<id>/a
      2 paragraph  substr(text, 61, 60)
      3 image      img://<id>/b           when id % 2 == 0
        paragraph  substr(text, 121, 60)  otherwise
      4 image      img://<id>/c           only when id % 3 == 0
    """
    did = F.col(id_col).cast("long")
    t = F.col(text_col)
    nul = F.lit(None).cast("string")

    def span(kind, text, ref, off):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            ref.alias("media_ref"),
            F.lit(off).cast("int").alias("offset"),
        )

    img = lambda suffix, off: span(  # noqa: E731
        "image", nul, F.concat(F.lit("img://"), did.cast("string"), F.lit(suffix)), off
    )
    base = F.array(
        span("paragraph", F.substring(t, 1, 60), nul, 0),
        img("/a", 1),
        span("paragraph", F.substring(t, 61, 60), nul, 2),
    )
    third = F.when(did % 2 == 0, F.array(img("/b", 3))).otherwise(
        F.array(span("paragraph", F.substring(t, 121, 60), nul, 3))
    )
    empty = F.array().cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    fourth = F.when(did % 3 == 0, F.array(img("/c", 4))).otherwise(empty)
    return flat.select(
        did.cast("string").alias("doc_id"),
        F.concat(base, third, fourth).alias("spans"),
    )


def caption_pairs(documents: DataFrame, keep_kind: bool = False) -> DataFrame:
    """Image-caption alignment over an interleaved span sequence: each
    media span pairs with the NEAREST PRECEDING text span in its document
    (the caption-matching step of a multimodal training-data pipeline;
    the reference walks blocks in order and attaches context the same
    way — /root/reference/graph_rag/processor/to_markdown_parser.py
    renders children under their parent block).

    Plan shape (pinned in tests): posexplode → ONE window over
    (doc_id, pos) computing last(text, ignorenulls) → filter media rows.
    A single hash Exchange on doc_id, zero joins, zero Python — at 100 TB
    the window never materializes more than one document's spans per
    task sort buffer. Media with no preceding text keeps a NULL caption
    (caller decides drop-or-default).

    ``keep_kind=True`` additionally carries the media span's kind column
    (the pipeline's media stage needs it for node typing; the driver
    query keeps the 4-column contract)."""
    from pyspark.sql import Window

    ex = documents.select("doc_id", F.posexplode("spans").alias("pos", "s"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_text = F.col("s.kind") == "paragraph"
    # One struct per preceding paragraph span, so caption text and
    # position always come from the SAME span: a paragraph whose text is
    # NULL still wins the nearest-preceding race (caption NULL, distance
    # to it) exactly like caption_pairs_native's kind-only filter. Two
    # independent last(ignorenulls) columns would diverge there — the
    # text one skips the NULL-text span, the pos one counts it.
    cap = F.last(
        F.when(is_text, F.struct(F.col("pos").alias("p"), F.col("s.text").alias("t"))),
        ignorenulls=True,
    ).over(w)
    out = (
        ex.select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.media_ref").alias("media_ref"),
            "pos",
            cap["t"].alias("caption"),
            (F.col("pos") - cap["p"]).cast("int").alias("caption_distance"),
        )
        .filter(F.col("kind").isin(*MEDIA_KINDS))
        .drop("pos")
    )
    return out if keep_kind else out.drop("kind")


def caption_pairs_native(
    documents: DataFrame, keep_kind: bool = False
) -> DataFrame:
    """Zero-shuffle sibling of ``caption_pairs``: the caption of a media
    span depends only on ITS OWN document's spans array, so it is a pure
    per-row expression — index the array, filter to media positions, and
    for each take the last preceding paragraph via slice + filter +
    element_at(-1). No Exchange at all: embarrassingly parallel over
    document splits, the plan is scan → project → generate.

    Regime note: the prefix scan makes this O(spans²) per document worst
    case vs the window version's O(spans log spans) — for interleaved
    documents (tens of spans) the quadratic term is noise and saving the
    doc-keyed shuffle dominates; for pathological thousand-span documents
    prefer ``caption_pairs``. Both produce identical rows (equality
    pinned in tests)."""
    spans = F.col("spans")
    idx = F.transform(
        spans, lambda s, i: F.struct(s.alias("s"), i.alias("i"))
    )
    media = F.filter(idx, lambda p: p["s"]["kind"].isin(*MEDIA_KINDS))

    def cap(p):
        texts = F.filter(
            F.slice(idx, F.lit(1), p["i"]),
            lambda q: q["s"]["kind"] == F.lit("paragraph"),
        )
        last = F.try_element_at(texts, F.lit(-1))  # NULL when no preceding text
        return F.struct(
            p["s"]["kind"].alias("kind"),
            p["s"]["media_ref"].alias("media_ref"),
            last["s"]["text"].alias("caption"),
            (p["i"] - last["i"]).cast("int").alias("caption_distance"),
        )

    out = documents.select(
        "doc_id", F.explode(F.transform(media, cap)).alias("c")
    ).select(
        "doc_id",
        "c.kind",
        "c.media_ref",
        "c.caption",
        "c.caption_distance",
    )
    return out if keep_kind else out.drop("kind")


def media_graph(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Media assets as first-class KG citizens over the interleaved span
    sequence: (media nodes, HAS_MEDIA edges).

    The reference materializes bookmark blocks as their own nodes
    (notion_provider.py:288-296); media blocks get the same treatment
    here, with the caption (nearest preceding paragraph, see
    ``caption_pairs``) riding as edge context — the media half of KG
    construction over interleaved text+media documents.

    Determinism under re-partitioning: a media_ref appearing many times
    aggregates with min() (kind for the node type, caption for the edge
    context) — never first()/dropDuplicates, which are partition-order
    dependent. Scale: caption alignment is the zero-shuffle per-row
    expression (caption_pairs_native) plus one groupBy per output — the
    node groupBy shuffles only the distinct (media_ref, kind) pairs, the
    edge groupBy only (doc, ref, caption)."""
    caps = caption_pairs_native(documents, keep_kind=True)
    nodes = (
        caps.groupBy("media_ref")
        .agg(F.min("kind").alias("kind"))
        .select(
            F.col("media_ref").alias("id"),
            F.concat(F.lit("Media "), F.substring(F.md5("media_ref"), 1, 8)).alias(
                "title"
            ),
            F.initcap("kind").alias("type"),
            F.col("media_ref").alias("url"),
            F.lit(None).cast("string").alias("content"),
            F.lit("Media").alias("source"),
            F.lit(None).cast("string").alias("last_edited_time"),
        )
    )
    edges = (
        caps.groupBy(
            F.col("doc_id").alias("subj"), F.col("media_ref").alias("obj")
        )
        .agg(F.min("caption").alias("context"))
        .select("subj", F.lit("HAS_MEDIA").alias("pred"), "obj", "context")
    )
    return nodes, edges
