"""Deterministic embeddings (P16 stand-in) + cosine similarity (Q1).

The reference calls OpenAI text-embedding-3-large (3072 dims,
content_chunker_and_embedder.py:136-140, config.yaml:45-47). The rebuild
replaces the network call with seeded FEATURE HASHING: each whitespace
token hashes to (index, sign) of a fixed-dim vector, counts accumulate,
then L2-normalize. Stable across runs/processes, discriminative enough
that cosine-threshold retrieval tests are meaningful.

Cosine over ARRAY<FLOAT> is provided twice:
  - ``cosine_col`` — native zip_with/aggregate expression (JVM, codegen) —
    the hot path for similarity joins;
  - ``cosine_py``  — numpy, for inside pandas UDFs.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def _token_slot(token: str, dim: int) -> tuple[int, float]:
    h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
    return h % dim, 1.0 if (h >> 63) & 1 else -1.0


def embed_text_py(text: str | None, dim: int = DEFAULT_DIM) -> list[float]:
    vec = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").split():
        idx, sign = _token_slot(tok, dim)
        vec[idx] += sign
    n = math.sqrt(float(vec @ vec))
    if n > 0:
        vec /= n
    return [float(x) for x in vec]


def embed_udf(dim: int = DEFAULT_DIM):
    """Iterator pandas UDF: STRING → ARRAY<FLOAT>[dim]."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda t: embed_text_py(t, dim))

    return _embed


def cosine_py(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Native cosine similarity over two ARRAY<FLOAT> columns (no Python)."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))
