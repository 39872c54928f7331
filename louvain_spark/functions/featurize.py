"""Deterministic text featurizer — the engine's embedding stage (U1).

Replaces the reference's remote BGE-M3 embedding service
(/root/reference/tool/TextProcessor.py:19-87: per-text HTTPS call,
ProcessPoolExecutor(10), retry ×3, zeros on failure) with an in-engine,
deterministic, vectorized hashing-trick featurizer: character n-grams →
signed hash buckets → L2-normalized float32 vector. Preserves the operator
shape (text → ArrayType(FloatType), unit-norm, fixed dim — dim 1024
float32 in the reference, /root/reference/tool/TextProcessor.py:25 and
Neo4jLouvainProcessor.py:96-101) with no network and no per-row Python:
one Arrow-batched pandas UDF doing numpy over the whole batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

# FNV-1a constants — stable across platforms/processes (never rely on
# Python's salted hash())
_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_MASK64 = (1 << 64) - 1


def _fnv1a_bytes(data: bytes) -> int:
    # python ints with explicit 64-bit wraparound (numpy uint64 emits
    # overflow RuntimeWarnings on the intentional modular multiply)
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def featurize_batch(texts: pd.Series, dim: int = 64, ngram: int = 3) -> pd.Series:
    """Vectorized hashing-trick featurizer over a pandas batch."""
    out = []
    for t in texts:
        if t is None:
            # zero-vector fallback, as the reference on embedding failure
            # (/root/reference/tool/TextProcessor.py:79)
            out.append(np.zeros(dim, dtype=np.float32))
            continue
        data = str(t).encode("utf-8")
        if len(data) < ngram:
            grams = [data]
        else:
            grams = [data[i : i + ngram] for i in range(len(data) - ngram + 1)]
        vec = np.zeros(dim, dtype=np.float64)
        for g in grams:
            h = _fnv1a_bytes(g)
            bucket = (h >> 1) % dim
            sign = 1.0 if (h & 1) == 0 else -1.0
            vec[bucket] += sign
        norm = np.linalg.norm(vec)
        if norm > 0:
            vec = vec / norm
        out.append(vec.astype(np.float32))
    return pd.Series(out)


def featurize_udf(dim: int = 64, ngram: int = 3):
    """Series→Series pandas UDF: text → L2-normalized float32 vector."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return featurize_batch(texts, dim=dim, ngram=ngram)

    return _udf


def featurize(col: str | Column, dim: int = 64, ngram: int = 3) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return featurize_udf(dim=dim, ngram=ngram)(c)
