"""Top-k cosine similarity joins (J2/W1) + ANN over embedding columns.

Two physical strategies (SURVEY.md §4.2):

- brute: crossJoin + JVM-side dot product (zip_with/aggregate higher-order
  functions — no Python) + per-query window top-k. Exact; fine when
  |queries|×|items| is small or as the verification baseline.

- blocked: broadcast the item matrix (ids + float32 vectors) to executors
  once, then mapInPandas over the query side computes batch×matrix cosine
  with numpy and emits each batch's local top-k. No shuffle, no crossJoin;
  scales linearly in |queries| for item sets that fit executor memory
  (the reference's sklearn brute kNN k=100 has the same memory model,
  /root/reference/tool/Neo4jLouvainProcessor.py:109-153). For item sets
  beyond memory, chunk the item side and re-top-k the union (k small).

Vectors are assumed L2-normalized (dot == cosine), as the reference
normalizes before caching (/root/reference/tool/Neo4jLouvainProcessor.py:96).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dot_col(a, b):
    """JVM-side dot product of two array<float/double> columns (F8)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_brute(
    queries: DataFrame,
    items: DataFrame,
    k: int = 10,
    q_id: str = "id",
    q_vec: str = "vec",
    i_id: str = "id",
    i_vec: str = "vec",
    min_sim: float | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, item_id, sim, rank) — exact top-k by cosine, desc."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    i = items.select(F.col(i_id).alias("item_id"), F.col(i_vec).alias("_iv"))
    pairs = q.crossJoin(i)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("item_id"))
    scored = pairs.select(
        "query_id",
        "item_id",
        dot_col(F.col("_qv"), F.col("_iv")).alias("sim"),
    )
    if min_sim is not None:
        scored = scored.where(F.col("sim") >= min_sim)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk_blocked(
    spark: SparkSession,
    queries: DataFrame,
    items: DataFrame,
    k: int = 10,
    q_id: str = "id",
    q_vec: str = "vec",
    i_id: str = "id",
    i_vec: str = "vec",
    min_sim: float | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Same contract as cosine_topk_brute via broadcast-matrix numpy blocks."""
    rows = items.select(F.col(i_id).alias("id"), F.col(i_vec).alias("v")).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float32)
    bc = spark.sparkContext.broadcast((ids, mat))
    kk, thr, excl = int(k), min_sim, bool(exclude_self)

    def block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            qv = np.array(list(pdf["_qv"]), dtype=np.float32)
            sims = qv @ b_mat.T  # (batch, n_items)
            qids = pdf["query_id"].to_numpy()
            if excl:
                mask = qids[:, None] == b_ids[None, :]
                sims = np.where(mask, -np.inf, sims)
            n_take = min(kk, sims.shape[1])
            # argpartition then exact sort of the head; tie-break item id asc
            part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
            out_q, out_i, out_s, out_r = [], [], [], []
            for row in range(sims.shape[0]):
                cand = part[row]
                order = np.lexsort((b_ids[cand], -sims[row, cand]))
                sel = cand[order]
                s = sims[row, sel]
                keep = s > -np.inf
                if thr is not None:
                    keep &= s >= thr
                sel, s = sel[keep], s[keep]
                out_q.extend([qids[row]] * len(sel))
                out_i.extend(b_ids[sel])
                out_s.extend(s.astype(np.float64))
                out_r.extend(range(1, len(sel) + 1))
            yield pd.DataFrame(
                {"query_id": out_q, "item_id": out_i, "sim": out_s, "rank": out_r}
            )

    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    return q.mapInPandas(
        block, "query_id long, item_id long, sim double, rank int"
    )
