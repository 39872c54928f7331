"""Superstep runner: checkpointing, per-partition run ledger, resume.

Every iterative operator (CC, PageRank, LPA, Louvain) drives its loop
through this runner (SURVEY.md §3.4, §4.4): each superstep is a pure
DataFrame transform; the runner truncates lineage (parquet checkpoint or
localCheckpoint), appends a ledger row per partition (run_id, operator,
superstep, partition_id, rows, moved, metric, wall_ms, checkpoint_path),
and exposes resume(run_id) → (last superstep, its checkpointed state).

The reference's ad-hoc resume story is its legacy-cluster reconciliation
(/root/reference/tool/Neo4jLouvainProcessor.py:305-364); this replaces it
with explicit per-superstep lineage.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from louvain_spark.schema import LEDGER


@dataclass
class StepResult:
    state: DataFrame
    moved: int | None = None  # convergence counter (labels changed, etc.)
    metric: float | None = None  # operator metric (modularity, L∞ delta, …)


class SuperstepRunner:
    """Drives an iterative operator with durable checkpoints + ledger.

    checkpoint_dir=None → localCheckpoint only (fast, not resumable);
    otherwise every `checkpoint_every` supersteps the state is written to
    parquet and recorded in the ledger, enabling mid-iteration resume.
    """

    def __init__(
        self,
        spark: SparkSession,
        run_id: str,
        operator: str,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
    ):
        self.spark = spark
        self.run_id = run_id
        self.operator = operator
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        self.superstep = -1
        self._persisted: DataFrame | None = None

    # -- ledger -----------------------------------------------------------
    @property
    def ledger_path(self) -> str | None:
        if self.checkpoint_dir is None:
            return None
        return os.path.join(self.checkpoint_dir, "_ledger")

    def _append_ledger(
        self,
        state: DataFrame,
        superstep: int,
        moved: int | None,
        metric: float | None,
        wall_ms: int,
        ckpt_path: str | None,
    ) -> None:
        if self.ledger_path is None:
            return
        per_part = (
            state.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(self.operator).alias("operator"),
                F.lit(superstep).alias("superstep"),
                "partition_id",
                "rows_out",
                F.lit(moved).cast("long").alias("moved"),
                F.lit(metric).cast("double").alias("metric"),
                F.lit(wall_ms).cast("long").alias("wall_ms"),
                F.lit(ckpt_path).alias("checkpoint_path"),
            )
        )
        self.spark.createDataFrame(per_part.collect(), schema=LEDGER).write.mode(
            "append"
        ).parquet(self.ledger_path)

    # -- checkpoint -------------------------------------------------------
    def _ckpt_path(self, superstep: int) -> str:
        return os.path.join(self.checkpoint_dir, f"step={superstep:05d}")

    def advance(self, result: StepResult) -> DataFrame:
        """Record one completed superstep; return the lineage-cut state."""
        self.superstep += 1
        t0 = time.monotonic()
        state = result.state
        ckpt_path = None
        if (
            self.checkpoint_dir is not None
            and self.superstep % self.checkpoint_every == 0
        ):
            ckpt_path = self._ckpt_path(self.superstep)
            state.write.mode("overwrite").parquet(ckpt_path)
            state = self.spark.read.parquet(ckpt_path)
        else:
            state = state.localCheckpoint(eager=True)
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._append_ledger(
            state, self.superstep, result.moved, result.metric, wall_ms, ckpt_path
        )
        if self._persisted is not None:
            self._persisted.unpersist()
        self._persisted = state
        return state

    # -- resume -----------------------------------------------------------
    @classmethod
    def resume(
        cls, spark: SparkSession, run_id: str, operator: str, checkpoint_dir: str
    ) -> tuple["SuperstepRunner", DataFrame | None, int]:
        """Reload the latest checkpointed superstep for (run_id, operator).

        Returns (runner positioned after that superstep, state or None, last
        superstep index or -1).
        """
        runner = cls(spark, run_id, operator, checkpoint_dir)
        ledger_path = runner.ledger_path
        try:
            ledger = spark.read.parquet(ledger_path)
        except Exception:
            return runner, None, -1
        rows = (
            ledger.where(
                (F.col("run_id") == run_id)
                & (F.col("operator") == operator)
                & F.col("checkpoint_path").isNotNull()
            )
            .groupBy("superstep", "checkpoint_path")
            .count()
            .orderBy(F.col("superstep").desc())
            .limit(1)
            .collect()
        )
        if not rows:
            return runner, None, -1
        last = rows[0]
        runner.superstep = int(last["superstep"])
        state = spark.read.parquet(last["checkpoint_path"])
        return runner, state, runner.superstep
