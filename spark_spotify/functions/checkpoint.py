"""Lineage truncation that adapts to the deployment.

Several iterative / multi-consumer pipelines (LSH dedup candidate pairs,
connected-components label rounds, the incremental ETL delta) truncate
lineage mid-pipeline so downstream stages don't replay exploded or
convergence-looped plans.  ``localCheckpoint`` is the right call on the
single-JVM local accelerator — but its blocks are UNREPLICATED, so on a
cluster with dynamic allocation an executor loss makes the checkpointed
data unrecoverable mid-query (advisor finding, round 1).

``stable_checkpoint`` picks per-session: when the SparkContext has a
checkpoint directory configured (``sc.setCheckpointDir`` — standard on
cluster deployments, pointing at the shared FS), it uses reliable
``checkpoint()`` whose blocks persist to that FS and survive executor
loss; otherwise it falls back to ``localCheckpoint()``.  Call sites stay
deployment-agnostic.

Retention: reliable checkpoint files outlive the query unless
``spark.cleaner.referenceTracking.cleanCheckpoints`` is on — the engine's
session factory (``session.get_spark``) sets it, so checkpoint data is
reclaimed when the truncated DataFrame is garbage-collected.  Sessions
built elsewhere should set it too, or schedule checkpoint-dir retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the session
    has a checkpoint dir (cluster mode), else ``localCheckpoint``."""
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
