"""Sinks — S4/S5/S6 (SURVEY.md §2.1).

The reference writes bronze pages one S3 object at a time from the
driver (bronze.py:117-129) and loads the warehouse over JDBC with a
stored-procedure postaction (silver.py:57-67, :95-107). Spark-first:

- S4 → ``partitionBy("media_id","dt")`` on write gives the identical
  Hive-style ``k=v`` layout, written in parallel by executors.
- S5 → ``mode("append").saveAsTable`` (or parquet path append).
- S6 (TRUNCATE stage → load → CALL upsert proc) → the in-engine
  MERGE: no stage table, no procedure hop (operators/merge.py).

Scale: bronze partitioning is (media_id, dt) — matches the dominant
read pattern (one media, one day: silver.py:24-26), so partition
pruning elides everything else. High-cardinality keys would need a
coarser layout (hash-bucketed media groups) to avoid small-file blowup;
``one_file_per_partition`` pre-repartitions on the partition keys so
each Hive partition gets a single well-sized file instead of one
fragment per task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned_json(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = ("media_id", "dt"),
    mode: str = "append",
    one_file_per_partition: bool = True,
) -> None:
    """S4 — the bronze layout (``media_id=…/dt=…/*.json``), written by
    executors instead of a driver loop."""
    out = df.repartition(*partition_by) if one_file_per_partition else df
    out.write.mode(mode).partitionBy(*partition_by).json(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    mode: str = "append",
) -> None:
    """S4 columnar variant — what bronze *should* be at 100 TB (JSON at
    rest is a row-oriented tax on every downstream scan)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_table(df: DataFrame, table: str) -> None:
    """S5 — append to a catalog table (replaces the JDBC fact load,
    silver.py:57-67)."""
    df.write.mode("append").saveAsTable(table)


def overwrite_table(df: DataFrame, table: str) -> None:
    """D2 — TRUNCATE+reload as an atomic overwrite (the stage-table
    replacement pattern, silver.py:104)."""
    df.write.mode("overwrite").saveAsTable(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str | Sequence[str],
    sort_by: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table — the co-located-join layout.

    Two tables bucketed by the same key into the same bucket count
    join WITHOUT a shuffle: each task reads matching buckets from both
    sides (asserted structurally in tests/test_plans.py). At 100 TB
    this converts the recurring fact⋈fact or fact⋈big-dim shuffle —
    usually the single largest cost in a pipeline run — into a one-time
    layout decision at write time. ``sort_by`` additionally pre-sorts
    within buckets so sort-merge joins skip their sort.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)
