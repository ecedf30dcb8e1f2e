"""Sinks — the write side of the engine (SURVEY.md §1.5, §3.2).

Reference mapping: the server's only sink is the reassembled output file
plus the per-chunk ack replies (`/root/reference/transf_server.cpp:277-326`).
At engine scale those become:

- :func:`write_partitioned` — directory-partitioned parquet, the layout that
  makes partition pruning work downstream (the 100 TB table layout);
- :func:`write_bucketed` — Spark-native bucketed tables: pre-shuffled by
  key, so later equi-joins/aggregations on the bucket key run with NO
  exchange (co-located join — the bucketing rule from the north star);
- :func:`ack_batch` / :func:`foreach_batch_acks` — the reply path (R10):
  per-micro-batch ack rows for accepted chunks, written transactionally in
  ``foreachBatch`` (the streaming commit sink from SURVEY.md §3.2 stage 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet. Downstream filters on the partition
    columns prune whole directories (PartitionFilters, zero IO) — the only
    sane layout for a 100 TB append-mostly table."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Spark-native bucketed (and optionally sorted) managed table.

    Bucketing materializes the shuffle once at write time; every later join
    or aggregation keyed on ``bucket_col`` between same-bucketed tables runs
    exchange-free (asserted in tests/test_sinks.py). This is the engine's
    answer to the reference's per-session thread affinity — data, not
    threads, is pinned to a key."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)  # external table — files live at `path`
    w.saveAsTable(table)


def ack_batch(accepted_chunks: DataFrame) -> DataFrame:
    """R10 ack generator (`/root/reference/transf_server.cpp:317-326`): one
    RECEIVED reply per accepted chunk carrying the next expected seq."""
    return accepted_chunks.select(
        "transfer_id",
        (F.col("seq") + F.lit(1)).alias("next_expected"),
        F.lit("RECEIVED").alias("tag"),
    )


def foreach_batch_acks(out_dir: str):
    """``writeStream.foreachBatch`` sink: write each micro-batch's acks as
    one parquet partition directory keyed by batch id — idempotent per
    (batch_id re-run overwrites itself), the standard exactly-once commit
    pattern for non-transactional stores."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            ack_batch(batch_df)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return write
