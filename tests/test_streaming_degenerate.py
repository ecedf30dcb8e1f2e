"""Round-15 (r14 verdict item 7): the corrupt-fixture device extended to
the STREAMING side. The r14 batch device (test_events_degenerate) pins
declared-query ↔ oracle agreement on a degenerate events table; these
tests close the remaining leg — the readStream twins must equal the
declared batch queries when the SAME malformed rows arrive MID-STREAM,
spread across three chronological micro-batches (``maxFilesPerTrigger=1``)
instead of one availableNow gulp. Together the two devices give
stream == declared == oracle end-to-end on degenerate input.

Chronological splitting is load-bearing, not a convenience: the batch
queries have no watermark, so stream/batch parity is only a theorem when
no row arrives late (ts-sorted files ⇒ every batch's rows are ≥ the
previous batch's max, so the advancing watermark never drops one). The
corruption rows ride wherever their ts places them — the NULL-ts row
lands in the first file (sort key minimum), epoch-0 in the first, the
2199 far-future row in the last (it closes every earlier window).

Sketch note: only merge-order-INSENSITIVE aggregates are asserted exact
across micro-batches (count/guarded-sum, HLL register-max, session
merge). KLL compaction is merge-order-sensitive, so its multi-batch twin
pins row counts, not quantile bit-equality (the single-batch exactness
twin lives in test_streaming.py).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from tests.test_events_degenerate import degenerate_dir  # noqa: F401  (fixture)
from transf_spark import schemas
from transf_spark.functions.exprs import dec_value_guarded
from transf_spark.sources.tables import load_table, ts_micros_col

N_FILES = 3


@pytest.fixture(scope="module")
def split_dir(degenerate_dir, tmp_path_factory):  # noqa: F811
    """The degenerate events table re-cut into N_FILES ts-sorted parquet
    files (NULL ts first) with ascending mtimes, so FileStreamSource +
    maxFilesPerTrigger=1 replays it as chronological micro-batches."""
    out = tmp_path_factory.mktemp("degenerate_stream")
    t = pq.read_table(f"{degenerate_dir}/events.parquet")
    names = t.schema.names
    rows = list(zip(*[t[n].to_pylist() for n in names]))
    ts_i = names.index("ts")
    rows.sort(key=lambda r: (r[ts_i] is not None, r[ts_i]))
    per = (len(rows) + N_FILES - 1) // N_FILES
    for k in range(N_FILES):
        part = rows[k * per : (k + 1) * per]
        tbl = pa.table(
            {
                n: pa.array([r[i] for r in part], t.schema.field(n).type)
                for i, n in enumerate(names)
            }
        )
        path = str(out / f"part-{k:03d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_000_000 + k, 1_000_000 + k))
    return str(out)


def _run_twin(spark, degenerate_dir, split_dir, build, name):  # noqa: F811
    stream = build(
        spark.readStream.schema(schemas.EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{split_dir}/part-*.parquet")
        .withColumn("ts", ts_micros_col(degenerate_dir))
        .withWatermark("ts", "1 minute")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= N_FILES, (
        "corruption did not arrive mid-stream: expected one micro-batch per "
        f"file, saw {len(q.recentProgress)}"
    )
    ev = load_table(spark, degenerate_dir, "events")
    final_wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 MINUTE")).alias("wm")
    ).collect()[0]["wm"]
    return spark.table(name), final_wm


def _rows(df, cols):
    # None-safe ordering: the degenerate fixture puts NULLs in group keys
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, 0 if v is None else v) for v in t),
    )


def test_tumbling_twin_mid_stream_corruption(spark, degenerate_dir, split_dir):  # noqa: F811
    from transf_spark.streaming.windows import stream_tumbling_window

    def build(src):
        return (
            src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec_value_guarded()).cast("double").alias("sum_value"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("win_start"),
                F.col("w.end").cast("timestamp_ntz").alias("win_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    got_df, wm = _run_twin(spark, degenerate_dir, split_dir, build, "deg_tumbling")
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    want = _rows(
        stream_tumbling_window(spark, degenerate_dir).filter(
            F.col("win_end") <= F.lit(wm)
        ),
        cols,
    )
    assert _rows(got_df, cols) == want
    assert len(want) > 0


def test_sliding_twin_mid_stream_corruption(spark, degenerate_dir, split_dir):  # noqa: F811
    from transf_spark.streaming.windows import stream_sliding_window

    def build(src):
        return (
            src.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(dec_value_guarded()).cast("double").alias("sum_value"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("win_start"),
                F.col("w.end").cast("timestamp_ntz").alias("win_end"),
                "n_events",
                "sum_value",
            )
        )

    got_df, wm = _run_twin(spark, degenerate_dir, split_dir, build, "deg_sliding")
    cols = ["win_start", "win_end", "n_events", "sum_value"]
    want = _rows(
        stream_sliding_window(spark, degenerate_dir).filter(
            F.col("win_end") <= F.lit(wm)
        ),
        cols,
    )
    assert _rows(got_df, cols) == want
    assert len(want) > 0


def test_session_twin_mid_stream_corruption(spark, degenerate_dir, split_dir):  # noqa: F811
    from transf_spark.streaming.windows import stream_session_window

    def build(src):
        return (
            src.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                F.col("w.end").cast("timestamp_ntz").alias("session_end"),
                "n_events",
            )
        )

    got_df, wm = _run_twin(spark, degenerate_dir, split_dir, build, "deg_session")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    want = _rows(
        stream_session_window(spark, degenerate_dir).filter(
            F.col("session_end") <= F.lit(wm)
        ),
        cols,
    )
    assert _rows(got_df, cols) == want
    assert len(want) > 0


def test_distinct_users_twin_mid_stream_corruption(spark, degenerate_dir, split_dir):  # noqa: F811
    """HLL register-max merge is order-insensitive, so the sketch twin is
    exact across micro-batches; the declared query's exact counts bound it
    within the sketch's 5% envelope (same contract as the clean-fixture
    twin in test_streaming.py)."""
    from transf_spark.streaming.windows import stream_window_distinct_users

    def build(src):
        return (
            src.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("n_approx"))
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("win_start"),
                F.col("w.end").cast("timestamp_ntz").alias("win_end"),
                "n_approx",
            )
        )

    got_df, wm = _run_twin(
        spark, degenerate_dir, split_dir, build, "deg_distinct_users"
    )
    cols = ["win_start", "win_end", "n_approx"]
    batch = build(
        load_table(spark, degenerate_dir, "events").filter(F.col("ts").isNotNull())
    ).filter(F.col("win_end") <= F.lit(wm))
    got = _rows(got_df, cols)
    assert got == _rows(batch, cols)
    assert len(got) > 0

    exact = {
        r["win_start"]: r["n_users"]
        for r in stream_window_distinct_users(spark, degenerate_dir).collect()
    }
    for win_start, _end, n_approx in got:
        assert abs(n_approx - exact[win_start]) <= max(1, 0.05 * exact[win_start])


def test_kll_twin_mid_stream_counts(spark, degenerate_dir, split_dir):  # noqa: F811
    """KLL compaction is merge-order-sensitive, so across micro-batches only
    the structural contract is pinned: same windows, same per-window row
    counts as the declared (finite-guarded) batch query, and every quantile
    triple parses to three ordered finite doubles."""
    from transf_spark.functions.exprs import finite_value
    from transf_spark.streaming.windows import KLL_K

    def build(src):
        return (
            src.filter(F.col("value").isNotNull() & finite_value())
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.expr(
                    f"kll_sketch_get_quantile_double("
                    f"kll_sketch_agg_double(value, {KLL_K}),"
                    f" array(0.25D, 0.5D, 0.75D))"
                ).alias("aq"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("win_start"),
                "aq",
                "n_events",
            )
        )

    got_df, wm = _run_twin(spark, degenerate_dir, split_dir, build, "deg_kll")
    got = got_df.collect()
    assert len(got) > 0
    batch = {
        r["win_start"]: r["n_events"]
        for r in build(
            load_table(spark, degenerate_dir, "events").filter(
                F.col("ts").isNotNull()
            )
        )
        .filter(F.col("win_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm))
        .collect()
    }
    assert {r["win_start"]: r["n_events"] for r in got} == batch
    for r in got:
        q1, q2, q3 = r["aq"]
        assert q1 <= q2 <= q3
        for v in (q1, q2, q3):
            assert v == v and abs(v) != float("inf")
