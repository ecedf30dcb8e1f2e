"""Streaming twins (SURVEY.md §5.2): the declared window queries are batch-
evaluated; these tests run the literal readStream equivalents and assert
result equality, plus the stateful state machine's cross-check against the
batch completion manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from transf_spark import schemas
from transf_spark.operators.transfer import completion_manifest, filter_path_security
from transf_spark.sources.tables import ts_micros_col
from transf_spark.streaming.stateful import run_stateful_reassembly
from transf_spark.streaming.windows import stream_tumbling_window

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_window_stream_equals_batch(spark):
    """Same window() plan under readStream (availableNow → memory sink)
    must produce the batch result."""
    stream = (
        spark.readStream.schema(schemas.EVENTS_RAW)
        .parquet(f"{SF}/events.*")  # glob: FileStreamSource rejects an exact file path
        # watermark requires TIMESTAMP (not NTZ); session tz is pinned UTC so
        # the final cast of window bounds to NTZ matches the batch plan
        .withColumn("ts", ts_micros_col(SF))
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    q = (
        stream.writeStream.format("memory").queryName("tumbling_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    got = _rows(spark.table("tumbling_twin"), cols)
    # Append mode emits a window only once the watermark (max ts − 1 min)
    # passes its end; windows still open at end-of-stream are withheld.
    from transf_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    final_wm = ev.agg((F.max("ts") - F.expr("INTERVAL 1 MINUTE")).alias("wm")).collect()[0]["wm"]
    want = _rows(
        stream_tumbling_window(spark, SF).filter(F.col("win_end") <= F.lit(final_wm)), cols
    )
    assert got == want
    assert len(got) > 0


def test_topk_sketch_stream_equals_batch(spark):
    """The approx_top_k window aggregate under readStream (availableNow →
    memory sink, append mode) must produce the declared batch result for
    every window the final watermark has closed — proving the sketch's
    accumulate/combine partials merge correctly across micro-batches."""
    from transf_spark.streaming.windows import (
        TOPK_SKETCH_CAPACITY,
        TOPK_SKETCH_K,
        stream_topk_sketch,
    )

    stream = (
        spark.readStream.schema(schemas.EVENTS_RAW)
        .parquet(f"{SF}/events.*")
        .withColumn("ts", ts_micros_col(SF))
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.expr(
                f"approx_top_k(user_id, {TOPK_SKETCH_K}, {TOPK_SKETCH_CAPACITY})"
            ).alias("tk")
        )
    )
    counts_desc = F.reverse(F.array_sort(F.expr("transform(tk, x -> x.count)")))
    stream = stream.select(
        F.col("w.start").cast("timestamp_ntz").alias("win_start"),
        F.col("w.end").cast("timestamp_ntz").alias("win_end"),
        F.size("tk").cast("long").alias("k_returned"),
        F.concat_ws(",", F.transform(counts_desc, lambda c: c.cast("string"))).alias(
            "topk_counts"
        ),
        F.aggregate(counts_desc, F.lit(0).cast("long"), lambda a, c: a + c).alias(
            "sum_topk"
        ),
    )
    q = (
        stream.writeStream.format("memory").queryName("topk_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    cols = ["win_start", "win_end", "k_returned", "topk_counts", "sum_topk"]
    got = _rows(spark.table("topk_twin"), cols)
    from transf_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    final_wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 MINUTE")).alias("wm")
    ).collect()[0]["wm"]
    want = _rows(
        stream_topk_sketch(spark, SF).filter(F.col("win_end") <= F.lit(final_wm)),
        cols,
    )
    assert got == want
    assert len(got) > 0


def test_stateful_reassembly_matches_batch_manifest(spark):
    """Streaming 'done' set == batch manifest 'done' set minus transfers
    whose handshake the security filter rejects (the stream enforces R6
    before accepting chunks; the batch manifest does not model it).

    Uses the declared (NoTimeout + AvailableNow) path — done/rejected sets
    are timeout-independent; expiry semantics are covered by the
    ProcessingTimeTimeout tests below."""
    from transf_spark.streaming.stateful import stream_stateful_reassembly

    stream_out = stream_stateful_reassembly(spark, SF)
    done_stream = {
        (r["transfer_id"], r["filesize"], r["written"])
        for r in stream_out.filter(F.col("status") == "done").collect()
    }
    rejected_stream = {
        r["transfer_id"]
        for r in stream_out.filter(F.col("status") == "rejected_handshake").collect()
    }

    manifest = completion_manifest(spark, SF)
    security = filter_path_security(spark, SF)
    bad_hs = {
        r["transfer_id"]
        for r in security.filter(F.col("verdict") != "accept").collect()
    }
    done_batch = {
        (r["transfer_id"], r["filesize"], r["written"])
        for r in manifest.filter(F.col("status") == "done").collect()
        if r["transfer_id"] not in bad_hs
    }
    assert rejected_stream == bad_hs
    assert done_stream == done_batch
    assert len(done_stream) > 100  # the fixture overwhelmingly completes
    # The declared output now EMBEDS this cross-check (round-4 verdict
    # item 6): batch_consistent must be uniformly true when the sets agree.
    assert stream_out.filter(~F.col("batch_consistent")).count() == 0
    # Round-5 verdict item 8: exactly one '__summary__' row pins the
    # expected cardinality (filesize := batch done count, written := batch
    # rejected count) so the rows-only record can't silently shrink.
    s = stream_out.filter(F.col("transfer_id") == "__summary__").collect()
    assert len(s) == 1
    assert s[0]["filesize"] == len(done_batch)
    assert s[0]["written"] == len(bad_hs)
    assert s[0]["batch_consistent"] is True


def test_ack_verify_stream_stream_join(spark):
    """The DECLARED `stream_ack_verify_join` is now the real watermarked
    stream-stream join; it must reproduce the batch-evaluated twin exactly
    (the inverse of round 1, where the stream lived only in this test)."""
    from transf_spark.streaming.windows import ack_join_batch, stream_ack_verify_join

    cols = ["transfer_id", "seq", "is_final", "next_expected"]
    got = _rows(stream_ack_verify_join(spark, SF), cols)
    want = _rows(ack_join_batch(spark, SF), cols)
    assert got == want
    assert len(got) > 1000


def test_stateful_reassembly_multibatch_equals_single(spark):
    """State must carry across micro-batches: replaying the protocol in 4
    arrival-ordered files (HS wave then 3 chunk waves) yields the same
    manifest as the single-batch replay.

    Both runs use NoTimeout: with ProcessingTimeTimeout, in-flight sessions
    expire for real if a micro-batch cadence exceeds 20 s wall-clock — correct
    streaming behavior, but nondeterministic under load, so the determinism
    check must disarm it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    single = _rows(
        run_stateful_reassembly(spark, SF, n_files=1, timeout_conf=GroupStateTimeout.NoTimeout),
        ["transfer_id", "status", "filesize", "written"])
    multi = _rows(
        run_stateful_reassembly(spark, SF, n_files=4, timeout_conf=GroupStateTimeout.NoTimeout),
        ["transfer_id", "status", "filesize", "written"])
    assert single == multi


def test_stateful_reassembly_multibatch_with_timeouts_no_resurrection(spark):
    """Terminal-state tombstones (round-2 fix): with ProcessingTimeTimeout
    armed AND the protocol split across micro-batches, straggler/duplicate
    chunks arriving after a session completes must NOT resurrect its key —
    resurrection shows up as spurious filesize-0 'expired' rows and
    double-reported transfer_ids."""
    out = run_stateful_reassembly(spark, SF, n_files=3)
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["transfer_id"], []).append(r["status"])
    dupes = {k: v for k, v in by_id.items() if len(v) > 1}
    assert not dupes, f"transfer_ids reported more than once: {dupes}"
    ghosts = [r for r in rows if r["status"] == "expired" and r["filesize"] == 0]
    assert not ghosts, f"spurious expired rows from resurrected keys: {ghosts[:5]}"
    assert sum(1 for r in rows if r["status"] == "done") > 100


def test_stateful_reassembly_repeat_stability(spark):
    """Round-2 flake regression gate: the declared query errored once under a
    busy shared session (StreamingQueryException in the memory sink after the
    polling deadline). The declared path is now self-terminating; repeated
    invocations in the same (already heavily used) session must return the
    identical manifest every time."""
    from transf_spark.streaming.stateful import stream_stateful_reassembly

    baseline = _rows(
        stream_stateful_reassembly(spark, SF),
        ["transfer_id", "status", "filesize", "written"])
    assert len(baseline) > 100
    for _ in range(4):
        again = _rows(
            stream_stateful_reassembly(spark, SF),
            ["transfer_id", "status", "filesize", "written"])
        assert again == baseline


def _windowed_twin(spark, agg_builder, table_name, cols, batch_df, end_col):
    """Run a windowed readStream twin to completion and return (stream rows,
    batch rows filtered to windows the final watermark closed — append mode
    only emits a window once the watermark passes ``end_col``)."""
    from transf_spark.sources.tables import load_table

    stream = agg_builder(
        spark.readStream.schema(schemas.EVENTS_RAW)
        .parquet(f"{SF}/events.*")
        .withColumn("ts", ts_micros_col(SF))
        .withWatermark("ts", "1 minute")
    )
    q = (
        stream.writeStream.format("memory").queryName(table_name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = _rows(spark.table(table_name), cols)
    ev = load_table(spark, SF, "events")
    final_wm = ev.agg((F.max("ts") - F.expr("INTERVAL 1 MINUTE")).alias("wm")).collect()[0]["wm"]
    want = _rows(batch_df.filter(F.col(end_col) <= F.lit(final_wm)), cols)
    return got, want


def test_sliding_window_stream_equals_batch(spark):
    from transf_spark.streaming.windows import stream_sliding_window

    def build(src):
        return (
            src.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"))
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("win_start"),
                F.col("w.end").cast("timestamp_ntz").alias("win_end"),
                "n_events", "sum_value",
            )
        )

    got, want = _windowed_twin(
        spark, build, "sliding_twin",
        ["win_start", "win_end", "n_events", "sum_value"],
        stream_sliding_window(spark, SF),
        end_col="win_end",
    )
    assert got == want
    assert len(got) > 0


def test_session_window_stream_equals_batch(spark):
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

    got, want = _windowed_twin(
        spark, build, "session_twin",
        ["user_id", "session_start", "session_end", "n_events"],
        stream_session_window(spark, SF),
        end_col="session_end",
    )
    assert got == want
    assert len(got) > 0


def test_window_distinct_users_stream_equals_batch(spark):
    """The production form of stream_window_distinct_users: exact distinct
    is unsupported (and unbounded-state) under streaming, so the twin runs
    the HLL++ sketch windowed agg under readStream and must (1) equal the
    batch evaluation of the same sketch plan and (2) land within the 5%
    bound of the declared query's exact counts."""
    from transf_spark.sources.tables import load_table
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

    batch = build(load_table(spark, SF, "events"))
    got, want = _windowed_twin(
        spark, build, "distinct_users_twin",
        ["win_start", "win_end", "n_approx"], batch, "win_end",
    )
    assert got == want
    assert len(got) > 0

    exact = {
        r["win_start"]: r["n_users"]
        for r in stream_window_distinct_users(spark, SF).collect()
    }
    for win_start, _end, n_approx in got:
        assert abs(n_approx - exact[win_start]) <= 0.05 * exact[win_start]


def test_kll_quantile_stream_equals_batch(spark):
    """The KLL sketch window aggregate under readStream (availableNow →
    memory sink, append mode) must produce the same per-window quantile
    estimates as the batch plan for every window the final watermark has
    closed — proving the sketch partials merge identically across
    micro-batches (the combine path a streaming state store exercises)."""
    from transf_spark.streaming.windows import KLL_K

    def quantiles(gdf):
        return gdf.agg(
            F.expr(
                f"kll_sketch_get_quantile_double("
                f"kll_sketch_agg_double(value, {KLL_K}), array(0.25D, 0.5D, 0.75D))"
            ).alias("aq"),
            F.count(F.lit(1)).alias("n_events"),
        ).select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            F.concat_ws(",", F.transform("aq", lambda v: v.cast("string"))).alias("qs"),
            "n_events",
        )

    stream = quantiles(
        spark.readStream.schema(schemas.EVENTS_RAW)
        .parquet(f"{SF}/events.*")
        .withColumn("ts", ts_micros_col(SF))
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour").alias("w"))
    )
    q = (
        stream.writeStream.format("memory").queryName("kll_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    cols = ["win_start", "win_end", "qs", "n_events"]
    got = _rows(spark.table("kll_twin"), cols)

    from transf_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    final_wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 MINUTE")).alias("wm")
    ).collect()[0]["wm"]
    batch = quantiles(
        ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"))
    ).filter(F.col("win_end") <= F.lit(final_wm))
    want = _rows(batch, cols)
    assert got == want
    assert len(got) > 0


def test_checkpoint_recovery_after_midstream_kill(spark, tmp_path):
    """Exactly-once under FAILURE, not just under planned re-invocation
    (stream_checkpoint_incremental proves the latter): kill a file-source
    → file-sink stream partway through its backlog, restart it on the
    SAME checkpoint, and the final sink must equal the batch ground truth
    — no lost files, no double-processed files. This is the file-sink
    commit-log + source-checkpoint pairing that makes a 1000-executor
    ingest restartable after an executor-loss storm; maxFilesPerTrigger=1
    makes 'partway' deterministic-enough (>=1 committed batch, backlog
    remaining) without timing games."""
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    # 12 single-row files — a backlog of 12 micro-batches at 1 file/trigger
    for k in range(12):
        spark.range(k, k + 1).selectExpr(
            "id AS event_id", "CAST(id * 1.5 AS DOUBLE) AS value"
        ).coalesce(1).write.mode("append").parquet(src)

    def start(max_files):
        return (
            spark.readStream.schema("event_id long, value double")
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            # non-zero trigger so the kill below reliably lands with
            # backlog remaining (at 0s a fast host could drain all 12
            # files between the progress poll and q.stop())
            .trigger(processingTime="1 seconds")
            .start()
        )

    # Phase 1: drain one micro-batch at a time, kill after a few commits.
    q = start(max_files=1)
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        progress = q.recentProgress
        committed = sum(p["numInputRows"] for p in progress)
        if committed >= 3:
            break
        time.sleep(0.2)
    else:
        q.stop()
        raise TimeoutError("stream never committed 3 batches")
    q.stop()  # the "kill": no graceful drain of the remaining backlog
    q.awaitTermination(60)

    mid = spark.read.schema("event_id long, value double").parquet(sink).count()
    assert 1 <= mid < 12, f"kill must land mid-backlog, sink has {mid} rows"

    # Phase 2: restart on the same checkpoint, drain everything remaining.
    q2 = (
        spark.readStream.schema("event_id long, value double")
        .option("maxFilesPerTrigger", 100)
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "recovery drain did not terminate"

    got = sorted(
        (r["event_id"], r["value"])
        for r in spark.read.schema("event_id long, value double")
        .parquet(sink)
        .collect()
    )
    assert got == [(k, k * 1.5) for k in range(12)], got
