"""Sink-side guarantees (transf_spark/sources/sinks.py):

- partitioned layout → partition pruning actually prunes (PartitionFilters),
- bucketed layout → equi-join on the bucket key runs with ZERO exchanges
  (the co-located join the 100 TB plan depends on),
- foreachBatch ack sink (R10 reply path) → acks match the batch-computed
  truth, idempotent per batch directory.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from transf_spark.plans.inspect import physical_plan, plan_stats
from transf_spark.sources import fixtures
from transf_spark.sources.sinks import ack_batch, foreach_batch_acks, write_bucketed, write_partitioned
from transf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_enables_partition_pruning(spark):
    ev = load_table(spark, SF, "events").select("event_id", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        write_partitioned(ev, f"{d}/events_by_type", ["event_type"])
        back = spark.read.parquet(f"{d}/events_by_type")
        one = back.filter(F.col("event_type") == "click")
        plan = physical_plan(one)
        assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
        want = ev.filter(F.col("event_type") == "click").count()
        assert one.count() == want


def test_bucketed_join_runs_without_exchange(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(orders, "orders_b", "o_custkey", 8, path=f"{d}/orders_b")
        write_bucketed(customer, "customer_b", "c_custkey", 8, path=f"{d}/customer_b")
        try:
            ob = spark.table("orders_b")
            cb = spark.table("customer_b")
            # forbid broadcast so the join must rely on co-located buckets
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = ob.join(cb, ob.o_custkey == cb.c_custkey)
                st = plan_stats(j)
                assert st.exchanges == 0, physical_plan(j)
                assert st.sort_merge_joins == 1
                # parity with the plain (unbucketed) join
                plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
                assert j.count() == plain.count()
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS customer_b")


def test_foreach_batch_ack_sink_matches_batch_acks(spark):
    chunks = fixtures.chunks(spark, SF).select("transfer_id", "seq", "payload_len")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        chunks.write.parquet(src)
        stream = spark.readStream.schema(chunks.schema).option("maxFilesPerTrigger", 4).parquet(src)
        q = (
            stream.writeStream.foreachBatch(foreach_batch_acks(f"{d}/acks"))
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{d}/ckpt")
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(f"{d}/acks")
        want = ack_batch(chunks)
        assert got.count() == want.count() > 0
        # every ack advances exactly one past its chunk seq
        assert (
            got.join(
                chunks, (got.transfer_id == chunks.transfer_id) & (got.next_expected == chunks.seq + 1)
            ).count()
            == want.count()
        )
        assert got.filter(F.col("tag") != "RECEIVED").count() == 0
