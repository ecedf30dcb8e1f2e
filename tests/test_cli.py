"""CLI surface smoke (SURVEY.md §2 R27-R30): list/run/explain/oracle must
work in-process for every command a user would reach first. The ping and
repl paths are interactive/timing-bound and stay manual."""

from __future__ import annotations

import argparse
import io
from contextlib import redirect_stdout

from transf_spark import cli

SF = "/root/testdata/sf0.001"


def _ns(**kw):
    return argparse.Namespace(cpus=None, sf_dir=SF, limit=5, **kw)


def test_cli_list_covers_registry():
    from transf_spark.queries import REGISTRY, queries

    queries()
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.cmd_list(None) == 0
    out = buf.getvalue()
    for name in REGISTRY:
        assert name in out
    # every declared query is oracle-checked since round 11 (the stateful
    # stream's manifest gained a closed-form SQL oracle)
    assert "oracle" in out and "rows-only" not in out


def test_cli_run_explain_oracle_roundtrip(spark):
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.cmd_run(_ns(name="agg_mode_exact")) == 0
    assert "mode_priority" in buf.getvalue()

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.cmd_explain(_ns(name="docs_chunk_overlap")) == 0
    assert "Scan parquet" in buf.getvalue()

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.cmd_oracle(_ns(name="agg_mode_exact")) == 0
    assert "OK" in buf.getvalue()

    # the rows-only short-circuit must still work for a FUTURE oracle-less
    # query (no live specimen exists since the round-11 stateful-oracle
    # promotion), so exercise the branch with a synthetic spec — the CLI
    # must report and exit 0 WITHOUT running the query
    from transf_spark import queries as q

    fake = q.QuerySpec(
        name="__rows_only_probe__",
        fn=lambda spark, sf_dir: (_ for _ in ()).throw(
            AssertionError("rows-only path must not run the query")
        ),
        oracle=None,
        category="test",
        origin="test",
    )
    q.REGISTRY["__rows_only_probe__"] = fake
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert cli.cmd_oracle(_ns(name="__rows_only_probe__")) == 0
        assert "rows-only" in buf.getvalue()
    finally:
        del q.REGISTRY["__rows_only_probe__"]


def test_cli_unknown_query_is_an_error():
    assert cli.cmd_run(_ns(name="__nope__")) == 2
    assert cli.cmd_explain(_ns(name="__nope__")) == 2


def test_cli_avro_inspect(tmp_path, capsys):
    """`avro <file>` prints codec/blocks/records/schema via the codec's
    own walkers, no Spark session; bad files exit 2 with a message."""
    import hashlib

    from transf_spark.sources import avro_ocf as a

    schema = {"type": "record", "name": "d", "fields": [
        {"name": "id", "type": "long"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}}]}
    p = str(tmp_path / "x.avro")
    ep = __import__("datetime").datetime(1970, 1, 1,
                                         tzinfo=__import__("datetime").timezone.utc)
    a.write_ocf(p, schema, [(1, "a", ep), (2, None, ep), (3, "c", ep)],
                hashlib.md5(b"cli").digest(), block_rows=2, codec="snappy")
    ns = argparse.Namespace(path=p)
    assert cli.cmd_avro(ns) == 0
    out = capsys.readouterr().out
    assert "codec:   snappy" in out and "records: 3" in out and "blocks:  2" in out
    assert "tag: string (nullable)" in out
    assert "spark:   `id` bigint, `tag` string, `ts` timestamp" in out

    bad = str(tmp_path / "bad.avro")
    open(bad, "wb").write(b"not avro at all")
    assert cli.cmd_avro(argparse.Namespace(path=bad)) == 2
