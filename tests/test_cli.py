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
    assert "oracle" in out and "rows-only" in out


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

    # rows-only query: reported as such, exit 0 (the ANN/kmeans/PCA/frame
    # family graduated to invariant-census oracles in rounds 6-8; the
    # stateful stream — whose batch cross-check is embedded — is the one
    # rows-only query left, and the CLI must short-circuit WITHOUT running
    # it, so this stays cheap)
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.cmd_oracle(_ns(name="stream_stateful_reassembly")) == 0
    assert "rows-only" in buf.getvalue()


def test_cli_unknown_query_is_an_error():
    assert cli.cmd_run(_ns(name="__nope__")) == 2
    assert cli.cmd_explain(_ns(name="__nope__")) == 2
