"""stage_once contract: stage-once reuse, keep-alive touch, and the
round-15 age-gated sibling eviction (a concurrent process's live staging
dir must survive another tag's stage; stale generations and crashed
half-stages must not)."""

import os
import time

from transf_spark.sources import tables


def _mk(prefix: str, tag: str, calls: list) -> str:
    def write(out: str) -> None:
        os.makedirs(out, exist_ok=True)
        calls.append(out)

    return tables.stage_once(prefix, tag, write)


def test_stage_once_reuses_and_touches(tmp_path):
    prefix = str(tmp_path / "site_")
    calls: list = []
    out = _mk(prefix, "aaaa", calls)
    marker = os.path.join(out, "_READY")
    assert os.path.exists(marker) and calls == [out]
    old = os.stat(marker).st_mtime
    os.utime(marker, (old - 100, old - 100))
    assert _mk(prefix, "aaaa", calls) == out
    assert calls == [out], "reuse must not restage"
    assert os.stat(marker).st_mtime > old - 100, "reuse must touch the marker"


def test_fresh_sibling_survives_other_tag_stage(tmp_path):
    prefix = str(tmp_path / "site_")
    calls: list = []
    a = _mk(prefix, "aaaa", calls)  # fresh _READY: an active concurrent stage
    _mk(prefix, "bbbb", calls)
    assert os.path.exists(os.path.join(a, "_READY")), (
        "a recently-touched sibling must survive another tag's staging"
    )


def test_stale_and_markerless_siblings_evicted(tmp_path):
    prefix = str(tmp_path / "site_")
    calls: list = []
    stale = _mk(prefix, "aaaa", calls)
    m = os.path.join(stale, "_READY")
    past = time.time() - tables._EVICT_AGE_SEC - 10
    os.utime(m, (past, past))
    crashed = prefix + "cccc"  # markerless leftover of a crashed stage
    os.makedirs(crashed)
    _mk(prefix, "bbbb", calls)
    assert not os.path.exists(stale), "aged-out sibling must be evicted"
    assert not os.path.exists(crashed), "markerless sibling must be evicted"
