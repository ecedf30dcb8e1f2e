"""Property-based check of the connected-components loop.

`_connected_components` (pointer-jumping min-label propagation) is the one
iterative operator in the engine; its declared query is oracle-checked on one
fixture graph only. This drives it with random graphs and compares against a
20-line union-find ground truth — shape-independent evidence the loop's
convergence logic (monotone label-sum fixpoint) is right, including path
chains longer than one pointer-jump round and multi-component graphs.

Few examples (Spark jobs per case are expensive); hypothesis still explores
chains, stars, cliques and disconnected singletons via the edge-list strategy.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from transf_spark.operators.clustering import _connected_components


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node of the component
    return {n: find(n) for n in parent}


EDGES = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=30,
)


@settings(max_examples=6, deadline=None)
@given(edges=EDGES)
def test_cc_matches_union_find(spark, edges):
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    df = spark.createDataFrame([(int(a), int(b)) for a, b in edges], schema)
    got = {r["node"]: r["label"] for r in _connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_cc_long_chain_converges_in_log_rounds(spark):
    """Deterministic 301-node path — the pointer-jumping WORST case: the
    25-node random graphs above converge in ~5 doubling rounds, a 300-edge
    chain needs ~9, so this is the depth regime where a broken fixpoint
    test (e.g. comparing labels instead of the monotone label SUM) would
    loop forever or exit early with a split component. Every node must
    fold to label 0 in one component."""
    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    df = spark.createDataFrame([(i, i + 1) for i in range(300)], schema)
    got = {r["node"]: r["label"] for r in _connected_components(df).collect()}
    assert set(got) == set(range(301))
    assert set(got.values()) == {0}
