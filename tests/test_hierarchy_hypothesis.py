"""Hypothesis property tests: the hierarchy engine over adversarially
generated trees (shapes a fixed-seed generator won't hit — chains,
stars, ragged mixes)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aggregation_duckdb_spark.hierarchy import Hierarchy, HierarchyConfig

# a tree as parent indices: node i (1-based) attaches to parents[i-1],
# drawn from nodes 0..i-1 — always acyclic, single-rooted at 0
trees = st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=0, max_size=40).map(
    lambda raw: [None] + [raw[i] % (i + 1) for i in range(len(raw))])


def _spark():
    from aggregation_duckdb_spark.session import get_spark
    return get_spark("hypothesis")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(parents=trees)
def test_flatten_invariants_on_generated_trees(parents):
    spark = _spark()
    rows = [(k, f"n{k}", "L", p) for k, p in enumerate(parents)]
    df = spark.createDataFrame(
        rows, "natural_key long, name string, level_name string, "
              "parent_natural_key long")
    h = Hierarchy.from_adjacency(
        df, natural_key="natural_key", name="name", level_name="level_name",
        parent_natural_key="parent_natural_key")
    flat = h.flattened().collect()

    # every node appears exactly once
    assert sorted(r["node_natural_key"] for r in flat) == sorted(
        k for k, *_ in rows)

    by_key = {r["node_natural_key"]: r for r in flat}
    depth = {}

    def d(k):
        if k not in depth:
            p = parents[k]
            depth[k] = 1 if p is None else d(p) + 1
        return depth[k]

    for k, p in enumerate(parents):
        r = by_key[k]
        # level == distance from root along parent pointers
        assert r["level_number"] == d(k)
        # path spells the ancestry root→node
        path_keys = [e["node_natural_key"] for e in r["node_json_path"]]
        anc, cur = [], k
        while cur is not None:
            anc.append(cur)
            cur = parents[cur]
        assert path_keys == list(reversed(anc))
        # pre-order: parent sorts strictly before child
        if p is not None:
            assert r["node_sort_order"] > by_key[p]["node_sort_order"]

    # closure cardinality = Σ depths
    assert h.closure().count() == sum(d(k) for k, _ in enumerate(parents))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(parents=trees)
def test_local_equals_distributed_on_generated_trees(parents):
    spark = _spark()
    rows = [(k, f"n{k}", "L", p) for k, p in enumerate(parents)]
    df = spark.createDataFrame(
        rows, "natural_key long, name string, level_name string, "
              "parent_natural_key long")
    mk = lambda thr: Hierarchy.from_adjacency(
        df, natural_key="natural_key", name="name", level_name="level_name",
        parent_natural_key="parent_natural_key",
        config=HierarchyConfig(local_build_threshold=thr))
    local = sorted(tuple(r) for r in mk(10_000).flattened().collect())
    dist = sorted(tuple(r) for r in mk(0).flattened().collect())
    assert local == dist


# random undirected graphs as edge lists over a small vertex universe:
# dense enough to form multi-edge components, sparse enough to leave
# isolated chains — the shapes that break naive label propagation
graphs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=24),
              st.integers(min_value=0, max_value=24)),
    min_size=1, max_size=40)


def _union_find_labels(edges):
    """Reference implementation: path-compressed union-find, label =
    min vertex id of each component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges=graphs)
def test_connected_components_matches_union_find(edges):
    from aggregation_duckdb_spark.operators import graph as G
    spark = _spark()
    # drop self-loops: they add vertices but no connectivity, and the
    # operator's contract covers pair edges (a near-dup pair never
    # pairs a doc with itself)
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long")
    # cover BOTH paths: the driver-local union-find (default threshold)
    # and the distributed propagation loop (threshold forced to 0)
    got_local = {r["id"]: r["label"]
                 for r in G.connected_components(df).collect()}
    got_dist = {r["id"]: r["label"]
                for r in G.connected_components(
                    df, local_threshold=0).collect()}
    expect = _union_find_labels(edges)
    assert got_local == expect
    assert got_dist == expect


def test_connected_components_long_path_converges_log_rounds():
    """A path graph is the adversarial case plain min-label propagation
    cannot handle (rounds = diameter, here 60 > any sane max_iters);
    pointer doubling must converge it in O(log diameter) rounds."""
    from aggregation_duckdb_spark.operators import graph as G
    spark = _spark()
    n = 60
    df = spark.createDataFrame([(i, i + 1) for i in range(n)],
                               "src long, dst long")
    stats: dict = {}
    got = {r["id"]: r["label"]
           for r in G.connected_components(df, max_iters=12, stats=stats,
                                           local_threshold=0).collect()}
    assert got == {i: 0 for i in range(n + 1)}
    assert stats["rounds"] <= 10  # ~log2(60) + slack, NOT 60
