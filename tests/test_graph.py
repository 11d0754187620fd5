"""connected_components must equal union-find on arbitrary graphs, and
pointer doubling must make long chains converge in O(log d) rounds —
the property that separates the 10^10-scale resolver from naive
propagation (a 64-node chain takes 63 plain-propagation rounds)."""

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from crawler4j_spark.operators.graph import connected_components


def union_find(edges):
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
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def run_cc(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    labels, rounds = connected_components(df)
    return ({r["node"]: r["component"] for r in labels.collect()}, rounds)


def test_chain_converges_logarithmically(spark):
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got, rounds = run_cc(spark, edges)
    assert got == {i: 0 for i in range(n)}
    # plain min-propagation needs n-1 = 63 rounds on this chain; doubling
    # must be well under (log2(63) ~ 6, plus constant slack)
    assert rounds <= 14, rounds


def test_disjoint_stars_and_self_loop(spark):
    edges = [(10, 1), (10, 2), (10, 3),    # star, min is a leaf
             (20, 21), (21, 22),           # path
             (30, 30)]                     # self loop
    got, _ = run_cc(spark, edges)
    assert got == {10: 1, 1: 1, 2: 1, 3: 1,
                   20: 20, 21: 20, 22: 20, 30: 30}


@pytest.mark.slow
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@example(edges=[(0, 1), (2, 3), (1, 2)])       # merge via bridging edge
@example(edges=[(5, 0), (4, 5), (3, 4)])       # descending chain
@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1, max_size=20))
def test_matches_union_find(spark, edges):
    want = union_find(edges)
    got, _ = run_cc(spark, edges)
    assert got == want


def hits_model(edges, n_iter):
    """Reference implementation of the unnormalized HITS update order."""
    nodes = sorted({n for e in edges for n in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}
    for _ in range(n_iter):
        auth = {n: sum(hub[s] for s, d in edges if d == n) for n in nodes}
        hub = {n: sum(auth[d] for s, d in edges if s == n) for n in nodes}
    return auth, hub


def test_hits_matches_model_two_iterations(spark):
    from crawler4j_spark.operators.graph import hits

    #      1 -> 3 <- 2 ;  3 -> 4 ;  1 -> 4  (1 is the hub, 3/4 authorities)
    edges = [(1, 3), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.auth, r.hub) for r in hits(df, n_iter=2).collect()}
    want_auth, want_hub = hits_model(edges, 2)
    assert got == {n: (want_auth[n], want_hub[n]) for n in want_auth}
