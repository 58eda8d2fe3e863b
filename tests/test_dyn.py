"""Dynamic connected-components updates vs full recompute."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.streaming.dyn import update_connected_components


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _canon(labels: dict) -> dict:
    """component -> frozenset members, keyed by min member."""
    groups: dict = {}
    for v, c in labels.items():
        groups.setdefault(c, set()).add(v)
    return {min(g): frozenset(g) for g in groups.values()}


def test_dyn_cc_addition_merges(spark):
    g = Graph.from_rows(spark, [(0, 1), (2, 3), (4, 5)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    want = _canon(_labels(connected_components(g2)))
    assert got == want
    assert got[0] == frozenset({0, 1, 2, 3})
    assert got[4] == frozenset({4, 5})


def test_dyn_cc_removal_splits(spark):
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (3, 4)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_REMOVAL", 1, 2, 0.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    assert got[0] == frozenset({0, 1})
    assert got[2] == frozenset({2})
    assert got[3] == frozenset({3, 4})


def test_dyn_cc_new_vertex(spark):
    g = Graph.from_rows(spark, [(0, 1)], directed=False)
    labels = connected_components(g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 7, 8, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, l2 = update_connected_components(g, labels, ev)
    got = _canon(_labels(l2))
    assert got[0] == frozenset({0, 1})
    assert got[7] == frozenset({7, 8})


def test_dyn_sssp_addition_shortens(spark):
    from networkit_spark.operators.distances import sssp
    from networkit_spark.streaming.dyn import update_sssp
    # path 0-1-2-3-4-5 plus a dangling 6; insert shortcut 0-4
    g = Graph.from_rows(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],
        directed=False)
    d0 = sssp(g, 0)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 0, 4, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, d2 = update_sssp(g, d0, ev)
    got = {r["id"]: r["dist"] for r in d2.collect()}
    want = {r["id"]: r["dist"] for r in sssp(g2, 0).collect()}
    assert got == want
    assert got[4] == 1.0 and got[5] == 2.0 and got[6] == 3.0
    assert got[1] == 1.0 and got[3] == 2.0  # 3 improves via the shortcut


def test_dyn_sssp_weighted_decrease(spark):
    from networkit_spark.operators.distances import sssp
    from networkit_spark.streaming.dyn import update_sssp
    g = Graph.from_rows(
        spark, [(0, 1, 1.0), (1, 2, 5.0), (0, 2, 10.0)],
        directed=False)
    d0 = sssp(g, 0)
    assert {r["id"]: r["dist"] for r in d0.collect()}[2] == 6.0
    ev = spark.createDataFrame(
        [("EDGE_WEIGHT_UPDATE", 0, 2, 2.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, d2 = update_sssp(g, d0, ev)
    got = {r["id"]: r["dist"] for r in d2.collect()}
    want = {r["id"]: r["dist"] for r in sssp(g2, 0).collect()}
    assert got == want and got[2] == 2.0


def test_dyn_sssp_no_improvement_noop(spark):
    from networkit_spark.operators.distances import sssp
    from networkit_spark.streaming.dyn import update_sssp
    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False)
    d0 = sssp(g, 0)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0, 1)],  # parallel to an existing edge
        "type string, u long, v long, w double, t long")
    _, d2 = update_sssp(g, d0, ev)
    assert ({r["id"]: r["dist"] for r in d2.collect()}
            == {r["id"]: r["dist"] for r in d0.collect()})


def test_dyn_sssp_rejects_removals_and_weight_increases(spark):
    import pytest
    from networkit_spark.operators.distances import sssp
    from networkit_spark.streaming.dyn import update_sssp
    g = Graph.from_rows(spark, [(0, 1, 2.0), (1, 2, 2.0)],
                        directed=False)
    d0 = sssp(g, 0)
    rem = spark.createDataFrame(
        [("EDGE_REMOVAL", 0, 1, 0.0, 1)],
        "type string, u long, v long, w double, t long")
    with pytest.raises(ValueError, match="Graph update not allowed"):
        update_sssp(g, d0, rem)
    inc = spark.createDataFrame(
        [("EDGE_WEIGHT_UPDATE", 0, 1, 9.0, 1)],
        "type string, u long, v long, w double, t long")
    with pytest.raises(ValueError, match="increases"):
        update_sssp(g, d0, inc)


def test_update_apsp_batch_insert(spark, karate):
    """DynAPSP batch update vs full BFS recompute: remove 5 karate
    edges, compute APSP on the reduced graph, re-insert all 5 in ONE
    batch, compare the repaired table with APSP on the full graph
    (multi-insert interactions included)."""
    from collections import deque

    from networkit_spark.streaming.dyn import update_apsp

    edges, n = karate
    removed = edges[::16][:5]
    kept = [e for e in edges if e not in removed]

    def apsp(es):
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        out = {}
        for s in range(n):
            out[(s, s)] = 0
            seen = {s}
            q = deque([(s, 0)])
            while q:
                x, d = q.popleft()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        out[(s, y)] = d + 1
                        q.append((y, d + 1))
        return out

    base = apsp(kept)
    want = apsp(edges)
    dist0 = spark.createDataFrame(
        [(s, v, float(d)) for (s, v), d in base.items()],
        "s long, v long, d double")
    ins = spark.createDataFrame(
        [(u, v, 1.0) for u, v in removed], "u long, v long, w double")
    got = {(r["s"], r["v"]): r["d"]
           for r in update_apsp(dist0, ins, directed=False).collect()}
    assert got == {k: float(d) for k, d in want.items()}


def test_update_apsp_directed_unreachable_pair(spark):
    """An insert that CONNECTS two previously separate reachability
    cones creates brand-new rows."""
    from networkit_spark.streaming.dyn import update_apsp

    # 0->1   2->3 ; insert 1->2 with weight 5
    dist0 = spark.createDataFrame(
        [(0, 1, 1.0), (2, 3, 2.0)], "s long, v long, d double")
    ins = spark.createDataFrame([(1, 2, 5.0)], "u long, v long, w double")
    got = {(r["s"], r["v"]): r["d"]
           for r in update_apsp(dist0, ins, directed=True).collect()}
    assert got[(0, 2)] == 6.0
    assert got[(0, 3)] == 8.0
    assert got[(1, 3)] == 7.0
    assert (2, 0) not in got  # directed: no backward paths


def _apsp_rows(spark, g):
    """(s, v, d) finite distances, d >= 1 (closeness._dist_rows shape)."""
    from networkit_spark.operators.closeness import _dist_rows

    rows, sc = _dist_rows(g)
    if rows is None:
        sc.cleanup()
        return spark.createDataFrame([], "s long, v long, d long")
    data = [(r["s"], r["v"], r["d"]) for r in rows.collect()]
    sc.cleanup()
    return spark.createDataFrame(data, "s long, v long, d long")


def test_dyn_betweenness_insert_vs_recompute(spark):
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.streaming.dyn import update_betweenness

    # two 4-cycles joined at one vertex; insert a bridge shortcut
    edges = [(0, 1), (1, 2), (2, 3), (3, 0),
             (3, 4), (4, 5), (5, 6), (6, 3)]
    g = Graph.from_rows(spark, edges, directed=False)
    bc0 = betweenness(g)
    dist0 = _apsp_rows(spark, g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 0, 5, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, bc2, dist2 = update_betweenness(g, bc0, dist0, ev)
    got = {r["id"]: r["score"] for r in bc2.collect()}
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # repaired APSP matches recompute too (diagonal rows are internal)
    d_want = {(r["s"], r["v"]): r["d"]
              for r in _apsp_rows(spark, g2).collect()}
    d_got = {(r["s"], r["v"]): r["d"]
             for r in dist2.filter("s != v").collect()}
    assert d_got == {k: float(v) for k, v in d_want.items()}


def test_dyn_betweenness_new_vertex_and_noop(spark):
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.streaming.dyn import update_betweenness

    g = Graph.from_rows(spark, [(0, 1), (1, 2)], directed=False)
    bc0 = betweenness(g)
    dist0 = _apsp_rows(spark, g)
    # attach a brand-new vertex 9 to the end of the path
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 2, 9, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, bc2, dist2 = update_betweenness(g, bc0, dist0, ev)
    got = {r["id"]: r["score"] for r in bc2.collect()}
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    with pytest.raises(ValueError):
        bad = spark.createDataFrame(
            [("EDGE_REMOVAL", 0, 1, 1.0, 1)],
            "type string, u long, v long, w double, t long")
        update_betweenness(g, bc0, dist0, bad)


def test_dyn_betweenness_directed_source_endpoint(spark):
    """ADVICE r4 (high): on a directed graph, the source endpoint u of
    an insert (u, x) is itself an affected source — detecting it needs
    the d(s,s)=0 diagonal (the rule dist(s,u)+w<=dist(s,v) with s=u).
    The maintained dist table has no diagonal, so the operator must
    normalize it in."""
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.streaming.dyn import update_betweenness

    # 0->1->2, 3->4 ; insert 1->3: source 1 gains paths through 3
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (3, 4)], directed=True)
    bc0 = betweenness(g)
    dist0 = _apsp_rows(spark, g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 3, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, bc2, dist2 = update_betweenness(g, bc0, dist0, ev)
    got = {r["id"]: r["score"] for r in bc2.collect()}
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_dyn_betweenness_undirected_component_join(spark):
    """ADVICE r4 (high): an undirected insert joining two components has
    neither dist(u,u) nor dist(u,v) in the maintained table — sources u
    and v themselves must still be repaired."""
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.streaming.dyn import update_betweenness

    # components {0-1} and {2-3}; insert (1,2) bridges them
    g = Graph.from_rows(spark, [(0, 1), (2, 3)], directed=False)
    bc0 = betweenness(g)
    dist0 = _apsp_rows(spark, g)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 1, 2, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, bc2, dist2 = update_betweenness(g, bc0, dist0, ev)
    got = {r["id"]: r["score"] for r in bc2.collect()}
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    d_want = {(r["s"], r["v"]): r["d"]
              for r in _apsp_rows(spark, g2).collect()}
    d_got = {(r["s"], r["v"]): r["d"]
             for r in dist2.filter("s != v").collect()}
    assert d_got == {k: float(v) for k, v in d_want.items()}


def test_dyn_betweenness_weighted(spark):
    from networkit_spark.operators.betweenness import weighted_betweenness
    from networkit_spark.streaming.dyn import update_betweenness

    edges = [(0, 1, 2.0), (1, 2, 2.0), (2, 3, 2.0), (0, 3, 9.0), (3, 4, 1.0)]
    g = Graph.from_rows(spark, edges, directed=False)
    bc0 = weighted_betweenness(g)

    # weighted APSP rows via the same Bellman-Ford the operator uses
    from networkit_spark.operators.distances import sssp
    import itertools
    rows = []
    ids = [0, 1, 2, 3, 4]
    for s in ids:
        d = {r["id"]: r["dist"] for r in sssp(g, s).collect()}
        rows += [(s, v, float(dv)) for v, dv in d.items()
                 if v != s and dv != float("inf")]
    dist0 = spark.createDataFrame(rows, "s long, v long, d double")

    ev = spark.createDataFrame(
        [("EDGE_WEIGHT_UPDATE", 0, 3, 1.0, 1)],  # 9.0 -> 1.0 decrease
        "type string, u long, v long, w double, t long")
    g2, bc2, _ = update_betweenness(g, bc0, dist0, ev)
    got = {r["id"]: r["score"] for r in bc2.collect()}
    want = {r["id"]: r["score"] for r in weighted_betweenness(g2).collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_dyn_approx_betweenness_matches_fresh_rerun(spark):
    """Sample-granular DynApproxBetweenness repair: because the path
    walk is a deterministic hash race over the BFS DAG, repairing only
    the affected samples must reproduce EXACTLY the state a fresh
    same-seed run on the new graph builds (unaffected samples keep
    their identical paths; affected ones re-walk the new DAG)."""
    from networkit_spark.operators.betweenness import (
        approx_betweenness_state)
    from networkit_spark.streaming.dyn import update_approx_betweenness

    # 12-cycle: every insert shortens some pairs but the pedantic
    # vertex-diameter bucket stays put for r stability
    edges = [(i, (i + 1) % 12) for i in range(12)]
    g = Graph.from_rows(spark, edges, directed=False)
    st = approx_betweenness_state(g, epsilon=0.35, delta=0.2, seed=11)
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 0, 3, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, st2 = update_approx_betweenness(g, st, ev)

    fresh = approx_betweenness_state(g2, epsilon=0.35, delta=0.2, seed=11)
    assert st2["r"] == fresh["r"], "vd bucket moved; fixture invalid"
    got = sorted((r["i"], r["id"]) for r in st2["contribs"].collect())
    want = sorted((r["i"], r["id"]) for r in fresh["contribs"].collect())
    assert got == want
    gs = {r["id"]: r["score"] for r in st2["scores"].collect()}
    ws = {r["id"]: r["score"] for r in fresh["scores"].collect()}
    assert gs == ws
    # repaired dist table == fresh dist table
    gd = sorted((r["s"], r["v"], r["d"])
                for r in st2["dist"].collect())
    wd = sorted((r["s"], r["v"], r["d"])
                for r in fresh["dist"].collect())
    assert gd == wd


def test_dyn_approx_betweenness_noop_and_rejects_removal(spark):
    from networkit_spark.operators.betweenness import (
        approx_betweenness_state)
    from networkit_spark.streaming.dyn import update_approx_betweenness

    edges = [(i, i + 1) for i in range(8)]
    g = Graph.from_rows(spark, edges, directed=False)
    st = approx_betweenness_state(g, epsilon=0.4, delta=0.2, seed=5)
    # re-adding an existing edge changes no DAG: the conservative <=
    # rule still flags equal-length candidates, but re-walking the
    # unchanged DAGs must reproduce the identical state
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 2, 3, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, st2 = update_approx_betweenness(g, st, ev)
    assert (sorted((r["i"], r["id"]) for r in st2["contribs"].collect())
            == sorted((r["i"], r["id"]) for r in st["contribs"].collect()))
    assert ({r["id"]: r["score"] for r in st2["scores"].collect()}
            == {r["id"]: r["score"] for r in st["scores"].collect()})
    bad = spark.createDataFrame(
        [("EDGE_REMOVAL", 2, 3, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    with pytest.raises(ValueError, match="insertions"):
        update_approx_betweenness(g, st, bad)


def test_dyn_approx_betweenness_isolated_sampled_source(spark):
    """Regression: a sampled source that reaches NOTHING has no d>=1
    rows in the maintained dist table, so the affected-source diagonal
    must be built from the SAMPLE set, not from dist — otherwise an
    insert that first connects that source is never flagged and the
    repaired state silently diverges from a fresh same-seed run."""
    from networkit_spark.operators.betweenness import (
        approx_betweenness_state)
    from networkit_spark.streaming.dyn import update_approx_betweenness

    edges = [(i, i + 1) for i in range(7)]
    # n=9: vertex 8 is isolated but samplable
    g = Graph.from_rows(spark, edges, directed=False, n=9)
    st = seed = None
    for cand in range(1, 30):
        s_try = approx_betweenness_state(g, epsilon=0.4, delta=0.2,
                                         seed=cand)
        if s_try["samples"].filter("s = 8").count():
            st, seed = s_try, cand
            break
    assert st is not None, "no seed sampled the isolated source"
    assert st["dist"].filter("s = 8").count() == 0  # the trap precondition
    ev = spark.createDataFrame(
        [("EDGE_ADDITION", 8, 0, 1.0, 1)],
        "type string, u long, v long, w double, t long")
    g2, st2 = update_approx_betweenness(g, st, ev)
    fresh = approx_betweenness_state(g2, epsilon=0.4, delta=0.2, seed=seed)
    assert st2["r"] == fresh["r"], "vd bucket moved; fixture invalid"
    assert (sorted((r["s"], r["v"], r["d"]) for r in st2["dist"].collect())
            == sorted((r["s"], r["v"], r["d"])
                      for r in fresh["dist"].collect()))
    assert (sorted((r["i"], r["id"]) for r in st2["contribs"].collect())
            == sorted((r["i"], r["id"])
                      for r in fresh["contribs"].collect()))
    gs = {r["id"]: r["score"] for r in st2["scores"].collect()}
    ws = {r["id"]: r["score"] for r in fresh["scores"].collect()}
    assert gs == ws
