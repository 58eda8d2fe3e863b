"""New sparsification scores vs python oracles on karate."""

import math
from collections import defaultdict

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.sparsification import (
    local_degree_scores, local_similarity_scores, multiscale_scores,
    scan_scores, simmelian_overlap_scores,
)


def _build(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {}
    for u, v in edges:
        lo, hi = min(u, v), max(u, v)
        tri[(lo, hi)] = len(adj[u] & adj[v])
    return adj, tri


def test_scan_scores(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj, tri = _build(edges)
    got = {(r["lo"], r["hi"]): r["score"] for r in scan_scores(g).collect()}
    for (lo, hi), t in tri.items():
        want = (t + 1) / math.sqrt((len(adj[lo]) + 1) * (len(adj[hi]) + 1))
        assert got[(lo, hi)] == pytest.approx(want)


def test_local_degree_scores(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj, _ = _build(edges)
    exp = defaultdict(float)
    for i in adj:
        d = len(adj[i])
        ranked = sorted(adj[i], key=lambda j: -len(adj[j]))
        # competition ranking over degree ties
        rank_of = {}
        r = 0
        prev, same = None, 0
        for idx, j in enumerate(ranked):
            dj = len(adj[j])
            if dj != prev:
                r = idx + 1
                prev = dj
            rank_of[j] = r
        for j in adj[i]:
            e = 1.0 if d <= 1 else 1.0 - math.log(rank_of[j]) / math.log(d)
            key = (min(i, j), max(i, j))
            exp[key] = max(exp[key], e)
    got = {(r["lo"], r["hi"]): r["score"]
           for r in local_degree_scores(g).collect()}
    for k, want in exp.items():
        assert got[k] == pytest.approx(want), k


def test_local_similarity_scores(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj, tri = _build(edges)
    exp = defaultdict(float)
    for i in adj:
        d = len(adj[i])
        sims = []
        for j in adj[i]:
            t = tri[(min(i, j), max(i, j))]
            sims.append((-(t / (d + len(adj[j]) - t)), j))
        sims.sort()
        for rank, (_, j) in enumerate(sims, start=1):
            e = 1.0 if d <= 1 else 1.0 - math.log(rank) / math.log(d)
            key = (min(i, j), max(i, j))
            exp[key] = max(exp[key], e)
    got = {(r["lo"], r["hi"]): r["score"]
           for r in local_similarity_scores(g).collect()}
    for k, want in exp.items():
        assert got[k] == pytest.approx(want), k


def test_multiscale_scores(spark):
    edges = [(0, 1, 4.0), (0, 2, 1.0), (1, 2, 2.0), (2, 3, 1.0)]
    g = Graph.from_rows(spark, edges, directed=False)
    inc = defaultdict(dict)
    for u, v, w in edges:
        inc[u][v] = w
        inc[v][u] = w
    exp = defaultdict(float)
    for u in inc:
        k = len(inc[u])
        s = sum(inc[u].values())
        for v, w in inc[u].items():
            p = 1.0 - (1.0 - w / s) ** (k - 1)
            key = (min(u, v), max(u, v))
            exp[key] = max(exp[key], p)
    got = {(r["lo"], r["hi"]): r["score"]
           for r in multiscale_scores(g).collect()}
    for k2, want in exp.items():
        assert got[k2] == pytest.approx(want), k2


def test_simmelian_overlap(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    adj, tri = _build(edges)
    max_rank = 3
    top = {}
    for i in adj:
        ranked = sorted(adj[i],
                        key=lambda j: -tri[(min(i, j), max(i, j))])
        rank_of = {}
        r, prev = 0, None
        for idx, j in enumerate(ranked):
            t = tri[(min(i, j), max(i, j))]
            if t != prev:
                r = idx + 1
                prev = t
            rank_of[j] = r
        top[i] = {j for j in adj[i] if rank_of[j] <= max_rank}
    got = {(r["lo"], r["hi"]): r["score"]
           for r in simmelian_overlap_scores(g, max_rank=max_rank).collect()}
    for (lo, hi) in tri:
        want = float(len(top[lo] & top[hi]))
        assert got[(lo, hi)] == pytest.approx(want), (lo, hi)


def test_forest_fire_scores_shape_and_signal(spark, karate):
    # ForestFireScore.cpp: scores in [0,1], max attained, deterministic
    from networkit_spark.graph import Graph
    from networkit_spark.operators.sparsification import forest_fire_scores

    edges, n = karate
    g = Graph.from_rows(spark, [(u, v, 1.0) for u, v in edges],
                        directed=False)
    out = forest_fire_scores(g, pf=0.6, target_burnt_ratio=1.0,
                             batch_fires=16).persist()
    rows = out.collect()
    assert len(rows) == len(edges)
    scores = [r["score"] for r in rows]
    assert max(scores) == 1.0 and min(scores) >= 0.0
    assert sum(1 for s in scores if s > 0) > len(edges) // 2
    # determinism under the same seed
    again = {(r["lo"], r["hi"]): r["score"]
             for r in forest_fire_scores(g, pf=0.6, target_burnt_ratio=1.0,
                                         batch_fires=16).collect()}
    assert {(r["lo"], r["hi"]): r["score"] for r in rows} == again


def test_geometric_mean_scores(spark, karate):
    """GeometricMeanScore.cpp:23-41 oracle: a/sqrt(nodeSum_u*nodeSum_v)."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    from networkit_spark.operators.sparsification import (
        geometric_mean_scores, jaccard_edge_scores)
    jac = jaccard_edge_scores(g)
    att = {(r["lo"], r["hi"]): r["score"] for r in jac.collect()}
    nodesum = defaultdict(float)
    for (lo, hi), a in att.items():
        nodesum[lo] += a
        nodesum[hi] += a
    got = {(r["lo"], r["hi"]): r["score"]
           for r in geometric_mean_scores(jac).collect()}
    assert set(got) == set(att)
    for (lo, hi), a in att.items():
        want = a / math.sqrt(nodesum[lo] * nodesum[hi]) if a > 0 else 0.0
        assert got[(lo, hi)] == pytest.approx(want)


def test_linearize_scores(spark, karate):
    """EdgeScoreLinearizer.cpp:20-57: uniform positions pos/(m-1);
    monotone wrt the input score; inverse flips the order."""
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    from networkit_spark.operators.sparsification import (
        jaccard_edge_scores, linearize_scores)
    jac = jaccard_edge_scores(g)
    m = jac.count()
    lin = {(r["lo"], r["hi"]): r["score"]
           for r in linearize_scores(jac).collect()}
    # exactly the positions 0/(m-1) .. (m-1)/(m-1)
    assert sorted(lin.values()) == pytest.approx(
        [i / (m - 1) for i in range(m)])
    att = {(r["lo"], r["hi"]): r["score"] for r in jac.collect()}
    for e1 in list(att)[:20]:
        for e2 in list(att)[:20]:
            if att[e1] < att[e2]:
                assert lin[e1] < lin[e2]
    inv = {(r["lo"], r["hi"]): r["score"]
           for r in linearize_scores(jac, inverse=True).collect()}
    for e1 in list(att)[:20]:
        for e2 in list(att)[:20]:
            if att[e1] < att[e2]:
                assert inv[e1] > inv[e2]


def test_linearize_single_edge(spark):
    g = Graph.from_rows(spark, [(0, 1)], directed=False)
    from networkit_spark.operators.sparsification import (
        jaccard_edge_scores, linearize_scores)
    rows = linearize_scores(jaccard_edge_scores(g)).collect()
    assert [r["score"] for r in rows] == [0.5]


def test_prefix_jaccard_matches_reference_loop(spark, karate):
    """prefix_jaccard_scores vs a python replication of
    PrefixJaccardScore.cpp:19-147 (competition ranks incl. the partner
    edge, partner excluded from the sets, J evaluated per rank)."""
    from collections import defaultdict

    from networkit_spark.operators.sparsification import (
        prefix_jaccard_scores,
    )
    from networkit_spark.operators.triangles import triangle_edge_scores

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    tri = {(r["lo"], r["hi"]): r["triangles"]
           for r in triangle_edge_scores(g).collect()}
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)

    def rank_of(u):
        atts = {w: tri[(min(u, w), max(u, w))] for w in adj[u]}
        return {w: sum(1 for x in atts.values() if x > a)
                for w, a in atts.items()}

    ranks = {u: rank_of(u) for u in adj}

    def oracle(u, v):
        ru = {w: r for w, r in ranks[u].items() if w != v}
        rv = {w: r for w, r in ranks[v].items() if w != u}
        if not ru and not rv:
            return 0.0
        best = 0.0
        for r in range(max(list(ru.values()) + list(rv.values())) + 1):
            au = {w for w, x in ru.items() if x <= r}
            av = {w for w, x in rv.items() if x <= r}
            union = len(au | av)
            if union:
                best = max(best, len(au & av) / union)
        return best

    got = {(r["lo"], r["hi"]): r["score"]
           for r in prefix_jaccard_scores(g).collect()}
    assert len(got) == 78
    for (lo, hi), s in got.items():
        assert s == pytest.approx(oracle(lo, hi), abs=1e-12), (lo, hi)


def test_modularity_edge_scores(spark):
    """ModularityScoring.h:84-93 exact formula on a weighted fixture."""
    from networkit_spark.operators.sparsification import (
        modularity_edge_scores,
    )

    edges = [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 1.0), (2, 3, 4.0)]
    g = Graph.from_rows(spark, edges, directed=False, n=4)
    W = sum(w for _, _, w in edges)
    wdeg = defaultdict(float)
    for u, v, w in edges:
        wdeg[u] += w
        wdeg[v] += w
    got = {(r["lo"], r["hi"]): r["score"]
           for r in modularity_edge_scores(g).collect()}
    for u, v, w in edges:
        want = w / W - (wdeg[u] / (2 * W)) * (wdeg[v] / (2 * W))
        assert got[(min(u, v), max(u, v))] == pytest.approx(want, abs=1e-12)


def test_chance_corrected_triangle_scores(spark):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.sparsification import (
        chance_corrected_triangle_scores)

    # triangle 0-1-2 plus pendant 3 on 0: n=4
    g = Graph.from_rows(spark, [(0, 1), (1, 2), (0, 2), (0, 3)],
                        directed=False)
    got = {(r["lo"], r["hi"]): r["score"]
           for r in chance_corrected_triangle_scores(g).collect()}
    # deg: 0→3, 1→2, 2→2, 3→1
    # (0,1): 1 tri · (4−2) / ((3−1)(2−1)) = 1.0
    # (1,2): 1 · 2 / (1·1) = 2.0 ; (0,2): 1 · 2 / (2·1) = 1.0
    # (0,3): 0 triangles, deg(3)=1 → 1.0
    assert got == {(0, 1): 1.0, (1, 2): 2.0, (0, 2): 1.0, (0, 3): 1.0}

    # triangle-free edge with both degrees ≥ 2 scores 0
    g2 = Graph.from_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 0)],
                         directed=False)
    got2 = {(r["lo"], r["hi"]): r["score"]
            for r in chance_corrected_triangle_scores(g2).collect()}
    assert all(v == 0.0 for v in got2.values()) and len(got2) == 4
