"""New generators, edge switching, algebraic distance."""

from collections import Counter

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.algebraic import algebraic_edge_scores
from networkit_spark.sources.generators import (
    barabasi_albert_edges, chung_lu_edges, edge_switching,
    havel_hakimi_edges, planted_partition_edges, watts_strogatz_edges,
)


def test_watts_strogatz_lattice(spark):
    e = watts_strogatz_edges(spark, 20, 4, p=0.0).collect()
    assert len(e) == 40  # ring lattice n*k/2
    deg = Counter()
    for r in e:
        deg[r["src"]] += 1
        deg[r["dst"]] += 1
    assert all(d == 4 for d in deg.values())


def test_watts_strogatz_rewired_deterministic(spark):
    a = {(r["src"], r["dst"])
         for r in watts_strogatz_edges(spark, 30, 4, 0.5, seed=1).collect()}
    b = {(r["src"], r["dst"])
         for r in watts_strogatz_edges(spark, 30, 4, 0.5, seed=1).collect()}
    c = {(r["src"], r["dst"])
         for r in watts_strogatz_edges(spark, 30, 4, 0.0).collect()}
    assert a == b
    assert a != c  # rewiring actually happened


def test_barabasi_albert(spark):
    edges = barabasi_albert_edges(50, 3, seed=5)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    # hubs exist: max degree well above attachment k
    assert max(deg.values()) > 6
    assert len({u for e in edges for u in e}) == 50


def test_chung_lu(spark):
    w = [10.0] * 5 + [1.0] * 45
    edges = chung_lu_edges(w, seed=3)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    heavy = sum(deg[i] for i in range(5)) / 5
    light = sum(deg[i] for i in range(5, 50)) / 45
    assert heavy > 2 * light


def test_havel_hakimi(spark):
    seq = [3, 3, 2, 2, 2, 2]
    edges = havel_hakimi_edges(seq)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    assert sorted(deg.values(), reverse=True) == sorted(seq, reverse=True)
    with pytest.raises(ValueError):
        havel_hakimi_edges([3, 1])


def test_edge_switching_preserves_degrees(spark, karate):
    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False)
    before = Counter()
    for u, v in edges:
        before[u] += 1
        before[v] += 1
    out = edge_switching(g.edges, rounds=5, seed=9)
    rows = [(r["src"], r["dst"]) for r in out.collect()]
    after = Counter()
    for u, v in rows:
        after[u] += 1
        after[v] += 1
    assert before == after
    assert len(rows) == len(edges)
    assert set(rows) != {(min(u, v), max(u, v)) for u, v in edges}


def test_algebraic_distance_separates_clusters(spark):
    edges, truth = planted_partition_edges(60, 3, p_in=0.5, p_out=0.03,
                                           seed=2)
    g = Graph.from_rows(spark, edges, directed=False)
    scores = {(r["lo"], r["hi"]): r["score"]
              for r in algebraic_edge_scores(g, n_systems=8,
                                             n_iters=20).collect()}
    intra = [s for (u, v), s in scores.items() if truth[u] == truth[v]]
    inter = [s for (u, v), s in scores.items() if truth[u] != truth[v]]
    assert inter, "fixture should have cross-cluster edges"
    assert sum(intra) / len(intra) < sum(inter) / len(inter)


def test_regular_ring_lattice(spark):
    from networkit_spark.sources.generators import regular_ring_lattice_edges
    e = {(r["src"], r["dst"])
         for r in regular_ring_lattice_edges(spark, 12, 4).collect()}
    want = set()
    for i in range(12):
        for j in (1, 2):
            u, v = i, (i + j) % 12
            want.add((min(u, v), max(u, v)))
    assert e == want  # every node degree 4, ring distance <= 2


def test_dorogovtsev_mendes(spark):
    from collections import Counter

    from networkit_spark.sources.generators import dorogovtsev_mendes_edges
    n = 200
    e = dorogovtsev_mendes_edges(n, seed=7)
    assert len(e) == 3 + 2 * (n - 3)  # triangle + 2 per new node
    assert e == dorogovtsev_mendes_edges(n, seed=7)  # deterministic
    deg = Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    assert len(deg) == n and min(deg.values()) >= 2
    # growth model: old nodes accumulate degree (power-law-ish head)
    assert max(deg.values()) > 10


def test_pub_web_edges(spark):
    import math

    from networkit_spark.sources.generators import (
        pub_web_edges, pub_web_points,
    )
    n, rad, cap = 400, 0.08, 6
    pts = {r["id"]: (r["x"], r["y"])
           for r in pub_web_points(spark, n, seed=3).collect()}
    assert len(pts) == n
    assert all(0 <= x < 1 and 0 <= y < 1 for x, y in pts.values())
    rows = pub_web_edges(spark, n, neighborhood_radius=rad,
                         max_neighbors=cap, seed=3).collect()
    assert rows

    def torus_d(a, b):
        dx = min(abs(a[0] - b[0]), 1 - abs(a[0] - b[0]))
        dy = min(abs(a[1] - b[1]), 1 - abs(a[1] - b[1]))
        return math.hypot(dx, dy)

    from collections import Counter
    deg = Counter()
    for r in rows:
        d = torus_d(pts[r["src"]], pts[r["dst"]])
        assert d <= rad + 1e-9
        assert r["weight"] == pytest.approx(0.01 / d, rel=1e-6)
        deg[r["src"]] += 1
        deg[r["dst"]] += 1
    assert max(deg.values()) <= cap
    # deterministic
    again = pub_web_edges(spark, n, neighborhood_radius=rad,
                          max_neighbors=cap, seed=3).collect()
    assert sorted((r["src"], r["dst"]) for r in rows) == \
        sorted((r["src"], r["dst"]) for r in again)


def test_hyperbolic_edges_exact_vs_bruteforce(spark):
    """Band/bucket candidate join must reproduce the brute-force
    threshold RHG edge set exactly (windows are upper bounds, the exact
    cosh filter decides)."""
    import math

    from networkit_spark.sources.generators import (
        _rhg_bands, _u01, hyperbolic_edges,
    )
    n, gamma, k = 300, 2.8, 6.0
    alpha = (gamma - 1) / 2
    plexp = 2 * alpha + 1
    xi_inv = (plexp - 2) / (plexp - 1)
    R = 2 * math.log(n / (k * (math.pi / 2) * xi_inv * xi_inv))
    # recompute the SAME deterministic coordinates the generator uses
    import pyspark.sql.functions as F
    cosh_ar = math.cosh(alpha * R)
    pts = spark.range(n).select(
        "id",
        (F.acosh(1.0 + _u01(F.col("id"), F.lit(42), F.lit(0))
                 * (cosh_ar - 1.0)) / alpha).alias("r"),
        (_u01(F.col("id"), F.lit(42), F.lit(1)) * (2 * math.pi))
        .alias("theta")).collect()
    coords = {p["id"]: (p["r"], p["theta"]) for p in pts}
    want = set()
    cr = math.cosh(R)
    for i in range(n):
        r1, t1 = coords[i]
        for j in range(i + 1, n):
            r2, t2 = coords[j]
            d = (math.cosh(r1) * math.cosh(r2)
                 - math.sinh(r1) * math.sinh(r2) * math.cos(t1 - t2))
            if d <= cr:
                want.add((i, j))
    got = {(r["src"], r["dst"])
           for r in hyperbolic_edges(spark, n, k, gamma).collect()}
    assert got == want
    assert len(got) > n  # dense enough to be a real check
    bands = _rhg_bands(n, R)
    assert bands[0] == 0.0 and bands[-1] == R and len(bands) >= 4


def test_dynamic_pub_web_events(spark):
    from networkit_spark.sources.generators import (
        dynamic_pub_web_events, pub_web_edges_from_points)

    ev, pts = dynamic_pub_web_events(spark, n=60, n_steps=2, churn=0.1,
                                     neighborhood_radius=0.2,
                                     max_neighbors=6, seed=7)
    rows = ev.collect()
    types = {r["type"] for r in rows}
    assert "TIME_STEP" in types and "NODE_REMOVAL" in types \
        and "NODE_ADDITION" in types
    # per step: 10% of 60 leave and arrive
    t1 = [r for r in rows if r["t"] == 1]
    assert sum(r["type"] == "NODE_REMOVAL" for r in t1) == 6
    assert sum(r["type"] == "NODE_ADDITION" for r in t1) == 6
    # replaying the edge diffs reproduces the final structure exactly
    final = {(r["src"], r["dst"]) for r in
             pub_web_edges_from_points(pts, 0.2, 6).collect()}
    cur = set()
    from networkit_spark.sources.generators import (
        pub_web_points, pub_web_edges)
    cur = {(r["src"], r["dst"]) for r in
           pub_web_edges(spark, 60, neighborhood_radius=0.2,
                         max_neighbors=6, seed=7).collect()}
    for r in sorted(rows, key=lambda r: r["t"]):
        if r["type"] == "EDGE_ADDITION":
            cur.add((r["u"], r["v"]))
        elif r["type"] == "EDGE_REMOVAL":
            cur.discard((r["u"], r["v"]))
    assert cur == final
    # removed nodes have no surviving incident edges
    removed = {r["u"] for r in rows if r["type"] == "NODE_REMOVAL"}
    pts_ids = {r["id"] for r in pts.collect()}
    assert removed.isdisjoint(pts_ids)


def test_dynamic_hyperbolic_events(spark):
    from networkit_spark.sources.generators import (
        _rhg_R, dynamic_hyperbolic_events, hyperbolic_edges,
        hyperbolic_edges_from_points)

    ev, pts = dynamic_hyperbolic_events(spark, n=80, n_steps=2,
                                        move_fraction=0.3,
                                        move_angle=0.5, seed=11)
    rows = ev.collect()
    assert sum(r["type"] == "TIME_STEP" for r in rows) == 2
    # node set is static (movement model): no node events
    assert not any(r["type"].startswith("NODE") for r in rows)
    # replay reproduces the final structure
    cur = {(r["src"], r["dst"]) for r in
           hyperbolic_edges(spark, 80, seed=11).collect()}
    for r in sorted(rows, key=lambda r: r["t"]):
        if r["type"] == "EDGE_ADDITION":
            cur.add((r["u"], r["v"]))
        elif r["type"] == "EDGE_REMOVAL":
            cur.discard((r["u"], r["v"]))
    final = {(r["src"], r["dst"]) for r in
             hyperbolic_edges_from_points(
                 pts, 80, _rhg_R(80, 6.0, 3.0)).collect()}
    assert cur == final and len(rows) > 2  # movement produced edge churn
