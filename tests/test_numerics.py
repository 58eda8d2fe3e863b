"""Numerics (CG solver), spectral coloring, gini, BFS sampling."""

import numpy as np
import pytest

from networkit_spark.graph import Graph


def test_conjugate_gradient_laplacian_system(spark, karate):
    """CG on (L + εI) x = b vs numpy.linalg.solve."""
    from networkit_spark.operators.numerics import (
        conjugate_gradient, laplacian_matrix,
    )

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    L = laplacian_matrix(g)
    eps = 0.1
    A = L.union(
        spark.createDataFrame([(i, i, eps) for i in range(n)],
                              "row long, col long, val double"))
    rng = np.random.default_rng(5)
    bvec = rng.normal(size=n)
    b = spark.createDataFrame(
        [(i, float(bvec[i])) for i in range(n)], "id long, val double")
    got = conjugate_gradient(A, b, tol=1e-10, max_iter=300)
    got_x = np.zeros(n)
    for r in got.collect():
        got_x[int(r["id"])] = r["val"]
    # numpy oracle
    Ld = np.zeros((n, n))
    for u, v in edges:
        if u != v:
            Ld[u, v] -= 1.0
            Ld[v, u] -= 1.0
    np.fill_diagonal(Ld, -Ld.sum(axis=1))
    want = np.linalg.solve(Ld + eps * np.eye(n), bvec)
    assert np.allclose(got_x, want, atol=1e-6)


def test_conjugate_gradient_no_precond(spark):
    from networkit_spark.operators.numerics import conjugate_gradient

    A = spark.createDataFrame(
        [(0, 0, 4.0), (0, 1, 1.0), (1, 0, 1.0), (1, 1, 3.0)],
        "row long, col long, val double")
    b = spark.createDataFrame([(0, 1.0), (1, 2.0)], "id long, val double")
    x = {r["id"]: r["val"]
         for r in conjugate_gradient(A, b, precond=None).collect()}
    want = np.linalg.solve(np.array([[4.0, 1.0], [1.0, 3.0]]),
                           np.array([1.0, 2.0]))
    assert x[0] == pytest.approx(want[0], abs=1e-8)
    assert x[1] == pytest.approx(want[1], abs=1e-8)


def test_spectral_coloring_is_proper(spark, karate):
    from networkit_spark.operators.coloring import spectral_coloring

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    cols = {r["id"]: r["color"] for r in spectral_coloring(g).collect()}
    assert set(cols) == set(range(n))
    for u, v in edges:
        if u != v:
            assert cols[u] != cols[v], (u, v)
    # deterministic
    cols2 = {r["id"]: r["color"] for r in spectral_coloring(g).collect()}
    assert cols == cols2


def test_gini(spark):
    from networkit_spark.operators.graph_tools import gini

    vals = [1.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    assert gini(df) == pytest.approx(0.0, abs=1e-12)
    rng = np.random.default_rng(3)
    vals = rng.exponential(size=60)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    xs = np.sort(vals)
    n = len(xs)
    want = 2 * np.sum((np.arange(1, n + 1)) * xs) / (n * xs.sum()) \
        - (n + 1) / n
    assert gini(df) == pytest.approx(float(want), abs=1e-9)


def test_bfs_sample(spark, karate):
    from networkit_spark.operators.distances import bfs_sample
    from networkit_spark.operators.components import (
        connected_components, num_components,
    )

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    sub = bfs_sample(g, source=0, k=10)
    nodes = {r["id"] for r in sub.vertices.collect()}
    assert len(nodes) == 10 and 0 in nodes
    assert num_components(connected_components(sub)) == 1
    # deterministic
    nodes2 = {r["id"] for r in bfs_sample(g, 0, 10).vertices.collect()}
    assert nodes == nodes2


def test_spectral_partitioner_karate(spark, karate):
    from networkit_spark.operators.partitioning import (
        compute_imbalance, spectral_partitioner,
    )

    edges, n = karate
    g = Graph.from_rows(spark, edges, directed=False, n=n)
    p2 = spectral_partitioner(g, 2)
    rows = {r["id"]: r["subset"] for r in p2.collect()}
    assert set(rows) == set(range(n))
    sizes = {}
    for s in rows.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert len(sizes) == 2 and min(sizes.values()) >= 10  # balanced
    # the Fiedler split of karate tracks the club fission: instructor
    # (0) and president (33) land on opposite sides
    assert rows[0] != rows[33]
    assert compute_imbalance(p2, n) == pytest.approx(
        max(sizes.values()) / float(np.ceil(n / 2)), abs=1e-12)
    # count=4: proper partition into 4 non-empty subsets
    p4 = {r["id"]: r["subset"] for r in
          spectral_partitioner(g, 4).collect()}
    assert set(p4) == set(range(n)) and len(set(p4.values())) == 4
    # determinism
    assert rows == {r["id"]: r["subset"] for r in
                    spectral_partitioner(g, 2).collect()}


def test_jacobi_relaxation_converges(spark):
    import numpy as np

    from networkit_spark.operators.numerics import jacobi_relaxation

    # SPD diagonally dominant system
    A = np.array([[4.0, 1.0, 0.0], [1.0, 5.0, 2.0], [0.0, 2.0, 6.0]])
    bvec = np.array([1.0, -2.0, 3.0])
    rows = [(i, j, float(A[i, j])) for i in range(3) for j in range(3)
            if A[i, j] != 0.0]
    mdf = spark.createDataFrame(rows, "row long, col long, val double")
    bdf = spark.createDataFrame(
        [(i, float(bvec[i])) for i in range(3)], "id long, val double")
    got = {r["id"]: r["val"]
           for r in jacobi_relaxation(mdf, bdf, iters=80).collect()}
    want = np.linalg.solve(A, bvec)
    for i in range(3):
        assert abs(got[i] - want[i]) < 1e-6, (i, got[i], want[i])

    # missing diagonal raises
    bad = spark.createDataFrame([(0, 1, 1.0), (1, 0, 1.0)],
                                "row long, col long, val double")
    import pytest as _pt
    with _pt.raises(RuntimeError):
        jacobi_relaxation(bad, bdf, iters=1)


def test_lamg_solve_laplacian_matches_lstsq(spark):
    """Multilevel (LAMG-role) solve on a connected Laplacian: residual
    below tol and the zero-meaned solution matches numpy's minimum-norm
    solve."""
    import numpy as np

    from networkit_spark.operators.numerics import (
        lamg_solve, laplacian_matrix)

    # ring of 24 + chords: connected, singular Laplacian
    edges = [(i, (i + 1) % 24) for i in range(24)] + \
        [(i, (i + 7) % 24) for i in range(0, 24, 3)]
    g = Graph.from_rows(spark, edges, directed=False)
    L = laplacian_matrix(g)
    n = 24
    bvec = np.array([(i % 5) - 2.0 for i in range(n)])
    bvec -= bvec.mean()  # zero-sum: consistent for the Laplacian
    b = spark.createDataFrame(
        [(i, float(bvec[i])) for i in range(n)], "id long, val double")
    # force a real hierarchy (coarsest below n)
    x = lamg_solve(L, b, tol=1e-9, coarsest=6)
    got = np.zeros(n)
    for r in x.collect():
        got[r["id"]] = r["val"]

    A = np.zeros((n, n))
    for r in L.collect():
        A[r["row"], r["col"]] += r["val"]
    want, *_ = np.linalg.lstsq(A, bvec, rcond=None)
    assert np.linalg.norm(A @ got - bvec) < 1e-7 * max(
        1.0, np.linalg.norm(bvec))
    got -= got.mean()
    want -= want.mean()
    assert np.allclose(got, want, atol=1e-6)


def test_lamg_solve_small_system_direct(spark):
    """A system at or below the coarsest threshold short-circuits to
    the dense driver solve — still exact."""
    import numpy as np

    from networkit_spark.operators.numerics import (
        lamg_solve, laplacian_matrix)

    g = Graph.from_rows(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    L = laplacian_matrix(g)
    b = spark.createDataFrame(
        [(0, 1.0), (1, -1.0), (2, 1.0), (3, -1.0)], "id long, val double")
    x = {r["id"]: r["val"] for r in lamg_solve(L, b).collect()}
    A = np.zeros((4, 4))
    for r in L.collect():
        A[r["row"], r["col"]] += r["val"]
    xv = np.array([x[i] for i in range(4)])
    bv = np.array([1.0, -1.0, 1.0, -1.0])
    assert np.linalg.norm(A @ xv - bv) < 1e-8
