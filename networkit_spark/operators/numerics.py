"""Distributed linear solvers over relational sparse matrices.

Reference: /root/reference/networkit/cpp/numerics/ — ConjugateGradient.h
(CG over CSRMatrix, optionally preconditioned), GaussSeidelRelaxation.h,
and the LAMG multigrid hierarchy. CG and Jacobi-smoothed iterations map
directly onto the engine's SpMV (operators/semiring.spmv): each
iteration is two keyed aggregations (one SpMV + dot products) and two
vector updates — vertex-sized shuffles, driver holds only scalars.
LAMG's hierarchy construction is declared out of scope (COVERAGE.md);
CG with the Jacobi preconditioner is the general-purpose solve the
reference exposes through it for Laplacian systems (commute time,
MaxentStress).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.scratch import Scratch
from networkit_spark.operators.semiring import spmv


def laplacian_matrix(g: Graph) -> DataFrame:
    """(row, col, val): the graph Laplacian L = D − W of the undirected
    view, in relational triplet form (CSRMatrix::laplacianMatrix)."""
    e = g.edges.filter("src != dst").select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.col("weight").cast("double").alias("w"),
    ).groupBy("a", "b").agg(F.max("w").alias("w"))
    off = e.select(F.col("a").alias("row"), F.col("b").alias("col"),
                   (-F.col("w")).alias("val")).union(
        e.select(F.col("b").alias("row"), F.col("a").alias("col"),
                 (-F.col("w")).alias("val")))
    deg = off.groupBy(F.col("row")).agg((-F.sum("val")).alias("val")) \
        .select("row", F.col("row").alias("col"), "val")
    return off.union(deg)


def _dot(a: DataFrame, b: DataFrame) -> float:
    j = a.join(b.withColumnRenamed("val", "v2"), "id")
    r = j.agg(F.sum(F.col("val") * F.col("v2"))).collect()[0][0]
    return float(r or 0.0)


def conjugate_gradient(matrix: DataFrame, b: DataFrame,
                       tol: float = 1e-9, max_iter: int = 200,
                       precond: str | None = "jacobi") -> DataFrame:
    """(id, val): solve A x = b by (preconditioned) conjugate gradient
    (numerics/ConjugateGradient.h:34-80 — same update sequence; the
    DiagonalPreconditioner is ``precond="jacobi"``). ``matrix`` is SPD
    in (row, col, val) triplet form, ``b`` is (id, val).

    Distributed shape: per iteration ONE SpMV (join + keyed agg) plus
    two scalar dot products — residual/direction vectors are
    vertex-sized DataFrames cut through the shared scratch, the driver
    carries only α/β/ρ scalars, exactly the CSRMatrix loop with the
    vector arithmetic made relational."""
    spark = matrix.sparkSession
    with Scratch(spark, "cg") as sc:
        # coalesce duplicate triplets up front (triplet semantics: they
        # add) — keeps the Jacobi diagonal one row per id
        A = sc.cut(matrix.select("row", "col",
                                 F.col("val").cast("double").alias("val"))
                   .groupBy("row", "col").agg(F.sum("val").alias("val")))
        if precond == "jacobi":
            dinv = A.filter((F.col("row") == F.col("col"))
                            & (F.col("val") != 0.0)).select(
                F.col("row").alias("id"),
                (1.0 / F.col("val")).alias("dinv"))
            # guard: an id in b with no (or zero) diagonal entry would be
            # silently dropped from z/p/x by the inner join below (e.g. an
            # isolated vertex in a Laplacian) — fail loudly instead
            missing = b.select("id").distinct().join(
                dinv, "id", "left_anti").count()
            if missing:
                raise RuntimeError(
                    f"conjugate_gradient(precond='jacobi'): {missing} id(s) "
                    "in b have no nonzero diagonal entry in A — the Jacobi "
                    "preconditioner is undefined there (pass precond=None "
                    "or fix the system)")
        elif precond is None:
            dinv = None
        else:
            raise ValueError(f"unknown preconditioner {precond!r}")

        def apply_m(df: DataFrame) -> DataFrame:
            if dinv is None:
                return df
            return df.join(dinv, "id").select(
                "id", (F.col("val") * F.col("dinv")).alias("val"))

        bb = sc.cut(b.select("id", F.col("val").cast("double").alias("val")))
        x = bb.select("id", F.lit(0.0).alias("val"))
        r = bb
        z = apply_m(r)
        p = sc.cut(z)
        rho = _dot(r, z)
        bnorm = _dot(bb, bb) ** 0.5 or 1.0
        for _ in range(max_iter):
            Ap = spmv(A, p.withColumnRenamed("val", "val")
                      .select(F.col("id"), F.col("val")))
            # spmv aggregates by col; rows absent from p's support are 0
            Ap = p.select("id").join(Ap, "id", "left").select(
                "id", F.coalesce("val", F.lit(0.0)).alias("val"))
            denom = _dot(p, Ap)
            if denom == 0.0:
                break
            alpha = rho / denom
            x = x.join(p.withColumnRenamed("val", "pv"), "id").select(
                "id", (F.col("val") + alpha * F.col("pv")).alias("val"))
            r = r.join(Ap.withColumnRenamed("val", "apv"), "id").select(
                "id", (F.col("val") - alpha * F.col("apv")).alias("val"))
            x, r = sc.cut(x), sc.cut(r)
            res = _dot(r, r) ** 0.5
            if res / bnorm < tol:
                break
            z = apply_m(r)
            rho_new = _dot(r, z)
            beta = rho_new / rho
            rho = rho_new
            p = sc.cut(z.join(p.withColumnRenamed("val", "pv"), "id")
                       .select("id", (F.col("val")
                                      + beta * F.col("pv")).alias("val")))
        else:
            raise RuntimeError(
                f"conjugate_gradient: no convergence in {max_iter} "
                f"iterations (residual {res / bnorm:.2e})")
        out = x.persist()
        out.count()
    return out


def jacobi_relaxation(matrix: DataFrame, b: DataFrame,
                      x0: DataFrame | None = None, iters: int = 10,
                      omega: float = 2.0 / 3.0) -> DataFrame:
    """(id, val): weighted-Jacobi smoothing sweeps over A x = b — the
    order-free distributed analogue of the reference's Gauss-Seidel
    smoother (numerics/GaussSeidelRelaxation.h; GS updates in row order,
    which has no batch dataflow form — damped Jacobi is the standard
    parallel substitute with the same smoothing role, ω=2/3 optimal for
    Laplacian-like spectra; documented deviation).

    Per sweep: ONE SpMV (join + keyed agg) + one column-expression
    update  x ← x + ω·D⁻¹·(b − A x)  — vertex-sized state, no driver
    data."""
    spark = matrix.sparkSession
    with Scratch(spark, "jacobi") as sc:
        A = sc.cut(matrix.select("row", "col",
                                 F.col("val").cast("double").alias("val"))
                   .groupBy("row", "col").agg(F.sum("val").alias("val")))
        dinv = A.filter((F.col("row") == F.col("col"))
                        & (F.col("val") != 0.0)).select(
            F.col("row").alias("id"), (1.0 / F.col("val")).alias("dinv"))
        bb = sc.cut(b.select("id", F.col("val").cast("double").alias("val")))
        missing = bb.select("id").join(dinv, "id", "left_anti").count()
        if missing:
            raise RuntimeError(
                f"jacobi_relaxation: {missing} id(s) have no nonzero "
                "diagonal in A — the Jacobi update is undefined there")
        x = x0.select("id", F.col("val").cast("double").alias("val")) \
            if x0 is not None else bb.select("id", F.lit(0.0).alias("val"))
        x = sc.cut(x)
        for _ in range(iters):
            Ax = spmv(A, x)
            Ax = x.select("id").join(Ax, "id", "left").select(
                "id", F.coalesce("val", F.lit(0.0)).alias("val"))
            x = sc.cut(
                x.join(bb.withColumnRenamed("val", "b"), "id")
                .join(Ax.withColumnRenamed("val", "ax"), "id")
                .join(dinv, "id")
                .select("id", (F.col("val") + omega * F.col("dinv")
                               * (F.col("b") - F.col("ax"))).alias("val")))
        out = x.persist()
        out.count()
    return out


def lamg_solve(matrix: DataFrame, b: DataFrame, tol: float = 1e-8,
               max_cycles: int = 60, pre_sweeps: int = 2,
               post_sweeps: int = 2, coarsest: int = 128,
               max_levels: int = 12,
               omega: float = 2.0 / 3.0) -> DataFrame:
    """(id, val): multilevel (LAMG-role) Laplacian solve of A x = b.

    Reference: /root/reference/networkit/cpp/numerics/LAMG/
    MultiLevelSetup.cpp:13-210 + SolverLamg.cpp — Livne & Brandt's lean
    algebraic multigrid: build a hierarchy of coarse operators, solve
    with smoothed cycles, direct-solve the coarsest level. This is the
    standard AGGREGATION-AMG realization of that role (the distributed
    batch form), with the documented simplifications:

      - aggregation: each row joins its strongest off-diagonal
        neighbor (max |A_uv|, ties min id) and the resulting star
        forest is collapsed by a bounded min-label pass — one keyed
        max_by + a few label joins per level, instead of LAMG's
        affinity/test-vector lean aggregation (MultiLevelSetup.cpp:
        62-106) — coarsening quality differs, the Galerkin algebra
        does not;
      - prolongation is piecewise-constant (P[u, agg(u)] = 1), so the
        Galerkin operator P^T A P is ONE join + hash aggregation per
        level (the same contraction shape as ParallelPartitionCoarsening)
        and restriction/prolongation are keyed aggregations/joins;
      - smoother: damped Jacobi (ω=2/3), the order-free analogue of the
        reference's Gauss–Seidel (see jacobi_relaxation);
      - elimination stages and the energy-corrected interpolation are
        omitted (documented; they tune the constant, not the O(m)
        per-cycle shape);
      - coarsest level (n ≤ ``coarsest``) solves densely on the driver
        via numpy lstsq (minimum-norm — handles the Laplacian's
        constant nullspace), a k×k bounded collect.

    V(``pre_sweeps``, ``post_sweeps``) cycles iterate until
    ‖b − A x‖ ≤ tol·‖b‖. Per cycle the work is O(nnz) split across one
    SpMV per sweep + one restriction + one prolongation per level —
    the multigrid shape that survives 100×. Raises like
    conjugate_gradient when an id lacks a nonzero diagonal."""
    import numpy as np

    spark = matrix.sparkSession
    with Scratch(spark, "lamg") as sc:
        A0 = sc.cut(matrix.select("row", "col",
                                  F.col("val").cast("double").alias("val"))
                    .groupBy("row", "col").agg(F.sum("val").alias("val"))
                    .filter(F.col("val") != 0.0))
        bb = sc.cut(b.select("id", F.col("val").cast("double").alias("val")))
        d0 = A0.filter(F.col("row") == F.col("col")).select(
            F.col("row").alias("id"), (1.0 / F.col("val")).alias("dinv"))
        if bb.select("id").join(d0, "id", "left_anti").count():
            raise RuntimeError(
                "lamg_solve: some id(s) in b have no nonzero diagonal "
                "in A — the smoother is undefined there")

        # ---- setup: hierarchy of (A_l, dinv_l, map_l, n_l) ----
        levels = [{"A": A0, "dinv": sc.cut(d0), "n":
                   A0.select("row").distinct().count()}]
        while (levels[-1]["n"] > coarsest
               and len(levels) < max_levels):
            A = levels[-1]["A"]
            off = A.filter(F.col("row") != F.col("col"))
            pick = (off.groupBy("row")
                    .agg(F.max_by("col", F.struct(F.abs("val"),
                                                  -F.col("col")))
                         .alias("mate")))
            # collapse the star forest: bounded min-label over the
            # undirected (row, mate) pairing
            e = pick.select(F.col("row").alias("u"),
                            F.col("mate").alias("v"))
            e = sc.cut(e.union(e.select(F.col("v").alias("u"),
                                        F.col("u").alias("v"))))
            lab = levels[-1]["A"].select(F.col("row").alias("id")) \
                .distinct().withColumn("agg", F.col("id"))
            lab = sc.cut(lab)
            for _ in range(6):
                nbr = (e.join(lab.select(F.col("id").alias("v"),
                                         F.col("agg").alias("na")), "v")
                       .groupBy(F.col("u").alias("id"))
                       .agg(F.min("na").alias("na")))
                lab = sc.cut(
                    lab.join(nbr, "id", "left")
                    .select("id", F.least(
                        "agg", F.coalesce("na", F.col("agg")))
                        .alias("agg")))
            mapping = lab
            nc = mapping.select("agg").distinct().count()
            if nc >= levels[-1]["n"]:
                break  # aggregation stalled — stop coarsening
            mr = mapping.select(F.col("id").alias("row"),
                                F.col("agg").alias("ar"))
            mc2 = mapping.select(F.col("id").alias("col"),
                                 F.col("agg").alias("ac"))
            Ac = sc.cut(
                A.join(mr, "row").join(mc2, "col")
                .groupBy(F.col("ar").alias("row"),
                         F.col("ac").alias("col"))
                .agg(F.sum("val").alias("val"))
                .filter(F.col("val") != 0.0))
            dc = Ac.filter(F.col("row") == F.col("col")).select(
                F.col("row").alias("id"),
                (1.0 / F.col("val")).alias("dinv"))
            levels[-1]["map"] = mapping
            levels.append({"A": Ac, "dinv": sc.cut(dc), "n": nc})

        def smooth(l, x, rhs, sweeps):
            A, dinv = levels[l]["A"], levels[l]["dinv"]
            for _ in range(sweeps):
                Ax = spmv(A, x)
                Ax = x.select("id").join(Ax, "id", "left").select(
                    "id", F.coalesce("val", F.lit(0.0)).alias("val"))
                x = sc.cut(
                    x.join(rhs.withColumnRenamed("val", "b2"), "id")
                    .join(Ax.withColumnRenamed("val", "ax"), "id")
                    .join(dinv, "id")
                    .select("id", (F.col("val") + omega * F.col("dinv")
                                   * (F.col("b2") - F.col("ax")))
                            .alias("val")))
            return x

        def residual(l, x, rhs):
            Ax = spmv(levels[l]["A"], x)
            return (rhs.join(Ax.withColumnRenamed("val", "ax"),
                             "id", "left")
                    .select("id", (F.col("val")
                                   - F.coalesce("ax", F.lit(0.0)))
                            .alias("val")))

        def coarse_direct(rhs):
            trips = levels[-1]["A"].collect()
            ids = sorted({r["row"] for r in trips}
                         | {r["col"] for r in trips})
            idx = {v: i for i, v in enumerate(ids)}
            k = len(ids)
            M = np.zeros((k, k))
            for r in trips:
                M[idx[r["row"]], idx[r["col"]]] += r["val"]
            rv = np.zeros(k)
            for r in rhs.collect():
                if r["id"] in idx:
                    rv[idx[r["id"]]] = r["val"]
            sol, *_ = np.linalg.lstsq(M, rv, rcond=None)
            return spark.createDataFrame(
                [(int(v), float(sol[i])) for v, i in idx.items()],
                "id long, val double")

        def vcycle(l, rhs, x):
            if l == len(levels) - 1:
                return coarse_direct(rhs)
            x = smooth(l, x, rhs, pre_sweeps)
            r = residual(l, x, rhs)
            mp = levels[l]["map"]
            rc = sc.cut(
                r.join(mp, "id")
                .groupBy(F.col("agg").alias("id"))
                .agg(F.sum("val").alias("val")))
            ec = vcycle(l + 1, rc, rc.select("id", F.lit(0.0).alias("val")))
            x = sc.cut(
                x.join(mp, "id")
                .join(ec.select(F.col("id").alias("agg"),
                                F.col("val").alias("e")), "agg", "left")
                .select("id", (F.col("val")
                               + F.coalesce("e", F.lit(0.0))).alias("val")))
            return smooth(l, x, rhs, post_sweeps)

        bnorm = _dot(bb, bb) ** 0.5 or 1.0
        x = sc.cut(bb.select("id", F.lit(0.0).alias("val")))
        for _ in range(max_cycles):
            x = vcycle(0, bb, x)
            r = sc.cut(residual(0, x, bb))
            res = _dot(r, r) ** 0.5
            if res / bnorm < tol:
                break
        else:
            raise RuntimeError(
                f"lamg_solve: no convergence in {max_cycles} V-cycles "
                f"(residual {res / bnorm:.2e})")
        out = x.persist()
        out.count()
    return out
