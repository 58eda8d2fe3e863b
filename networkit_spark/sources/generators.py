"""Deterministic synthetic graph generators (FIXTURES.md §1, §2.6, §4).

``rmat_edges`` reimplements the recursive-quadrant R-MAT sampler (cf. the
reference's /root/reference/networkit/cpp/generators/RmatGenerator.cpp —
same recursion, different execution): for edge i and recursion level j the
quadrant is chosen by a uniform draw. We derive that draw from
``xxhash64(i, j, seed)`` — a counter-based RNG — so edge i's value is a
pure function of (i, j, seed): fully deterministic, partition-independent,
and expressible as built-in column expressions (whole-stage codegen, no
Python in the loop). ``spark.range(m)`` scales to any m with no shuffle.

``render_repos`` renders an edge skeleton *backwards* into a synthetic
source-code corpus of the BASELINE.json ``input_hint`` shape
``(repo, path, commit, lang, content)``: file i's content contains one
lang-appropriate import line per out-neighbor j, so the edge graph derived
by :mod:`networkit_spark.sources.repos` equals the skeleton exactly.

Small fixture generators (Erdős–Rényi, planted partition à la the
reference's ClusteredRandomGraphGenerator) are seeded numpy on the driver —
they exist to make test inputs, not to scale.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

MAX_INT63 = (1 << 63) - 1

LANGS = ["py", "js", "java", "go", "c"]

# per-lang import-line template rendered by render_repos; the matching
# extraction regexes live in networkit_spark.sources.repos
_IMPORT_TEMplates = {
    "py": ("import ", ""),
    "js": ("const m = require('", "');"),
    "java": ("import ", ";"),
    "go": ('import "', '"'),
    "c": ('#include "', '.h"'),
}


def _u01(*cols):
    """Deterministic uniform [0,1) from column values via xxhash64."""
    h = F.xxhash64(*cols)
    # map int64 -> [0,1): shift to [0, 2^64) then scale
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def _md5_int60(*cols):
    """Deterministic non-negative int60 from column values: first 15 hex
    chars of md5(colon-joined values). Bit-identical in DuckDB:
    CAST(('0x' || SUBSTRING(md5(a || ':' || b || ...), 1, 15)) AS BIGINT)."""
    joined = F.concat_ws(":", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def _u01_md5(*cols):
    """Deterministic uniform [0,1) via md5 — the SQL-oracle-reproducible
    RNG (division by 2^60 is a power-of-two scale, hence exact: the
    resulting double is bit-identical across engines)."""
    return _md5_int60(*cols).cast("double") / F.lit(float(1 << 60))


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
    deduplicate: bool = True,
    rng: str = "xxhash64",
) -> DataFrame:
    """R-MAT graph over n=2^scale vertices, m=n*edge_factor sampled edges.

    Returns (src: long, dst: long). Self-loops kept (callers filter);
    duplicates dropped by default (R-MAT resamples collide on purpose).
    ``rng="md5"`` switches the counter-based draw to the md5-derived
    uniform (slower, but bit-reproducible in DuckDB — used by the gated
    corpus queries so the full pipeline gets a SQL oracle).
    """
    n = 1 << scale
    m = n * edge_factor
    u01 = _u01_md5 if rng == "md5" else _u01
    df = spark.range(m).select(F.col("id").alias("i"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for j in range(scale):
        u = u01(F.col("i"), F.lit(j), F.lit(seed))
        src_bit = (u >= F.lit(a + b)).cast("long")  # quadrants c,d -> lower half of src? no: rows
        dst_bit = ((u >= F.lit(a)) & (u < F.lit(a + b)) | (u >= F.lit(a + b + c))).cast("long")
        src = src + (src_bit * F.lit(1 << j)).cast("long")
        dst = dst + (dst_bit * F.lit(1 << j)).cast("long")
    out = df.select(src.alias("src"), dst.alias("dst"))
    if deduplicate:
        out = out.distinct()
    return out


def render_repos(
    edges: DataFrame,
    n: int,
    repo: str = "synthorg/linkgraph",
    seed: int = 42,
    rng: str = "xxhash64",
) -> DataFrame:
    """Render an edge skeleton over files 0..n-1 into a corpus table
    (repo, path, commit, lang, content) whose derived import graph equals
    the skeleton exactly. Pure column expressions end-to-end."""
    spark = edges.sparkSession
    files = spark.range(n).select(F.col("id").alias("fid"))

    imports = (
        edges.filter("src != dst")
        .groupBy(F.col("src").alias("fid"))
        .agg(F.sort_array(F.collect_set("dst")).alias("deps"))
    )
    f = files.join(imports, "fid", "left").select(
        "fid", F.coalesce("deps", F.array().cast("array<long>")).alias("deps")
    )
    lang_hash = (_md5_int60(F.col("fid"), F.lit(seed)) if rng == "md5"
                 else F.xxhash64("fid", F.lit(seed)))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        (F.pmod(lang_hash, F.lit(len(LANGS))) + 1).cast("int"),
    )
    f = f.withColumn("lang", lang)
    path = F.concat(F.lit("src/mod_"), F.col("fid").cast("string"),
                    F.lit("."), F.col("lang"))

    def line_for(lang_key):
        pre, post = _IMPORT_TEMplates[lang_key]
        return F.transform(
            F.col("deps"),
            lambda dep: F.concat(F.lit(pre), F.lit("mod_"), dep.cast("string"), F.lit(post)),
        )

    lines = F.col("deps").cast("array<string>")  # placeholder, replaced below
    lines = (
        F.when(F.col("lang") == "py", line_for("py"))
        .when(F.col("lang") == "js", line_for("js"))
        .when(F.col("lang") == "java", line_for("java"))
        .when(F.col("lang") == "go", line_for("go"))
        .otherwise(line_for("c"))
    )
    header = F.concat(F.lit("// module mod_"), F.col("fid").cast("string"))
    body = F.concat(
        header, F.lit("\n"),
        F.concat_ws("\n", lines),
        F.lit("\n\ndef main():\n    return "), F.col("fid").cast("string"), F.lit("\n"),
    )
    commit = F.substring(
        F.sha2(F.concat(F.lit(repo), path, F.lit(str(seed))), 256), 1, 40
    )
    return f.select(
        F.lit(repo).alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.col("lang").alias("lang"),
        body.alias("content"),
    )


def rmat_repos(spark: SparkSession, scale: int, edge_factor: int = 8,
               seed: int = 42, rng: str = "xxhash64") -> DataFrame:
    """Convenience: RMAT skeleton rendered into a repos corpus."""
    e = rmat_edges(spark, scale, edge_factor, seed=seed, rng=rng)
    return render_repos(e, 1 << scale, seed=seed, rng=rng)


# -- driver-side fixture generators (test scale only) -------------------------


def erdos_renyi_edges(n: int, p: float, seed: int = 42, directed: bool = False):
    """G(n,p) via geometric skip sampling (cf. reference
    ErdosRenyiGenerator.cpp:25-53 — Batagelj–Brandes). Returns [(u, v)]."""
    rng = np.random.default_rng(seed)
    edges = []
    if directed:
        total = n * n
        idx = -1
        while True:
            skip = rng.geometric(p)
            idx += skip
            if idx >= total:
                break
            edges.append((idx // n, idx % n))
    else:
        total = n * (n - 1) // 2
        idx = -1
        while True:
            skip = rng.geometric(p)
            idx += skip
            if idx >= total:
                break
            # unrank upper-triangle index
            u = int((1 + np.sqrt(1 + 8 * idx)) // 2)
            v = idx - u * (u - 1) // 2
            edges.append((int(u), int(v)))
    return edges


def planted_partition_edges(n: int, k: int, p_in: float, p_out: float,
                            seed: int = 42):
    """Planted-community fixture (cf. reference
    ClusteredRandomGraphGenerator.cpp): k equal blocks, dense inside,
    sparse across. Returns ([(u, v)], ground_truth_labels)."""
    rng = np.random.default_rng(seed)
    labels = np.array([i * k // n for i in range(n)])
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            p = p_in if labels[u] == labels[v] else p_out
            if rng.random() < p:
                edges.append((u, v))
    return edges, labels


def watts_strogatz_edges(
    spark: SparkSession,
    n: int,
    k: int,
    p: float,
    seed: int = 42,
) -> DataFrame:
    """Watts–Strogatz small world (cf. reference
    WattsStrogatzGenerator.cpp:20-50): ring lattice where node i links to
    its k/2 clockwise neighbors, each edge rewired with probability p to
    a hash-uniform target. Fully distributed: spark.range(n·k/2) column
    expressions, counter-based randomness (no driver loop, no shuffle
    until dedup). Returns (src, dst) with src != dst, deduplicated."""
    assert k % 2 == 0 and k < n
    half = k // 2
    base = spark.range(n * half).select(
        (F.col("id") / half).cast("long").alias("i"),
        (F.pmod(F.col("id"), F.lit(half)) + 1).alias("j"),
    )
    lattice_dst = F.pmod(F.col("i") + F.col("j"), F.lit(n))
    rewire = _u01(F.col("i"), F.col("j"), F.lit(seed), F.lit(0)) < p
    rand_dst = F.pmod(F.xxhash64("i", "j", F.lit(seed), F.lit(1)),
                      F.lit(n))
    dst = F.when(rewire, rand_dst).otherwise(lattice_dst)
    return (
        base.select(F.col("i").alias("src"), dst.alias("dst"))
        .filter("src != dst")
        .select(F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"))
        .distinct()
    )


def barabasi_albert_edges(n: int, k: int, n0: int | None = None,
                          seed: int = 42):
    """Barabási–Albert preferential attachment (cf. reference
    BarabasiAlbertGenerator.cpp) via the repeated-endpoints list trick.
    Sequential by nature — driver-side fixture generator. Returns [(u,v)]."""
    rng = np.random.default_rng(seed)
    n0 = n0 or k
    edges = []
    targets = list(range(n0))  # attachment pool (endpoint repetition = PA)
    pool: list[int] = list(range(n0))
    for v in range(n0, n):
        chosen = set()
        while len(chosen) < min(k, len(set(pool))):
            chosen.add(pool[rng.integers(len(pool))])
        for u in chosen:
            edges.append((u, v))
            pool.append(u)
            pool.append(v)
    return edges


def chung_lu_edges(weights, seed: int = 42):
    """Chung–Lu expected-degree model (cf. reference ChungLuGenerator.cpp):
    p_ij = min(w_i·w_j / Σw, 1). Driver-side fixture generator."""
    rng = np.random.default_rng(seed)
    w = np.asarray(weights, dtype=float)
    s = w.sum()
    edges = []
    n = len(w)
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < min(w[u] * w[v] / s, 1.0):
                edges.append((u, v))
    return edges


def havel_hakimi_edges(degrees):
    """Havel–Hakimi realization of a degree sequence (cf. reference
    HavelHakimiGenerator.cpp). Raises if the sequence is not graphical.
    Driver-side fixture generator. Returns [(u,v)]."""
    seq = sorted(((int(d), i) for i, d in enumerate(degrees)), reverse=True)
    edges = []
    while seq:
        seq.sort(reverse=True)
        d, u = seq.pop(0)
        if d == 0:
            break
        if d > len(seq):
            raise ValueError("degree sequence is not graphical")
        for i in range(d):
            dv, v = seq[i]
            if dv == 0:
                raise ValueError("degree sequence is not graphical")
            seq[i] = (dv - 1, v)
            edges.append((min(u, v), max(u, v)))
    if any(d != 0 for d, _ in seq):
        raise ValueError("degree sequence is not graphical")
    return edges


def edge_switching(edges: DataFrame, rounds: int = 10,
                   seed: int = 42) -> DataFrame:
    """Degree-preserving randomization (cf. reference
    EdgeSwitchingMarkovChainGenerator.cpp / Graph::swapEdge): per round,
    edges are hash-paired into buckets of two; a pair (a,b),(c,d) swaps
    to (a,d),(c,b) unless that would create a self-loop or duplicate
    edge. Fully distributed — one window + one anti-join per round;
    deterministic under the seed. Input/output: undirected canonical
    (src < dst), deduplicated."""
    from pyspark.sql import Window

    from networkit_spark.plans.scratch import Scratch

    spark = edges.sparkSession
    # parquet lineage cut: each round references the edge set ~6
    # times (pairing, exists-check, rebuild) — without a cut the
    # logical plan grows 6^rounds (see plans/superstep.py)
    scratch = Scratch(spark, "swap")
    cut = scratch.cut

    e = cut(edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst")).distinct(),
            "r0")
    m = e.count()
    for r in range(rounds):
        # hash-bucket pairing (NO global sort): ~m/2 buckets, the first
        # two edges per bucket (by hash order) form a swap pair, any
        # further bucket members pass through unchanged this round
        key = F.xxhash64("src", "dst", F.lit(seed), F.lit(r))
        n_buckets = max(m // 2, 1)
        numbered = e.withColumn("_pair", F.pmod(key, F.lit(n_buckets)))
        w = Window.partitionBy("_pair").orderBy(key)
        pair = numbered.withColumn("_rn", F.row_number().over(w))
        passthrough = pair.filter("_rn > 2").select("src", "dst")
        a = pair.filter("_rn = 1").select(
            "_pair", F.col("src").alias("a"), F.col("dst").alias("b"))
        b = pair.filter("_rn = 2").select(
            "_pair", F.col("src").alias("c"), F.col("dst").alias("d"))
        joined = a.join(b, "_pair", "left")
        swapped = joined.select(
            "_pair", "a", "b", "c", "d",
            F.when(
                F.col("c").isNotNull()
                & (F.col("a") != F.col("d")) & (F.col("c") != F.col("b"))
                & (F.col("a") != F.col("c")) & (F.col("b") != F.col("d")),
                F.lit(1)).otherwise(F.lit(0)).alias("_ok"),
        )
        cand = swapped.filter("_ok = 1")
        ne1 = cand.select(F.least("a", "d").alias("src"),
                          F.greatest("a", "d").alias("dst"), "_pair")
        ne2 = cand.select(F.least("c", "b").alias("src"),
                          F.greatest("c", "b").alias("dst"), "_pair")
        new_edges = ne1.union(ne2)
        # reject swaps whose new edges already exist elsewhere or collide
        exists = new_edges.join(e, ["src", "dst"], "left_semi") \
            .select("_pair").distinct()
        dup_within = new_edges.groupBy("src", "dst") \
            .agg(F.count(F.lit(1)).alias("c"), F.collect_set("_pair").alias("ps")) \
            .filter("c > 1").select(F.explode("ps").alias("_pair")).distinct()
        bad = exists.union(dup_within).distinct()
        good = cand.join(bad, "_pair", "left_anti")
        keep_orig = swapped.join(good.select("_pair"), "_pair", "left_anti")
        e = (
            good.select(F.least("a", "d").alias("src"),
                        F.greatest("a", "d").alias("dst"))
            .union(good.select(F.least("c", "b").alias("src"),
                               F.greatest("c", "b").alias("dst")))
            .union(keep_orig.select(F.col("a").alias("src"),
                                    F.col("b").alias("dst")))
            .union(keep_orig.filter(F.col("c").isNotNull())
                   .select(F.col("c").alias("src"), F.col("d").alias("dst")))
            .union(passthrough)
        )
        e = cut(e, f"r{r + 1}")
    out = e.persist()
    out.count()
    scratch.cleanup()
    return out


def powerlaw_sequence(count, xmin: int, xmax: int, gamma: float,
                      rng) -> np.ndarray:
    """Discrete power-law sample P(x) ∝ x^(-gamma) on [xmin, xmax] via
    inverse-CDF over the finite support (cf. reference
    PowerlawDegreeSequence.cpp — same distribution, table-based draw)."""
    xs = np.arange(xmin, xmax + 1, dtype=float)
    w = xs ** (-gamma)
    w /= w.sum()
    return rng.choice(np.arange(xmin, xmax + 1), size=count, p=w)


def lfr_graph(n: int, kmin: int = 4, kmax: int = 20, gamma: float = 2.0,
              smin: int = 10, smax: int = 50, beta: float = 1.0,
              mu: float = 0.1, seed: int = 42):
    """LFR community-detection benchmark (cf. reference
    LFRGenerator.cpp / LFRGenerator.h and the original Lancichinetti–
    Fortunato–Radicchi construction): power-law degrees (exponent gamma),
    power-law community sizes (exponent beta), mixing parameter mu — each
    node spends ≈(1-mu) of its degree inside its community and ≈mu
    outside. Intra- and inter-community edges are realized by seeded
    stub matching (configuration model) with self-loop / duplicate /
    misplaced-stub rejection, so realized degrees can undershoot the
    drawn sequence slightly — fine for a benchmark fixture, documented
    here. Driver-side fixture generator (like planted_partition_edges);
    deterministic under ``seed``. Returns ([(u, v)], labels ndarray)."""
    rng = np.random.default_rng(seed)
    deg = powerlaw_sequence(n, kmin, kmax, gamma, rng)

    # community sizes: draw until they cover n, trim the overshoot
    sizes: list[int] = []
    while sum(sizes) < n:
        sizes.append(int(powerlaw_sequence(1, smin, smax, beta, rng)[0]))
    over = sum(sizes) - n
    sizes[-1] -= over
    if sizes[-1] < smin and len(sizes) > 1:  # fold a runt into its neighbor
        sizes[-2] += sizes[-1]
        sizes.pop()
    k = len(sizes)

    # internal degrees; assign nodes first-fit-decreasing so that every
    # node's internal degree fits inside its community (intd < size)
    intd = np.minimum(np.rint((1.0 - mu) * deg).astype(int), deg)
    order = np.argsort(-intd)
    labels = np.full(n, -1, dtype=int)
    cap = list(sizes)
    comms = list(range(k))
    for v in order:
        rng.shuffle(comms)
        placed = False
        for c in comms:
            if cap[c] > 0 and intd[v] < sizes[c]:
                labels[v] = c
                cap[c] -= 1
                placed = True
                break
        if not placed:  # degree too high for any remaining community
            intd[v] = 0
            c = max(range(k), key=lambda i: cap[i])
            labels[v] = c
            cap[c] -= 1

    edges: set[tuple[int, int]] = set()

    def _stub_match(stubs: np.ndarray, same_comm_ok: bool) -> None:
        rng.shuffle(stubs)
        if len(stubs) % 2:
            stubs = stubs[:-1]
        for u, v in stubs.reshape(-1, 2):
            u, v = int(u), int(v)
            if u == v:
                continue
            if not same_comm_ok and labels[u] == labels[v]:
                continue
            edges.add((min(u, v), max(u, v)))

    for c in range(k):
        members = np.flatnonzero(labels == c)
        _stub_match(np.repeat(members, intd[members]), same_comm_ok=True)
    extd = deg - intd
    _stub_match(np.repeat(np.arange(n), extd), same_comm_ok=False)
    return sorted(edges), labels


def regular_ring_lattice_edges(spark: SparkSession, n: int,
                               k: int) -> DataFrame:
    """Regular ring lattice (cf. reference RegularRingLatticeGenerator.cpp;
    == WattsStrogatz with p = 0): node i links its k/2 clockwise
    neighbors. Fully distributed column expressions over spark.range."""
    assert k % 2 == 0 and k < n
    half = k // 2
    base = spark.range(n * half).select(
        (F.col("id") / half).cast("long").alias("i"),
        (F.pmod(F.col("id"), F.lit(half)) + 1).alias("j"),
    )
    dst = F.pmod(F.col("i") + F.col("j"), F.lit(n))
    return (
        base.select(F.least(F.col("i"), dst).alias("src"),
                    F.greatest(F.col("i"), dst).alias("dst"))
        .filter("src != dst").distinct()
    )


def dorogovtsev_mendes_edges(n: int, seed: int = 42):
    """Dorogovtsev–Mendes growth (reference
    DorogovtsevMendesGenerator.cpp:21-40): start from a triangle; each
    new node attaches to BOTH endpoints of a uniformly random existing
    edge. Inherently sequential — driver-side fixture generator.
    Returns [(u, v)]."""
    assert n >= 3
    rng = np.random.default_rng(seed)
    edges = [(0, 1), (1, 2), (2, 0)]
    for w in range(3, n):
        u, v = edges[rng.integers(len(edges))]
        edges.append((w, u))
        edges.append((w, v))
    return [(min(u, v), max(u, v)) for u, v in edges]


def pub_web_points(spark: SparkSession, n: int, num_dense_areas: int = 10,
                   dense_fraction: float = 0.7, area_radius: float = 0.1,
                   seed: int = 42) -> DataFrame:
    """(id, x, y): PubWeb node placement on the unit torus (cf. reference
    PubWebGenerator.cpp): ``dense_fraction`` of the nodes cluster inside
    ``num_dense_areas`` hash-uniform disc centers, the rest are
    background-uniform. Counter-based hashes — deterministic, no driver
    loop. (The reference draws cluster sizes from a random partition;
    the fixed per-node area assignment here is the order-free
    equivalent, documented deviation.)"""
    import math as _m
    ids = spark.range(n).select(F.col("id"))
    area = F.pmod(F.xxhash64("id", F.lit(seed), F.lit(0)),
                  F.lit(num_dense_areas))
    is_dense = _u01(F.col("id"), F.lit(seed), F.lit(1)) < dense_fraction
    cx = _u01(area, F.lit(seed), F.lit(2))
    cy = _u01(area, F.lit(seed), F.lit(3))
    # polar disc sample around the center
    rr = F.sqrt(_u01(F.col("id"), F.lit(seed), F.lit(4))) * area_radius
    th = _u01(F.col("id"), F.lit(seed), F.lit(5)) * (2.0 * _m.pi)
    dx = rr * F.cos(th)
    dy = rr * F.sin(th)
    ux = _u01(F.col("id"), F.lit(seed), F.lit(6))
    uy = _u01(F.col("id"), F.lit(seed), F.lit(7))
    x = F.when(is_dense, F.pmod(cx + dx + 1.0, F.lit(1.0))).otherwise(ux)
    y = F.when(is_dense, F.pmod(cy + dy + 1.0, F.lit(1.0))).otherwise(uy)
    return ids.select("id", x.alias("x"), y.alias("y"))


def pub_web_edges_from_points(pts: DataFrame,
                              neighborhood_radius: float = 0.05,
                              max_neighbors: int = 16,
                              base_weight: float = 0.01) -> DataFrame:
    """(src, dst, weight): the PubWeb torus radius join over an
    arbitrary (id, x, y) points table — shared by the static generator
    and the dynamic movement model (reference recomputes the structure
    from coordinates the same way, DynamicPubWebGenerator.cpp:117-160)."""
    from pyspark.sql import Window
    m = max(1, int(1.0 / neighborhood_radius))  # cells per axis
    cell_x = F.floor(F.col("x") * m).cast("long")
    cell_y = F.floor(F.col("y") * m).cast("long")
    offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    probe = pts.select(
        "id", "x", "y",
        F.explode(F.array(*[
            F.struct(F.pmod(cell_x + i, F.lit(m)).alias("cx"),
                     F.pmod(cell_y + j, F.lit(m)).alias("cy"))
            for i, j in offs])).alias("c")
    ).select("id", "x", "y", "c.cx", "c.cy")
    home = pts.select(F.col("id").alias("id2"), F.col("x").alias("x2"),
                      F.col("y").alias("y2"), cell_x.alias("cx"),
                      cell_y.alias("cy"))
    dx = F.abs(F.col("x") - F.col("x2"))
    dy = F.abs(F.col("y") - F.col("y2"))
    tdx = F.least(dx, 1.0 - dx)
    tdy = F.least(dy, 1.0 - dy)
    d2 = tdx * tdx + tdy * tdy
    r2 = neighborhood_radius * neighborhood_radius
    cand = (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id") < F.col("id2"))
        .select(F.col("id").alias("src"), F.col("id2").alias("dst"),
                d2.alias("d2"))
        .distinct()
        .filter(F.col("d2") <= r2)
    )
    # mutual nearest-k degree cap (rank per endpoint, keep if both keep)
    both = cand.select("src", "dst", "d2").union(
        cand.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                    "d2"))
    w = Window.partitionBy("src").orderBy(F.col("d2").asc(),
                                         F.col("dst").asc())
    kept = (both.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= max_neighbors)
            .select("src", "dst", "d2"))
    mutual = kept.alias("a").join(
        kept.alias("b"),
        (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
        "left_semi").filter(F.col("a.src") < F.col("a.dst"))
    return mutual.select(
        F.col("src"), F.col("dst"),
        (base_weight / F.sqrt(F.col("d2"))).alias("weight"))


def pub_web_edges(spark: SparkSession, n: int, num_dense_areas: int = 10,
                  neighborhood_radius: float = 0.05,
                  max_neighbors: int = 16, seed: int = 42,
                  base_weight: float = 0.01) -> DataFrame:
    """(src, dst, weight): PubWeb random geometric graph on the unit
    torus (reference PubWebGenerator.cpp:57-76 isValidEdge): connect
    points within ``neighborhood_radius`` (torus metric), weight =
    base_weight / distance, each node capped at ``max_neighbors``.

    Distributed shape: grid-bucket the torus into radius-sized cells,
    explode each point into its 3x3 neighbor cells, and join on the cell
    key — candidate pairs are O(n · points-per-cell), never the n²
    cross join. The reference's degree cap is insertion-order greedy
    (nondeterministic under OpenMP); ours keeps each node's
    ``max_neighbors`` NEAREST candidates and requires mutual
    survival — order-free and deterministic, documented deviation."""
    pts = pub_web_points(spark, n, num_dense_areas, seed=seed)
    return pub_web_edges_from_points(pts, neighborhood_radius,
                                     max_neighbors, base_weight)


def _rhg_bands(n: int, R: float, series_ratio: float = 0.9) -> list:
    """Band boundaries forming a geometric difference series (reference
    HyperbolicGenerator.h:97-113 getBandRadii)."""
    import math
    out = [0.0]
    logn = math.log(n)
    a = R * (1 - series_ratio) / (1 - series_ratio ** logn)
    i = 1
    while i < logn:
        out.append(a * (1 - series_ratio ** i) / (1 - series_ratio))
        i += 1
    out.append(R)
    return out


def _rhg_R(n: int, avg_degree: float, gamma: float) -> float:
    """Cold-regime disc radius closed form (HyperbolicSpace.h:166-175)."""
    import math
    alpha = (gamma - 1.0) / 2.0
    plexp = 2 * alpha + 1
    xi_inv = (plexp - 2) / (plexp - 1)
    v = avg_degree * (math.pi / 2) * xi_inv * xi_inv
    return 2 * math.log(n / v)


def hyperbolic_points(spark: SparkSession, n: int, avg_degree: float = 6.0,
                      gamma: float = 3.0, R: float | None = None,
                      seed: int = 42) -> DataFrame:
    """(id, r, theta): points in the hyperbolic disc, radial density
    alpha·sinh(alpha·r)/(cosh(alpha·R)−1)."""
    import math
    alpha = (gamma - 1.0) / 2.0
    if R is None:
        R = _rhg_R(n, avg_degree, gamma)
    cosh_ar = math.cosh(alpha * R)
    u_r = _u01(F.col("id"), F.lit(seed), F.lit(0))
    u_t = _u01(F.col("id"), F.lit(seed), F.lit(1))
    r_expr = F.acosh(1.0 + u_r * (cosh_ar - 1.0)) / alpha
    return spark.range(n).select(
        "id", r_expr.alias("r"), (u_t * (2 * math.pi)).alias("theta"))


def hyperbolic_edges_from_points(pts: DataFrame, n: int,
                                 R: float) -> DataFrame:
    """(src, dst): the banded unit-disc join over an arbitrary
    (id, r, theta) points table — shared by the static generator and the
    dynamic movement model."""
    import math

    spark = pts.sparkSession
    bands = _rhg_bands(n, R)
    nb_bands = len(bands) - 1

    # per-band-pair window from the inner radii (upper bound)
    def window(r1: float, r2: float) -> float:
        if r1 <= 1e-12 or r2 <= 1e-12:
            return math.pi
        c = ((math.cosh(r1) * math.cosh(r2) - math.cosh(R))
             / (math.sinh(r1) * math.sinh(r2)))
        if c <= -1.0:
            return math.pi
        if c >= 1.0:
            return 0.0
        return math.acos(c)

    pair_rows = []
    for i in range(nb_bands):
        for j in range(i, nb_bands):
            w = window(bands[i], bands[j])
            if w <= 0.0:
                continue
            w = min(max(w, 1e-6), math.pi)
            nbuck = max(1, int(2 * math.pi / w))
            pair_rows.append((i, j, 2 * math.pi / nbuck, nbuck))
    pairs = F.broadcast(spark.createDataFrame(
        pair_rows, "bi int, bj int, w double, nbuck int"))

    band_expr = F.lit(nb_bands - 1)
    for b in range(nb_bands - 1, 0, -1):
        band_expr = F.when(F.col("r") < bands[b], b - 1).otherwise(band_expr)
    pts = pts.withColumn("band", band_expr.cast("int")).persist()

    probe = (
        pts.join(pairs, pts["band"] == pairs["bi"])
        .select("id", "r", "theta", "bi", "bj", "w", "nbuck",
                F.explode(F.sequence(
                    F.floor((F.col("theta") - F.col("w")) / F.col("w")),
                    F.floor((F.col("theta") + F.col("w")) / F.col("w"))))
                .alias("rawb"))
        .select("id", "r", "theta", "bi", "bj",
                F.pmod(F.col("rawb"), F.col("nbuck")).alias("bucket"))
    )
    build = (
        pts.join(pairs, pts["band"] == pairs["bj"])
        .select(F.col("id").alias("id2"), F.col("r").alias("r2"),
                F.col("theta").alias("theta2"), "bi", "bj",
                F.floor(F.col("theta") / F.col("w")).alias("bucket"))
    )
    cosh_r = math.cosh(R)
    cand = (
        probe.join(build, ["bi", "bj", "bucket"])
        .filter((F.col("bi") != F.col("bj")) | (F.col("id") < F.col("id2")))
        .filter(F.col("id") != F.col("id2"))
        .filter(F.cosh("r") * F.cosh("r2")
                - F.sinh("r") * F.sinh("r2")
                * F.cos(F.col("theta") - F.col("theta2")) <= cosh_r)
    )
    out = cand.select(F.least("id", "id2").alias("src"),
                      F.greatest("id", "id2").alias("dst")).distinct()
    return out


def hyperbolic_edges(spark: SparkSession, n: int, avg_degree: float = 6.0,
                     gamma: float = 3.0, R: float | None = None,
                     seed: int = 42) -> DataFrame:
    """(src, dst): threshold random hyperbolic graph (T = 0) — the
    reference's signature generator (HyperbolicGenerator.cpp:100-180,
    von Looz et al.): n points in the hyperbolic disc of radius R,
    radial density alpha·sinh(alpha·r)/(cosh(alpha·R)−1) with
    alpha = (gamma−1)/2, an edge wherever hyperbolic distance ≤ R.
    R defaults to the cold-regime closed form 2·ln(n/v)
    (HyperbolicSpace.h:166-175; the reference then refines numerically —
    documented deviation, degrees land within ~2x of the target).

    Distributed shape mirroring the reference's radial bands: the band
    list (O(log n), driver-side) + per-band-pair angular windows
    W(bi,bj) = max Δθ at which two points at the bands' INNER radii can
    still connect (the most permissive bound). Candidate pairs come
    from an equi-join on (band_i, band_j, angle bucket of width W) with
    the probe side exploded into ±1 buckets — per point O(bands)
    explode, never the n² cross join; the exact cosh distance filter
    runs on candidates only. Counter-based hashes: deterministic."""
    if R is None:
        R = _rhg_R(n, avg_degree, gamma)
    pts = hyperbolic_points(spark, n, avg_degree, gamma, R, seed)
    return hyperbolic_edges_from_points(pts, n, R)

def dynamic_dorogovtsev_mendes_events(n: int, seed: int = 42):
    """GraphEvent rows [(type, u, v, w, t)] replaying Dorogovtsev–Mendes
    growth (reference cpp/generators/DynamicDorogovtsevMendesGenerator.
    cpp): the initial triangle then, per new node, two EDGE_ADDITIONs to
    the endpoints of a uniformly random existing edge. Replaying through
    ``streaming.events.apply_events`` reconstructs exactly
    ``dorogovtsev_mendes_edges(n, seed)``."""
    edges = dorogovtsev_mendes_edges(n, seed)
    return [("EDGE_ADDITION", u, v, 1.0, t)
            for t, (u, v) in enumerate(edges)]


def dynamic_path_events(n: int):
    """GraphEvent rows growing a path 0-1-...-n-1 one edge per tick
    (reference cpp/generators/DynamicPathGenerator.cpp)."""
    return [("EDGE_ADDITION", i, i + 1, 1.0, i) for i in range(n - 1)]


def dynamic_barabasi_albert_events(n: int, k: int, n0: int | None = None,
                                   seed: int = 42):
    """GraphEvent rows [(type, u, v, w, t)] replaying Barabási–Albert
    preferential-attachment growth (reference cpp/generators/
    DynamicBarabasiAlbertGenerator.cpp — per time step one new node and
    its k attachment edges share a tick). Replaying through
    ``streaming.events.apply_events`` reconstructs exactly
    ``barabasi_albert_edges(n, k, n0, seed)``."""
    n0 = n0 or k
    events = []
    for u, v in barabasi_albert_edges(n, k, n0, seed):
        events.append(("EDGE_ADDITION", u, v, 1.0, v - n0))
    return events


def dynamic_forest_fire_events(n_steps: int, p: float,
                               directed: bool = False, r: float = 1.0,
                               seed: int = 42):
    """GraphEvent rows [(type, u, v, w, t)] replaying forest-fire growth
    (reference cpp/generators/DynamicForestFireGenerator.cpp:29-137):
    per step one new node picks a uniform ambassador, burns through the
    existing graph BFS-style — at each burned node a geometric number
    (success prob ``p``; ``p*r`` along in-edges when directed) of
    not-yet-visited neighbors catches fire — and the new node links to
    every burned node. Sequential by construction (each burn depends on
    the edges the previous steps created), so a driver-side fixture
    generator like the other growth models; the replayed stream is the
    distributed artifact."""
    import random as _random
    from collections import deque

    rng = _random.Random(seed)
    out_adj: dict[int, list[int]] = {0: []}
    in_adj: dict[int, list[int]] = {0: []}
    events = []
    t = 0  # the initial isolated node is step 0 (firstCall branch)

    def select(cands, prob):
        picked = []
        pool = list(cands)
        while pool and rng.random() <= prob:
            i = rng.randrange(len(pool))
            picked.append(pool[i])
            pool[i] = pool[-1]
            pool.pop()
        return picked

    for _ in range(n_steps - 1 if n_steps > 0 else 0):
        t += 1
        v = len(out_adj)
        a = rng.randrange(v)
        visited = {a}
        active = deque([a])
        burned = [a]
        while active:
            w = active.popleft()
            nbrs = [x for x in out_adj[w] if x not in visited]
            chosen = select(nbrs, p)
            if directed:
                back = [x for x in in_adj[w]
                        if x not in visited and x not in chosen]
                chosen += select(back, p * r)
            for x in chosen:
                visited.add(x)
                active.append(x)
                burned.append(x)
        out_adj[v] = []
        in_adj[v] = []
        for w in burned:
            out_adj[v].append(w)
            in_adj[w].append(v)
            if not directed:
                out_adj[w].append(v)
                in_adj[v].append(w)
            events.append(("EDGE_ADDITION", v, w, 1.0, t))
    return events


def dynamic_pub_web_events(spark: SparkSession, n: int, n_steps: int,
                           churn: float = 0.05, num_dense_areas: int = 10,
                           neighborhood_radius: float = 0.05,
                           max_neighbors: int = 16, seed: int = 42,
                           base_weight: float = 0.01):
    """DynamicPubWebGenerator (reference
    DynamicPubWebGenerator.cpp:23-170): per step, ~churn·|V| nodes leave
    (their incident edges first), the same number of fresh nodes arrive
    at cluster/noise positions, and the radius-graph structure is
    recomputed — edge differences become EDGE_REMOVAL / EDGE_ADDITION
    events, each step closed by a TIME_STEP row (t column here).

    Batch shape: per step ONE grid-bucketed torus radius join over the
    surviving+new points (pub_web_edges_from_points — candidates scale
    with local density, never n²) and one full-outer diff against the
    previous edge set. Node churn is hash-chosen — deterministic,
    order-free (the reference draws uniformly at random). Returns
    (events_df, final_points_df): events carry the usual
    (type, u, v, w, t) GraphEvent schema.

    The per-step driver loop is the event-GENERATOR shape (n_steps is
    small by construction); every per-step table is vertex/edge-sized
    and distributed."""
    pts = pub_web_points(spark, n, num_dense_areas, seed=seed)
    pts = pts.persist()
    edges = pub_web_edges_from_points(
        pts, neighborhood_radius, max_neighbors, base_weight).persist()
    edges.count()
    all_events = []
    next_id = n
    ev_schema = "type string, u long, v long, w double, t long"
    for t in range(1, n_steps + 1):
        n_cur = pts.count()
        k = int(n_cur * churn)
        if k > 0:
            doomed = (pts.orderBy(F.xxhash64("id", F.lit(seed), F.lit(t)))
                      .limit(k).select("id"))
            doomed_rows = [r["id"] for r in doomed.collect()]
        else:
            doomed_rows = []
        doomed_df = spark.createDataFrame(
            [(i,) for i in doomed_rows] or [(None,)], "id long").filter(
            F.col("id").isNotNull())
        survivors = pts.join(doomed_df, "id", "left_anti")
        # fresh nodes take never-reused ids; placement law = the static
        # generator's, salted by (step, slot)
        fresh = pub_web_points(spark, k, num_dense_areas,
                               seed=seed + 7919 * t).select(
            (F.col("id") + next_id).alias("id"), "x", "y")
        next_id += k
        new_pts = survivors.union(fresh).persist()
        new_edges = pub_web_edges_from_points(
            new_pts, neighborhood_radius, max_neighbors,
            base_weight).persist()
        new_edges.count()

        o = edges.select("src", "dst", F.col("weight").alias("w_old"))
        nn = new_edges.select("src", "dst", F.col("weight").alias("w_new"))
        diff = o.join(nn, ["src", "dst"], "full_outer").collect()
        # strict-replayer ordering (reference emits node arrivals before
        # the edges that touch them, DynamicPubWebGenerator.cpp — a
        # GraphUpdater-style replayer rejects an edge on a nonexistent
        # node): edge removals, node removals, node additions, edge
        # additions, TIME_STEP.
        evs = []
        for r in diff:
            if r["w_new"] is None:
                evs.append(("EDGE_REMOVAL", r["src"], r["dst"],
                            float(r["w_old"]), t))
        for i in doomed_rows:
            evs.append(("NODE_REMOVAL", i, None, None, t))
        for r in fresh.collect():
            evs.append(("NODE_ADDITION", r["id"], None, None, t))
        for r in diff:
            if r["w_old"] is None:
                evs.append(("EDGE_ADDITION", r["src"], r["dst"],
                            float(r["w_new"]), t))
        evs.append(("TIME_STEP", None, None, None, t))
        all_events.extend(evs)
        pts.unpersist(); edges.unpersist()
        pts, edges = new_pts, new_edges
    events_df = spark.createDataFrame(all_events, ev_schema)
    return events_df, pts


def dynamic_hyperbolic_events(spark: SparkSession, n: int, n_steps: int,
                              move_fraction: float = 0.1,
                              move_angle: float = 0.1,
                              avg_degree: float = 6.0, gamma: float = 3.0,
                              seed: int = 42):
    """DynamicHyperbolicGenerator (reference
    DynamicHyperbolicGenerator.cpp: per step a fraction of nodes MOVES
    — angular drift on the hyperbolic disc — and the unit-disc
    neighborhood graph is recomputed; edge diffs become events).

    Batch shape: the angle column of the moved subset is rotated by a
    deterministic hash jitter in [−move_angle, +move_angle]; the edge
    set is rebuilt with the SAME banded join as the static generator
    (rhg_edges_from_points) and diffed full-outer per step. Returns
    (events_df, final_points_df) with points (id, r, theta)."""
    R = _rhg_R(n, avg_degree, gamma)
    pts = hyperbolic_points(spark, n, avg_degree=avg_degree, gamma=gamma,
                            R=R, seed=seed).persist()
    edges = hyperbolic_edges_from_points(pts, n, R).persist()
    edges.count()
    all_events = []
    ev_schema = "type string, u long, v long, w double, t long"
    for t in range(1, n_steps + 1):
        moves = _u01(F.col("id"), F.lit(seed + 13 * t), F.lit(0)) \
            < move_fraction
        jitter = (_u01(F.col("id"), F.lit(seed + 13 * t), F.lit(1)) * 2.0
                  - 1.0) * move_angle
        import math as _m
        two_pi = 2.0 * _m.pi
        new_pts = pts.select(
            "id", "r",
            F.when(moves, F.pmod(F.col("theta") + jitter + two_pi,
                                 F.lit(two_pi)))
            .otherwise(F.col("theta")).alias("theta")).persist()
        new_edges = hyperbolic_edges_from_points(new_pts, n, R).persist()
        new_edges.count()
        o = edges.select("src", "dst", F.lit(1.0).alias("w_old"))
        nn = new_edges.select("src", "dst", F.lit(1.0).alias("w_new"))
        diff = o.join(nn, ["src", "dst"], "full_outer") \
            .filter(F.col("w_old").isNull() | F.col("w_new").isNull()) \
            .collect()
        for r in diff:
            if r["w_new"] is None:
                all_events.append(("EDGE_REMOVAL", r["src"], r["dst"],
                                   1.0, t))
            else:
                all_events.append(("EDGE_ADDITION", r["src"], r["dst"],
                                   1.0, t))
        all_events.append(("TIME_STEP", None, None, None, t))
        pts.unpersist(); edges.unpersist()
        pts, edges = new_pts, new_edges
    return spark.createDataFrame(all_events, ev_schema), pts
