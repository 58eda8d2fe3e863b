"""DuckDB oracle SQL for every entry in ``__spark_entry__.queries()``.

Design rules (mirrored in the Spark plans):
  - float outputs: ROUND(x, 6) emitted as DOUBLE on BOTH sides — after
    rounding to 6 decimals the float64 bit patterns agree across engines
    (DECIMAL types don't: Spark's toPandas yields Decimal objects while
    DuckDB's .df() converts to float64). The ``+ 0.0`` normalizes IEEE
    -0.0 to +0.0 (Spark's round goes through BigDecimal, which has no
    signed zero; DuckDB's does not);
  - hashes: md5-derived int60s (identical in both engines);
  - iterative kernels: fixed iteration counts — PageRank as a recursive
    CTE (single self-reference via a 0-coefficient self-loop per vertex so
    dangling/teleport-only vertices survive the aggregation), LPA unrolled
    textually, connected components as a reachability closure;
  - DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics.

Every query in ``__spark_entry__.queries()`` has an oracle. The
``corpus_*`` pipeline queries use the md5-keyed generator/vertex-id
variants (rng="md5"/hash_fn="md5") precisely so the whole
RMAT → rendered-corpus → import-graph pipeline is reproducible here;
the xxhash64 defaults remain the scale path and are pytest-verified
against NumPy oracles (tests/oracles.py).
"""

from __future__ import annotations

import hashlib

SUPP_OFFSET = 10_000_000

# ---------------------------------------------------------------------------
# shared CTE fragments
# ---------------------------------------------------------------------------

CS = f"""
cs_edges AS (
  SELECT o_custkey AS src, l_suppkey + {SUPP_OFFSET} AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
cs_verts AS (
  SELECT c_custkey AS id FROM customer
  UNION
  SELECT s_suppkey + {SUPP_OFFSET} AS id FROM supplier
)
"""

PP = """
pp_edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pp_verts AS (SELECT p_partkey AS id FROM part),
pp_sym AS (
  SELECT src, dst FROM pp_edges UNION ALL SELECT dst AS src, src AS dst FROM pp_edges
)
"""

# weighted pp(p_size=1): weight = raw co-occurrence join-row count
# (lockstep with sources/tpch_graph.graph_pps1_weighted)
PPS1W = """
p1v AS MATERIALIZED (SELECT p_partkey AS id FROM part WHERE p_size = 1),
p1e AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey IN (SELECT id FROM p1v)
    AND b.l_partkey IN (SELECT id FROM p1v)
  GROUP BY 1, 2
)
"""

TOKS = r"""
dt AS (
  SELECT DISTINCT doc_id AS id,
         UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok
  FROM documents WHERE TRIM(text) <> ''
)
"""

EMB = """
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
q AS (SELECT * FROM e WHERE vec_id < 10)
"""

_H = "CAST(('0x' || SUBSTRING(md5('{salt}:' || tok), 1, 15)) AS BIGINT)"


def _h(salt: int) -> str:
    return _H.format(salt=salt)


_COS = ("list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))")


def _lpa_unrolled(k: int) -> str:
    """lab0..lab{k} CTEs implementing synchronous LPA with the
    (heaviest weight, then smallest label) tie-break on the pp graph."""
    parts = ["lab0 AS (SELECT id, id AS label FROM pp_verts)"]
    for i in range(1, k + 1):
        parts.append(f"""
w{i} AS (
  SELECT s.dst AS id, l.label AS label, SUM(1.0) AS w
  FROM pp_sym s JOIN lab{i-1} l ON l.id = s.src
  GROUP BY 1, 2
),
b{i} AS (
  SELECT id, label FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY w DESC, label ASC) AS rn
    FROM w{i}
  ) WHERE rn = 1
),
lab{i} AS (
  SELECT l.id, COALESCE(b.label, l.label) AS label
  FROM lab{i-1} l LEFT JOIN b{i} b ON b.id = l.id
)""")
    return ",\n".join(parts)


def _kcore_unrolled(k: int) -> str:
    """core0..core{k} CTEs: the h-index fixpoint on the pp graph
    (mirrors operators/kcore.py). k=24 covers sf0.01 (empirically
    converged after 19 rounds) with margin; the Spark side runs to
    convergence, so equality holds iff both have converged."""
    parts = ["""
core0 AS MATERIALIZED (
  SELECT v.id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS core
  FROM pp_verts v
  LEFT JOIN (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1) d
    ON d.id = v.id
)"""]
    for i in range(1, k + 1):
        parts.append(f"""
h{i} AS MATERIALIZED (
  SELECT id, MAX(LEAST(rn, c)) AS h FROM (
    SELECT s.dst AS id, x.core AS c,
           ROW_NUMBER() OVER (PARTITION BY s.dst ORDER BY x.core DESC) AS rn
    FROM pp_sym s JOIN core{i-1} x ON x.id = s.src
  ) GROUP BY id
),
core{i} AS MATERIALIZED (
  SELECT c.id, LEAST(c.core, COALESCE(h.h, c.core)) AS core
  FROM core{i-1} c LEFT JOIN h{i} h ON h.id = c.id
)""")
    return ",\n".join(parts)


def _brandes_unrolled(L: int = 12) -> str:
    """CTE chain computing exact Brandes betweenness on the pp(p_size=1)
    subgraph via unrolled walk counts: σ(s,v) = #walks of length
    dist(s,v) (minimal-length walks ARE the shortest paths), then the
    dependency recursion δ unrolled per level descending. L=12 covers
    the sf0.01 diameter of 9 with margin. Produces CTEs: pv, psym,
    dist, sigma, delta0..delta{L-1}, bc."""
    walks = ["w0 AS MATERIALIZED (SELECT id AS s, id AS v, 1.0 AS c FROM pv)"]
    for l in range(1, L + 1):
        walks.append(f"""
w{l} AS MATERIALIZED (
  SELECT w.s, e.dst AS v, SUM(w.c) AS c
  FROM w{l-1} w JOIN psym e ON e.src = w.v GROUP BY 1, 2
)""")
    alls = "\n  UNION ALL\n  ".join(
        f"SELECT s, v, {l} AS l, c FROM w{l}" for l in range(L + 1))
    deltas = [f"""
delta{L} AS (SELECT s, v, 0.0 AS delta FROM sigma WHERE 1 = 0)"""]
    for l in range(L - 1, -1, -1):
        deltas.append(f"""
delta{l} AS MATERIALIZED (
  SELECT cur.s, cur.v,
         SUM(cur.sigma / nxt.sigma * (1.0 + COALESCE(dn.delta, 0.0))) AS delta
  FROM sigma cur
  JOIN psym e ON e.src = cur.v
  JOIN sigma nxt ON nxt.s = cur.s AND nxt.v = e.dst AND nxt.d = {l + 1}
  LEFT JOIN delta{l+1} dn ON dn.s = nxt.s AND dn.v = nxt.v
  WHERE cur.d = {l}
  GROUP BY 1, 2
)""")
    all_deltas = "\n  UNION ALL\n  ".join(
        f"SELECT s, v, delta FROM delta{l}" for l in range(L))
    return f"""
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
{",".join(walks)},
alls AS MATERIALIZED (
  {alls}
),
dist AS MATERIALIZED (SELECT s, v, MIN(l) AS d FROM alls GROUP BY 1, 2),
sigma AS MATERIALIZED (
  SELECT a.s, a.v, d.d, a.c AS sigma
  FROM alls a JOIN dist d ON d.s = a.s AND d.v = a.v AND d.d = a.l
),
{",".join(deltas)},
bc AS (
  SELECT v AS id, SUM(delta) AS score FROM (
  {all_deltas}
  ) WHERE s <> v GROUP BY v
)
"""


def _dist_unrolled(L: int = 12) -> str:
    """CTE chain computing just the BFS distance table of the
    pp(p_size=1) subgraph (the pv/psym/walks/dist prefix of
    _brandes_unrolled, without sigma/delta). Produces CTEs:
    pv, pe, psym, w0..wL, alls, dist."""
    walks = ["w0 AS MATERIALIZED (SELECT id AS s, id AS v, 1.0 AS c FROM pv)"]
    for l in range(1, L + 1):
        walks.append(f"""
w{l} AS MATERIALIZED (
  SELECT w.s, e.dst AS v, SUM(w.c) AS c
  FROM w{l-1} w JOIN psym e ON e.src = w.v GROUP BY 1, 2
)""")
    alls = "\n  UNION ALL\n  ".join(
        f"SELECT s, v, {l} AS l FROM w{l}" for l in range(L + 1))
    return f"""
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
{",".join(walks)},
alls AS MATERIALIZED (
  {alls}
),
dist AS MATERIALIZED (SELECT s, v, MIN(l) AS d FROM alls GROUP BY 1, 2)
"""


def _apr_unrolled(R: int = 36, alpha: float = 0.15,
                  eps: float = 1e-3) -> str:
    """CTE chain for the batched ACL push (scd.approximate_pagerank) on
    the pp(p_size=1) subgraph, seeded at the smallest non-isolated
    vertex. R=36 covers the measured 28 convergence rounds at sf0.01
    with margin — once converged (no vertex with r >= eps*vol) the
    extra rounds are exact fixpoints. Produces CTEs: pv, pe, psym,
    vol, apr0..apr{R}."""
    parts = [f"""
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
vol AS (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS vol FROM psym GROUP BY 1),
apr0 AS (
  SELECT v.id, v.vol, 0.0 AS p,
         CASE WHEN v.id = (SELECT MIN(src) FROM pe) THEN 1.0 ELSE 0.0 END AS r
  FROM vol v
)"""]
    for i in range(1, R + 1):
        parts.append(f"""
apr{i} AS MATERIALIZED (
  SELECT s.id, s.vol,
         CASE WHEN s.r >= {eps} * s.vol THEN s.p + {alpha} * s.r
              ELSE s.p END AS p,
         CASE WHEN s.r >= {eps} * s.vol THEN (1.0 - {alpha}) * s.r / 2.0
              ELSE s.r END + COALESCE(m.m, 0.0) AS r
  FROM apr{i-1} s LEFT JOIN (
    SELECT e.dst AS id, SUM((1.0 - {alpha}) * a.r / (2.0 * a.vol)) AS m
    FROM psym e JOIN apr{i-1} a
      ON a.id = e.src AND a.r >= {eps} * a.vol
    GROUP BY 1
  ) m ON m.id = s.id
)""")
    return ",".join(parts)


def _excl_cc_unrolled(L: int = 24) -> str:
    """CTE chain for the BCC oracle: min-label connected components of
    G - x for EVERY excluded vertex x of the pp(p_size=1) subgraph,
    keyed by x (one unrolled propagation over (x, node) pairs — n^2
    rows per level, trivial at this fixture size). L=24 because vertex
    removal can stretch shortest label-propagation paths well beyond
    the intact diameter of ~9. Produces CTEs: pv, pe, psym, xl0..xlL."""
    levels = ["""
xl0 AS MATERIALIZED (
  SELECT x.id AS x, v.id AS node, v.id AS label
  FROM pv x JOIN pv v ON v.id <> x.id
)"""]
    for l in range(1, L + 1):
        levels.append(f"""
xl{l} AS MATERIALIZED (
  SELECT cur.x, cur.node,
         LEAST(cur.label, COALESCE(MIN(nb.label), cur.label)) AS label
  FROM xl{l-1} cur
  LEFT JOIN psym e ON e.src = cur.node AND e.dst <> cur.x
  LEFT JOIN xl{l-1} nb ON nb.x = cur.x AND nb.node = e.dst
  GROUP BY cur.x, cur.node, cur.label
)""")
    return f"""
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
{",".join(levels)}
"""


def _lsh_w(plane: int, dim: int) -> float:
    """The deterministic ±1 hyperplane weight of similarity._plane_sign:
    md5(f"{plane}:{dim}") first-15-hex parity — computed HERE so the
    DuckDB oracle carries the weights as literal constants."""
    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:15]
    return 1.0 if int(h, 16) % 2 == 0 else -1.0


def _lsh_cells_expr(planes: int = 4, dims: int = 64) -> str:
    """SQL expression for similarity.assign_cells over v DOUBLE[]."""
    cases = []
    for p in range(planes):
        dot = " + ".join(f"v[{d + 1}] * {_lsh_w(p, d)}" for d in range(dims))
        cases.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(cases) + " AS INT)"


def _simhash_sql(bits: int = 16) -> str:
    h = _h(999)
    votes = ",\n    ".join(
        f"SUM(CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END"
                     for j in range(bits))
    return f"""
WITH dtm AS (
  SELECT doc_id AS id,
         UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS tok
  FROM documents WHERE TRIM(text) <> ''
),
votes AS (
  SELECT id,
    {votes}
  FROM dtm GROUP BY id
)
SELECT id, CAST({sig} AS BIGINT) AS simhash FROM votes
"""


TOKS2 = r"""
dt AS (
  SELECT DISTINCT id,
         UNNEST(list_transform(range(1, LEN(arr)),
                               i -> arr[i] || ' ' || arr[i + 1])) AS tok
  FROM (SELECT doc_id AS id, regexp_split_to_array(TRIM(text), '\s+') AS arr
        FROM documents WHERE TRIM(text) <> '')
)
"""


def _minhash_sql(k: int, toks: str = TOKS) -> str:
    mins = ",\n       ".join(f"MIN({_h(i)}) AS mh{i}" for i in range(k))
    return f"""
WITH {toks}
SELECT id,
       {mins}
FROM dt GROUP BY id
"""


def _bands_sql(k: int, bands: int, toks: str = TOKS) -> str:
    """mh + bands + cand CTE chain mirroring lsh_candidate_pairs(k, bands):
    band key = concat_ws('_', band_index, r consecutive minhashes)."""
    r = k // bands
    rows = []
    for b in range(bands):
        cols = " || '_' || ".join(
            f"CAST(mh{b * r + j} AS VARCHAR)" for j in range(r))
        rows.append(f"  SELECT id, '{b}_' || {cols} AS band FROM mh")
    return f"""
mh AS ({_minhash_sql(k, toks)}),
bands AS (
{chr(10).join('  UNION ALL' + chr(10) + row if i else row for i, row in enumerate(rows))}
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.id < y.id
)
"""


_BANDS = _bands_sql(16, 4, TOKS2)

def _corpus_cte(scale: int = 8, edge_factor: int = 8, seed: int = 42,
                a: float = 0.57, b: float = 0.19, c: float = 0.19,
                repo: str = "synthorg/linkgraph") -> str:
    """Reproduces the md5-keyed corpus pipeline (generators.rmat_edges →
    render_repos → repos.graph_from_repos, all with rng/hash_fn="md5")
    down to the hashed-id edge list: CTEs verts(id) + g_edges(src, dst).

    The uniform draw is md5int60(i:j:seed)/2^60 — an exact power-of-two
    scale, so the doubles (and the quadrant comparisons against the
    repr()-exact thresholds) are bit-identical to the Spark side."""
    n = 1 << scale
    m = n * edge_factor
    inv = 1.0 / (1 << 60)
    us = ",\n         ".join(
        f"CAST(('0x' || SUBSTRING(md5(CAST(i AS VARCHAR) || ':{j}:{seed}'), 1, 15))"
        f" AS BIGINT) * {inv!r} AS u{j}"
        for j in range(scale))
    src_sum = " + ".join(
        f"(CASE WHEN u{j} >= {a + b!r} THEN {1 << j} ELSE 0 END)"
        for j in range(scale))
    dst_sum = " + ".join(
        f"(CASE WHEN (u{j} >= {a!r} AND u{j} < {a + b!r}) OR u{j} >= {a + b + c!r}"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(scale))
    return f"""
us AS (
  SELECT i, {us}
  FROM RANGE({m}) t(i)
),
sk AS (SELECT ({src_sum}) AS sfid, ({dst_sum}) AS dfid FROM us),
skel AS (SELECT DISTINCT sfid, dfid FROM sk WHERE sfid <> dfid),
langs AS (
  SELECT fid,
         (['py','js','java','go','c'])[
           CAST(CAST(('0x' || SUBSTRING(md5(CAST(fid AS VARCHAR) || ':{seed}'),
                                        1, 15)) AS BIGINT) % 5 AS INT) + 1] AS lang
  FROM RANGE({n}) f(fid)
),
vids AS (
  SELECT fid,
         CAST(('0x' || SUBSTRING(md5('{repo}:src/mod_' || CAST(fid AS VARCHAR)
                                     || '.' || lang), 1, 15)) AS BIGINT) AS vid
  FROM langs
),
verts AS (SELECT vid AS id FROM vids),
g_edges AS (
  SELECT a.vid AS src, b.vid AS dst
  FROM skel e JOIN vids a ON a.fid = e.sfid JOIN vids b ON b.fid = e.dfid
)
"""


_QUALITY_EXPRS = r"""
  LENGTH(text) AS n_chars,
  CASE WHEN TRIM(text) = '' THEN 0
       ELSE LEN(regexp_split_to_array(TRIM(text), '\s+')) END AS n_tokens,
  CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
       ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks,
  LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
"""


def build_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # -- graph ----------------------------------------------------------
    o["edges_cs"] = f"""
WITH {CS}
SELECT src, dst, CAST(weight AS DOUBLE) AS weight FROM cs_edges
"""

    o["degrees_cs"] = f"""
WITH {CS}
SELECT v.id, COALESCE(d.c, 0) AS degree
FROM cs_verts v
LEFT JOIN (SELECT src AS id, COUNT(*) AS c FROM cs_edges GROUP BY 1) d
  ON d.id = v.id
"""

    o["wdegrees_cs"] = f"""
WITH {CS}
SELECT v.id, CAST(COALESCE(d.w, 0.0) AS DOUBLE) AS wdeg
FROM cs_verts v
LEFT JOIN (SELECT src AS id, SUM(weight) AS w FROM cs_edges GROUP BY 1) d
  ON d.id = v.id
"""

    o["pagerank_cs_k10"] = f"""
WITH RECURSIVE {CS},
nn AS (SELECT COUNT(*) AS c FROM cs_verts),
wdeg AS (SELECT src, SUM(weight) AS wd FROM cs_edges GROUP BY src),
coef AS (
  SELECT e.src, e.dst, e.weight / w.wd AS coef
  FROM cs_edges e JOIN wdeg w ON w.src = e.src
  UNION ALL
  SELECT id, id, 0.0 FROM cs_verts
),
pr(it, id, rank) AS (
  SELECT 0, id, 1.0 / (SELECT c FROM nn) FROM cs_verts
  UNION ALL
  SELECT p.it + 1, c.dst,
         0.15 / (SELECT c FROM nn) + 0.85 * SUM(p.rank * c.coef)
  FROM pr p JOIN coef c ON c.src = p.id
  WHERE p.it < 10
  GROUP BY p.it, c.dst
)
SELECT id, (ROUND(rank / SUM(rank) OVER (), 6) + 0.0) AS rank
FROM pr WHERE it = 10
"""

    cc_closure = f"""
WITH RECURSIVE {PP},
reach(id, r) AS (
  SELECT id, id FROM pp_verts
  UNION
  SELECT s.dst, reach.r FROM reach JOIN pp_sym s ON s.src = reach.id
),
cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
"""
    o["cc_pp"] = cc_closure + "SELECT id, component FROM cc"
    o["cc_star_pp"] = o["cc_pp"]
    o["cc_sizes_pp"] = cc_closure + (
        "SELECT component, COUNT(*) AS size FROM cc GROUP BY 1")

    tri = f"""
WITH {PP},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM pp_edges e1
  JOIN pp_edges e2 ON e2.src = e1.dst
  JOIN pp_edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
"""
    o["triangles_pp"] = tri + """
, corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v.id, COALESCE(t.c, 0) AS triangles
FROM pp_verts v
LEFT JOIN (SELECT id, COUNT(*) AS c FROM corners GROUP BY 1) t ON t.id = v.id
"""
    o["global_triangles_pp"] = tri + "SELECT COUNT(*) AS triangles FROM tri"

    o["lcc_pp"] = tri + """
, corners AS (
  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tcnt AS (SELECT id, COUNT(*) AS c FROM corners GROUP BY 1),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1)
SELECT v.id,
       (ROUND(CASE WHEN COALESCE(d.deg, 0) >= 2
                  THEN 2.0 * COALESCE(t.c, 0) / (d.deg * (d.deg - 1.0))
                  ELSE 0.0 END, 6) + 0.0) AS lcc
FROM pp_verts v
LEFT JOIN tcnt t ON t.id = v.id
LEFT JOIN deg d ON d.id = v.id
"""

    o["lpa_pp_k4"] = f"""
WITH {PP},
{_lpa_unrolled(4)}
SELECT id, label FROM lab4
"""

    o["modularity_pp_lpa4"] = f"""
WITH {PP},
{_lpa_unrolled(4)},
j AS (
  SELECT e.src, e.dst, 1.0 AS weight, ls.label AS l_src, ld.label AS l_dst
  FROM pp_edges e
  JOIN lab4 ls ON ls.id = e.src
  JOIN lab4 ld ON ld.id = e.dst
),
tot AS (
  SELECT SUM(weight) AS total,
         SUM(CASE WHEN l_src = l_dst THEN weight ELSE 0.0 END) AS intra
  FROM j
),
vols AS (
  SELECT c, SUM(weight) AS vol FROM (
    SELECT l_src AS c, weight FROM j UNION ALL SELECT l_dst AS c, weight FROM j
  ) GROUP BY 1
)
SELECT (ROUND(
  t.intra / t.total - (SELECT SUM(POWER(vol / t.total, 2) / 4.0) FROM vols),
  6) + 0.0) AS modularity
FROM tot t
"""

    o["supplier_common_customers"] = f"""
WITH {CS}
SELECT a.dst AS s1, b.dst AS s2, COUNT(*) AS common
FROM cs_edges a JOIN cs_edges b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

    o["supplier_jaccard"] = f"""
WITH {CS},
deg AS (SELECT dst, COUNT(*) AS deg FROM cs_edges GROUP BY 1),
common AS (
  SELECT a.dst AS s1, b.dst AS s2, COUNT(*) AS common
  FROM cs_edges a JOIN cs_edges b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT c.s1, c.s2,
       (ROUND(c.common / (d1.deg + d2.deg - c.common), 6)
            + 0.0) AS jaccard
FROM common c
JOIN deg d1 ON d1.dst = c.s1
JOIN deg d2 ON d2.dst = c.s2
"""

    o["supplier_adamic_adar"] = f"""
WITH {CS},
cdeg AS (SELECT src, COUNT(*) AS cdeg FROM cs_edges GROUP BY 1),
wedges AS (
  SELECT a.src AS c, a.dst AS s1, b.dst AS s2
  FROM cs_edges a JOIN cs_edges b ON a.src = b.src AND a.dst < b.dst
)
SELECT s1, s2, (ROUND(SUM(1.0 / LN(d.cdeg)), 6) + 0.0) AS aa
FROM wedges w JOIN cdeg d ON d.src = w.c
WHERE d.cdeg >= 2
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

    o["supplier_resource_alloc"] = f"""
WITH {CS},
cdeg AS (SELECT src, COUNT(*) AS cdeg FROM cs_edges GROUP BY 1),
wedges AS (
  SELECT a.src AS c, a.dst AS s1, b.dst AS s2
  FROM cs_edges a JOIN cs_edges b ON a.src = b.src AND a.dst < b.dst
)
SELECT s1, s2, (ROUND(SUM(1.0 / d.cdeg), 6) + 0.0) AS ra
FROM wedges w JOIN cdeg d ON d.src = w.c
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

    o["coarsen_cs_by_nation"] = f"""
WITH {CS}
SELECT CAST(c.c_nationkey AS BIGINT) AS nation, e.dst AS supplier,
       CAST(SUM(e.weight) AS DOUBLE) AS weight
FROM cs_edges e JOIN customer c ON c.c_custkey = e.src
GROUP BY 1, 2
"""

    o["assortativity_pp"] = f"""
WITH {PP},
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1)
SELECT (ROUND(corr(d1.deg, d2.deg), 6) + 0.0) AS assortativity
FROM pp_sym s
JOIN deg d1 ON d1.id = s.src
JOIN deg d2 ON d2.id = s.dst
"""

    o["bfs_cs_d6"] = f"""
WITH RECURSIVE {CS},
csym AS (
  SELECT src, dst FROM cs_edges UNION SELECT dst AS src, src AS dst FROM cs_edges
),
reach(id, d) AS (
  SELECT (SELECT MIN(c_custkey) FROM customer), 0
  UNION
  SELECT s.dst, r.d + 1 FROM reach r JOIN csym s ON s.src = r.id WHERE r.d < 6
),
dmin AS (SELECT id, CAST(MIN(d) AS BIGINT) AS dist FROM reach GROUP BY id)
SELECT v.id, d.dist FROM cs_verts v LEFT JOIN dmin d ON d.id = v.id
"""

    o["nf_pp_h3"] = f"""
WITH RECURSIVE {PP},
reach(id, other, d) AS (
  SELECT id, id, 0 FROM pp_verts
  UNION
  SELECT r.id, s.dst, r.d + 1
  FROM reach r JOIN pp_sym s ON s.src = r.other WHERE r.d < 3
),
dmin AS (SELECT id, other, MIN(d) AS d FROM reach GROUP BY 1, 2),
hs AS (SELECT UNNEST(RANGE(1, 4)) AS h)
SELECT hs.h,
       CAST(COALESCE(SUM(CASE WHEN dm.d > 0 AND dm.d <= hs.h THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS pairs
FROM hs LEFT JOIN dmin dm ON TRUE
GROUP BY hs.h
"""

    o["sparsify_jaccard_pp"] = tri + """
, epair AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri
  UNION ALL SELECT b, c FROM tri
),
etri AS (SELECT x, y, COUNT(*) AS t FROM epair GROUP BY 1, 2),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1),
scored AS (
  SELECT e.src AS lo, e.dst AS hi,
         COALESCE(t.t, 0) / (d1.deg + d2.deg - COALESCE(t.t, 0)) AS score
  FROM pp_edges e
  LEFT JOIN etri t ON t.x = e.src AND t.y = e.dst
  JOIN deg d1 ON d1.id = e.src
  JOIN deg d2 ON d2.id = e.dst
)
SELECT lo, hi, (ROUND(score, 6) + 0.0) AS score
FROM scored WHERE score >= 0.08
"""

    o["eigen_pp_k8"] = f"""
WITH {PP},
x0 AS (SELECT id, 1.0 / (SELECT COUNT(*) FROM pp_verts) AS x FROM pp_verts),

g1 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x0 x ON x.id = s.src GROUP BY 1
),
r1 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g1 g ON g.id = v.id
),
n1 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r1),
x1 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n1) AS x FROM r1),

g2 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x1 x ON x.id = s.src GROUP BY 1
),
r2 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g2 g ON g.id = v.id
),
n2 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r2),
x2 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n2) AS x FROM r2),

g3 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x2 x ON x.id = s.src GROUP BY 1
),
r3 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g3 g ON g.id = v.id
),
n3 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r3),
x3 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n3) AS x FROM r3),

g4 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x3 x ON x.id = s.src GROUP BY 1
),
r4 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g4 g ON g.id = v.id
),
n4 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r4),
x4 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n4) AS x FROM r4),

g5 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x4 x ON x.id = s.src GROUP BY 1
),
r5 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g5 g ON g.id = v.id
),
n5 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r5),
x5 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n5) AS x FROM r5),

g6 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x5 x ON x.id = s.src GROUP BY 1
),
r6 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g6 g ON g.id = v.id
),
n6 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r6),
x6 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n6) AS x FROM r6),

g7 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x6 x ON x.id = s.src GROUP BY 1
),
r7 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g7 g ON g.id = v.id
),
n7 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r7),
x7 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n7) AS x FROM r7),

g8 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x7 x ON x.id = s.src GROUP BY 1
),
r8 AS MATERIALIZED (
  SELECT v.id, COALESCE(g.gath, 0.0) AS raw
  FROM pp_verts v LEFT JOIN g8 g ON g.id = v.id
),
n8 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r8),
x8 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n8) AS x FROM r8)
SELECT id, (ROUND(x, 6) + 0.0) AS score FROM x8
"""

    o["katz_pp_k8"] = f"""
WITH {PP},
x0 AS (SELECT id, 1.0 / (SELECT COUNT(*) FROM pp_verts) AS x FROM pp_verts),

g1 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x0 x ON x.id = s.src GROUP BY 1
),
r1 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g1 g ON g.id = v.id
),
n1 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r1),
x1 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n1) AS x FROM r1),

g2 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x1 x ON x.id = s.src GROUP BY 1
),
r2 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g2 g ON g.id = v.id
),
n2 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r2),
x2 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n2) AS x FROM r2),

g3 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x2 x ON x.id = s.src GROUP BY 1
),
r3 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g3 g ON g.id = v.id
),
n3 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r3),
x3 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n3) AS x FROM r3),

g4 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x3 x ON x.id = s.src GROUP BY 1
),
r4 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g4 g ON g.id = v.id
),
n4 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r4),
x4 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n4) AS x FROM r4),

g5 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x4 x ON x.id = s.src GROUP BY 1
),
r5 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g5 g ON g.id = v.id
),
n5 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r5),
x5 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n5) AS x FROM r5),

g6 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x5 x ON x.id = s.src GROUP BY 1
),
r6 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g6 g ON g.id = v.id
),
n6 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r6),
x6 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n6) AS x FROM r6),

g7 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x6 x ON x.id = s.src GROUP BY 1
),
r7 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g7 g ON g.id = v.id
),
n7 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r7),
x7 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n7) AS x FROM r7),

g8 AS MATERIALIZED (
  SELECT s.dst AS id, SUM(1.0 * x.x) AS gath
  FROM pp_sym s JOIN x7 x ON x.id = s.src GROUP BY 1
),
r8 AS MATERIALIZED (
  SELECT v.id, 0.01 * COALESCE(g.gath, 0.0) + 0.1 AS raw
  FROM pp_verts v LEFT JOIN g8 g ON g.id = v.id
),
n8 AS (SELECT SQRT(SUM(raw * raw)) AS t FROM r8),
x8 AS MATERIALIZED (SELECT id, raw / (SELECT t FROM n8) AS x FROM r8)
SELECT id, (ROUND(x, 6) + 0.0) AS score FROM x8
"""

    o["sssp_cs"] = f"""
WITH {CS},
cs_sym AS (
  SELECT src, dst, weight FROM cs_edges
  UNION ALL SELECT dst AS src, src AS dst, weight FROM cs_edges
),
srcv AS (SELECT MIN(c_custkey) AS s FROM customer),
d0 AS (SELECT id, CASE WHEN id = (SELECT s FROM srcv) THEN 0.0 END AS dist
       FROM cs_verts),
rx1 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d0 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d1 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d0 c LEFT JOIN rx1 r ON r.id = c.id
),
rx2 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d1 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d2 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d1 c LEFT JOIN rx2 r ON r.id = c.id
),
rx3 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d2 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d3 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d2 c LEFT JOIN rx3 r ON r.id = c.id
),
rx4 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d3 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d4 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d3 c LEFT JOIN rx4 r ON r.id = c.id
),
rx5 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d4 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d5 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d4 c LEFT JOIN rx5 r ON r.id = c.id
),
rx6 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d5 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d6 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d5 c LEFT JOIN rx6 r ON r.id = c.id
),
rx7 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d6 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d7 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d6 c LEFT JOIN rx7 r ON r.id = c.id
),
rx8 AS MATERIALIZED (
  SELECT e.dst AS id, MIN(d.dist + e.weight) AS cand
  FROM cs_sym e JOIN d7 d ON d.id = e.src
  WHERE d.dist IS NOT NULL GROUP BY 1
),
d8 AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN c.dist IS NULL AND r.cand IS NULL THEN NULL
              WHEN c.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN c.dist
              ELSE LEAST(c.dist, r.cand) END AS dist
  FROM d7 c LEFT JOIN rx8 r ON r.id = c.id
)
SELECT id, (ROUND(dist, 6) + 0.0) AS dist FROM d8
"""

    o["kcore_pp"] = f"""
WITH {PP},
{_kcore_unrolled(24)}
SELECT id, core FROM core24
"""

    o["sparsify_scan_pp"] = tri + """
, epair AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri
  UNION ALL SELECT b, c FROM tri
),
etri AS (SELECT x, y, COUNT(*) AS t FROM epair GROUP BY 1, 2),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1)
SELECT e.src AS lo, e.dst AS hi,
       (ROUND((COALESCE(t.t, 0) + 1)
              / SQRT((d1.deg + 1) * (d2.deg + 1)), 6) + 0.0) AS score
FROM pp_edges e
LEFT JOIN etri t ON t.x = e.src AND t.y = e.dst
JOIN deg d1 ON d1.id = e.src
JOIN deg d2 ON d2.id = e.dst
"""

    o["sparsify_ccts_pp"] = tri + """
, epair AS (
  SELECT a AS x, b AS y FROM tri
  UNION ALL SELECT a, c FROM tri
  UNION ALL SELECT b, c FROM tri
),
etri AS (SELECT x, y, COUNT(*) AS t FROM epair GROUP BY 1, 2),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM pp_verts)
SELECT e.src AS lo, e.dst AS hi,
       (FLOOR(CASE
          WHEN COALESCE(t.t, 0) > 0 THEN
            COALESCE(t.t, 0) * (nn.n - 2.0)
            / ((d1.deg - 1.0) * (d2.deg - 1.0))
          WHEN d1.deg = 1 OR d2.deg = 1 THEN 1.0
          ELSE 0.0 END * 1e6 + 0.5) / 1e6 + 0.0) AS score
FROM pp_edges e
CROSS JOIN nn
LEFT JOIN etri t ON t.x = e.src AND t.y = e.dst
JOIN deg d1 ON d1.id = e.src
JOIN deg d2 ON d2.id = e.dst
"""

    o["sparsify_local_degree_pp"] = f"""
WITH {PP},
deg AS (SELECT src AS id, COUNT(*) AS deg FROM pp_sym GROUP BY 1),
ranked AS (
  SELECT s.src, s.dst, de.deg AS edeg,
         RANK() OVER (PARTITION BY s.src ORDER BY dn.deg DESC) AS rnk
  FROM pp_sym s
  JOIN deg dn ON dn.id = s.dst
  JOIN deg de ON de.id = s.src
),
scored AS (
  SELECT src, dst,
         CASE WHEN edeg <= 1 THEN 1.0
              ELSE 1.0 - LN(rnk) / LN(edeg) END AS e
  FROM ranked
)
SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
       (ROUND(MAX(e), 6) + 0.0) AS score
FROM scored GROUP BY 1, 2
"""

    o["algdist_pp"] = f"""
WITH {PP},
ld0 AS MATERIALIZED (
  SELECT id,
         CAST(('0x' || SUBSTRING(md5(CAST(id AS VARCHAR) || ':0:42'), 1, 15))
              AS BIGINT) * 8.673617379884035e-19 AS x0,
         CAST(('0x' || SUBSTRING(md5(CAST(id AS VARCHAR) || ':1:42'), 1, 15))
              AS BIGINT) * 8.673617379884035e-19 AS x1
  FROM pp_verts
),
m1 AS MATERIALIZED (
  SELECT s.dst AS id,
         SUM(1.0 * l.x0) / SUM(1.0) AS m0,
         SUM(1.0 * l.x1) / SUM(1.0) AS m1
  FROM pp_sym s JOIN ld0 l ON l.id = s.src GROUP BY 1
),
ld1 AS MATERIALIZED (
  SELECT l.id,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x0 + 0.5 * m.m0 ELSE l.x0 END AS x0,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x1 + 0.5 * m.m1 ELSE l.x1 END AS x1
  FROM ld0 l LEFT JOIN m1 m ON m.id = l.id
),
m2 AS MATERIALIZED (
  SELECT s.dst AS id,
         SUM(1.0 * l.x0) / SUM(1.0) AS m0,
         SUM(1.0 * l.x1) / SUM(1.0) AS m1
  FROM pp_sym s JOIN ld1 l ON l.id = s.src GROUP BY 1
),
ld2 AS MATERIALIZED (
  SELECT l.id,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x0 + 0.5 * m.m0 ELSE l.x0 END AS x0,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x1 + 0.5 * m.m1 ELSE l.x1 END AS x1
  FROM ld1 l LEFT JOIN m2 m ON m.id = l.id
),
m3 AS MATERIALIZED (
  SELECT s.dst AS id,
         SUM(1.0 * l.x0) / SUM(1.0) AS m0,
         SUM(1.0 * l.x1) / SUM(1.0) AS m1
  FROM pp_sym s JOIN ld2 l ON l.id = s.src GROUP BY 1
),
ld3 AS MATERIALIZED (
  SELECT l.id,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x0 + 0.5 * m.m0 ELSE l.x0 END AS x0,
         CASE WHEN m.id IS NOT NULL
              THEN (1.0 - 0.5) * l.x1 + 0.5 * m.m1 ELSE l.x1 END AS x1
  FROM ld2 l LEFT JOIN m3 m ON m.id = l.id
)
SELECT e.src AS lo, e.dst AS hi,
       (ROUND(POWER(POWER(ABS(a.x0 - b.x0), 2.0)
                    + POWER(ABS(a.x1 - b.x1), 2.0), 0.5), 6) + 0.0) AS score
FROM pp_edges e
JOIN ld3 a ON a.id = e.src
JOIN ld3 b ON b.id = e.dst
"""

    o["edge_ids_pp"] = f"""
WITH {PP}
SELECT src, dst,
       CAST(ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS BIGINT) AS edge_id
FROM pp_edges
"""

    o["compact_lpa_pp"] = f"""
WITH {PP},
{_lpa_unrolled(4)}
SELECT id, CAST(DENSE_RANK() OVER (ORDER BY label) - 1 AS BIGINT) AS label
FROM lab4
"""

    o["spanning_forest_count_pp"] = cc_closure + """
SELECT CAST((SELECT COUNT(*) FROM pp_verts)
            - (SELECT COUNT(DISTINCT component) FROM cc) AS BIGINT)
       AS n_tree_edges
"""

    o["missing_links_count_pp"] = f"""
WITH {PP},
cand AS (
  SELECT DISTINCT a.src AS u, b.src AS v
  FROM pp_sym a JOIN pp_sym b ON a.dst = b.dst AND a.src < b.src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM cand c
LEFT JOIN pp_edges e ON e.src = c.u AND e.dst = c.v
WHERE e.src IS NULL
"""

    # -- text / dedup ----------------------------------------------------
    o["docs_token_stats"] = f"""
WITH base AS (
  SELECT doc_id, {_QUALITY_EXPRS}
  FROM documents
),
x AS (
  SELECT doc_id, n_chars, n_tokens, n_punct,
    LEN(LIST_FILTER(toks,
        t -> t IN ('the','a','and','of','to','in','is'))) AS n_stop,
    CASE WHEN n_tokens > 0
         THEN (n_chars - (n_tokens - 1)) / n_tokens ELSE 0.0 END AS avg_token_len,
    CASE WHEN n_tokens > 0 THEN LEN(LIST_FILTER(toks,
        t -> t IN ('the','a','and','of','to','in','is'))) / n_tokens
         ELSE 0.0 END AS stop_ratio,
    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
  (ROUND(avg_token_len, 6) + 0.0) AS avg_token_len,
  (ROUND(stop_ratio, 6) + 0.0) AS stop_ratio,
  (ROUND(punct_ratio, 6) + 0.0) AS punct_ratio,
  (ROUND(
    LEAST(n_tokens / 100.0, 1.0) * 0.4
    + CASE WHEN avg_token_len >= 3 AND avg_token_len <= 10 THEN 0.3 ELSE 0.0 END
    + LEAST(stop_ratio * 5.0, 1.0) * 0.2
    + CASE WHEN punct_ratio < 0.1 THEN 0.1 ELSE 0.0 END,
  6) + 0.0) AS quality
FROM x
"""

    lang_lists = {
        "de": "('der','die','das','und','ist','nicht')",
        "en": "('the','and','of','to','is','in')",
        "es": "('el','los','las','y','es','que')",
        "fr": "('le','les','et','est','dans','que')",
    }
    scores = ",\n  ".join(
        f"LEN(LIST_FILTER(toks, t -> t IN {lst})) AS s_{lang}"
        for lang, lst in lang_lists.items()
    )
    o["docs_language_id"] = rf"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks
  FROM documents
),
sc AS (
  SELECT doc_id,
  {scores}
  FROM base
)
SELECT doc_id,
  CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM sc
"""

    o["docs_fingerprint"] = r"""
SELECT doc_id,
  md5(TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9\s]', '', 'g'),
                          '\s+', ' ', 'g'))) AS fp
FROM documents
"""

    o["docs_bpe_tokens"] = r"""
SELECT doc_id,
  LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
FROM documents
"""

    o["docs_exact_dups"] = """
SELECT md5(text) AS sha, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
"""

    o["docs_minhash"] = _minhash_sql(8)

    o["docs_lsh_pairs"] = f"WITH {_BANDS} SELECT a, b FROM cand"

    o["docs_simhash"] = _simhash_sql(16)

    o["docs_lsh_jaccard"] = f"""
WITH {_BANDS},
dt2 AS (
  SELECT DISTINCT id,
         UNNEST(list_transform(range(1, LEN(arr)),
                               i -> arr[i] || ' ' || arr[i + 1])) AS tok
  FROM (SELECT doc_id AS id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
        FROM documents WHERE TRIM(text) <> '')
),
sizes AS (SELECT id, COUNT(*) AS sz FROM dt2 GROUP BY 1),
inter AS (
  SELECT x.id AS a, y.id AS b, COUNT(*) AS inter
  FROM dt2 x JOIN dt2 y ON x.tok = y.tok AND x.id < y.id
  GROUP BY 1, 2
),
verified AS (
  SELECT i.a, i.b, i.inter FROM inter i JOIN cand c ON c.a = i.a AND c.b = i.b
)
SELECT v.a, v.b,
  (ROUND(v.inter / (sa.sz + sb.sz - v.inter), 6) + 0.0) AS jaccard
FROM verified v
JOIN sizes sa ON sa.id = v.a
JOIN sizes sb ON sb.id = v.b
"""

    # -- embeddings ------------------------------------------------------
    cos_ab = _COS.format(a="x.v", b="y.v")
    o["emb_cosine_dups"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings)
SELECT x.vec_id AS a, y.vec_id AS b,
       (ROUND({cos_ab}, 6) + 0.0) AS cos
FROM e x JOIN e y ON x.vec_id < y.vec_id
WHERE {cos_ab} >= 0.4
"""

    o["docs_ngram_jaccard"] = r"""
WITH grams AS (
  SELECT DISTINCT doc_id AS id, SUBSTRING(text, i, 3) AS g
  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
),
sz AS (SELECT id, COUNT(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT a.id AS a, b.id AS b, COUNT(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
       (FLOOR(CAST(i.i AS DOUBLE) / (s1.sz + s2.sz - i.i) * 1e6 + 0.5)
        / 1e6 + 0.0) AS jaccard
FROM inter i
JOIN sz s1 ON s1.id = i.a
JOIN sz s2 ON s2.id = i.b
WHERE CAST(i.i AS DOUBLE) / (s1.sz + s2.sz - i.i) >= 0.8
"""

    cos_qc = _COS.format(a="q.v", b="c.v")
    o["ann_cosine_top5"] = f"""
WITH {EMB},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos_qc} AS cos
  FROM q JOIN e c ON c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, (ROUND(cos, 6) + 0.0) AS cos, rnk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= 5
"""

    o["ann_ivf_top3"] = f"""
WITH {EMB},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos_qc} AS cos
  FROM q JOIN e c ON c.label = q.label AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, (ROUND(cos, 6) + 0.0) AS cos, rnk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= 3
"""

    o["ann_lsh_cells"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id AS id, {_lsh_cells_expr(4)} AS cell FROM e
"""

    o["ann_ivf_lsh_top3"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cells AS (SELECT vec_id, {_lsh_cells_expr(4)} AS cell FROM e),
ec AS (SELECT e.vec_id, e.v, c.cell FROM e JOIN cells c ON c.vec_id = e.vec_id),
q AS (SELECT * FROM ec WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a="q.v", b="c.v")} AS cos
  FROM q JOIN ec c ON c.cell = q.cell AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, (ROUND(cos, 6) + 0.0) AS cos, rnk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= 3
"""

    o["embedding_centroids"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
dims AS (SELECT UNNEST(RANGE(1, 65)) AS dim)
SELECT CAST(e.label AS BIGINT) AS label, d.dim,
       (ROUND(AVG(e.v[d.dim]), 6) + 0.0) AS centroid
FROM e CROSS JOIN dims d
GROUP BY 1, 2
"""

    # -- events ----------------------------------------------------------
    o["events_hourly"] = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS hour_start,
       event_type, COUNT(*) AS n,
       (ROUND(SUM(value), 6) + 0.0) AS sum_value
FROM events GROUP BY 1, 2
"""

    o["events_type_stats"] = """
SELECT event_type, COUNT(*) AS n,
       (ROUND(AVG(value), 6) + 0.0) AS avg_value,
       COUNT(DISTINCT user_id) AS users
FROM events GROUP BY 1
"""

    o["events_top_users"] = """
SELECT user_id, COUNT(*) AS n
FROM events GROUP BY 1
ORDER BY n DESC, user_id ASC LIMIT 20
"""

    # -- exact path-based centralities on pp(p_size=1) --------------------
    o["betweenness_pps1"] = f"""
WITH {PP},
{_brandes_unrolled(12)}
SELECT p.id, (ROUND(COALESCE(b.score, 0.0), 6) + 0.0) AS score
FROM pv p LEFT JOIN bc b ON b.id = p.id
"""

    o["harmonic_pps1"] = f"""
WITH {PP},
{_brandes_unrolled(12)}
SELECT p.id, (ROUND(COALESCE(h.score, 0.0), 6) + 0.0) AS score
FROM pv p LEFT JOIN (
  SELECT s AS id, SUM(1.0 / d) AS score FROM dist WHERE d > 0 GROUP BY s
) h ON h.id = p.id
"""

    o["ecc_pps1"] = f"""
WITH {PP},
{_brandes_unrolled(12)}
SELECT p.id, CAST(COALESCE(e.ecc, 0) AS BIGINT) AS ecc
FROM pv p LEFT JOIN (
  SELECT s AS id, MAX(d) AS ecc FROM dist GROUP BY s
) e ON e.id = p.id
"""

    o["hyperbolicity_pps1"] = f"""
WITH {PP},
{_dist_unrolled(12)},
pairs AS MATERIALIZED (SELECT s AS u, v, d FROM dist WHERE s < v AND d > 0),
quads AS (
  SELECT ab.d + cd.d AS s1, ac.d + bd.d AS s2, ad.d + bc_.d AS s3
  FROM pairs ab
  JOIN pairs cd
    ON ab.u < cd.u AND ab.v <> cd.u AND ab.v <> cd.v AND ab.u <> cd.v
  JOIN dist ac ON ac.s = ab.u AND ac.v = cd.u
  JOIN dist bd ON bd.s = ab.v AND bd.v = cd.v
  JOIN dist ad ON ad.s = ab.u AND ad.v = cd.v
  JOIN dist bc_ ON bc_.s = ab.v AND bc_.v = cd.u
)
SELECT (ROUND(COALESCE(MAX(
         (GREATEST(s1, s2, s3)
          - (s1 + s2 + s3 - GREATEST(s1, s2, s3) - LEAST(s1, s2, s3)))
         / 2.0), 0.0), 6) + 0.0) AS delta
FROM quads
"""


    o["quadrangles_pps1"] = f"""
WITH {PP},
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
cn AS (
  SELECT w1.dst AS a, w2.dst AS b, COUNT(*) AS c
  FROM psym w1 JOIN psym w2 ON w1.src = w2.src AND w1.dst < w2.dst
  GROUP BY 1, 2
),
cns AS (SELECT a, b, c FROM cn UNION ALL SELECT b, a, c FROM cn),
paths AS (
  SELECT e.src AS u, e.dst AS v, n.dst AS w
  FROM pe e JOIN psym n ON n.src = e.dst AND n.dst <> e.src
),
score AS (
  SELECT p.u, p.v, SUM(c.c - 1) AS q
  FROM paths p JOIN cns c ON c.a = p.u AND c.b = p.w
  GROUP BY 1, 2
)
SELECT e.src AS lo, e.dst AS hi,
       CAST(COALESCE(s.q, 0) AS BIGINT) AS quadrangles
FROM pe e LEFT JOIN score s ON s.u = e.src AND s.v = e.dst
"""

    o["bcc_pps1"] = f"""
WITH {PP},
{_excl_cc_unrolled(24)},
nbr AS (SELECT src AS x, dst AS nb FROM psym),
blocks AS (
  SELECT n.x, COUNT(DISTINCT l.label) AS n_blocks
  FROM nbr n JOIN xl24 l ON l.x = n.x AND l.node = n.nb
  GROUP BY n.x
)
SELECT p.id, CAST(COALESCE(b.n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(CASE WHEN COALESCE(b.n_blocks, 0) >= 2 THEN 1 ELSE 0 END AS INT)
       AS is_articulation
FROM pv p LEFT JOIN blocks b ON b.x = p.id
"""

    o["group_closeness_pps1"] = f"""
WITH {PP},
{_dist_unrolled(12)},
inf AS (SELECT 2.0 * COUNT(*) AS v FROM pv),
dd AS MATERIALIZED (
  SELECT a.id AS u, b.id AS v,
         COALESCE(CAST(d.d AS DOUBLE), (SELECT v FROM inf)) AS d
  FROM pv a CROSS JOIN pv b
  LEFT JOIN dist d ON d.s = a.id AND d.v = b.id
),
g1 AS (SELECT u, SUM(d) AS s FROM dd GROUP BY u),
p1 AS (SELECT u FROM g1 ORDER BY s ASC, u ASC LIMIT 1),
c1 AS MATERIALIZED (
  SELECT v, d AS cd FROM dd WHERE u = (SELECT u FROM p1)
),
g2 AS (
  SELECT dd.u, SUM(GREATEST(c1.cd - dd.d, 0.0)) AS gain
  FROM dd JOIN c1 ON c1.v = dd.v
  WHERE dd.u <> (SELECT u FROM p1)
  GROUP BY dd.u
),
p2 AS (SELECT u FROM g2 ORDER BY gain DESC, u ASC LIMIT 1),
c2 AS MATERIALIZED (
  SELECT c1.v, LEAST(c1.cd, dd.d) AS cd
  FROM c1 JOIN dd ON dd.v = c1.v AND dd.u = (SELECT u FROM p2)
),
g3 AS (
  SELECT dd.u, SUM(GREATEST(c2.cd - dd.d, 0.0)) AS gain
  FROM dd JOIN c2 ON c2.v = dd.v
  WHERE dd.u NOT IN (SELECT u FROM p1 UNION ALL SELECT u FROM p2)
  GROUP BY dd.u
),
p3 AS (SELECT u FROM g3 ORDER BY gain DESC, u ASC LIMIT 1)
SELECT CAST(1 AS INT) AS rank, u AS id FROM p1
UNION ALL SELECT CAST(2 AS INT), u FROM p2
UNION ALL SELECT CAST(3 AS INT), u FROM p3
"""

    o["centralization_pps1"] = f"""
WITH {PP},
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
deg AS (
  SELECT p.id, CAST(COALESCE(d.c, 0) AS DOUBLE) AS score
  FROM pv p LEFT JOIN (
    SELECT src AS id, COUNT(*) AS c FROM psym GROUP BY 1) d ON d.id = p.id
),
agg AS (
  SELECT MAX(score) AS center, SUM(score) AS total,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM deg
)
SELECT (ROUND(CASE WHEN (n - 1.0) * n - total = 0 THEN 0.0
              ELSE (center * n - total) / ((n - 1.0) * n - total) END, 6)
        + 0.0) AS centralization
FROM agg
"""

    o["scd_sweep_pps1"] = f"""
WITH {PP},
{_apr_unrolled(36, 0.15, 1e-3)},
support AS (
  SELECT id, vol, ROUND(p / vol, 6) AS score
  FROM apr36 WHERE p > 0 OR r > 0
),
ranked AS MATERIALIZED (
  SELECT id, vol,
         ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS rank
  FROM support
),
internal AS (
  SELECT GREATEST(ru.rank, rv.rank) AS rank, SUM(1.0) AS int_w
  FROM pe e JOIN ranked ru ON ru.id = e.src JOIN ranked rv ON rv.id = e.dst
  GROUP BY 1
),
sweep AS (
  SELECT r.id, r.rank,
         SUM(r.vol) OVER w AS cumvol,
         SUM(COALESCE(i.int_w, 0.0)) OVER w AS cumint
  FROM ranked r LEFT JOIN internal i ON i.rank = r.rank
  WINDOW w AS (ORDER BY r.rank RANGE BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT id, CAST(rank AS BIGINT) AS rank,
       (ROUND((cumvol - 2.0 * cumint)
              / LEAST(cumvol,
                      GREATEST((SELECT CAST(COUNT(*) AS DOUBLE) FROM psym)
                               - cumvol, 1e-300)), 6) + 0.0) AS cond
FROM sweep
"""

    o["simple_paths_pps1"] = f"""
WITH RECURSIVE {PP},
{_dist_unrolled(12)},
seed AS (SELECT MIN(src) AS s FROM pe),
tgt AS (
  SELECT MAX(v) AS t FROM dist
  WHERE s = (SELECT s FROM seed) AND d = 3
),
walk(last, path) AS (
  SELECT s, [s] FROM seed
  UNION ALL
  SELECT e.dst, list_append(w.path, e.dst)
  FROM walk w JOIN psym e ON e.src = w.last
  WHERE NOT list_contains(w.path, e.dst)
    AND len(w.path) <= 8
    AND w.last <> (SELECT t FROM tgt)
)
SELECT array_to_string(path, '-') AS path
FROM walk WHERE last = (SELECT t FROM tgt)
"""

    # -- partition quality / similarity -----------------------------------
    o["community_eval_pp_brand"] = f"""
WITH {PP},
br AS (SELECT p_partkey AS id, p_brand AS l FROM part),
j AS (
  SELECT e.src, e.dst, 1.0 AS weight, a.l AS l_src, b.l AS l_dst
  FROM pp_edges e JOIN br a ON a.id = e.src JOIN br b ON b.id = e.dst
),
tot AS (
  SELECT SUM(weight) AS total,
         SUM(CASE WHEN l_src <> l_dst THEN weight ELSE 0.0 END) AS cut,
         SUM(CASE WHEN l_src = l_dst THEN weight ELSE 0.0 END) AS intra
  FROM j
),
vols AS (
  SELECT c, SUM(weight) AS vol FROM (
    SELECT l_src AS c, weight FROM j UNION ALL SELECT l_dst AS c, weight FROM j
  ) GROUP BY 1
)
SELECT (ROUND(t.cut, 6) + 0.0) AS edge_cut,
       (ROUND(t.intra / t.total, 6) + 0.0) AS coverage,
       (ROUND(t.intra / t.total
              - (SELECT SUM(POWER(vol / t.total, 2) / 4.0) FROM vols),
              6) + 0.0) AS modularity
FROM tot t
"""

    o["conductance_pp_size"] = f"""
WITH {PP},
lb AS (SELECT p_partkey AS id,
              CASE WHEN p_size <= 25 THEN 1 ELSE 0 END AS l FROM part),
j AS (
  SELECT 1.0 AS weight, a.l AS l_src, b.l AS l_dst
  FROM pp_edges e JOIN lb a ON a.id = e.src JOIN lb b ON b.id = e.dst
),
cut AS (
  SELECT SUM(CASE WHEN l_src <> l_dst THEN weight ELSE 0.0 END) AS c FROM j
),
vols AS (
  SELECT c, SUM(weight) AS vol FROM (
    SELECT l_src AS c, weight FROM j UNION ALL SELECT l_dst AS c, weight FROM j
  ) GROUP BY 1
)
SELECT (ROUND((SELECT c FROM cut) / (SELECT MIN(vol) FROM vols), 6) + 0.0)
       AS conductance
"""

    o["local_eval_pp_brand"] = f"""
WITH {PP},
br AS (SELECT p_partkey AS id, p_brand AS label FROM part),
el AS (
  SELECT e.src, e.dst, 1.0 AS w, a.label AS ls, b.label AS ld
  FROM pp_edges e JOIN br a ON a.id = e.src JOIN br b ON b.id = e.dst
),
sizes AS (SELECT label, COUNT(*) AS sz FROM br GROUP BY 1),
intra AS (SELECT ls AS label, COUNT(*) AS ie FROM el WHERE ls = ld GROUP BY 1),
perside AS (
  SELECT ls AS label, w, ls <> ld AS x FROM el
  UNION ALL SELECT ld, w, ls <> ld FROM el
),
agg AS (
  SELECT label, SUM(CASE WHEN x THEN w ELSE 0.0 END) AS cut,
         SUM(w) AS vol
  FROM perside GROUP BY 1
),
tot AS (SELECT SUM(w) * 2 AS t FROM el),
isym AS (
  SELECT src AS id, ls AS label FROM el WHERE ls = ld
  UNION ALL SELECT dst, ld FROM el WHERE ls = ld
),
mx AS (SELECT label, MAX(d) AS mx FROM (
  SELECT id, label, COUNT(*) AS d FROM isym GROUP BY 1, 2) GROUP BY 1)
SELECT s.label,
  (ROUND(CASE WHEN s.sz * (s.sz - 1) / 2 > 0
              THEN COALESCE(i.ie, 0) / (s.sz * (s.sz - 1) / 2.0)
              ELSE 1.0 END, 6) + 0.0) AS density,
  (ROUND(CASE WHEN s.sz > 1
              THEN COALESCE(m.mx, 0) / (s.sz - 1.0) ELSE 1.0 END,
         6) + 0.0) AS dominance,
  (ROUND(CASE WHEN LEAST(COALESCE(a.vol, 0.0),
                         (SELECT t FROM tot) - COALESCE(a.vol, 0.0)) > 0
              THEN COALESCE(a.cut, 0.0)
                   / LEAST(COALESCE(a.vol, 0.0),
                           (SELECT t FROM tot) - COALESCE(a.vol, 0.0))
              ELSE 0.0 END, 6) + 0.0) AS iic
FROM sizes s
LEFT JOIN intra i ON i.label = s.label
LEFT JOIN agg a ON a.label = s.label
LEFT JOIN mx m ON m.label = s.label
"""

    o["partition_sim_pp"] = f"""
WITH {PP},
sz AS (SELECT p_partkey AS id, CAST(FLOOR(p_size / 10) AS BIGINT) AS label
       FROM part),
br AS (SELECT p_partkey AS id, p_brand AS b FROM part),
j AS (SELECT l.id, l.label AS a, br.b FROM sz l JOIN br ON br.id = l.id),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM j),
cells AS (SELECT a, b, COUNT(*) AS s FROM j GROUP BY a, b),
ma AS (SELECT a, SUM(s) AS sa FROM cells GROUP BY a),
mb AS (SELECT b, SUM(s) AS sb FROM cells GROUP BY b),
sums AS (
  SELECT (SELECT SUM(sa * (sa - 1) / 2) FROM ma) AS s1,
         (SELECT SUM(sb * (sb - 1) / 2) FROM mb) AS s2,
         (SELECT SUM(s * (s - 1) / 2) FROM cells) AS si,
         (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) / 2 AS total
),
eg AS (
  SELECT ja.a AS a_src, jb.a AS a_dst, ja.b AS b_src, jb.b AS b_dst
  FROM pp_edges e JOIN j ja ON ja.id = e.src JOIN j jb ON jb.id = e.dst
),
ag AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m,
         SUM(CASE WHEN (a_src = a_dst) = (b_src = b_dst)
             THEN 1 ELSE 0 END) AS agree
  FROM eg
),
mi AS (
  SELECT SUM((s / (SELECT n FROM nn))
             * LOG2(s * (SELECT n FROM nn) / (ma.sa * mb.sb))) AS v
  FROM cells JOIN ma USING (a) JOIN mb USING (b)
),
h1 AS (SELECT -SUM(sa / (SELECT n FROM nn) * LOG2(sa / (SELECT n FROM nn))) AS v FROM ma),
h2 AS (SELECT -SUM(sb / (SELECT n FROM nn) * LOG2(sb / (SELECT n FROM nn))) AS v FROM mb)
SELECT
  (ROUND(1.0 - (si + (total + si - (s1 + s2))) / total, 6) + 0.0) AS rand_d,
  (ROUND(1.0 - (si - s1 * s2 / total) / (0.5 * (s1 + s2) - s1 * s2 / total),
         6) + 0.0) AS ari_d,
  (ROUND(1.0 - si / (s1 + s2 - si), 6) + 0.0) AS jaccard_d,
  (ROUND(1.0 - (SELECT agree FROM ag) / (SELECT m FROM ag), 6) + 0.0) AS gsrand_d,
  (ROUND(1.0 - 2.0 * (SELECT v FROM mi) / ((SELECT v FROM h1) + (SELECT v FROM h2)),
         6) + 0.0) AS nmi_d
FROM sums
"""

    # -- north-rule corpus pipeline (md5-keyed, fully SQL-reproducible) --
    o["corpus_pagerank_top20"] = f"""
WITH RECURSIVE {_corpus_cte()},
nn AS (SELECT COUNT(*) AS c FROM verts),
odeg AS (SELECT src, COUNT(*) AS od FROM g_edges GROUP BY 1),
coef AS (
  SELECT e.src, e.dst, 1.0 / o.od AS coef
  FROM g_edges e JOIN odeg o ON o.src = e.src
  UNION ALL
  SELECT id, id, 0.0 FROM verts
),
pr(it, id, rank) AS (
  SELECT 0, id, 1.0 / (SELECT c FROM nn) FROM verts
  UNION ALL
  SELECT p.it + 1, c.dst,
         0.15 / (SELECT c FROM nn) + 0.85 * SUM(p.rank * c.coef)
  FROM pr p JOIN coef c ON c.src = p.id
  WHERE p.it < 12
  GROUP BY p.it, c.dst
)
SELECT id, (ROUND(rank / SUM(rank) OVER (), 6) + 0.0) AS rank
FROM pr WHERE it = 12
ORDER BY 2 DESC, id ASC LIMIT 20
"""

    o["corpus_components"] = f"""
WITH RECURSIVE {_corpus_cte()},
gsym AS (
  SELECT src, dst FROM g_edges UNION SELECT dst AS src, src AS dst FROM g_edges
),
reach(id, r) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.dst, reach.r FROM reach JOIN gsym s ON s.src = reach.id
),
cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT component, COUNT(*) AS size FROM cc GROUP BY 1
"""

    o["corpus_scc"] = f"""
WITH RECURSIVE {_corpus_cte()},
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN g_edges e ON e.src = r.b
)
SELECT r1.a AS id, MAX(r1.b) AS component
FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
GROUP BY r1.a
"""

    # -- spanning-forest-by-weight family (operators/msf.py) --------------
    # Both oracles use the cycle property directly: an edge is in the
    # (union of) maximum spanning forest(s) iff its endpoints are NOT
    # connected using only strictly greater edges — greater by full key
    # (weight, a, b) for the unique MSF, by weight alone for the union.
    o["wbetweenness_pps1w"] = _wbetweenness_pps1w_sql(16)

    o["jacobi_pps1w"] = _jacobi_pps1w_sql(8)

    o["hub_dist_pps1_k4"] = f"""
WITH {PP},
{_brandes_unrolled(12)},
hdeg AS (SELECT src AS id, COUNT(*) AS cnt FROM psym GROUP BY 1),
hubs AS (SELECT id FROM hdeg ORDER BY cnt DESC, id ASC LIMIT 4),
labels AS (
  SELECT v, s AS hub, d FROM dist WHERE s IN (SELECT id FROM hubs)
),
pairs AS (SELECT a.id AS u, b.id AS v FROM pv a JOIN pv b ON a.id < b.id)
SELECT p.u, p.v, CAST(MIN(lu.d + lv.d) AS BIGINT) AS d
FROM pairs p
JOIN labels lu ON lu.v = p.u
JOIN labels lv ON lv.hub = lu.hub AND lv.v = p.v
GROUP BY 1, 2
"""

    o["ari_pps1"] = f"""
WITH {PP},
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM psym GROUP BY 1),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS DOUBLE) AS a
  FROM psym a JOIN psym b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pv),
scored AS (
  SELECT c.u, c.v,
         c.a AS a,
         CAST(d1.deg + d2.deg AS DOUBLE) - c.a AS un,
         nn.n - (CAST(d1.deg + d2.deg AS DOUBLE) - c.a) AS d
  FROM common c
  CROSS JOIN nn
  JOIN deg d1 ON d1.id = c.u
  JOIN deg d2 ON d2.id = c.v
)
SELECT u, v,
       (FLOOR(CASE
          WHEN (a*un + a*un + 2*a*d + un*un + un*d + un*un + un*d) = 0
          THEN 0.0
          ELSE 2*(a*d - un*un)
               / (a*un + a*un + 2*a*d + un*un + un*d + un*un + un*d)
        END * 1e6 + 0.5) / 1e6 + 0.0) AS score
FROM scored
"""

    o["diameter_range_pps1"] = f"""
WITH {PP},
{_brandes_unrolled(12)}
SELECT CAST(MAX(d) AS BIGINT) AS lb, CAST(MAX(d) AS BIGINT) AS ub
FROM dist
"""

    o["msf_pps1w"] = f"""
WITH RECURSIVE {PPS1W},
ek AS MATERIALIZED (
  SELECT a, b, w, ROW_NUMBER() OVER (ORDER BY w, a, b) AS k FROM p1e
),
symk AS MATERIALIZED (
  SELECT a AS u, b AS v, k FROM ek UNION ALL SELECT b AS u, a AS v, k FROM ek
),
reach(eid, k0, t) AS (
  SELECT k, k, a FROM ek
  UNION
  SELECT r.eid, r.k0, s.v FROM reach r JOIN symk s ON s.u = r.t AND s.k > r.k0
)
SELECT e.a, e.b, (ROUND(e.w, 6) + 0.0) AS weight
FROM ek e
WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.eid = e.k AND r.t = e.b)
"""

    o["umsf_pps1w"] = f"""
WITH RECURSIVE {PPS1W},
sym AS MATERIALIZED (
  SELECT a AS u, b AS v, w FROM p1e UNION ALL SELECT b AS u, a AS v, w FROM p1e
),
thr AS MATERIALIZED (SELECT DISTINCT w FROM p1e),
nodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym),
reach(w0, s, t) AS (
  SELECT thr.w, n.id, n.id FROM thr CROSS JOIN nodes n
  UNION
  SELECT r.w0, r.s, e.v FROM reach r JOIN sym e ON e.u = r.t AND e.w > r.w0
)
SELECT e.a, e.b, (ROUND(e.w, 6) + 0.0) AS weight
FROM p1e e
WHERE NOT EXISTS (
  SELECT 1 FROM reach r WHERE r.w0 = e.w AND r.s = e.a AND r.t = e.b
)
"""

    # -- PrefixJaccardScore: ranks + prefix-entry events + cumsum ---------
    o["prefix_jaccard_pps1"] = f"""
WITH {PP},
pv AS (SELECT p_partkey AS id FROM part WHERE p_size = 1),
pe AS (
  SELECT src, dst FROM pp_edges
  WHERE src IN (SELECT id FROM pv) AND dst IN (SELECT id FROM pv)
),
psym AS (SELECT src, dst FROM pe UNION ALL SELECT dst AS src, src AS dst FROM pe),
tri AS (
  SELECT e.src AS lo, e.dst AS hi,
         (SELECT COUNT(*) FROM psym a, psym b
          WHERE a.src = e.src AND b.src = e.dst AND a.dst = b.dst) AS att
  FROM pe e
),
inc AS (
  SELECT s.src AS u, s.dst AS w, t.att
  FROM psym s JOIN tri t
    ON t.lo = LEAST(s.src, s.dst) AND t.hi = GREATEST(s.src, s.dst)
),
ranked AS (
  SELECT u, w, RANK() OVER (PARTITION BY u ORDER BY att DESC) - 1 AS r
  FROM inc
),
evu AS (
  SELECT e.src AS lo, e.dst AS hi, rk.w, rk.r AS ru
  FROM pe e JOIN ranked rk ON rk.u = e.src AND rk.w <> e.dst
),
evv AS (
  SELECT e.src AS lo, e.dst AS hi, rk.w, rk.r AS rv
  FROM pe e JOIN ranked rk ON rk.u = e.dst AND rk.w <> e.src
),
bothj AS (
  SELECT COALESCE(u.lo, v.lo) AS lo, COALESCE(u.hi, v.hi) AS hi,
         COALESCE(u.w, v.w) AS w, u.ru, v.rv
  FROM evu u FULL OUTER JOIN evv v
    ON u.lo = v.lo AND u.hi = v.hi AND u.w = v.w
),
deltas AS (
  SELECT lo, hi, r, SUM(du) AS du, SUM(dv) AS dv, SUM(dc) AS dc FROM (
    SELECT lo, hi, ru AS r, 1 AS du, 0 AS dv, 0 AS dc
    FROM bothj WHERE ru IS NOT NULL
    UNION ALL
    SELECT lo, hi, rv, 0, 1, 0 FROM bothj WHERE rv IS NOT NULL
    UNION ALL
    SELECT lo, hi, GREATEST(ru, rv), 0, 0, 1
    FROM bothj WHERE ru IS NOT NULL AND rv IS NOT NULL
  ) GROUP BY 1, 2, 3
),
jac AS (
  SELECT lo, hi,
         SUM(dc) OVER win * 1.0
           / (SUM(du) OVER win + SUM(dv) OVER win - SUM(dc) OVER win) AS j
  FROM deltas
  WINDOW win AS (PARTITION BY lo, hi ORDER BY r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
best AS (SELECT lo, hi, MAX(j) AS s FROM jac GROUP BY 1, 2)
SELECT e.src AS lo, e.dst AS hi,
       (ROUND(COALESCE(b.s, 0.0), 6) + 0.0) AS score
FROM pe e LEFT JOIN best b ON b.lo = e.src AND b.hi = e.dst
"""

    # -- SEIR census at p=1: derived from the BFS wavefront -----------
    o["seir_pps1_p1"] = f"""
WITH {PP},
{_dist_unrolled(12)},
zero AS (SELECT MIN(id) AS z FROM pv),
dz AS (
  SELECT v, d FROM dist
  WHERE s = (SELECT z FROM zero) AND d >= 1
),
ticks AS (SELECT CAST(range AS BIGINT) AS t FROM range(22)),
node_states AS (
  SELECT t.t, CASE WHEN t.t = 0 THEN 2 ELSE 3 END AS state
  FROM ticks t
  UNION ALL
  SELECT t.t,
         CASE WHEN t.t < 2 * dz.d - 2 THEN 0
              WHEN t.t = 2 * dz.d - 2 THEN 1
              WHEN t.t = 2 * dz.d - 1 THEN 2
              ELSE 3 END AS state
  FROM ticks t CROSS JOIN dz
  UNION ALL
  SELECT t.t, 0 AS state
  FROM ticks t CROSS JOIN (
    SELECT p.id FROM pv p
    WHERE p.id NOT IN (SELECT v FROM dz)
      AND p.id <> (SELECT z FROM zero)) u
),
grid AS (
  SELECT t.t, s.state
  FROM ticks t CROSS JOIN (
    SELECT CAST(range AS BIGINT) AS state FROM range(4)) s
)
SELECT g.t, g.state, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
FROM grid g LEFT JOIN (
  SELECT t, state, COUNT(*) AS cnt FROM node_states GROUP BY 1, 2
) c ON c.t = g.t AND c.state = g.state
"""

    # -- algebraic layer: diag(A^3)/2 per node (operators/algebraic.py) ---
    o["alg_triangles_pp"] = f"""
WITH {PP},
closed AS (
  SELECT s1.src AS id
  FROM pp_sym s1
  JOIN pp_sym s2 ON s2.src = s1.dst AND s2.dst <> s1.src
  JOIN pp_sym s3 ON s3.src = s1.src AND s3.dst = s2.dst
)
SELECT v.id, CAST(COALESCE(t.c, 0) AS BIGINT) AS triangles
FROM pp_verts v LEFT JOIN (
  SELECT id, COUNT(*) / 2 AS c FROM closed GROUP BY id
) t ON t.id = v.id
"""

    return o


def _wbetweenness_pps1w_sql(k_rounds: int) -> str:
    """Unrolled DuckDB twin of operators.betweenness.weighted_betweenness
    on the weighted pp(p_size=1) graph: k_rounds of multi-source
    Bellman-Ford, then the shortest-path DAG, then k_rounds each of the
    sigma (path-count) and delta (dependency) fixpoints — the exact loop
    the Spark operator runs, with MATERIALIZED stages standing in for
    the parquet lineage cuts. k_rounds must exceed the max shortest-path
    hop count (16 covers the sf0.01 fixture's ~38-vertex components)."""
    parts = [f"WITH {PPS1W},", """
wsym AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM p1e
  UNION ALL SELECT b AS src, a AS dst, w FROM p1e
),
bf0 AS MATERIALIZED (SELECT id AS s, id AS v, 0.0 AS dist FROM p1v),"""]
    for i in range(1, k_rounds + 1):
        parts.append(f"""
rx{i} AS MATERIALIZED (
  SELECT d.s, e.dst AS v, MIN(d.dist + e.w) AS cand
  FROM bf{i - 1} d JOIN wsym e ON e.src = d.v GROUP BY 1, 2
),
bf{i} AS MATERIALIZED (
  SELECT COALESCE(d.s, r.s) AS s, COALESCE(d.v, r.v) AS v,
         LEAST(COALESCE(d.dist, 1e18), COALESCE(r.cand, 1e18)) AS dist
  FROM bf{i - 1} d FULL JOIN rx{i} r ON r.s = d.s AND r.v = d.v
),""")
    parts.append(f"""
dist AS MATERIALIZED (SELECT * FROM bf{k_rounds}),
dag AS MATERIALIZED (
  SELECT du.s, du.v AS u, dv.v AS v
  FROM dist du
  JOIN wsym e ON e.src = du.v
  JOIN dist dv ON dv.s = du.s AND dv.v = e.dst
   AND du.dist + e.w = dv.dist
),
f0 AS MATERIALIZED (
  SELECT s, v, CASE WHEN v = s THEN 1.0 ELSE 0.0 END AS sigma FROM dist
),""")
    for i in range(1, k_rounds + 1):
        parts.append(f"""
fm{i} AS MATERIALIZED (
  SELECT g.s, g.v, SUM(p.sigma) AS msig
  FROM dag g JOIN f{i - 1} p ON p.s = g.s AND p.v = g.u GROUP BY 1, 2
),
f{i} AS MATERIALIZED (
  SELECT st.s, st.v,
         CASE WHEN st.v = st.s THEN 1.0
              ELSE COALESCE(m.msig, 0.0) END AS sigma
  FROM f{i - 1} st LEFT JOIN fm{i} m ON m.s = st.s AND m.v = st.v
),""")
    parts.append(f"""
b0 AS MATERIALIZED (
  SELECT s, v, sigma, 0.0 AS delta FROM f{k_rounds}
),""")
    for i in range(1, k_rounds + 1):
        parts.append(f"""
bm{i} AS MATERIALIZED (
  SELECT g.s, g.u AS v,
         SUM(pu.sigma / pv.sigma * (1.0 + pv.delta)) AS nd
  FROM dag g
  JOIN b{i - 1} pv ON pv.s = g.s AND pv.v = g.v
  JOIN b{i - 1} pu ON pu.s = g.s AND pu.v = g.u
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT st.s, st.v, st.sigma, COALESCE(m.nd, 0.0) AS delta
  FROM b{i - 1} st LEFT JOIN bm{i} m ON m.s = st.s AND m.v = st.v
),""")
    parts.append(f"""
bc AS (
  SELECT v AS id, SUM(delta) AS score
  FROM b{k_rounds} WHERE s <> v GROUP BY 1
)
SELECT p.id,
       (FLOOR(COALESCE(bc.score, 0.0) * 1e6 + 0.5) / 1e6 + 0.0) AS score
FROM p1v p LEFT JOIN bc ON bc.id = p.id
""")
    return "".join(parts)


def _jacobi_pps1w_sql(sweeps: int) -> str:
    """Unrolled DuckDB twin of numerics.jacobi_relaxation on
    (L+I)x = wdeg over the weighted pp(p_size=1) graph: the matrix is
    built exactly like laplacian_matrix (off-diag −w both orientations,
    diag from the off rows) plus identity rows, duplicates coalesced by
    SUM as the operator does; each sweep is one SpMV join+agg and one
    column update."""
    parts = [f"WITH {PPS1W},", """
wsym AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM p1e
  UNION ALL SELECT b AS src, a AS dst, w FROM p1e
),
lap_off AS MATERIALIZED (
  SELECT a AS row, b AS col, -w AS val FROM p1e
  UNION ALL SELECT b AS row, a AS col, -w AS val FROM p1e
),
lap_diag AS MATERIALIZED (
  SELECT row, row AS col, -SUM(val) AS val FROM lap_off GROUP BY 1
),
amat AS MATERIALIZED (
  SELECT row, col, SUM(val) AS val FROM (
    SELECT * FROM lap_off
    UNION ALL SELECT * FROM lap_diag
    UNION ALL SELECT id AS row, id AS col, 1.0 AS val FROM p1v
  ) GROUP BY 1, 2
),
dinv AS MATERIALIZED (
  SELECT row AS id, 1.0 / val AS dinv FROM amat
  WHERE row = col AND val <> 0
),
bv AS MATERIALIZED (
  SELECT v.id, COALESCE(s.d, 0.0) AS val FROM p1v v
  LEFT JOIN (SELECT src AS id, SUM(w) AS d FROM wsym GROUP BY 1) s
    ON s.id = v.id
),
jx0 AS MATERIALIZED (SELECT id, 0.0 AS val FROM p1v),"""]
    for i in range(1, sweeps + 1):
        parts.append(f"""
jax{i} AS MATERIALIZED (
  SELECT m.col AS id, SUM(m.val * x.val) AS val
  FROM amat m JOIN jx{i - 1} x ON x.id = m.row GROUP BY 1
),
jx{i} AS MATERIALIZED (
  SELECT x.id,
         x.val + (2.0 / 3.0) * d.dinv
               * (b.val - COALESCE(a.val, 0.0)) AS val
  FROM jx{i - 1} x
  JOIN dinv d ON d.id = x.id
  JOIN bv b ON b.id = x.id
  LEFT JOIN jax{i} a ON a.id = x.id
),""")
    parts.append(f"""
jfinal AS (SELECT * FROM jx{sweeps})
SELECT id, (FLOOR(val * 1e6 + 0.5) / 1e6 + 0.0) AS val FROM jfinal
""")
    return "".join(parts)
