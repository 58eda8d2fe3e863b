"""Ingestion of the Iceberg-shaped source-code corpus and derivation of the
import/reference edge graph (SURVEY.md §7.1; BASELINE.json input_hint).

Input table: ``repos(repo: string, path: string, commit: string,
lang: string, content: string)``. Everything below is deterministic and
content-derived:

  - ``file_id = xxhash64(repo, path) & MAX_INT63`` — non-negative int64
    vertex ids (Spark has no unsigned 64-bit; the reference uses dense
    uint64 ids, /root/reference/networkit/cpp/Globals.h:20-23 — ours are
    sparse hashes, densify with :func:`continuous_ids` when an algorithm
    wants 0..n-1).
  - ``sha = sha2(content, 256)`` — the per-row invariant the mandate pins:
    the sha computed at ingestion must equal the sha recomputed from any
    checkpointed lineage row (test_repos.py).
  - edges: referenced module names extracted from ``content`` with a
    per-``lang`` regex (``regexp_extract_all`` — JVM-side, no Python),
    exploded, equi-joined against ``(repo, module_name(path)) → file_id``
    within the same repo → directed edge (referencing → referenced,
    weight 1.0), deduplicated.

At 100 TB the repos table is wide (content dominates); every plan here
selects only the columns it needs before shuffling so Catalyst pushes
column pruning into the scan — content never travels through a shuffle:
the extraction regex runs map-side, then only (repo, ref, file_id) rows
move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph

MAX_INT63 = (1 << 63) - 1

# per-lang reference-extraction regexes (match the render templates in
# networkit_spark.sources.generators, but general enough for real code)
IMPORT_PATTERNS = {
    "py": r"(?m)^\s*import\s+([A-Za-z_][A-Za-z0-9_]*)",
    "js": r"require\('([A-Za-z0-9_./]+)'\)",
    "java": r"(?m)^\s*import\s+([A-Za-z0-9_.]+);",
    "go": r"import\s+\"([A-Za-z0-9_/]+)\"",
    "c": r"#include\s+\"([A-Za-z0-9_./]+)\.h\"",
}


def file_id_col(repo="repo", path="path", hash_fn: str = "xxhash64"):
    """Deterministic non-negative int64 vertex id for a file. pmod (not
    abs%) — abs(Long.MIN_VALUE) overflows under ANSI mode.

    ``hash_fn="md5"`` derives the id from md5(repo:path) (first 15 hex
    chars → int60, already non-negative) — bit-reproducible in DuckDB, so
    the corpus pipeline gets a SQL oracle. xxhash64 stays the default at
    scale (one JVM hash vs md5's digest + hex decode)."""
    if hash_fn == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(repo), F.col(path))), 1, 15),
            16, 10,
        ).cast("long")
    return F.pmod(F.xxhash64(F.col(repo), F.col(path)), F.lit(MAX_INT63))


def module_name_col(path="path"):
    """Basename without extension: 'src/mod_7.py' -> 'mod_7'."""
    return F.regexp_extract(F.element_at(F.split(F.col(path), "/"), -1),
                            r"^(.+?)(\.[A-Za-z0-9]+)?$", 1)


def ingest(repos: DataFrame, hash_fn: str = "xxhash64") -> DataFrame:
    """files(file_id, repo, path, commit, lang, sha) — vertex/lineage table.
    content itself is deliberately NOT carried (column pruning at scale)."""
    return repos.select(
        file_id_col(hash_fn=hash_fn).alias("file_id"),
        "repo", "path", "commit", "lang",
        F.sha2(F.col("content"), 256).alias("sha"),
        module_name_col().alias("module"),
    )


def extract_references(repos: DataFrame, hash_fn: str = "xxhash64") -> DataFrame:
    """(repo, src_file_id, ref) — one row per referenced module name.
    The per-lang regex dispatch is a CASE expression over
    ``regexp_extract_all`` — map-side, codegen'd, no UDF."""
    refs = None
    pattern = None
    for lang, pat in IMPORT_PATTERNS.items():
        ex = F.regexp_extract_all(F.col("content"), F.lit(pat), F.lit(1))
        pattern = ex if pattern is None else pattern
        refs = (
            F.when(F.col("lang") == lang, ex) if refs is None
            else refs.when(F.col("lang") == lang, ex)
        )
    refs = refs.otherwise(F.array().cast("array<string>"))
    return (
        repos.select("repo", file_id_col(hash_fn=hash_fn).alias("src"),
                     refs.alias("refs"))
        .select("repo", "src", F.explode("refs").alias("ref"))
    )


def derive_edges(repos: DataFrame, hash_fn: str = "xxhash64") -> DataFrame:
    """edges(src, dst, weight) — the import graph; deduplicated, directed,
    weight 1.0. Self-references dropped."""
    files = ingest(repos, hash_fn=hash_fn)
    targets = files.select("repo", F.col("module").alias("ref"),
                           F.col("file_id").alias("dst"))
    refs = extract_references(repos, hash_fn=hash_fn)
    return (
        refs.join(targets, ["repo", "ref"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def graph_from_repos(repos: DataFrame, directed: bool = True,
                     hash_fn: str = "xxhash64") -> Graph:
    """The full stage-0 pipeline: corpus table → Graph. The vertex set is
    ALL files (isolated files stay isolated vertices, matching the
    reference's existing-but-unconnected nodes)."""
    vertices = repos.select(file_id_col(hash_fn=hash_fn).alias("id"))
    return Graph(derive_edges(repos, hash_fn=hash_fn), directed=directed,
                 weighted=False, vertices=vertices)


def continuous_ids(vertices: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, dense_id) — GraphTools.getContinuousNodeIds
    (/root/reference/networkit/_NetworKit.pyx:4189-4213): order-preserving
    densification to 0..n-1 via the distributed two-pass rank
    (range-repartition + per-partition offsets; no single-partition sort).
    """
    from networkit_spark.operators.graph_tools import ordered_dense_ids

    return ordered_dense_ids(
        vertices.select(F.col(id_col).alias("id")), ["id"], "dense_id")


def verify_sha(files: DataFrame, repos: DataFrame) -> int:
    """Per-row invariant check (mandate): sha recorded at ingestion equals
    sha recomputed from the corpus content. Returns number of mismatches
    (0 == pass)."""
    recomputed = repos.select(
        file_id_col().alias("file_id"), F.sha2(F.col("content"), 256).alias("sha2x")
    )
    return (
        files.join(recomputed, "file_id")
        .filter(F.col("sha") != F.col("sha2x"))
        .count()
    )
