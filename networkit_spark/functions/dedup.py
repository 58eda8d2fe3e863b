"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Hash-parity design: every hash is derived from ``md5`` (available and
bit-identical in Spark and DuckDB), truncated to 15 hex chars → a
non-negative int60 — so the DuckDB oracles reproduce the Spark results
exactly. ``xxhash64`` would be faster but has no DuckDB twin; at cluster
scale swap ``_h`` for xxhash64 (one line) since the oracle only matters in
this sandbox.

Scale shapes:
  - exact dedup: one hash aggregation, map-side combined.
  - MinHash LSH: explode distinct tokens (shuffle ~corpus token count),
    k minhashes in one aggregation, band keys → self-join only within
    band buckets (the candidate-pair join never touches non-colliding
    docs). Classic shingle→minhash→band→bucket-join.
  - SimHash: explode tokens, per-bit popcount signs in one aggregation.
  - n-gram Jaccard verification: token-set join on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.functions.text import tokens


def _h(col, salt: int):
    """Deterministic int60 hash of a string column (md5-based; DuckDB
    twin: CAST(('0x' || substring(md5(salt || ':' || x), 1, 15)) AS BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(sha, n_docs, keep_id): one row per duplicate-group (n_docs >= 2);
    keep_id = smallest doc id of the group (the canonical survivor)."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("sha"))
        .groupBy("sha")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def word_shingles(col, n: int = 2):
    """Word n-gram shingles (array<string>): consecutive n tokens joined
    by a single space. n=1 degenerates to plain tokens. Shingling is what
    makes minhash discriminative on small-vocabulary corpora — unigram
    sets over a tiny vocabulary are near-identical across documents."""
    toks = tokens(col)
    if n == 1:
        return toks
    sz = F.size(toks)
    # slice length clamped at 0: when() does not short-circuit evaluation
    ln = F.greatest(sz - (n - 1), F.lit(0))
    out = F.slice(toks, 1, ln)
    for j in range(1, n):
        out = F.zip_with(out, F.slice(toks, 1 + j, ln),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(sz >= n, out).otherwise(F.array().cast("array<string>"))


def doc_tokens(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", distinct: bool = True,
               shingle: int = 1) -> DataFrame:
    """(id, tok) exploded token table; distinct per doc by default (set
    semantics for minhash/jaccard); ``shingle=n`` emits word n-grams."""
    t = docs.select(F.col(id_col).alias("id"),
                    F.explode(word_shingles(text_col, shingle)).alias("tok"))
    return t.distinct() if distinct else t


def minhashes(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
              text_col: str = "text", shingle: int = 1) -> DataFrame:
    """(id, mh0..mh{k-1}): k MinHash signatures over the distinct-shingle
    set — one explode + one aggregation computing all k mins."""
    dt = doc_tokens(docs, id_col, text_col, shingle=shingle)
    aggs = [F.min(_h(F.col("tok"), i)).alias(f"mh{i}") for i in range(k)]
    return dt.groupBy("id").agg(*aggs)


def _band_rows(docs: DataFrame, k: int, bands: int, id_col: str,
               text_col: str, shingle: int) -> DataFrame:
    """(id, band) LSH band-key membership rows (bands · n_docs rows)."""
    assert k % bands == 0
    r = k // bands
    mh = minhashes(docs, k, id_col, text_col, shingle=shingle)
    band_rows = None
    for bidx in range(bands):
        key = F.concat_ws(
            "_", F.lit(bidx), *[F.col(f"mh{bidx * r + j}").cast("string")
                                for j in range(r)]
        )
        rows = mh.select("id", key.alias("band"))
        band_rows = rows if band_rows is None else band_rows.unionByName(rows)
    return band_rows


def lsh_hot_buckets(docs: DataFrame, k: int = 8, bands: int = 4,
                    id_col: str = "doc_id", text_col: str = "text",
                    shingle: int = 1, max_bucket: int = 4096) -> DataFrame:
    """(band, bsz): the band buckets a guarded :func:`lsh_candidate_pairs`
    call with the same ``max_bucket`` excludes — the drop set surfaced as
    data (run it when you want the drop accounted for, instead of paying
    an eager stats job inside every candidate-pair call)."""
    return (_band_rows(docs, k, bands, id_col, text_col, shingle)
            .groupBy("band").agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > max_bucket))


def lsh_candidate_pairs(docs: DataFrame, k: int = 8, bands: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle: int = 1,
                        max_bucket: int | None = None) -> DataFrame:
    """(a, b) candidate near-duplicate pairs (a < b): docs sharing at least
    one LSH band (band = r = k/bands consecutive minhashes).

    Hot-bucket guard (opt-in): a band bucket holding B near-identical
    documents (mass-duplicated boilerplate, license headers — the first
    real-corpus failure mode) emits B² candidate pairs. With
    ``max_bucket=N`` set, buckets larger than N are excluded from the
    self-join. The guard is a plan-level semi-join against the
    small-bucket set — no extra Spark job (the band-table exchange is
    shared via ReuseExchange), no eager stats collect. The excluded set
    is surfaced as DATA by :func:`lsh_hot_buckets` (same ``max_bucket``),
    not a silent cap: members of a dropped bucket are exact-or-near-exact
    duplicates by construction; collapse them with
    :func:`exact_duplicates` (one hash agg) instead of enumerating the
    quadratic pair set. Default ``None`` keeps exact LSH semantics."""
    band_rows = _band_rows(docs, k, bands, id_col, text_col, shingle)
    if max_bucket is not None:
        cold = (band_rows.groupBy("band")
                .agg(F.count(F.lit(1)).alias("bsz"))
                .filter(F.col("bsz") <= max_bucket))
        band_rows = band_rows.join(cold.select("band"), "band", "left_semi")
    a = band_rows.alias("x")
    b = band_rows.alias("y")
    return (
        a.join(b, (F.col("x.band") == F.col("y.band"))
               & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, pairs: DataFrame | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  threshold: float = 0.0, shingle: int = 1) -> DataFrame:
    """(a, b, jaccard): exact token-set Jaccard; if ``pairs`` given, verify
    only those candidates (the LSH fast path), else all co-token pairs.

    Scale shape of the candidate path: the token table is FIRST restricted
    to documents that appear in ``pairs`` (semi-joins), then the
    intersection is computed per candidate pair — ``pairs ⋈ tokens(a)``
    joined to ``tokens(b)`` on (b, tok) — so the cost is
    Σ_{(a,b)∈pairs} |tokens(a)|, linear in the candidate set. The naive
    order (all-pairs co-token self-join, filter to candidates after) is
    Σ_tok df(tok)² and explodes on any common token at corpus scale.
    """
    dt = doc_tokens(docs, id_col, text_col, shingle=shingle)
    if pairs is not None:
        cand_ids = pairs.select(F.col("a").alias("id")).union(
            pairs.select(F.col("b").alias("id"))).distinct()
        dt = dt.join(cand_ids, "id", "left_semi")
        sizes = dt.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            pairs.join(dt.select(F.col("id").alias("a"), "tok"), "a")
            .join(dt.select(F.col("id").alias("b"), "tok"), ["b", "tok"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sizes = dt.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        x = dt.alias("x")
        y = dt.alias("y")
        inter = (
            x.join(y, (F.col("x.tok") == F.col("y.tok"))
                   & (F.col("x.id") < F.col("y.id")))
            .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .select(
            "a", "b",
            (F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
             ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def char_ngrams(col, n: int = 3):
    """Character n-gram shingles of the raw text (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: c.substr(i, F.lit(n)),
    )
    # sequence(1, x) counts DOWN for x < 1 — guard short strings
    return F.when(F.length(c) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        pairs: DataFrame | None = None) -> DataFrame:
    """(a, b, jaccard) over distinct character n-gram shingles — the
    n-gram variant of near-dup detection. With ``pairs``, verification is
    candidate-restricted (same linear-cost shape as :func:`jaccard_pairs`)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(char_ngrams(text_col, n))).alias("tok"),
    )
    if pairs is not None:
        cand_ids = pairs.select(F.col("a").alias("id")).union(
            pairs.select(F.col("b").alias("id"))).distinct()
        sh = sh.join(cand_ids, "id", "left_semi")
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        inter = (
            pairs.join(sh.select(F.col("id").alias("a"), "tok"), "a")
            .join(sh.select(F.col("id").alias("b"), "tok"), ["b", "tok"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        x, y = sh.alias("x"), sh.alias("y")
        inter = (
            x.join(y, (F.col("x.tok") == F.col("y.tok"))
                   & (F.col("x.id") < F.col("y.id")))
            .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .select("a", "b",
                (F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
                 ).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 16, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, simhash): per-bit majority vote over token hashes — documents
    with small Hamming distance are near-duplicates. Token multiset
    (occurrences weight the vote)."""
    dt = doc_tokens(docs, id_col, text_col, distinct=False)
    h = _h(F.col("tok"), 999)
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = dt.groupBy("id").agg(*votes)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select("id", sig.cast("long").alias("simhash"))
