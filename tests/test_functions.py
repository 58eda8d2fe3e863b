"""Text / dedup / similarity / multimodal pipeline tests with Python
oracles."""

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from networkit_spark.functions.dedup import (
    exact_duplicates, jaccard_pairs, lsh_candidate_pairs, minhashes,
    ngram_jaccard_pairs, simhash,
)
from networkit_spark.functions.multimodal import (
    decode, extract_features, sample_frames, text_as_fake_media,
)
from networkit_spark.functions.similarity import (
    assign_cells, cosine_topk, ivf_topk, lsh_bucket_pairs,
)
from networkit_spark.functions.text import (
    bpe_ish_token_count, fingerprint, language_id, quality_columns, token_count,
)

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat on the mat", "en"),          # exact dup of 0
    (2, "the cat sat on the red mat", "en"),      # near dup of 0
    (3, "der hund ist nicht hier und der ball", "de"),
    (4, "le chat est dans les maisons et le jardin", "fr"),
    (5, "completely unrelated words about spark engines", "en"),
    (6, "", "und"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, l) for i, t, l in DOCS], "doc_id long, text string, lang string"
    ).cache()


def test_token_counts(spark, docs):
    rows = {r["doc_id"]: r["n"] for r in
            docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert rows[0] == 6 and rows[6] == 0 and rows[3] == 8


def test_bpe_ish_token_count(spark, docs):
    row = docs.filter("doc_id = 0").select(
        bpe_ish_token_count("text").alias("n")).collect()[0]
    assert row["n"] == 6
    one = spark.createDataFrame([("it's a test-case 42x",)], "text string")
    got = one.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # it | ' | s | a | test | - | case | 42 | x
    assert got == 9


def test_quality_columns(docs):
    q = quality_columns("text")
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id", *[v.alias(k) for k, v in q.items()]).collect()}
    assert out[0]["n_tokens"] == 6
    assert out[0]["stop_ratio"] == pytest.approx(2 / 6)
    assert out[6]["quality"] == pytest.approx(0.1)  # empty: only punct bonus
    assert 0.0 <= out[5]["quality"] <= 1.0


def test_language_id(docs):
    got = {r["doc_id"]: r["l"] for r in
           docs.select("doc_id", language_id("text").alias("l")).collect()}
    assert got[0] == "en" and got[3] == "de" and got[4] == "fr"
    assert got[5] == "und" or got[5] == "en"  # 'about' not in list; no stopwords -> und
    assert got[6] == "und"


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(0, "Hello,  World!"), (1, "hello world"), (2, "HELLO ... world  ")],
        "doc_id long, text string",
    )
    fps = [r["f"] for r in d.select(fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]
    want = hashlib.md5(b"hello world").hexdigest()
    assert fps[0] == want


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_id"] == 0


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(docs, k=8, bands=4).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup should band-collide
    verified = jaccard_pairs(docs, pairs=lsh_candidate_pairs(docs, k=8, bands=4))
    j = {(r["a"], r["b"]): r["jaccard"] for r in verified.collect()}
    assert j[(0, 1)] == 1.0
    # doc0 tokens {the,cat,sat,on,mat}=5, doc2 adds {red}: 5/6
    if (0, 2) in j:
        assert j[(0, 2)] == pytest.approx(5 / 6)


def test_ngram_jaccard(docs):
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert out[(0, 1)] == 1.0
    assert (0, 2) in out and out[(0, 2)] > 0.6


def test_simhash_near_dups_close(docs):
    sh = {r["id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    assert sh[0] == sh[1]
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[5]).count("1")
    assert ham_near < ham_far


def _np_cosine(a, b):
    a, b = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(40):
        label = i % 4
        center = np.zeros(8)
        center[label * 2] = 3.0
        v = (center + rng.normal(0, 0.5, 8)).astype(np.float32)
        rows.append((i, [float(x) for x in v], label))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache(), rows


def test_cosine_topk_matches_numpy(emb):
    df, rows = emb
    queries = df.filter("vec_id < 3")
    got = cosine_topk(df, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["neighbor_id"], r["cos"]))
    vecs = {i: v for i, v, _ in rows}
    for q in range(3):
        sims = sorted(
            ((-_np_cosine(vecs[q], vecs[j]), j) for j in vecs if j != q)
        )[:5]
        want = [j for _, j in sims]
        got_ids = [nid for _, nid, _ in sorted(by_q[q])]
        assert got_ids == want
        for rnk, nid, cos in by_q[q]:
            assert cos == pytest.approx(_np_cosine(vecs[q], vecs[nid]), abs=1e-6)


def test_ivf_topk_same_label_only(emb):
    df, rows = emb
    queries = df.filter("vec_id < 4")
    got = ivf_topk(df, queries, k=3).collect()
    labels = {i: l for i, _, l in rows}
    for r in got:
        assert labels[r["query_id"]] == labels[r["neighbor_id"]]
        assert r["query_id"] != r["neighbor_id"]


def test_lsh_cells_deterministic_and_similar_collide(emb):
    df, rows = emb
    c1 = {r["id"]: r["cell"] for r in assign_cells(df, planes=4).collect()}
    c2 = {r["id"]: r["cell"] for r in assign_cells(df, planes=4).collect()}
    assert c1 == c2
    pairs = lsh_bucket_pairs(df, planes=4).count()
    assert pairs > 0


def test_multimodal_plumbing(docs):
    media = text_as_fake_media(docs.filter("doc_id < 3"))
    feats = {r["media_id"]: r["features"]
             for r in extract_features(media, fake=True).collect()}
    assert len(feats) == 3 and all(len(v) == 8 for v in feats.values())
    # deterministic: first 8 utf-8 bytes of "the cat sat..." / 255
    want = [b / 255.0 for b in b"the cat "]
    assert feats[0] == pytest.approx(want, abs=1e-6)
    assert feats[0] == feats[1]  # identical text -> identical features


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode(b"\x89PNG", "image", fake=False)


def test_frame_sampling(spark):
    media = spark.createDataFrame(
        [(1, "video", bytearray(b"x"), (0, 0, 0, 3500)),
         (2, "image", bytearray(b"y"), (0, 0, 0, 0))],
        "media_id long, kind string, data binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
    )
    rows = sample_frames(media, every_ms=1000).collect()
    assert {(r["media_id"], r["frame_idx"]) for r in rows} == {(1, 0), (1, 1), (1, 2)}


def test_lsh_hot_bucket_guard(spark):
    from networkit_spark.functions.dedup import (
        lsh_candidate_pairs, lsh_hot_buckets)

    # 30 identical docs (one hot bucket) + 2 distinct near-dups
    rows = [(i, "same boilerplate license header text") for i in range(30)]
    rows += [(100, "a unique document about graph engines"),
             (101, "a unique document about graph engine")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_candidate_pairs(docs, k=8, bands=4, max_bucket=8)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # the 30-doc boilerplate bucket (435 pairs) is dropped; the small
    # near-dup pair survives
    assert all(a >= 100 for a, b in got)
    # the drop set is surfaced as data (not a silent cap)
    hot = lsh_hot_buckets(docs, k=8, bands=4, max_bucket=8).collect()
    assert len(hot) >= 1 and all(r["bsz"] == 30 for r in hot)
    # default (no guard): the quadratic pair set comes back
    alln = lsh_candidate_pairs(docs, k=8, bands=4).count()
    assert alln >= 435
    # the guard adds zero extra Spark jobs: it is a single lazy plan —
    # the band-table exchange is reused, the sizes agg folds into the join
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_ann_recall_floor(emb):
    from networkit_spark.functions.similarity import recall_at_k

    df, rows = emb
    queries = df.filter("vec_id < 8")
    exact = cosine_topk(df, queries, k=5)
    approx = ivf_topk(df, queries, k=5)
    r = recall_at_k(approx, exact, 5)
    # clustered fixture: the label cells capture most true neighbors —
    # regression floor for the IVF path
    assert r >= 0.8


def test_trained_ivf_beats_hash_cells(emb):
    from networkit_spark.functions.similarity import (
        ivf_topk_trained, recall_at_k, train_centroids)

    df, rows = emb
    queries = df.filter("vec_id < 8")
    exact = cosine_topk(df, queries, k=5)
    cents = train_centroids(df, n_cells=4, iters=4)
    assert len(cents) == 4 and len(cents[0]) == 8
    ap1 = ivf_topk_trained(df, queries, cents, k=5, nprobe=1)
    r1 = recall_at_k(ap1, exact, 5)
    # the fixture has 4 genuine clusters: Lloyd recovers them and
    # single-probe recall is near-exact — regression floor
    assert r1 >= 0.9
    # multi-probe is monotone in nprobe
    ap2 = ivf_topk_trained(df, queries, cents, k=5, nprobe=2)
    assert recall_at_k(ap2, exact, 5) >= r1
