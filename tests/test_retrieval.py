"""Unit tests for BM25 lexical retrieval (operators/retrieval.py).
Hand-built corpora replayed by an exact Python oracle (same scaled-int64
contribution scheme); the DuckDB value-exact check runs separately via
tools/compare_oracle.py."""

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.operators import bm25_scores, bm25_topk

K1, B, SCALE = 1.2, 0.75, 10_000

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, "quantum field theory for the impatient"),
    (5, "the the the the the the the the"),  # tf saturation / long-ish doc
    (6, ""),  # empty text -> single '' term, dl=1
    (7, "cat"),  # one-word doc
]
QUERIES = [
    (100, "the cat"),
    (200, "dogs and cats"),
    (300, "zzz qqq"),  # matches nothing
]


def _py_bm25(corpus, queries):
    """Exact replay: per-(doc,term) contribution rounded to scaled int64,
    integer per-pair sums — the operator's documented float tree."""
    docs = {i: t.split(" ") for i, t in corpus}
    n = float(len(docs))
    dls = {i: len(ws) for i, ws in docs.items()}
    avgdl = float(sum(dls.values())) / n
    out = {}
    for qid, qtext in queries:
        for term in sorted(set(qtext.split(" "))):
            df = sum(1 for ws in docs.values() if term in ws)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for i, ws in docs.items():
                tf = ws.count(term)
                if tf == 0:
                    continue
                tfn = (tf * (K1 + 1.0)) / (
                    tf + K1 * ((1.0 - B) + B * dls[i] / avgdl)
                )
                c = int(round(SCALE * (idf * tfn)))
                key = (qid, i)
                nt, s = out.get(key, (0, 0))
                out[key] = (nt + 1, s + c)
    return out


def _dfs(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    return docs, qs


def test_scores_match_python_replay(spark):
    docs, qs = _dfs(spark)
    got = {
        (r["q_id"], r["doc_id"]): (r["n_terms"], r["score_int"])
        for r in bm25_scores(
            docs, "doc_id", "text", qs, "q_id", "q_text"
        ).collect()
    }
    assert got == _py_bm25(CORPUS, QUERIES)


def test_score_is_scaled_int_division(spark):
    docs, qs = _dfs(spark)
    for r in bm25_scores(docs, "doc_id", "text", qs, "q_id", "q_text").collect():
        assert r["score"] == r["score_int"] / SCALE


def test_no_match_query_emits_nothing(spark):
    docs, qs = _dfs(spark)
    res = bm25_topk(docs, "doc_id", "text", qs, "q_id", "q_text", k=5)
    assert res.filter(F.col("q_id") == 300).count() == 0


def test_topk_rank_and_bound(spark):
    docs, qs = _dfs(spark)
    rows = bm25_topk(
        docs, "doc_id", "text", qs, "q_id", "q_text", k=3
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    expected = _py_bm25(CORPUS, QUERIES)
    for qid, rs in per_q.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        # rank order replays the deterministic (score_int DESC, id ASC) sort
        want = sorted(
            ((s, i) for (q, i), (_, s) in expected.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[: len(rs)]
        assert [(r["score_int"], r["doc_id"]) for r in rs] == want


def test_score_ties_rank_by_doc_id(spark):
    # two byte-identical docs -> identical scores -> lower id ranks first
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (2, "alpha beta"), (5, "gamma")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(1, "alpha")], "q_id long, q_text string")
    rows = (
        bm25_topk(docs, "doc_id", "text", qs, "q_id", "q_text", k=5)
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in rows] == [2, 10]
    assert rows[0]["score_int"] == rows[1]["score_int"]


def test_repartition_invariance(spark):
    docs, qs = _dfs(spark)
    base = sorted(
        map(tuple, bm25_topk(docs, "doc_id", "text", qs, "q_id", "q_text").collect())
    )
    for n in (1, 7):
        again = sorted(
            map(
                tuple,
                bm25_topk(
                    docs.repartition(n), "doc_id", "text",
                    qs.repartition(2), "q_id", "q_text",
                ).collect(),
            )
        )
        assert again == base


def test_provided_stats_skip_scan_and_match(spark):
    docs, qs = _dfs(spark)
    n = len(CORPUS)
    tw = sum(len(t.split(" ")) for _, t in CORPUS)
    a = sorted(map(tuple, bm25_scores(
        docs, "doc_id", "text", qs, "q_id", "q_text"
    ).collect()))
    b = sorted(map(tuple, bm25_scores(
        docs, "doc_id", "text", qs, "q_id", "q_text",
        n_docs=n, total_words=tw,
    ).collect()))
    assert a == b


def test_self_retrieval_ranks_self_first(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in CORPUS if t], "doc_id long, text string"
    )
    qs = docs.select(
        F.col("doc_id").alias("q_id"), F.col("text").alias("q_text")
    )
    top1 = (
        bm25_topk(docs, "doc_id", "text", qs, "q_id", "q_text", k=1)
        .select("q_id", "doc_id")
        .collect()
    )
    assert all(r["q_id"] == r["doc_id"] for r in top1)


def test_empty_corpus_raises(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "x")], "q_id long, q_text string")
    with pytest.raises(ValueError):
        bm25_scores(docs, "doc_id", "text", qs, "q_id", "q_text")


def test_bm25_max_df_prunes_stopwords(spark):
    """max_df drops high-df terms from scoring: a doc whose only shared
    term is the stopword vanishes, surviving pairs equal the Python
    oracle run on a df-restricted term set, and max_df_frac resolves to
    the same absolute bound."""
    docs = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    qs = spark.createDataFrame(QUERIES, "q_id INT, q_text STRING")
    # 'the' has df=4 (docs 1,2,4,5); every other term df <= 2
    full = {
        (r["q_id"], r["doc_id"]): (r["n_terms"], r["score_int"])
        for r in bm25_scores(
            docs, "doc_id", "text", qs, "q_id", "q_text", max_df=3
        ).collect()
    }
    # query 100 = "the cat": docs 2/4/5 matched ONLY via 'the' -> gone
    assert (100, 5) not in full and (100, 2) not in full
    assert (100, 4) not in full
    assert {k for k in full if k[0] == 100} == {(100, 1), (100, 7)}
    # surviving pairs replay exactly with 'the' removed from scoring
    pruned_corpus = [(i, " ".join(w for w in t.split(" ") if w != "the"))
                     for i, t in CORPUS]
    # keep dl/avgdl of the ORIGINAL corpus: pruning only drops the term's
    # contributions, not the document-length statistics
    exp = {}
    docs_ws = {i: t.split(" ") for i, t in CORPUS}
    n = float(len(docs_ws))
    dls = {i: len(ws) for i, ws in docs_ws.items()}
    avgdl = float(sum(dls.values())) / n
    for qid, qtext in QUERIES:
        for term in sorted(set(qtext.split(" "))):
            if term == "the":
                continue
            df = sum(1 for ws in docs_ws.values() if term in ws)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for i, ws in docs_ws.items():
                tf = ws.count(term)
                if tf == 0:
                    continue
                tfn = (tf * (K1 + 1.0)) / (
                    tf + K1 * ((1.0 - B) + B * dls[i] / avgdl)
                )
                c = int(round(SCALE * (idf * tfn)))
                nt, s = exp.get((qid, i), (0, 0))
                exp[(qid, i)] = (nt + 1, s + c)
    assert full == exp
    # frac form: floor(0.5 * 7 docs) = 3 -> identical output
    frac = {
        (r["q_id"], r["doc_id"]): (r["n_terms"], r["score_int"])
        for r in bm25_scores(
            docs, "doc_id", "text", qs, "q_id", "q_text", max_df_frac=0.5
        ).collect()
    }
    assert frac == full
    with pytest.raises(ValueError, match="not both"):
        bm25_scores(docs, "doc_id", "text", qs, "q_id", "q_text",
                    max_df=3, max_df_frac=0.5)


def test_bm25_hard_negatives_excludes_positives_and_renumbers(spark):
    from geofeaturegeneration_spark.operators import (
        bm25_hard_negatives,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark engine joins data"),
            (2, "spark engine joins data fast"),
            (3, "spark data shuffles"),
            (4, "gardening tips for spring"),
            (5, "engine data spark joins"),
        ],
        "doc_id BIGINT, text STRING",
    )
    qs = docs.filter("doc_id = 1").select(
        F.col("doc_id").alias("q_id"), F.col("text").alias("q_text")
    )
    pos = qs.select("q_id", F.col("q_id").alias("doc_id"))
    top = bm25_topk(docs, "doc_id", "text", qs, "q_id", "q_text", k=10)
    neg = bm25_hard_negatives(
        docs, "doc_id", "text", qs, "q_id", "q_text", pos, k=10
    )
    t = {(r["doc_id"], r["rank"]) for r in top.collect()}
    n = [(r["doc_id"], r["rank"]) for r in neg.orderBy("rank").collect()]
    # the positive (doc 1, the query itself) was top's #1 and is gone
    assert (1, 1) in t
    assert all(d != 1 for d, _ in n)
    # ranks are dense 1..k over the survivors, same relative order as top
    assert [r for _, r in n] == list(range(1, len(n) + 1))
    surv = [d for d, _ in sorted(t, key=lambda x: x[1]) if d != 1]
    assert [d for d, _ in n] == surv
