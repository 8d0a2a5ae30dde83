"""BPE tokenizer: train/encode/decode vs an independent Sennrich-style
reference implementation (regex-on-joined-symbols trainer, rank-order
apply encoder — different mechanisms, provably same semantics), plus
determinism, unknown-char, cap, and round-trip properties. Pytest-only by
the documented convention (iterative driver-side trainer, no
SQL-expressible twin — the CLAUDE.md exception list)."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geofeaturegeneration_spark.operators import (
    bpe_decode,
    bpe_encode,
    train_bpe,
)

EOW = "▁"


def _ref_train(word_counts, n_merges, eow=EOW):
    """Sennrich et al. 2016 reference trainer: space-joined symbol strings
    + regex merge (the paper's formulation, not the tuple one)."""
    vocab = {" ".join(list(w) + [eow]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for word, c in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        if stats[best] < 2:
            break
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(" ".join(best)) + r"(?!\S)"
        )
        vocab = {pat.sub("".join(best), w): c for w, c in vocab.items()}
    return merges


def _ref_encode_word(w, merges, eow=EOW):
    """Rank-order apply (each merge applied to all occurrences in turn):
    equivalent to the operator's lowest-rank-first search because a merge
    can only create adjacencies of strictly later rank."""
    if w == "":
        return []
    syms = list(w) + [eow]
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_ids(word_counts, merges, eow=EOW):
    """Id layout: base alphabet (over the counted words + eow) sorted ->
    1..A, merge rank r -> A + 1 + r; 0 reserved for unknown."""
    alphabet = sorted({c for w in word_counts for c in w} | {eow})
    tok2id = {s: i + 1 for i, s in enumerate(alphabet)}
    for r, (l, rgt) in enumerate(merges):
        tok2id[l + rgt] = len(alphabet) + 1 + r
    return tok2id


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "ab cd ab cd"),  # tie: (a,b) and (c,d) equal counts -> lexicographic
]


def _word_counts(rows):
    c = Counter()
    for _, text in rows:
        c.update(text.split(" "))
    return dict(c)


def test_train_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=12)
    got_merges = [
        (r["left"], r["right"])
        for r in art.filter(F.col("rank").isNotNull())
        .orderBy("rank")
        .collect()
    ]
    want_merges = _ref_train(_word_counts(CORPUS), 12)
    assert got_merges == want_merges
    # id layout: alphabet sorted from 1, merges appended in rank order
    want_ids = _ref_ids(_word_counts(CORPUS), want_merges)
    got_ids = {r["token"]: r["token_id"] for r in art.collect()}
    assert got_ids == want_ids


def test_train_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    a = sorted(map(tuple, train_bpe(df, "text", n_merges=8).collect()))
    b = sorted(
        map(tuple, train_bpe(df.repartition(7), "text", n_merges=8).collect())
    )
    assert a == b


def test_encode_matches_reference_and_shapes(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=12)
    merges = _ref_train(_word_counts(CORPUS), 12)
    tok2id = _ref_ids(_word_counts(CORPUS), merges)

    enc = bpe_encode(df, "doc_id", "text", art)
    got = {r["doc_id"]: (r["tokens"], r["n_tok"]) for r in enc.collect()}
    for doc_id, text in CORPUS:
        want = [
            tok2id[s]
            for w in text.split(" ")
            for s in _ref_encode_word(w, merges)
        ]
        assert got[doc_id][0] == want, doc_id
        assert got[doc_id][1] == len(want)


def test_encode_repartition_invariant(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=6)
    a = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(df, "doc_id", "text", art).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["tokens"]))
        for r in bpe_encode(
            df.repartition(5), "doc_id", "text", art
        ).collect()
    )
    assert a == b


def test_roundtrip_decode(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=12)
    enc = bpe_encode(df, "doc_id", "text", art)
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe_decode(enc, "doc_id", "tokens", art).collect()
    }
    for doc_id, text in CORPUS:
        assert dec[doc_id] == text, doc_id


def test_unknown_chars_get_reserved_zero(spark):
    train = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(train, "text", n_merges=6)
    probe = spark.createDataFrame(
        [(9, "low qz low")], "doc_id INT, text STRING"
    )
    row = bpe_encode(probe, "doc_id", "text", art).collect()[0]
    # q and z were never in the training alphabet -> two unknown ids
    assert row["tokens"].count(0) == 2
    # decode drops unknowns but keeps the known words
    dec = bpe_decode(
        bpe_encode(probe, "doc_id", "text", art), "doc_id", "tokens", art
    ).collect()[0]["text"]
    assert dec == "low  low"  # unknown word decodes to its bare eow space


def test_empty_text_keeps_row(spark):
    df = spark.createDataFrame(
        [(1, "low low"), (2, "")], "doc_id INT, text STRING"
    )
    art = train_bpe(df, "text", n_merges=4)
    got = {
        r["doc_id"]: (r["tokens"], r["n_tok"])
        for r in bpe_encode(df, "doc_id", "text", art).collect()
    }
    assert got[2] == ([], 0)
    assert got[1][1] > 0


def test_max_word_types_cap(spark):
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=8, max_word_types=2)
    got = [
        (r["left"], r["right"])
        for r in art.filter(F.col("rank").isNotNull()).orderBy("rank").collect()
    ]
    counts = _word_counts(CORPUS)
    top2 = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    )
    assert got == _ref_train(top2, 8)


def test_null_text_keeps_row_and_null_tokens_decode_empty(spark):
    """Review finding: NULL text must behave like empty text (the doc
    stays, tokens = []), and decode of a NULL array must not crash."""
    df = spark.createDataFrame(
        [(1, "low low"), (2, None)], "doc_id INT, text STRING"
    )
    art = train_bpe(df, "text", n_merges=4)
    enc = bpe_encode(df, "doc_id", "text", art)
    got = {r["doc_id"]: (r["tokens"], r["n_tok"]) for r in enc.collect()}
    assert got[2] == ([], 0)
    null_toks = spark.createDataFrame(
        [(1, None)], "doc_id INT, tokens ARRAY<INT>"
    )
    dec = bpe_decode(null_toks, "doc_id", "tokens", art).collect()[0]
    assert dec["text"] == ""


def test_join_twin_equals_default(spark):
    """bpe_encode (zero-shuffle mapInArrow) and bpe_encode_join (word
    table + join re-assembly) are exactness twins."""
    from geofeaturegeneration_spark.operators import bpe_encode_join

    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=10)
    a = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"])
        for r in bpe_encode(df, "doc_id", "text", art).collect()
    )
    b = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"])
        for r in bpe_encode_join(df, "doc_id", "text", art).collect()
    )
    assert a == b


def test_null_huge_and_duplicate_ids_survive_both_encodes(spark):
    """Review findings: (a) NULL ids and ids beyond float64's 2^53
    integer range must pass through the encode exactly (the id column
    rides the Arrow batch, never pandas/numpy); (b) duplicate ids must
    stay one output row per INPUT row in both the default and the join
    twin (the twin re-assembles on a hidden per-row uid, not id_col)."""
    from geofeaturegeneration_spark.operators import bpe_encode_join

    huge = (1 << 53) + 1  # not representable in float64
    rows = [
        (None, "low low"),
        (huge, "newest"),
        (7, "low lower"),
        (7, "widest widest"),  # duplicate id, distinct doc
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    art = train_bpe(df, "text", n_merges=8)

    def key(r):
        return (-1 if r["doc_id"] is None else r["doc_id"],
                tuple(r["tokens"]), r["n_tok"])

    a = sorted(map(key, bpe_encode(df, "doc_id", "text", art).collect()))
    b = sorted(
        map(key, bpe_encode_join(df, "doc_id", "text", art).collect())
    )
    assert a == b
    ids = [r[0] for r in a]
    assert ids.count(-1) == 1 and huge in ids and ids.count(7) == 2
    # the two doc_id=7 rows must encode their OWN documents, not an
    # interleaved merge of both
    merges = [
        (r["left"], r["right"])
        for r in art.filter(F.col("rank").isNotNull()).orderBy("rank").collect()
    ]
    tok2id = {r["token"]: r["token_id"] for r in art.collect()}
    want7 = sorted(
        tuple(
            tok2id[s]
            for w in text.split(" ")
            for s in _ref_encode_word(w, merges)
        )
        for i, text in rows
        if i == 7
    )
    got7 = sorted(r[1] for r in a if r[0] == 7)
    assert got7 == want7


def test_decode_tolerates_null_and_foreign_token_elements(spark):
    """NULL elements inside a tokens array (legal under the default
    ARRAY<INT> schema) and out-of-vocabulary / negative ids must all
    decode to '' — not crash the Arrow batch."""
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=6)
    low_ids = bpe_encode(
        spark.createDataFrame([(1, "low")], "doc_id INT, text STRING"),
        "doc_id", "text", art,
    ).collect()[0]["tokens"]
    probe = spark.createDataFrame(
        [(1, low_ids + [None, 99999, -3] + low_ids)],
        "doc_id INT, tokens ARRAY<INT>",
    )
    got = bpe_decode(probe, "doc_id", "tokens", art).collect()[0]["text"]
    # the junk ids decode to '' and carry no end-of-word marker, so they
    # vanish entirely (unlike an unknown WORD, which keeps its eow space)
    assert got == "low low"


def test_encode_plan_has_no_key_shuffle(spark):
    """The default encode is a pure map: no Exchange hashpartitioning
    anywhere in the plan (the only allowed Exchange is the round-robin
    parallelism floor)."""
    df = spark.createDataFrame(CORPUS, "doc_id INT, text STRING")
    art = train_bpe(df, "text", n_merges=4)
    plan = bpe_encode(df, "doc_id", "text", art)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "Join" not in plan
