"""Sequence export: pad/reshape parity vs oracle and the BASELINE.json
per-row invariant — token arrays byte-equal to source through the full
chunk → reassemble round trip."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geofeaturegeneration_spark.datagen import generate_sequences, generate_sequences_pdf
from geofeaturegeneration_spark.operators.sequence import (
    chunk_sequences,
    ordered_tokens,
    pad_to_multiple,
    reassemble_chunks,
)
from tests import oracle


@pytest.fixture(scope="module")
def seqs(spark):
    return generate_sequences(spark, n_docs=40, max_len=130, seed=11), generate_sequences_pdf(
        n_docs=40, max_len=130, seed=11
    )


def test_datagen_deterministic():
    a = generate_sequences_pdf(n_docs=10, seed=5)
    b = generate_sequences_pdf(n_docs=10, seed=5)
    assert all(list(x) == list(y) for x, y in zip(a["tokens"], b["tokens"]))


def test_n_tok_invariant(seqs):
    df, _ = seqs
    bad = df.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_pad_matches_oracle(seqs, spark):
    df, pdf = seqs
    got = (
        df.withColumn("padded", pad_to_multiple(F.col("tokens"), 100))
        .select("doc_id", "padded")
        .toPandas()
        .set_index("doc_id")
    )
    for _, r in pdf.iterrows():
        exp = oracle.pad_reshape(r["tokens"], 100).reshape(-1)
        np.testing.assert_array_equal(
            np.asarray(got.loc[r["doc_id"], "padded"], dtype=np.int32), exp
        )


def test_chunk_shapes(seqs):
    df, pdf = seqs
    got = chunk_sequences(df, "tokens", 100).toPandas()
    assert (got["chunk"].map(len) == 100).all()
    for doc_id, g in got.groupby("doc_id"):
        n = int(pdf.loc[pdf["doc_id"] == doc_id, "n_tok"].iloc[0])
        exp_chunks = oracle.pad_reshape(
            pdf.loc[pdf["doc_id"] == doc_id, "tokens"].iloc[0], 100
        )
        assert len(g) == exp_chunks.shape[0]
        g = g.sort_values("chunk_idx")
        np.testing.assert_array_equal(
            np.stack(g["chunk"].map(lambda c: np.asarray(c, dtype=np.int32))), exp_chunks
        )


def test_roundtrip_byte_equality(seqs):
    """chunk → reassemble must reproduce the source token arrays exactly
    (BASELINE.json per-row invariant)."""
    df, pdf = seqs
    chunked = chunk_sequences(df, "tokens", 100)
    back = reassemble_chunks(
        chunked, ["doc_id", "source"], n_col="n_tok", out_col="tokens2"
    )
    joined = df.join(back, ["doc_id", "source"]).select("doc_id", "tokens", "tokens2")
    mismatches = joined.filter(F.col("tokens") != F.col("tokens2")).count()
    assert mismatches == 0
    assert joined.count() == df.count()
    # byte-level check through Arrow on a sample
    sample = joined.limit(10).toPandas()
    for _, r in sample.iterrows():
        a = np.asarray(r["tokens"], dtype=np.int32)
        b = np.asarray(r["tokens2"], dtype=np.int32)
        assert a.tobytes() == b.tobytes()


def test_ordered_tokens(spark):
    pdf = pd.DataFrame(
        {
            "uid": ["u1"] * 5 + ["u2"] * 3,
            "pos": [4, 2, 0, 1, 3, 2, 0, 1],
            "tok": [14, 12, 10, 11, 13, 22, 20, 21],
        }
    )
    got = (
        ordered_tokens(spark.createDataFrame(pdf).repartition(4), ["uid"], "pos", "tok")
        .toPandas()
        .set_index("uid")
    )
    assert list(got.loc["u1", "tokens"]) == [10, 11, 12, 13, 14]
    assert list(got.loc["u2", "tokens"]) == [20, 21, 22]


def test_ordered_tokens_fast_path_matches_struct_path(spark):
    """The packed-long fast path (int order, int token) must be
    row-identical to the struct sort — including tie-break on duplicate
    order values carrying NEGATIVE tokens (the offset-encoding property)
    and negative order values. The struct path is forced by widening the
    order column to bigint (which also exercises the overflow-safe
    fallback the fast path refuses)."""
    rng = np.random.default_rng(5)
    n = 3000
    pdf = pd.DataFrame(
        {
            "uid": rng.integers(0, 40, n),
            # heavy duplication so ties are common; include negatives
            "pos": rng.integers(-50, 50, n).astype("int32"),
            "tok": rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype("int32"),
        }
    )
    df = spark.createDataFrame(pdf)
    df = df.withColumn("pos", F.col("pos").cast("int")).withColumn(
        "tok", F.col("tok").cast("int")
    )
    fast = ordered_tokens(df, ["uid"], "pos", "tok")
    slow = ordered_tokens(
        df.withColumn("pos", F.col("pos").cast("bigint")), ["uid"], "pos", "tok"
    )
    f = {r["uid"]: r["tokens"] for r in fast.collect()}
    s = {r["uid"]: r["tokens"] for r in slow.collect()}
    assert f == s


def test_ordered_tokens_bigint_order_out_of_int32_range(spark):
    """Epoch-micros-sized order values (outside int32) must take the struct
    path and still order correctly — the old packed path silently discarded
    high bits (ADVICE round 1)."""
    base = 1_700_000_000_000_000  # epoch micros
    rows = [("a", base + 3, 30), ("a", base + 1, 10), ("a", base + 2, 20)]
    df = spark.createDataFrame(rows, "uid STRING, pos BIGINT, tok INT")
    out = {r["uid"]: r["tokens"] for r in ordered_tokens(df, ["uid"], "pos", "tok").collect()}
    assert out == {"a": [10, 20, 30]}


def test_ordered_tokens_null_rows_dropped_consistently(spark):
    """Null order/token rows are dropped identically by the packed and
    struct paths; an all-null entity emits no row."""
    rows = [
        ("a", 2, 20), ("a", None, 99), ("a", 1, 10), ("a", 3, None),
        ("b", None, 1),
    ]
    df = spark.createDataFrame(rows, "uid STRING, pos INT, tok INT")
    fast = {r["uid"]: r["tokens"] for r in ordered_tokens(df, ["uid"], "pos", "tok").collect()}
    slow = {
        r["uid"]: r["tokens"]
        for r in ordered_tokens(
            df.withColumn("pos", F.col("pos").cast("bigint")), ["uid"], "pos", "tok"
        ).collect()
    }
    assert fast == slow == {"a": [10, 20]}


def test_pack_sequences_conservation_and_padding(spark):
    """Packing conserves every token in deterministic hash order within each
    group, n_real is seq_len everywhere except at most one partial chunk per
    group, padding right-fills only that chunk, and the result is invariant
    under input repartitioning (parallelism independence)."""
    from geofeaturegeneration_spark.functions.text import md5_long
    from geofeaturegeneration_spark.operators import pack_sequences

    rows = [(i, [i * 100 + j for j in range(5 + i % 7)]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id INT, tokens ARRAY<INT>")
    L, G = 8, 3
    packed = pack_sequences(df, "doc_id", "tokens", L, n_groups=G).collect()

    # expected concatenation per group: docs ordered by (md5 hash, id)
    hashed = df.select(
        "doc_id", "tokens",
        md5_long(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))).alias("dh"),
    ).collect()
    streams = {}
    for r in sorted(hashed, key=lambda r: (r["dh"], r["doc_id"])):
        streams.setdefault(r["dh"] % G, []).extend(r["tokens"])

    for g, stream in streams.items():
        chunks = sorted(
            (r for r in packed if r["grp"] == g), key=lambda r: r["chunk_id"]
        )
        flat = [t for r in chunks for t in r["tokens"]]
        assert flat == stream, f"group {g} not conserved in order"
        assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
        assert all(r["n_real"] == L for r in chunks[:-1])
        assert 1 <= chunks[-1]["n_real"] <= L

    padded = {
        (r["grp"], r["chunk_id"]): r
        for r in pack_sequences(
            df, "doc_id", "tokens", L, n_groups=G, pad_value=0
        ).collect()
    }
    for r in padded.values():
        assert len(r["tokens"]) == L
        assert r["tokens"][r["n_real"]:] == [0] * (L - r["n_real"])

    again = {
        (r["grp"], r["chunk_id"]): r["tokens"]
        for r in pack_sequences(
            df.repartition(7), "doc_id", "tokens", L, n_groups=G
        ).collect()
    }
    assert again == {
        (r["grp"], r["chunk_id"]): r["tokens"] for r in packed
    }


def test_pack_sequences_window_is_over_docs_not_tokens(spark):
    """Scale shape: the running-offset Window must consume DOC rows (below
    the posexplode Generate in the plan), never the exploded token rows."""
    from geofeaturegeneration_spark.operators import pack_sequences

    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [4, 5])], "doc_id INT, tokens ARRAY<INT>"
    )
    plan = (
        pack_sequences(df, "doc_id", "tokens", 4, n_groups=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    gen = plan.index("Generate")
    win = plan.index("Window")
    assert win > gen, "Window must appear BELOW the Generate (doc rows)\n" + plan


def test_chunk_strided_matches_python_replay(spark):
    from geofeaturegeneration_spark.operators.sequence import chunk_sequences

    rows = [(1, list(range(10))), (2, list(range(3))), (3, []),
            (4, list(range(8)))]
    df = spark.createDataFrame(rows, "doc_id INT, tokens array<int>")
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk"]
        for r in chunk_sequences(df, "tokens", 8, stride=4).collect()
    }

    def replay(toks, seq_len=8, stride=4, pad=0):
        n = len(toks)
        import math
        nw = max(math.ceil((n - seq_len) / stride) + 1, 1)
        padded = toks + [pad] * ((nw - 1) * stride + seq_len - n)
        return {i: padded[i * stride: i * stride + seq_len] for i in range(nw)}

    want = {
        (d, i): c for d, toks in rows for i, c in replay(toks).items()
    }
    assert got == want
    # every original token appears in at least one window of its doc
    for d, toks in rows:
        seen = [t for (dd, _), c in got.items() if dd == d for t in c]
        for t in toks:
            assert t in seen


def test_chunk_strided_default_equals_disjoint(spark):
    from geofeaturegeneration_spark.operators.sequence import chunk_sequences

    df = spark.createDataFrame(
        [(1, list(range(20))), (2, [7])], "doc_id INT, tokens array<int>"
    )
    a = sorted(map(tuple, chunk_sequences(df, "tokens", 8).collect()))
    b = sorted(map(tuple, chunk_sequences(df, "tokens", 8, stride=8).collect()))
    assert a == b


def test_chunk_strided_validates_stride(spark):
    from geofeaturegeneration_spark.operators.sequence import chunk_sequences

    df = spark.createDataFrame([(1, [1, 2])], "doc_id INT, tokens array<int>")
    with pytest.raises(ValueError):
        chunk_sequences(df, "tokens", 8, stride=9)  # gaps would drop tokens
    with pytest.raises(ValueError):
        chunk_sequences(df, "tokens", 8, stride=0)


def test_pack_sequences_segments(spark):
    """with_segments: per-token segment ids are 0-based per chunk,
    increment exactly at doc boundaries, padding positions carry -1,
    n_docs counts contributing docs, and tokens equal the plain form."""
    from geofeaturegeneration_spark.operators import pack_sequences

    rows = [
        (1, list(range(100, 105))),   # 5 tokens
        (2, list(range(200, 207))),   # 7 tokens
        (3, list(range(300, 303))),   # 3 tokens
        (4, []),                      # empty doc: contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id INT, tokens ARRAY<INT>")
    kw = dict(seq_len=6, n_groups=1, pad_value=0)
    plain = {
        (r["grp"], r["chunk_id"]): (list(r["tokens"]), r["n_real"])
        for r in pack_sequences(df, "doc_id", "tokens", **kw).collect()
    }
    got = sorted(
        pack_sequences(
            df, "doc_id", "tokens", with_segments=True, **kw
        ).collect(),
        key=lambda r: (r["grp"], r["chunk_id"]),
    )
    # token stream identical to the plain form
    for r in got:
        assert (list(r["tokens"]), r["n_real"]) == plain[(r["grp"], r["chunk_id"])]
        assert len(r["segs"]) == len(r["tokens"]) == 6
    # 15 real tokens in one group -> chunks of 6/6/3(+3 pad)
    assert [r["n_real"] for r in got] == [6, 6, 3]
    all_toks = [t for r in got for t in r["tokens"]][:15]
    all_segs = [s for r in got for s in r["segs"]]
    # padding is masked with -1
    assert all_segs[15:] == [-1, -1, -1]
    # per chunk: segs start at 0 and increment exactly where the packed
    # token stream crosses a doc boundary (doc sizes 5/7/3 in SOME
    # deterministic hash order)
    import itertools

    sizes = {1: 5, 2: 7, 3: 3}
    # recover doc order from the token values (each doc's tokens are
    # distinctive centuries)
    order = [k for k, _ in itertools.groupby(all_toks, key=lambda t: t // 100)]
    assert sorted(order) == [1, 2, 3]
    # expected global doc index per position
    gidx = []
    for di, doc in enumerate(order):
        gidx.extend([di] * sizes[doc])
    for r, lo in zip(got, range(0, 15, 6)):
        real = r["segs"][: r["n_real"]]
        base = gidx[lo]
        assert real == [g - base for g in gidx[lo:lo + r["n_real"]]]
        assert r["n_docs"] == len(set(gidx[lo:lo + r["n_real"]]))
    # unpadded form: no pad positions, segs lengths == n_real
    raw = pack_sequences(
        df, "doc_id", "tokens", seq_len=6, n_groups=1, with_segments=True
    ).collect()
    assert all(len(r["segs"]) == r["n_real"] for r in raw)


# ---------------------------------------------------------------------------
# fim_transform / fim_restore
# ---------------------------------------------------------------------------

def _fim_input(spark, n=60):
    rows = [(i, list(range(i * 100, i * 100 + (i % 9)))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id BIGINT, tokens ARRAY<INT>")


def test_fim_roundtrip_and_passthrough(spark):
    from geofeaturegeneration_spark.operators.sequence import (
        fim_restore,
        fim_transform,
    )

    df = _fim_input(spark)
    out = fim_transform(
        df, "tokens", rate_ppm=500_000, prefix_tok=-1, suffix_tok=-2,
        middle_tok=-3,
    )
    back = fim_restore(out, "tokens_fim")
    assert back.filter(F.col("tokens_restored") != F.col("tokens")).count() == 0
    # both selected and unselected rows must actually occur
    sel = out.filter("is_fim = 1").count()
    assert 0 < sel < out.count()
    # unselected rows pass through byte-identical
    assert (
        out.filter("is_fim = 0")
        .filter(F.col("tokens_fim") != F.col("tokens"))
        .count()
        == 0
    )


def test_fim_psm_shape_and_conservation(spark):
    """Selected rows: exactly the three sentinels in P..S..M order, cut
    points honored, and the source tokens conserved as a multiset."""
    from geofeaturegeneration_spark.operators.sequence import fim_transform

    P, S, M = -1, -2, -3
    df = _fim_input(spark)
    rows = fim_transform(
        df, "tokens", rate_ppm=1_000_000, prefix_tok=P, suffix_tok=S,
        middle_tok=M,
    ).collect()
    assert all(r["is_fim"] == 1 for r in rows)
    for r in rows:
        t, f, lo, hi = r["tokens"], r["tokens_fim"], r["fim_lo"], r["fim_hi"]
        n = len(t)
        assert 0 <= lo <= hi <= n
        assert len(f) == n + 3
        # PSM order with the documented layout
        assert f[0] == P
        assert f[lo + 1] == S
        assert f[lo + 1 + (n - hi) + 1] == M
        assert f[1 : lo + 1] == t[:lo]                      # prefix
        assert f[lo + 2 : lo + 2 + n - hi] == t[hi:]        # suffix
        assert f[lo + 3 + n - hi :] == t[lo:hi]             # middle
        assert sorted(x for x in f if x >= 0) == sorted(t)


def test_fim_rate_monotone_and_partition_invariant(spark):
    from geofeaturegeneration_spark.operators.sequence import fim_transform

    df = _fim_input(spark, n=120)
    sel = {}
    for ppm in (200_000, 700_000):
        out = fim_transform(
            df, "tokens", rate_ppm=ppm, prefix_tok=-1, suffix_tok=-2,
            middle_tok=-3,
        )
        sel[ppm] = {r["doc_id"] for r in out.filter("is_fim = 1").collect()}
    assert sel[200_000] <= sel[700_000]  # raising the rate only ADDS docs

    base = fim_transform(
        df, "tokens", rate_ppm=700_000, prefix_tok=-1, suffix_tok=-2,
        middle_tok=-3,
    )
    rep = fim_transform(
        df.repartition(7, "doc_id"), "tokens", rate_ppm=700_000,
        prefix_tok=-1, suffix_tok=-2, middle_tok=-3,
    )
    a = {r["doc_id"]: r["tokens_fim"] for r in base.collect()}
    b = {r["doc_id"]: r["tokens_fim"] for r in rep.collect()}
    assert a == b


def test_fim_empty_doc(spark):
    from geofeaturegeneration_spark.operators.sequence import fim_transform

    df = spark.createDataFrame([(1, [])], "doc_id BIGINT, tokens ARRAY<INT>")
    r = fim_transform(
        df, "tokens", rate_ppm=1_000_000, prefix_tok=-1, suffix_tok=-2,
        middle_tok=-3,
    ).collect()[0]
    assert (r["fim_lo"], r["fim_hi"]) == (0, 0)
    assert r["tokens_fim"] == [-1, -2, -3]


def test_fim_null_tokens_pass_through(spark):
    """ADVICE r04 #4: a NULL tokens array must behave like an unselected
    row (is_fim = 0, output NULL pass-through), never a half-transformed
    row with NULL cut points corrupting the export column."""
    from geofeaturegeneration_spark.operators.sequence import (
        fim_restore,
        fim_transform,
    )

    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, None), (2, [])],
        "doc_id BIGINT, tokens ARRAY<INT>",
    )
    out = fim_transform(
        df, "tokens", rate_ppm=1_000_000, prefix_tok=-1, suffix_tok=-2,
        middle_tok=-3,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # at rate 1e6 every NON-NULL row is selected; the null row is not
    assert rows[0]["is_fim"] == 1 and rows[2]["is_fim"] == 1
    assert rows[1]["is_fim"] == 0
    assert rows[1]["tokens_fim"] is None
    assert rows[1]["fim_lo"] is None and rows[1]["fim_hi"] is None
    # restore still round-trips the whole frame (null passes through)
    back = {
        r["doc_id"]: r["tokens_restored"]
        for r in fim_restore(out, "tokens_fim").collect()
    }
    assert back == {0: [1, 2, 3, 4], 1: None, 2: []}
