"""Unit tests for corpus-curation operators: test-set decontamination,
per-source mixing quotas, rare-token corpus-frequency stats. Hand-built
corpora with known answers; the DuckDB value-exact check runs separately
via tools/compare_oracle.py."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.operators import (
    decontaminate,
    rare_token_stats,
    source_quota,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon", "web"),
        (2, "alpha beta gamma zeta eta", "web"),          # shares "alpha beta gamma"
        (3, "one two three four five six", "web"),
        (4, "totally unrelated words here now", "books"),
        (5, "one two", "books"),                          # shorter than shingle k
        (6, "seven eight nine one two three", "books"),   # shares "one two three"
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        (100, "alpha beta gamma"),        # 3-gram hits docs 1 and 2
        (101, "four five six seven"),     # hits doc 3 twice? no: '4 5 6' once
    ]
    return spark.createDataFrame(rows, "bid INT, btext STRING")


def test_decontaminate_exact_counts(spark, docs, bench):
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(
            docs, "doc_id", "text", bench, "bid", "btext", k=3
        ).collect()
    }
    assert len(out) == 6  # one row per input doc, hit or not
    # doc 3 shingles: "one two three","two three four","three four five",
    # "four five six"; bench 101 shingles: "four five six","five six seven"
    assert out[1] == (1, True)   # "alpha beta gamma"
    assert out[2] == (1, True)
    assert out[3] == (1, True)   # only "four five six"
    assert out[4] == (0, False)
    assert out[5] == (0, False)  # no shingles at all
    assert out[6] == (0, False)  # shares "one two three" with DOC 3 only —
    # cross-doc overlap is dedup's job, not decontamination's


def test_decontaminate_min_hits_threshold(spark, docs, bench):
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(
            docs, "doc_id", "text", bench, "bid", "btext", k=3, min_hits=2
        ).collect()
    }
    assert all(not c for c in out.values())  # nobody reaches 2 hits


def _mix_hash(doc_id: int, salt: str = "mix") -> int:
    h = hashlib.md5(f"{doc_id}#{salt}".encode()).hexdigest()
    return int(h[:15], 16)


def test_source_quota_keeps_smallest_hashes(spark, docs):
    out = source_quota(docs, "doc_id", quota=2, by="source").collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append((r["mix_rank"], r["doc_id"]))
    # web has docs 1,2,3 -> keep the 2 with smallest md5(id#mix)
    web_ids = sorted([1, 2, 3], key=lambda i: (_mix_hash(i), i))[:2]
    assert sorted(i for _, i in by_source["web"]) == sorted(web_ids)
    # books has 3 docs too
    book_ids = sorted([4, 5, 6], key=lambda i: (_mix_hash(i), i))[:2]
    assert sorted(i for _, i in by_source["books"]) == sorted(book_ids)
    # ranks are 1..quota and follow hash order
    for src, pairs in by_source.items():
        assert sorted(r for r, _ in pairs) == [1, 2]


def test_source_quota_prefilter_same_result(spark, docs):
    """The hash prefilter must select the identical rows (it cuts on the
    same hash the rank orders by, with margin)."""
    base = {
        (r["source"], r["doc_id"]): r["mix_rank"]
        for r in source_quota(docs, "doc_id", quota=2, by="source").collect()
    }
    pre = {
        (r["source"], r["doc_id"]): r["mix_rank"]
        for r in source_quota(
            docs, "doc_id", quota=2, by="source", prefilter=4
        ).collect()
    }
    assert base == pre


def test_source_quota_prefilter_tiny_group_no_overflow(spark, docs):
    """A group with far fewer rows than prefilter*quota must not throw
    CAST_OVERFLOW under ANSI mode: the cut ratio (2^60/n * prefilter*quota)
    exceeds 2^63 as a double and must be clamped BEFORE the long cast. The
    fixture sources hold 3 docs each while prefilter*quota = 200."""
    out = source_quota(
        docs, "doc_id", quota=50, by="source", prefilter=4
    ).collect()
    assert len(out) == 6  # quota above group size keeps everything


def test_source_quota_columns_preserved(spark, docs):
    out = source_quota(docs, "doc_id", quota=10, by="source")
    assert set(out.columns) == {"doc_id", "text", "source", "mix_rank"}
    assert out.count() == 6  # quota above group size keeps everything


def test_rare_token_stats_exact(spark):
    rows = [
        (1, "a a b"),      # a:x3 total? corpus: a appears 4x, b 2x, c 1x
        (2, "a b c"),
        (3, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_rare"], r["rare_frac"])
        for r in rare_token_stats(df, "doc_id", "text", rare_below=2).collect()
    }
    # corpus counts: a=4 (not rare), b=2 (rare), c=1 (rare)
    assert out[1] == (3, 1, 1 / 3)
    assert out[2] == (3, 2, 2 / 3)
    assert out[3] == (1, 0, 0.0)


def test_rare_token_stats_broadcast_off_same_values(spark):
    rows = [(1, "x y z"), (2, "x x q")]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    a = sorted(
        rare_token_stats(df, "doc_id", "text", rare_below=1).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        rare_token_stats(
            df, "doc_id", "text", rare_below=1, broadcast_counts=False
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_decontaminate_plan_broadcasts_bench(spark, docs, bench):
    """The benchmark shingle set must be the BROADCAST side — a shuffle
    join here would shuffle the whole corpus on the shingle key."""
    plan = decontaminate(
        docs, "doc_id", "text", bench, "bid", "btext"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_source_sample_rates_and_monotonicity(spark):
    """The ppm draw must hit ~the requested rate, be a pure function of
    doc_id (stable), and be MONOTONE under rate increases: the kept set
    at a lower ppm is a subset of the kept set at a higher ppm — the
    property that lets a mixing recipe be retuned without churning
    already-selected data."""
    from geofeaturegeneration_spark.operators import source_sample

    rows = [(i, f"doc {i}", "web" if i % 2 else "books") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")

    half = source_sample(df, "doc_id", {"web": 500_000}, default_ppm=0)
    kept_half = {r["doc_id"] for r in half.collect()}
    # only web docs survive; rate within a loose binomial band of 50%
    assert all(i % 2 for i in kept_half)
    assert 350 <= len(kept_half) <= 650

    more = source_sample(df, "doc_id", {"web": 800_000}, default_ppm=0)
    kept_more = {r["doc_id"] for r in more.collect()}
    assert kept_half <= kept_more  # monotone growth

    # deterministic across calls
    again = {r["doc_id"] for r in
             source_sample(df, "doc_id", {"web": 500_000}).collect()}
    assert again == kept_half

    # default_ppm admits unlisted groups at the default rate
    both = source_sample(df, "doc_id", {"web": 500_000}, default_ppm=1_000_000)
    assert {r["doc_id"] for r in both.collect()} >= {
        i for i in range(2000) if not i % 2
    }  # every books doc kept at 100%


def test_pii_scrub_patterns_and_counts(spark):
    """Each pattern redacts to its typed token; counts are per-pattern on
    the RAW text; patterns apply in order (email first, so its digits never
    leak into the number detectors)."""
    from geofeaturegeneration_spark.operators import pii_scrub

    rows = [
        (1, "mail bob.smith+x@corp.example.org today"),
        (2, "ssn 123-45-6789 and phone 415-555-0123"),
        (3, "host 192.168.0.1 card 4111111111111111"),
        (4, "no pii here at all"),
        (5, "digits 1234567890123 inside text"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(df, "doc_id", "text").collect()}
    assert out[1]["clean"] == "mail <EMAIL> today"
    assert out[1]["n_email"] == 1 and out[1]["pii_total"] == 1
    assert out[2]["clean"] == "ssn <SSN> and phone <PHONE>"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["clean"] == "host <IP> card <NUM>"
    assert out[3]["n_ip"] == 1 and out[3]["n_num"] == 1
    assert out[4]["clean"] == "no pii here at all" and out[4]["pii_total"] == 0
    assert out[5]["clean"] == "digits <NUM> inside text"


def test_pii_scrub_order_email_before_numbers(spark):
    """An all-digit email local part must redact as ONE <EMAIL>, not leave
    a partially-eaten number; the raw-text counters still see both."""
    from geofeaturegeneration_spark.operators import pii_scrub

    df = spark.createDataFrame(
        [(1, "x 1234567890123@mail.example.com y")], "doc_id INT, text STRING"
    )
    r = pii_scrub(df, "doc_id", "text").collect()[0]
    assert r["clean"] == "x <EMAIL> y"
    assert r["n_email"] == 1
    assert r["n_num"] == 1  # raw-text detector fires too — documented


def test_line_dedup_global_first_occurrence(spark):
    """A line duplicated across docs survives only at the smallest
    (doc_id, line_no); within-doc repeats dedup too; empty-line handling
    and doc reassembly preserve order."""
    from geofeaturegeneration_spark.operators import line_dedup

    rows = [
        (1, "keep me\nboilerplate footer\nunique one"),
        (2, "boilerplate footer\nunique two"),
        (3, "repeat\nrepeat\nunique three"),
        (4, "boilerplate footer"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r.asDict() for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["clean"] == "keep me\nboilerplate footer\nunique one"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["clean"] == "unique two"  # footer lost to doc 1
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["clean"] == "repeat\nunique three"  # within-doc dedup
    assert out[4]["clean"] == "" and out[4]["n_kept"] == 0  # fully emptied

    dropped = line_dedup(df, "doc_id", "text", keep_empty_docs=False)
    assert {r["doc_id"] for r in dropped.collect()} == {1, 2, 3}


def test_line_dedup_empty_lines_exempt(spark):
    """Blank separator lines are exempt from corpus-wide dedup (min_len=1
    default): every doc keeps its paragraph structure, instead of all blank
    lines except the globally-first one vanishing. min_len=0 restores the
    exemption-free rule; min_len above a short line's length dedups it."""
    from geofeaturegeneration_spark.operators import line_dedup

    rows = [
        (1, "para one\n\npara two"),
        (2, "other one\n\nother two"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r.asDict() for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["clean"] == "para one\n\npara two"
    assert out[2]["clean"] == "other one\n\nother two"  # blank line survives
    assert out[1]["n_kept"] == 3 and out[2]["n_kept"] == 3

    strict = {
        r["doc_id"]: r.asDict()
        for r in line_dedup(df, "doc_id", "text", min_len=0).collect()
    }
    assert strict[1]["clean"] == "para one\n\npara two"
    assert strict[2]["clean"] == "other one\nother two"  # blank lost to doc 1

    # raising min_len exempts short lines too: 'hi' (len 2) < 3 kept twice
    rows2 = [(1, "hi\nlong shared line"), (2, "hi\nlong shared line")]
    df2 = spark.createDataFrame(rows2, "doc_id INT, text STRING")
    ml = {
        r["doc_id"]: r.asDict()
        for r in line_dedup(df2, "doc_id", "text", min_len=3).collect()
    }
    assert ml[1]["clean"] == "hi\nlong shared line"
    assert ml[2]["clean"] == "hi"  # shared long line deduped, short exempt


def test_line_dedup_no_window_on_line_hash(spark):
    """Scale guard: the winner per line hash must come from a partial-agg
    groupBy (map-side combine shrinks hot boilerplate lines), never a
    window sort over the exploded line stream."""
    from geofeaturegeneration_spark.operators import line_dedup

    df = spark.createDataFrame([(1, "a\nb")], "doc_id INT, text STRING")
    plan = line_dedup(df, "doc_id", "text")._jdf.queryExecution().toString()
    assert "Window" not in plan
    assert "partial_min" in plan or "partial" in plan.lower()


def test_clean_lines_each_rule(spark):
    """Every C4 line rule fires on exactly the line built to trip it, and
    the survivors reassemble in original order."""
    from geofeaturegeneration_spark.operators import clean_lines

    text = "\n".join(
        [
            "this first line has enough words.",   # kept
            "too short.",                           # < 5 words
            "this line has no terminal punctuation at all",  # no terminal
            "please enable JavaScript to view this page.",   # banned word (ci)
            'he said "five words are quite enough."',        # kept (quote terminal)
            "is this a real question here?",        # kept (?)
            "trailing spaces still count fine.   ",  # kept (rtrim before check)
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    row = clean_lines(df, "doc_id", "text").collect()[0]
    assert row.n_lines == 7
    assert row.n_kept == 4
    assert row.clean.split("\n") == [
        "this first line has enough words.",
        'he said "five words are quite enough."',
        "is this a real question here?",
        "trailing spaces still count fine.   ",
    ]
    assert row.keep  # 4 kept lines >= 3, no page-level hit


def test_clean_lines_page_verdict(spark):
    """The page-level verdict fires on lorem ipsum (case-insensitive), on
    a curly brace, and on fewer than min_kept_lines survivors — each
    independently of the per-line survivors."""
    from geofeaturegeneration_spark.operators import clean_lines

    good = "one two three four five.\nsix seven eight nine ten.\na b c d e."
    rows = [
        (1, good),                                        # keep
        (2, good + "\nWe use LOREM IPSUM filler text."),  # lorem -> drop
        (3, good + "\nvar x = { a: 1 } in source code."), # brace -> drop
        (4, "one two three four five."),                  # 1 kept < 3 -> drop
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in clean_lines(df, "doc_id", "text").collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_kept == 4  # the lorem line ALSO passes line rules
    assert not out[3].keep
    assert not out[4].keep and out[4].n_kept == 1


def test_clean_lines_no_terminal_rule(spark):
    """terminal_chars='' skips the punctuation rule (verse/chat corpora)."""
    from geofeaturegeneration_spark.operators import clean_lines

    df = spark.createDataFrame(
        [(1, "five words but no punctuation\nshort one")],
        "doc_id INT, text STRING",
    )
    row = clean_lines(df, "doc_id", "text", terminal_chars="").collect()[0]
    assert row.n_kept == 1
    assert row.clean == "five words but no punctuation"


def test_clean_lines_zero_shuffle(spark):
    """The whole transform is two narrow projections — no Exchange in the
    plan at any corpus size (contrast line_dedup's two shuffles)."""
    from geofeaturegeneration_spark.operators import clean_lines

    df = spark.createDataFrame([(1, "a b c d e.")], "doc_id INT, text STRING")
    plan = clean_lines(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_filter_each_rule_and_keep(spark):
    """Every rule fires on a doc crafted to trip exactly it (plus any
    logically-entangled ones); a clean doc keeps."""
    from geofeaturegeneration_spark.operators import quality_filter

    rows = [
        (1, "solid sentence with interesting varied wording across topics"),
        (2, "too tiny"),
        (3, " ".join(f"w{i}" for i in range(40))),        # too_long at max=20
        (4, "aaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbb"),  # avg len ~22
        (5, "!!! ??? ### $$$ %%% word"),                   # punct heavy
        (6, "the the the of of of a a a and and and"),     # stopword stuffed
        (7, "spam spam spam spam spam spam spam ham"),     # repetitive
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {
        r["doc_id"]: r.asDict()
        for r in quality_filter(
            df, "doc_id", "text",
            min_words=3, max_words=20,
            min_avg_word_len=2.0, max_avg_word_len=12.0,
            max_punct_ratio=0.3, max_stopword_ratio=0.6,
            max_dup_word_fraction=0.5,
        ).collect()
    }
    assert out[1]["keep"] and not any(
        out[1][f] for f in ["too_short", "too_long", "bad_word_len",
                            "too_punct", "stop_stuffed", "repetitive"]
    )
    assert out[2]["too_short"] and not out[2]["keep"]
    assert out[3]["too_long"] and not out[3]["keep"]
    assert out[4]["bad_word_len"] and not out[4]["keep"]
    assert out[5]["too_punct"] and not out[5]["keep"]
    assert out[6]["stop_stuffed"] and not out[6]["keep"]
    assert out[7]["repetitive"] and not out[7]["keep"]
    assert out[7]["n_words"] == 8


# ------------------------------------------------------- temperature mixing


def test_temperature_rates_alpha_one_is_uniform_rate(spark, docs):
    from geofeaturegeneration_spark.operators import temperature_rates

    # alpha=1 keeps natural proportions: every group's keep-rate equals
    # target_frac exactly (q_s = n_s/N so rate = f*N*(n_s/N)/n_s = f)
    rates = temperature_rates(docs, by="source", alpha=1.0, target_frac=0.5)
    assert rates == {"web": 500_000, "books": 500_000}


def test_temperature_rates_alpha_zero_equalizes_mass(spark):
    from geofeaturegeneration_spark.operators import temperature_rates

    rows = [(i, "big" if i < 8 else "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    # alpha=0: each of the 2 groups gets f*N/G = 0.4*10/2 = 2 expected rows
    # -> big (n=8) rate 2/8 = 0.25, small (n=2) rate 2/2 = 1.0
    rates = temperature_rates(df, by="source", alpha=0.0, target_frac=0.4)
    assert rates == {"big": 250_000, "small": 1_000_000}


def test_temperature_rates_clamped_at_one(spark):
    from geofeaturegeneration_spark.operators import temperature_rates

    rows = [(i, "big" if i < 9 else "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    # alpha=0, f=0.9: per-group mass 4.5 rows; small (n=1) clamps at 1.0
    rates = temperature_rates(df, by="source", alpha=0.0, target_frac=0.9)
    assert rates["small"] == 1_000_000
    assert rates["big"] == 500_000  # 4.5/9


def test_temperature_rates_token_weighted(spark):
    from geofeaturegeneration_spark.operators import temperature_rates

    # two sources with equal DOC counts but 9:1 token mass — doc-count
    # rates can't tell them apart; token-weighted rates must
    rows = [(i, "long" if i < 5 else "short", 900 if i < 5 else 100)
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, n_tok INT")
    # alpha=1 on weights: rate = f everywhere (natural token proportions)
    assert temperature_rates(
        df, by="source", alpha=1.0, target_frac=0.5, weight_col="n_tok"
    ) == {"long": 500_000, "short": 500_000}
    # alpha=0 on weights: each group gets f*T/G = 0.4*5000/2 = 1000 tokens
    # -> long (4500 tok) rate 1000/4500, short (500 tok) rate 1.0 (clamped
    # from 2.0)
    rates = temperature_rates(
        df, by="source", alpha=0.0, target_frac=0.4, weight_col="n_tok"
    )
    assert rates == {"long": int(1e6 * 1000 / 4500), "short": 1_000_000}


def test_temperature_mix_token_weighted_expected_total(spark):
    from geofeaturegeneration_spark.functions.text import n_words
    from geofeaturegeneration_spark.operators import temperature_mix

    # docs of wildly varying length across 4 sources: expected KEPT TOKENS
    # = target_frac * total tokens (the weight cancels in the rate), even
    # though doc lengths vary within each group
    rows = [(i, f"s{i % 4}", " ".join(["w"] * (1 + (i * 7) % 50)))
            for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")
    df = df.withColumn("n_tok", n_words(F.col("text")))
    total = df.agg(F.sum("n_tok")).collect()[0][0]
    kept = (
        temperature_mix(df, "doc_id", alpha=0.5, target_frac=0.5,
                        weight_col="n_tok")
        .agg(F.sum("n_tok")).collect()[0][0]
    )
    assert abs(kept - 0.5 * total) < 0.12 * total


def test_temperature_mix_is_monotone_in_target(spark):
    from geofeaturegeneration_spark.operators import temperature_mix

    rows = [(i, f"s{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    small = {r["doc_id"] for r in
             temperature_mix(df, "doc_id", alpha=0.5, target_frac=0.25).collect()}
    big = {r["doc_id"] for r in
           temperature_mix(df, "doc_id", alpha=0.5, target_frac=0.5).collect()}
    assert small <= big               # raising the target only ADDS rows
    assert 0 < len(small) < len(big) < 400

def test_clean_lines_space_padded_junk_rejected(spark):
    """Review finding: split(' ') keeps empty segments, so a space-padded
    2-word line must NOT satisfy min_words — only non-empty segments
    count."""
    from geofeaturegeneration_spark.operators import clean_lines

    good = "one two three four five.\nsix seven eight nine ten.\na b c d e."
    df = spark.createDataFrame(
        [(1, good + "\nbuy now.   "), (2, good + "\n  buy  now  deal. ")],
        "doc_id INT, text STRING",
    )
    out = {r.doc_id: r for r in clean_lines(df, "doc_id", "text").collect()}
    assert out[1].n_kept == 3  # 'buy now.   ' = 2 real words -> cut
    assert out[2].n_kept == 3  # '  buy  now  deal. ' = 3 real words -> cut
    assert "buy" not in out[1].clean and "buy" not in out[2].clean


def test_clean_lines_metachar_separator_is_literal(spark):
    """Review finding: sep must split LITERALLY (the oracle's string_split
    semantics), not as a Java regex — '|' previously exploded every
    character."""
    from geofeaturegeneration_spark.operators import clean_lines

    text = "one two three four five.|too short.|six seven eight nine ten."
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")
    row = clean_lines(
        df, "doc_id", "text", sep="|", min_kept_lines=2
    ).collect()[0]
    assert row.n_lines == 3
    assert row.n_kept == 2
    assert row.clean == "one two three four five.|six seven eight nine ten."
    assert row.keep


def test_line_dedup_metachar_separator_is_literal(spark):
    """line_dedup shares the literal-separator rule."""
    from geofeaturegeneration_spark.operators import line_dedup

    df = spark.createDataFrame(
        [(1, "shared line here|unique one"), (2, "shared line here|unique two")],
        "doc_id INT, text STRING",
    )
    out = {
        r.doc_id: r.clean
        for r in line_dedup(df, "doc_id", "text", sep="|").collect()
    }
    assert out[1] == "shared line here|unique one"
    assert out[2] == "unique two"


def test_normalize_text_each_rule(spark):
    """One input per rule: CRLF/CR -> LF, C0-control strip, NFC
    composition (combining accent + the U+212B singleton), tab/space-run
    collapse, line-edge space trim, document-edge trim."""
    from geofeaturegeneration_spark.operators import normalize_text

    rows = [
        (1, "a\r\nb\rc"),                    # CRLF and lone CR
        (2, "a\x01b\x7fc"),                  # C0 control + DEL stripped
        (3, "Café Å"),            # NFD accent + ANGSTROM singleton
        (4, "a  \t b\t\tc"),                 # runs -> single space
        (5, "a  \nb \n  c"),                 # spaces touching LF removed
        (6, "  \n a b \n\n "),               # edges trimmed
        (7, "already clean"),                # unchanged
        (8, None),                           # NULL stays NULL
        (9, "\ufeffa\u0085b\u200bc"),   # BOM, C1 NEL, ZWSP stripped
        (10, "a\u200d\u200cb"),            # ZWJ/ZWNJ deliberately KEPT
    ]
    out = {
        r.doc_id: r
        for r in normalize_text(
            spark.createDataFrame(rows, "doc_id INT, text STRING"), "doc_id", "text"
        ).collect()
    }
    assert (out[1].norm, out[1].changed) == ("a\nb\nc", True)
    assert (out[2].norm, out[2].changed) == ("abc", True)
    assert (out[3].norm, out[3].changed) == ("Caf\u00e9 \u00c5", True)
    assert (out[4].norm, out[4].changed) == ("a b c", True)
    assert (out[5].norm, out[5].changed) == ("a\nb\nc", True)
    assert (out[6].norm, out[6].changed) == ("a b", True)
    assert (out[7].norm, out[7].changed) == ("already clean", False)
    assert out[8].norm is None and out[8].changed is False
    assert (out[9].norm, out[9].changed) == ("abc", True)
    assert (out[10].norm, out[10].changed) == ("a\u200d\u200cb", False)


def test_normalize_text_nfkc_compatibility(spark):
    """form='NFKC' additionally folds compatibility forms: fullwidth
    letters -> ASCII and NBSP -> space (which then joins the collapse)."""
    from geofeaturegeneration_spark.operators import normalize_text

    df = spark.createDataFrame(
        [(1, "ＡＢ a  b")], "doc_id INT, text STRING"
    )
    row = normalize_text(df, "doc_id", "text", form="NFKC").collect()[0]
    assert row.norm == "AB a b"
    assert row.changed


def test_normalize_text_idempotent(spark):
    """normalize(normalize(x)) == normalize(x): the output byte form is a
    fixed point, so re-running the stage in a resumed pipeline is safe."""
    from geofeaturegeneration_spark.operators import normalize_text

    rows = [
        (1, "  Café Å \r\n mixed\t\tws \x01 here  \n\n"),
        (2, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    once = normalize_text(df, "doc_id", "text")
    twice = normalize_text(
        once.select("doc_id", F.col("norm").alias("text")), "doc_id", "text"
    )
    for r in twice.join(
        once.select("doc_id", F.col("norm").alias("expect")), "doc_id"
    ).collect():
        assert r.norm == r.expect
        assert r.changed is False


def test_normalize_text_passthrough_columns(spark):
    """passthrough columns ride the Arrow batches untouched and come back
    in order — the row-preserving contract jobs/run_dedup.py --normalize
    relies on to skip the doc_id re-attach join; reserved names raise."""
    import pytest

    from geofeaturegeneration_spark.operators import normalize_text

    df = spark.createDataFrame(
        [(1, "a\r\nb", "web", 7), (2, None, "book", None)],
        "doc_id INT, text STRING, source STRING, n INT",
    )
    out = normalize_text(
        df, "doc_id", "text", passthrough=("source", "n")
    )
    assert out.columns == ["doc_id", "norm", "changed", "source", "n"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].norm == "a\nb" and rows[1].source == "web" and rows[1].n == 7
    assert rows[2].norm is None and rows[2].source == "book" and rows[2].n is None
    # zero-shuffle still holds with passthrough (same assertion shape as
    # test_normalize_text_zero_shuffle)
    wide = normalize_text(
        df.repartition(8), "doc_id", "text", passthrough=("source",)
    )
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    with pytest.raises(ValueError, match="collide"):
        normalize_text(df, "doc_id", "text", passthrough=("norm",))


def test_normalize_text_zero_shuffle(spark):
    """Scan-speed canonicalization: two narrow regex projections around
    one mapInArrow stage — no Exchange beyond the explicit parallelism
    floor (a no-op here: the input is pre-widened past the session's
    shuffle parallelism, as any real scan would be)."""
    from geofeaturegeneration_spark.operators import normalize_text

    df = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(16)], "doc_id INT, text STRING"
    ).repartition(8)
    out = normalize_text(df, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the .repartition(8) input exchange is part of the fixture, not the
    # operator: assert the operator added none (exactly one Exchange total)
    assert plan.count("Exchange") == 1 and "ArrowEvalPython" not in plan


def test_epoch_upsample_counts_monotone_identity(spark):
    """Copy counts equal the documented formula, are monotone under rate
    increases (old epochs are a stable prefix), default rate is the
    identity with epoch=1, and rate 0 drops the group."""
    import pytest

    from geofeaturegeneration_spark.functions.text import md5_long
    from geofeaturegeneration_spark.operators import epoch_upsample

    rows = [(i, "hot" if i % 2 == 0 else "cold") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")

    def run(rates):
        got = {}
        for r in epoch_upsample(df, "doc_id", rates).collect():
            got.setdefault((r["doc_id"], r["source"]), []).append(r["epoch"])
        return {k: sorted(v) for k, v in got.items()}

    a = run({"hot": 2_300_000, "cold": 0})
    # cold dropped entirely
    assert all(src == "hot" for _, src in a)
    # formula: 2 copies + a third iff md5(id#epoch) % 1e6 < 300000
    hs = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            (md5_long(F.concat(F.col("doc_id").cast("string"),
                               F.lit("#epoch"))) % 1_000_000).alias("h"),
        ).collect()
    }
    for (i, _), epochs in a.items():
        want = 2 + (1 if hs[i] < 300_000 else 0)
        assert epochs == list(range(1, want + 1)), (i, epochs)
    assert any(len(v) == 3 for v in a.values())  # the draw fires sometimes
    assert any(len(v) == 2 for v in a.values())  # ... and not always
    # monotone: raising hot to 3.1 epochs keeps every (doc, epoch) of a
    b = run({"hot": 3_100_000, "cold": 0})
    for k, epochs in a.items():
        assert set(epochs) <= set(b[k]), (k, epochs, b[k])
    # default_ppm: unlisted groups get exactly one copy, epoch 1
    c = run({"hot": 2_000_000})
    assert all(v == [1] for (i, s), v in c.items() if s == "cold")
    assert all(v == [1, 2] for (i, s), v in c.items() if s == "hot")
    # out-of-range rates raise
    with pytest.raises(ValueError, match="out of range"):
        epoch_upsample(df, "doc_id", {"hot": -1})


def test_epoch_upsample_partitioning_invariant(spark):
    """Pure per-row draw: identical output under any input partitioning."""
    from geofeaturegeneration_spark.operators import epoch_upsample

    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    rates = {"src0": 1_500_000, "src1": 400_000, "src2": 2_000_000}
    a = sorted(
        (r["doc_id"], r["source"], r["epoch"])
        for r in epoch_upsample(df, "doc_id", rates).collect()
    )
    b = sorted(
        (r["doc_id"], r["source"], r["epoch"])
        for r in epoch_upsample(df.repartition(11), "doc_id", rates).collect()
    )
    assert a == b and len(a) > 60


def test_line_dedup_per_doc_scope(spark):
    """per_doc=True: within-doc repeats keep their first occurrence,
    cross-doc copies survive in EVERY doc (unlike the corpus rule), and
    the short-line exemption still applies."""
    from geofeaturegeneration_spark.operators import line_dedup

    df = spark.createDataFrame(
        [
            (1, "nav menu\nalpha beta\nnav menu\n\ngamma"),
            (2, "nav menu\ndelta\n\ndelta\nnav menu"),
        ],
        "doc_id INT, text STRING",
    )
    got = {
        r["doc_id"]: (r["clean"], r["n_lines"], r["n_kept"])
        for r in line_dedup(df, "doc_id", "text", per_doc=True).collect()
    }
    # doc 1: second 'nav menu' drops; blank line exempt
    assert got[1] == ("nav menu\nalpha beta\n\ngamma", 5, 4)
    # doc 2 keeps ITS OWN 'nav menu' (corpus rule would drop it) and
    # drops its internal 'delta' repeat and trailing 'nav menu'
    assert got[2] == ("nav menu\ndelta\n", 5, 3)
    # corpus rule for contrast: doc 2 loses 'nav menu' entirely
    corpus = {
        r["doc_id"]: r["clean"]
        for r in line_dedup(df, "doc_id", "text").collect()
    }
    assert "nav menu" not in corpus[2]
