"""Text-analysis column expressions.

The reference has no text path (its "documents" are GPS trajectories), but a
large-scale training-data pipeline needs these alongside the trajectory
operators: tokenization, stable 64-bit-ish content hashing, quality stats,
language-ID, and fingerprinting. Everything here is a pure Spark Column
expression (JVM-side, whole-stage codegen) — no Python executes per row.

Cross-engine determinism contract: the only hash primitive is
``md5`` (identical in every engine); ``md5_long`` takes the first 15 hex
chars (60 bits) so the value fits int64 in Spark, DuckDB, pandas alike.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and engine-portable (plain IN lists).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "los", "que", "de"),
    "zh": ("de", "le", "shi", "zai", "he"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish tokenizer regex: runs of letters, runs of digits, or any single
# non-space symbol. Portable across Spark/DuckDB/RE2-style engines.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def md5_long(c: Column) -> Column:
    """Stable 60-bit content hash as int64: first 15 hex chars of md5.

    Engine-portable: DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT`` yields
    the identical value (verified: md5('abc') -> 648541476951500027 in both).
    """
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def words(text: Column) -> Column:
    """Whitespace word split (single-space convention)."""
    return F.split(text, " ")


def n_words(text: Column) -> Column:
    return F.size(words(text))


def fingerprint_normalize(text: Column) -> Column:
    """lower + trim + collapse internal whitespace — the canonical form
    fed to exact-dup fingerprints. Distinct from (and much weaker than)
    ``operators.curation.normalize_text``, the corpus-rewrite operator
    that canonicalizes unicode byte forms (NFC) without case-folding;
    this one deliberately destroys case for fingerprint recall."""
    return F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")


def ascii_key(text: Column, max_len: int = 24, scan_chars: int | None = None) -> Column:
    """Cross-engine-exact fuzzy-match key: truncate the raw text to
    ``scan_chars`` (default ``4 * max_len``), strip every char outside
    ``[A-Za-z0-9 ]``, lowercase (now pure ASCII, so Java and utf8 casing
    agree byte-for-byte), collapse space runs, trim, truncate to
    ``max_len`` chars. The canonical form ``edit_join`` measures edit
    distance over — on its output, Spark ``levenshtein`` and DuckDB
    ``levenshtein`` count the same char edits (char == byte == codepoint),
    so the fuzzy join is oracle-replayable on hostile unicode input.

    The raw-text truncation is part of the canonical form (the oracle
    mirrors it with the same ``substr``): deriving a 24-char key must
    never regex a 10 KB document — measured on 100k long docs the
    unbounded form spent 13 s of a 38 s join on canonicalization alone.
    ``scan_chars=0`` disables the bound (full-text scan, the pre-round-4
    behavior) for callers whose keys must survive heavy leading
    non-ASCII content."""
    if scan_chars is None:
        scan_chars = 4 * max_len
    if scan_chars:
        text = F.substring(text, 1, scan_chars)
    stripped = F.regexp_replace(text, "[^A-Za-z0-9 ]", "")
    return F.substring(
        F.trim(F.regexp_replace(F.lower(stripped), " +", " ")), 1, max_len
    )


def fingerprint(text: Column) -> Column:
    """64-bit-ish document fingerprint of the normalized text."""
    return md5_long(fingerprint_normalize(text))


def token_count(text: Column) -> Column:
    """BPE-ish token count via TOKEN_REGEX (group 0 = whole match)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def punct_ratio(text: Column) -> Column:
    """Share of characters that are not [A-Za-z0-9 ]."""
    stripped = F.regexp_replace(text, "[^A-Za-z0-9 ]", "")
    return (
        (F.length(text) - F.length(stripped)).cast("double")
        / F.greatest(F.length(text), F.lit(1)).cast("double")
    )


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    ws = words(text)
    n_stop = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    return n_stop.cast("double") / F.greatest(F.size(ws), F.lit(1)).cast("double")


def avg_word_len(text: Column) -> Column:
    """Mean word length = non-space chars / word count."""
    return (
        F.length(F.regexp_replace(text, " ", "")).cast("double")
        / F.greatest(n_words(text), F.lit(1)).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]:
    rewards length (saturating at 100 words), penalizes punctuation noise
    and stopword stuffing. Mirrors common pre-training quality filters."""
    length_term = F.least(n_words(text).cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * (F.lit(1.0) - stopword_ratio(text)),
        6,
    )


def _in_set(sw: tuple[str, ...]):
    # NB: a single-arg lambda is required — F.filter inspects arity, and a
    # default-arg closure (lambda w, sw=sw: ...) looks binary, making Spark
    # pass the element INDEX as the second argument.
    return lambda w: w.isin(*sw)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the word list."""
    ws = words(text)
    return {
        lang: F.size(F.filter(ws, _in_set(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties break to the lexicographically
    smallest language code; zero hits everywhere -> 'und'."""
    scores = lang_scores(text)
    ordered = sorted(scores.keys())
    best = None
    best_lang = F.lit("und")
    # fold right-to-left so earlier (smaller) codes win ties via strict '>'
    for lang in reversed(ordered):
        s = scores[lang]
        if best is None:
            best = s
            best_lang = F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when((s > 0) & (s >= best), F.lit(lang)).otherwise(best_lang)
            best = F.greatest(s, best)
    # note: iterating reversed + '>=' makes the LAST assignment (smallest
    # code) win exact ties, matching the documented tie rule.
    return best_lang


# -- repetition signals (Gopher-style training-data quality rules) ---------
# All integer-count ratios (no logs/entropy), so any engine reproduces the
# exact doubles and the DuckDB oracle is value-exact.


def dup_word_fraction(text: Column) -> Column:
    """1 - distinct_words/words — high for boilerplate/repetitive docs."""
    ws = words(text)
    n = F.size(ws)
    return (n - F.size(F.array_distinct(ws))) / F.greatest(n, F.lit(1))


def _let(val: Column, body) -> Column:
    """Evaluate ``val`` ONCE and pass the result to ``body`` as a bound
    lambda variable — a let-binding built from a single-element
    ``transform``. Needed when an expensive expression is referenced
    inside a higher-order-function lambda: HOF lambdas are CodegenFallback
    with no subexpression elimination, so a captured EXPRESSION re-executes
    per element, while a captured lambda VARIABLE is an already-evaluated
    value. Without this, ``top_bigram_share`` re-derived the whole bigram
    array (itself re-splitting the text per index) for every distinct
    bigram — O(words^3) characters per doc; bound, it is the intended
    O(distinct x words) comparisons."""
    return F.transform(F.array(val), body)[0]


def top_word_share(text: Column) -> Column:
    """Share of the single most frequent word — spammy docs repeat one
    token. O(distinct x words) per row, bounded by document size."""
    return _let(
        words(text),
        lambda ws: F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda w: F.size(F.filter(ws, lambda x: x == w)),
            )
        )
        / F.greatest(F.size(ws), F.lit(1)),
    )


def top_bigram_share(text: Column) -> Column:
    """Share of the most frequent word bigram (Gopher's top-2-gram rule).
    Guarded for <2 words — Spark 4 ANSI ``sequence(1, 0)`` DESCENDS, so the
    bigram index sequence must never be built on short docs."""

    def from_bigrams(bs: Column) -> Column:
        m = F.size(bs)
        counts = F.transform(
            F.array_distinct(bs), lambda b: F.size(F.filter(bs, lambda x: x == b))
        )
        return F.when(m > 0, F.array_max(counts) / m).otherwise(F.lit(0.0))

    def from_words(ws: Column) -> Column:
        n = F.size(ws)
        bs = F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat(
                    F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return _let(bs, from_bigrams)

    return _let(words(text), from_words)


def dup_line_fraction(text: Column) -> Column:
    """1 - distinct_lines/lines (duplicate-line boilerplate signal)."""
    ls = F.split(text, "\n")
    n = F.size(ls)
    return (n - F.size(F.array_distinct(ls))) / F.greatest(n, F.lit(1))
