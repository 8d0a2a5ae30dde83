"""BM25 lexical retrieval: top-k corpus documents per query string.

No analog exists in the reference (its joins are key-equality PoI
enrichments, `GenerateGeographicFeature.py` trajectory ⋈ PoI); this is
the LEXICAL sibling of the embedding similarity family
(`operators/similarity.py`) — the other standard retrieval modality a
training-data pipeline needs: decontamination audits ("which corpus docs
lexically match this benchmark item"), more-like-this data selection,
and duplicate triage all run Okapi BM25 (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond") before any
embedding pass, because it needs no trained model and its failure modes
are complementary to cosine similarity.

    score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf(t,d)·(k1+1)
                                      / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
    idf(t)      = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

(the Lucene non-negative idf variant; query-side term frequency is 1 —
distinct query terms — the common web-retrieval simplification).

Determinism contract (same scheme as operators/importance.py): each
(doc, term) contribution is evaluated in ONE fixed float expression
order and rounded to a SCALED INT64, so the per-(query, doc) score is an
exact integer sum — Spark's shuffle-order-nondeterministic float
aggregation cannot perturb it and the DuckDB oracle replays the
identical expression tree. Top-k ranks on (score_int DESC, doc id ASC),
fully deterministic under ties. The only cross-engine bet is a last-ulp
``ln`` exactly at a rounding boundary of one scaled contribution — the
documented ln-bet class.

Scale shape (the part that matters at 100 TB):

* The corpus TERM STREAM is one staged split + one explode, immediately
  inner-joined to the BROADCAST distinct-query-term table — postings for
  non-query terms never reach a shuffle, so corpus-side work is
  proportional to matching postings, not corpus vocabulary.
* df(t) is computed FROM the restricted posting table (restriction is by
  term only, so counts are still corpus-global) — a ≤|query vocabulary|-
  row table, broadcast back.
* (N, total_words) need one extra narrow corpus scan; production jobs
  compute them once and pass ``n_docs=``/``total_words=`` to skip it
  (the same train-once/broadcast-everywhere shape as the LM model).
* Final aggregation shuffles only (query_id, doc_id) score rows; top-k
  is one window over query_id partitions (|queries| is small by
  definition of the operator — for corpus×corpus all-pairs use the
  minhash/simhash family instead).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_stream(
    df: DataFrame, id_col: str, text_col: str, with_dl: bool
) -> DataFrame:
    """(id[, dl], term) — one row per word OCCURRENCE. The split is
    staged as a real column (HOF-lambda re-execution hazard) and the
    explode is ``explode_outer`` + null filter so
    InferFiltersFromGenerate cannot substitute the split into a
    pre-explode filter (the plan-audit-pinned trap). NULL text yields
    dl=0 and no terms; empty text yields the single term '' (split
    parity with DuckDB string_split)."""
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_gfs_w")
    )
    cols = [F.col(id_col)]
    if with_dl:
        cols.append(
            F.coalesce(F.size("_gfs_w"), F.lit(0)).cast("long").alias("dl")
        )
    return (
        staged.select(*cols, F.explode_outer("_gfs_w").alias("term"))
        .filter(F.col("term").isNotNull())
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 10_000,
    n_docs: int | None = None,
    total_words: int | None = None,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """BM25 score of every (query, matching doc) pair:
    (q_id_col, id_col, n_terms, score_int, score) where ``n_terms`` is
    the number of distinct SCORING query terms the doc contains,
    ``score_int`` the exact int64 sum of scaled per-term contributions
    and ``score = score_int / scale``. Docs sharing no term with a query
    emit no row (BM25 of a disjoint pair is 0 by definition).

    ``n_docs``/``total_words`` (corpus doc count and summed word count —
    the avgdl inputs) are collected with one bounded 1-row aggregate
    when not supplied; pass them to skip the stats scan when scoring
    many query batches against one corpus.

    ``max_df`` / ``max_df_frac`` (mutually exclusive) drop terms whose
    corpus document frequency exceeds the bound (absolute, or
    ``floor(max_df_frac * n_docs)``) from scoring entirely — Lucene's
    common-terms / stop-filter practice. This is the knob that keeps the
    operator quadratic-safe at scale: the score join emits one row per
    (matching posting x query containing the term), so a stopword with
    df ~ N appearing in every query contributes |queries| x N rows;
    its idf is meanwhile the SMALLEST of any term (ln(1 + small)), so
    pruning the df head removes almost all join volume at almost no
    score mass. A doc whose only shared terms are pruned scores as
    disjoint (no row), same as a search engine's stop-filtered recall."""
    if n_docs is None or total_words is None:
        stats = docs.select(
            F.coalesce(
                F.size(F.split(F.col(text_col), " ")), F.lit(0)
            ).cast("long").alias("_dl")
        ).agg(F.count(F.lit(1)), F.sum("_dl")).collect()[0]
        n_docs = int(stats[0])
        total_words = int(stats[1] or 0)
    if n_docs <= 0:
        raise ValueError("bm25 needs a non-empty corpus")
    if max_df is not None and max_df_frac is not None:
        raise ValueError("pass max_df or max_df_frac, not both")
    if max_df_frac is not None:
        if not 0.0 < max_df_frac <= 1.0:
            raise ValueError("max_df_frac must be in (0, 1]")
        # floor of one IEEE multiply — replayed as floor(frac * n) in SQL
        max_df = int(math.floor(max_df_frac * float(n_docs)))
    # one IEEE division of two exact ints — identical in the oracle
    avgdl = float(total_words) / float(n_docs)

    # lazy lineage cuts (the CLAUDE.md exchange-reuse rule): qterms feeds
    # two broadcast subtrees and tf feeds both the df aggregation and the
    # contribution join — without the cut, column pruning specializes each
    # consumer's subtree and the corpus scan + explode + posting shuffle
    # re-execute per consumer (observed: 2 corpus scans, 3 query scans).
    # tf is the matching-postings table — |query vocabulary| × df rows;
    # at 100 TB persist it to disk instead if queries contain stopwords.
    qterms = (
        _term_stream(queries, q_id_col, q_text_col, with_dl=False)
        .select(F.col(q_id_col).alias("_gfs_qid"), "term")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # restriction is by TERM only, so tf/df stay corpus-global values
    tf = (
        _term_stream(docs, id_col, text_col, with_dl=True)
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        # pruning at the (broadcast-sized) df table bounds the score
        # join's |postings with term| x |queries with term| output — the
        # only super-linear row count in the operator
        dft = dft.filter(F.col("df") <= F.lit(max_df))

    # fixed-order float tree, mirrored verbatim in the DuckDB oracle:
    #   idf  = ln((N - df + 0.5) / (df + 0.5) + 1.0)
    #   tfn  = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl / avgdl))
    #   contrib = round(scale * (idf * tfn)) :: int64
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    idf = F.log(
        (F.lit(float(n_docs)) - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld / F.lit(avgdl))
    )
    contrib = (
        tf.join(F.broadcast(dft), "term")
        .select(
            id_col,
            "term",
            F.round(F.lit(float(scale)) * (idf * tfn), 0)
            .cast("long")
            .alias("_contrib"),
        )
    )
    return (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("_gfs_qid", id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum("_contrib").alias("score_int"),
        )
        .select(
            F.col("_gfs_qid").alias(q_id_col),
            F.col(id_col),
            F.col("n_terms"),
            F.col("score_int"),
            (F.col("score_int").cast("double") / F.lit(float(scale))).alias(
                "score"
            ),
        )
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_text_col: str,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Keep the ``k`` best-scoring docs per query:
    (q_id_col, id_col, rank, n_terms, score_int, score), rank 1-based by
    (score_int DESC, doc id ASC) — deterministic under score ties. One
    window over query-id partitions on the (query, doc) score rows."""
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("score_int").desc(), F.col(id_col).asc()
    )
    return (
        bm25_scores(
            docs, id_col, text_col, queries, q_id_col, q_text_col, **kwargs
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank", "n_terms", "score_int", "score")
    )


def bm25_hard_negatives(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_text_col: str,
    positives: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Hard-negative mining for retrieval / contrastive training — the
    standard DPR recipe (Karpukhin et al. 2020 §3.2: the top BM25 hits
    that are NOT the question's answer passage make the hardest training
    negatives). Returns the ``k`` best-scoring docs per query AFTER
    anti-joining the query's own positives, rank re-numbered densely
    1..k over the survivors (ties on (score_int DESC, doc id ASC) like
    ``bm25_topk``).

    ``positives``: (q_id_col, id_col) known-relevant pairs — broadcast
    (a labeled set is always small next to the corpus), so the exclusion
    adds no shuffle to the score table; the rank window runs on the same
    query-id partitioning the scores already carry. Determinism: the
    exclusion is exact, the scores are the scaled-int64 contract of
    ``bm25_scores``, so the negative set is byte-stable across engines
    and runs — resampling a training epoch never churns it."""
    pos = positives.select(q_id_col, id_col)
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("score_int").desc(), F.col(id_col).asc()
    )
    return (
        bm25_scores(
            docs, id_col, text_col, queries, q_id_col, q_text_col, **kwargs
        )
        .join(F.broadcast(pos), [q_id_col, id_col], "left_anti")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank", "n_terms", "score_int", "score")
    )
