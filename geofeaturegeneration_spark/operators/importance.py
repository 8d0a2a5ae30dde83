"""DSIR-style importance resampling: select raw-corpus documents whose
hashed-n-gram distribution looks like a target (high-quality) corpus.

No analog exists in the reference (its data selection is row filtering on
trajectory columns); this is the data-SELECTION counterpart of the
curation family — Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023): fit two bag-of-hashed-n-grams
models, one on the target corpus and one on the raw pool, weight every raw
document by its log importance ratio, and keep the top-k. The hashed
feature space (``buckets`` cells) makes the model size INDEPENDENT of
corpus size — the only state that crosses stages is one
``buckets``-row table.

Determinism contract (the reason the weights are integers):

* Buckets hash with the same md5-60bit primitive as every other operator
  (functions.text.md5_long), so any engine reproduces the bucket stream.
* The per-bucket log ratio is computed ONCE, on the buckets-sized count
  table, as ``round(scale * (ln(ct+a) - ln(cr+a) + ln(Tr+aB) - ln(Tt+aB)))``
  and CAST TO INT64 — so the per-document weight is an INTEGER SUM, which
  Spark's shuffle-order-nondeterministic aggregation cannot perturb
  (float sums are not associative; int64 sums are). The only cross-engine
  bet is ``ln`` differing in the last ulp exactly at a rounding boundary
  of the scaled ratio — probability ~1e-6 across 8k buckets per corpus
  pair, the same class as the documented 1e-13 GEMM association bet.
* Greedy top-k selection orders by (llr_sum DESC, id ASC) — fully
  deterministic. The Gumbel-top-k variant (sampling from the softmax of
  weights, the paper's §3 sampler) derives its noise from md5(id#salt),
  also engine-reproducible.

Scale shape: two corpus scans (one to count, one to weight) + one tiny
count-table join. The gram stream is one explode; the count table is one
groupBy on a uniform 13-bit key; the weight join BROADCASTS the
buckets-row ratio table so the corpus-side gram stream never shuffles on
the bucket key; per-doc weights are one groupBy(id). Selection is
TakeOrdered (per-partition top-k, then merge) — no global sort. At 100 TB
the cost is the same as two shingle passes of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geofeaturegeneration_spark.functions.text import md5_long
from geofeaturegeneration_spark.operators.dedup import _shingles_expr

GUMBEL_DENOM = float(1 << 60)  # md5_long range; (h+0.5)/2^60 ∈ (0,1)


def _gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    buckets: int,
    salt: str,
) -> DataFrame:
    """(id, b) stream of hashed 1..n-gram bucket ids, one row per gram
    OCCURRENCE (the bag-of-n-grams model counts multiplicity). Grams of
    every size share one explode: the per-size shingle arrays are
    concatenated first. The words split is STAGED as a real column (the
    HOF-lambda re-execution hazard — see dedup._shingles_expr) and the
    explode is ``explode_outer`` + null filter so
    InferFiltersFromGenerate cannot push a copy of the staged gram tree
    into a pre-explode filter (the plan-audit-pinned trap). Every doc has
    at least one unigram ('' splits to ['']), so no id is lost."""
    grams = None
    for k in range(1, n + 1):
        e = _shingles_expr("_gfs_w", k)
        grams = e if grams is None else F.concat(grams, e)
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_gfs_w"))
        .select(F.col(id_col), F.explode_outer(grams).alias("_g"))
        .filter(F.col("_g").isNotNull())
        .select(
            F.col(id_col),
            (
                md5_long(F.concat(F.col("_g"), F.lit(f"#{salt}"))) % buckets
            ).alias("b"),
        )
    )


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    buckets: int = 8192,
    salt: str = "dsir",
) -> DataFrame:
    """The hashed bag-of-n-grams model of one corpus: (b, cnt) with b in
    [0, buckets). One explode + one groupBy on a uniform key; the output
    is buckets-sized regardless of corpus size."""
    return (
        _gram_buckets(df, id_col, text_col, n, buckets, salt)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratios(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int,
    alpha: float = 1.0,
    scale: int = 10_000,
) -> DataFrame:
    """Per-bucket SCALED-INTEGER log importance ratio
    ``llr = round(scale * ln(p_target(b) / p_raw(b)))`` with add-``alpha``
    smoothing, from the two corpus count tables. Materializes the two
    totals driver-side (two 1-row collects over buckets-row tables — the
    same bounded-collect convention as vocab boundary counts) so the
    ratio expression carries them as literals instead of a
    nested-loop-join of 1-row aggregates.

    The ln-term ORDER is fixed (ct, cr, Tr, Tt) and mirrored verbatim in
    the DuckDB oracle so both engines evaluate the identical float
    expression tree before the single round-to-int."""
    t = target_counts.select(F.col("b"), F.col("cnt").alias("_ct"))
    r = raw_counts.select(F.col("b"), F.col("cnt").alias("_cr"))
    # tiny tables (≤ buckets rows); cut lineage so the totals collect and
    # the join below don't recompute the corpus-side groupBys twice
    t = t.localCheckpoint(eager=False)
    r = r.localCheckpoint(eager=False)
    tt = t.agg(F.sum("_ct")).collect()[0][0] or 0
    tr = r.agg(F.sum("_cr")).collect()[0][0] or 0
    ct = F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + F.lit(float(alpha))
    cr = F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + F.lit(float(alpha))
    llr = (
        F.log(ct)
        - F.log(cr)
        + F.log(F.lit(float(tr) + alpha * buckets))
        - F.log(F.lit(float(tt) + alpha * buckets))
    )
    return t.join(r, "b", "full").select(
        F.col("b"),
        F.round(F.lit(float(scale)) * llr, 0).cast("long").alias("llr"),
    )


def importance_weights(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_id_col: str,
    target_text_col: str,
    n: int = 2,
    buckets: int = 8192,
    alpha: float = 1.0,
    scale: int = 10_000,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document importance weight of every raw doc against the target
    corpus: (id_col, n_grams, llr_sum, weight) where ``llr_sum`` is the
    exact int64 sum of the scaled per-bucket log ratios over the doc's
    gram occurrences and ``weight = llr_sum / scale`` (one IEEE division,
    engine-exact). Positive weight = looks more like the target than like
    the raw pool. The ratio table is broadcast; the raw gram stream never
    shuffles on the bucket key."""
    tc = hashed_ngram_counts(target, target_id_col, target_text_col, n, buckets, salt)
    rc = hashed_ngram_counts(raw, id_col, text_col, n, buckets, salt)
    llr = bucket_log_ratios(tc, rc, buckets, alpha=alpha, scale=scale)
    grams = _gram_buckets(raw, id_col, text_col, n, buckets, salt)
    return (
        grams.join(F.broadcast(llr), "b", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("llr"), F.lit(0))).alias("llr_sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("llr_sum"),
            (F.col("llr_sum").cast("double") / F.lit(float(scale))).alias(
                "weight"
            ),
        )
    )


def importance_resample(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_id_col: str,
    target_text_col: str,
    k: int,
    gumbel_beta: float | None = None,
    gumbel_salt: str = "gumbel",
    scale: int = 10_000,
    **kwargs,
) -> DataFrame:
    """Keep the ``k`` raw docs that look most like the target corpus:
    (id_col, n_grams, llr_sum, weight, score). ``gumbel_beta=None`` is the
    deterministic greedy top-k (order by llr_sum DESC, id ASC);
    ``gumbel_beta=b`` adds scaled-integer Gumbel noise
    ``round(scale*b*g)`` with ``g = -ln(-ln(u))``, ``u = (md5(id#salt)+0.5)
    / 2^60`` — the paper's Gumbel-top-k sampler, still a pure function of
    the row id so the sample is reproducible anywhere.

    Selection is ``orderBy(...).limit(k)`` — Spark plans TakeOrdered
    (per-partition heap + merge), so no global sort materializes."""
    w = importance_weights(
        raw, id_col, text_col, target, target_id_col, target_text_col,
        scale=scale, **kwargs,
    )
    if gumbel_beta is None:
        score = F.col("llr_sum")
    else:
        h = md5_long(
            F.concat(F.col(id_col).cast("string"), F.lit(f"#{gumbel_salt}"))
        )
        u = (h.cast("double") + F.lit(0.5)) / F.lit(GUMBEL_DENOM)
        g = -F.log(-F.log(u))
        score = F.col("llr_sum") + F.round(
            F.lit(float(scale) * float(gumbel_beta)) * g, 0
        ).cast("long")
    return (
        w.withColumn("score", score)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# CCNet-style hashed-bigram LM scoring (perplexity filtering)
# ---------------------------------------------------------------------------
#
# The other standard "does this look like clean text" signal (Wenzek et al.,
# "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl Data",
# LREC 2020): score every document by its log-likelihood under a language
# model trained on a high-quality target corpus, then keep/bucket by
# perplexity. CCNet uses a 5-gram KenLM; the scale-shaped analog here is a
# hashed-BIGRAM model with add-alpha smoothing — the model is one
# (space, bucket) -> scaled-int log-prob table of at most 2*buckets rows,
# independent of corpus size, so it broadcasts.
#
#   P(w_i | w_{i-1}) = (c_bi(b(w_{i-1} w_i)) + alpha)
#                    / (c_ctx(b(w_{i-1}))    + alpha * buckets)
#
# where c_bi counts hashed bigram occurrences in the target corpus and
# c_ctx counts hashed CONTEXT occurrences (every word except a doc's last —
# exactly the bigram left-hand sides, so the model is properly normalized
# over the hashed vocabulary). Both live in one table keyed (space, b)
# with space 1 = bigram numerators, space 0 = context denominators; the
# two ln() terms are rounded to scaled int64 PER BUCKET (same determinism
# contract as bucket_log_ratios: per-doc scores are integer sums, immune
# to shuffle-order float nonassociativity; the only cross-engine bet is a
# last-ulp ln at a rounding boundary).
#
# DSIR (above) asks "is this doc more target-like than raw-pool-like";
# the LM score asks "is this doc probable target text at all" — no raw
# model, so one corpus never contaminates another's score, and the model
# trains once and scores any number of corpora.


def _lm_stream(
    df: DataFrame, id_col: str, text_col: str, buckets: int, salt: str
) -> DataFrame:
    """(id, space, b) stream: one row per bigram occurrence (space=1) and
    one per context occurrence (space=0, the doc's words minus its last —
    the bigram left-hand sides). The words split is STAGED once (HOF
    lambdas re-execute captured expressions per element) and the lambdas
    only read their element; explode_outer + null filter keeps
    InferFiltersFromGenerate from substituting the staged tree into a
    pre-explode filter. Docs with < 2 words emit nothing (restored by the
    scorer's left join); hashing salts the two spaces apart."""
    ctx = F.when(
        F.size(F.col("_gfs_w")) >= 2,
        F.slice(F.col("_gfs_w"), 1, F.size(F.col("_gfs_w")) - 1),
    ).otherwise(F.array().cast("array<string>"))
    ctx_structs = F.transform(
        ctx, lambda x: F.struct(F.lit(0).alias("space"), x.alias("g"))
    )
    bi_structs = F.transform(
        _shingles_expr("_gfs_w", 2),
        lambda x: F.struct(F.lit(1).alias("space"), x.alias("g")),
    )
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("_gfs_w"))
        .select(
            F.col(id_col),
            F.explode_outer(F.concat(ctx_structs, bi_structs)).alias("_sg"),
        )
        .filter(F.col("_sg").isNotNull())
        .select(
            F.col(id_col),
            F.col("_sg.space").alias("space"),
            (
                md5_long(
                    F.concat(
                        F.col("_sg.g"),
                        F.lit(f"#{salt}"),
                        F.col("_sg.space").cast("string"),
                    )
                )
                % buckets
            ).alias("b"),
        )
    )


def lm_bucket_logprobs(
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 8192,
    alpha: float = 1.0,
    scale: int = 10_000,
    salt: str = "lm",
) -> DataFrame:
    """Train the hashed-bigram LM on the target corpus: (space, b, llp)
    with ``llp = round(scale * ln(cnt + alpha))`` for bigram buckets
    (space=1) and ``round(scale * ln(cnt + alpha*buckets))`` for context
    buckets (space=0). At most 2*buckets rows — train once, broadcast to
    every scoring job. One explode + one groupBy on a uniform key."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (add-alpha smoothing)")
    c = F.col("cnt").cast("double")
    llp = F.when(
        F.col("space") == 1, F.log(c + F.lit(float(alpha)))
    ).otherwise(F.log(c + F.lit(float(alpha) * buckets)))
    return (
        _lm_stream(target, id_col, text_col, buckets, salt)
        .groupBy("space", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("space"),
            F.col("b"),
            F.round(F.lit(float(scale)) * llp, 0).cast("long").alias("llp"),
        )
    )


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    buckets: int = 8192,
    alpha: float = 1.0,
    scale: int = 10_000,
    salt: str = "lm",
) -> DataFrame:
    """Score every doc under a trained ``lm_bucket_logprobs`` model:
    (id_col, n_bigrams, lp_sum, avg_logprob) where ``lp_sum`` is the exact
    int64 sum over bigram positions of ``llp_bi(b2) - llp_ctx(b1)`` and
    ``avg_logprob = lp_sum / (scale * n_bigrams)`` (one IEEE division of
    exact integers — engine-exact). Higher avg_logprob = more
    target-like; CCNet's perplexity is ``exp(-avg_logprob)``, monotone in
    it, so bucket/filter on avg_logprob directly and no cross-engine
    ``exp`` bet enters the contract. Docs with < 2 words (or null text)
    keep a row with n_bigrams=0, lp_sum=0, avg_logprob NULL.

    The model is BROADCAST — the corpus-side stream never shuffles on the
    bucket key; unseen buckets coalesce to the smoothing floor (a Python
    literal, identical in the SQL oracle). ``buckets/alpha/scale/salt``
    must match the values the model was trained with."""
    import math

    d_bi = int(round(scale * math.log(alpha)))
    d_ctx = int(round(scale * math.log(alpha * buckets)))
    stream = _lm_stream(df, id_col, text_col, buckets, salt)
    llp = F.coalesce(
        F.col("llp"),
        F.when(F.col("space") == 1, F.lit(d_bi)).otherwise(F.lit(d_ctx)).cast("long"),
    )
    scored = (
        stream.join(F.broadcast(model), ["space", "b"], "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("space") == 1, 1).otherwise(0))
            .cast("int")
            .alias("n_bigrams"),
            F.sum(
                F.when(F.col("space") == 1, llp).otherwise(-llp)
            ).alias("lp_sum"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("lp_sum"), F.lit(0).cast("long")).alias("lp_sum"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("lp_sum").cast("double")
                / (F.lit(float(scale)) * F.col("n_bigrams").cast("double")),
            ).alias("avg_logprob"),
        )
    )


def lm_logprob(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_id_col: str,
    target_text_col: str,
    buckets: int = 8192,
    alpha: float = 1.0,
    scale: int = 10_000,
    salt: str = "lm",
) -> DataFrame:
    """Train on ``target``, score ``raw`` — one call. For repeated scoring
    (the production shape: train the model on the clean corpus ONCE,
    persist the <= 2*buckets-row table, score every batch) call
    ``lm_bucket_logprobs`` + ``lm_score`` separately."""
    model = lm_bucket_logprobs(
        target, target_id_col, target_text_col, buckets, alpha, scale, salt
    )
    return lm_score(raw, id_col, text_col, model, buckets, alpha, scale, salt)


def corpus_divergence(
    a: DataFrame,
    a_id: str,
    a_text: str,
    b: DataFrame,
    b_id: str,
    b_text: str,
    n: int = 2,
    buckets: int = 8192,
    alpha: float = 1.0,
    scale: int = 10_000_000,
    salt: str = "dsir",
) -> DataFrame:
    """Distribution drift between two corpora over the shared hashed
    1..n-gram space: ONE row (kl_ab, kl_ba, js) in nats — the monitoring
    counterpart of DSIR (same ``hashed_ngram_counts`` models; compare
    crawl snapshots, shards, or pre/post-curation corpora without moving
    either corpus). KL(a||b) = sum_b pa*ln(pa/pb) with add-``alpha``
    smoothing (so it is finite on disjoint supports); JS is the
    symmetrized divergence against the midpoint m=(pa+pb)/2, bounded by
    ln 2.

    Determinism: each bucket's contribution is computed in ONE fixed
    float expression order (pa, pb, m from the collected totals as
    literals; contribution = p*(ln(p)-ln(q))) and rounded to a scaled
    INT64 before summing, so the cross-bucket sum is exact integer
    addition — shuffle order cannot perturb it, and the DuckDB oracle
    replays the identical expression tree. The only cross-engine bet is
    a last-ulp ln exactly at a rounding boundary of the scaled
    contribution (~1e-5 over 8192 buckets at scale=1e7 — the documented
    ln-bet class). Scale shape: two gram passes + one buckets-row full
    join; the output is one row."""
    ca = hashed_ngram_counts(a, a_id, a_text, n, buckets, salt).select(
        F.col("b"), F.col("cnt").alias("_ca")
    )
    cb = hashed_ngram_counts(b, b_id, b_text, n, buckets, salt).select(
        F.col("b"), F.col("cnt").alias("_cb")
    )
    ca = ca.localCheckpoint(eager=False)
    cb = cb.localCheckpoint(eager=False)
    ta = ca.agg(F.sum("_ca")).collect()[0][0] or 0
    tb = cb.agg(F.sum("_cb")).collect()[0][0] or 0
    da = float(ta) + alpha * buckets
    db = float(tb) + alpha * buckets
    pa = (F.coalesce(F.col("_ca"), F.lit(0)).cast("double") + F.lit(float(alpha))) / F.lit(da)
    pb = (F.coalesce(F.col("_cb"), F.lit(0)).cast("double") + F.lit(float(alpha))) / F.lit(db)
    m = (pa + pb) / F.lit(2.0)

    def _term(p, q):
        # fixed order: p * (ln p - ln q), scaled and rounded per bucket
        return F.round(F.lit(float(scale)) * (p * (F.log(p) - F.log(q))), 0).cast("long")

    joined = ca.join(cb, "b", "full").localCheckpoint(eager=False)
    per_bucket = joined.select(
        _term(pa, pb).alias("_ab"),
        _term(pb, pa).alias("_ba"),
        (_term(pa, m) + _term(pb, m)).alias("_js2"),
    )
    # buckets observed in NEITHER corpus still contribute under smoothing
    # (pa=alpha/da vs pb=alpha/db): one synthetic row carries their shared
    # per-bucket term times the missing-bucket count — exact int64
    # multiplication of the same rounded term the oracle computes
    n_missing = buckets - joined.count()
    if n_missing > 0:
        spark = a.sparkSession
        pa0 = F.lit(float(alpha)) / F.lit(da)
        pb0 = F.lit(float(alpha)) / F.lit(db)
        m0 = (pa0 + pb0) / F.lit(2.0)
        ghost = spark.range(1).select(
            (_term(pa0, pb0) * F.lit(n_missing)).alias("_ab"),
            (_term(pb0, pa0) * F.lit(n_missing)).alias("_ba"),
            ((_term(pa0, m0) + _term(pb0, m0)) * F.lit(n_missing)).alias("_js2"),
        )
        per_bucket = per_bucket.unionByName(ghost)
    s = F.lit(float(scale))
    return per_bucket.agg(
        (F.sum("_ab").cast("double") / s).alias("kl_ab"),
        (F.sum("_ba").cast("double") / s).alias("kl_ba"),
        (F.sum("_js2").cast("double") / (F.lit(2.0) * s)).alias("js"),
    )
