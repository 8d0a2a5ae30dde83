"""Mergeable probabilistic sketches for corpus statistics at 100-TB scale:
count-min frequency sketching (+ an EXACT heavy-hitters screen built on it)
and a Bloom-filter membership screen for incremental cross-batch dedup.

No analog exists in the reference (its frequency statistics are pandas
``value_counts`` over one in-memory frame); these are the tools a
pretraining pipeline needs when the DISTINCT cardinality of a key (tokens,
URLs, fingerprints) is too large to shuffle or to hold per-executor:

* ``cms_build`` / ``cms_merge`` / ``cms_query`` — Cormode & Muthukrishnan's
  count-min sketch as a (depth x width)-row DataFrame. The sketch size is
  a CONSTANT (depth*width rows) regardless of corpus size, sketches of
  shards merge by cell-wise addition (one union + groupBy), and estimates
  never underestimate — the properties that make it the canonical
  distributed-counting tool. ``rare_token_stats`` (curation.py) is the
  exact-count sibling that assumes the vocabulary fits in executor memory;
  this family is what replaces it when it does not.
* ``heavy_hitters`` — EXACT frequent-items extraction with a sketch-based
  screen: because a CMS estimate is always >= the true count, filtering
  the stream to rows whose estimate reaches the threshold drops no true
  heavy hitter, and the exact groupBy afterwards sees only candidate-heavy
  keys. The full-cardinality value shuffle never happens; the only wide
  shuffle is the width-bounded sketch build. The screen is LOSSLESS, so
  the result is byte-identical to the naive ``GROUP BY ... HAVING`` — the
  DuckDB oracle is exactly that query.
* ``bloom_build`` / ``bloom_screen`` / ``bloom_novel`` — membership screen
  for incremental ingestion: build a Bloom filter over the existing
  corpus's keys ONCE (size bounded by ``m_bits`` regardless of corpus
  size), broadcast it, and screen every new batch map-side — no join
  against the corpus, no corpus re-scan per batch. One-sided error:
  a key present in the corpus is ALWAYS flagged (no false negatives —
  no duplicate sneaks through); a novel key is flagged spuriously with
  probability ~(1 - e^(-k*n/m))^k, so ``bloom_novel`` under-keeps, never
  under-drops. The filter is represented as a DISTINCT bit-position table
  (<= m_bits rows, int64), which merges across shards by union-distinct
  and round-trips through parquet — the packed-bitset form is a pure
  physical optimization this representation never blocks.

Determinism contract: the only hash primitive is the repo-wide md5-60bit
(functions.text.md5_long); each family computes TWO salted base hashes
per value and derives its depth resp. k hash functions as
``h1 + i*h2 mod width`` (Kirsch & Mitzenmacher 2006 — the standard trick
that preserves the CMS/Bloom error analysis while making md5 volume
independent of depth/k). Every screen decision is a pure integer function
of the input values, so results are identical across engines,
partitionings, and retries (verified by the DuckDB oracles and the
repartition-invariance tests).

Annotating operators (``cms_query`` / ``bloom_screen``) stage their join
helpers under the repo-reserved ``_gfs_`` column prefix and drop them by
exact name, so user columns — underscore-prefixed or not — pass through
untouched (pinned in test_sketch.py).

Scale shapes: ``cms_build`` is one depth-way array explode + one groupBy
on a uniform (d, w) key whose output is depth*width rows. ``cms_query`` /
``heavy_hitters`` / ``bloom_screen`` do per-row lookups as CHAINED
BROADCAST equi-joins (depth resp. k of them, all map-side, zero shuffle
on the big side) — never a groupBy on the looked-up key. ``bloom_build``
is one k-way explode + distinct on a uniform key bounded by m_bits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geofeaturegeneration_spark.functions.text import md5_long


def _base_hashes(value: Column, salt: str) -> tuple[Column, Column]:
    """The TWO md5-60bit base hashes every derived hash function is built
    from (Kirsch & Mitzenmacher 2006: ``g_i(x) = h1(x) + i*h2(x)`` retains
    the count-min / Bloom error analysis while computing two real hashes
    per value instead of depth resp. k) — the md5 volume is the dominant
    CPU cost of both families, so this halves-to-quarters the hot stage.
    The salt keeps sketch families from aliasing each other (the same
    convention as every other operator's salted md5)."""
    s = value.cast("string")
    return (
        md5_long(F.concat(s, F.lit(f"#{salt}#a"))),
        md5_long(F.concat(s, F.lit(f"#{salt}#b"))),
    )


def _derived_bucket(h1: Column, h2: Column, i: int, mod: int) -> Column:
    """``(h1 + i*h2) % mod`` as int64 arithmetic. h1, h2 < 2^60 and i is a
    small constant, so ``h1 + i*h2 < 2^63`` for i <= 7 — no ANSI overflow;
    larger depths/k wrap h2's contribution through an extra mod first."""
    if i == 0:
        return h1 % F.lit(mod)
    contrib = (h2 % F.lit(mod)) * F.lit(i) if i > 7 else h2 * F.lit(i)
    return (h1 + contrib) % F.lit(mod)


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 8192,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of one column: (d, w, cnt) with exactly one row
    per NON-EMPTY cell (absent cells are zero; ``cms_query`` restores
    them). ``weight_col`` counts each row with an integer weight instead
    of 1 (e.g. pre-aggregated (token, count) shards).

    Plan: the depth hashes of a row are built as one array literal-loop
    (depth is a small constant), exploded once, and aggregated on the
    uniform (d, w) key — one explode + one groupBy, output depth*width
    rows regardless of input size. Null values are skipped (they carry no
    frequency information and would otherwise all alias md5('null'))."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    v = F.col(value_col)
    wt = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1).cast("long")
    )
    h1, h2 = _base_hashes(v, salt)
    # the two md5s are STAGED as real columns so the depth derived buckets
    # are integer arithmetic over two attribute reads, never depth
    # re-evaluations of the hash (the HOF-capture / CSE discipline)
    staged = df.filter(v.isNotNull()).select(
        wt.alias("_wt"), h1.alias("_h1"), h2.alias("_h2")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("d"),
                _derived_bucket(F.col("_h1"), F.col("_h2"), d, width)
                .cast("int")
                .alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        staged.select(F.explode(cells).alias("_c"), F.col("_wt"))
        .groupBy(F.col("_c.d").alias("d"), F.col("_c.w").alias("w"))
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (same depth/width/salt — the
    caller's contract, as with any CMS). union + groupBy on the
    (depth*width)-bounded key: sketch shards of a 100-TB corpus merge for
    the cost of shuffling a few thousand rows."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _chained_lookup(
    df: DataFrame,
    value: Column,
    sketch: DataFrame,
    depth: int,
    width: int,
    salt: str,
) -> tuple[DataFrame, Column]:
    """Annotate ``df`` with the CMS estimate of ``value`` as CHAINED
    BROADCAST left joins — one per hash row, each against the
    width-bounded slice of the sketch. All map-side: the big side never
    shuffles, never groups. Returns (annotated df, estimate column).

    The sketch's lineage is CUT first (lazy localCheckpoint — the tiny-
    table convention of bucket_log_ratios/vocab): without it, Catalyst
    pushes each slice's ``d == i`` filter through the aggregate and
    SPECIALIZES the subtree per slice (per-slice grouping expressions),
    so exchange reuse never fires and the corpus feeding ``cms_build``
    would be re-scanned and re-exploded once per hash row — a depth×
    full-corpus cost hiding behind a depth×width-row table. With the cut,
    the sketch computes once and the slices read the cached rows."""
    sketch = sketch.localCheckpoint(eager=False)
    h1, h2 = _base_hashes(value, salt)
    df = df.withColumn("_gfs_h1", h1).withColumn("_gfs_h2", h2)
    est = None
    for d in range(depth):
        slice_d = sketch.filter(F.col("d") == d).select(
            F.col("w").alias(f"_gfs_cmsw{d}"), F.col("cnt").alias(f"_gfs_cmsc{d}")
        )
        df = df.withColumn(
            f"_gfs_cmsw{d}",
            _derived_bucket(
                F.col("_gfs_h1"), F.col("_gfs_h2"), d, width
            ).cast("int"),
        ).join(F.broadcast(slice_d), f"_gfs_cmsw{d}", "left")
        c = F.coalesce(F.col(f"_gfs_cmsc{d}"), F.lit(0).cast("long"))
        est = c if est is None else F.least(est, c)
    return df.drop("_gfs_h1", "_gfs_h2"), est


def cms_query(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 8192,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: adds an ``est``
    column (min over the depth hash rows; >= the true count, with
    overestimation bounded by the usual e/width tail). depth/width/salt
    must match ``cms_build``. Lookup is map-side (chained broadcast
    joins) — ``items`` never shuffles."""
    out, est = _chained_lookup(
        items, F.col(value_col), sketch, depth, width, salt
    )
    helper = [f"_gfs_cmsw{d}" for d in range(depth)] + [
        f"_gfs_cmsc{d}" for d in range(depth)
    ]
    return out.withColumn("est", est).drop(*helper)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 8192,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT frequent values: (value_col, cnt) for every value occurring
    at least ``min_count`` times — byte-identical to
    ``GROUP BY value HAVING count(*) >= min_count`` (the oracle), but the
    full-cardinality shuffle never happens. Two passes:

    1. ``cms_build`` — the only wide shuffle, on the uniform (d, w) key,
       output depth*width rows.
    2. Re-scan: per-row estimate via chained broadcast lookups (map-side),
       filter ``est >= min_count`` — LOSSLESS, because a CMS estimate
       never undercounts — then exact groupBy over the surviving rows.
       On a zipf-shaped corpus the survivors are the heavy keys plus a
       small collision tail (tunable via ``width``), so the value-keyed
       shuffle is tiny even when the vocabulary is billions.

    The screened groupBy's key skew is exactly the heavy hitters
    themselves — map-side partial aggregation (automatic for count)
    collapses each to one row per map task, so no salting is needed.

    ``weight_col`` switches the mass from occurrences to an integer
    per-row weight (e.g. token counts: "which domains own >= min_count
    tokens") — the sketch counts weighted mass, the screen stays
    lossless (weights must be NONNEGATIVE, or estimates can undercount
    and the screen loses its guarantee), and ``cnt`` is the exact int64
    weighted sum."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    sketch = cms_build(df, value_col, depth, width, salt, weight_col)
    v = F.col(value_col)
    cols = [v] if weight_col is None else [v, F.col(weight_col)]
    stream, est = _chained_lookup(
        df.filter(v.isNotNull()).select(*cols), v, sketch, depth, width, salt
    )
    mass = (
        F.count(F.lit(1)).alias("cnt")
        if weight_col is None
        else F.sum(F.col(weight_col).cast("long")).alias("cnt")
    )
    return (
        stream.filter(est >= F.lit(min_count))
        .groupBy(value_col)
        .agg(mass)
        .filter(F.col("cnt") >= F.lit(min_count))
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership screen (incremental cross-batch dedup)
# ---------------------------------------------------------------------------


def _bloom_pos(h1: Column, h2: Column, i: int, m_bits: int) -> Column:
    """Bit position ``i`` of a value from its two staged base hashes:
    ``(h1 + i*h2) % m_bits`` (the same Kirsch-Mitzenmacher derivation as
    the CMS rows — 2 md5 per value total instead of k)."""
    return _derived_bucket(h1, h2, i, m_bits).cast("long")


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Bloom filter over a corpus key as the DISTINCT set of set bit
    positions: (pos) with pos in [0, m_bits). At most m_bits rows — the
    filter size is bounded by the parameter, NOT the corpus (pick
    ``m_bits ~ 10 * n_distinct`` for ~1% false positives at k=4; at the
    default 2^20 the table broadcasts in ~8 MB worst-case). Filters of
    corpus shards merge by union-distinct; the table round-trips through
    parquet, so "build once, screen every future batch" is one persisted
    artifact. One k-way explode + distinct on the uniform position key."""
    if k < 1 or m_bits < 1:
        raise ValueError("k and m_bits must be >= 1")
    v = F.col(value_col)
    h1, h2 = _base_hashes(v, salt)
    staged = df.filter(v.isNotNull()).select(h1.alias("_h1"), h2.alias("_h2"))
    positions = F.array(
        *[
            _bloom_pos(F.col("_h1"), F.col("_h2"), i, m_bits)
            for i in range(k)
        ]
    )
    return staged.select(F.explode(positions).alias("pos")).distinct()


def bloom_screen(
    batch: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Annotate every batch row with ``might_contain``: true iff ALL k bit
    positions of its value are set in ``bloom``. m_bits/k/salt must match
    ``bloom_build``. One-sided: a value that was in the filter's corpus is
    ALWAYS true (no false negatives); a novel value is true only on a
    k-way hash collision. Null values screen as might_contain=false
    (``bloom_build`` never inserts them).

    Plan: k chained broadcast left semi-style joins against the bounded
    position table — all map-side, the batch never shuffles. The position
    table's lineage is CUT first (lazy localCheckpoint, same reason as
    ``_chained_lookup``): otherwise each of the k join sides re-derives
    the table from its source — k re-scans of the corpus when ``bloom``
    comes straight from ``bloom_build`` — instead of reading the computed
    <= m_bits rows k times."""
    bloom = bloom.localCheckpoint(eager=False)
    v = F.col(value_col)
    h1, h2 = _base_hashes(v, salt)
    out = batch.withColumn("_gfs_h1", h1).withColumn("_gfs_h2", h2)
    hit_all: Column | None = None
    for i in range(k):
        pos_i = bloom.select(F.col("pos").alias(f"_gfs_bp{i}")).withColumn(
            f"_gfs_bh{i}", F.lit(True)
        )
        out = out.withColumn(
            f"_gfs_bp{i}", _bloom_pos(F.col("_gfs_h1"), F.col("_gfs_h2"), i, m_bits)
        ).join(F.broadcast(pos_i), f"_gfs_bp{i}", "left")
        h = F.coalesce(F.col(f"_gfs_bh{i}"), F.lit(False))
        hit_all = h if hit_all is None else (hit_all & h)
    helper = (
        [f"_gfs_bp{i}" for i in range(k)]
        + [f"_gfs_bh{i}" for i in range(k)]
        + ["_gfs_h1", "_gfs_h2"]
    )
    return (
        out.withColumn("might_contain", v.isNotNull() & hit_all)
        .drop(*helper)
    )


# ---------------------------------------------------------------------------
# HyperLogLog-style cardinality sketch (mergeable distinct counting)
# ---------------------------------------------------------------------------

_HLL_BITS = 60  # md5_long yields 60-bit hashes


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame,
    value_col: str,
    p: int = 12,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table of one column: (r, rank) with exactly one
    row per NON-EMPTY register — at most ``2^p`` rows regardless of input
    size, the cardinality sibling of ``cms_build`` (frequency) and
    ``bloom_build`` (membership). Flajolet, Fusy, Gandouet & Meunier 2007:
    register index ``r`` = the low ``p`` bits of the 60-bit md5, rank = the
    leading-zero count of the remaining ``60-p`` bits plus one, maxed per
    register.

    Everything is EXACT integer arithmetic — the register table is a pure
    function of the value set, identical across engines / partitionings /
    retries (the DuckDB oracle replays it bit-for-bit; bit length is
    ``length(bin(w))``, minimal in both engines). Estimation error enters
    only in ``hll_estimate``'s final floats, with the standard
    ``1.04/sqrt(2^p)`` relative std. Null values are skipped (they carry no
    cardinality information and would otherwise all alias md5('null')).

    Plan: NO explode (unlike CMS/Bloom, each row feeds one register) — one
    narrow projection + one partial-aggregated groupBy on the uniform
    bounded ``r`` key. Register tables of corpus shards merge via
    ``hll_merge`` (union + max — associative, so sharded build == global
    build exactly); the table round-trips through parquet, giving
    "count distinct urls/tokens across 100 TB of shards" for the cost of
    shuffling ``<= shards * 2^p`` rows. ``group_cols`` keeps one register
    table PER GROUP ("distinct tokens per source/language" — bounded at
    groups x 2^p rows, still one hash shuffle)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    gcols = list(group_cols or [])
    m = 1 << p
    v = F.col(value_col)
    h = md5_long(F.concat(v.cast("string"), F.lit(f"#{salt}")))
    staged = df.filter(v.isNotNull()).select(*gcols, h.alias("_h"))
    w = F.expr(f"_h div {m}")  # the upper 60-p bits
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rank = (F.lit(_HLL_BITS - p + 1) - bitlen).cast("int")
    return (
        staged.select(
            *gcols,
            (F.col("_h") % F.lit(m)).cast("int").alias("r"),
            rank.alias("rank"),
        )
        .groupBy(*gcols, "r")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Register-wise max of same-shape register tables (same p/salt/
    group_cols — the caller's contract, as with ``cms_merge``). Because
    max is associative and commutative, merging shard sketches is EXACTLY
    the sketch of the union — no merge error, the property that makes HLL
    the canonical distributed distinct counter. union + groupBy on the
    2^p-bounded key."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    gcols = list(group_cols or [])
    return (
        reduce(DataFrame.unionByName, sketches)
        .groupBy(*gcols, "r")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate(
    sketch: DataFrame, p: int = 12, group_cols: list[str] | None = None
) -> DataFrame:
    """One-row cardinality estimate from a register table: columns
    ``filled`` (non-empty registers, exact int64), ``z_scaled`` (the HLL
    harmonic-mean denominator ``sum(2^-rank)`` over ALL m registers, scaled
    by ``2^(61-p)`` into an EXACT int64 — every term ``2^(61-p-rank)`` is a
    dyadic integer, so the cross-partition sum is shuffle-order-proof), and
    ``est`` (the corrected estimate, double).

    The only floats are the final expression: raw = alpha_m * m^2 *
    2^(61-p) / z_scaled (one literal multiply, one IEEE division), with
    Flajolet's small-range correction — linear counting ``m * ln(m/zeros)``
    when raw <= 2.5m and zero registers exist. The raw branch replays
    bit-identically in the DuckDB oracle (multiply/divide are correctly
    rounded); the linear-counting branch goes through ``ln``, which is
    only 1-ulp-accurate and engine-specific (JVM StrictMath vs libm), so
    cross-engine comparisons of ``est`` must round first — the contract
    queries compare ``round(1e6 * est)`` per the repo's scaled-int rule.

    ``group_cols`` (matching ``hll_build``) yields one estimate row per
    group; the ungrouped form stays a single global agg (one row even on
    empty input — the count of nothing is 0, not absent)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    gcols = list(group_cols or [])
    m = 1 << p
    scale = 1 << (_HLL_BITS - p + 1)  # 2^(61-p): the rank-0 (empty) term
    aggs = [
        F.count(F.lit(1)).alias("filled"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, {_HLL_BITS - p + 1} - rank)")),
            F.lit(0).cast("long"),
        ).alias("_z1"),
    ]
    agg = sketch.groupBy(*gcols).agg(*aggs) if gcols else sketch.agg(*aggs)
    zeros = F.lit(m) - F.col("filled")
    z_scaled = (F.col("_z1") + zeros * F.lit(scale)).alias("z_scaled")
    out = agg.select(*gcols, F.col("filled"), z_scaled)
    c = _hll_alpha(m) * m * m * scale  # one Python float literal
    raw = F.lit(c) / F.col("z_scaled").cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), lc
    ).otherwise(raw)
    return out.withColumn("est", est)


def hll_count(
    df: DataFrame,
    value_col: str,
    p: int = 12,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) (per group, with
    ``group_cols``) as build + estimate — one narrow scan, one bounded
    groupBy, one single-row (or per-group) agg. The streaming /
    incremental form is: persist ``hll_build`` per shard, ``hll_merge`` the
    shard tables, ``hll_estimate`` the merge (exactly equal to this
    one-shot form — pinned in tests)."""
    return hll_estimate(
        hll_build(df, value_col, p, salt, group_cols), p, group_cols
    )


# ---------------------------------------------------------------------------
# Base-2 HDR histogram + quantile sketch (mergeable distribution statistics)
# ---------------------------------------------------------------------------


def _hist_id_expr(value_sql: str, sub_bits: int) -> str:
    """Bucket id of a NONNEGATIVE int64 as a SQL string over ``value_sql``:
    exact singleton buckets below ``2^sub_bits``, then base-2 buckets split
    into ``2^sub_bits`` equal sub-buckets (the HDR-histogram layout). With
    e = floor(log2(v)) = length(bin(v)) - 1:

        id = ((e - s + 1) << s) + (v >> (e - s)) - 2^s

    — contiguous with the singleton range, monotone in v, EXACT integer
    arithmetic. Written in the operator/engine-shared dialect (``bin()``,
    ``>>`` with a column amount, no ``div``/``//``) so Spark's F.expr and
    the DuckDB oracles consume the IDENTICAL string."""
    s = sub_bits
    v = value_sql
    e = f"(length(bin({v})) - 1)"
    return (
        f"CASE WHEN {v} < {1 << s} THEN {v} "
        f"ELSE (({e} - {s} + 1) * {1 << s}) "
        f"+ ({v} >> ({e} - {s})) - {1 << s} END"
    )


def hist_build(
    df: DataFrame,
    value_col: str,
    sub_bits: int = 5,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable distribution sketch of an integer column: (b, cnt) with
    one row per non-empty bucket — at most ``~63 * 2^sub_bits`` rows
    (~2k at the default) regardless of input size. The distribution
    sibling of ``cms_*`` (frequency) / ``bloom_*`` (membership) /
    ``hll_*`` (cardinality): doc lengths, token counts, byte sizes, score
    scaled-ints — "where should the p99 length cut sit across 100 TB"
    without a global sort.

    Buckets are the HDR-histogram layout: exact singletons below
    ``2^sub_bits``, then power-of-2 ranges split into ``2^sub_bits``
    sub-buckets — relative bucket width ``<= 2^-sub_bits`` (3.1% at the
    default 5). The id math is EXACT integer arithmetic (bit length via
    ``bin()``, identical in Spark and DuckDB), so the bucket table is a
    pure function of the value multiset: deterministic across engines,
    partitionings, and retries. Negative values mirror to negative ids
    (id ordering == value ordering, so quantile scans stay one pass);
    int64 min is outside the domain (its negation overflows — ANSI
    raises rather than mis-bucketing). Nulls are skipped.

    ``weight_col`` switches the mass from row counts to an exact-int64
    per-row weight (token-mass quantiles: "the doc length below which
    half the TOKENS sit"). ``group_cols`` keeps one histogram PER GROUP
    (per-source/per-language length distributions: bucket table bounded
    at groups x ~63*2^sub_bits rows, one hash shuffle on the (group, b)
    key — never a per-group sort). Plan: one narrow projection + one
    partial-aggregated groupBy on the bounded uniform key; shard
    histograms merge by cell-wise sum (``hist_merge``)."""
    if not 0 <= sub_bits <= 8:
        raise ValueError("sub_bits must be in [0, 8]")
    gcols = list(group_cols or [])
    v = F.col(value_col)
    wt = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    pos_id = _hist_id_expr("_av", sub_bits)
    staged = df.filter(v.isNotNull()).select(
        *gcols, v.cast("long").alias("_v"), wt.alias("_wt")
    ).withColumn("_av", F.abs(F.col("_v")))
    b = F.when(F.col("_v") >= 0, F.expr(pos_id)).otherwise(
        -F.expr(pos_id) - F.lit(1)
    )
    return (
        staged.select(*gcols, b.cast("long").alias("b"), F.col("_wt"))
        .groupBy(*gcols, "b")
        .agg(F.sum("_wt").alias("cnt"))
    )


def hist_merge(
    *hists: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Cell-wise sum of same-shape histograms (same sub_bits/group_cols —
    the caller's contract). union + groupBy on the bounded bucket key:
    shard histograms of a 100-TB corpus merge for the cost of shuffling
    a few thousand rows, and merge == build-on-union EXACTLY (integer
    sums are associative)."""
    if not hists:
        raise ValueError("hist_merge needs at least one histogram")
    gcols = list(group_cols or [])
    return (
        reduce(DataFrame.unionByName, hists)
        .groupBy(*gcols, "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _hist_lo_expr(id_sql: str, sub_bits: int) -> str:
    """Inverse of ``_hist_id_expr`` on NONNEGATIVE ids: the bucket's
    smallest value. id = (k << s) + off with k >= 1 maps back to
    lo = (2^s + off) << (k - 1). Same shared dialect (``>>`` replaces
    integer division by 2^s; CAST keeps the shift in int64)."""
    s = sub_bits
    b = id_sql
    k = f"({b} >> {s})"
    off = f"({b} % {1 << s})"
    return (
        f"CASE WHEN {b} < {1 << s} THEN {b} "
        f"ELSE (CAST({1 << s} + {off} AS BIGINT) << ({k} - 1)) END"
    )


def _hist_width_expr(id_sql: str, sub_bits: int) -> str:
    """Bucket width - 1 for a NONNEGATIVE id (0 for singletons)."""
    s = sub_bits
    b = id_sql
    return (
        f"CASE WHEN {b} < {1 << s} THEN 0 "
        f"ELSE (CAST(1 AS BIGINT) << (({b} >> {s}) - 1)) - 1 END"
    )


def hist_quantiles(
    hist: DataFrame,
    qs_ppm: list[int],
    sub_bits: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a bucket table: one row per requested
    quantile (and per group, with ``group_cols``) — (``q_ppm``,
    ``value``, ``rank``) where ``value`` is the LOWER EDGE of the first
    bucket whose cumulative mass reaches ``ceil(q_ppm * total / 1e6)`` —
    a deterministic integer rule (no interpolation floats),
    under-reporting by at most the bucket's relative width
    ``2^-sub_bits``. ``sub_bits``/``group_cols`` must match
    ``hist_build``.

    Plan: JOIN-FREE — the cumulative sum is a window over the lineage-cut
    bucket table (keyed by ``group_cols`` when given: per-group state is
    ~63 * 2^sub_bits rows, so millions of groups scale as one keyed
    window; a bounded single-task global window otherwise), and each
    requested quantile is one filtered aggregate over the same
    checkpointed rows (|qs| bounded passes over a bounded table, unioned
    — never a probe join that would grow with groups x buckets)."""
    if not qs_ppm:
        raise ValueError("qs_ppm must be non-empty")
    for q in qs_ppm:
        if not 0 < q <= 1_000_000:
            raise ValueError("each q_ppm must be in (0, 1e6]")
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    # lineage-cut: the tiny table computes once; the per-group total, the
    # cumulative, and every per-q pass read the same computed rows
    # (exchange-reuse discipline — without it, pushdown would specialize
    # the aggregate's subtree per consumer)
    hist = hist.localCheckpoint(eager=False)
    w = (
        W.partitionBy(*gcols)
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    neg_lo = _hist_lo_expr("(-b - 1)", sub_bits)
    neg_w = _hist_width_expr("(-b - 1)", sub_bits)
    lo = F.when(
        F.col("b") >= 0, F.expr(_hist_lo_expr("b", sub_bits))
    ).otherwise(
        # negative bucket id: value range [-(lo_pos + width - 1), -lo_pos];
        # the bucket's smallest value is the negated upper edge
        -(F.expr(neg_lo) + F.expr(neg_w))
    )
    cum = hist.select(
        *gcols,
        "b",
        lo.cast("long").alias("_lo"),
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(W.partitionBy(*gcols)).alias("_total"),
    )
    # target rank = ceil(q * total / 1e6), exact int64 (q*total stays in
    # range for totals < 2^43 ~ 8.8e12 rows/mass — beyond that, pre-scale
    # the weights; ANSI raises rather than wrapping)
    # ungrouped: group on a constant instead of a global agg, so an EMPTY
    # histogram yields an empty result (quantiles of nothing), not one
    # all-null row
    gkeys = gcols if gcols else [F.lit(1).alias("_gfs_one")]
    per_q = []
    for q in qs_ppm:
        target = F.expr(f"({int(q)} * _total + 999999) div 1000000")
        per_q.append(
            cum.filter(F.col("_cum") >= target)
            .groupBy(*gkeys)
            .agg(
                F.min_by(F.col("_lo"), F.col("b")).alias("value"),
                F.min(target).alias("rank"),
            )
            .select(
                *gcols,
                F.lit(int(q)).cast("long").alias("q_ppm"),
                "value",
                "rank",
            )
        )
    return reduce(DataFrame.unionByName, per_q)


def hist_quantile_values(
    df: DataFrame,
    value_col: str,
    qs_ppm: list[int],
    sub_bits: int = 5,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """build + quantiles one-call (the incremental form persists
    ``hist_build`` per shard and queries the ``hist_merge``)."""
    return hist_quantiles(
        hist_build(df, value_col, sub_bits, weight_col, group_cols),
        qs_ppm,
        sub_bits,
        group_cols,
    )


def bloom_novel(
    batch: DataFrame,
    value_col: str,
    corpus: DataFrame,
    corpus_value_col: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Incremental-ingest screen: the batch rows whose key is GUARANTEED
    absent from the corpus (``might_contain`` false). Every true duplicate
    is dropped (no false negatives); a ~(1-e^(-k*n/m))^k fraction of novel
    rows is spuriously dropped with them — the standard Bloom trade
    (under-keep, never under-drop), sized by ``m_bits``. For exact
    semantics on the survivors' side, follow with ``dedup.dedup_exact``
    against the (much smaller) flagged set; for the screen itself the
    corpus is touched ONCE (``bloom_build``) no matter how many batches
    follow — build the filter, persist the position table, screen forever.
    """
    bloom = bloom_build(
        corpus, corpus_value_col or value_col, m_bits, k, salt
    )
    screened = bloom_screen(batch, value_col, bloom, m_bits, k, salt)
    return screened.filter(~F.col("might_contain")).drop("might_contain")
