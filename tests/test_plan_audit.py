"""Physical-plan audits: the plan properties that matter at 100 TB, asserted
at test scale. A query can be value-correct and still carry a plan that
collapses at 1000 executors — these tests pin the plan shape:

* filters reach the parquet scan (PushedFilters) and the scan reads only
  referenced columns (column pruning);
* dimension joins broadcast (no shuffle of the fact side);
* the as-of union strategy stays a single-shuffle window plan with no join
  node at all;
* bucketed candidate joins never degrade to a cartesian product;
* narrow expression pipelines stay in one whole-stage-codegen span with no
  exchange.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_and_column_pushdown(spark):
    # tpch_pricing folded to extras round 4 (slot given to bm25_topk)
    plan = plan_str({**E.queries(), **E.extra_queries()}["tpch_pricing"](spark, SF_DIR))
    scan = [b for b in plan.split("\n\n") if "PushedFilters" in b][0]
    assert "PushedFilters" in scan and "l_shipdate" in scan.split("PushedFilters")[1].split("\n")[0]
    # projection pruned to the referenced columns only
    read_schema = scan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_dim_joins_broadcast(spark):
    # orders_enrich folded to extras round 4 (hll_count took its slot);
    # the broadcast-dim-join promise it pins is unchanged
    plan = plan_str(
        {**E.queries(), **E.extra_queries()}["orders_enrich"](spark, SF_DIR),
        "simple",
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_encode_broadcasts_vocab(spark):
    plan = plan_str(E.queries()["vocab_encode"](spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan


def all_queries():
    return {**E.queries(), **E.extra_queries()}


def test_contract_fits_driver_window():
    """Round-2 lesson: the driver evaluates only the FIRST 50 queries()
    entries — anything past that silently gets no CORRECTNESS row."""
    assert len(E.queries()) <= 50
    # every contract and extra query has a DuckDB oracle registered
    oracles = E.oracle_sql()
    missing = [n for n in all_queries() if n not in oracles]
    assert not missing, f"queries without oracle: {missing}"


def test_asof_union_is_single_shuffle_no_join(spark):
    plan = plan_str(all_queries()["asof_union"](spark, SF_DIR), "simple")
    assert "Join" not in plan  # pure union + window, no join operator
    # one exchange for the (key) window; union sides scan independently
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_bucketed_candidate_joins_not_cartesian(spark):
    qs = all_queries()
    for name in ["ann_lsh", "ann_ivf", "minhash_pairs", "ngram_jaccard"]:
        plan = plan_str(qs[name](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in plan, name
        # (round 4: ann_ivf is now the blocked-GEMM plan — the centroid
        # cross join moved to the ann_ivf_join exactness twin)
        assert "BroadcastNestedLoopJoin" not in plan, name


# Queries whose plans INTENTIONALLY contain an unconditioned join, each
# against a bounded-small broadcast side:
#   cosine_topk_join — the documented O(n^2) exact fold-join baseline,
#     kept as the exactness twin of the contract's blocked-GEMM plan.
#   ann_ivf_join — the join-form IVF twin: vectors x k=8 centroids
#     assignment; the nested-loop build side is the k-row quantizer,
#     never the corpus.
_UNCONDITIONED_JOIN_ALLOWLIST = {"cosine_topk_join", "ann_ivf_join"}


def test_cosine_topk_blocked_has_no_join(spark):
    """Round-3: the contract's exact top-k is the blocked-GEMM plan — tiles
    form by narrow explode + cogroup shuffle, so the plan must carry NO join
    operator of any kind (the n^2 meeting happens inside Arrow batches)."""
    plan = plan_str(E.queries()["cosine_topk"](spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_ivf_blocked_has_no_join(spark):
    """Round-4: the contract's IVF search is the blocked-GEMM plan —
    assignment is a mapInPandas GEMM (no broadcast cross join, no
    assignment window exchange) and inverted lists meet in a cogroup, so
    the plan must carry NO join operator of any kind."""
    for name in ("ann_ivf", "ann_ivf_trained"):
        plan = plan_str(all_queries()[name](spark, SF_DIR), "simple")
        assert "Join" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_hll_no_explode_no_join_bounded_shuffles(spark):
    """Round-4: the HLL sketch feeds ONE register per input row — unlike
    CMS/Bloom there is no k-way explode, so the operator's own plan must
    carry no Generate, no join, and exactly the two bounded aggregations
    (groupBy r capped at 2^p rows, then the single-row estimate)."""
    from geofeaturegeneration_spark.operators import hll_build, hll_count

    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    plan = plan_str(hll_build(df, "v", p=10), "simple")
    assert "Generate" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # the bounded groupBy(r) only
    plan2 = plan_str(hll_count(df, "v", p=10), "simple")
    assert "Generate" not in plan2 and "Join" not in plan2, plan2
    assert plan2.count("Exchange") == 2, plan2  # + the single-row final agg


def test_hist_quantiles_windows_and_join_are_over_bounded_buckets(spark):
    """Round-4: hist_quantiles is JOIN-FREE — each requested quantile is a
    filtered aggregate over the lineage-cut bucket table, and the
    cumulative window runs over that same bounded table (<= ~63*2^sub_bits
    rows by construction), never over raw values: the corpus-sized stream
    is reduced by the bounded groupBy(b) BEFORE any window node."""
    df = E.queries()["hist_quantiles"](spark, SF_DIR)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in phys, phys
    win_at = phys.find("Window")
    assert win_at != -1, phys
    below = phys[win_at:]
    # the windows read the LINEAGE-CUT bucket table (Scan ExistingRDD over
    # (b, cnt) — the lazy localCheckpoint), never a corpus file scan: the
    # corpus reduction happened in the checkpoint producer, outside this
    # plan, so everything below the window is bucket-bounded
    assert "Scan ExistingRDD[b" in below, phys
    assert "FileScan" not in below, phys
    # and the raw value column never reaches this plan at all
    assert "n_chars" not in phys, phys


def test_no_unconditioned_join_in_any_contract_query(spark):
    """Round-1 lesson: the audit checked selected plans and missed a
    cross join in negative_samples. Sweep EVERY contract + extra query: no
    CartesianProduct, and no BroadcastNestedLoopJoin outside the
    documented bounded-small allowlist."""
    qs = all_queries()
    bad = {}
    for name, fn in qs.items():
        if name in _UNCONDITIONED_JOIN_ALLOWLIST:
            continue
        plan = plan_str(fn(spark, SF_DIR), "simple")
        hits = [
            op
            for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if op in plan
        ]
        if hits:
            bad[name] = hits
    assert not bad, f"unconditioned joins: {bad}"


def test_narrow_exprs_no_exchange_codegen(spark):
    qs = all_queries()
    for name in ["grid_cantor", "time_features", "text_stats", "lang_id"]:
        df = qs[name](spark, SF_DIR)
        plan = plan_str(df, "simple")
        assert "Exchange" not in plan, name
        # '*(n)' prefix = operator inside a whole-stage-codegen span
        assert "*(1)" in plan, name
    # fingerprint reads a narrow single-file fixture through the explicit
    # parallelism-floor repartition — the ONLY allowed exchange is that
    # round-robin spread, never a hash/range shuffle
    plan = plan_str(qs["fingerprint"](spark, SF_DIR), "simple")
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_salted_paths_never_single_partition(spark):
    qs = all_queries()
    for name in ["asof_salted", "sessionize_salted", "stay_enrich"]:
        plan = plan_str(qs[name](spark, SF_DIR), "simple")
        assert "SinglePartition" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_sessionize_shuffles_only_on_entity(spark):
    plan = plan_str(E.queries()["sessionize_state"](spark, SF_DIR), "simple")
    # every exchange must partition on the entity key — no global shuffles
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "user_id" in line, line
        assert "SinglePartition" not in line, line
    # the WHOLE sessionization (boundary flag, cumulative session id, episode
    # aggregate, etime/stay_seq windows) runs on ONE entity-key shuffle: the
    # sub-keyed stages reuse HashPartitioning(entity) with local sorts only
    assert plan.count("Exchange") == 1, plan


def test_shingle_and_ngram_split_staged_once(spark):
    """The text split feeding shingles/bigrams must be evaluated ONCE per
    row (a staged alias / let-bound lambda variable), never inside a
    higher-order-function lambda body: HOF lambdas are CodegenFallback
    with no subexpression elimination, so a split captured as an
    EXPRESSION re-executes per element — O(words^2) characters per doc
    for shingles, O(words^3) for top_bigram_share (measured 9.1x on
    300-word docs; BASELINE.md "Shingle staging"). The optimized plan of
    each consumer must therefore contain exactly one split of the text
    column."""
    from geofeaturegeneration_spark.functions.text import (
        top_bigram_share,
        top_word_share,
    )
    from geofeaturegeneration_spark.operators import minhash_band_signatures
    from geofeaturegeneration_spark.operators.dedup import (
        minhash_band_signatures_rowwise,
        shingle_hashes,
    )

    from geofeaturegeneration_spark.streaming.screen import _band_rows

    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id INT, text STRING")
    tdf = spark.createDataFrame(
        [(1, "a b c d e f g", "2024-01-01 00:00:00")],
        "doc_id INT, text STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    consumers = {
        "shingle_hashes": shingle_hashes(df, "doc_id", "text"),
        "band_sigs": minhash_band_signatures(df, "doc_id", "text"),
        "band_sigs_rowwise": minhash_band_signatures_rowwise(df, "doc_id", "text"),
        "top_word_share": df.select(top_word_share(F.col("text")).alias("s")),
        "top_bigram_share": df.select(top_bigram_share(F.col("text")).alias("s")),
        # streaming cross-corpus screen's signature stage, audited via its
        # batch plan (the same InferFiltersFromGenerate hazard applies per
        # micro-batch; dropDuplicatesWithinWatermark blocks auditing the
        # full stream_minhash_screen on a batch frame)
        "stream_screen_bands": _band_rows(
            tdf, "doc_id", "text", "ts", 3, 16, 4
        ),
    }
    for name, out in consumers.items():
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        n = plan.count("split(text")
        assert n == 1, f"{name}: expected 1 split of text, found {n}\n{plan}"


def test_span_dedup_plan_shape(spark):
    """span_dedup scale guards (round 4): (1) the text split is STAGED —
    exactly one split per branch (window-hash probe, winner aggregation,
    reassembly base = 3 total), never re-executed inside the shingle
    lambda (the O(words^2) HOF-capture trap); (2) the per-hash winner comes
    from a partial-agg groupBy whose map-side min-struct shrinks a span
    duplicated 10^8 times to one row per map task — NO window function ever
    partitions by the corpus-wide window hash (every Window is doc-keyed,
    bounded by one document's loser count)."""
    from geofeaturegeneration_spark.operators import span_dedup

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id INT, text STRING"
    )
    out = span_dedup(df, "doc_id", "text", k=4)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    n = opt.count("split(text")
    assert n == 3, f"expected 3 staged splits (one per branch), found {n}\n{opt}"
    for line in opt.splitlines():
        if "Window [" in line:
            assert "_h#" not in line, f"window over the hash stream:\n{line}"
    phys = out._jdf.queryExecution().toString()
    assert "partial_min" in phys or "partial" in phys.lower()


def test_top_customers_global_window_is_post_limit(spark):
    """The only partition-less window in the tree (the rank in
    top_customers, extras) must run AFTER the TakeOrdered/limit — i.e. over
    exactly k rows — so the `WindowExec: No Partition Defined` warning is
    provably bounded, never a global sort of the customer table. Pinned by
    asserting the window's child plan contains the limit."""
    df = E.extra_queries()["top_customers"](spark, SF_DIR)
    phys = df._jdf.queryExecution().executedPlan().toString()
    # the Window node must sit above a GlobalLimit/TakeOrdered, not above
    # an Exchange of the full aggregate
    win_at = phys.find("Window")
    assert win_at != -1
    below = phys[win_at:]
    limit_at = min(
        [p for p in (below.find("GlobalLimit"), below.find("TakeOrdered")) if p != -1]
        or [-1]
    )
    assert limit_at != -1, f"no limit below the global window:\n{phys}"


def test_tile_cogroups_pinned_against_aqe_coalesce(spark):
    """GEMM-tile scale guard (round 4): the blocked-GEMM cogroups
    (cosine_topk, ann_ivf family, semantic_dedup) are Python-CPU-heavy per
    BYTE, and AQE's size-based coalescing — which cannot see Python cost —
    folds the cogroup exchange down to a handful of tasks whenever the map
    side reports few bytes (measured: a 1-partition 100k-vector input
    collapsed the 64-tile cogroup to ONE task, 481 s instead of ~60 s).
    Both cogroup sides therefore carry an explicit ``repartition(n, keys)``
    whose exchange is REPARTITION_BY_NUM — exempt from AQE coalescing and
    satisfying the cogroup's required hash distribution with no extra
    exchange. Pinned: every tile plan has exactly 2 REPARTITION_BY_NUM
    exchanges (one per cogroup side), and no ENSURE_REQUIREMENTS exchange
    partitions on the tile keys (that shape would mean the pin was lost
    and the exchange is AQE-coalescible again)."""
    qs = all_queries()
    for name in ("cosine_topk", "ann_ivf", "ann_ivf_trained", "semantic_dedup"):
        df = qs[name](spark, SF_DIR)
        phys = plan_str(df, "simple")
        n_pinned = phys.count("REPARTITION_BY_NUM")
        assert n_pinned == 2, f"{name}: {n_pinned} pinned exchanges (want 2)\n{phys}"
        for line in phys.splitlines():
            if "ENSURE_REQUIREMENTS" in line and "hashpartitioning" in line:
                assert "_qb#" not in line and "_ob#" not in line, (
                    f"{name}: tile-key exchange fell back to "
                    f"ENSURE_REQUIREMENTS (AQE-coalescible):\n{line}"
                )


def test_sketch_lookups_scan_corpus_once(spark):
    """heavy_hitters / bloom_screen scale guard (round 4): the chained
    broadcast lookup slices must read the CHECKPOINTED sketch / position
    table, not re-derive it per hash row. Without the lineage cut,
    Catalyst pushes each slice's d==i filter through the aggregate and
    specializes the subtree per slice (exchange reuse never fires), so the
    corpus would be re-scanned and re-exploded depth (resp. k) times.
    Pinned: the composed plan contains exactly ONE parquet scan (the
    second-pass stream / the batch side) and the slices read ExistingRDD."""
    for name in ("heavy_hitters", "bloom_screen"):
        df = E.queries()[name](spark, SF_DIR)
        phys = df._jdf.queryExecution().executedPlan().toString()
        n_scans = phys.count("Scan parquet")
        assert n_scans == 1, f"{name}: {n_scans} parquet scans (want 1)\n{phys}"
        assert phys.count("ExistingRDD") == 4, name
        assert "CartesianProduct" not in phys and "NestedLoop" not in phys


def test_rotation_policy_current():
    """Round-5 rotation-as-policy gate: the planner (driver-verification
    history x rotation_hints) must agree the current window needs no
    further rotation — every registered query either has a driver
    CORRECTNESS row or an in-registry carrier — and any future proposal
    must keep the window within the driver's measured 50-entry limit."""
    import sys as _sys
    sys_path_added = False
    import os as _os
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    tools = _os.path.join(root, "tools")
    if tools not in _sys.path:
        _sys.path.insert(0, tools)
        sys_path_added = True
    try:
        import rotation

        p = rotation.plan(E)
        assert p["new_window_size"] <= 50
        # every never-driver-verified registered query has a carrier whose
        # plan exercises its machinery (else the planner would promote it)
        hints = E.rotation_hints()
        carrierless = [
            k for k in p["never_driver_verified"]
            if k not in hints["carriers"]
        ]
        assert not carrierless, (
            f"queries with unverified standalone machinery: {carrierless} "
            "— rotate them into the window or declare a carrier"
        )
        # carriers must reference registered queries (no dangling names)
        registered = set(p["window"]) | set(p["extras"])
        dangling = {
            k: c for k, c in hints["carriers"].items() if c not in registered
        }
        assert not dangling, f"carrier names not registered: {dangling}"
        # coverage must bottom out in a real driver row: a never-verified
        # query's carrier must be in-window (earning fresh rows) or have
        # at least one green CORRECTNESS round of its own
        assert not p["weak_carriers"], (
            f"carrier chains with no driver row anywhere: "
            f"{p['weak_carriers']}"
        )
    finally:
        if sys_path_added:
            _sys.path.remove(tools)
