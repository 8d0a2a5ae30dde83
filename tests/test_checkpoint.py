"""Checkpoint store + resumable partitioned run (SURVEY.md §5 item 4:
kill-and-rerun must be idempotent; replaces the reference's file-existence
resume, DP_GenerateTrajectory.py:50-52)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.checkpoint import CheckpointStore, run_partitioned
from geofeaturegeneration_spark.datagen import generate_sequences
from jobs.run_pipeline import build_features


@pytest.fixture(scope="module")
def seq(spark):
    return generate_sequences(spark, n_docs=30, seed=7).persist()


def _collect_features(spark, out_path):
    df = spark.read.parquet(out_path)
    return sorted(
        (r["doc_id"], r["source"], str(r["stime"]), r["duration_s"])
        for r in df.select("doc_id", "source", "stime", "duration_s").collect()
    )


def test_mark_and_completed(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    assert store.completed("job") == set()
    store.mark("job", "a", "done", rows=10, wall_ms=5, lineage="v1")
    store.mark("job", "b", "failed", lineage="v1")
    assert store.completed("job", "v1") == {"a"}
    # lineage mismatch invalidates
    assert store.completed("job", "v2") == set()
    # last writer wins: re-mark a as failed
    store.mark("job", "a", "failed", lineage="v1")
    assert store.completed("job", "v1") == set()


def test_resume_skips_done_and_output_identical(spark, seq, tmp_path):
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    ck1 = str(tmp_path / "ck1")
    ck2 = str(tmp_path / "ck2")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())

    def run_one(key):
        return build_features(seq.filter(F.col("source") == key))

    # full run in one go
    store1 = CheckpointStore(spark, ck1)
    r1 = run_partitioned(
        spark, store1, "j", sources, run_one, out1, "part_key", "v1"
    )
    assert all(not r.skipped for r in r1)

    # interrupted run: first partition only, then "crash", then resume
    store2 = CheckpointStore(spark, ck2)
    run_partitioned(
        spark, store2, "j", sources[:1], run_one, out2, "part_key", "v1"
    )
    r2 = run_partitioned(
        spark, store2, "j", sources, run_one, out2, "part_key", "v1"
    )
    assert [r.skipped for r in r2] == [True] + [False] * (len(sources) - 1)

    assert _collect_features(spark, out1) == _collect_features(spark, out2)

    # metrics recorded for every partition
    m = store2.metrics("j")
    rows = {r["partition_key"]: r for r in m.collect()}
    assert set(rows) == set(sources)
    assert all(rows[s]["status"] == "done" and rows[s]["rows"] > 0 for s in sources)


def _read_sorted_rows(spark, path, drop=("part_key",)):
    df = spark.read.parquet(path).drop(*drop)
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def test_dedup_pipeline_kill_resume_identical(spark, tmp_path, monkeypatch):
    """The composed corpus-dedup job (signatures -> clusters -> keeper
    filter, jobs/run_dedup.py) must survive a mid-stage-1 crash: the resumed
    run skips finished buckets and produces output identical to an
    uninterrupted run AND to the single-shot in-memory operators."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100)

    # uninterrupted run
    out1, ck1 = str(tmp_path / "out1"), str(tmp_path / "ck1")
    r_sig, r_clu, r_out = RD.run_dedup_pipeline(spark, docs, out1, ck1, **kw)
    assert all(not r.skipped for r in r_sig + r_clu + r_out)

    # interrupted run: crash while computing the SECOND signature bucket
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    real = RD.minhash_band_signatures
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return real(*a, **k)

    monkeypatch.setattr(RD, "minhash_band_signatures", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        RD.run_dedup_pipeline(spark, docs, out2, ck2, **kw)
    monkeypatch.setattr(RD, "minhash_band_signatures", real)

    # resume: bucket 0 of stage 1 skipped, everything else runs
    r_sig2, r_clu2, r_out2 = RD.run_dedup_pipeline(spark, docs, out2, ck2, **kw)
    assert [r.skipped for r in r_sig2] == [True, False, False]
    assert all(not r.skipped for r in r_clu2 + r_out2)

    # identical artifacts at every stage
    for sub in ("signatures", "clusters", "deduped"):
        assert _read_sorted_rows(spark, f"{out1}/{sub}") == _read_sorted_rows(
            spark, f"{out2}/{sub}"
        ), sub

    # staged pipeline == single-shot operators on the same corpus
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=4, max_bucket_size=100
    )
    inline = dedup_clusters(docs, "doc_id", pairs)
    keep_inline = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in inline.filter("is_keeper").collect()
    )
    # deduped rows are (cluster_id, doc_id, text) after column sort
    keep_staged = sorted(
        (r[1], r[0]) for r in _read_sorted_rows(spark, f"{out1}/deduped")
    )
    assert keep_staged == keep_inline
    # dedup actually removed something on this corpus
    assert len(keep_staged) < docs.count()


def test_rerun_partition_is_idempotent(spark, seq, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())

    def run_one(key):
        return build_features(seq.filter(F.col("source") == key))

    store = CheckpointStore(spark, ck)
    run_partitioned(spark, store, "j", sources, run_one, out, "part_key", "v1")
    before = _collect_features(spark, out)
    # force re-run everything (dynamic overwrite replaces same partitions)
    run_partitioned(
        spark, store, "j", sources, run_one, out, "part_key", "v1", force=True
    )
    assert _collect_features(spark, out) == before


def test_dedup_pipeline_with_decontamination_stage(spark, tmp_path):
    """--bench adds the checkpointed contamination stage: final output =
    dedup keepers MINUS docs overlapping the bench set, identical to the
    inline operators composed by hand, and an immediate re-run skips all
    four stages."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        decontaminate,
        dedup_clusters,
        minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # every 7th doc plays the eval set; the corpus keeps all docs (the
    # stage must flag TRAINING docs that overlap bench, not remove bench
    # rows themselves — bench membership is a separate concern)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100)

    out, ck = str(tmp_path / "out_dc"), str(tmp_path / "ck_dc")
    r_sig, r_clu, r_con, r_out = RD.run_dedup_pipeline(
        spark, docs, out, ck, bench=bench, **kw
    )
    assert all(not r.skipped for r in r_sig + r_clu + r_con + r_out)

    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    # inline composition of the same operators
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=4, max_bucket_size=100
    )
    keepers = dedup_clusters(docs, "doc_id", pairs).filter("is_keeper")
    bad = decontaminate(
        docs, "doc_id", "text", bench, "doc_id", "text", k=3
    ).filter("contaminated")
    want = sorted(
        r["doc_id"]
        for r in keepers.join(bad.select("doc_id"), "doc_id", "left_anti")
        .collect()
    )
    assert got == want
    assert len(got) < keepers.count()  # the stage actually removed docs

    # re-run resumes: every stage skips
    r2 = RD.run_dedup_pipeline(spark, docs, out, ck, bench=bench, **kw)
    assert all(r.skipped for stage in r2 for r in stage)


def test_dedup_pipeline_clean_stage(spark, tmp_path):
    """--clean rewrites text BEFORE anything hashes it (the C4 order):
    rule-failing lines never reach the surviving text, page-verdict
    failures never reach the output, the result equals the hand-composed
    clean_lines -> dedup chain over the CLEANED corpus, and the flag
    participates in the lineage key (same flags resume: every stage
    skips)."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        dedup_clusters,
        minhash_lsh_pairs,
    )
    from geofeaturegeneration_spark.operators.curation import clean_lines

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # per-doc junk line (4 words < min_words -> cut by the line rules; the
    # doc_id suffix would perturb every doc's shingles if it survived to
    # the signature stage, so equality below proves clean ran FIRST) plus
    # a page-verdict kill on every 5th doc
    docs = base.withColumn(
        "text",
        F.concat(F.col("text"), F.lit("\nclick here now "),
                 F.col("doc_id").cast("string")),
    ).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit("\nbuy lorem ipsum deals")),
        ).otherwise(F.col("text")),
    )
    # the synthetic corpus is unpunctuated single-line prose: drop the
    # terminal-punctuation rule and the 3-line page floor
    ckw = dict(terminal_chars="", min_kept_lines=1)
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              clean=True, clean_kwargs=ckw)

    out, ck = str(tmp_path / "out_cl"), str(tmp_path / "ck_cl")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 4  # clean, signatures, clusters, output
    assert all(not r.skipped for st in stages for r in st)

    final = spark.read.parquet(os.path.join(out, "deduped"))
    assert final.count() > 0
    # page-verdict docs never surface; junk lines are cut everywhere
    assert final.filter(F.col("doc_id") % 5 == 0).count() == 0
    assert final.filter(F.col("text").contains("click here")).count() == 0

    # equals clean_lines -> dedup hand-composed over the CLEANED text
    rep = clean_lines(docs, "doc_id", "text", **ckw)
    cleaned = docs.drop("text").join(
        rep.filter("keep").select("doc_id", F.col("clean").alias("text")),
        "doc_id",
    )
    pairs = minhash_lsh_pairs(
        cleaned, "doc_id", "text", k=3, n_hashes=16, bands=4,
        max_bucket_size=100,
    )
    keepers = cleaned.join(
        dedup_clusters(cleaned.select("doc_id"), "doc_id", pairs)
        .filter("is_keeper").select("doc_id"),
        "doc_id", "left_semi",
    )
    want = sorted((r["doc_id"], r["text"]) for r in keepers.collect())
    got = sorted(
        (r["doc_id"], r["text"])
        for r in final.select("doc_id", "text").collect()
    )
    assert got == want
    assert cleaned.count() < docs.count()  # the page verdict non-vacuous

    # same flags resume: everything skips (clean is in the lineage key)
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for stage in st2 for r in stage)


def test_dedup_pipeline_scrub_stage(spark, tmp_path):
    """--scrub redacts PII inside the output stage: surviving text carries
    no raw emails, equals the hand-composed keeper+pii_clean_col result,
    and scrub participates in the lineage key (a re-run with the same flag
    skips every stage; the flag OFF on the same checkpoint would rerun)."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators.curation import pii_clean_col
    from pyspark.sql import functions as F

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    docs = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" leak to user@example.com")),
        ).otherwise(F.col("text")),
    )
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100)

    out, ck = str(tmp_path / "out_sc"), str(tmp_path / "ck_sc")
    r_sig, r_clu, r_out = RD.run_dedup_pipeline(
        spark, docs, out, ck, scrub=True, **kw
    )
    assert all(not r.skipped for r in r_sig + r_clu + r_out)
    final = spark.read.parquet(os.path.join(out, "deduped"))
    assert final.filter(F.col("text").contains("@example.com")).count() == 0
    assert final.filter(F.col("text").contains("<EMAIL>")).count() > 0

    # equals the unscrubbed pipeline with the scrub expression applied
    out2, ck2 = str(tmp_path / "out_ns"), str(tmp_path / "ck_ns")
    RD.run_dedup_pipeline(spark, docs, out2, ck2, scrub=False, **kw)
    plain = spark.read.parquet(os.path.join(out2, "deduped")).withColumn(
        "text", pii_clean_col(F.col("text"))
    )
    got = sorted((r["doc_id"], r["text"]) for r in final.collect())
    want = sorted((r["doc_id"], r["text"]) for r in plain.collect())
    assert got == want

    # same flags resume: everything skips
    r2 = RD.run_dedup_pipeline(spark, docs, out, ck, scrub=True, **kw)
    assert all(r.skipped for stage in r2 for r in stage)


def test_full_curation_pipeline_all_stages_kill_resume(
    spark, tmp_path, monkeypatch
):
    """The FULL curation story as one resumable artifact: quality filter ->
    signatures -> clusters -> decontaminate -> mix (source_sample) -> PII
    scrub. A crash mid-quality-stage resumes byte-identical to an
    uninterrupted run; the result equals the hand-composed inline
    operators; per-stage wall-clock lands in the checkpoint metrics."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        decontaminate,
        dedup_clusters,
        minhash_lsh_pairs,
        quality_filter,
        source_sample,
    )
    from geofeaturegeneration_spark.operators.curation import pii_clean_col

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    qkw = dict(min_words=30, max_words=70, min_avg_word_len=3.0,
               max_avg_word_len=6.0, max_punct_ratio=0.05,
               max_stopword_ratio=0.2, max_dup_word_fraction=0.8)
    rates = {"src0": 900_000, "src1": 900_000, "src2": 900_000}
    # min_hits=20: the tiny-vocab synthetic corpus shares SOME 3-gram with
    # the bench set in every doc — a higher threshold keeps the stage
    # partial (measured: 29 of 224 kept docs at sf0.001), not all-dropping
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              bench=bench, decon_min_hits=20, scrub=True, quality=True,
              quality_kwargs=qkw, mix_rates_ppm=rates, mix_default_ppm=700_000)

    # uninterrupted run
    out1, ck1 = str(tmp_path / "out_full1"), str(tmp_path / "ck_full1")
    stages = RD.run_dedup_pipeline(spark, docs, out1, ck1, **kw)
    assert len(stages) == 5  # quality, signatures, clusters, contamination, output
    assert all(not r.skipped for st in stages for r in st)

    # interrupted: crash while computing the SECOND quality bucket
    out2, ck2 = str(tmp_path / "out_full2"), str(tmp_path / "ck_full2")
    real = RD.quality_filter
    calls = {"n": 0}

    def crashing(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return real(*a, **k)

    monkeypatch.setattr(RD, "quality_filter", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        RD.run_dedup_pipeline(spark, docs, out2, ck2, **kw)
    monkeypatch.setattr(RD, "quality_filter", real)
    st2 = RD.run_dedup_pipeline(spark, docs, out2, ck2, **kw)
    assert [r.skipped for r in st2[0]] == [True, False, False]
    for sub in ("quality", "signatures", "clusters", "contaminated", "deduped"):
        assert _read_sorted_rows(spark, f"{out1}/{sub}") == _read_sorted_rows(
            spark, f"{out2}/{sub}"
        ), sub

    # equals the hand-composed inline operators
    kept_q = docs.join(
        quality_filter(docs, "doc_id", "text", **qkw)
        .filter("keep").select("doc_id"),
        "doc_id", "left_semi",
    )
    pairs = minhash_lsh_pairs(
        kept_q, "doc_id", "text", k=3, n_hashes=16, bands=4,
        max_bucket_size=100,
    )
    keepers = kept_q.join(
        dedup_clusters(kept_q.select("doc_id"), "doc_id", pairs)
        .filter("is_keeper").select("doc_id"),
        "doc_id", "left_semi",
    )
    bad = decontaminate(
        kept_q, "doc_id", "text", bench, "doc_id", "text", k=3, min_hits=20
    ).filter("contaminated").select("doc_id")
    final = source_sample(
        keepers.join(bad, "doc_id", "left_anti"), "doc_id", rates,
        default_ppm=700_000,
    ).withColumn("text", pii_clean_col(F.col("text")))
    want = sorted(
        (r["doc_id"], r["text"]) for r in final.select("doc_id", "text").collect()
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{out1}/deduped")
        .select("doc_id", "text").collect()
    )
    assert got == want
    # quality + mixing each actually removed docs (non-vacuous stages)
    assert docs.count() > kept_q.count()
    assert len(got) < keepers.count()

    # per-stage wall-clock recorded in the metrics table
    store = RD.CheckpointStore(spark, ck1)
    for job in ("corpus_dedup/quality", "corpus_dedup/signatures",
                "corpus_dedup/clusters", "corpus_dedup/contamination",
                "corpus_dedup/output"):
        m = store.metrics(job)
        assert m is not None
        rows = m.collect()
        assert rows and all(
            r["status"] == "done" and r["wall_ms"] > 0 for r in rows
        ), job


def test_dedup_pipeline_computed_mix_stage(spark, tmp_path):
    """mix_alpha computes the temperature recipe INSIDE the job, over the
    SURVIVING corpus: the mixed output equals source_sample(unmixed
    output, temperature_rates(unmixed output, token-weighted)); a same-
    flags resume skips every stage including the checkpointed rate table;
    lowering the target re-runs (conservative global lineage) and, because
    the draw is monotone, yields a subset of the bigger sample."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.functions.text import n_words
    from geofeaturegeneration_spark.operators.curation import (
        source_sample,
        temperature_rates,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100)

    # reference: the unmixed pipeline output IS the surviving corpus the
    # rate stage must base the recipe on
    out0, ck0 = str(tmp_path / "out_plain"), str(tmp_path / "ck_plain")
    RD.run_dedup_pipeline(spark, docs, out0, ck0, **kw)
    plain = spark.read.parquet(os.path.join(out0, "deduped")).drop("part_key")

    out1, ck1 = str(tmp_path / "out_mix"), str(tmp_path / "ck_mix")
    mkw = dict(mix_alpha=0.5, mix_target_frac=0.5, mix_by_tokens=True, **kw)
    stages = RD.run_dedup_pipeline(spark, docs, out1, ck1, **mkw)
    assert len(stages) == 4  # signatures, clusters, mix_rates, output
    mixed = spark.read.parquet(os.path.join(out1, "deduped"))

    rates = temperature_rates(
        plain.withColumn("_w", n_words(F.col("text"))),
        by="source", alpha=0.5, target_frac=0.5, weight_col="_w",
    )
    want = source_sample(plain, "doc_id", rates, by="source", salt="mixrate")
    got_ids = sorted(r["doc_id"] for r in mixed.collect())
    want_ids = sorted(r["doc_id"] for r in want.collect())
    assert got_ids == want_ids
    assert 0 < len(got_ids) < plain.count()

    # same flags resume: everything skips, including the rate stage
    r2 = RD.run_dedup_pipeline(spark, docs, out1, ck1, **mkw)
    assert all(r.skipped for stage in r2 for r in stage)

    # a different target changes the lineage key -> full re-run (the
    # conservative global-lineage contract), and the smaller sample is a
    # SUBSET of the bigger one (the draw is monotone in the rates)
    r3 = RD.run_dedup_pipeline(
        spark, docs, out1, ck1,
        mix_alpha=0.5, mix_target_frac=0.25, mix_by_tokens=True, **kw
    )
    assert all(not r.skipped for stage in r3 for r in stage)
    small_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out1, "deduped")).collect()
    }
    assert small_ids < set(got_ids)

    # explicit rates and the computed recipe are mutually exclusive
    with pytest.raises(ValueError, match="mutually exclusive"):
        RD.run_dedup_pipeline(
            spark, docs, out1, ck1,
            mix_rates_ppm={"src0": 1}, mix_alpha=0.5, **kw
        )


def test_dedup_pipeline_span_stages(spark, tmp_path):
    """--span-dedup K appends the exact-substring modality: the final
    span_deduped/ table equals span_dedup() run by hand over the deduped/
    output (winners decided on the SURVIVING corpus), keeps every input
    column, and resumes (immediate re-run skips all stages)."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import span_dedup

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # guarantee a cross-doc verbatim span among the dedup SURVIVORS:
    # append a shared 6-word disclaimer to every 5th doc
    docs = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" all rights reserved by the corpus")),
        ).otherwise(F.col("text")),
    )
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              span_k=5)
    out, ck = str(tmp_path / "out_sp"), str(tmp_path / "ck_sp")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 5  # sig, clusters, output, span_intervals, span_clean
    assert all(not r.skipped for st in stages for r in st)

    deduped = spark.read.parquet(f"{out}/deduped").drop("part_key")
    want = {
        r["doc_id"]: (r["clean"], r["n_dup_tokens"])
        for r in span_dedup(deduped, "doc_id", "text", k=5).collect()
    }
    final = spark.read.parquet(f"{out}/span_deduped")
    got = {
        r["doc_id"]: (r["text"], r["span_dup_tokens"]) for r in final.collect()
    }
    assert got == want
    assert set(final.columns) == {
        "doc_id", "text", "cluster_id", "span_dup_tokens", "part_key"
    }
    # the span stage actually cut something (non-vacuous)
    assert sum(d for _, d in got.values()) > 0

    # re-run: every stage skips, output byte-identical
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in st2 for r in st)


def test_dedup_pipeline_max_bucket_size_in_lineage(spark, tmp_path):
    """Resuming with a different --max-bucket-size must INVALIDATE every
    stage (the cap changes pairs -> clusters -> keepers): a resumed run may
    not serve stale cluster tables computed under the old cap. Regression
    for the round-4 advisor finding (lineage key omitted mbs)."""
    import jobs.run_dedup as RD

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out, ck = str(tmp_path / "out_mbs"), str(tmp_path / "ck_mbs")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4)
    RD.run_dedup_pipeline(spark, docs, out, ck, max_bucket_size=100, **kw)
    # a different cap re-runs every stage instead of skipping
    r_sig, r_clu, r_out = RD.run_dedup_pipeline(
        spark, docs, out, ck, max_bucket_size=2, **kw
    )
    assert all(not r.skipped for r in r_sig + r_clu + r_out)
    # and the result equals a fresh run at the new cap
    out2, ck2 = str(tmp_path / "out_mbs2"), str(tmp_path / "ck_mbs2")
    RD.run_dedup_pipeline(spark, docs, out2, ck2, max_bucket_size=2, **kw)
    assert _read_sorted_rows(spark, f"{out}/deduped") == _read_sorted_rows(
        spark, f"{out2}/deduped"
    )


def test_rerun_with_empty_output_clears_stale_partition(spark, seq, tmp_path):
    """Dynamic partition overwrite only replaces partitions PRESENT in the
    written data, so a lineage-invalidated re-run whose new output is zero
    rows for a key (e.g. a stricter quality filter rejecting the whole
    bucket) would silently keep — and re-count — the previous lineage's
    rows. run_partitioned now deletes the key's directory before the
    write. Regression for the round-4 self-review finding."""
    out, ck = str(tmp_path / "out_empty"), str(tmp_path / "ck_empty")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())
    store = CheckpointStore(spark, ck)

    def run_v1(key):
        return build_features(seq.filter(F.col("source") == key))

    run_partitioned(spark, store, "j", sources, run_v1, out, "part_key", "v1")

    victim = sources[0]

    def run_v2(key):
        df = build_features(seq.filter(F.col("source") == key))
        return df.filter(F.lit(key != victim))  # v2 rejects the whole bucket

    r2 = run_partitioned(spark, store, "j", sources, run_v2, out, "part_key", "v2")
    by_key = {r.partition_key: r for r in r2}
    assert by_key[victim].rows == 0 and not by_key[victim].skipped
    got = spark.read.parquet(out).filter(F.col("part_key") == victim).count()
    assert got == 0  # the v1 rows are gone, not served as v2's output


def test_expanding_key_set_reruns_pruned_partitions(spark, seq, tmp_path):
    """Shrinking the key set prunes data dirs; re-expanding it later must
    re-run the pruned keys, not resume their surviving 'done' marks against
    deleted data. run_partitioned now writes a superseding 'pruned' mark
    for every directory it deletes. Regression for the round-4 self-review
    finding (the 4->2->4 oscillation)."""
    out, ck = str(tmp_path / "out_osc"), str(tmp_path / "ck_osc")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())
    assert len(sources) >= 2
    store = CheckpointStore(spark, ck)

    def run_one(key):
        return build_features(seq.filter(F.col("source") == key))

    run_partitioned(spark, store, "j", sources, run_one, out, "part_key", "v1")
    run_partitioned(spark, store, "j", sources[:1], run_one, out, "part_key", "v1")
    r3 = run_partitioned(spark, store, "j", sources, run_one, out, "part_key", "v1")
    by_key = {r.partition_key: r for r in r3}
    assert by_key[sources[0]].skipped  # never pruned, still resumable
    for key in sources[1:]:
        assert not by_key[key].skipped, key  # pruned keys re-ran
        assert by_key[key].rows > 0, key
    present = {
        str(r["part_key"])
        for r in spark.read.parquet(out).select("part_key").distinct().collect()
    }
    assert present == set(sources)


def test_dedup_pipeline_shrinking_buckets_prunes_stale_partitions(
    spark, tmp_path
):
    """Re-running into the same --output with fewer --buckets would leave
    the old run's higher-numbered part_key directories on disk (dynamic
    partition overwrite only replaces re-run keys) and serve their stale
    signatures/rows to every reader; run_partitioned now prunes
    out-of-range partition dirs up front. Regression for the round-4
    advisor finding."""
    import jobs.run_dedup as RD

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out, ck = str(tmp_path / "out_shrink"), str(tmp_path / "ck_shrink")
    kw = dict(k=3, n_hashes=16, bands=4, max_bucket_size=100)
    RD.run_dedup_pipeline(spark, docs, out, ck, buckets=4, **kw)
    RD.run_dedup_pipeline(spark, docs, out, ck, buckets=2, **kw)
    # the stale part_key=2/3 dirs are pruned from every stage directory
    for sub in ("signatures", "deduped"):
        leftover = {
            str(r["part_key"])
            for r in spark.read.parquet(f"{out}/{sub}")
            .select("part_key").distinct().collect()
        }
        assert leftover == {"0", "1"}, sub
    # and the final output equals a clean buckets=2 run
    out2, ck2 = str(tmp_path / "out_shrink2"), str(tmp_path / "ck_shrink2")
    RD.run_dedup_pipeline(spark, docs, out2, ck2, buckets=2, **kw)
    assert _read_sorted_rows(spark, f"{out}/deduped") == _read_sorted_rows(
        spark, f"{out2}/deduped"
    )


def test_dedup_pipeline_ppl_stage(spark, tmp_path):
    """--ppl-target adds the two perplexity stages (train LM once, score
    per bucket): junk docs score below the threshold and never reach the
    output; the result equals the hand-composed lm_logprob + minhash
    keepers; a re-run skips every stage; loosening the threshold
    invalidates (knob in the lineage key) and the junk docs come back."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        dedup_clusters,
        lm_logprob,
        minhash_lsh_pairs,
    )

    base = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")
    # every 5th doc becomes out-of-vocabulary junk (distinct per doc so the
    # junk docs are NOT minhash duplicates of each other — the ppl stage,
    # not dedup, must be what removes them)
    junk = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(15)),
            lambda i: F.concat(
                F.lit("zq"),
                ((F.col("doc_id") * 31 + i) % 9973).cast("string"),
            ),
        ),
    )
    docs = base.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0, junk).otherwise(F.col("text"))
    )
    target = base.filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 5 != 0)
    ).select("doc_id", "text")

    scored = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm_logprob(
            docs, "doc_id", "text", target, "doc_id", "text"
        ).collect()
    }
    junk_ids = {i for i in scored if i % 5 == 0}
    hi_junk = max(scored[i] for i in junk_ids)
    lo_clean = min(scored[i] for i in scored if i not in junk_ids)
    assert hi_junk < lo_clean, "junk must be separable by avg_logprob"
    thr = (hi_junk + lo_clean) / 2

    out, ck = str(tmp_path / "out_ppl"), str(tmp_path / "ck_ppl")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              ppl_target=target, ppl_fingerprint="t1",
              ppl_min_avg_logprob=thr)
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 5  # lm_model, ppl, signatures, clusters, output
    assert all(not r.skipped for st in stages for r in st)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    assert junk_ids and not (set(got) & junk_ids)

    # hand-composed: ppl keepers -> minhash keepers
    kept = docs.filter(
        ~F.col("doc_id").isin([int(i) for i in junk_ids])
    )
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", k=3, n_hashes=16, bands=4,
        max_bucket_size=100,
    )
    want = sorted(
        r["doc_id"]
        for r in dedup_clusters(kept.select("doc_id"), "doc_id", pairs)
        .filter("is_keeper")
        .collect()
    )
    assert got == want

    # immediate re-run: everything skipped
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in st2 for r in st)

    # loosening the threshold re-runs (lineage) and the junk docs return
    st3 = RD.run_dedup_pipeline(
        spark, docs, out, ck, **dict(kw, ppl_min_avg_logprob=-1e9)
    )
    assert all(not r.skipped for st in st3 for r in st)
    got3 = set(
        r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    assert junk_ids <= got3


def test_dedup_pipeline_semantic_stage(spark, tmp_path):
    """--embeddings adds the SemDeDup stage: final output equals the
    hand-composed minhash-keepers minus semantic drops; an immediate
    re-run skips every stage; changing --semantic-threshold invalidates
    (the knob is in the lineage key) and re-runs."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        dedup_clusters,
        minhash_lsh_pairs,
        semantic_dedup,
        train_ivf_centroids,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(F.col("vec_id").alias("doc_id"), "embedding")

    out, ck = str(tmp_path / "out_sem"), str(tmp_path / "ck_sem")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              embeddings=emb, emb_fingerprint="sf0.001",
              semantic_threshold=0.3, semantic_clusters=8)
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 4  # signatures, clusters, semantic, output
    assert all(not r.skipped for st in stages for r in st)

    # hand-composed: minhash keepers minus semantic drops
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, n_hashes=16, bands=4,
        max_bucket_size=100,
    )
    keepers = docs.join(
        dedup_clusters(docs.select("doc_id"), "doc_id", pairs)
        .filter("is_keeper").select("doc_id"),
        "doc_id", "left_semi",
    )
    cents = train_ivf_centroids(emb, "doc_id", "embedding", k=8)
    drops = semantic_dedup(
        emb, "doc_id", "embedding", threshold=0.3, n_clusters=8,
        centroids=cents,
    ).filter(~F.col("keep")).select("doc_id")
    want = sorted(
        r["doc_id"]
        for r in keepers.join(drops, "doc_id", "left_anti").collect()
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    assert got == want
    # the semantic stage actually removed surviving docs (non-vacuous)
    assert len(got) < keepers.count()
    n_drops = spark.read.parquet(f"{out}/semantic").count()
    assert n_drops > 0

    # immediate re-run: everything skipped, output unchanged
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in st2 for r in st)

    # threshold change invalidates the semantic + downstream output stages
    kw2 = dict(kw, semantic_threshold=0.99)
    st3 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw2)
    assert all(not r.skipped for r in st3[2]), "semantic must re-run"
    assert all(not r.skipped for r in st3[3]), "output must re-run"
    got3 = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    # at 0.99 nothing in this corpus is a semantic dup: pure minhash keepers
    assert got3 == sorted(r["doc_id"] for r in keepers.collect())


def test_dedup_pipeline_prior_bloom_stage(spark, tmp_path):
    """--prior prepends the incremental-ingest Bloom screen: the final
    output NEVER contains a doc whose text is in the prior corpus (the
    one-sided guarantee), equals the pipeline run by hand on the
    bloom_novel pre-screened corpus, resumes with every stage skipped, and
    a filter-geometry change invalidates the checkpoints."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import bloom_novel
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # the prior corpus re-ships every 3rd doc's text (same bytes, its own
    # ids) — exactly the re-ingestion scenario the screen exists for
    prior = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              prior_m_bits=1 << 14, prior_k=4)

    out, ck = str(tmp_path / "out_pr"), str(tmp_path / "ck_pr")
    stages = RD.run_dedup_pipeline(
        spark, docs, out, ck, prior=prior, prior_fingerprint="p1", **kw
    )
    assert len(stages) == 5  # prior_bloom, novel, signatures, clusters, output
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out}/deduped").collect()
    )
    # one-sided guarantee: no surviving text appears in the prior corpus
    prior_texts = {r["text"] for r in prior.collect()}
    surviving = {
        r["text"] for r in spark.read.parquet(f"{out}/deduped").collect()
    }
    assert not (surviving & prior_texts)
    # equals the plain pipeline run on the hand-pre-screened corpus
    novel = bloom_novel(docs, "text", prior, m_bits=1 << 14, k=4)
    out2, ck2 = str(tmp_path / "out_pr2"), str(tmp_path / "ck_pr2")
    RD.run_dedup_pipeline(
        spark, novel, out2, ck2,
        **{k_: v for k_, v in kw.items() if not k_.startswith("prior")},
    )
    want = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{out2}/deduped").collect()
    )
    assert got == want
    assert len(got) < docs.count()  # the screen actually dropped docs

    # resume skips everything; changing m_bits invalidates (stages re-run)
    r2 = RD.run_dedup_pipeline(
        spark, docs, out, ck, prior=prior, prior_fingerprint="p1", **kw
    )
    assert all(r.skipped for stage in r2 for r in stage)
    kw2 = dict(kw, prior_m_bits=1 << 13)
    r3 = RD.run_dedup_pipeline(
        spark, docs, out, ck, prior=prior, prior_fingerprint="p1", **kw2
    )
    assert all(not r.skipped for stage in r3 for r in stage)

def test_dedup_pipeline_pack_and_shard_export(spark, tmp_path):
    """--pack/--shard-size turn the curated corpus into training rows
    inside the same resumable artifact: packed chunks equal the
    hand-composed vocab -> encode -> pack_sequences chain over the deduped
    output, token conservation holds, every shard except the last is
    exactly shard_size rows, and the export stages resume (skip) with the
    same flags."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.functions.text import words
    from geofeaturegeneration_spark.operators import (
        build_vocab,
        encode_with_vocab,
        pack_sequences,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              pack_len=64, pack_groups=4, pack_pad=0, shard_size=16)

    out, ck = str(tmp_path / "out_px"), str(tmp_path / "ck_px")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    # signatures, clusters, output, pack_vocab, packed, shards
    assert len(stages) == 6
    assert all(not r.skipped for st in stages for r in st)

    packed = spark.read.parquet(f"{out}/packed").drop("part_key")
    final = spark.read.parquet(f"{out}/deduped").drop(
        "part_key", "cluster_id"
    )

    # equals hand-composed vocab -> encode -> pack over the deduped corpus
    toks = final.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "token")
    )
    vocab = build_vocab(toks.select("token"), "token")
    enc = encode_with_vocab(toks, vocab, "token")
    arr = enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("vocab_id")))
            ),
            lambda s: s["vocab_id"].cast("int"),
        ).alias("tokens")
    )
    want_df = pack_sequences(
        arr, "doc_id", "tokens", seq_len=64, n_groups=4, pad_value=0
    )
    want = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in want_df.collect()
    )
    got = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in packed.collect()
    )
    assert got == want

    # conservation: every real token of the final corpus lands exactly once
    n_tok = final.select(F.sum(F.size(words(F.col("text"))))).collect()[0][0]
    assert packed.select(F.sum("n_real")).collect()[0][0] == n_tok
    assert packed.filter(F.size("tokens") != 64).count() == 0  # padded

    # shards: fixed-size cover of the packed rows, only the last short
    shards = spark.read.parquet(f"{out}/shards").drop("part_key")
    assert shards.count() == packed.count()
    sizes = {
        r["shard"]: r["n"]
        for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    last = max(sizes)
    assert all(sizes[s] == 16 for s in sizes if s != last)
    assert 0 < sizes[last] <= 16
    assert shards.select(F.max("shard_pos")).collect()[0][0] <= 15

    # same flags resume: everything skips
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in st2 for r in st)

def test_dedup_pipeline_pack_bpe(spark, tmp_path):
    """--pack-bpe swaps the packing tokenizer for a BPE artifact trained
    on the final corpus: packed chunks equal the hand-composed train_bpe
    -> bpe_encode -> pack_sequences chain, and the merge count is in the
    lineage key (same flags resume: every stage skips)."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        bpe_encode,
        pack_sequences,
        train_bpe,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              pack_len=64, pack_bpe_merges=40, pack_groups=4, pack_pad=0)

    out, ck = str(tmp_path / "out_pb"), str(tmp_path / "ck_pb")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 5  # signatures, clusters, output, vocab, packed
    assert all(not r.skipped for st in stages for r in st)

    packed = spark.read.parquet(f"{out}/packed").drop("part_key")
    final = spark.read.parquet(f"{out}/deduped").drop(
        "part_key", "cluster_id"
    )
    art = train_bpe(final, "text", n_merges=40)
    arr = bpe_encode(final, "doc_id", "text", art).select("doc_id", "tokens")
    want_df = pack_sequences(
        arr, "doc_id", "tokens", seq_len=64, n_groups=4, pad_value=0
    )
    want = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in want_df.collect()
    )
    got = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in packed.collect()
    )
    assert got == want
    # subword conservation: packed real tokens == encoded corpus tokens
    n_tok = arr.select(F.sum(F.size("tokens"))).collect()[0][0]
    assert packed.select(F.sum("n_real")).collect()[0][0] == n_tok

    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in st2 for r in st)

def test_pack_bpe_without_pack_raises(spark, tmp_path):
    """Review finding: --pack-bpe without --pack was silently ignored."""
    import jobs.run_dedup as RD

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    with pytest.raises(ValueError, match="pack_bpe_merges requires"):
        RD.run_dedup_pipeline(
            spark, docs, str(tmp_path / "o"), str(tmp_path / "c"),
            pack_bpe_merges=40,
        )


def test_dedup_pipeline_normalize_stage(spark, tmp_path):
    """--normalize canonicalizes byte forms BEFORE anything hashes (the
    CCNet order): a doc and its scrape twin that differ only in NFD-vs-NFC
    accents + CRLF line breaks + tab runs become byte-identical, so the
    minhash dedup actually collapses them (the un-normalized pipeline
    CANNOT — their shingle bytes differ); the surviving text is the
    canonical form, and the form participates in the lineage key (same
    flags resume: every stage skips)."""
    import unicodedata

    import jobs.run_dedup as RD

    nfc = "résumé café déjà vu naïve façade élite"
    mangled = (
        unicodedata.normalize("NFD", nfc).replace(" ", " \t") + "  \r\n"
    )
    filler = [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(10)))
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        [(1, nfc), (2, mangled)] + filler, "doc_id INT, text STRING"
    )
    kw = dict(buckets=2, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              normalize="NFC")

    out, ck = str(tmp_path / "out_nm"), str(tmp_path / "ck_nm")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 4  # clean(=normalize), signatures, clusters, output
    assert all(not r.skipped for st in stages for r in st)

    final = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(os.path.join(out, "deduped")).collect()}
    # the byte-form twins collapsed to the min-id keeper, text canonical
    assert 1 in final and 2 not in final
    assert final[1] == nfc
    assert len(final) == 1 + len(filler)

    # control: WITHOUT normalize the twins' shingle bytes differ — both
    # survive, proving the collapse above came from the normalize stage
    out2, ck2 = str(tmp_path / "out_nm0"), str(tmp_path / "ck_nm0")
    RD.run_dedup_pipeline(
        spark, docs, out2, ck2, buckets=2, k=3, n_hashes=16, bands=4,
        max_bucket_size=100,
    )
    raw = {r["doc_id"] for r in
           spark.read.parquet(os.path.join(out2, "deduped")).collect()}
    assert {1, 2} <= raw

    # same flags resume: everything skips (the form is in the lineage key)
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for stage in st2 for r in stage)


def test_dedup_pipeline_normalize_then_clean(spark, tmp_path):
    """--normalize composes with --clean in ONE rewrite stage, in CCNet
    order (byte form first, THEN line rules): doc 1's junk line has only
    2 real words once the tab run collapses, so the min_words line rule
    cuts it from the NORMALIZED text; doc 2's NFD accent ("e"+U+0301) is
    composed away and its trailing CRLF trimmed before the line rules
    judge it. Same-flag resume skips everything."""
    import unicodedata

    import jobs.run_dedup as RD

    good = "one two three four five.\nsix seven eight nine ten.\na b c d e."
    other = "red green blue cyan magenta.\nups downs lefts rights middles."
    nfd = other.replace("green", "gre\u0301en")
    docs = spark.createDataFrame(
        [(1, good + "\nbuy\t\tnow."), (2, nfd + "\r\n")],
        "doc_id INT, text STRING",
    )
    kw = dict(buckets=2, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              normalize="NFC", clean=True,
              clean_kwargs=dict(min_kept_lines=1))
    out, ck = str(tmp_path / "out_nc"), str(tmp_path / "ck_nc")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 4
    final = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(os.path.join(out, "deduped")).collect()}
    assert final[1] == good                  # junk line cut post-normalize
    assert "\u0301" not in final[2]          # NFD composed away
    assert final[2] == unicodedata.normalize("NFC", other.replace("green", "gre\u0301en"))
    # same flags resume: everything skips
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for stage in st2 for r in stage)


def test_dedup_pipeline_stats_stage(spark, tmp_path):
    """--stats appends the corpus report card: the persisted long-form
    table must equal the sketch operators run by hand over the final
    deduped corpus (HLL registers register-exact, HDR buckets bucket-exact,
    totals exact, quantile rows from the same bucket table), it must NOT
    invalidate any other stage when toggled on (stats change no bytes any
    stage reads), and an identical re-run skips it."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.operators import (
        hist_build,
        hist_quantiles,
        hll_build,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    kw = dict(buckets=2, k=3, n_hashes=8, bands=4, max_bucket_size=100)
    out, ck = str(tmp_path / "out_st"), str(tmp_path / "ck_st")

    # run 1 WITHOUT stats, run 2 WITH: the three base stages must all skip
    # (toggling stats does not touch their lineage), only stats runs
    RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, stats=True, **kw)
    assert len(stages) == 4  # sig, clusters, output, stats
    r_sig, r_clu, r_out, r_sts = stages
    assert all(r.skipped for st in (r_sig, r_clu, r_out) for r in st)
    assert all(not r.skipped for r in r_sts)

    st = spark.read.parquet(f"{out}/stats").drop("part_key")
    by_metric = {}
    for r in st.collect():
        by_metric.setdefault(r["metric"], set()).add((r["k"], r["v"]))

    final = spark.read.parquet(f"{out}/deduped").drop("part_key").select(
        "doc_id", "text"
    )
    # register-exact vs a direct build over the final corpus
    words = final.select(F.explode(F.split("text", " ")).alias("w"))
    want_regs = {
        (r["r"], r["rank"]) for r in hll_build(words, "w", p=14).collect()
    }
    assert by_metric["hll_word_register"] == want_regs
    # bucket-exact
    lens = final.select(F.length("text").cast("long").alias("v"))
    hb = hist_build(lens, "v", sub_bits=5)
    want_hist = {(r["b"], r["cnt"]) for r in hb.collect()}
    assert by_metric["len_hist_bucket"] == want_hist
    # quantile rows replay from the same bucket table
    for r in hist_quantiles(hb, [500_000, 990_000], sub_bits=5).collect():
        key = f"summary:doc_len_q{r['q_ppm']}"
        assert by_metric[key] == {(r["rank"], r["value"])}
    # exact totals
    n_docs = final.count()
    n_tokens = final.agg(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert by_metric["summary:n_docs"] == {(0, n_docs)}
    assert by_metric["summary:n_tokens"] == {(0, n_tokens)}
    # the distinct-word estimate is within HLL tolerance of the truth
    [(_, est)] = by_metric["summary:distinct_words_est"]
    true_distinct = words.distinct().count()
    assert abs(est - true_distinct) / true_distinct < 0.05

    # identical re-run: everything skips, stats included
    st2 = RD.run_dedup_pipeline(spark, docs, out, ck, stats=True, **kw)
    assert all(r.skipped for stage in st2 for r in stage)


def test_dedup_pipeline_epoch_upsampling_export(spark, tmp_path):
    """--epochs materializes per-source repetition into the training
    export only: 2.0 epochs everywhere exactly doubles the packed real
    tokens and the shard rows vs the epoch-free run, the corpus tables
    stay one-copy-per-doc, resume skips everything, and changing the
    rates re-runs ONLY the packed/shards stages (stage-local lineage)."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.functions.text import words

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source")
    base = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
                pack_len=64, pack_groups=4, pack_pad=0, shard_size=16)

    out0, ck0 = str(tmp_path / "out_e0"), str(tmp_path / "ck_e0")
    RD.run_dedup_pipeline(spark, docs, out0, ck0, **base)
    tok0 = (
        spark.read.parquet(f"{out0}/packed").select(F.sum("n_real"))
        .collect()[0][0]
    )
    n_shard_rows0 = spark.read.parquet(f"{out0}/shards").count()

    kw = dict(base, epoch_rates_ppm={"src0": 2_000_000},
              epoch_default_ppm=2_000_000)
    out, ck = str(tmp_path / "out_ep"), str(tmp_path / "ck_ep")
    stages = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert len(stages) == 6
    assert all(not r.skipped for st in stages for r in st)

    # exactly 2 copies of every surviving doc reach the training export;
    # the corpus table itself is NOT duplicated
    assert (
        spark.read.parquet(f"{out}/packed").select(F.sum("n_real"))
        .collect()[0][0] == 2 * tok0
    )
    # shards cover the packed rows (chunk count is NOT exactly 2x — the
    # doubled token stream amortizes each group's padding differently)
    assert (
        spark.read.parquet(f"{out}/shards").count()
        == spark.read.parquet(f"{out}/packed").count()
        > n_shard_rows0
    )
    ded = spark.read.parquet(f"{out}/deduped").drop("part_key", "cluster_id")
    assert ded.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert ded.count() == spark.read.parquet(f"{out0}/deduped").count()

    # resume: identical flags skip every stage
    again = RD.run_dedup_pipeline(spark, docs, out, ck, **kw)
    assert all(r.skipped for st in again for r in st)

    # epoch-rate change invalidates ONLY the export stages
    kw2 = dict(kw, epoch_rates_ppm={"src0": 3_000_000})
    third = RD.run_dedup_pipeline(spark, docs, out, ck, **kw2)
    skipped = [all(r.skipped for r in st) for st in third]
    assert skipped == [True, True, True, True, False, False]

    # doc-level export (no packing): shard rows double exactly
    kwd = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
               shard_size=16, epoch_rates_ppm={"src0": 2_000_000},
               epoch_default_ppm=2_000_000)
    outd, ckd = str(tmp_path / "out_ed"), str(tmp_path / "ck_ed")
    RD.run_dedup_pipeline(spark, docs, outd, ckd, **kwd)
    n_docs = spark.read.parquet(f"{outd}/deduped").count()
    shd = spark.read.parquet(f"{outd}/shards")
    assert shd.count() == 2 * n_docs
    # the two copies of one doc carry distinct composite identities
    assert (
        shd.groupBy("_eid").count().filter("count > 1").count() == 0
    )

    # epochs without a training export is a configuration error
    import pytest

    with pytest.raises(ValueError, match="pack_len and/or shard_size"):
        RD.run_dedup_pipeline(
            spark, docs, str(tmp_path / "x"), str(tmp_path / "y"),
            buckets=3, epoch_rates_ppm={"src0": 2_000_000},
        )


def test_dedup_pipeline_pack_with_fim(spark, tmp_path):
    """--fim-ppm rewrites a deterministic fraction of the tokenized docs
    into PSM order before packing: packed rows equal the hand-composed
    vocab -> encode -> fim_transform -> pack chain, sentinels appear (and
    only the three negative ids), total real tokens grow by exactly
    3 x n_fim docs, and changing the rate invalidates the pack stages on
    resume (lineage) while the corpus stages skip."""
    import jobs.run_dedup as RD
    from geofeaturegeneration_spark.functions.text import words
    from geofeaturegeneration_spark.operators import (
        build_vocab,
        encode_with_vocab,
        fim_transform,
        pack_sequences,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    kw = dict(buckets=3, k=3, n_hashes=16, bands=4, max_bucket_size=100,
              pack_len=64, pack_groups=4, pack_pad=0)

    out, ck = str(tmp_path / "out_fim"), str(tmp_path / "ck_fim")
    RD.run_dedup_pipeline(spark, docs, out, ck, fim_rate_ppm=500_000, **kw)
    packed = spark.read.parquet(f"{out}/packed").drop("part_key")
    final = spark.read.parquet(f"{out}/deduped").drop(
        "part_key", "cluster_id"
    )

    toks = final.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "token")
    )
    vocab = build_vocab(toks.select("token"), "token")
    enc = encode_with_vocab(toks, vocab, "token")
    arr = enc.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("vocab_id")))
            ),
            lambda s: s["vocab_id"].cast("int"),
        ).alias("tokens")
    )
    fim = fim_transform(
        arr, "tokens", rate_ppm=500_000, prefix_tok=-1, suffix_tok=-2,
        middle_tok=-3, id_col="doc_id",
    )
    want_df = pack_sequences(
        fim.select("doc_id", F.col("tokens_fim").alias("tokens")),
        "doc_id", "tokens", seq_len=64, n_groups=4, pad_value=0,
    )
    want = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in want_df.collect()
    )
    got = sorted(
        (r["grp"], r["chunk_id"], tuple(r["tokens"]), r["n_real"])
        for r in packed.collect()
    )
    assert got == want

    # sentinel accounting: negatives are exactly {-1,-2,-3}, and the real
    # token total is the corpus total + 3 per transformed doc
    n_fim = fim.filter("is_fim = 1").count()
    assert n_fim > 0
    neg = (
        packed.select(F.explode("tokens").alias("t")).filter("t < 0")
        .groupBy("t").count().collect()
    )
    assert {r["t"] for r in neg} == {-1, -2, -3}
    assert all(r["count"] == n_fim for r in neg)
    n_tok = final.select(F.sum(F.size(words(F.col("text"))))).collect()[0][0]
    assert (
        packed.select(F.sum("n_real")).collect()[0][0] == n_tok + 3 * n_fim
    )

    # rate change invalidates the export stages but not the corpus stages
    st = RD.run_dedup_pipeline(
        spark, docs, out, ck, fim_rate_ppm=250_000, **kw
    )
    sigs, clusters, output, voc, pck = st
    assert all(r.skipped for r in sigs)
    assert all(not r.skipped for r in pck)


def test_fim_without_pack_raises(spark, tmp_path):
    import jobs.run_dedup as RD

    docs = spark.createDataFrame([(1, "a b c")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="fim_rate_ppm requires pack_len"):
        RD.run_dedup_pipeline(
            spark, docs, str(tmp_path / "o"), str(tmp_path / "c"),
            buckets=2, fim_rate_ppm=100_000,
        )


def test_semantic_stage_empty_corpus_graceful(spark, tmp_path):
    """A corpus that dies entirely upstream (here: every doc fails the C4
    page verdict) must flow 0 rows through the remaining stages instead of
    crashing the semantic quantizer trainer on an empty sample."""
    import jobs.run_dedup as RD

    docs = spark.createDataFrame(
        [(i, "short line\nno punct") for i in range(8)],
        "doc_id BIGINT, text STRING",
    )
    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(8)],
        "doc_id BIGINT, embedding ARRAY<FLOAT>",
    )
    stages = RD.run_dedup_pipeline(
        spark, docs, str(tmp_path / "o"), str(tmp_path / "c"),
        buckets=2, clean=True, embeddings=emb,
    )
    # every stage completed with zero rows (an all-empty partitioned
    # write leaves no parquet footers, so assert on the recorded stage
    # metrics rather than re-reading schema-less empty dirs)
    assert all(r.rows == 0 for st in stages for r in st if r.rows is not None)


def test_semantic_exemplar_must_survive_clean(spark, tmp_path):
    """Regression: a doc removed by the C4 page verdict must not elect
    itself the min-id semantic exemplar and drop a SURVIVING near-dup —
    the survivor's content would vanish from the output entirely."""
    import jobs.run_dedup as RD

    good = "alpha beta gamma delta epsilon zeta.\n" * 4
    rows = [
        (1, "too short"),          # fails the page verdict
        (2, good),                 # survives
        (3, "also very short"),    # fails
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    # doc 2's vector is a near-dup of dropped doc 1's
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.999, 0.001, 0.0, 0.0]),
         (3, [0.0, 1.0, 0.0, 0.0])],
        "doc_id BIGINT, embedding ARRAY<FLOAT>",
    )
    RD.run_dedup_pipeline(
        spark, docs, str(tmp_path / "o"), str(tmp_path / "c"),
        buckets=2, clean=True, embeddings=emb,
        semantic_clusters=2, semantic_threshold=0.95,
    )
    deduped = spark.read.parquet(str(tmp_path / "o" / "deduped"))
    assert [r["doc_id"] for r in deduped.collect()] == [2]
