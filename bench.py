"""Benchmark harness — prints ONE JSON line for the driver.

Headline numbers:
- ``index_build_synth``: full engine index build (field-map → dense IDs →
  tokenize → posting blocks → store) over the deterministic synthetic code
  corpus scaled to the SF (500k docs/SF), the CPU-bound throughput metric
  (docs/sec, postings/sec in ``extra``).
- ``index_build_docs`` + ``bm25_query_set``: build over the driver's
  documents table and answer the reference query set (block-max WAND).
- ``bm25_phrase_hot_set``: phrases of the corpus' highest-df terms — the
  positional kernel's worst case (candidate sets ≈ the whole corpus).
- dedup / ANN / text / TPC-H representative queries from the entry contract.

Timing method: every task runs once per PASS and the per-task minimum over
all passes is reported. Passes INTERLEAVE the whole suite (A₁ B₁ C₁ … A₂
B₂ C₂ …) instead of repeating each task back-to-back, so a burst of CPU
steal / GC pressure lands on different tasks in different passes — the min
then reflects each task's true cost, not its luck within one hot window
(round-2 showed ±30% family drift with back-to-back repeats on this
shared-VM sandbox).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py and recorded in BASELINE.md / BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PASSES = 2

# Drift-tracking subset (VERDICT r3 task 6): the 15 round-1 tasks, FROZEN —
# run FIRST in every pass (before any newer task can warm or pressure the
# JVM differently round-over-round) and reported as their own geomean vs
# the round-1 artifact, so suite growth can't contaminate the trend.
FROZEN_R1_TASKS = (
    "index_build_synth", "index_build_docs", "bm25_query_set_wand",
    "bm25_phrase_set", "bm25_prefix_set", "bm25_fuzzy_set",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "text_quality", "doc_fingerprint",
    "events_sessionize", "tpch_q1_pricing_summary",
    "tpch_revenue_by_nation",
)
# BENCH_r01.json "queries" verbatim (sf0.1, 32 cpus) — the fixed yardstick
R1_BASELINE_SF01 = {
    "index_build_synth": 11.546, "index_build_docs": 3.723,
    "bm25_query_set_wand": 1.481, "bm25_phrase_set": 1.525,
    "bm25_prefix_set": 1.431, "bm25_fuzzy_set": 1.476,
    "dedup_exact": 0.41, "dedup_minhash_lsh": 2.559,
    "dedup_simhash": 1.377, "ann_cosine_topk": 0.635,
    "text_quality": 0.815, "doc_fingerprint": 1.05,
    "events_sessionize": 0.395, "tpch_q1_pricing_summary": 0.305,
    "tpch_revenue_by_nation": 1.148,
}

# phrases over the corpus' hottest terms (df ≈ 0.78 × corpus at sf0.1):
# the AND candidate set is nearly the whole corpus, so the vectorized
# span kernel must chain fat position lists — its measured worst case
HOT_PHRASE_QUERIES = [
    (0, "stream data"),
    (1, "value spark"),
    (2, "sort query"),
    (3, "order column"),
    (4, "stream data value"),
]


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("d2es-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # shuffle spill on tmpfs — the sandbox /tmp disk is slow and noisy;
        # a real cluster has node-local SSDs (same methodology as
        # scripts/scaling_bench.py)
        .config("spark.local.dir", "/dev/shm/spark-bench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import pandas as pd

    from dynamo2es_lambda_spark import IndexerConfig
    from dynamo2es_lambda_spark.plans import build, entry_queries, search
    from dynamo2es_lambda_spark.sources import synthetic

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- corpus materialized to parquet UNTIMED: the metric is index-build
    # throughput over an input table, not generator speed
    n_synth = max(int(500_000 * sf), 2000)
    synth_store = tempfile.mkdtemp(prefix="d2es_bench_synth_")
    docs_store = tempfile.mkdtemp(prefix="d2es_bench_docs_")
    mf_store_path = tempfile.mkdtemp(prefix="d2es_bench_mf_")
    corpus_path = os.path.join(
        tempfile.gettempdir(), f"d2es_bench_corpus_{n_synth}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synthetic.corpus_df(spark, n_synth, partitions=2 * cpus).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    cfg = IndexerConfig(index="code")

    def build_synth():
        return build.build_index(
            corpus, cfg, synth_store,
            num_buckets=64, resume=False,
        )

    def build_docs():
        from pyspark.sql import functions as F

        c = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang",
                F.col("text").alias("content"),
            )
        )
        return build.build_index(
            c, IndexerConfig(index="docs", id_field="docid"), docs_store,
            num_buckets=32, resume=False, positions=True,
        )

    def build_mf():
        from pyspark.sql import functions as F

        c = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang", "text", "source",
            )
        )
        return build.build_index(
            c, IndexerConfig(index="docs", id_field="docid"), mf_store_path,
            num_buckets=32, resume=False, fields=("text", "source"),
        )

    # store handles re-load per call (one meta.json read) — the stores are
    # rebuilt every pass, so a cached handle would go stale between passes
    def store():
        return search.load_store(docs_store)

    def mf_store():
        return search.load_store(mf_store_path)

    qpdf = pd.DataFrame(entry_queries.FT_QUERIES, columns=["qid", "query"])
    ph = pd.DataFrame(entry_queries.PHRASE_QUERIES, columns=["qid", "query"])
    hot = pd.DataFrame(HOT_PHRASE_QUERIES, columns=["qid", "query"])
    pf = pd.DataFrame(entry_queries.PREFIX_QUERIES, columns=["qid", "prefix"])
    fz = pd.DataFrame(entry_queries.FUZZY_QUERIES, columns=["qid", "term"])
    wc = pd.DataFrame(
        entry_queries.WILDCARD_QUERIES, columns=["qid", "pattern"]
    )
    bq = pd.DataFrame(
        entry_queries.BOOL_QUERIES,
        columns=["qid", "must", "should", "must_not"],
    )
    mm = pd.DataFrame(entry_queries.MM_QUERIES, columns=["qid", "query"])
    pp = pd.DataFrame(entry_queries.PP_QUERIES, columns=["qid", "query"])
    qs = pd.DataFrame(entry_queries.QS_QUERIES, columns=["qid", "query"])
    rs = pd.DataFrame(entry_queries.RESCORE_QUERIES, columns=["qid", "query"])
    sig = pd.DataFrame(entry_queries.SIG_QUERIES, columns=["qid", "query"])
    corpus_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # --- CDC apply+compact: base store built ONCE untimed over a corpus
    # slice; each pass copies it (tiny vs the timed work) and applies a
    # deterministic event batch (10% MODIFY, 5% REMOVE, 5% INSERT) with
    # compaction — the index-maintenance cost the bench previously skipped
    import numpy as np

    from dynamo2es_lambda_spark.plans import cdc as cdc_plans
    from dynamo2es_lambda_spark.streaming import apply_cdc as acdc

    cfg_cdc = IndexerConfig(index="code", version_field="version",
                            record_error_hook=lambda df: None)
    n_cdc = min(max(n_synth // 5, 2000), 20000)
    cdc_base = tempfile.mkdtemp(prefix="d2es_bench_cdc_base_")
    cdc_pdf = synthetic.corpus_pdf(np.arange(n_cdc))
    cdc_pdf["version"] = 0
    build.build_index(
        spark.createDataFrame(cdc_pdf), cfg_cdc, cdc_base,
        num_buckets=32, resume=False,
    )

    def _img(row, version, content=None):
        return {
            "repo": row["repo"], "path": row["path"],
            "commit": row["commit"], "lang": row["lang"],
            "content": content if content is not None else row["content"],
            "version": version,
        }

    ev_rows = []
    for i in range(0, n_cdc // 10):
        r = cdc_pdf.iloc[i]
        ev_rows.append(("MODIFY",
                        {"repo": r["repo"], "path": r["path"],
                         "commit": r["commit"]},
                        _img(r, 1, r["content"] + " modified token"),
                        _img(r, 0)))
    for i in range(n_cdc // 10, n_cdc // 10 + n_cdc // 20):
        r = cdc_pdf.iloc[i]
        ev_rows.append(("REMOVE",
                        {"repo": r["repo"], "path": r["path"],
                         "commit": r["commit"]}, None, _img(r, 0)))
    ins = synthetic.corpus_pdf(np.arange(n_cdc, n_cdc + n_cdc // 20))
    for _, r in ins.iterrows():
        ev_rows.append(("INSERT",
                        {"repo": r["repo"], "path": r["path"],
                         "commit": r["commit"]}, _img(r, 1), None))
    cdc_events = spark.createDataFrame(
        pd.DataFrame(ev_rows, columns=["event_name", "keys", "new_image",
                                       "old_image"]),
        schema=acdc.EVENT_SCHEMA,
    ).localCheckpoint(eager=True)  # materialize: the batch, not its build

    def cdc_apply_compact():
        dst = tempfile.mkdtemp(prefix="d2es_bench_cdc_run_")
        shutil.rmtree(dst)
        shutil.copytree(cdc_base, dst)
        cdc_plans.apply_changes(cdc_events, cfg_cdc, dst, compact=True)
        shutil.rmtree(dst, ignore_errors=True)

    # LM-stats store for the suggester tasks: its own build task (measures
    # the lm_stats=True overhead honestly) + the index-statistics suggest
    lm_store_path = tempfile.mkdtemp(prefix="d2es_bench_lm_")

    def build_docs_lm():
        from pyspark.sql import functions as F

        c = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang",
                F.col("text").alias("content"),
            )
        )
        return build.build_index(
            c, IndexerConfig(index="docs", id_field="docid"), lm_store_path,
            num_buckets=32, resume=False, positions=True, lm_stats=True,
        )

    def lm_store():
        return search.load_store(lm_store_path)

    sug = pd.DataFrame(
        [(0, "strem data"), (1, "custmer valu"), (2, "windw")],
        columns=["qid", "text"],
    )
    span_or_cl = pd.DataFrame(
        [(0, "stream data"), (0, "sort query"), (1, "order column")],
        columns=["qid", "clause"],
    )
    span_not_q = pd.DataFrame(
        [(0, "stream data", "data value")],
        columns=["qid", "include", "exclude"],
    )

    tasks: list[tuple[str, object]] = [
        ("index_build_synth", build_synth),
        ("cdc_apply_compact", cdc_apply_compact),
        ("index_build_docs", build_docs),
        ("index_build_docs_multifield", build_mf),
        ("bm25_query_set_wand",
         lambda: search.search(
             spark, store(), qpdf, k=10, algo="wand").collect()),
        ("bm25_phrase_set",
         lambda: search.search_phrase(spark, store(), ph, k=10).collect()),
        ("bm25_phrase_hot_set",
         lambda: search.search_phrase(spark, store(), hot, k=10).collect()),
        ("bm25_prefix_set",
         lambda: search.search_prefix(spark, store(), pf, k=10).collect()),
        ("bm25_fuzzy_set",
         lambda: search.search_fuzzy(spark, store(), fz, k=10).collect()),
        ("bm25_wildcard_set",
         lambda: search.search_wildcard(spark, store(), wc, k=10).collect()),
        ("bm25_bool_set",
         lambda: search.search_bool(spark, store(), bq, k=10).collect()),
        # index-filtered WAND over the whole store: stresses the cogroup
        # constraint path (allow set = full corpus × queries)
        ("bm25_filtered_wand_set",
         lambda: search.search(
             spark, store(), qpdf, k=10, algo="wand", index="docs"
         ).collect()),
        ("bm25_multi_match_set",
         lambda: search.multi_match(
             spark, mf_store(), mm, fields=entry_queries.MM_BOOSTS, k=10,
             tie_breaker=entry_queries.MM_TIE,
         ).collect()),
        ("bm25_combined_fields_set",
         lambda: search.search_combined_fields(
             spark, mf_store(), mm, fields=entry_queries.CF_WEIGHTS, k=10,
         ).collect()),
        ("bm25_phrase_prefix_set",
         lambda: search.search_phrase_prefix(
             spark, store(), pp, k=10).collect()),
        ("bm25_query_string_set",
         lambda: search.search_query_string(
             spark, store(), qs, k=10).collect()),
        ("bm25_rescore_set",
         lambda: search.search_rescore(
             spark, store(), rs, k=10, window_size=50, rescore_weight=2.0
         ).collect()),
        ("significant_terms_set",
         lambda: search.significant_terms(
             spark, store(), sig, corpus_docs, text_col="text",
             id_col="doc_id", k=10,
         ).collect()),
        ("index_build_docs_lm", build_docs_lm),
        ("suggest_phrase_set",
         lambda: search.suggest_phrase(
             spark, lm_store(), probes=sug, k=3).collect()),
        ("bm25_span_or_set",
         lambda: search.search_span_or(
             spark, store(), span_or_cl, k=10).collect()),
        ("bm25_span_not_set",
         lambda: search.search_span_not(
             spark, store(), span_not_q, k=10).collect()),
        ("script_score_set",
         lambda: search.search_script_score(
             spark, store(), qpdf,
             "_score / (1.0 + sqrt(dl)) + log1p(dl)", k=10,
         ).collect()),
        # round-4 agg families: each is one _match_set job + metadata
        # join + hash/window aggs — measured to prove the second hop
        # stays bucket-cardinality
        ("agg_metric_set",
         lambda: search.search_extended_stats_agg(
             spark, store(), qpdf, value_col="dl"
         ).collect()),
        ("agg_pipeline_set",
         lambda: search.search_histogram_pipeline(
             spark, store(), qpdf, interval=16.0, value_col="dl"
         ).collect()),
        ("agg_cumulative_set",
         lambda: search.search_cumulative_cardinality(
             spark, store(), qpdf, interval=16.0, group_col="lang",
             value_col="dl",
         ).collect()),
        ("adjacency_matrix_set",
         lambda: search.search_adjacency_matrix(
             spark, store(),
             {"a": "stream", "b": "data value", "c": "sort"},
         ).collect()),
        ("diversified_sampler_set",
         lambda: search.search_diversified_sampler(
             spark, store(), qpdf, shard_size=10, group_col="lang",
             max_docs_per_value=3,
         ).collect()),
        ("termvectors_set",
         lambda: search.termvectors(
             spark, store(), [str(i) for i in range(1, 9)]
         ).collect()),
        ("span_containing_set",
         lambda: search.search_span_containing(
             spark, store(),
             pd.DataFrame([(0, "slow hash batch", "hash batch")],
                          columns=["qid", "big", "little"]),
             k=10, mode="containing",
         ).collect()),
        ("significant_text_set",
         lambda: search.significant_text(
             spark, store(), qpdf, sample_k=30, k=10, min_doc_count=2,
         ).collect()),
    ]
    for name in (
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_cosine_topk",
        "text_quality",
        "text_perplexity",
        "doc_fingerprint",
        "events_sessionize",
        "tpch_q1_pricing_summary",
        "tpch_revenue_by_nation",
        # round-4 session families: hybrid fusion (both legs + full-outer
        # fuse), rank_eval (ranking + broadcast qrels), terms_set (per-doc
        # msm gate), exact-quantile agg, one-pass domain clustering, and
        # the percentile quality gate
        "fts_rrf",
        "fts_rank_eval",
        "fts_terms_set",
        "fts_mad",
        "embed_cluster_stats",
        "documents_quality_pct",
        # pipeline IV: interpolated trigram LM (three gram-vocab
        # aggregations + vocab-keyed joins) and zero-shuffle window
        # chunking
        "text_perplexity_trigram",
        "corpus_chunk_windows",
        "bpe_pair_counts",
        # round-4 late families: per-field positional multi_match, the
        # join-field inner_hits fold, and corpus trigram mining (explode
        # + one hash agg + distributed top-k, no global sort)
        "fts_multi_match_phrase",
        "fts_has_child_inner",
        "corpus_top_ngrams",
        # round-4 continuation: learned-sparse retrieval (posting dot
        # product), DSIR hashed-ngram importance resampling (two
        # multinomials + broadcast log-ratio join), Bloom membership
        # (broadcast bitset semi-join), index-native pair mining, and
        # the true-geohash grid agg
        "fts_sparse_vector",
        "dsir_select",
        "dedup_bloom",
        "fts_frequent_item_sets",
        "fts_geohash_grid",
        # final round-4 batch: SemDeDup within-cluster cosine dedup,
        # corpus-half MinHash overlap (one distinct-shingle pass + k
        # permutation mins), cross-field masked spans
        "dedup_semantic",
        "corpus_overlap_minhash",
        "fts_span_field_masking",
        # full-Lucene query_string (AND/OR/NOT, parens, field: clauses):
        # one pruned posting read for every atom of every query, boolean
        # tree evaluated as one generated codegen expression
        "fts_lucene_query_string",
        "fts_ip_prefix",
        # round-5 families: WAND-path msm + score-cursor paging (the
        # scale-critical queries that used to fall back to exhaustive),
        # dual-stack IPv6 range buckets, mercator + hex grid aggs, and
        # the search_as_you_type store (edge-ngram subfield build is
        # inside the entry's cached-store cost; the query here is the
        # pure-index-hit bool_prefix)
        "fts_wand_msm",
        "fts_wand_after",
        "fts_ip_range_v6",
        "fts_geotile_grid",
        "fts_geohex_grid",
        "fts_search_as_you_type",
    ):
        fn = entry_queries.SPARK_QUERIES[name]
        tasks.append((name, lambda f=fn: f(spark, sf_dir).collect()))

    # frozen drift subset runs FIRST in every pass, in its frozen order;
    # newer tasks follow in declaration order
    task_map = dict(tasks)
    assert all(n in task_map for n in FROZEN_R1_TASKS)
    tasks = [
        (n, task_map[n]) for n in FROZEN_R1_TASKS
    ] + [t for t in tasks if t[0] not in set(FROZEN_R1_TASKS)]

    # environment calibration probe: a FIXED pure-JVM job (range-sum,
    # no engine code, plan identical every round) measured as the min of
    # 3 reps. Round-over-round drift in this number is sandbox/VM drift,
    # not engine drift — the denominator for reading the frozen-subset
    # geomean (r4: tpch_q1's unchanged plan ran 1.8x its r1 time while
    # this probe confirms the VM itself slowed; see BENCH/BASELINE.md).
    cal = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        cal = min(cal, time.monotonic() - t0)
    extra["calibration_range_sum_sec"] = round(cal, 3)

    # interleaved passes: min per task across full-suite sweeps
    for _ in range(N_PASSES):
        for name, fn in tasks:
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            queries[name] = min(queries.get(name, float("inf")), dt)

    extra["synth_docs"] = n_synth
    extra["synth_docs_per_sec"] = round(
        n_synth / queries["index_build_synth"], 1
    )
    # posting throughput from lineage metrics (north-star metric)
    lineage = spark.read.parquet(os.path.join(synth_store, "lineage"))
    agg = lineage.groupBy().sum("postings", "compressed_bytes").first()
    extra["synth_postings"] = int(agg[0])
    extra["synth_postings_per_sec"] = round(
        agg[0] / queries["index_build_synth"], 1
    )
    extra["synth_compressed_bytes"] = int(agg[1])
    extra["bm25_qps"] = round(
        len(qpdf) / queries["bm25_query_set_wand"], 2
    )
    extra["bench_passes"] = N_PASSES
    if abs(sf - 0.1) < 1e-9:
        # drift metric: geomean of (this round / r1) over the frozen subset
        import math

        ratios = [
            queries[n] / R1_BASELINE_SF01[n] for n in FROZEN_R1_TASKS
        ]
        extra["frozen_subset_geomean_vs_r1"] = round(
            math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 4
        )
        extra["frozen_subset_sec"] = round(
            sum(queries[n] for n in FROZEN_R1_TASKS), 3
        )

    extra["cdc_events"] = len(ev_rows)
    shutil.rmtree(synth_store, ignore_errors=True)
    shutil.rmtree(lm_store_path, ignore_errors=True)
    shutil.rmtree(docs_store, ignore_errors=True)
    shutil.rmtree(mf_store_path, ignore_errors=True)
    shutil.rmtree(cdc_base, ignore_errors=True)
    total = round(sum(queries.values()), 3)
    extra["task_count"] = len(queries)

    # Full per-task detail goes to a file; the FINAL stdout line stays
    # compact. The driver's artifact capture keeps only the last ~2000
    # chars of stdout — round 4's 58-task one-line JSON overflowed it and
    # shipped as ``"parsed": null`` (VERDICT r4, finding 1). The printed
    # ``queries`` map therefore carries ONLY the frozen 15-task drift
    # subset; everything else lives in BENCH/bench_detail_latest.json.
    detail = {
        "metric": "engine_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "extra": extra,
    }
    detail_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH"
    )
    os.makedirs(detail_dir, exist_ok=True)
    detail_path = os.path.join(detail_dir, "bench_detail_latest.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    sys.stderr.write(f"full per-task detail -> {detail_path}\n")

    compact_extra = {
        k: extra[k]
        for k in (
            "frozen_subset_geomean_vs_r1",
            "frozen_subset_sec",
            "bm25_qps",
            "synth_docs_per_sec",
            "synth_postings_per_sec",
            "calibration_range_sum_sec",
            "bench_passes",
            "task_count",
        )
        if k in extra
    }
    compact_extra["detail_file"] = "BENCH/bench_detail_latest.json"
    line = json.dumps(
        {
            "metric": "engine_suite_sec",
            "value": total,
            "unit": "sec",
            "queries": {n: queries[n] for n in FROZEN_R1_TASKS},
            "sf": sf,
            "cpus": cpus,
            "extra": compact_extra,
        }
    )
    assert len(line) < 1900, f"final bench line too long: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
