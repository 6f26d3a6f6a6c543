"""Focused benchmark harness for optimization work (guide §1.4).

``bench.py`` is FROZEN for driver measurement; this file is the builder's
iteration loop: run any subset of the suite's tasks with per-task timing
and a configurable pass count. The task definitions are a verbatim copy of
bench.py's (same stores, same query sets, same methodology — interleaved
passes, min per task); only the selection/reporting differs.

Usage:
  python bench_extra.py [--passes N] [task ...]   # default: all tasks
  python bench_extra.py --list                    # list task names

Env contract matches bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HOT_PHRASE_QUERIES, build_session  # noqa: E402


def make_tasks(spark, sf_dir: str, cpus: int, sf: float):
    """Verbatim task set from bench.py (same closures), returned as a list
    of (name, fn, cleanup_paths)."""
    import numpy as np
    import pandas as pd

    from dynamo2es_lambda_spark import IndexerConfig
    from dynamo2es_lambda_spark.plans import build, cdc as cdc_plans
    from dynamo2es_lambda_spark.plans import entry_queries, search
    from dynamo2es_lambda_spark.sources import synthetic
    from dynamo2es_lambda_spark.streaming import apply_cdc as acdc

    n_synth = max(int(500_000 * sf), 2000)
    synth_store = tempfile.mkdtemp(prefix="d2es_benchx_synth_")
    docs_store = tempfile.mkdtemp(prefix="d2es_benchx_docs_")
    mf_store_path = tempfile.mkdtemp(prefix="d2es_benchx_mf_")
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
            corpus, cfg, synth_store, num_buckets=64, resume=False,
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

    cfg_cdc = IndexerConfig(index="code", version_field="version",
                            record_error_hook=lambda df: None)
    n_cdc = min(max(n_synth // 5, 2000), 20000)
    cdc_base = tempfile.mkdtemp(prefix="d2es_benchx_cdc_base_")
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
    ).localCheckpoint(eager=True)

    def cdc_apply_compact():
        dst = tempfile.mkdtemp(prefix="d2es_benchx_cdc_run_")
        shutil.rmtree(dst)
        shutil.copytree(cdc_base, dst)
        cdc_plans.apply_changes(cdc_events, cfg_cdc, dst, compact=True)
        shutil.rmtree(dst, ignore_errors=True)

    lm_store_path = tempfile.mkdtemp(prefix="d2es_benchx_lm_")

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

    tasks = [
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
             __import__("pandas").DataFrame(
                 [(0, "slow hash batch", "hash batch")],
                 columns=["qid", "big", "little"]),
             k=10, mode="containing",
         ).collect()),
        ("significant_text_set",
         lambda: search.significant_text(
             spark, store(), qpdf, sample_k=30, k=10, min_doc_count=2,
         ).collect()),
    ]
    for name in (
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "ann_cosine_topk", "text_quality", "text_perplexity",
        "doc_fingerprint", "events_sessionize", "tpch_q1_pricing_summary",
        "tpch_revenue_by_nation", "fts_rrf", "fts_rank_eval",
        "fts_terms_set", "fts_mad", "embed_cluster_stats",
        "documents_quality_pct", "text_perplexity_trigram",
        "corpus_chunk_windows", "bpe_pair_counts", "fts_multi_match_phrase",
        "fts_has_child_inner", "corpus_top_ngrams", "fts_sparse_vector",
        "dsir_select", "dedup_bloom", "fts_frequent_item_sets",
        "fts_geohash_grid", "dedup_semantic", "corpus_overlap_minhash",
        "fts_span_field_masking", "fts_lucene_query_string",
        "fts_ip_prefix", "fts_wand_msm", "fts_wand_after",
        "fts_ip_range_v6", "fts_geotile_grid", "fts_geohex_grid",
        "fts_search_as_you_type",
    ):
        fn = entry_queries.SPARK_QUERIES[name]
        tasks.append((name, lambda f=fn: f(spark, sf_dir).collect()))

    cleanup = [synth_store, docs_store, mf_store_path, cdc_base,
               lm_store_path]
    # pre-build the query-side stores untimed so a filtered task subset
    # that skips the build tasks still has stores to query
    prebuild = {"index_build_docs": build_docs,
                "index_build_docs_multifield": build_mf,
                "index_build_docs_lm": build_docs_lm}
    return tasks, cleanup, prebuild


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    list_mode = "--list" in args
    if list_mode:
        args.remove("--list")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tasks, cleanup, prebuild = make_tasks(spark, sf_dir, cpus, sf)
    if list_mode:
        print("\n".join(n for n, _ in tasks))
        spark.stop()
        return
    selected = set(args)
    if selected:
        unknown = selected - {n for n, _ in tasks}
        if unknown:
            raise SystemExit(f"unknown tasks: {sorted(unknown)}")
        tasks = [(n, f) for n, f in tasks if n in selected]
        for bname, bfn in prebuild.items():
            if bname not in selected:
                print(f"prebuild: {bname}", file=sys.stderr)
                bfn()

    queries: dict[str, float] = {}
    tracker = spark.sparkContext.statusTracker()
    jobs: dict[str, int] = {}
    for p in range(passes):
        for name, fn in tasks:
            spark.sparkContext.setJobGroup(f"bx_{name}_{p}", name)
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            queries[name] = min(queries.get(name, float("inf")), dt)
            nj = len(tracker.getJobIdsForGroup(f"bx_{name}_{p}"))
            jobs[name] = nj
            print(f"pass{p}: {name} {dt:.3f}s jobs={nj}", file=sys.stderr)
    for d in cleanup:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"queries": queries, "jobs": jobs,
                      "total": round(sum(queries.values()), 3),
                      "passes": passes, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
