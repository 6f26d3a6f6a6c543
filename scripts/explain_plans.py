"""Generate PLANS.md: physical-plan evidence for the headline queries.

For each representative operator this captures ``explain('formatted')`` and
extracts the scale-relevant facts a plan reviewer checks:
  - partition pruning into the posting store (PartitionFilters on
    part/term_bucket) — a query touches only its terms' buckets;
  - predicate pushdown + column pruning at the parquet scans
    (PushedFilters / ReadSchema);
  - broadcast joins for the small sides (query-term table, top-k result,
    dimension tables) — no shuffle of the big side;
  - exchange count: the index build has exactly ONE exchange.

Usage: python scripts/explain_plans.py  (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def trim(plan: str, max_lines: int = 60) -> str:
    lines = [ln.rstrip() for ln in plan.splitlines()]
    if len(lines) > max_lines:
        head = lines[: max_lines - 4]
        head += ["   ... (trimmed) ...", *lines[-3:]]
        lines = head
    return "\n".join(lines)


def facts(plan: str) -> list[str]:
    out = []
    n_ex = len(re.findall(
        r"^\(\d+\) Exchange|Exchange (hash|range)partitioning",
        plan, re.MULTILINE,
    ))
    out.append(f"shuffle exchanges: {n_ex}")
    n_bc = len(re.findall(
        r"^\(\d+\) Broadcast(HashJoin|Exchange)", plan, re.MULTILINE
    ))
    if n_bc:
        out.append(f"broadcast joins/exchanges: {n_bc}")
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    for p in {p.strip() for p in pf if p.strip()}:
        out.append(f"partition pruning: {p[:160]}")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    for p in sorted({p.strip() for p in pushed if p.strip()})[:3]:
        out.append(f"pushed filters: {p[:160]}")
    return out


def main() -> None:
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dynamo2es_lambda_spark import IndexerConfig
    from dynamo2es_lambda_spark.operators import dedup, fieldmap, ids, postings
    from dynamo2es_lambda_spark.plans import build, entry_queries, search

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections: list[tuple[str, str, str]] = []  # (title, commentary, plan)

    # --- 1. index build: the one exchange ---
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    corpus = docs.select(
        F.col("doc_id").cast("string").alias("docid"),
        "lang",
        F.col("text").alias("content"),
    )
    cfg = IndexerConfig(index="docs", id_field="docid")
    mapped = fieldmap.apply_field_mapping(
        corpus, cfg, key_cols=("docid",), content_col="content"
    ).filter(F.col("error").isNull())
    mapped = fieldmap.pick_document_fields(mapped, cfg)
    with_id = mapped.withColumn(
        "doc_int", F.xxhash64(F.col("doc_id"), F.lit("b0"))
    )
    term_rows = ids.tokenize_terms_rows(with_id, content_col="content")
    segments = postings.encode_term_blocks(
        term_rows, num_buckets=32, seg_shift=55
    )
    sections.append((
        "Index build, posting half (scan → term-only tokenize → encode)",
        "The posting half of the split build (round 6): ONE hash "
        "exchange, keyed (term_bucket, seg), carrying ONLY "
        "(doc_int, term, tf, dl) — no null marker metadata width. The "
        "tokenizer is a single MapInPandas crossing; everything before "
        "it is a columnar parquet scan with column pruning (ReadSchema "
        "carries only doc_id/text). Doc-stat markers are a separate "
        "shuffle-free JVM projection (plans/build._build_batch_once).",
        plan_of(segments),
    ))

    # --- 2. query: pruned posting read + broadcast joins ---
    store_path = "/tmp/d2es_plans_store"
    if not os.path.exists(os.path.join(store_path, "meta.json")):
        build.build_index(corpus, cfg, store_path, key_cols=("docid",),
                          num_buckets=32, positions=True)
    store = search.load_store(store_path)
    qpdf = pd.DataFrame({"qid": [0, 1], "query": ["spark merge", "customer"]})
    res = search.search(spark, store, qpdf, k=10, algo="exhaustive")
    sections.append((
        "BM25 top-k query (exhaustive scorer)",
        "The posting scan is pruned TWICE before any bytes move: directory "
        "partition pruning on (part, term_bucket) — only the query terms' "
        "buckets are listed — and parquet row-group min/max + pushed filter "
        "on term. The query-term table and the top-k result are broadcast "
        "(no shuffle of the posting side beyond the per-candidate groupBy).",
        plan_of(res),
    ))

    # --- 2b. phrase query: positional payloads read ONLY here ---
    ph = pd.DataFrame({"qid": [0], "query": ["spark merge"]})
    sections.append((
        "Phrase query (positional index)",
        "Only the phrase path reads the pos_bytes column — compare this "
        "ReadSchema with the WAND plan above, where columnar pruning drops "
        "the positional payload entirely. Verification runs per (qid, seg) "
        "on disjoint doc ranges; the result merge is exact.",
        plan_of(search.search_phrase(spark, store, ph, k=5)),
    ))

    # --- 2c. index-filtered WAND: cogroup-routed constraints ---
    res_f = search.search(spark, store, qpdf, k=10, algo="wand",
                          index="docs")
    sections.append((
        "Index-filtered WAND (cogroup-routed constraints)",
        "The index filter (and the dead list, when present) reaches each "
        "(qid, seg) scorer group through FlatMapCoGroupsInPandas: the "
        "allow/dead rows shuffle by their doc_seg — volume proportional to "
        "the constrained docs × queries — and the posting side shuffles "
        "exactly as the unfiltered WAND does. Nothing is collected to the "
        "driver (round-1's toPandas of doc_stats is gone); out-of-index "
        "docs are excluded INSIDE the scorer so they never burn heap slots "
        "(a post-hoc semi-join would not be exact).",
        plan_of(res_f),
    ))

    # --- 2d. prefix expansion: JVM-side cap before any collect ---
    pf = pd.DataFrame({"qid": [0], "prefix": ["c"]})
    sections.append((
        "Prefix expansion (JVM-side max_expansions cap)",
        "The pattern table broadcasts into ONE term_stats scan "
        "(metadata-sized — never postings); the deterministic "
        "max_expansions cap is a row_number window applied BEFORE the "
        "collect, so at most patterns × 50 rows reach the driver no matter "
        "how many dictionary terms match. The capped set then drives the "
        "same pruned posting read as a regular OR query.",
        plan_of(search.search_prefix(spark, store, pf, k=5)),
    ))

    # --- 2e. multi_match: one posting read serves every (query, field) ---
    mf_path = "/tmp/d2es_plans_store_mf"
    if not os.path.exists(os.path.join(mf_path, "meta.json")):
        mf_corpus = docs.select(
            F.col("doc_id").cast("string").alias("docid"),
            "lang", "text", "source",
        )
        build.build_index(
            mf_corpus, cfg, mf_path, key_cols=("docid",),
            num_buckets=32, fields=("text", "source"),
        )
    mf_store = search.load_store(mf_path)
    mm = pd.DataFrame({"qid": [0], "query": ["spark merge src7"]})
    sections.append((
        "multi_match over a multi-field store (best_fields)",
        "Fields pack into composite qids: the broadcast query-term table "
        "carries each term's field-qualified form, boost-folded weight AND "
        "its field's avgdl, so ONE pruned posting read + ONE scoring pass "
        "serve every (query, field) pair; the best_fields combine (max + "
        "tie_breaker × rest) is a single hash aggregation. Per-posting dl "
        "is already field-local — no extra read for per-field norms.",
        plan_of(search.multi_match(
            spark, mf_store, mm, fields={"text": 1.0, "source": 2.5},
            k=5, tie_breaker=0.2,
        )),
    ))

    # --- 2f. query_string: fused clauses ⋈ composite-qid phrase kernel ---
    qs = pd.DataFrame(
        {"qid": [0], "query": ['+spark merge "part filter scan"']}
    )
    sections.append((
        "simple_query_string (clauses full-outer-join phrase kernel)",
        "Two posting reads total no matter how many clauses or phrases: "
        "must/should/must_not ride the low bits of a composite qid through "
        "one fused read+score pass, all phrases of all queries pack into "
        "composite qids through one positional-kernel pass, and the gate "
        "(all must, all phrases, no must_not, ≥1 should fallback) is a "
        "broadcast-joined filter over the full-outer-joined aggregates.",
        plan_of(search.search_query_string(spark, store, qs, k=5)),
    ))

    # --- 2g. sharded search: global-stats federation ---
    sh_paths = ["/tmp/d2es_plans_shard0", "/tmp/d2es_plans_shard1"]
    for i, p in enumerate(sh_paths):
        if not os.path.exists(os.path.join(p, "meta.json")):
            half = docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == i).select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang",
                F.col("text").alias("content"),
            )
            build.build_index(half, cfg, p, key_cols=("docid",),
                              num_buckets=32)
    shards = [search.load_store(p) for p in sh_paths]
    sections.append((
        "Sharded search (exact global statistics, dfs_query_then_fetch)",
        "Each shard contributes ONE metadata-sized term_stats read (global "
        "df) and ONE pruned block read scored with the GLOBAL weights; the "
        "candidate union feeds a single aggregation, and the doc_id join "
        "unions shard metadata. Scores are shard-invariant — identical to "
        "a single store over the union corpus (tests/test_sharded.py).",
        plan_of(search.search_sharded(
            spark, shards,
            pd.DataFrame({"qid": [0], "query": ["spark merge"]}), k=5,
        )),
    ))

    # --- 3. TPC-H style join: broadcast dim + partial aggregation ---
    q = entry_queries.SPARK_QUERIES["tpch_revenue_by_nation"]
    sections.append((
        "Join + aggregate (tpch_revenue_by_nation)",
        "nation is broadcast explicitly; AQE may additionally convert the "
        "customer/orders joins to broadcast at runtime. The groupBy runs as "
        "partial (map-side) + final hash aggregation — standard "
        "shuffle-minimal OLAP shape, all inside WholeStageCodegen.",
        plan_of(q(spark, SF_DIR)),
    ))

    # --- 4. dedup: map-side combine ---
    d = entry_queries.SPARK_QUERIES["dedup_exact"]
    sections.append((
        "Exact dedup (hash-groupBy)",
        "Fingerprint computed with native expressions (md5 over the "
        "token-joined normalized text) inside codegen; the groupBy is "
        "partial+final so the shuffle carries one row per (fingerprint, "
        "partition), not per document.",
        plan_of(d(spark, SF_DIR)),
    ))

    # --- 5. minhash LSH: the banded self-join ---
    sigs = dedup.minhash_signatures(
        entry_queries._docs(spark, SF_DIR), "doc_id", "text"
    )
    pairs = dedup.lsh_candidate_pairs(sigs)
    sections.append((
        "MinHash-LSH candidate pairs",
        "Signatures are one Arrow pass; banding is a native explode; the "
        "candidate join is an equi-join on (band, key) — skew-bounded "
        "because a bucket only holds near-duplicates, and AQE splits any "
        "outlier bucket.",
        plan_of(pairs),
    ))

    # --- 6. range query: bounds pushed into the metadata scan ---
    sections.append((
        "Range query (metadata-only, pushed bounds)",
        "ES range in filter context never touches postings: the gte/lt "
        "bounds reach the doc-marker parquet scan as PushedFilters, so "
        "row groups outside the bounds are skipped by min/max statistics "
        "before any decode. The constant-score rank is one window over "
        "the surviving metadata rows.",
        plan_of(search.search_range(spark, store, "dl", gte=30, lt=60, k=5)),
    ))

    # --- 7. unordered span_near: same pruned read as ordered phrase ---
    sn = pd.DataFrame({"qid": [0], "query": ["merge spark"]})
    sections.append((
        "Unordered span_near (any-order window kernel)",
        "in_order=false rides the identical physical plan as the ordered "
        "phrase: pruned positional block read, per-(qid, seg) "
        "applyInPandas verification — only the in-kernel window check "
        "differs (one searchsorted per term over anchor keys). No extra "
        "exchange, no extra scan.",
        plan_of(search.search_span_near(
            spark, store, sn, slop=2, in_order=False, k=5
        )),
    ))

    # --- 8. decontamination: broadcast eval-set grams ---
    from dynamo2es_lambda_spark.operators import decontam as _dc

    d_all = entry_queries._docs(spark, SF_DIR)
    sections.append((
        "Benchmark decontamination (broadcast n-gram join)",
        "The eval set's distinct n-grams broadcast; the corpus-side gram "
        "stream is a native explode over the tokenizer expression and "
        "joins map-side — the corpus NEVER shuffles for the join; the "
        "only corpus-sized exchange is the per-doc hit count keyed by "
        "doc_id (the second exchange is the eval-set-sized gram distinct "
        "feeding the broadcast).",
        plan_of(_dc.ngram_contamination(
            d_all.filter(F.col("doc_id") >= 20),
            d_all.filter(F.col("doc_id") < 20), n=5,
        )),
    ))

    # --- 9. sequence packing: one shuffle keyed by pack group ---
    from dynamo2es_lambda_spark.operators import packing as _pk

    sections.append((
        "Sequence packing (next-fit per md5 pack group)",
        "One exchange keyed by the md5 pack group; the sequential "
        "next-fit state machine runs inside applyInPandas per group with "
        "a running counter — no global sort, no driver state, packing "
        "reproducible on any cluster because group and order derive from "
        "the data alone.",
        plan_of(_pk.pack_sequences(d_all, budget=150, n_groups=8)),
    ))

    # --- 10. SemDeDup: broadcast centroids, within-cluster pairs only ---
    from dynamo2es_lambda_spark.operators import ann as _ann

    emb = entry_queries._tbl(spark, SF_DIR, "embeddings")
    sections.append((
        "SemDeDup semantic dedup (broadcast centroids, cluster-local pairs)",
        "The k centroids broadcast (model-sized); assignment is one "
        "BroadcastNestedLoopJoin pass with the cosine as a codegen "
        "aggregate expression. The pair test joins the assigned frame to "
        "itself ON the cluster key — pair work is cluster-local "
        "(O(n·cluster_size)), and the only corpus-sized exchange is the "
        "assignment window's partition by vid.",
        plan_of(_ann.semantic_dedup(emb, k=8, tau=0.3)),
    ))

    # --- 11. corpus MinHash overlap: one distinct, vocab-sized sketch ---
    from dynamo2es_lambda_spark.operators import dedup as _dd

    sections.append((
        "Cross-corpus MinHash overlap (one distinct-shingle exchange)",
        "The ONLY corpus-sized exchange is the (side, shingle) distinct; "
        "the k-permutation sketch explodes over the distinct TYPE stream "
        "(vocabulary-sized) and its min aggregation is map-side partial; "
        "the exact-Jaccard half reuses the same distinct frame. The "
        "final combine is a cross join of two one-row aggregates.",
        plan_of(_dd.corpus_minhash_overlap(
            d_all, side_col=(F.col("doc_id") % 2 == 0), k=16
        )),
    ))

    # --- 12. full-Lucene query_string: one posting read + codegen tree ---
    import pandas as _pd

    mf_store = entry_queries._corpus_store_mf(spark, SF_DIR)
    lqs = _pd.DataFrame(
        [(0, "(spark OR customer) AND NOT window"),
         (1, 'source:src1 AND "table scan"^2')],
        columns=["qid", "query"],
    )
    sections.append((
        "Lucene query_string (boolean tree as one codegen expression)",
        "Term atoms of every query share ONE pruned posting-block read "
        "(composite qids; PartitionFilters on term_bucket below); phrase "
        "atoms ride the positional phrase kernel once per phrase field. "
        "The boolean tree itself — match predicate and Lucene "
        "BooleanQuery score — is a generated CASE/COALESCE expression "
        "over the per-(qid, doc) atom-score pivot, evaluated entirely "
        "inside whole-stage codegen; the DuckDB oracle runs the "
        "identical generated strings.",
        plan_of(search.search_lucene_query_string(
            spark, mf_store, lqs, k=10
        )),
    ))

    # --- r5: WAND msm / cursor (the pruned path, no exhaustive fallback)
    sections.append((
        "WAND with minimum_should_match (pruned scorer, no fallback)",
        "msm rides INSIDE the block-max scorer (one FlatMapGroupsInPandas "
        "over (qid, seg) block groups): the posting scan is still bucket- "
        "and term-pruned (PartitionFilters on part/term_bucket), the "
        "query-term table still broadcasts, and no exhaustive decode "
        "appears — at 100 TB, msm and deep paging keep skipping blocks "
        "instead of scanning everything.",
        plan_of(search.search(
            spark, store, qpdf, k=10, algo="wand",
            minimum_should_match=2,
        )),
    ))

    # --- r5: search_as_you_type (typed prefix = exact dictionary term)
    sayt_path = "/tmp/d2es_plans_sayt"
    if not os.path.exists(os.path.join(sayt_path, "meta.json")):
        build.build_index(corpus, cfg, sayt_path, key_cols=("docid",),
                          num_buckets=32, edge_ngrams=(2, 3))
    sayt_store = search.load_store(sayt_path)
    sections.append((
        "search_as_you_type (typed prefix is ONE exact posting lookup)",
        "The type-ahead query never scans term_stats: the typed prefix "
        "is an exact term on the ._index_prefix subfield, so the whole "
        "query is the standard pruned posting read (PartitionFilters on "
        "term_bucket, broadcast query-term table) + one aggregation — "
        "same plan as plain BM25, which is the point of paying for the "
        "subfields at index time.",
        plan_of(search.search_as_you_type(
            spark, sayt_store,
            pd.DataFrame({"qid": [0], "query": ["spark mer"]}), k=10,
        )),
    ))

    # --- r5: mercator geotile + hex grid aggs (codegen keys, 1 hash agg)
    sections.append((
        "geotile_grid web-mercator (codegen tile key, one hash agg)",
        "The z/x/y mercator key is pure codegen arithmetic on the "
        "metadata-sized doc_stats; the plan is match set → broadcast-"
        "friendly metadata join → ONE hash aggregation keyed on the "
        "tile — no UDF, no extra exchange beyond the aggregation's own.",
        plan_of(search.search_geotile_grid(
            spark, entry_queries._corpus_store(spark, SF_DIR),
            pd.DataFrame({"qid": [0], "query": ["spark merge"]}), zoom=6,
        )),
    ))

    # Manually-authored sections (plan evidence captured once with
    # bespoke setup — index-statistics suggester, chunk dedup, RRF) are
    # preserved across regeneration by carrying them over from the
    # existing file; regenerating must not silently drop them.
    manual_titles = (
        "## Phrase suggester from index statistics (zero corpus scans)",
        "## Chunk-level boilerplate dedup (shared chunks broadcast back)",
        "## Hybrid RRF fusion (two pruned legs, one full-outer fuse)",
    )
    manual_sections = []
    try:
        with open("PLANS.md") as f:
            prev = f.read()
        import re as _re

        for part in _re.split(r"(?m)^(?=## )", prev):
            if any(part.startswith(t) for t in manual_titles):
                manual_sections.append(part.rstrip("\n") + "\n")
    except FileNotFoundError:
        pass

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan evidence (`explain('formatted')`)\n\n"
            f"Generated by `python scripts/explain_plans.py` over `{SF_DIR}`.\n"
            "Facts extracted per plan: exchange count, broadcast usage,\n"
            "partition pruning, predicate pushdown.\n"
        )
        for title, comment, plan in sections:
            f.write(f"\n## {title}\n\n{comment}\n\n")
            for fact in facts(plan):
                f.write(f"- {fact}\n")
            f.write("\n```\n" + trim(plan) + "\n```\n")
        for part in manual_sections:
            f.write("\n" + part)
    print("wrote PLANS.md (%d generated + %d manual sections)" % (
        len(sections), len(manual_sections)))
    spark.stop()


if __name__ == "__main__":
    main()
