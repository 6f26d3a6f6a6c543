"""Driver-contract query pairs: Spark implementation + DuckDB oracle SQL.

Every entry in SPARK_QUERIES has a same-named entry in ORACLE_SQL producing
identical column names, types, and (rounded) values on the driver's parquet
tables — the driver's CORRECTNESS gate runs both sides at sf=0.01 and
compares row-count + schema + order-insensitive value hash.

Float columns are rounded to fixed decimals on BOTH sides (suffix ``_r``) so
summation-order noise cannot flip the hash; ranks are computed over the
ROUNDED score with doc-id tie-break, making orderings bit-deterministic.
"""

from __future__ import annotations

import hashlib
import re
import os
import tempfile
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import IndexerConfig
from ..functions import analysis, text as T
from ..functions.bm25 import B, K1
from ..operators import (
    ann, decontam, dedup, dsir, packing, quality, sampling,
)
from . import build, manage, search

# ---------------------------------------------------------------- helpers

DOC_TOKS = analysis.duckdb_tokens_sql("text")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tbl(spark, sf_dir, "documents")


# ------------------------------------------------------------ 1. doc_stats
# SURVEY §2.2 "Doc statistics": per-doc token length + sha256 (north-rule
# invariant column) — the doc_stats table of the index, as a query.

def q_doc_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        T.n_tokens("text").alias("dl"),
        F.sha2(F.col("text"), 256).alias("sha"),
        "lang",
    )


SQL_DOC_STATS = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(len({DOC_TOKS}) AS BIGINT) AS dl,
       sha256(text) AS sha,
       lang
FROM documents
"""

# ------------------------------------------------------------- 2. term_df
# SURVEY §2.2 "Doc statistics" df(t): per-term document frequency.

def q_term_df(spark, sf_dir):
    toks = analysis.spark_tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.expr(f"array_distinct({toks})")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


SQL_TERM_DF = f"""
SELECT term, CAST(count(*) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(list_distinct({DOC_TOKS})) AS term FROM documents)
GROUP BY term
"""

# ------------------------------------------------------ 3/4. BM25 top-k
# The flagship: full engine path (field-map → dense ids → posting blocks →
# block-max pruned BM25) vs an independent SQL BM25 oracle.

FT_QUERIES = [
    (0, "spark merge window"),
    (1, "customer"),
    (2, "the fast key"),
    (3, "data slow batch"),
    (4, "absentzzz"),
]
FT_QUERIES_AND = [
    (0, "spark merge"),
    (1, "window stream dup"),
    (2, "absentzzz spark"),
]
FT_K = 10

_STORES: dict[str, tuple[str, ...]] = {}


def _cached_store_paths(sf_dir: str, tag: str, count: int = 1):
    """ONE content-keyed cache recipe for every entry-store family: the key
    hashes the documents parquet's identity (path, mtime, size) plus the
    family tag — bump the tag to invalidate one family. Returns
    (paths, needs_build)."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{tag}".encode()
    ).hexdigest()[:12]
    paths = tuple(
        os.path.join(tempfile.gettempdir(), f"d2es_entry_{tag}{i}_{key}")
        for i in range(count)
    )
    built = key in _STORES and all(
        os.path.exists(os.path.join(p, "meta.json")) for p in paths
    )
    if not built:
        _STORES[key] = paths
    return paths, not built


def _ip_hash():
    """uint32 Knuth multiplicative hash of doc_id — the ip_range agg's
    deterministic synthetic IPv4 source (both engines recompute it).

    Split-multiply form: 2654435761 = 40503*65536 + 31153, so
    d*C mod 2^32 = (d*31153 + ((d*40503) mod 65536)*65536) mod 2^32 with
    every intermediate < 2^48 — no BIGINT overflow in either engine at
    any doc_id (the naive d*C wraps silently in Spark but RAISES in
    DuckDB once doc_id exceeds ~3.5e9; ADVICE r4)."""
    d = F.pmod(F.col("doc_id"), F.lit(4294967296))
    return F.pmod(
        d * F.lit(31153) + F.pmod(d * F.lit(40503), F.lit(65536)) * F.lit(65536),
        F.lit(4294967296),
    )


def _corpus_store(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """Build (once per sf_dir+mtime) the engine index over documents."""
    (path,), fresh = _cached_store_paths(sf_dir, "v14")
    if fresh:
        # synthetic-but-deterministic extra doc fields (geo point, a
        # sometimes-null tag, a date) — derived from doc_id so the DuckDB
        # oracle reproduces them exactly; they exercise doc_meta_cols, the
        # geo queries, the missing/value_count aggs, and date_range
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.when(F.col("doc_id") % 3 == 0, F.col("source"))
            .alias("opt_tag"),
            ((F.col("doc_id") % 180) - 90 + 0.25).cast("double")
            .alias("lat"),
            (((F.col("doc_id") * 7) % 360) - 180 + 0.5).cast("double")
            .alias("lon"),
            F.date_add(
                F.lit("2020-01-01").cast("date"),
                (F.col("doc_id") % 400).cast("int"),
            ).cast("timestamp").alias("ts"),
            # deterministic IPv4 (Knuth multiplicative hash of doc_id,
            # dotted-quad) for the ip_range agg — the oracle recomputes
            # the identical integer arithmetic from doc_id
            F.format_string(
                "%d.%d.%d.%d",
                (_ip_hash() / 16777216).cast("long") % 256,
                (_ip_hash() / 65536).cast("long") % 256,
                (_ip_hash() / 256).cast("long") % 256,
                _ip_hash() % 256,
            ).alias("ip"),
            # deterministic IPv6 (same hash split into groups 3 and 8,
            # written with :: compression) for the dual-stack ip aggs
            F.format_string(
                "2001:db8:%x::%x",
                (_ip_hash() / 65536).cast("long"),
                _ip_hash() % 65536,
            ).alias("ip6"),
            F.col("text").alias("content"),
        )
        # envelope shape columns (geo_shape, ES envelope type): a box
        # around the point with doc_id-derived spans — the oracle
        # recomputes the identical arithmetic
        did = F.col("docid").cast("long")
        corpus = (
            corpus
            .withColumn("min_lon", F.col("lon") - ((did % 7) + 1) / 2.0)
            .withColumn("max_lon", F.col("lon") + ((did % 5) + 1) / 2.0)
            .withColumn("min_lat", F.col("lat") - ((did % 3) + 1) / 2.0)
            .withColumn("max_lat", F.col("lat") + ((did % 4) + 1) / 2.0)
        )
        cfg = IndexerConfig(index="docs", id_field="docid")
        build.build_index(
            corpus, cfg, path,
            num_buckets=32, resume=True, positions=True, lm_stats=True,
            doc_meta_cols=(
                "source", "n_chars", "opt_tag", "lat", "lon", "ip",
                "ip6", "min_lon", "min_lat", "max_lon", "max_lat",
            ),
        )
    return search.load_store(path)


def _rerank_rounded(res: DataFrame, k: int) -> DataFrame:
    """Deterministic presentation: rank over (round(score,6) desc, doc_id)."""
    w = Window.partitionBy("qid").orderBy(
        F.col("score_r").desc(), F.col("doc_id").asc()
    )
    return (
        res.withColumn("score_r", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score_r")
    )


def q_fts_bm25(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search(spark, store, qpdf, k=50, algo="wand")
    return _rerank_rounded(res, FT_K)


def q_fts_bm25_and(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES_AND, columns=["qid", "query"])
    res = search.search(spark, store, qpdf, k=50, mode="and", algo="exhaustive")
    return _rerank_rounded(res, FT_K)


def _bm25_sql(
    queries: list[tuple[int, str]],
    k: int,
    and_mode: bool,
    toks_sql: str | None = None,
) -> str:
    """``toks_sql`` swaps the tokenized column (default text) — e.g. the
    nested-field oracle scores the source column the struct path maps to."""
    vals, needs = [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        terms = sorted(Counter(toks).items())
        needs.append(f"({qid}, {len(terms)})")
        for t, qtf in terms:
            vals.append(f"({qid}, '{t}', {qtf})")
    and_join = (
        f"JOIN (VALUES {', '.join(needs)}) need(nqid, need) "
        "ON scored.qid = need.nqid AND scored.nt = need.need"
        if and_mode
        else ""
    )
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {toks_sql or DOC_TOKS} AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(scored.qid AS BIGINT) AS qid, scored.doc_id AS doc_id,
         round(scored.score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY scored.qid
           ORDER BY round(scored.score, 6) DESC, scored.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored {and_join}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------- 4a2. index-routed BM25
# The reference's _index routing (lib/handler.js:61-62): documents route to
# per-lang indices via index_field + index_prefix; the query is restricted
# to ONE routed index. ES semantics for a filtered query: BM25 stats stay
# those of the queried store; only the candidate set is restricted.

ROUTED_LANG = "en"


def _routed_store(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """Store routed by lang (index_name = 'lang_<lang>')."""
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:routed-v2".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"d2es_routed_{key}")
    if key not in _STORES or not os.path.exists(os.path.join(path, "meta.json")):
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            "lang",
            F.col("text").alias("content"),
        )
        cfg = IndexerConfig(
            index_field="lang", index_prefix="lang_", id_field="docid"
        )
        build.build_index(corpus, cfg, path, num_buckets=32, resume=True)
        _STORES[key] = path
    return search.load_store(path)


def q_fts_bm25_filtered(spark, sf_dir):
    # algo="wand" deliberately: exercises the cogroup-constrained WAND path
    # (index filter folded into each (qid, seg) scorer group, zero driver
    # collects) against the same oracle as the exhaustive twin
    store = _routed_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search(
        spark, store, qpdf, k=50, algo="wand",
        index=f"lang_{ROUTED_LANG}",
    )
    return _rerank_rounded(res, FT_K)


def _bm25_filtered_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle: full-corpus BM25 stats, candidates restricted to one lang."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
flt AS (
  SELECT scored.* FROM scored
  JOIN documents doc
    ON CAST(doc.doc_id AS VARCHAR) = scored.doc_id
   AND doc.lang = '{ROUTED_LANG}'
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM flt
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------- 4a5. bool queries
# ES ``bool``: must (AND, scored) + should (optional score) + must_not
# (filter exclusion) — plans/search.search_bool.

BOOL_QUERIES = [
    (0, "spark merge", "window", "dup"),
    (1, "", "customer table", "spark"),
    (2, "the fast", "", ""),
    (3, "absentzzz", "key", ""),
]


def q_fts_bool(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        BOOL_QUERIES, columns=["qid", "must", "should", "must_not"]
    )
    res = search.search_bool(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def _bool_sql(queries: list[tuple[int, str, str, str]], k: int) -> str:
    def vals(idx):
        rows = []
        for q in queries:
            toks = analysis.tokenize_series(pd.Series([q[idx]]))[0]
            for t, qtf in sorted(Counter(toks).items()):
                rows.append(f"({q[0]}, '{t}', {qtf})")
        return rows

    mv, sv, nv = vals(1), vals(2), vals(3)
    needs = []
    for qid, m, _s, _n in queries:
        toks = analysis.tokenize_series(pd.Series([m]))[0]
        if toks:
            needs.append(f"({qid}, {len(set(toks))})")

    score = (
        f"sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) "
        f"* ({K1} + 1.0) * p.tf "
        f"/ (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)))"
    )

    def clause(name, values):
        return f"""{name} AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id, {score} AS score, count(*) AS nt
  FROM (VALUES {", ".join(values)}) q(qid, term, qtf)
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
)"""

    parts = [clause("mscore", mv)] if mv else []
    if sv:
        parts.append(clause("sscore", sv))
    base_m = f"""
  SELECT m.qid AS qid, m.doc_id AS doc_id,
         m.score{" + coalesce(s.score, 0.0)" if sv else ""} AS score
  FROM (SELECT mscore.qid, mscore.doc_id, mscore.score
        FROM mscore
        JOIN (VALUES {", ".join(needs)}) need(nqid, need)
          ON mscore.qid = need.nqid AND mscore.nt = need.need) m
  {"LEFT JOIN sscore s ON s.qid = m.qid AND s.doc_id = m.doc_id" if sv else ""}
""" if mv else ""
    base_s = f"""
  SELECT qid, doc_id, score FROM sscore
  WHERE qid NOT IN (SELECT nqid FROM (VALUES {", ".join(needs)}) n(nqid, nn))
""" if sv and mv else ("SELECT qid, doc_id, score FROM sscore" if sv else "")
    base = " UNION ALL ".join(x for x in (base_m, base_s) if x)
    parts.append(f"base AS ({base})")

    flt = "base"
    if nv:
        parts.append(f"""notdocs AS (
  SELECT DISTINCT q.qid AS qid, p.doc_id AS doc_id
  FROM (VALUES {", ".join(nv)}) q(qid, term, qtf)
  JOIN posting p ON p.term = q.term
)""")
        parts.append("""flt AS (
  SELECT base.* FROM base
  ANTI JOIN notdocs
    ON notdocs.qid = base.qid AND notdocs.doc_id = base.doc_id
)""")
        flt = "flt"
    return f"""{_BM25_BODY},
{",".join(parts)},
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM {flt}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------------------------ 4a3b. bool + minimum_should_match
# ES bool's minimum_should_match: require N distinct should terms to match
# (with a must clause present, should is otherwise optional).

BOOL_MSM_QUERIES = [
    (0, "", "spark merge window", ""),
    (1, "the", "customer table data", ""),
    (2, "", "slow batch", "dup"),
]
BOOL_MSM = 2


def q_fts_bool_msm(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        BOOL_MSM_QUERIES, columns=["qid", "must", "should", "must_not"]
    )
    res = search.search_bool(
        spark, store, qpdf, k=50, minimum_should_match=BOOL_MSM
    )
    return _rerank_rounded(res, FT_K)


def _bool_msm_sql(
    queries: list[tuple[int, str, str, str]], k: int, msm: int
) -> str:
    """Oracle for q_fts_bool_msm — mirrors the engine's fused-clause
    aggregation: one scored CTE with per-clause counters, then the bool
    predicate (must AND via need-count, nt_should >= msm, must_not
    exclusion) on top."""
    vals, needs = [], []
    for qid, m, s_, n_ in queries:
        for clause, text in ((0, m), (1, s_), (2, n_)):
            toks = analysis.tokenize_series(pd.Series([text]))[0]
            for t, qtf in sorted(Counter(toks).items()):
                vals.append(f"({qid}, '{t}', {qtf}, {clause})")
        mtoks = analysis.tokenize_series(pd.Series([m]))[0]
        if mtoks:
            needs.append(f"({qid}, {len(set(mtoks))})")
    term_score = (
        f"q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) "
        f"* ({K1} + 1.0) * p.tf "
        f"/ (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    need_join = (
        f"LEFT JOIN (VALUES {', '.join(needs)}) need(nqid, need) "
        "ON scored.qid = need.nqid"
        if needs
        else "LEFT JOIN (VALUES (-1, 0)) need(nqid, need) "
             "ON scored.qid = need.nqid"
    )
    return f"""{_BM25_BODY},
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(CASE WHEN q.clause <= 1 THEN {term_score} END) AS score,
         count(CASE WHEN q.clause = 0 THEN 1 END) AS nt_must,
         count(CASE WHEN q.clause = 1 THEN 1 END) AS nt_should,
         max(CASE WHEN q.clause = 2 THEN 1 END) AS mnot
  FROM (VALUES {", ".join(vals)}) q(qid, term, qtf, clause)
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
flt AS (
  SELECT scored.qid, scored.doc_id, scored.score
  FROM scored
  {need_join}
  WHERE mnot IS NULL
    AND CASE WHEN need IS NOT NULL
             THEN nt_must = need AND nt_should >= {msm}
             ELSE nt_should >= {max(1, msm)} END
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM flt
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------ 4a3c. more_like_this
# ES more_like_this (free-text like): tf×idf term selection capped at
# max_query_terms, then OR BM25 — plans/search.search_more_like_this.

MLT_QUERIES = [
    (0, "spark merge window customer fast table"),
    (1, "data slow batch key dup stream"),
]
MLT_MAX_TERMS = 4


def q_fts_more_like_this(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    lpdf = pd.DataFrame(MLT_QUERIES, columns=["qid", "like"])
    res = search.search_more_like_this(
        spark, store, lpdf, k=50, max_query_terms=MLT_MAX_TERMS
    )
    return _rerank_rounded(res, FT_K)


def _mlt_sql(likes: list[tuple[int, str]], k: int, max_terms: int) -> str:
    """Oracle for q_fts_more_like_this: identical term selection (tf_like ×
    idf rounded to 9 dp, desc, term asc, top max_terms) then OR BM25."""
    vals = []
    for qid, text in likes:
        toks = analysis.tokenize_series(pd.Series([text]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
lt(qid, term, qtf) AS (VALUES {", ".join(vals)}),
sel AS (
  SELECT qid, term, qtf FROM (
    SELECT lt.qid AS qid, lt.term AS term, lt.qtf AS qtf,
           row_number() OVER (
             PARTITION BY lt.qid
             ORDER BY round(lt.qtf * ln(1.0 + (s.n - d.df + 0.5)
                            / (d.df + 0.5)), 9) DESC,
                      lt.term ASC
           ) AS rn
    FROM lt
    JOIN dfreq d ON d.term = lt.term
    CROSS JOIN stats s
  ) WHERE rn <= {max_terms}
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM sel q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------- 4a4. highlight snippets
# ES ``highlight`` analog: snippet around the first matching query term,
# computed with pure built-in expressions over the top-k docs only
# (plans/search.highlight).

HL_WINDOW = 3
HL_K = 5


def q_fts_highlight(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = _rerank_rounded(
        search.search(spark, store, qpdf, k=50, algo="wand"), HL_K
    )
    corpus = _docs(spark, sf_dir)
    out = search.highlight(
        res, corpus, qpdf, id_col="doc_id", text_col="text", window=HL_WINDOW
    )
    return out.select("qid", "rank", "doc_id", "matched_term", "snippet")


def _highlight_sql(queries: list[tuple[int, str]], k: int) -> str:
    base = _bm25_sql(queries, k, and_mode=False)
    ranked_part = base[: base.rindex("SELECT qid, rank, doc_id")]
    term_lists = []
    for qid, q in queries:
        terms = sorted(set(analysis.tokenize_series(pd.Series([q]))[0]))
        if terms:
            lst = ", ".join(f"'{t}'" for t in terms)
            term_lists.append(f"({qid}, [{lst}])")
    return f"""{ranked_part},
qt(tqid, terms) AS (VALUES {", ".join(term_lists)}),
hl AS (
  SELECT ranked.qid AS qid, ranked.rank AS rank, ranked.doc_id AS doc_id,
         {DOC_TOKS} AS toks, qt.terms AS terms
  FROM ranked
  JOIN documents ON CAST(documents.doc_id AS VARCHAR) = ranked.doc_id
  JOIN qt ON qt.tqid = ranked.qid
  WHERE ranked.rank <= {k}
),
pos AS (
  SELECT qid, rank, doc_id, toks,
         list_filter(range(1, len(toks) + 1),
                     i -> list_contains(terms, toks[i]))[1] AS p
  FROM hl
)
SELECT qid, rank, doc_id,
       toks[p] AS matched_term,
       array_to_string(toks[greatest(1, p - {HL_WINDOW})
                            : least(len(toks), p + {HL_WINDOW})], ' ')
         AS snippet
FROM pos
"""


# ----------------------------------------------- 4a3. terms-agg facets
# ES ``aggs: {terms: {field: lang}}`` on a query: per-facet distinct-doc
# counts over the matching set — counted from the same pruned posting read
# the scorer uses (plans/search.search_facets).

def q_fts_facet_lang(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    return search.search_facets(spark, store, qpdf, facet_col="lang")


def _facet_sql(queries: list[tuple[int, str]]) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t in sorted(set(toks)):
            vals.append(f"({qid}, '{t}')")
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, {DOC_TOKS} AS toks
  FROM documents
),
posting AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
),
q(qid, term) AS (VALUES {", ".join(vals)}),
m AS (
  SELECT DISTINCT q.qid AS qid, p.doc_id AS doc_id
  FROM q JOIN posting p ON p.term = q.term
)
SELECT CAST(m.qid AS BIGINT) AS qid, c.lang AS facet,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN corpus c ON c.doc_id = m.doc_id
GROUP BY m.qid, c.lang
"""


# ------------------------------------------ 4b/4c. phrase + prefix queries
# ES match_phrase (positional index; plans/search.search_phrase) and prefix
# (term-expansion over term_stats; plans/search.search_prefix).

PHRASE_QUERIES = [
    (0, "spark merge"),
    (1, "part filter scan"),
    (2, "sparkMerge"),   # code-aware tokenizer splits back to "spark merge"
    (3, "zzzabsent phrase"),
]
PREFIX_QUERIES = [(0, "sc"), (1, "qu"), (2, "c"), (3, "zzzz")]
FUZZY_QUERIES = [(0, "spak"), (1, "quer"), (2, "vale"), (3, "zzzzzz")]
FUZZY_EDITS, FUZZY_EXPANSIONS = 1, 50
WILDCARD_QUERIES = [(0, "s*k"), (1, "*able"), (2, "d?p"), (3, "zz*")]


def q_fts_phrase(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(PHRASE_QUERIES, columns=["qid", "query"])
    res = search.search_phrase(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_prefix(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(PREFIX_QUERIES, columns=["qid", "prefix"])
    res = search.search_prefix(spark, store, ppdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_fuzzy(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    fpdf = pd.DataFrame(FUZZY_QUERIES, columns=["qid", "term"])
    res = search.search_fuzzy(
        spark, store, fpdf, k=50,
        max_edits=FUZZY_EDITS, max_expansions=FUZZY_EXPANSIONS,
    )
    return _rerank_rounded(res, FT_K)


def q_fts_wildcard(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    wpdf = pd.DataFrame(WILDCARD_QUERIES, columns=["qid", "pattern"])
    res = search.search_wildcard(spark, store, wpdf, k=50)
    return _rerank_rounded(res, FT_K)


def _wildcard_sql(patterns: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_wildcard: LIKE expansion (* -> %, ? -> _),
    deterministic term-ascending cap, qtf=1 OR-scored BM25."""
    vals = ", ".join(
        f"({qid}, '{p.replace('*', '%').replace('?', '_')}')"
        for qid, p in patterns
    )
    return f"""{_BM25_BODY},
q AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (PARTITION BY v.qid ORDER BY d.term) AS rn
    FROM (VALUES {vals}) v(qid, pat)
    JOIN dfreq d ON d.term LIKE v.pat
  ) WHERE rn <= 50
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _fuzzy_sql(probes: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_fuzzy: Levenshtein term expansion (deterministic
    (distance, term) cap) + qtf=1 OR-scored BM25 — DuckDB's levenshtein
    matches Spark's (plain unit-cost edit distance)."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in probes)
    return f"""{_BM25_BODY},
q AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (
             PARTITION BY v.qid
             ORDER BY levenshtein(d.term, v.probe), d.term
           ) AS rn
    FROM (VALUES {vals}) v(qid, probe)
    JOIN dfreq d ON levenshtein(d.term, v.probe) <= {FUZZY_EDITS}
  ) WHERE rn <= {FUZZY_EXPANSIONS}
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


MATCH_FUZZY_QUERIES = [
    (0, "spak merge"),          # typo + exact
    (1, "window functoin"),     # two typos
    (2, "customer"),            # pure exact (fuzzy includes distance 0)
    (3, "zzzzzz qqqqqq"),       # nothing within budget
]


def q_fts_match_fuzzy(spark, sf_dir):
    """ES match + fuzziness=AUTO: per-term fuzzy expansion of free text,
    folded union, OR-scored BM25."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(MATCH_FUZZY_QUERIES, columns=["qid", "query"])
    return _rerank_rounded(
        search.search_match_fuzzy(
            spark, store, qpdf, k=50, fuzziness="AUTO",
        ),
        FT_K,
    )


def _match_fuzzy_sql(queries, k) -> str:
    rows = []
    for qid, q in queries:
        for t in sorted(set(analysis.tokenize_series(pd.Series([q]))[0])):
            me = 0 if len(t) < 3 else (1 if len(t) < 6 else 2)
            rows.append(f"({qid}, '{t}', {me})")
    vals = ", ".join(rows)
    return f"""{_BM25_BODY},
exp AS (
  SELECT DISTINCT qid, term FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (
             PARTITION BY v.qid, v.probe
             ORDER BY levenshtein(d.term, v.probe), d.term
           ) AS rn
    FROM (VALUES {vals}) v(qid, probe, me)
    JOIN dfreq d ON levenshtein(d.term, v.probe) <= v.me
  ) WHERE rn <= 50
),
scored AS (
  SELECT e.qid AS qid, p.doc_id AS doc_id,
         sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM exp e
  JOIN posting p ON p.term = e.term
  JOIN dfreq d ON d.term = e.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY e.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# probes across the three AUTO bands: len<3 → 0 edits, 3–5 → 1, ≥6 → 2
FUZZY_AUTO_QUERIES = [
    (0, "sp"),        # 0 edits: only exact 'sp' (absent) — no rows
    (1, "quer"),      # 1 edit
    (2, "custome"),   # 2 edits: reaches 'customer'
]


def q_fts_fuzzy_auto(spark, sf_dir):
    """ES fuzziness=AUTO: per-probe edit budget from the probe length."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FUZZY_AUTO_QUERIES, columns=["qid", "term"])
    res = search.search_fuzzy(
        spark, store, qpdf, k=50, max_edits="AUTO",
        max_expansions=FUZZY_EXPANSIONS,
    )
    return _rerank_rounded(res, FT_K)


def _fuzzy_auto_sql(probes: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_fuzzy_auto: the AUTO band replicated per probe."""
    def budget(p: str) -> int:
        return 0 if len(p) < 3 else (1 if len(p) < 6 else 2)

    vals = ", ".join(
        f"({qid}, '{p}', {budget(p)})" for qid, p in probes
    )
    return f"""{_BM25_BODY},
q AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (
             PARTITION BY v.qid
             ORDER BY levenshtein(d.term, v.probe), d.term
           ) AS rn
    FROM (VALUES {vals}) v(qid, probe, me)
    JOIN dfreq d ON levenshtein(d.term, v.probe) <= v.me
  ) WHERE rn <= {FUZZY_EXPANSIONS}
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


FILTERS_AGG = {
    "has_fast": "fast",
    "merge_and_window": "merge window",
    "absent": "absentzzz",
}


def q_fts_filters_agg(spark, sf_dir):
    """ES filters aggregation: named AND-filter buckets counted over the
    match set, zero-count buckets included."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_filters_agg(spark, store, qpdf, FILTERS_AGG)


def _filters_agg_sql(queries, filters: dict) -> str:
    """Oracle for q_fts_filters_agg: per named filter, docs holding ALL
    its terms; counts of the intersection with the OR match set; the
    (qid × name) base keeps zero buckets."""
    fvals, needs = [], []
    for name in sorted(filters):
        toks = analysis.tokenize_series(pd.Series([filters[name]]))[0]
        needs.append(f"('{name}', {len(set(toks))})")
        for t in sorted(set(toks)):
            fvals.append(f"('{name}', '{t}')")
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
fv(fname, term) AS (VALUES {", ".join(fvals)}),
fneed(fname, need) AS (VALUES {", ".join(needs)}),
fset AS (
  SELECT fv.fname AS fname, p.doc_id AS doc_id
  FROM fv JOIN posting p ON p.term = fv.term
  GROUP BY fv.fname, p.doc_id
  HAVING count(DISTINCT fv.term)
         = (SELECT need FROM fneed WHERE fneed.fname = fv.fname)
),
base AS (
  SELECT DISTINCT m.qid AS qid, fneed.fname AS fname
  FROM m CROSS JOIN fneed
),
cnt AS (
  SELECT m.qid AS qid, fset.fname AS fname,
         count(*) AS n
  FROM m JOIN fset ON fset.doc_id = m.doc_id
  GROUP BY m.qid, fset.fname
)
SELECT CAST(base.qid AS BIGINT) AS qid, base.fname AS fname,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_docs
FROM base LEFT JOIN cnt
  ON cnt.qid = base.qid AND cnt.fname = base.fname
"""


MBP_QUERIES = [(0, "stream da"), (1, "customer wind"), (2, "absentzzz qu")]
MBP_EXPANSIONS = 50


def q_fts_match_bool_prefix(spark, sf_dir):
    """ES match_bool_prefix: terms as bool should clauses, last term as a
    prefix — type-ahead over bool scoring, no positions involved."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(MBP_QUERIES, columns=["qid", "query"])
    res = search.search_match_bool_prefix(
        spark, store, qpdf, k=50, max_expansions=MBP_EXPANSIONS
    )
    return _rerank_rounded(res, FT_K)


def _match_bool_prefix_sql(queries, k: int) -> str:
    """Oracle for q_fts_match_bool_prefix: fixed terms (qtf) union the
    capped last-term expansion (qtf 1), folded per (qid, term), OR
    BM25."""
    fvals, pvals = [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, c in sorted(Counter(toks[:-1]).items()):
            fvals.append(f"({qid}, '{t}', {c})")
        pvals.append(f"({qid}, '{toks[-1]}')")
    fixed_cte = (
        f"fixedq(qid, term, qtf) AS (VALUES {', '.join(fvals)}),"
        if fvals
        else ""
    )
    fixed_union = "SELECT * FROM fixedq UNION ALL " if fvals else ""
    return f"""{_BM25_BODY},
{fixed_cte}
v(vqid, pfx) AS (VALUES {", ".join(pvals)}),
exp AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.vqid AS qid, d.term AS term,
           row_number() OVER (
             PARTITION BY v.vqid ORDER BY d.term ASC
           ) AS rn
    FROM v JOIN dfreq d ON d.term LIKE v.pfx || '%'
  ) WHERE rn <= {MBP_EXPANSIONS}
),
q AS (
  SELECT qid, term, sum(qtf) AS qtf
  FROM ({fixed_union}SELECT * FROM exp)
  GROUP BY qid, term
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def q_fts_index_stats(spark, sf_dir):
    """ES _stats/_count analog — and an end-to-end invariant gate: the
    store's own aggregate statistics (meta.json + term_stats) must equal
    the corpus-recomputed numbers."""
    store = _corpus_store(spark, sf_dir)
    return search.store_stats(spark, store)


SQL_INDEX_STATS = f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
pairs AS (
  SELECT DISTINCT doc_id, t
  FROM (SELECT doc_id, unnest(toks) AS t FROM corpus)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_docs,
       (SELECT round(avg(len(toks)), 6) FROM corpus) AS avgdl_r,
       (SELECT CAST(count(DISTINCT t) AS BIGINT) FROM pairs) AS n_terms,
       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_postings
"""


# ----------------------- 4o. bool filter clause + completion suggester
# ES bool filter context (required, unscored) and the completion
# suggester (plans/search.search_bool filter= / suggest_completions).

BOOL_FILTER_QUERIES = [
    (0, "spark", "", "", "merge"),
    (1, "", "customer window", "", "the"),
    (2, "", "", "", "fast"),           # pure filter: score 0, doc_id rank
    (3, "spark", "", "", "absentzzz"),  # unindexed filter -> empty
]
COMPLETION_PREFIXES = [(0, "sc"), (1, "qu"), (2, "zzzz")]
COMPLETION_K = 5


def q_fts_bool_filter(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        BOOL_FILTER_QUERIES,
        columns=["qid", "must", "should", "must_not", "filter"],
    )
    res = search.search_bool(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_suggest_completion(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(COMPLETION_PREFIXES, columns=["qid", "prefix"])
    return search.suggest_completions(spark, store, ppdf, k=COMPLETION_K)


def _bool_filter_sql(
    queries: list[tuple[int, str, str, str, str]], k: int
) -> str:
    """Oracle for q_fts_bool_filter: the engine's fused-clause gate with
    the unscored filter clause (all filter terms required, no score)."""
    vals, needs = [], []
    for qid, must, should, mnot, filt in queries:
        for cl, q in ((0, must), (1, should), (2, mnot), (3, filt)):
            toks = analysis.tokenize_series(pd.Series([q]))[0]
            for t, qtf in sorted(Counter(toks).items()):
                vals.append(f"({qid}, {cl}, '{t}', {qtf})")
        mtoks = set(analysis.tokenize_series(pd.Series([must]))[0])
        stoks = set(analysis.tokenize_series(pd.Series([should]))[0])
        ftoks = set(analysis.tokenize_series(pd.Series([filt]))[0])
        needs.append(
            f"({qid}, {len(mtoks)}, {1 if mtoks else 0}, "
            f"{1 if stoks else 0}, {len(ftoks)})"
        )
    bm = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    return f"""{_BM25_BODY},
q(qid, clause, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, nm, hm, hs, nf) AS (VALUES {", ".join(needs)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(CASE WHEN q.clause <= 1 THEN q.qtf * {bm} END) AS score,
         count(CASE WHEN q.clause = 0 THEN 1 END) AS nt_must,
         count(CASE WHEN q.clause = 1 THEN 1 END) AS nt_should,
         max(CASE WHEN q.clause = 2 THEN 1 END) AS mnot,
         count(CASE WHEN q.clause = 3 THEN 1 END) AS nt_filter
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
gated AS (
  SELECT sc.qid AS qid, sc.doc_id AS doc_id,
         COALESCE(sc.score, 0.0) AS score
  FROM scored sc JOIN need n ON n.nqid = sc.qid
  WHERE sc.mnot IS NULL
    AND sc.nt_filter = n.nf
    AND CASE WHEN n.hm = 1 THEN sc.nt_must = n.nm
             WHEN n.hs = 1 THEN sc.nt_should >= 1
             ELSE n.nf > 0 END
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gated
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _completion_sql(prefixes: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_suggest_completion: dictionary completions ranked
    by (df desc, term asc)."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in prefixes)
    return f"""{_BM25_BODY},
v(qid, pfx) AS (VALUES {vals}),
hit AS (
  SELECT v.qid AS qid, d.term AS suggestion, d.df AS df
  FROM v JOIN dfreq d ON d.term LIKE v.pfx || '%'
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, suggestion, CAST(df AS BIGINT) AS df,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY df DESC, suggestion ASC
         ) AS INTEGER) AS rank
  FROM hit
)
SELECT qid, rank, suggestion, df FROM ranked WHERE rank <= {k}
"""


# --------------------------------------- 4m2. range / ids term-level
# ES ``range`` (numeric metadata bounds, filter context) and ``ids``
# (fetch by _id list) — the two most common real-user term-level queries
# over the docs the reference ships whole to ES (lib/handler.js:100).

RANGE_COL, RANGE_GTE, RANGE_LT, RANGE_K = "dl", 30, 60, 25
IDS_QUERY = ["3", "42", "137", "317", "499", "999999"]  # last one unknown
BOOL_RANGE = {"col": "dl", "gte": 20, "lt": 70}


def q_fts_range(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    res = search.search_range(
        spark, store, RANGE_COL, gte=RANGE_GTE, lt=RANGE_LT, k=RANGE_K
    )
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def q_fts_ids(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    res = search.search_ids(spark, store, IDS_QUERY, k=RANGE_K)
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def q_fts_bool_range_filter(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        BOOL_QUERIES, columns=["qid", "must", "should", "must_not"]
    )
    res = search.search_bool(
        spark, store, qpdf, k=50, range_filter=BOOL_RANGE
    )
    return _rerank_rounded(res, FT_K)


def _range_sql() -> str:
    """Oracle for q_fts_range: dl bounds in filter context, constant
    score, doc_id-ascending rank."""
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, len({DOC_TOKS}) AS dl
  FROM documents
),
hit AS (
  SELECT doc_id FROM d WHERE dl >= {RANGE_GTE} AND dl < {RANGE_LT}
),
ranked AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id,
         round(1.0, 6) AS score_r,
         CAST(row_number() OVER (ORDER BY doc_id ASC) AS INTEGER) AS rank
  FROM hit
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {RANGE_K}
"""


def _ids_sql() -> str:
    ids = ", ".join(f"'{i}'" for i in IDS_QUERY)
    return f"""
WITH hit AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents
  WHERE CAST(doc_id AS VARCHAR) IN ({ids})
),
ranked AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id,
         round(1.0, 6) AS score_r,
         CAST(row_number() OVER (ORDER BY doc_id ASC) AS INTEGER) AS rank
  FROM hit
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {RANGE_K}
"""


def _bool_range_sql(
    queries: list[tuple[int, str, str, str]], k: int, rng: dict
) -> str:
    """Oracle for q_fts_bool_range_filter: the fused bool gate (must /
    should / must_not) with an additional unscored dl-range requirement —
    a bool filter clause holding a range query."""
    vals, needs = [], []
    for qid, must, should, mnot in queries:
        for cl, q in ((0, must), (1, should), (2, mnot)):
            toks = analysis.tokenize_series(pd.Series([q]))[0]
            for t, qtf in sorted(Counter(toks).items()):
                vals.append(f"({qid}, {cl}, '{t}', {qtf})")
        mtoks = set(analysis.tokenize_series(pd.Series([must]))[0])
        stoks = set(analysis.tokenize_series(pd.Series([should]))[0])
        needs.append(
            f"({qid}, {len(mtoks)}, {1 if mtoks else 0}, "
            f"{1 if stoks else 0})"
        )
    bm = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    return f"""{_BM25_BODY},
q(qid, clause, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, nm, hm, hs) AS (VALUES {", ".join(needs)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(CASE WHEN q.clause <= 1 THEN q.qtf * {bm} END) AS score,
         count(CASE WHEN q.clause = 0 THEN 1 END) AS nt_must,
         count(CASE WHEN q.clause = 1 THEN 1 END) AS nt_should,
         max(CASE WHEN q.clause = 2 THEN 1 END) AS mnot
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
gated AS (
  SELECT sc.qid AS qid, sc.doc_id AS doc_id,
         COALESCE(sc.score, 0.0) AS score
  FROM scored sc
  JOIN need n ON n.nqid = sc.qid
  JOIN dl dr ON dr.doc_id = sc.doc_id
   AND dr.dl >= {rng["gte"]} AND dr.dl < {rng["lt"]}
  WHERE sc.mnot IS NULL
    AND CASE WHEN n.hm = 1 THEN sc.nt_must = n.nm
             ELSE sc.nt_should >= 1 END
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gated
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------- 4m3. match_all / range agg / decay scoring

MATCH_ALL_K = 15
RANGE_AGG_BUCKETS = [("short", None, 40.0), ("mid", 40.0, 70.0),
                     ("long", 70.0, None)]
DECAY_ORIGIN, DECAY_SCALE, DECAY_OFFSET, DECAY_D = 50.0, 25.0, 5.0, 0.5


def q_fts_match_all(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    res = search.search_match_all(spark, store, k=MATCH_ALL_K)
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def q_fts_range_agg(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_range_agg(
        spark, store, qpdf, RANGE_AGG_BUCKETS, value_col="dl"
    )


def q_fts_decay(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_function_score_decay(
        spark, store, qpdf, origin=DECAY_ORIGIN, scale=DECAY_SCALE,
        offset=DECAY_OFFSET, decay=DECAY_D, k=50, decay_fn="gauss",
    )
    return _rerank_rounded(res, FT_K)


def q_fts_terms_agg(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_terms_agg(
        spark, store, qpdf, group_col="lang", value_col="dl"
    )


TA_AFTER_KEY, TA_PAGE_SIZE = "en", 2


def q_fts_terms_agg_after(spark, sf_dir):
    """ES composite-agg pagination (VERDICT r3 gap): the lang bucket page
    strictly after after_key='en', capped at 2 buckets per qid — a keyset
    cursor like hit-level search_after."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_terms_agg(
        spark, store, qpdf, group_col="lang", value_col="dl",
        size=TA_PAGE_SIZE, after_key=TA_AFTER_KEY,
    )


def _terms_agg_after_sql(queries: list[tuple[int, str]]) -> str:
    """Oracle for q_fts_terms_agg_after: the same bucket aggregation,
    keyset-filtered then row_number-capped per qid."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
buckets AS (
  SELECT CAST(m.qid AS BIGINT) AS qid, doc.lang AS grp,
         CAST(count(*) AS BIGINT) AS n_docs,
         round(avg(dl.dl), 6) AS avg_value_r
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
  WHERE doc.lang > '{TA_AFTER_KEY}'
  GROUP BY m.qid, doc.lang
),
paged AS (
  SELECT qid, grp, n_docs, avg_value_r,
         row_number() OVER (PARTITION BY qid ORDER BY grp ASC) AS rn
  FROM buckets
)
SELECT qid, grp AS "group", n_docs, avg_value_r
FROM paged WHERE rn <= {TA_PAGE_SIZE}
"""


def _terms_agg_sql(queries: list[tuple[int, str]]) -> str:
    """Oracle for q_fts_terms_agg: per (qid, lang) match-set count + mean
    dl."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid, doc.lang AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(dl.dl), 6) AS avg_value_r
FROM m
JOIN dl ON dl.doc_id = m.doc_id
JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
GROUP BY m.qid, doc.lang
"""


PHRASE_SUGGEST_PROBES = [(0, "ag sow"), (1, "custmer windw")]
PS_K, PS_EDITS, PS_CANDS, PS_SMOOTH = 3, 1, 3, 0.5


def q_fts_suggest_phrase(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(PHRASE_SUGGEST_PROBES, columns=["qid", "text"])
    # no corpus DataFrame: the LM reads the store's index-time lm_stats
    # table — zero documents-table scans in the suggest plan
    return search.suggest_phrase(
        spark, store, probes=ppdf,
        k=PS_K, max_edits=PS_EDITS, max_candidates=PS_CANDS,
        k_smooth=PS_SMOOTH,
    )


def _suggest_phrase_sql() -> str:
    """Oracle for q_fts_suggest_phrase (two-token probes): per-position
    levenshtein candidates (distance asc, df desc, term asc, cap 3),
    cross-position combinations scored by the same add-k bigram LM."""
    probe_vals = []
    for qid, text in PHRASE_SUGGEST_PROBES:
        toks = analysis.tokenize_series(pd.Series([text]))[0]
        assert len(toks) == 2, "phrase-suggest oracle covers 2-token probes"
        for pos, t in enumerate(toks):
            probe_vals.append(f"({qid}, {pos}, '{t}')")
    ks = PS_SMOOTH
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
uni AS (
  SELECT t, count(*) AS c1
  FROM (SELECT unnest(toks) AS t FROM corpus) GROUP BY t
),
dict AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term FROM corpus)
  GROUP BY term
),
consts AS (
  SELECT (SELECT count(*) FROM dict) AS v,
         (SELECT sum(len(toks)) FROM corpus) AS t
),
probe(qid, pos, p) AS (VALUES {", ".join(probe_vals)}),
cand AS (
  SELECT qid, pos, term,
         row_number() OVER (
           PARTITION BY qid, pos
           ORDER BY levenshtein(term, p) ASC, df DESC, term ASC
         ) AS rn
  FROM probe
  JOIN dict ON abs(length(term) - length(p)) <= {PS_EDITS}
           AND levenshtein(term, p) <= {PS_EDITS}
),
c3 AS (SELECT qid, pos, term FROM cand WHERE rn <= {PS_CANDS}),
-- keep-source fallback: a position with zero in-budget candidates
-- contributes the probe token itself (mirrors the engine/ES behavior)
c3u AS (
  SELECT qid, pos, term FROM c3
  UNION ALL
  SELECT probe.qid, probe.pos, probe.p FROM probe
  WHERE NOT EXISTS (
    SELECT 1 FROM c3
    WHERE c3.qid = probe.qid AND c3.pos = probe.pos
  )
),
combos AS (
  SELECT a.qid AS qid, a.term AS t1, b.term AS t2
  FROM c3u a JOIN c3u b ON b.qid = a.qid AND a.pos = 0 AND b.pos = 1
),
bg AS (
  SELECT b, count(*) AS c12
  FROM (SELECT unnest(list_transform(range(2, len(toks) + 1),
               i -> toks[i - 1] || ' ' || toks[i])) AS b FROM corpus)
  GROUP BY b
),
scored AS (
  SELECT combos.qid AS qid, t1 || ' ' || t2 AS suggestion,
         round(
           ln((COALESCE(u1.c1, 0) + {ks}) / (consts.t + {ks} * consts.v))
           + ln((COALESCE(bg.c12, 0) + {ks})
                / (COALESCE(u1.c1, 0) + {ks} * consts.v)), 6
         ) AS logp_r
  FROM combos
  LEFT JOIN uni u1 ON u1.t = combos.t1
  LEFT JOIN bg ON bg.b = combos.t1 || ' ' || combos.t2
  CROSS JOIN consts
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, suggestion, logp_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY logp_r DESC, suggestion ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, suggestion, logp_r FROM ranked WHERE rank <= {PS_K}
"""


RF_PIVOT, RF_BOOST = 50.0, 3.0


def q_fts_rank_feature(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_rank_feature(
        spark, store, qpdf, feature_col="dl", k=50,
        function="saturation", pivot=RF_PIVOT, boost=RF_BOOST,
    )
    return _rerank_rounded(res, FT_K)


def _rank_feature_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_rank_feature: OR BM25 + boost · dl/(dl+pivot)."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) + max({RF_BOOST} * dl.dl / (dl.dl + {RF_PIVOT})) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _match_all_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT CAST(0 AS BIGINT) AS qid, CAST(doc_id AS VARCHAR) AS doc_id,
         round(1.0, 6) AS score_r,
         CAST(row_number() OVER (
           ORDER BY CAST(doc_id AS VARCHAR) ASC
         ) AS INTEGER) AS rank
  FROM documents
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {MATCH_ALL_K}
"""


def _range_agg_sql(queries: list[tuple[int, str]]) -> str:
    rows = ", ".join(
        f"('{k}', {lo if lo is not None else 'NULL'}, "
        f"{hi if hi is not None else 'NULL'})"
        for k, lo, hi in RANGE_AGG_BUCKETS
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
r(rkey, lo, hi) AS (VALUES {rows}),
counted AS (
  SELECT m.qid AS qid, r.rkey AS rkey, count(*) AS n_docs
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN r ON (r.lo IS NULL OR dl.dl >= r.lo)
        AND (r.hi IS NULL OR dl.dl < r.hi)
  GROUP BY m.qid, r.rkey
),
shells AS (SELECT DISTINCT m.qid, r.rkey FROM m CROSS JOIN r)
SELECT CAST(s.qid AS BIGINT) AS qid, s.rkey AS rkey,
       CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs
FROM shells s
LEFT JOIN counted c ON c.qid = s.qid AND c.rkey = s.rkey
"""


def _decay_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_decay: OR BM25 × gauss(dl) with the ES
    parameterization (decay reached exactly at dist = scale)."""
    import math

    sigma2 = -(DECAY_SCALE**2) / (2.0 * math.log(DECAY_D))
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    gauss = (
        f"exp(-(greatest(abs(dl.dl - {DECAY_ORIGIN}) - {DECAY_OFFSET}, 0.0)"
        f" * greatest(abs(dl.dl - {DECAY_ORIGIN}) - {DECAY_OFFSET}, 0.0))"
        f" / (2.0 * {sigma2!r}))"
    )
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) * max({gauss}) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------------------------- 4n. sharded (federated) search
# Two half-corpus stores (doc_id parity), searched with exact GLOBAL
# stats (ES dfs_query_then_fetch): the oracle is the SAME full-corpus
# BM25 SQL as fts_bm25_topk — shard-invariance is the checked property
# (plans/search.search_sharded).

def _corpus_shards(spark: SparkSession, sf_dir: str):
    paths, fresh = _cached_store_paths(sf_dir, "sh1", count=2)
    if fresh:
        cfg = IndexerConfig(index="docs", id_field="docid")
        for i, p in enumerate(paths):
            half = _docs(spark, sf_dir).filter(
                F.pmod(F.col("doc_id"), F.lit(2)) == i
            ).select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang",
                F.col("text").alias("content"),
            )
            build.build_index(half, cfg, p, num_buckets=32, resume=True)
    return [search.load_store(p) for p in paths]


def q_fts_sharded(spark, sf_dir):
    shards = _corpus_shards(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search_sharded(spark, shards, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


SHARD_BOOSTS = [1.0, 2.0]


def q_fts_sharded_boost(spark, sf_dir):
    """ES indices_boost on the federated search: per-shard score
    multiplier (even-parity shard 1.0, odd 2.0), stats stay global."""
    shards = _corpus_shards(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search_sharded(
        spark, shards, qpdf, k=50, index_boosts=SHARD_BOOSTS
    )
    return _rerank_rounded(res, FT_K)


def _sharded_boost_sql(queries, k: int, boosts) -> str:
    b0, b1 = boosts
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
boosted AS (
  SELECT qid, doc_id,
         score * CASE WHEN CAST(doc_id AS BIGINT) % 2 = 0
                      THEN {b0!r} ELSE {b1!r} END AS score
  FROM scored
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM boosted
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


TERMS_ORDERED_SIZE, TERMS_ORDERED_MDC = 3, 2


def q_fts_terms_agg_ordered(spark, sf_dir):
    """ES terms agg with its default doc_count-desc order + min_doc_count
    floor and size cut."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_terms_agg(
        spark, store, qpdf, group_col="source", value_col="dl",
        order_by="count_desc", min_doc_count=TERMS_ORDERED_MDC,
        size=TERMS_ORDERED_SIZE,
    )


def _terms_agg_ordered_sql(queries, size: int, mdc: int) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
agg AS (
  SELECT m.qid AS qid, doc.source AS "group",
         count(*) AS n_docs,
         round(avg(CAST(dl.dl AS DOUBLE)), 6) AS avg_value_r
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
  GROUP BY m.qid, doc.source
  HAVING count(*) >= {mdc}
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY n_docs DESC, "group" ASC
  ) AS _rn FROM agg
)
SELECT CAST(qid AS BIGINT) AS qid, "group",
       CAST(n_docs AS BIGINT) AS n_docs, avg_value_r
FROM ranked WHERE _rn <= {size}
"""


CTX_PREFIXES = [(0, "mer", "en"), (1, "cus", "de"), (2, "wind", "fr")]
CTX_K = 5


def q_fts_suggest_completion_ctx(spark, sf_dir):
    """ES completion suggester with category contexts: completions
    ranked by in-context popularity (docs of the query's lang only)."""
    store = _corpus_store(spark, sf_dir)
    pr = pd.DataFrame(CTX_PREFIXES, columns=["qid", "prefix", "context"])
    return search.suggest_completions_ctx(
        spark, store, pr, context_col="lang", k=CTX_K
    )


def _suggest_ctx_sql(prefixes, k: int) -> str:
    vals = ", ".join(
        f"({qid}, '{p}', '{c}')" for qid, p, c in prefixes
    )
    return f"""{_BM25_BODY},
pv(qid, pfx, ctx) AS (VALUES {vals}),
exp AS (
  SELECT qid, ctx, term FROM (
    SELECT pv.qid AS qid, pv.ctx AS ctx, d.term AS term,
           row_number() OVER (
             PARTITION BY pv.qid ORDER BY d.term ASC
           ) AS _rn
    FROM pv JOIN dfreq d ON d.term LIKE pv.pfx || '%'
  ) WHERE _rn <= 200
),
cnt AS (
  SELECT e.qid AS qid, e.term AS suggestion,
         count(DISTINCT p.doc_id) AS df_ctx
  FROM exp e
  JOIN posting p ON p.term = e.term
  JOIN documents doc
    ON CAST(doc.doc_id AS VARCHAR) = p.doc_id AND doc.lang = e.ctx
  GROUP BY e.qid, e.term
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, suggestion,
         CAST(df_ctx AS BIGINT) AS df_ctx,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY df_ctx DESC, suggestion ASC
         ) AS INTEGER) AS rank
  FROM cnt
)
SELECT qid, rank, suggestion, df_ctx FROM ranked WHERE rank <= {k}
"""


MIN_SCORE_FLOOR = 1.0


def q_fts_min_score(spark, sf_dir):
    """ES min_score: absolute relevance floor before the top-k cut
    (compared at the 6-dp presentation precision)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search_min_score(
        spark, store, qpdf, min_score=MIN_SCORE_FLOOR, k=50
    )
    return _rerank_rounded(res, FT_K)


def _min_score_sql(queries, k: int, floor: float) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
  WHERE round(score, 6) >= {floor!r}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------- 4m. collapse (field fold)
# ES collapse: one best doc per field value (plans/search.search_collapse).

COLLAPSE_QUERIES = [(0, "spark merge window"), (1, "customer")]


def q_fts_collapse(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(COLLAPSE_QUERIES, columns=["qid", "query"])
    res = search.search_collapse(
        spark, store, qpdf, collapse_col="lang", k=FT_K
    )
    return res.select(
        "qid", "rank", "doc_id", "group",
        F.round("score", 6).alias("score_r"),
    )


def _collapse_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_collapse: best OR-BM25 doc per (qid, lang), groups
    ranked by (rounded score desc, doc_id)."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, {DOC_TOKS} AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
best AS (
  SELECT * FROM (
    SELECT sc.qid AS qid, sc.doc_id AS doc_id, c.lang AS grp, sc.score,
           row_number() OVER (
             PARTITION BY sc.qid, c.lang
             ORDER BY sc.score DESC, sc.doc_id ASC
           ) AS rn
    FROM scored sc JOIN corpus c ON c.doc_id = sc.doc_id
  ) WHERE rn = 1
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, grp AS "group",
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM best
)
SELECT qid, rank, doc_id, "group", score_r FROM ranked WHERE rank <= {k}
"""


# ---------------------------- 4l. significant_terms + percolate (reverse)
# ES significant_terms (JLH over-representation agg) and percolate
# (match incoming docs against registered queries) —
# plans/search.significant_terms / percolate.

SIG_QUERIES = [(0, "spark merge"), (1, "customer")]
SIG_K, SIG_MIN_DC = 10, 3
PERC_QUERIES = [
    (0, "spark merge"),
    (1, "customer window"),
    (2, "absentzzz fast"),
]


def q_fts_significant_terms(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SIG_QUERIES, columns=["qid", "query"])
    corpus = _docs(spark, sf_dir)
    return search.significant_terms(
        spark, store, qpdf, corpus, text_col="text", id_col="doc_id",
        k=SIG_K, min_doc_count=SIG_MIN_DC,
    )


SIG_BG_FILTER = "customer"


def q_fts_significant_terms_bg(spark, sf_dir):
    """ES significant_terms with background_filter: over-representation
    vs the docs matching another query, not vs the whole index."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SIG_QUERIES, columns=["qid", "query"])
    corpus = _docs(spark, sf_dir)
    return search.significant_terms(
        spark, store, qpdf, corpus, text_col="text", id_col="doc_id",
        k=SIG_K, min_doc_count=SIG_MIN_DC,
        background_filter=SIG_BG_FILTER,
    )


def _significant_terms_bg_sql(
    queries: list[tuple[int, str]], k: int, min_dc: int, bg_query: str
) -> str:
    bts = sorted(set(analysis.tokenize_series(pd.Series([bg_query]))[0]))
    bvals = ", ".join(f"('{t}')" for t in bts)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
bq(term) AS (VALUES {bvals}),
bm AS (
  SELECT DISTINCT p.doc_id AS doc_id
  FROM posting p JOIN bq ON bq.term = p.term
),
nb AS (SELECT count(*) AS n_bg FROM bm),
bgc AS (
  SELECT p.term AS term, count(*) AS bg
  FROM bm JOIN posting p ON p.doc_id = bm.doc_id
  GROUP BY p.term
),
nm AS (SELECT qid, count(*) AS n_fg FROM m GROUP BY qid),
fg AS (
  SELECT m.qid AS qid, p.term AS term, count(*) AS fg
  FROM m JOIN posting p ON p.doc_id = m.doc_id
  GROUP BY m.qid, p.term
  HAVING count(*) >= {min_dc}
),
sc AS (
  SELECT fg.qid AS qid, fg.term AS term, fg.fg AS fg, bgc.bg AS bg,
         ((fg.fg * 1.0 / nm.n_fg) - (bgc.bg * 1.0 / nb.n_bg))
           * (fg.fg * 1.0 / nm.n_fg) / (bgc.bg * 1.0 / nb.n_bg) AS score
  FROM fg
  JOIN bgc ON bgc.term = fg.term
  JOIN nm ON nm.qid = fg.qid
  CROSS JOIN nb
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, term,
         CAST(fg AS BIGINT) AS fg, CAST(bg AS BIGINT) AS bg,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 9) DESC, term ASC
         ) AS INTEGER) AS rank
  FROM sc
)
SELECT qid, rank, term, fg, bg, score_r FROM ranked WHERE rank <= {k}
"""


SIGTXT_SAMPLE_K, SIGTXT_K, SIGTXT_MIN_DC = 30, 10, 2


def q_fts_significant_text(spark, sf_dir):
    """ES significant_text: JLH over the free text of the top-sample_k
    hits, term vectors read from the INDEX (no corpus access)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SIG_QUERIES, columns=["qid", "query"])
    return search.significant_text(
        spark, store, qpdf, sample_k=SIGTXT_SAMPLE_K, k=SIGTXT_K,
        min_doc_count=SIGTXT_MIN_DC,
    )


def _significant_text_sql(
    queries: list[tuple[int, str]], sample_k: int, k: int, min_dc: int
) -> str:
    """Oracle for q_fts_significant_text: BM25 top-sample_k docs
    (rounded-score, doc_id tiebreak), JLH over their distinct terms."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
sample AS (
  SELECT qid, doc_id FROM (
    SELECT CAST(qid AS BIGINT) AS qid, doc_id,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(score, 6) DESC, doc_id ASC
           ) AS rn
    FROM scored
  ) WHERE rn <= {sample_k}
),
nm AS (SELECT qid, count(*) AS n_fg FROM sample GROUP BY qid),
fg AS (
  SELECT s.qid AS qid, p.term AS term, count(*) AS fg
  FROM sample s JOIN posting p ON p.doc_id = s.doc_id
  GROUP BY s.qid, p.term
  HAVING count(*) >= {min_dc}
),
sc AS (
  SELECT fg.qid AS qid, fg.term AS term, fg.fg AS fg, d.df AS bg,
         ((fg.fg * 1.0 / nm.n_fg) - (d.df * 1.0 / st.n))
           * (fg.fg * 1.0 / nm.n_fg) / (d.df * 1.0 / st.n) AS score
  FROM fg
  JOIN dfreq d ON d.term = fg.term
  JOIN nm ON nm.qid = fg.qid
  CROSS JOIN stats st
),
ranked AS (
  SELECT qid, term, CAST(fg AS BIGINT) AS fg, CAST(bg AS BIGINT) AS bg,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, term ASC
         ) AS INTEGER) AS rank
  FROM sc
)
SELECT qid, rank, term, fg, bg, score_r FROM ranked WHERE rank <= {k}
"""


SCRIPTED_METRIC_EXPR = "dl * dl + 0.5 * n_chars"
TEMPLATE_SRC = "{{a}} {{b}}"
TEMPLATE_PARAMS = [(0, "spark", "merge"), (1, "customer", "window")]


def q_fts_scripted_metric(spark, sf_dir):
    """ES scripted_metric (whitelisted-expression map + associative
    reduce, codegen'd — never per-row Painless)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_scripted_metric(
        spark, store, qpdf, map_script=SCRIPTED_METRIC_EXPR,
        reduce="sum", doc_cols=("dl", "n_chars"),
    )


def _scripted_metric_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum({SCRIPTED_METRIC_EXPR}), 6) AS metric_r
FROM md GROUP BY qid
"""


def q_fts_search_template(spark, sf_dir):
    """ES _search/template: mustache render per params row, one batched
    top-k search for all rendered queries."""
    store = _corpus_store(spark, sf_dir)
    params = pd.DataFrame(TEMPLATE_PARAMS, columns=["qid", "a", "b"])
    res = search.search_template(spark, store, TEMPLATE_SRC, params, k=50)
    return _rerank_rounded(res, FT_K)


def _search_template_oracle() -> str:
    rendered = [
        (qid, search.render_search_template(TEMPLATE_SRC, {"a": a, "b": b}))
        for qid, a, b in TEMPLATE_PARAMS
    ]
    return _bm25_sql(rendered, FT_K, and_mode=False)


def q_fts_percolate(spark, sf_dir):
    reg = pd.DataFrame(PERC_QUERIES, columns=["query_id", "query"])
    return search.percolate(
        spark, reg, _docs(spark, sf_dir), text_col="text", id_col="doc_id",
        mode="and",
    )


def _significant_terms_sql(
    queries: list[tuple[int, str]], k: int, min_dc: int
) -> str:
    """Oracle for q_fts_significant_terms: JLH scored over-represented
    terms of the OR match set, min_doc_count gate, (score, term) rank."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
nm AS (SELECT qid, count(*) AS n_fg FROM m GROUP BY qid),
fg AS (
  SELECT m.qid AS qid, p.term AS term, count(*) AS fg
  FROM m JOIN posting p ON p.doc_id = m.doc_id
  GROUP BY m.qid, p.term
  HAVING count(*) >= {min_dc}
),
sc AS (
  SELECT fg.qid AS qid, fg.term AS term, fg.fg AS fg, d.df AS bg,
         ((fg.fg * 1.0 / nm.n_fg) - (d.df * 1.0 / s.n))
           * (fg.fg * 1.0 / nm.n_fg) / (d.df * 1.0 / s.n) AS score
  FROM fg
  JOIN dfreq d ON d.term = fg.term
  JOIN nm ON nm.qid = fg.qid
  CROSS JOIN stats s
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, term,
         CAST(fg AS BIGINT) AS fg, CAST(bg AS BIGINT) AS bg,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 9) DESC, term ASC
         ) AS INTEGER) AS rank
  FROM sc
)
SELECT qid, rank, term, fg, bg, score_r FROM ranked WHERE rank <= {k}
"""


def _percolate_sql(queries: list[tuple[int, str]]) -> str:
    """Oracle for q_fts_percolate: docs containing ALL of a registered
    query's distinct analyzed terms."""
    vals = []
    for query_id, q in queries:
        toks = sorted(set(analysis.tokenize_series(pd.Series([q]))[0]))
        for t in toks:
            vals.append(f"({query_id}, '{t}', {len(toks)})")
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
p AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(toks) AS term FROM x)
),
v(query_id, term, need) AS (VALUES {", ".join(vals)})
SELECT p.doc_id AS doc_id, CAST(v.query_id AS BIGINT) AS query_id
FROM p JOIN v ON v.term = p.term
GROUP BY p.doc_id, v.query_id, v.need
HAVING count(*) = v.need
"""


# ------------------------------------------------- 4k. rescore (phrase)
# ES rescore: phrase second pass over the top window of the BM25 first
# pass (plans/search.search_rescore).

RESCORE_QUERIES = [
    (0, "spark merge"),
    (1, "part filter scan"),
    (2, "customer window"),
]
RESCORE_WINDOW, RESCORE_QW, RESCORE_RW = 50, 1.0, 2.0


def q_fts_rescore(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(RESCORE_QUERIES, columns=["qid", "query"])
    res = search.search_rescore(
        spark, store, qpdf, k=FT_K, window_size=RESCORE_WINDOW,
        query_weight=RESCORE_QW, rescore_weight=RESCORE_RW,
    )
    return _rerank_rounded(res, FT_K)


def _rescore_sql(
    queries: list[tuple[int, str]], k: int,
    window: int, qw: float, rw: float,
) -> str:
    """Oracle for q_fts_rescore: top-window of the OR BM25 pass
    (score desc, doc_id), phrase-AND second score added with weights."""
    vals, needs, pats = [], [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        terms = sorted(Counter(toks).items())
        needs.append(f"({qid}, {len(terms)})")
        pats.append(f"({qid}, ' {' '.join(toks)} ')")
        for t, qtf in terms:
            vals.append(f"({qid}, '{t}', {qtf})")
    bm = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, need) AS (VALUES {", ".join(needs)}),
ph(pqid, pat) AS (VALUES {", ".join(pats)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * {bm}) AS score, count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
win AS (
  SELECT qid, doc_id, score, nt,
         row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id ASC
         ) AS rn
  FROM scored
),
resc AS (
  SELECT w.qid AS qid, w.doc_id AS doc_id,
         {qw} * w.score
           + {rw} * CASE
               WHEN n.need = w.nt AND contains(cs.s, ph.pat)
               THEN w.score ELSE 0.0 END AS score
  FROM win w
  JOIN need n ON n.nqid = w.qid
  JOIN ph ON ph.pqid = w.qid
  JOIN cs ON cs.doc_id = w.doc_id
  WHERE w.rn <= {window}
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM resc
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------- 4j. parent-child queries
# ES has_parent / has_child over the parent routing column the field
# mapping resolves (reference lib/handler.js:76-78). The entry corpus
# derives a deterministic family: docs with id >= 50 are children of
# doc id % 50; top-level docs point at the sentinel 'root' (not a doc).

PC_QUERY = [(0, "spark merge window"), (1, "customer")]

def _corpus_store_pc(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    (path,), fresh = _cached_store_paths(sf_dir, "pc1")
    if fresh:
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            "lang",
            F.col("text").alias("content"),
            F.when(
                F.col("doc_id") >= 50,
                (F.col("doc_id") % 50).cast("string"),
            ).otherwise(F.lit("root")).alias("parent_ref"),
        )
        cfg = IndexerConfig(
            index="docs", id_field="docid", parent_field="parent_ref"
        )
        build.build_index(corpus, cfg, path, num_buckets=32, resume=True)
    return search.load_store(path)


def q_fts_has_parent(spark, sf_dir):
    store = _corpus_store_pc(spark, sf_dir)
    qpdf = pd.DataFrame(PC_QUERY, columns=["qid", "query"])
    res = search.search_has_parent(spark, store, qpdf, k=FT_K, score=False)
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def q_fts_has_child(spark, sf_dir):
    store = _corpus_store_pc(spark, sf_dir)
    qpdf = pd.DataFrame(PC_QUERY, columns=["qid", "query"])
    res = search.search_has_child(
        spark, store, qpdf, k=FT_K, score_mode="none"
    )
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


_PC_FAM = """
fam AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN doc_id >= 50 THEN CAST(doc_id % 50 AS VARCHAR)
              ELSE 'root' END AS parent
  FROM documents
)"""


def _has_parent_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_has_parent: children of OR-matched parents,
    constant score, doc_id rank."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},{_PC_FAM},
hits AS (
  SELECT m.qid AS qid, f.doc_id AS doc_id
  FROM fam f JOIN m ON f.parent = m.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, 1.0 AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY doc_id ASC
         ) AS INTEGER) AS rank
  FROM hits
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _has_child_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_has_child: parents with >= 1 OR-matched child,
    score_mode none, doc_id rank. The parent must itself be a document."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},{_PC_FAM},
hits AS (
  SELECT DISTINCT m.qid AS qid, f.parent AS doc_id
  FROM m JOIN fam f ON f.doc_id = m.doc_id
  WHERE f.parent IN (SELECT doc_id FROM fam)
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, 1.0 AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY doc_id ASC
         ) AS INTEGER) AS rank
  FROM hits
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


INNER_HITS_SIZE = 3


def q_fts_has_child_inner(spark, sf_dir):
    """ES has_child with inner_hits: parents ranked by best child
    (score_mode max), each carrying its top matching children."""
    store = _corpus_store_pc(spark, sf_dir)
    qpdf = pd.DataFrame(PC_QUERY, columns=["qid", "query"])
    return search.search_has_child_inner_hits(
        spark, store, qpdf, k=FT_K, inner_size=INNER_HITS_SIZE
    )


def _has_child_inner_sql(queries, k: int, inner: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},{_PC_FAM},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
kids AS (
  SELECT s.qid AS qid, f.parent AS parent, s.doc_id AS child_doc_id,
         round(s.score, 6) AS child_score_r
  FROM scored s
  JOIN fam f ON f.doc_id = s.doc_id
  WHERE f.parent IN (SELECT doc_id FROM fam)
),
rk AS (
  SELECT *,
         CAST(row_number() OVER (
           PARTITION BY qid, parent
           ORDER BY child_score_r DESC, child_doc_id ASC
         ) AS INTEGER) AS child_rank,
         max(child_score_r) OVER (PARTITION BY qid, parent) AS score_r
  FROM kids
),
pr AS (
  SELECT *, CAST(dense_rank() OVER (
    PARTITION BY qid ORDER BY score_r DESC, parent ASC
  ) AS INTEGER) AS rank
  FROM rk WHERE child_rank <= {inner}
)
SELECT CAST(qid AS BIGINT) AS qid, rank, parent AS doc_id, score_r,
       child_rank, child_doc_id, child_score_r
FROM pr WHERE rank <= {k}
"""


PPL_CUTS = (1.0 / 3.0, 2.0 / 3.0)


def q_corpus_perplexity_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail perplexity triage: bigram-LM nll
    quantile thresholds, per-bucket counts and nll stats."""
    from ..operators import lm

    return lm.perplexity_buckets(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        k_smooth=LM_K, cuts=PPL_CUTS,
    )


def _ppl_buckets_sql() -> str:
    lo, hi = PPL_CUTS
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(2, len(toks) + 1),
                                    i -> toks[i - 1] || ' ' || toks[i])
                ELSE [] END) AS b
  FROM x
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(toks) AS w FROM x)
  GROUP BY w
),
v AS (SELECT count(*) AS v FROM uni),
bic AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b),
nll AS (
  SELECT bg.doc_id AS doc_id,
         -log2((bic.c12 + {LM_K}) / (uni.c1 + {LM_K} * v.v)) AS nll
  FROM bg
  JOIN bic ON bic.b = bg.b
  JOIN uni ON uni.w = split_part(bg.b, ' ', 1)
  CROSS JOIN v
),
ppl AS (
  SELECT doc_id, round(avg(nll), 6) AS nll_r FROM nll GROUP BY doc_id
),
thr AS (
  SELECT round(quantile_cont(nll_r, {lo!r}), 6) AS t1,
         round(quantile_cont(nll_r, {hi!r}), 6) AS t2
  FROM ppl
)
SELECT CASE WHEN nll_r <= t1 THEN 'head'
            WHEN nll_r <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(nll_r), 6) AS avg_nll_r,
       round(min(nll_r), 6) AS min_nll_r,
       round(max(nll_r), 6) AS max_nll_r
FROM ppl CROSS JOIN thr
GROUP BY bucket
"""


TOP_NGRAM_N, TOP_NGRAM_K = 3, 15


def q_corpus_top_ngrams(spark, sf_dir):
    """Boilerplate mining: corpus-wide most-frequent word trigrams with
    occurrence and doc counts (distributed top-k, no global sort)."""
    from ..operators import quality

    return quality.top_ngrams(
        _docs(spark, sf_dir), n=TOP_NGRAM_N, k=TOP_NGRAM_K
    )


def _top_ngrams_sql(n: int, k: int) -> str:
    parts = " || ' ' || ".join(
        f"toks[i - {n - 1 - j}]" for j in range(n)
    )
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= {n}
                THEN list_transform(range({n}, len(toks) + 1),
                                    i -> {parts})
                ELSE [] END) AS ngram
  FROM x
),
agg AS (
  SELECT ngram, count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs
  FROM g GROUP BY ngram
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    ORDER BY n_occurrences DESC, ngram ASC
  ) AS INTEGER) AS rank
  FROM agg
)
SELECT rank, ngram, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs
FROM ranked WHERE rank <= {k}
"""


# --------------- 4j2. children agg / parent_id (join-field family)

PARENT_ID_QUERY = [(0, "7"), (1, "23")]


def q_fts_children_agg(spark, sf_dir):
    """ES children agg + parent reverse: matched parents' children
    bucketed by child lang; n_children in child space, n_parents the
    distinct-owner count the parent reverse-step recovers."""
    store = _corpus_store_pc(spark, sf_dir)
    qpdf = pd.DataFrame(PC_QUERY, columns=["qid", "query"])
    return search.search_children_agg(spark, store, qpdf, group_col="lang")


def _children_agg_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},{_PC_FAM}
SELECT CAST(m.qid AS BIGINT) AS qid, d.lang AS "group",
       CAST(count(*) AS BIGINT) AS n_children,
       CAST(count(DISTINCT f.parent) AS BIGINT) AS n_parents
FROM m JOIN fam f ON f.parent = m.doc_id
JOIN documents d ON CAST(d.doc_id AS VARCHAR) = f.doc_id
GROUP BY m.qid, d.lang
"""


def q_fts_parent_id(spark, sf_dir):
    """ES parent_id query: children of one literal parent id per row."""
    store = _corpus_store_pc(spark, sf_dir)
    ppdf = pd.DataFrame(PARENT_ID_QUERY, columns=["qid", "parent"])
    return search.search_parent_id(spark, store, ppdf, k=FT_K)


def _parent_id_sql(parents: list[tuple[int, str]], k: int) -> str:
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in parents)
    return f"""WITH {_PC_FAM.lstrip()},
pq(qid, parent) AS (VALUES {vals}),
ranked AS (
  SELECT CAST(pq.qid AS BIGINT) AS qid, f.doc_id AS doc_id,
         1.0 AS score_r,
         CAST(row_number() OVER (
           PARTITION BY pq.qid ORDER BY f.doc_id ASC
         ) AS INTEGER) AS rank
  FROM pq JOIN fam f ON f.parent = pq.parent
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------- 4i1b. random_sampler / percentile_ranks / date_range

SAMPLER_P = 0.45
PCT_RANK_VALUES = (60.0, 110.0, 170.0)
FTS_DATE_RANGES = [
    ("early", None, "2020-06-01"),
    ("mid", "2020-06-01", "2021-01-01"),
    ("late", "2021-01-01", None),
]


def q_fts_random_sampler(spark, sf_dir):
    """ES random_sampler agg: md5-uniform sample of the match set at
    rate p, sub-agg (count, avg dl) + 1/p-scaled total estimate."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_random_sampler(
        spark, store, qpdf, probability=SAMPLER_P, value_col="dl"
    )


def _random_sampler_sql(queries, p: float) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
u AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id), 1, 8))::BIGINT / 4294967296.0 AS u
  FROM dl
)
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_sampled,
       round(avg(CAST(dl.dl AS DOUBLE)), 6) AS avg_value_r,
       round(count(*) / {p!r}, 6) AS est_total
FROM m JOIN u ON u.doc_id = m.doc_id
JOIN dl ON dl.doc_id = m.doc_id
WHERE u.u < {p!r}
GROUP BY m.qid
"""


def q_fts_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks agg (inverse percentiles): exact CDF of dl
    at fixed probe values over the match set."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_percentile_ranks_agg(
        spark, store, qpdf, values=PCT_RANK_VALUES, value_col="dl"
    )


def _percentile_ranks_sql(queries, values) -> str:
    vals = ", ".join(f"({float(v)!r})" for v in values)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
pv(value) AS (VALUES {vals})
SELECT CAST(m.qid AS BIGINT) AS qid, pv.value AS value,
       round(100.0 * sum(CASE WHEN CAST(dl.dl AS DOUBLE) <= pv.value
                              THEN 1 ELSE 0 END) / count(*), 6) AS rank_r
FROM m JOIN dl ON dl.doc_id = m.doc_id
CROSS JOIN pv
GROUP BY m.qid, pv.value
"""


def q_fts_date_range(spark, sf_dir):
    """ES date_range agg: named [from, to) buckets (unbounded edges,
    overlap allowed) over the derived ts doc field."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_date_range_agg(
        spark, store, qpdf, ranges=FTS_DATE_RANGES, value_col="ts"
    )


_SQL_DOC_TS = (
    "CAST(DATE '2020-01-01' + CAST(doc.doc_id % 400 AS INTEGER) "
    "AS TIMESTAMP)"
)


def _fts_date_range_sql(queries, ranges) -> str:
    vals = ", ".join(
        "('{}', {}, {})".format(
            key,
            f"TIMESTAMP '{lo}'" if lo else "CAST(NULL AS TIMESTAMP)",
            f"TIMESTAMP '{hi}'" if hi else "CAST(NULL AS TIMESTAMP)",
        )
        for key, lo, hi in ranges
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
dt AS (
  SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id, {_SQL_DOC_TS} AS ts
  FROM documents doc
),
r(rkey, lo, hi) AS (VALUES {vals})
SELECT CAST(m.qid AS BIGINT) AS qid, r.rkey AS rkey,
       CAST(sum(CASE WHEN (r.lo IS NULL OR dt.ts >= r.lo)
                      AND (r.hi IS NULL OR dt.ts < r.hi)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
FROM m JOIN dt ON dt.doc_id = m.doc_id
CROSS JOIN r
GROUP BY m.qid, r.rkey
"""


# ----------------- 4i2. cardinality / percentiles / top_hits aggs

PCTS = (0.25, 0.5, 0.75, 0.95)
TOP_HITS_KPG = 3


def q_fts_cardinality(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_cardinality_agg(
        spark, store, qpdf, value_col="lang"
    )


def q_fts_percentiles(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_percentiles_agg(
        spark, store, qpdf, value_col="dl", percentiles=PCTS
    )


def q_fts_top_hits(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_top_hits(
        spark, store, qpdf, group_col="lang", k_per_group=TOP_HITS_KPG
    )


def _cardinality_sql(queries: list[tuple[int, str]]) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT c.lang) AS BIGINT) AS cardinality
FROM m JOIN (SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang
             FROM documents) c ON c.doc_id = m.doc_id
GROUP BY m.qid
"""


def _percentiles_sql(
    queries: list[tuple[int, str]], pcts: tuple[float, ...]
) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST(m.qid AS BIGINT) AS qid, {p} AS pct,\n"
        f"       round(quantile_cont(dl.dl, {p}), 6) AS value_r\n"
        f"FROM m JOIN dl ON dl.doc_id = m.doc_id GROUP BY m.qid"
        for p in pcts
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
{unions}
"""


def _top_hits_sql(queries: list[tuple[int, str]], kpg: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, {DOC_TOKS} AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(sc.qid AS BIGINT) AS qid, c.lang AS "group", sc.doc_id,
         round(sc.score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY sc.qid, c.lang
           ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC
         ) AS INTEGER) AS grank
  FROM scored sc JOIN corpus c ON c.doc_id = sc.doc_id
)
SELECT qid, "group", grank, doc_id, score_r
FROM ranked WHERE grank <= {kpg}
"""


# ----------------------- 4i. sort / suggest / stats / histogram surface
# ES response shaping: sort-by-field, term suggester, stats + histogram
# aggregations over the match set (plans/search.search_sorted /
# suggest_terms / search_stats_agg / search_histogram).

SORTED_QUERIES = [(0, "spark merge"), (1, "customer window")]
SUGGEST_PROBES = [(0, "spak"), (1, "mrge"), (2, "zzzzqqqqzz")]
SUGGEST_K, SUGGEST_EDITS = 5, 2
HIST_INTERVAL = 64.0


def q_fts_sorted(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_sorted(
        spark, store, qpdf, sort_col="dl", k=FT_K, ascending=True
    )


SORT_AFTER = (55.0, "250")  # keyset cursor: page past (dl, doc_id)


# WAND-path msm / score-cursor pagination gates (r5): the same queries
# the exhaustive gates use, forced onto algo='wand' — the pruned scorer
# must reproduce the oracle's exhaustive semantics exactly.
WAND_MSM_QUERIES = [
    (0, "spark merge window"),
    (1, "customer stream sort data"),
    (2, "query fast key"),
]
WAND_MSM = 2
WAND_AFTER = (1.2, "")  # score-desc page strictly below 1.2


def q_fts_wand_msm(spark, sf_dir):
    """minimum_should_match on the block-max WAND path: >= 2 distinct
    query terms must match; tau only over already-qualified candidates."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(WAND_MSM_QUERIES, columns=["qid", "query"])
    return _rerank_rounded(
        search.search(
            spark, store, qpdf, k=50, algo="wand",
            minimum_should_match=WAND_MSM,
        ),
        FT_K,
    )


def _wand_msm_sql(queries, msm, k) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored WHERE nt >= {msm}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def q_fts_wand_after(spark, sf_dir):
    """search_after on the WAND path: the BM25 page strictly below the
    pinned (score, doc_id) cursor — cursor-certified tau keeps block-max
    pruning live on deep pages."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search(
        spark, store, qpdf, k=FT_K, algo="wand", search_after=WAND_AFTER,
    )
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def _wand_after_sql(queries, k) -> str:
    s0, d0 = WAND_AFTER
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY score DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
  WHERE score < {s0} OR (score = {s0} AND doc_id > '{d0}')
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def q_fts_sorted_after(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_sorted(
        spark, store, qpdf, sort_col="dl", k=FT_K, ascending=True,
        search_after=SORT_AFTER,
    )


def _sorted_after_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_sorted_after: the dl-ascending match set strictly
    after the (sort_value, doc_id) keyset cursor."""
    sv, did = SORT_AFTER
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
ranked AS (
  SELECT CAST(m.qid AS BIGINT) AS qid, m.doc_id AS doc_id,
         CAST(dl.dl AS DOUBLE) AS sort_value,
         CAST(row_number() OVER (
           PARTITION BY m.qid ORDER BY dl.dl ASC, m.doc_id ASC
         ) AS INTEGER) AS rank
  FROM m JOIN dl ON dl.doc_id = m.doc_id
  WHERE dl.dl > {sv}
     OR (dl.dl = {sv} AND m.doc_id > '{did}')
)
SELECT qid, rank, doc_id, sort_value FROM ranked WHERE rank <= {k}
"""


def q_fts_suggest(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(SUGGEST_PROBES, columns=["qid", "probe"])
    return search.suggest_terms(
        spark, store, ppdf, k=SUGGEST_K, max_edits=SUGGEST_EDITS
    )


def q_fts_stats_agg(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_stats_agg(spark, store, qpdf, value_col="dl")
    return res.select(
        "qid", "n_docs",
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round("sum_v", 6).alias("sum_v"),
        F.round("avg_v", 6).alias("avg_v"),
    )


def q_fts_histogram(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_histogram(
        spark, store, qpdf, interval=HIST_INTERVAL, value_col="dl"
    )


def _match_m_cte(queries: list[tuple[int, str]]) -> str:
    """Shared oracle CTE: DISTINCT (qid, doc_id) OR-match membership."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t in sorted(set(toks)):
            vals.append(f"({qid}, '{t}')")
    return f"""
q(qid, term) AS (VALUES {", ".join(vals)}),
m AS (
  SELECT DISTINCT q.qid AS qid, p.doc_id AS doc_id
  FROM q JOIN posting p ON p.term = q.term
)"""


def _sorted_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_sorted: match set ordered by dl asc, doc_id asc."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
ranked AS (
  SELECT CAST(m.qid AS BIGINT) AS qid, m.doc_id AS doc_id,
         CAST(dl.dl AS DOUBLE) AS sort_value,
         CAST(row_number() OVER (
           PARTITION BY m.qid ORDER BY dl.dl ASC, m.doc_id ASC
         ) AS INTEGER) AS rank
  FROM m JOIN dl ON dl.doc_id = m.doc_id
)
SELECT qid, rank, doc_id, sort_value FROM ranked WHERE rank <= {k}
"""


def _suggest_sql(probes: list[tuple[int, str]], k: int, edits: int) -> str:
    """Oracle for q_fts_suggest: dictionary terms within the edit budget
    ranked (distance, df desc, term)."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in probes)
    return f"""{_BM25_BODY},
v(qid, probe) AS (VALUES {vals}),
hit AS (
  SELECT v.qid AS qid, d.term AS suggestion,
         levenshtein(d.term, v.probe) AS dist, d.df AS df
  FROM v JOIN dfreq d ON abs(len(d.term) - len(v.probe)) <= {edits}
  WHERE levenshtein(d.term, v.probe) <= {edits}
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, suggestion,
         CAST(dist AS INTEGER) AS dist, CAST(df AS BIGINT) AS df,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY dist ASC, df DESC, suggestion ASC
         ) AS INTEGER) AS rank
  FROM hit
)
SELECT qid, rank, suggestion, dist, df FROM ranked WHERE rank <= {k}
"""


# modes need probes that ARE indexed terms: 'merge' is in the dictionary
SUGGEST_MODE_PROBES = [(0, "merge"), (1, "mrge"), (2, "zzzzqqqqzz")]


def q_fts_suggest_popular(spark, sf_dir):
    """ES suggest_mode=popular: only suggestions strictly more frequent
    than the probe itself; an indexed probe never suggests itself."""
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(SUGGEST_MODE_PROBES, columns=["qid", "probe"])
    return search.suggest_terms(
        spark, store, ppdf, k=SUGGEST_K, max_edits=SUGGEST_EDITS,
        suggest_mode="popular",
    )


def q_fts_suggest_missing(spark, sf_dir):
    """ES suggest_mode=missing (the ES default): indexed probes get no
    suggestions at all; unindexed probes suggest normally."""
    store = _corpus_store(spark, sf_dir)
    ppdf = pd.DataFrame(SUGGEST_MODE_PROBES, columns=["qid", "probe"])
    return search.suggest_terms(
        spark, store, ppdf, k=SUGGEST_K, max_edits=SUGGEST_EDITS,
        suggest_mode="missing",
    )


def _suggest_mode_sql(
    probes: list[tuple[int, str]], k: int, edits: int, mode: str
) -> str:
    """Oracle for the suggest_mode variants: the probe's own df (dist 0)
    gates/filters the candidate set before ranking."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in probes)
    gate = (
        "WHERE probe_df IS NULL"
        if mode == "missing"
        else "WHERE dist > 0 AND df > COALESCE(probe_df, 0)"
    )
    return f"""{_BM25_BODY},
v(qid, probe) AS (VALUES {vals}),
hit AS (
  SELECT v.qid AS qid, d.term AS suggestion,
         levenshtein(d.term, v.probe) AS dist, d.df AS df
  FROM v JOIN dfreq d ON abs(len(d.term) - len(v.probe)) <= {edits}
  WHERE levenshtein(d.term, v.probe) <= {edits}
),
gated AS (
  SELECT qid, suggestion, dist, df,
         max(CASE WHEN dist = 0 THEN df END) OVER (PARTITION BY qid)
           AS probe_df
  FROM hit
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, suggestion,
         CAST(dist AS INTEGER) AS dist, CAST(df AS BIGINT) AS df,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY dist ASC, df DESC, suggestion ASC
         ) AS INTEGER) AS rank
  FROM gated {gate}
)
SELECT qid, rank, suggestion, dist, df FROM ranked WHERE rank <= {k}
"""


def _stats_agg_sql(queries: list[tuple[int, str]]) -> str:
    """Oracle for q_fts_stats_agg: per-qid dl stats over the match set."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(min(dl.dl) AS DOUBLE), 6) AS min_v,
       round(CAST(max(dl.dl) AS DOUBLE), 6) AS max_v,
       round(CAST(sum(dl.dl) AS DOUBLE), 6) AS sum_v,
       round(CAST(avg(dl.dl) AS DOUBLE), 6) AS avg_v
FROM m JOIN dl ON dl.doc_id = m.doc_id
GROUP BY m.qid
"""


def _histogram_sql(queries: list[tuple[int, str]], interval: float) -> str:
    """Oracle for q_fts_histogram: per-(qid, bucket) counts with
    bucket = floor(dl / interval) * interval."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       floor(dl.dl / {interval}) * {interval} AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN dl ON dl.doc_id = m.doc_id
GROUP BY m.qid, bucket
"""


# ---------- 4g2. moving_percentiles / bucket_correlation / composite

MOVP_INTERVAL, MOVP_WINDOW, MOVP_PCT = 16.0, 3, 0.5


def q_fts_moving_percentiles(spark, sf_dir):
    """ES moving_percentiles: sliding exact median of histogram bucket
    counts (window before each bucket, first bucket null)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_moving_percentiles(
        spark, store, qpdf, interval=MOVP_INTERVAL, window=MOVP_WINDOW,
        pct=MOVP_PCT,
    )


def _moving_percentiles_sql(queries, interval, window, pct) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
hist AS (
  SELECT m.qid AS qid,
         floor(dl.dl / {interval}) * {interval} AS bucket,
         count(*) AS n_docs
  FROM m JOIN dl ON dl.doc_id = m.doc_id
  GROUP BY m.qid, bucket
)
SELECT CAST(qid AS BIGINT) AS qid, bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(quantile_cont(CAST(n_docs AS DOUBLE), {float(pct)!r}) OVER (
         PARTITION BY qid ORDER BY bucket ASC
         ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING
       ), 6) AS moving_pct_r
FROM hist
"""


BCORR_INTERVAL = 32.0


def q_fts_bucket_correlation(spark, sf_dir):
    """ES bucket_correlation: Pearson corr between the match set's
    bucket counts and the whole-corpus background counts."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_bucket_correlation(
        spark, store, qpdf, interval=BCORR_INTERVAL
    )


def _bucket_correlation_sql(queries, interval) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
bg AS (
  SELECT floor(dl / {interval}) * {interval} AS bucket,
         count(*) AS bg_n
  FROM dl GROUP BY bucket
),
fg AS (
  SELECT m.qid AS qid, floor(dl.dl / {interval}) * {interval} AS bucket,
         count(*) AS fg_n
  FROM m JOIN dl ON dl.doc_id = m.doc_id
  GROUP BY m.qid, bucket
),
axis AS (
  SELECT q.qid AS qid, bg.bucket AS bucket, bg.bg_n AS bg_n
  FROM (SELECT DISTINCT qid FROM fg) q CROSS JOIN bg
),
j AS (
  SELECT a.qid, a.bucket, a.bg_n, COALESCE(fg.fg_n, 0) AS fg_n
  FROM axis a LEFT JOIN fg ON fg.qid = a.qid AND fg.bucket = a.bucket
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_buckets,
       round(corr(CAST(fg_n AS DOUBLE), CAST(bg_n AS DOUBLE)), 6)
         AS corr_r
FROM j GROUP BY qid
"""


COMP2_INTERVAL, COMP2_SIZE = 32.0, 8
COMP2_AFTER = ("src2", 32.0)


def q_fts_composite_two_source(spark, sf_dir):
    """ES composite agg with two sources (terms x histogram): observed
    pairs in composite-key order, paged strictly after a cursor pair."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_composite_agg(
        spark, store, qpdf, group_col="source", interval=COMP2_INTERVAL,
        size=COMP2_SIZE, after=COMP2_AFTER,
    )


def _composite_two_source_sql(queries, interval, size, after) -> str:
    g0, b0 = after
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
pairs AS (
  SELECT m.qid AS qid, doc.source AS "group",
         floor(dl.dl / {interval}) * {interval} AS bucket,
         count(*) AS n_docs
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
  WHERE doc.source > '{g0}'
     OR (doc.source = '{g0}'
         AND floor(dl.dl / {interval}) * {interval} > {b0!r})
  GROUP BY m.qid, doc.source, bucket
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY "group" ASC, bucket ASC
  ) AS _rn FROM pairs
)
SELECT CAST(qid AS BIGINT) AS qid, "group", bucket,
       CAST(n_docs AS BIGINT) AS n_docs
FROM ranked WHERE _rn <= {size}
"""


TERMS_INCLUDE, TERMS_EXCLUDE = "^src[0-4]$", "src3"


def q_fts_terms_agg_filtered(spark, sf_dir):
    """ES terms agg include/exclude regex bucket filters."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_terms_agg(
        spark, store, qpdf, group_col="source", value_col="dl",
        include_regex=TERMS_INCLUDE, exclude_regex=TERMS_EXCLUDE,
    )


def _terms_agg_filtered_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid, doc.source AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(dl.dl AS DOUBLE)), 6) AS avg_value_r
FROM m
JOIN dl ON dl.doc_id = m.doc_id
JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
WHERE regexp_matches(doc.source, '{TERMS_INCLUDE}')
  AND NOT regexp_matches(doc.source, '{TERMS_EXCLUDE}')
GROUP BY m.qid, doc.source
"""


TOKEN_BUDGET = 3000


def q_corpus_token_budget_fill(spark, sf_dir):
    """Per-lang token-budget corpus fill: md5-ordered cumulative token
    sum per stratum, stop once the budget is crossed."""
    from ..operators import sampling

    return sampling.token_budget_sample(
        _docs(spark, sf_dir), budget=TOKEN_BUDGET, strata_col="lang",
        key_col="doc_id", text_col="text",
    )


def _token_budget_sql(budget: int) -> str:
    return f"""
WITH x AS (
  SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS h,
         len({DOC_TOKS}) AS t
  FROM documents
),
c AS (
  SELECT lang, t,
         sum(t) OVER (
           PARTITION BY lang ORDER BY h ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM x
)
SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens
FROM c WHERE cum - t < {budget}
GROUP BY lang
"""


# --------------------------------------------------- 4h. boosting query
# ES boosting: positive matches, demoted (not excluded) by negative_boost
# when the negative half also matches (plans/search.search_boosting).

BOOSTING_QUERIES = [
    (0, "spark merge", "window"),
    (1, "customer", "absentzzz"),
    (2, "absentzzz", "customer"),
]
BOOSTING_NB = 0.4


def q_fts_boosting(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(
        BOOSTING_QUERIES, columns=["qid", "positive", "negative"]
    )
    res = search.search_boosting(
        spark, store, qpdf, k=50, negative_boost=BOOSTING_NB
    )
    return _rerank_rounded(res, FT_K)


def _boosting_sql(
    queries: list[tuple[int, str, str]], k: int, nb: float
) -> str:
    """Oracle for q_fts_boosting: positive OR BM25; a doc also matching any
    negative term gets score × negative_boost."""
    vals = []
    for qid, pos, neg in queries:
        for half, q in ((0, pos), (1, neg)):
            toks = analysis.tokenize_series(pd.Series([q]))[0]
            for t, qtf in sorted(Counter(toks).items()):
                vals.append(f"({qid}, {half}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, half, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(CASE WHEN q.half = 0 THEN
             q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         END) AS pos,
         max(CASE WHEN q.half = 1 THEN 1 END) AS neg
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(CASE WHEN neg IS NOT NULL THEN pos * {nb} ELSE pos END, 6)
           AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(CASE WHEN neg IS NOT NULL THEN pos * {nb}
                               ELSE pos END, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
  WHERE pos IS NOT NULL
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------- 4g. simple_query_string
# +must -not "phrase" should — parsed into the fused clause pipeline +
# one composite-qid phrase kernel pass (plans/search.search_query_string).

QS_QUERIES = [
    (0, '+spark merge "part filter scan"'),
    (1, "customer -window"),
    (2, '"spark merge" -absentzzz'),
    (3, "+absentzzz spark"),
    (4, "fast key data"),
]


def q_fts_query_string(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(QS_QUERIES, columns=["qid", "query"])
    res = search.search_query_string(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def _query_string_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_query_string: clause-side BM25 (must/should/
    must_not) full-outer-joined with phrase containment scores, the same
    gate as the engine (all must, all phrases, no must_not, >=1 should when
    nothing else constrains)."""
    from dynamo2es_lambda_spark.plans.search import parse_query_string

    clause_vals, ph_term_vals, ph_pat_vals, need_vals = [], [], [], []
    for qid, q in queries:
        p = parse_query_string(q)
        for cl, toks in ((0, p["must"]), (1, p["should"]),
                         (2, p["must_not"])):
            for t, c in sorted(Counter(toks).items()):
                clause_vals.append(f"({qid}, {cl}, '{t}', {c})")
        for j, ph in enumerate(p["phrases"]):
            ptoks = list(analysis.tokenize_series(pd.Series([ph]))[0])
            terms = sorted(Counter(ptoks).items())
            ph_pat_vals.append(
                f"({qid}, {j}, ' {' '.join(ptoks)} ', {len(terms)})"
            )
            for t, c in terms:
                ph_term_vals.append(f"({qid}, {j}, '{t}', {c})")
        nm, np_ = len(set(p["must"])), len(p["phrases"])
        nsg = 1 if (p["must"] or p["phrases"] or not p["should"]) else 0
        need_vals.append(f"({qid}, {nm}, {np_}, {nsg})")
    bm = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))"
    )
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
q(qid, clause, term, qtf) AS (VALUES {", ".join(clause_vals)}),
boolside AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(CASE WHEN q.clause <= 1 THEN q.qtf * {bm} END) AS b_score,
         count(CASE WHEN q.clause = 0 THEN 1 END) AS nt_must,
         count(CASE WHEN q.clause = 1 THEN 1 END) AS nt_should,
         max(CASE WHEN q.clause = 2 THEN 1 END) AS mnot
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
pq(pqid, pidx, term, qtf) AS (VALUES {", ".join(ph_term_vals)}),
pp(ppqid, ppidx, pat, needt) AS (VALUES {", ".join(ph_pat_vals)}),
php AS (
  SELECT pq.pqid AS qid, pq.pidx AS pidx, p.doc_id AS doc_id,
         sum(pq.qtf * {bm}) AS sc, count(*) AS nt
  FROM pq
  JOIN posting p ON p.term = pq.term
  JOIN dfreq d ON d.term = pq.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY pq.pqid, pq.pidx, p.doc_id
),
phm AS (
  SELECT php.qid AS qid, php.doc_id AS doc_id,
         count(*) AS ph_cnt, sum(php.sc) AS p_score
  FROM php
  JOIN pp ON pp.ppqid = php.qid AND pp.ppidx = php.pidx
         AND php.nt = pp.needt
  JOIN cs ON cs.doc_id = php.doc_id AND contains(cs.s, pp.pat)
  GROUP BY php.qid, php.doc_id
),
need(nqid, nm, np, nsg) AS (VALUES {", ".join(need_vals)}),
comb AS (
  SELECT COALESCE(b.qid, m.qid) AS qid,
         COALESCE(b.doc_id, m.doc_id) AS doc_id,
         COALESCE(b.b_score, 0) + COALESCE(m.p_score, 0) AS score,
         b.nt_must AS nt_must, b.nt_should AS nt_should, b.mnot AS mnot,
         m.ph_cnt AS ph_cnt
  FROM boolside b
  FULL OUTER JOIN phm m ON b.qid = m.qid AND b.doc_id = m.doc_id
),
gated AS (
  SELECT c.qid AS qid, c.doc_id AS doc_id, c.score AS score
  FROM comb c JOIN need n ON n.nqid = c.qid
  WHERE c.mnot IS NULL
    AND (n.nm = 0 OR COALESCE(c.nt_must, 0) = n.nm)
    AND (n.np = 0 OR COALESCE(c.ph_cnt, 0) = n.np)
    AND (n.nsg = 1 OR COALESCE(c.nt_should, 0) >= 1)
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gated
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# -------------------------------------------- 4g2. Lucene query_string
# Full boolean syntax (AND/OR/NOT, parens, field:word, field:(...)) on
# the MULTI-FIELD store — each atom scored with its field's df + avgdl.
# The compiler (plans/search.lucene_query_plan) emits ONE portable match
# predicate + score expression over per-atom score columns; the oracle
# below runs the IDENTICAL generated strings over a per-field DuckDB
# BM25 pivot — the boolean semantics live in exactly one place.

LQS_QUERIES = [
    (0, "spark AND merge"),
    (1, "(spark OR customer) AND NOT window"),
    (2, "source:src1 AND spark"),
    (3, "spark AND NOT absentzzz"),
    (4, "sparkMerge OR (fast AND key)"),   # camelCase leaf = OR of subtokens
    (5, "source:(src2 OR src3) AND merge"),
    (6, "fast key data"),                  # implicit adjacency = OR
    (7, '"spark merge" OR (customer AND NOT window)'),  # phrase leaf
    (8, "merge^2.5 OR spark"),             # leaf boost
    (9, 'source:src1^3 AND "table scan"'),  # boosted field leaf + phrase
    (10, '(spark OR merge)^0.5 AND fast'),  # group boost
]

# default_operator=AND + minimum_should_match variant: adjacency and
# multi-token leaves become conjunctions; the top-level OR of qid 4
# requires >= 2 of its 3 clauses (ES parameters of the same names)
LQS_AND_QUERIES = [
    (0, "spark merge"),                      # adjacency = AND
    (1, "fast key data"),                    # all three required
    (2, "sparkMerge"),                       # camelCase leaf = AND now
    (3, "spark merge OR customer window"),   # (a AND b) OR (c AND d)
    (4, "spark OR customer OR window"),      # top OR gated by msm=2
    (5, 'source:src1 "table scan"'),         # adjacency across kinds
]
LQS_AND_MSM = 2

# fields variant: unqualified clauses fan across text + boosted source
# as a per-atom best_fields dis_max (ES `fields: ["text", "source^2.5"]`)
LQS_FIELDS_QUERIES = [
    (0, "spark AND src1"),          # src1 only matches via source field
    (1, "src2 OR src3"),
    (2, '"spark merge" AND src4'),  # unqualified phrase fans too
    (3, "source:src5 AND merge"),   # qualified leaf ignores fields
    (4, "sparkMerge src6"),
]
LQS_FIELDS = {"text": 1.0, "source": 2.5}


def q_fts_lucene_qs(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(LQS_QUERIES, columns=["qid", "query"])
    res = search.search_lucene_query_string(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_lucene_qs_and(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(LQS_AND_QUERIES, columns=["qid", "query"])
    res = search.search_lucene_query_string(
        spark, store, qpdf, k=50,
        default_operator="AND", minimum_should_match=LQS_AND_MSM,
    )
    return _rerank_rounded(res, FT_K)


def q_fts_lucene_qs_fields(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(LQS_FIELDS_QUERIES, columns=["qid", "query"])
    res = search.search_lucene_query_string(
        spark, store, qpdf, k=50, fields=LQS_FIELDS,
    )
    return _rerank_rounded(res, FT_K)


_ORACLE_LQ_TOKEN = re.compile(r'"([^"]*)"|([()])|([^\s()"]+)')


def _oracle_lucene_parse(q: str, default_operator: str = "OR") -> tuple:
    """INDEPENDENT re-implementation of the Lucene query_string grammar
    for the DuckDB oracle (ADVICE r4: the oracle previously evaluated
    the engine compiler's own generated SQL, so a parser/compiler bug
    would self-verify). Written from the documented grammar — regex
    lexer + precedence-climbing parser, sharing NO code with
    plans/search.parse_lucene_query. Handles the valid-query subset the
    gate queries use (no error-path parity needed: gate queries are
    fixed and valid). Node shapes match the engine's AST contract:
    ("or"/"and", [ch]), ("not", ch), ("boost", f, ch),
    ("leaf", field, word), ("phrase", field, text)."""
    raw: list[tuple] = []
    for mt in _ORACLE_LQ_TOKEN.finditer(str(q)):
        ph, par, w = mt.group(1), mt.group(2), mt.group(3)
        if ph is not None:
            raw.append(("PHRASE", None, ph))
        elif par:
            raw.append((par, None, None))
        else:
            raw.append(("RAW", None, w))
    toks: list[tuple] = []
    i = 0
    while i < len(raw):
        kind, _f, w = raw[i]
        if kind != "RAW":
            toks.append(raw[i])
            i += 1
            continue
        if w in ("AND", "&&"):
            toks.append(("ANDOP", None, None))
        elif w in ("OR", "||"):
            toks.append(("OROP", None, None))
        elif w in ("NOT", "!"):
            toks.append(("NOTOP", None, None))
        elif w.startswith("^"):
            # boost trailing a ')' or a closing quote lexes as its own word
            toks.append(("BOOST", None, float(w[1:])))
        else:
            if w.startswith("!"):
                toks.append(("NOTOP", None, None))
                w = w[1:]
            boost = None
            if "^" in w:
                w, _, braw = w.partition("^")
                boost = float(braw)
            field = None
            if ":" in w:
                field, _, w = w.partition(":")
            if w == "":
                nxt = raw[i + 1] if i + 1 < len(raw) else None
                if field and nxt and nxt[0] == "(":
                    toks.append(("SCOPE", field, None))
                    i += 1
                    continue
                if field and nxt and nxt[0] == "PHRASE":
                    toks.append(("PHRASE", field, nxt[2]))
                    i += 2
                    if boost is not None:
                        toks.append(("BOOST", None, boost))
                    continue
                raise ValueError("oracle lucene: empty clause")
            toks.append(("WORD", field, w))
            if boost is not None:
                toks.append(("BOOST", None, boost))
        i += 1

    pos = [0]
    START = ("WORD", "PHRASE", "NOTOP", "(", "SCOPE")
    adj_and = default_operator == "AND"

    def peek():
        return toks[pos[0]][0] if pos[0] < len(toks) else None

    def take():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def wrap_boosts(node):
        while peek() == "BOOST":
            node = ("boost", take()[2], node)
        return node

    def p_or(scope):
        ch = [p_and(scope)]
        while True:
            k = peek()
            if k == "OROP":
                take()
                ch.append(p_and(scope))
            elif not adj_and and k in START:
                ch.append(p_and(scope))
            else:
                break
        return ch[0] if len(ch) == 1 else ("or", ch)

    def p_and(scope):
        ch = [p_unary(scope)]
        while True:
            k = peek()
            if k == "ANDOP":
                take()
                ch.append(p_unary(scope))
            elif adj_and and k in START:
                ch.append(p_unary(scope))
            else:
                break
        return ch[0] if len(ch) == 1 else ("and", ch)

    def p_unary(scope):
        k = peek()
        if k == "NOTOP":
            take()
            return ("not", p_unary(scope))
        if k == "SCOPE":
            _, fld, _ = take()
            if peek() != "(":
                raise ValueError("oracle lucene: field:( needs a group")
            return p_unary(fld)
        if k == "(":
            take()
            node = p_or(scope)
            if peek() != ")":
                raise ValueError("oracle lucene: unbalanced parens")
            take()
            return wrap_boosts(node)
        if k == "WORD":
            _, fld, w = take()
            return wrap_boosts(("leaf", fld if fld is not None else scope, w))
        if k == "PHRASE":
            _, fld, text = take()
            return wrap_boosts(
                ("phrase", fld if fld is not None else scope, text)
            )
        raise ValueError(f"oracle lucene: unexpected {k!r}")

    tree = p_or(None)
    if pos[0] != len(toks):
        raise ValueError("oracle lucene: trailing tokens")
    return tree


def _oracle_lucene_plan(
    queries: list[tuple[int, str]],
    default_operator: str = "OR",
    minimum_should_match: int | None = None,
    fields: dict[str, float] | None = None,
):
    """INDEPENDENT compile of parsed Lucene trees → (atoms, match_sql,
    score_sql, nbits) over per-atom score columns s0..s{n-1}. Second
    implementation of the Lucene BooleanQuery semantics (coord-free:
    AND gates the sum, OR sums self-gated children, NOT matches-not and
    scores 0, boost multiplies, unqualified atoms fan across ``fields``
    as best_fields dis_max, top-level-OR minimum_should_match counts
    matching children). Shares only the analyzer with the engine — the
    index itself is built with that analyzer, so sharing it is the
    contract, not self-verification."""
    if isinstance(fields, dict):
        tgt_default = [(str(f), float(b)) for f, b in sorted(fields.items())]
    elif fields is not None:
        tgt_default = [(str(f), 1.0) for f in sorted(fields)]
    else:
        tgt_default = [(None, 1.0)]
    atoms_rows: list[tuple] = []
    m_cases: list[str] = []
    s_cases: list[str] = []
    nbits = 0
    for qid, q in queries:
        tree = _oracle_lucene_parse(q, default_operator)
        bitmap: dict[tuple, int] = {}

        def bit_of(kind, fld, key, rawtext):
            bk = (kind, fld, key)
            if bk not in bitmap:
                bitmap[bk] = len(bitmap)
                atoms_rows.append((qid, bitmap[bk], kind, fld, rawtext))
            return bitmap[bk]

        def across_fields(fld, kind, key, rawtext):
            targets = [(fld, 1.0)] if fld is not None else tgt_default
            parts = []
            for f, bst in targets:
                b = bit_of(kind, f, key, rawtext)
                sc = f"COALESCE(s{b}, 0.0)"
                if bst != 1.0:
                    sc = f"{bst!r} * {sc}"
                parts.append((f"s{b} IS NOT NULL", sc))
            if len(parts) == 1:
                return parts[0]
            return (
                "(" + " OR ".join(pm for pm, _ in parts) + ")",
                "GREATEST(" + ", ".join(ps for _, ps in parts) + ")",
            )

        def gate_and(subs):
            m = "(" + " AND ".join(cm for cm, _ in subs) + ")"
            s = (
                f"(CASE WHEN {m} THEN "
                + " + ".join(cs for _, cs in subs)
                + " ELSE 0.0 END)"
            )
            return m, s

        def emit(node):
            kind = node[0]
            if kind == "leaf":
                _, fld, w = node
                wtoks = list(analysis.tokenize_series(pd.Series([w]))[0])
                if not wtoks:
                    raise ValueError(f"oracle lucene: {w!r} → no tokens")
                pairs = []
                for t, qtf in sorted(Counter(wtoks).items()):
                    m_t, s_t = across_fields(fld, "term", t, t)
                    pairs.append(
                        (m_t, s_t if qtf == 1 else f"({qtf} * {s_t})")
                    )
                if len(pairs) == 1:
                    return f"({pairs[0][0]})", f"({pairs[0][1]})"
                if default_operator == "AND":
                    return gate_and(pairs)
                return (
                    "(" + " OR ".join(pm for pm, _ in pairs) + ")",
                    "(" + " + ".join(ps for _, ps in pairs) + ")",
                )
            if kind == "phrase":
                _, fld, text = node
                ptoks = tuple(analysis.tokenize_series(pd.Series([text]))[0])
                if not ptoks:
                    raise ValueError("oracle lucene: empty phrase")
                m, s = across_fields(fld, "phrase", ptoks, text)
                return f"({m})", f"({s})"
            if kind == "not":
                cm, _ = emit(node[1])
                return f"(NOT {cm})", "0.0"
            if kind == "boost":
                cm, cs = emit(node[2])
                return cm, f"({node[1]!r} * {cs})"
            subs = [emit(c) for c in node[1]]
            if kind == "and":
                return gate_and(subs)
            return (
                "(" + " OR ".join(cm for cm, _ in subs) + ")",
                "(" + " + ".join(cs for _, cs in subs) + ")",
            )

        base, factors = tree, []
        while base[0] == "boost":
            factors.append(base[1])
            base = base[2]
        if minimum_should_match is not None and base[0] == "or":
            subs = [emit(c) for c in base[1]]
            cnt = "(" + " + ".join(
                f"CASE WHEN {cm} THEN 1 ELSE 0 END" for cm, _ in subs
            ) + ")"
            m = f"({cnt} >= {int(minimum_should_match)})"
            s = "(" + " + ".join(cs for _, cs in subs) + ")"
            for f_ in reversed(factors):
                s = f"({f_!r} * {s})"
        else:
            m, s = emit(tree)
        m_cases.append(f"WHEN qid = {int(qid)} THEN {m}")
        s_cases.append(f"WHEN qid = {int(qid)} THEN {s}")
        nbits = max(nbits, len(bitmap))
    atoms = pd.DataFrame(
        atoms_rows, columns=["qid", "bit", "kind", "field", "text"]
    )
    match_sql = "CASE " + " ".join(m_cases) + " ELSE FALSE END"
    score_sql = "CASE " + " ".join(s_cases) + " ELSE 0.0 END"
    return atoms, match_sql, score_sql, nbits


def _lucene_qs_sql(
    queries: list[tuple[int, str]],
    k: int,
    default_operator: str = "OR",
    minimum_should_match: int | None = None,
    fields: dict[str, float] | None = None,
) -> str:
    """Oracle for q_fts_lucene_qs: per-field BM25 atom scores (term atoms
    from per-field postings; phrase atoms AND-scored and gated on
    consecutive containment in THAT field's token stream) pivoted to
    s0..s{n-1} per (qid, doc), then an INDEPENDENTLY-parsed and
    INDEPENDENTLY-compiled match predicate + score expression evaluated
    on them (``_oracle_lucene_parse`` / ``_oracle_lucene_plan`` above —
    the engine's plans/search.lucene_query_plan is NOT consulted, per
    ADVICE r4)."""
    atoms, match_sql, score_sql, nbits = _oracle_lucene_plan(
        queries, default_operator, minimum_should_match, fields
    )
    vals, ph_term_vals, ph_pat_vals = [], [], []
    for r in atoms.itertuples(index=False):
        fld = "text" if r.field is None else str(r.field)
        if r.kind == "term":
            vals.append(
                f"({int(r.qid)}, {int(r.bit)}, '{fld}', '{r.text}')"
            )
        else:
            ptoks = list(analysis.tokenize_series(pd.Series([r.text]))[0])
            terms = sorted(Counter(ptoks).items())
            ph_pat_vals.append(
                f"({int(r.qid)}, {int(r.bit)}, '{fld}', "
                f"' {' '.join(ptoks)} ', {len(terms)})"
            )
            for t, c in terms:
                ph_term_vals.append(
                    f"({int(r.qid)}, {int(r.bit)}, '{fld}', '{t}', {c})"
                )
    bm_t = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avg_t))"
    )
    bm_s = bm_t.replace("s.avg_t", "s.avg_s")
    pivots = ",\n         ".join(
        f"sum(CASE WHEN bit = {i} THEN sc END) AS s{i}"
        for i in range(nbits)
    )
    term_branch = f"""
  SELECT q.aqid AS qid, q.bit AS bit, p.doc_id AS doc_id, {bm_t} AS sc
  FROM q
  JOIN post_t p ON p.term = q.term AND q.fld = 'text'
  JOIN df_t d ON d.term = q.term
  JOIN dl_t dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  UNION ALL
  SELECT q.aqid AS qid, q.bit AS bit, p.doc_id AS doc_id, {bm_s} AS sc
  FROM q
  JOIN post_s p ON p.term = q.term AND q.fld = 'source'
  JOIN df_s d ON d.term = q.term
  JOIN dl_s dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s""" if vals else ""
    phrase_ctes = phrase_branch = ""
    if ph_pat_vals:
        phrase_ctes = f"""
cs_t AS (SELECT doc_id, ' ' || array_to_string(tt, ' ') || ' ' AS s
         FROM corpus),
cs_s AS (SELECT doc_id, ' ' || array_to_string(ts, ' ') || ' ' AS s
         FROM corpus),
pq(aqid, bit, fld, term, qtf) AS (VALUES {", ".join(ph_term_vals)}),
pp(aqid, bit, fld, pat, needt) AS (VALUES {", ".join(ph_pat_vals)}),
php AS (
  SELECT pq.aqid AS aqid, pq.bit AS bit, pq.fld AS fld,
         p.doc_id AS doc_id, sum(pq.qtf * {bm_t}) AS sc, count(*) AS nt
  FROM pq
  JOIN post_t p ON p.term = pq.term AND pq.fld = 'text'
  JOIN df_t d ON d.term = pq.term
  JOIN dl_t dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY pq.aqid, pq.bit, pq.fld, p.doc_id
  UNION ALL
  SELECT pq.aqid AS aqid, pq.bit AS bit, pq.fld AS fld,
         p.doc_id AS doc_id, sum(pq.qtf * {bm_s}) AS sc, count(*) AS nt
  FROM pq
  JOIN post_s p ON p.term = pq.term AND pq.fld = 'source'
  JOIN df_s d ON d.term = pq.term
  JOIN dl_s dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY pq.aqid, pq.bit, pq.fld, p.doc_id
),"""
        phrase_branch = """
  SELECT php.aqid AS qid, php.bit AS bit, php.doc_id AS doc_id,
         php.sc AS sc
  FROM php
  JOIN pp ON pp.aqid = php.aqid AND pp.bit = php.bit
         AND pp.fld = php.fld AND php.nt = pp.needt
  JOIN cs_t ON php.fld = 'text' AND cs_t.doc_id = php.doc_id
           AND contains(cs_t.s, pp.pat)
  UNION ALL
  SELECT php.aqid AS qid, php.bit AS bit, php.doc_id AS doc_id,
         php.sc AS sc
  FROM php
  JOIN pp ON pp.aqid = php.aqid AND pp.bit = php.bit
         AND pp.fld = php.fld AND php.nt = pp.needt
  JOIN cs_s ON php.fld = 'source' AND cs_s.doc_id = php.doc_id
           AND contains(cs_s.s, pp.pat)"""
    q_cte = (
        f"q(aqid, bit, fld, term) AS (VALUES {', '.join(vals)}),"
        if vals else ""
    )
    branches = term_branch + (
        ("\n  UNION ALL" if term_branch else "") + phrase_branch
        if phrase_branch else ""
    )
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt,
         {SRC_TOKS} AS ts
  FROM documents
),
dl_t AS (SELECT doc_id, len(tt) AS dl FROM corpus),
dl_s AS (SELECT doc_id, len(ts) AS dl FROM corpus),
stats AS (SELECT count(*) AS n,
                 (SELECT avg(dl) FROM dl_t) AS avg_t,
                 (SELECT avg(dl) FROM dl_s) AS avg_s
          FROM corpus),
post_t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM corpus)
  GROUP BY doc_id, term
),
post_s AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM corpus)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df FROM post_t GROUP BY term),
df_s AS (SELECT term, count(*) AS df FROM post_s GROUP BY term),
{q_cte}{phrase_ctes}
sc AS ({branches}
),
pv AS (
  SELECT qid, doc_id,
         {pivots}
  FROM sc GROUP BY qid, doc_id
),
gated AS (
  SELECT qid, doc_id, {score_sql} AS score
  FROM pv
  WHERE {match_sql}
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM gated
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------- 4f. term-level + scoring wrappers (terms / exists /
# function_score). ES term/terms = exact unanalyzed dictionary match;
# exists = field-presence from marker metadata; function_score =
# field_value_factor rescore (plans/search.search_terms / search_exists /
# search_function_score).

TERMS_QUERIES = [
    (0, "spark"), (0, "merge"),     # multi-value terms query
    (1, "sparkMerge"),              # unanalyzed: not a dictionary term
    (2, "customer"),
]
FS_QUERIES = [(0, "spark merge window"), (1, "customer"), (2, "absentzzz")]
FS_WEIGHT, FS_MODIFIER, FS_BOOST_MODE = 0.5, "log1p", "multiply"


def q_fts_terms(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    tpdf = pd.DataFrame(TERMS_QUERIES, columns=["qid", "term"])
    res = search.search_terms(spark, store, tpdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_function_score(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FS_QUERIES, columns=["qid", "query"])
    res = search.search_function_score(
        spark, store, qpdf, k=50, factor_col="dl",
        modifier=FS_MODIFIER, factor_weight=FS_WEIGHT,
        boost_mode=FS_BOOST_MODE,
    )
    return _rerank_rounded(res, FT_K)


def q_fts_exists(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    return search.search_exists(spark, store, "source", qid=0, k=FT_K).select(
        "qid", "rank", "doc_id",
        F.round("score", 6).alias("score_r"),
    )


def _terms_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_terms: the term strings are matched VERBATIM
    (lowercased, no analysis) against the dictionary, qtf=1 OR BM25."""
    vals = ", ".join(f"({qid}, '{t.lower()}')" for qid, t in queries)
    return f"""{_BM25_BODY},
q AS (
  SELECT DISTINCT v.qid AS qid, v.term AS term, 1 AS qtf
  FROM (VALUES {vals}) v(qid, term)
  JOIN dfreq d ON d.term = v.term
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


SS_SCRIPT = "_score / (1.0 + sqrt(dl)) + log1p(dl)"


def q_fts_script_score(spark, sf_dir):
    """ES script_score (VERDICT r3 gap): a custom whitelisted scoring
    expression over _score and doc fields — no per-row Python, the
    expression compiles into codegen."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FS_QUERIES, columns=["qid", "query"])
    res = search.search_script_score(
        spark, store, qpdf, SS_SCRIPT, k=50, doc_cols=("dl",)
    )
    return _rerank_rounded(res, FT_K)


def _script_score_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_script_score: OR BM25 then the SAME expression
    (s / (1 + sqrt(dl)) + ln(1 + dl), clamped at 0) replicated in SQL."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
matched AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS s,
         max(dl.dl) AS dl
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
scored AS (
  SELECT qid, doc_id,
         greatest(s / (1.0 + sqrt(dl)) + ln(1.0 + dl), 0.0) AS score
  FROM matched
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _function_score_sql(
    queries: list[tuple[int, str]], k: int,
    weight: float, modifier: str, boost_mode: str,
) -> str:
    """Oracle for q_fts_function_score: OR BM25 rescored by
    modifier(weight × dl) per doc."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    fexpr = {
        "none": f"({weight} * dl.dl)",
        "log1p": f"ln(1.0 + {weight} * dl.dl)",
        "sqrt": f"sqrt({weight} * dl.dl)",
    }[modifier]
    comb = "*" if boost_mode == "multiply" else "+"
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) {comb} max({fexpr}) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _exists_sql(k: int) -> str:
    """Oracle for q_fts_exists: docs whose source field analyzes to >= 1
    token, constant score 1.0, ranked by doc_id."""
    return f"""
WITH hits AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id
  FROM documents
  WHERE len({SRC_TOKS}) > 0
),
ranked AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id, 1.0 AS score_r,
         CAST(row_number() OVER (ORDER BY doc_id ASC) AS INTEGER) AS rank
  FROM hits
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ----------------------------------------------- 4e. multi_match (fields)
# ES multi-field documents: ONE store indexes text AND source under
# field-qualified terms with per-field stats (plans/build fields=...);
# multi_match combines per-field BM25 best_fields + tie_breaker
# (plans/search.multi_match).

SRC_TOKS = analysis.duckdb_tokens_sql("source")
MM_QUERIES = [
    (0, "spark merge src7"),
    (1, "customer src3"),
    (2, "window data"),
    (3, "absentzzz"),
]
MM_BOOSTS = {"text": 1.0, "source": 2.5}
MM_TIE = 0.2

def _corpus_store_mf(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """Multi-field engine index over documents (fields text + source)."""
    (path,), fresh = _cached_store_paths(sf_dir, "mf2")
    if fresh:
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            "lang", "text", "source",
        )
        cfg = IndexerConfig(index="docs", id_field="docid")
        build.build_index(
            corpus, cfg, path,
            num_buckets=32, resume=True, fields=("text", "source"),
            positions=True,
        )
    return search.load_store(path)


def _corpus_store_sayt(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """search_as_you_type engine index over documents text: shingle
    subfields (2,3) + edge-prefix subfield materialized at build time
    (build_index(edge_ngrams=...))."""
    (path,), fresh = _cached_store_paths(sf_dir, "sayt1")
    if fresh:
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
        cfg = IndexerConfig(index="docs", id_field="docid")
        build.build_index(
            corpus, cfg, path,
            num_buckets=32, resume=True, edge_ngrams=(2, 3),
        )
    return search.load_store(path)


# type-ahead queries: the last token is a typed PREFIX
SAYT_QUERIES = [
    (0, "stream dat"),
    (1, "merge win"),
    (2, "par"),
    (3, "sort query col"),
    (4, "value spar"),
]
SAYT_PFX_MAX = 10


def q_fts_search_as_you_type(spark, sf_dir):
    """ES search_as_you_type: bool_prefix over root + shingle subfields,
    last term = one exact hit on the index-time edge-prefix subfield."""
    store = _corpus_store_sayt(spark, sf_dir)
    qpdf = pd.DataFrame(SAYT_QUERIES, columns=["qid", "query"])
    return _rerank_rounded(
        search.search_as_you_type(spark, store, qpdf, k=50), FT_K
    )


def _sayt_sql(queries, k) -> str:
    """Oracle: recompute the four subfield token streams from the raw
    text in DuckDB (shingles via list_transform over 1-based ranges,
    prefixes via nested list_transform + flatten), per-field
    posting/df/dl/avgdl stats, then BM25-sum the same clause set."""
    clause_rows = []
    for qid, q in queries:
        toks = list(analysis.tokenize_series(pd.Series([q]))[0])
        if not toks:
            continue
        for t, c in sorted(Counter(toks[:-1]).items()):
            clause_rows.append((qid, "f0", t, c))
        last = toks[-1]
        assert len(last) <= SAYT_PFX_MAX
        clause_rows.append((qid, "fp", last, 1))
        for g in (2, 3):
            shs = ["_".join(toks[i:i + g])
                   for i in range(len(toks) - g + 1)]
            for t, c in sorted(Counter(shs).items()):
                clause_rows.append((qid, f"f{g}", t, c))
    vals = ", ".join(
        f"({qid}, '{fld}', '{t}', {c})" for qid, fld, t, c in clause_rows
    )
    bm = (
        f"ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)"
        f" * q.qtf * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl"
        f" / s.avg_dl))"
    )
    branches = []
    for f in ("f0", "f2", "f3", "fp"):
        branches.append(f"""
  SELECT q.qid AS qid, p.doc_id AS doc_id, {bm} AS sc
  FROM q
  JOIN post_{f} p ON p.term = q.term AND q.fld = '{f}'
  JOIN df_{f} d ON d.term = q.term
  JOIN dl_{f} dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats_{f} s""")
    field_ctes = []
    toks_of = {
        "f0": "tt",
        "f2": ("list_transform(range(1, greatest(len(tt), 1)), "
               "i -> tt[i] || '_' || tt[i+1])"),
        "f3": ("list_transform(range(1, greatest(len(tt) - 1, 1)), "
               "i -> tt[i] || '_' || tt[i+1] || '_' || tt[i+2])"),
        "fp": (f"flatten(list_transform(tt, t -> list_transform("
               f"range(1, least(length(t), {SAYT_PFX_MAX}) + 1), "
               f"p -> substring(t, 1, p))))"),
    }
    for f, expr in toks_of.items():
        field_ctes.append(f"""
c_{f} AS (SELECT doc_id, {expr} AS toks FROM corpus),
post_{f} AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM c_{f})
  GROUP BY doc_id, term
),
df_{f} AS (SELECT term, count(*) AS df FROM post_{f} GROUP BY term),
dl_{f} AS (SELECT doc_id, len(toks) AS dl FROM c_{f}),
stats_{f} AS (SELECT (SELECT count(*) FROM corpus) AS n,
                     (SELECT avg(dl) FROM dl_{f}) AS avg_dl)""")
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt
  FROM documents
),{",".join(field_ctes)},
q(qid, fld, term, qtf) AS (VALUES {vals}),
sc AS ({" UNION ALL".join(branches)}
),
agg AS (
  SELECT qid, doc_id, sum(sc) AS score FROM sc GROUP BY qid, doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM agg
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


NESTED_QUERIES = [(0, "src1"), (1, "src7 src3"), (2, "absentzzz")]


def _corpus_store_nested(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """Engine index with a NESTED field: documents carry a struct column
    ``meta`` and the index is built on the dotted path ``meta.author``
    (the reference ships arbitrarily nested documents,
    test/handler-tests.js:248, dot paths :1055-1096 — ES exposes them as
    per-field queries)."""
    (path,), fresh = _cached_store_paths(sf_dir, "nested1")
    if fresh:
        corpus = _docs(spark, sf_dir).select(
            F.col("doc_id").cast("string").alias("docid"),
            "text",
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("author"),
            ).alias("meta"),
        )
        cfg = IndexerConfig(index="docs", id_field="docid")
        build.build_index(
            corpus, cfg, path,
            num_buckets=32, resume=True, fields=("text", "meta.author"),
        )
    return search.load_store(path)


def q_fts_nested_field(spark, sf_dir):
    """BM25 targeted at the nested path: field-local df/avgdl over the
    struct field's token stream; the oracle scores the flat source column
    the path maps to."""
    store = _corpus_store_nested(spark, sf_dir)
    qpdf = pd.DataFrame(NESTED_QUERIES, columns=["qid", "query"])
    res = search.search(spark, store, qpdf, k=50, field="meta.author")
    return _rerank_rounded(res, FT_K)


# ES `nested` type: per-element child documents (same-element semantics).
# The documents table has no array column, so the nested corpus derives
# deterministically: comments = [(author=lang, body=text[1:40]),
#                                (author=source, body=text[41:80])].
NESTED_Q_QUERIES = [(0, "en", "data"), (1, "src3", "merge"),
                    (2, "absentzzz", "data")]
NESTED_BODY_LEN = 40


def _nested_child_store(spark: SparkSession, sf_dir: str):
    (path,), fresh = _cached_store_paths(sf_dir, "nestq3")
    if fresh:
        d = _docs(spark, sf_dir)
        corpus = d.select(
            F.col("doc_id").cast("string").alias("docid"),
            F.array(
                F.struct(
                    F.col("lang").alias("author"),
                    F.substring("text", 1, NESTED_BODY_LEN).alias("body"),
                ),
                F.struct(
                    F.col("source").alias("author"),
                    F.substring(
                        "text", NESTED_BODY_LEN + 1, NESTED_BODY_LEN
                    ).alias("body"),
                ),
            ).alias("comments"),
        )
        child = build.explode_nested(corpus, "docid", "comments")
        # author is also an indexed field — meta rides a duplicate column
        child = child.withColumn("author_tag", F.col("author"))
        cfg = IndexerConfig(
            index="nested", id_field="doc_id", parent_field="parent"
        )
        build.build_index(
            child, cfg, path,
            num_buckets=32, resume=True, fields=("author", "body"),
            doc_meta_cols=("author_tag",),
        )
    return search.load_store(path)


def q_fts_nested_query(spark, sf_dir):
    """ES nested query (same-element must+filter over different
    subfields): child store scores, parents ranked by the max element
    score — a flattened index would cross-match elements."""
    pstore = _corpus_store(spark, sf_dir)
    cstore = _nested_child_store(spark, sf_dir)
    q = pd.DataFrame(
        [
            (qid, m, "", "", f, "author", "body")
            for qid, m, f in NESTED_Q_QUERIES
        ],
        columns=["qid", "must", "should", "must_not", "filter",
                 "must_field", "filter_field"],
    )
    res = search.search_nested(
        spark, pstore, cstore, q, k=50, score_mode="max"
    )
    return _rerank_rounded(res.select("qid", "doc_id", "score"), FT_K)


def _nested_query_sql(queries, k: int) -> str:
    """Oracle for q_fts_nested_query: the same two-element explode in
    SQL, per-element BM25 on the author field (child-corpus stats,
    field-local avgdl), filter containment on the body field of the SAME
    element, max over elements per parent."""
    L = NESTED_BODY_LEN
    a_toks = analysis.duckdb_tokens_sql("author")
    b_toks = analysis.duckdb_tokens_sql("body")
    vals = ", ".join(f"({qid}, '{m}', '{f}')" for qid, m, f in queries)
    return f"""
WITH elems AS (
  SELECT CAST(doc_id AS VARCHAR) AS parent, 0 AS idx,
         lang AS author, substr(text, 1, {L}) AS body
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 1, source, substr(text, {L + 1}, {L})
  FROM documents
),
ca AS (
  SELECT parent, idx, {a_toks} AS ta, {b_toks} AS tb FROM elems
),
stats AS (
  SELECT count(*) AS n, avg(len(ta)) AS avg_a FROM ca
),
post_a AS (
  SELECT parent, idx, term, count(*) AS tf, max(dl) AS dl
  FROM (SELECT parent, idx, unnest(ta) AS term, len(ta) AS dl FROM ca)
  GROUP BY parent, idx, term
),
df_a AS (SELECT term, count(*) AS df FROM post_a GROUP BY term),
q(qid, mterm, fterm) AS (VALUES {vals}),
elem_scored AS (
  SELECT q.qid AS qid, p.parent AS parent, p.idx AS idx,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
           * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * p.dl / s.avg_a))
           AS score
  FROM q
  JOIN post_a p ON p.term = q.mterm
  JOIN df_a d ON d.term = q.mterm
  CROSS JOIN stats s
  JOIN ca ON ca.parent = p.parent AND ca.idx = p.idx
         AND list_contains(ca.tb, q.fterm)
),
per_parent AS (
  SELECT qid, parent AS doc_id, max(score) AS score
  FROM elem_scored GROUP BY qid, parent
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM per_parent
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def q_fts_nested_agg(spark, sf_dir):
    """ES nested agg + reverse_nested: bucket matching parents' nested
    elements by author; n_children in nested space, n_parents is the
    reverse_nested parent count."""
    pstore = _corpus_store(spark, sf_dir)
    cstore = _nested_child_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_nested_terms_agg(
        spark, pstore, cstore, qpdf, group_col="author_tag"
    )


def _nested_agg_sql(queries) -> str:
    L = NESTED_BODY_LEN
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
elems AS (
  SELECT CAST(doc_id AS VARCHAR) AS parent, lang AS author
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), source FROM documents
)
SELECT CAST(m.qid AS BIGINT) AS qid, e.author AS "group",
       CAST(count(*) AS BIGINT) AS n_children,
       CAST(count(DISTINCT e.parent) AS BIGINT) AS n_parents
FROM m JOIN elems e ON e.parent = m.doc_id
GROUP BY m.qid, e.author
"""


SFM_QUERIES = [
    (0, "merge", "src1"),
    (1, "spark", "src2"),
    (2, "customer", "src3"),
    (3, "absentzzz", "src1"),
]
SFM_SLOP = 6


def q_fts_span_field_masking(spark, sf_dir):
    """Lucene span_field_masking: a text-field token near a source-field
    token as if both shared one position space (the source token sits at
    the field's first position, so the window pins the text token near
    the doc start AND the source value)."""
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(
        [(qid, ta, "text", tb, "source") for qid, ta, tb in SFM_QUERIES],
        columns=["qid", "term_a", "field_a", "term_b", "field_b"],
    )
    res = search.search_span_field_masking(
        spark, store, qpdf, slop=SFM_SLOP, k=50
    )
    return _rerank_rounded(res.select("qid", "doc_id", "score"), FT_K)


def _span_field_masking_sql(queries, slop: int, k: int) -> str:
    win = 1 + slop
    legs, qv = [], []
    for qid, ta, tb in queries:
        (ta_tok,) = analysis.tokenize_series(pd.Series([ta]))[0] or ("",)
        (tb_tok,) = analysis.tokenize_series(pd.Series([tb]))[0] or ("",)
        qv.append(f"({qid}, '{ta_tok}', '{tb_tok}')")
        legs.append(f"""
  SELECT DISTINCT {qid} AS qid, c.doc_id AS doc_id
  FROM corpus c,
       unnest(list_filter(range(1, len(c.tt) + 1),
              i -> c.tt[i] = '{ta_tok}')) AS a(pa),
       unnest(list_filter(range(1, len(c.ts) + 1),
              j -> c.ts[j] = '{tb_tok}')) AS b(pb)
  WHERE abs(pa - pb) <= {win}""")
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt,
         {SRC_TOKS} AS ts
  FROM documents
),
dl_t AS (SELECT doc_id, len(tt) AS dl FROM corpus),
dl_s AS (SELECT doc_id, len(ts) AS dl FROM corpus),
stats AS (SELECT count(*) AS n,
                 (SELECT avg(dl) FROM dl_t) AS avg_t,
                 (SELECT avg(dl) FROM dl_s) AS avg_s
          FROM corpus),
post_t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM corpus)
  GROUP BY doc_id, term
),
post_s AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM corpus)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df FROM post_t GROUP BY term),
df_s AS (SELECT term, count(*) AS df FROM post_s GROUP BY term),
q(qid, ta, tb) AS (VALUES {", ".join(qv)}),
m AS ({" UNION ALL ".join(legs)}),
scored AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id,
         ln(1.0 + (s.n - dta.df + 0.5) / (dta.df + 0.5)) * ({K1} + 1.0)
           * pt.tf / (pt.tf + {K1} * (1.0 - {B} + {B} * dlt.dl / s.avg_t))
         + ln(1.0 + (s.n - dts.df + 0.5) / (dts.df + 0.5)) * ({K1} + 1.0)
           * ps.tf / (ps.tf + {K1} * (1.0 - {B} + {B} * dls.dl / s.avg_s))
           AS score
  FROM m
  JOIN q ON q.qid = m.qid
  JOIN post_t pt ON pt.doc_id = m.doc_id AND pt.term = q.ta
  JOIN post_s ps ON ps.doc_id = m.doc_id AND ps.term = q.tb
  JOIN df_t dta ON dta.term = q.ta
  JOIN df_s dts ON dts.term = q.tb
  JOIN dl_t dlt ON dlt.doc_id = m.doc_id
  JOIN dl_s dls ON dls.doc_id = m.doc_id
  CROSS JOIN stats s
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def q_fts_multi_match(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(MM_QUERIES, columns=["qid", "query"])
    res = search.multi_match(
        spark, store, qpdf, fields=MM_BOOSTS, k=50,
        match_type="best_fields", tie_breaker=MM_TIE,
    )
    return _rerank_rounded(res, FT_K)


SYNONYMS = {"fast": ["quick", "slow"], "merge": ["join"]}
SYN_QUERIES = [(0, "fast data"), (1, "merge window"), (2, "absentzzz")]


def q_fts_synonyms(spark, sf_dir):
    """ES query-time synonym expansion: each token's group scores as ONE
    pseudo-term (tf summed over members, df = max member df — Lucene
    SynonymQuery); 'quick' is unindexed and drops from its group."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SYN_QUERIES, columns=["qid", "query"])
    res = search.search_synonyms(spark, store, qpdf, SYNONYMS, k=50)
    return _rerank_rounded(res, FT_K)


def _synonyms_sql(
    queries: list[tuple[int, str]], synonyms: dict, k: int
) -> str:
    """Oracle for q_fts_synonyms: groups as VALUES tables, per-group
    blended tf + max df, per-group BM25, OR-sum per doc."""
    gv, mv = [], []
    gid = 0
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            members = [t]
            for s in synonyms.get(t, []):
                if s not in members:
                    members.append(s)
            gv.append(f"({gid}, {qid}, {qtf})")
            for m in members:
                mv.append(f"({gid}, '{m}')")
            gid += 1
    return f"""{_BM25_BODY},
gv(gid, qid, qtf) AS (VALUES {", ".join(gv)}),
mv(mgid, term) AS (VALUES {", ".join(mv)}),
gdf AS (
  SELECT mv.mgid AS gid, max(d.df) AS df
  FROM mv JOIN dfreq d ON d.term = mv.term GROUP BY mv.mgid
),
gtf AS (
  SELECT mv.mgid AS gid, p.doc_id AS doc_id, sum(p.tf) AS tf
  FROM mv JOIN posting p ON p.term = mv.term GROUP BY mv.mgid, p.doc_id
),
scored AS (
  SELECT gv.qid AS qid, gtf.doc_id AS doc_id,
         sum(gv.qtf * ln(1.0 + (s.n - gdf.df + 0.5) / (gdf.df + 0.5))
             * ({K1} + 1.0)
             * gtf.tf
             / (gtf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM gv
  JOIN gdf ON gdf.gid = gv.gid
  JOIN gtf ON gtf.gid = gv.gid
  JOIN dl ON dl.doc_id = gtf.doc_id
  CROSS JOIN stats s
  GROUP BY gv.qid, gtf.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


CF_WEIGHTS = {"text": 1.0, "source": 2.0}


def q_fts_combined_fields(spark, sf_dir):
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(MM_QUERIES, columns=["qid", "query"])
    res = search.search_combined_fields(
        spark, store, qpdf, fields=CF_WEIGHTS, k=50
    )
    return _rerank_rounded(res, FT_K)


def _combined_fields_sql(
    queries: list[tuple[int, str]], k: int, weights: dict
) -> str:
    """Oracle for q_fts_combined_fields: BM25F pseudo-field — weighted tf
    and dl sums across fields, df = docs holding the term in ANY field,
    one combined BM25 per term."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    wt, ws = weights["text"], weights["source"]
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt,
         {SRC_TOKS} AS ts
  FROM documents
),
dlc AS (
  SELECT doc_id, {wt} * len(tt) + {ws} * len(ts) AS dl_comb FROM corpus
),
stats AS (
  SELECT count(*) AS n,
         {wt} * (SELECT avg(len(tt)) FROM corpus)
           + {ws} * (SELECT avg(len(ts)) FROM corpus) AS avg_comb
  FROM corpus
),
post_t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM corpus)
  GROUP BY doc_id, term
),
post_s AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM corpus)
  GROUP BY doc_id, term
),
comb AS (
  SELECT COALESCE(t.doc_id, s.doc_id) AS doc_id,
         COALESCE(t.term, s.term) AS term,
         {wt} * COALESCE(t.tf, 0) + {ws} * COALESCE(s.tf, 0) AS tf_comb
  FROM post_t t
  FULL OUTER JOIN post_s s ON s.doc_id = t.doc_id AND s.term = t.term
),
dfc AS (SELECT term, count(*) AS df FROM comb GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, c.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (st.n - d.df + 0.5) / (d.df + 0.5))
             * ({K1} + 1.0) * c.tf_comb
             / (c.tf_comb + {K1} * (1.0 - {B}
                + {B} * dlc.dl_comb / st.avg_comb))
         ) AS score
  FROM q
  JOIN comb c ON c.term = q.term
  JOIN dfc d ON d.term = q.term
  JOIN dlc ON dlc.doc_id = c.doc_id
  CROSS JOIN stats st
  GROUP BY q.qid, c.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _multi_match_sql(
    queries: list[tuple[int, str]], k: int, boosts: dict, tie: float
) -> str:
    """Oracle for q_fts_multi_match: independent per-field BM25 (each field
    has its own postings, df and avgdl; n is the shared doc count), boosted,
    combined best_fields: max + tie_breaker * (sum - max)."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    bt, bs = boosts["text"], boosts["source"]
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt,
         {SRC_TOKS} AS ts
  FROM documents
),
dl_t AS (SELECT doc_id, len(tt) AS dl FROM corpus),
dl_s AS (SELECT doc_id, len(ts) AS dl FROM corpus),
stats AS (SELECT count(*) AS n,
                 (SELECT avg(dl) FROM dl_t) AS avg_t,
                 (SELECT avg(dl) FROM dl_s) AS avg_s
          FROM corpus),
post_t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM corpus)
  GROUP BY doc_id, term
),
post_s AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM corpus)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df FROM post_t GROUP BY term),
df_s AS (SELECT term, count(*) AS df FROM post_s GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
sc_t AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avg_t))
         ) * {bt} AS sc
  FROM q
  JOIN post_t p ON p.term = q.term
  JOIN df_t d ON d.term = q.term
  JOIN dl_t dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
sc_s AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avg_s))
         ) * {bs} AS sc
  FROM q
  JOIN post_s p ON p.term = q.term
  JOIN df_s d ON d.term = q.term
  JOIN dl_s dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
comb AS (
  SELECT COALESCE(t.qid, s2.qid) AS qid,
         COALESCE(t.doc_id, s2.doc_id) AS doc_id,
         greatest(COALESCE(t.sc, s2.sc), COALESCE(s2.sc, t.sc))
           + {tie} * (COALESCE(t.sc, 0) + COALESCE(s2.sc, 0)
                      - greatest(COALESCE(t.sc, s2.sc), COALESCE(s2.sc, t.sc))
                     ) AS score
  FROM sc_t t
  FULL OUTER JOIN sc_s s2 ON t.qid = s2.qid AND t.doc_id = s2.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM comb
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ---------- 4c2. script query / matched_queries / multi_match phrase

SCRIPT_QUERY_PRED = "dl % 2 = 0 and n_chars > 100"


def q_fts_script_query(spark, sf_dir):
    """ES script query (filter context): whitelisted boolean predicate
    over doc fields gates the match set; constant score."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_script_query(
        spark, store, qpdf, predicate=SCRIPT_QUERY_PRED, k=FT_K,
        doc_cols=("dl", "n_chars"),
    )
    return res.select(
        "qid", "rank", "doc_id", F.round("score", 6).alias("score_r")
    )


def _script_query_sql(queries, k: int) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
hits AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
  WHERE dl.dl % 2 = 0 AND doc.n_chars > 100
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, 1.0 AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY doc_id ASC
         ) AS INTEGER) AS rank
  FROM hits
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


NAMED_CLAUSES = [
    (0, "qa", "spark merge"),
    (0, "qb", "customer"),
    (1, "qx", "window"),
    (1, "qy", "fast key"),
]


def q_fts_matched_queries(spark, sf_dir):
    """ES named queries: every hit reports WHICH should clauses matched
    (matched_queries), score = summed BM25 over matched clauses."""
    store = _corpus_store(spark, sf_dir)
    cl = pd.DataFrame(NAMED_CLAUSES, columns=["qid", "name", "clause"])
    res = search.search_matched_queries(spark, store, cl, k=50)
    w = Window.partitionBy("qid").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc()
    )
    return (
        res.withColumn("score_r", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= FT_K)
        .select("qid", "rank", "doc_id", "score_r", "matched")
    )


def _matched_queries_sql(clauses, k: int) -> str:
    vals = []
    for qid, name, clause in clauses:
        toks = analysis.tokenize_series(pd.Series([clause]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{name}', '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, name, term, qtf) AS (VALUES {", ".join(vals)}),
per AS (
  SELECT q.qid AS qid, q.name AS name, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, q.name, p.doc_id
),
agg AS (
  SELECT qid, doc_id, sum(score) AS score,
         string_agg(name, ',' ORDER BY name) AS matched
  FROM per GROUP BY qid, doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r, matched,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM agg
)
SELECT qid, rank, doc_id, score_r, matched
FROM ranked WHERE rank <= {k}
"""


MMP_QUERIES = [(0, "merge window"), (1, "src3"), (2, "customer line")]
MMP_TIE = 0.3


def q_fts_multi_match_phrase(spark, sf_dir):
    """ES multi_match type=phrase: the query as a PHRASE per field,
    best_fields combine (max + tie_breaker * rest) with boosts."""
    store = _corpus_store_mf(spark, sf_dir)
    qpdf = pd.DataFrame(MMP_QUERIES, columns=["qid", "query"])
    res = search.multi_match_phrase(
        spark, store, qpdf, fields=MM_BOOSTS, k=50, tie_breaker=MMP_TIE,
    )
    return _rerank_rounded(res, FT_K)


def _mm_phrase_sql(queries, k: int, boosts: dict, tie: float) -> str:
    """Oracle for q_fts_multi_match_phrase: per-field phrase containment
    + AND BM25 with field-local stats, best_fields combine."""
    vals, pats = [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        pats.append(f"({qid}, ' {' '.join(toks)} ')")
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    bt, bs = boosts["text"], boosts["source"]
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS tt,
         {SRC_TOKS} AS ts
  FROM documents
),
cs_t AS (SELECT doc_id, ' ' || array_to_string(tt, ' ') || ' ' AS s
         FROM corpus),
cs_s AS (SELECT doc_id, ' ' || array_to_string(ts, ' ') || ' ' AS s
         FROM corpus),
dl_t AS (SELECT doc_id, len(tt) AS dl FROM corpus),
dl_s AS (SELECT doc_id, len(ts) AS dl FROM corpus),
stats AS (SELECT count(*) AS n,
                 (SELECT avg(dl) FROM dl_t) AS avg_t,
                 (SELECT avg(dl) FROM dl_s) AS avg_s
          FROM corpus),
post_t AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tt) AS term FROM corpus)
  GROUP BY doc_id, term
),
post_s AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM corpus)
  GROUP BY doc_id, term
),
df_t AS (SELECT term, count(*) AS df FROM post_t GROUP BY term),
df_s AS (SELECT term, count(*) AS df FROM post_s GROUP BY term),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
ph(pqid, pat) AS (VALUES {", ".join(pats)}),
sc_t AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avg_t))
         ) * {bt} AS sc
  FROM q
  JOIN post_t p ON p.term = q.term
  JOIN df_t d ON d.term = q.term
  JOIN dl_t dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  JOIN ph ON ph.pqid = q.qid
  JOIN cs_t c ON c.doc_id = p.doc_id AND contains(c.s, ph.pat)
  GROUP BY q.qid, p.doc_id
),
sc_s AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avg_s))
         ) * {bs} AS sc
  FROM q
  JOIN post_s p ON p.term = q.term
  JOIN df_s d ON d.term = q.term
  JOIN dl_s dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  JOIN ph ON ph.pqid = q.qid
  JOIN cs_s c ON c.doc_id = p.doc_id AND contains(c.s, ph.pat)
  GROUP BY q.qid, p.doc_id
),
comb AS (
  SELECT COALESCE(t.qid, s2.qid) AS qid,
         COALESCE(t.doc_id, s2.doc_id) AS doc_id,
         greatest(COALESCE(t.sc, s2.sc), COALESCE(s2.sc, t.sc))
           + {tie} * (COALESCE(t.sc, 0) + COALESCE(s2.sc, 0)
                      - greatest(COALESCE(t.sc, s2.sc), COALESCE(s2.sc, t.sc))
                     ) AS score
  FROM sc_t t
  FULL OUTER JOIN sc_s s2 ON t.qid = s2.qid AND t.doc_id = s2.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM comb
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------- 4d00. span_first
# Lucene/ES span_first: the term within the first N token positions
# (plans/search.search_span_first).

SPAN_FIRST_TERMS = [(0, "spark"), (1, "customer"), (2, "absentzzz")]
SPAN_FIRST_END = 12


def q_fts_span_first(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    tpdf = pd.DataFrame(SPAN_FIRST_TERMS, columns=["qid", "term"])
    res = search.search_span_first(
        spark, store, tpdf, end=SPAN_FIRST_END, k=50
    )
    return _rerank_rounded(res, FT_K)


def _span_first_sql(terms: list[tuple[int, str]], k: int, end: int) -> str:
    """Oracle for q_fts_span_first: term within the first `end` tokens
    (DuckDB 1-based slice toks[1:end] ≡ 0-based positions < end),
    qtf=1 BM25."""
    vals = ", ".join(f"({qid}, '{t.lower()}')" for qid, t in terms)
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, toks FROM corpus),
q(qid, term) AS (VALUES {vals}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
           * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
           AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  JOIN cs ON cs.doc_id = p.doc_id
         AND list_contains(cs.toks[1:{end}], q.term)
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------- 4d0. match_phrase slop
# In-order span-near (ES match_phrase slop): tokens in order within a
# len-1+slop window (plans/search.search_phrase slop=...).

SLOP_QUERIES = [
    (0, "part scan"),      # gap of 1 inside "part filter scan"
    (1, "spark window"),   # gap of 1 inside "spark merge window"
    (2, "scan part"),      # reversed: in-order requirement bites
    (3, "absentzzz scan"),
]
SLOP = 1


def q_fts_phrase_slop(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SLOP_QUERIES, columns=["qid", "query"])
    res = search.search_phrase(spark, store, qpdf, k=50, slop=SLOP)
    return _rerank_rounded(res, FT_K)


def _phrase_slop_sql(
    queries: list[tuple[int, str]], k: int, slop: int
) -> str:
    """Oracle for q_fts_phrase_slop (two-token spans): EXISTS an in-order
    position pair within 1+slop, AND-scored BM25 of both terms."""
    vals, needs, exist_cases = [], [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        assert len(toks) == 2, "slop oracle covers 2-token spans"
        t0, t1 = toks
        terms = sorted(Counter(toks).items())
        needs.append(f"({qid}, {len(terms)})")
        for t, qtf in terms:
            vals.append(f"({qid}, '{t}', {qtf})")
        exist_cases.append(
            f"WHEN m.qid = {qid} THEN EXISTS (\n"
            f"  SELECT 1\n"
            f"  FROM unnest(list_filter(range(1, len(cs.toks) + 1),\n"
            f"              i -> cs.toks[i] = '{t0}')) AS ta(a),\n"
            f"       unnest(list_filter(range(1, len(cs.toks) + 1),\n"
            f"              i -> cs.toks[i] = '{t1}')) AS tb(b)\n"
            f"  WHERE b > a AND b - a <= {1 + slop})"
        )
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, toks FROM corpus),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, need) AS (VALUES {", ".join(needs)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
m AS (
  SELECT scored.qid AS qid, scored.doc_id AS doc_id, scored.score AS score
  FROM scored
  JOIN need ON need.nqid = scored.qid AND scored.nt = need.need
),
ok AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id, m.score AS score
  FROM m JOIN cs ON cs.doc_id = m.doc_id
  WHERE CASE {" ".join(exist_cases)} ELSE FALSE END
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM ok
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------- 4c2. unordered span_near
# Lucene span_near(in_order=false): tokens co-occur within the slop
# window in ANY order — covers the reordered matches ES sloppy phrases
# allow (plans/search.search_span_near, unordered-window kernel).

SPAN_NEAR_QUERIES = [
    (0, "merge spark"),     # reversed text order still matches
    (1, "window customer"),
    (2, "data fast"),
]
SPAN_NEAR_SLOP = 2


def q_fts_span_near(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SPAN_NEAR_QUERIES, columns=["qid", "query"])
    res = search.search_span_near(
        spark, store, qpdf, slop=SPAN_NEAR_SLOP, in_order=False, k=50
    )
    return _rerank_rounded(res, FT_K)


SPAN_OR_CLAUSES = [
    (0, "merge window"),
    (0, "fast key"),
    (1, "customer line"),
]


def q_fts_span_or(spark, sf_dir):
    """Lucene span_or (VERDICT r3 gap): union of exact span clauses,
    score = sum of matching clauses' phrase scores."""
    store = _corpus_store(spark, sf_dir)
    cl = pd.DataFrame(SPAN_OR_CLAUSES, columns=["qid", "clause"])
    res = search.search_span_or(spark, store, cl, k=50)
    return _rerank_rounded(res, FT_K)


def _span_or_sql(clauses: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_span_or: per-clause phrase containment + AND
    BM25, summed over matching clauses per doc."""
    qv, cl = [], []
    for cidx, (qid, c) in enumerate(clauses):
        toks = analysis.tokenize_series(pd.Series([c]))[0]
        terms = sorted(Counter(toks).items())
        cl.append(f"({qid}, {cidx}, ' {' '.join(toks)} ', {len(terms)})")
        for t, qtf in terms:
            qv.append(f"({qid}, {cidx}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
qv(qid, cidx, term, qtf) AS (VALUES {", ".join(qv)}),
cl(clqid, clidx, pat, need) AS (VALUES {", ".join(cl)}),
per_clause AS (
  SELECT qv.qid AS qid, qv.cidx AS cidx, p.doc_id AS doc_id,
         sum(qv.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM qv
  JOIN posting p ON p.term = qv.term
  JOIN dfreq d ON d.term = qv.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY qv.qid, qv.cidx, p.doc_id
),
ok AS (
  SELECT pc.qid, pc.doc_id, pc.score
  FROM per_clause pc
  JOIN cl ON cl.clqid = pc.qid AND cl.clidx = pc.cidx AND pc.nt = cl.need
  JOIN cs ON cs.doc_id = pc.doc_id AND contains(cs.s, cl.pat)
),
scored AS (
  SELECT qid, doc_id, sum(score) AS score FROM ok GROUP BY qid, doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------- 4h2. span_multi (multi-term span) / script_fields

SPAN_MULTI_QUERIES = [(0, "mer* window"), (1, "slo* hash")]


def q_fts_span_multi(spark, sf_dir):
    """Lucene span_multi: a prefix sub-query inside an exact span,
    rewritten to span_or over the capped term-ascending expansions."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SPAN_MULTI_QUERIES, columns=["qid", "query"])
    res = search.search_span_multi(spark, store, qpdf, k=50)
    return _rerank_rounded(res, FT_K)


def _span_multi_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_span_multi: expansions from the dictionary
    (LIKE prefix, term-ascending LIMIT 50 — the engine's cap), each
    instantiated span checked by containment and scored as the
    expansion's BM25 + the fixed terms' BM25, summed over matching
    instantiations per doc."""
    blocks = []
    for qid, q in queries:
        raw = q.split()
        slot = next(i for i, t in enumerate(raw) if t.endswith("*"))
        toks = [t.rstrip("*").lower() for t in raw]
        pre = " ".join(toks[:slot])
        post = " ".join(toks[slot + 1:])
        pre_sql = f"' {pre} ' || e.term" if pre else "' ' || e.term"
        pat_sql = (
            f"{pre_sql} || ' {post} '" if post else f"{pre_sql} || ' '"
        )
        fixed = sorted(
            Counter(t for i, t in enumerate(toks) if i != slot).items()
        )
        fixed_score = " + ".join(
            f"""(SELECT {qtf} * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                 * ({K1} + 1.0) * p.tf
                 / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
               FROM posting p JOIN dfreq d ON d.term = p.term
               WHERE p.term = '{t}' AND p.doc_id = ok.doc_id)"""
            for t, qtf in fixed
        ) or "0.0"
        blocks.append(f"""
SELECT {qid} AS qid, ok.doc_id AS doc_id,
       (SELECT ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * ({K1} + 1.0) * p.tf
               / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
        FROM posting p JOIN dfreq d ON d.term = p.term
        WHERE p.term = ok.eterm AND p.doc_id = ok.doc_id)
       + {fixed_score} AS score
FROM (
  SELECT e.term AS eterm, cs.doc_id AS doc_id
  FROM (SELECT term FROM dfreq WHERE term LIKE '{toks[slot]}%'
        ORDER BY term LIMIT 50) e
  JOIN cs ON contains(cs.s, {pat_sql})
) ok
JOIN dl ON dl.doc_id = ok.doc_id
CROSS JOIN stats s""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
inst AS ({union}),
scored AS (
  SELECT qid, doc_id, sum(score) AS score FROM inst GROUP BY qid, doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


SCRIPT_FIELDS = {
    "dl_boost_r": "_score * log1p(dl)",
    "chars_per_tok_r": "n_chars / dl",
}


def q_fts_script_fields(spark, sf_dir):
    """ES script_fields: whitelisted-expression derived fields on every
    hit (codegen projection; no per-row Python)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    res = search.search_script_fields(
        spark, store, qpdf, scripts=SCRIPT_FIELDS, k=50,
        doc_cols=("dl", "n_chars"),
    )
    return res.filter(F.col("rank") <= FT_K)


def _script_fields_sql(queries: list[tuple[int, str]], k: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
nc AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, n_chars FROM documents),
ranked AS (
  SELECT CAST(scored.qid AS BIGINT) AS qid, scored.doc_id AS doc_id,
         round(scored.score, 6) AS score_r,
         round(scored.score * ln(1.0 + dl.dl), 6) AS dl_boost_r,
         round(CAST(nc.n_chars AS DOUBLE) / dl.dl, 6) AS chars_per_tok_r,
         CAST(row_number() OVER (
           PARTITION BY scored.qid
           ORDER BY round(scored.score, 6) DESC, scored.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
  JOIN dl ON dl.doc_id = scored.doc_id
  JOIN nc ON nc.doc_id = scored.doc_id
)
SELECT qid, rank, doc_id, score_r, dl_boost_r, chars_per_tok_r
FROM ranked WHERE rank <= {k}
"""


SN_INCLUDE, SN_EXCLUDE = "the fast", "fast key"


def q_fts_span_not(spark, sf_dir):
    """Lucene span_not: 'the fast' occurrences not overlapped by a
    'fast key' span — include scores, exclude only filters."""
    store = _corpus_store(spark, sf_dir)
    q = pd.DataFrame(
        [(0, SN_INCLUDE, SN_EXCLUDE)],
        columns=["qid", "include", "exclude"],
    )
    res = search.search_span_not(spark, store, q, k=50)
    return _rerank_rounded(res, FT_K)


SC_BIG, SC_LITTLE = "slow hash batch", "hash batch"
SW_BIG, SW_LITTLE = "value slow hash", "slow hash"


def q_fts_span_containing(spark, sf_dir):
    """Lucene span_containing: 'slow hash batch' spans that contain a
    'hash batch' span — the big span scores."""
    store = _corpus_store(spark, sf_dir)
    q = pd.DataFrame(
        [(0, SC_BIG, SC_LITTLE)], columns=["qid", "big", "little"]
    )
    res = search.search_span_containing(
        spark, store, q, k=50, mode="containing"
    )
    return _rerank_rounded(res, FT_K)


def q_fts_span_within(spark, sf_dir):
    """Lucene span_within: 'slow hash' spans lying within a
    'value slow hash' span — the little span scores."""
    store = _corpus_store(spark, sf_dir)
    q = pd.DataFrame(
        [(0, SW_BIG, SW_LITTLE)], columns=["qid", "big", "little"]
    )
    res = search.search_span_containing(
        spark, store, q, k=50, mode="within"
    )
    return _rerank_rounded(res, FT_K)


def _span_contain_sql(big: str, little: str, k: int, mode: str) -> str:
    """Oracle for span_containing/span_within: occurrence positions via
    list_filter, EXISTS containment window, kept-span BM25."""
    bt = analysis.tokenize_series(pd.Series([big]))[0]
    lt = analysis.tokenize_series(pd.Series([little]))[0]
    lb, ll = len(bt), len(lt)
    big_lit = "[" + ", ".join(f"'{t}'" for t in bt) + "]"
    lit_lit = "[" + ", ".join(f"'{t}'" for t in lt) + "]"
    keep = bt if mode == "containing" else lt
    vals = [
        f"(0, '{t}', {qtf})" for t, qtf in sorted(Counter(keep).items())
    ]
    need = len(set(keep))
    if mode == "containing":
        good = f"""
  SELECT DISTINCT b.doc_id FROM big_pos b
  WHERE EXISTS (
    SELECT 1 FROM lit_pos l
    WHERE l.doc_id = b.doc_id
      AND l.p BETWEEN b.p AND b.p + {lb - ll}
  )"""
    else:
        good = f"""
  SELECT DISTINCT l.doc_id FROM lit_pos l
  WHERE EXISTS (
    SELECT 1 FROM big_pos b
    WHERE b.doc_id = l.doc_id
      AND b.p BETWEEN l.p - {lb - ll} AND l.p
  )"""
    return f"""{_BM25_BODY},
big_pos AS (
  SELECT doc_id, unnest(list_filter(range(1, len(toks) - {lb} + 2),
         p -> toks[p:p + {lb - 1}] = {big_lit})) AS p
  FROM corpus WHERE len(toks) >= {lb}
),
lit_pos AS (
  SELECT doc_id, unnest(list_filter(range(1, len(toks) - {ll} + 2),
         p -> toks[p:p + {ll - 1}] = {lit_lit})) AS p
  FROM corpus WHERE len(toks) >= {ll}
),
good AS ({good}
),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(sc.qid AS BIGINT) AS qid, sc.doc_id AS doc_id,
         round(sc.score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY sc.qid
           ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored sc
  JOIN good g ON g.doc_id = sc.doc_id
  WHERE sc.nt = {need}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _span_not_sql(include: str, exclude: str, k: int) -> str:
    """Oracle for q_fts_span_not: occurrence positions via list_filter
    over the token array, overlap window in SQL, include-phrase BM25."""
    inc = analysis.tokenize_series(pd.Series([include]))[0]
    exc = analysis.tokenize_series(pd.Series([exclude]))[0]
    li, le = len(inc), len(exc)
    inc_lit = "[" + ", ".join(f"'{t}'" for t in inc) + "]"
    exc_lit = "[" + ", ".join(f"'{t}'" for t in exc) + "]"
    vals = [
        f"(0, '{t}', {qtf})" for t, qtf in sorted(Counter(inc).items())
    ]
    need = len(set(inc))
    return f"""{_BM25_BODY},
inc_pos AS (
  SELECT doc_id, unnest(list_filter(range(1, len(toks) - {li} + 2),
         p -> toks[p:p + {li - 1}] = {inc_lit})) AS p
  FROM corpus WHERE len(toks) >= {li}
),
exc_pos AS (
  SELECT doc_id, unnest(list_filter(range(1, len(toks) - {le} + 2),
         p -> toks[p:p + {le - 1}] = {exc_lit})) AS p
  FROM corpus WHERE len(toks) >= {le}
),
good AS (
  SELECT DISTINCT i.doc_id FROM inc_pos i
  WHERE NOT EXISTS (
    SELECT 1 FROM exc_pos e
    WHERE e.doc_id = i.doc_id
      AND e.p BETWEEN i.p - {le - 1} AND i.p + {li - 1}
  )
),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(sc.qid AS BIGINT) AS qid, sc.doc_id AS doc_id,
         round(sc.score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY sc.qid
           ORDER BY round(sc.score, 6) DESC, sc.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored sc
  JOIN good g ON g.doc_id = sc.doc_id
  WHERE sc.nt = {need}
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _span_near_sql(
    queries: list[tuple[int, str]], k: int, slop: int
) -> str:
    """Oracle for q_fts_span_near (two-token unordered spans): EXISTS a
    position pair within 1+slop in either order, AND-scored BM25."""
    vals, needs, exist_cases = [], [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        assert len(toks) == 2, "span_near oracle covers 2-token spans"
        t0, t1 = toks
        terms = sorted(Counter(toks).items())
        needs.append(f"({qid}, {len(terms)})")
        for t, qtf in terms:
            vals.append(f"({qid}, '{t}', {qtf})")
        exist_cases.append(
            f"WHEN m.qid = {qid} THEN EXISTS (\n"
            f"  SELECT 1\n"
            f"  FROM unnest(list_filter(range(1, len(cs.toks) + 1),\n"
            f"              i -> cs.toks[i] = '{t0}')) AS ta(a),\n"
            f"       unnest(list_filter(range(1, len(cs.toks) + 1),\n"
            f"              i -> cs.toks[i] = '{t1}')) AS tb(b)\n"
            f"  WHERE b != a AND abs(b - a) <= {1 + slop})"
        )
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, toks FROM corpus),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, need) AS (VALUES {", ".join(needs)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
m AS (
  SELECT scored.qid AS qid, scored.doc_id AS doc_id, scored.score AS score
  FROM scored
  JOIN need ON need.nqid = scored.qid AND scored.nt = need.need
),
ok AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id, m.score AS score
  FROM m JOIN cs ON cs.doc_id = m.doc_id
  WHERE CASE {" ".join(exist_cases)} ELSE FALSE END
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM ok
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ------------------------- 4d. regexp / match_phrase_prefix / dis_max
# ES regexp (anchored dictionary expansion), match_phrase_prefix (positional
# chain + last-token prefix expansion) and dis_max (max + tie_breaker over
# clause scores) — plans/search.search_regexp / search_phrase_prefix /
# search_dis_max.

REGEXP_QUERIES = [
    (0, "sc.n"),
    (1, "mer(ge|ging)s?"),
    (2, "w.ndow.*"),
    (3, "zzz+absent"),
]
PP_QUERIES = [
    (0, "spark mer"),
    (1, "part filter sc"),
    (2, "sparkMer"),      # code-aware split: fixed [spark], prefix "mer"
    (3, "zzzabsent wi"),  # unindexed fixed term -> no hits
]
PP_EXPANSIONS = 50
DISMAX_CLAUSES = [
    (0, 0, "spark merge"),
    (0, 1, "customer window"),
    (1, 0, "fast key"),
    (1, 1, "zzzabsent"),
]
DISMAX_TIE = 0.3


def q_fts_regexp(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    rpdf = pd.DataFrame(REGEXP_QUERIES, columns=["qid", "pattern"])
    res = search.search_regexp(spark, store, rpdf, k=50)
    return _rerank_rounded(res, FT_K)


def q_fts_phrase_prefix(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(PP_QUERIES, columns=["qid", "query"])
    res = search.search_phrase_prefix(
        spark, store, qpdf, k=50, max_expansions=PP_EXPANSIONS
    )
    return _rerank_rounded(res, FT_K)


def q_fts_dis_max(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    cpdf = pd.DataFrame(DISMAX_CLAUSES, columns=["qid", "clause", "query"])
    res = search.search_dis_max(
        spark, store, cpdf, k=50, tie_breaker=DISMAX_TIE
    )
    return _rerank_rounded(res, FT_K)


def _regexp_sql(patterns: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_regexp: anchored full-term regex expansion
    (DuckDB regexp_full_match ≡ the engine's ^(?:...)$ rlike), the same
    deterministic term-ascending cap of 50, qtf=1 OR-scored BM25."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in patterns)
    return f"""{_BM25_BODY},
q AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (PARTITION BY v.qid ORDER BY d.term) AS rn
    FROM (VALUES {vals}) v(qid, pat)
    JOIN dfreq d ON regexp_full_match(d.term, v.pat)
  ) WHERE rn <= 50
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _phrase_prefix_sql(
    queries: list[tuple[int, str]], k: int, max_expansions: int
) -> str:
    """Oracle for q_fts_phrase_prefix: expand the last analyzed token as a
    prefix (capped term-ascending), require the fixed tokens + expansion to
    appear consecutively (space-joined containment), score = fixed-multiset
    AND BM25 + the best matching expansion's qtf=1 BM25."""
    vvals, fvals, nvals = [], [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        if not toks:
            continue
        fixed, pfx = list(toks[:-1]), toks[-1]
        vvals.append(f"({qid}, ' {' '.join(fixed + [''])}', '{pfx}')")
        terms = sorted(Counter(fixed).items())
        nvals.append(f"({qid}, {len(terms)})")
        for t, qtf in terms:
            fvals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
v(qid, fixedpat, pfx) AS (VALUES {", ".join(vvals)}),
exp AS (
  SELECT qid, term FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (PARTITION BY v.qid ORDER BY d.term) AS rn
    FROM v JOIN dfreq d ON d.term LIKE v.pfx || '%'
  ) WHERE rn <= {max_expansions}
),
fixedq(fqid, fterm, qtf) AS (VALUES {", ".join(fvals)}),
need(nqid, need) AS (VALUES {", ".join(nvals)}),
sf AS (
  SELECT q.fqid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS s_f,
         count(*) AS nt
  FROM fixedq q
  JOIN posting p ON p.term = q.fterm
  JOIN dfreq d ON d.term = q.fterm
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.fqid, p.doc_id
),
se AS (
  SELECT e.qid AS qid, p.doc_id AS doc_id,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
           * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS s_e
  FROM exp e
  JOIN posting p ON p.term = e.term
  JOIN dfreq d ON d.term = e.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  JOIN v ON v.qid = e.qid
  JOIN cs ON cs.doc_id = p.doc_id
         AND contains(cs.s, v.fixedpat || e.term || ' ')
),
tot AS (
  SELECT se.qid AS qid, se.doc_id AS doc_id,
         max(COALESCE(sf.s_f, 0.0) + se.s_e) AS score
  FROM se
  JOIN sf ON sf.qid = se.qid AND sf.doc_id = se.doc_id
  JOIN need ON need.nqid = se.qid AND sf.nt = need.need
  GROUP BY se.qid, se.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM tot
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _dis_max_sql(
    clauses: list[tuple[int, int, str]], k: int, tie_breaker: float
) -> str:
    """Oracle for q_fts_dis_max: per-clause OR BM25 scores, combined per doc
    as max + tie_breaker * (sum - max)."""
    vals = []
    for qid, clause, q in clauses:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, {clause}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, clause, term, qtf) AS (VALUES {", ".join(vals)}),
per_clause AS (
  SELECT q.qid AS qid, q.clause AS clause, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS sc
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, q.clause, p.doc_id
),
comb AS (
  SELECT qid, doc_id,
         max(sc) + {tie_breaker} * (sum(sc) - max(sc)) AS score
  FROM per_clause
  GROUP BY qid, doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM comb
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


_BM25_BODY = f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term)
"""


def _phrase_sql(queries: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_phrase: AND-scored BM25 restricted to docs whose
    token stream contains the phrase consecutively (space-joined token
    containment ≡ consecutive positions — tokens never contain spaces)."""
    vals, needs, pats = [], [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        terms = sorted(Counter(toks).items())
        needs.append(f"({qid}, {len(terms)})")
        pats.append(f"({qid}, ' {' '.join(toks)} ')")
        for t, qtf in terms:
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
cs AS (SELECT doc_id, ' ' || array_to_string(toks, ' ') || ' ' AS s
       FROM corpus),
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
need(nqid, need) AS (VALUES {", ".join(needs)}),
ph(pqid, pat) AS (VALUES {", ".join(pats)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(scored.qid AS BIGINT) AS qid, scored.doc_id AS doc_id,
         round(scored.score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY scored.qid
           ORDER BY round(scored.score, 6) DESC, scored.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
  JOIN (VALUES {", ".join(needs)}) need(nqid, need)
    ON scored.qid = need.nqid AND scored.nt = need.need
  JOIN ph ON ph.pqid = scored.qid
  JOIN cs ON cs.doc_id = scored.doc_id AND contains(cs.s, ph.pat)
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


def _prefix_sql(prefixes: list[tuple[int, str]], k: int) -> str:
    """Oracle for q_fts_prefix: expand each prefix against the term
    dictionary with the engine's deterministic term-ascending cap of 50
    (search_prefix's max_expansions default, ES parity), OR-score the
    expanded set with qtf=1 BM25."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in prefixes)
    return f"""{_BM25_BODY},
q AS (
  SELECT qid, term, 1 AS qtf FROM (
    SELECT v.qid AS qid, d.term AS term,
           row_number() OVER (PARTITION BY v.qid ORDER BY d.term) AS rn
    FROM (VALUES {vals}) v(qid, pfx)
    JOIN dfreq d ON d.term LIKE v.pfx || '%'
  ) WHERE rn <= 50
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------- 5. exact dedup

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_EXACT = f"""
SELECT md5(array_to_string({DOC_TOKS}, ' ')) AS fp,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(CAST(doc_id AS VARCHAR)) AS canonical
FROM documents
GROUP BY fp
"""

# ----------------------------------------------------- 6. minhash LSH dedup

_DUCK_SHINGLES = f"""
CASE WHEN len({DOC_TOKS}) >= 3
     THEN list_transform(range(1, len({DOC_TOKS}) - 1),
                         i -> array_to_string(({DOC_TOKS})[i:i+2], ' '))
     ELSE [] END
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir), "doc_id", "text")
    return dedup.lsh_candidate_pairs(sigs)


def _sql_minhash() -> str:
    sig_cols = ",\n       ".join(
        f"min(md5(sh || '#{s}')) AS sig_{s}" for s in range(dedup.MINHASH_SEEDS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT id, {s} AS band, sig_{s} AS key FROM sigs"
        for s in range(dedup.MINHASH_SEEDS)
    )
    return f"""
WITH sh AS (
  SELECT id, unnest(list_distinct(shingles)) AS sh
  FROM (SELECT CAST(doc_id AS VARCHAR) AS id, {_DUCK_SHINGLES} AS shingles
        FROM documents)
),
sigs AS (SELECT id, {sig_cols} FROM sh GROUP BY id),
banded AS ({bands})
SELECT DISTINCT a.id AS a, b.id AS b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.id < b.id
"""


# ------------------------------------------------- 7. n-gram Jaccard pairs

JACCARD_MAX_ID = 60


def q_dedup_jaccard(spark, sf_dir):
    sub = _docs(spark, sf_dir).filter(F.col("doc_id") < JACCARD_MAX_ID)
    pairs = dedup.ngram_jaccard_pairs(sub, "doc_id", "text")
    return pairs.select("a", "b", F.round("jac", 6).alias("jac_r"))


SQL_DEDUP_JACCARD = f"""
WITH sh AS (
  SELECT id, unnest(list_distinct(shingles)) AS sh
  FROM (SELECT CAST(doc_id AS VARCHAR) AS id, {_DUCK_SHINGLES} AS shingles
        FROM documents WHERE doc_id < {JACCARD_MAX_ID})
),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS a, b.id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT inter.a AS a, inter.b AS b,
       round(inter.i / (sa.sz + sb.sz - inter.i), 6) AS jac_r
FROM inter
JOIN sizes sa ON sa.id = inter.a
JOIN sizes sb ON sb.id = inter.b
"""

# ----------------------------------------------------------- 8. simhash

def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), "doc_id", "text")


def _sql_simhash() -> str:
    bits = dedup.SIMHASH_BITS
    bit_sums = ",\n       ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return f"""
WITH tf AS (
  SELECT id, tok, count(*) AS tf
  FROM (SELECT CAST(doc_id AS VARCHAR) AS id, unnest({DOC_TOKS}) AS tok
        FROM documents)
  GROUP BY id, tok
),
h AS (SELECT id, tf, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tf),
bits AS (SELECT id, {bit_sums} FROM h GROUP BY id)
SELECT id, CAST({combine} AS BIGINT) AS simhash FROM bits
"""


# ------------------------------------------------------ 9. ANN cosine top-k

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10


def q_ann_cosine_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    res = ann.brute_force_topk(emb, ANN_QUERY_IDS, k=50)
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        res.withColumn("cos_r", F.round("cos", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("qid", "rank", "vec_id", "cos_r")
    )


SQL_ANN = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e
      WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
t AS (SELECT vec_id, v FROM e
      WHERE vec_id NOT IN ({", ".join(map(str, ANN_QUERY_IDS))})),
scored AS (
  SELECT q.qid AS qid, t.vec_id AS vec_id,
         list_dot_product(q.qv, t.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(t.v, t.v))) AS cos
  FROM q CROSS JOIN t
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
         round(cos, 6) AS cos_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY round(cos, 6) DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, vec_id, cos_r FROM ranked WHERE rank <= {ANN_K}
"""

# ------------------------------------------------- 9a2. IVF-flat ANN top-k
# The IVF scale path (operators/ann.ann_topk_ivf): deterministic sampled
# centroids, nprobe cluster pruning, exact re-rank inside probed clusters.

IVF_CENTROID_IDS = list(range(100, 116))
IVF_NPROBE = 3


def q_ann_ivf_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    res = ann.ann_topk_ivf(
        emb, ANN_QUERY_IDS, IVF_CENTROID_IDS, k=50, nprobe=IVF_NPROBE
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        res.withColumn("cos_r", F.round("cos", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("qid", "rank", "vec_id", "cos_r")
    )


def q_ann_ivfpq_topk(spark, sf_dir):
    """FAISS-style IVF-PQ composite: coarse prune (nprobe clusters) ×
    ADC over m-byte codes × exact rerank. With the rerank window deep
    enough to recover the probed set's true top-k, the result equals
    exact-cosine-within-probed-clusters — so the IVF oracle verifies the
    whole composite (cluster routing + code machinery) end to end."""
    emb = _tbl(spark, sf_dir, "embeddings")
    books = ann.pq_train_codebooks(
        emb, m=PQ_M, n_codes=PQ_CODES, iters=10, sample=2048
    )
    res = ann.ann_topk_ivfpq(
        emb, ANN_QUERY_IDS, IVF_CENTROID_IDS, books,
        k=50, nprobe=IVF_NPROBE, rerank=max(PQ_RERANK, 50),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        res.withColumn("cos_r", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("qid", "rank", "vec_id", "cos_r")
    )


def _ivf_sql() -> str:
    qids = ", ".join(map(str, ANN_QUERY_IDS))
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
           "* sqrt(list_dot_product({b}, {b})))")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id IN ({cids})),
t AS (SELECT vec_id, v FROM e WHERE vec_id NOT IN ({qids})),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT t.vec_id, t.v, c.cid,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY {cos.format(a="t.v", b="c.cv")} DESC, c.cid ASC
           ) AS rn
    FROM t CROSS JOIN c
  ) WHERE rn = 1
),
qp AS (
  SELECT qid, qv, cid FROM (
    SELECT q.vec_id AS qid, q.v AS qv, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {cos.format(a="q.v", b="c.cv")} DESC, c.cid ASC
           ) AS rn
    FROM (SELECT * FROM e WHERE vec_id IN ({qids})) q CROSS JOIN c
  ) WHERE rn <= {IVF_NPROBE}
),
scored AS (
  SELECT qp.qid AS qid, a.vec_id AS vec_id,
         {cos.format(a="qp.qv", b="a.v")} AS cos
  FROM qp JOIN assign a ON a.cid = qp.cid
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
         round(cos, 6) AS cos_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY round(cos, 6) DESC, vec_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, vec_id, cos_r FROM ranked WHERE rank <= {ANN_K}
"""


def q_fts_count(spark, sf_dir):
    """ES _count API: match-set sizes, zero retrieval — OR and AND modes
    in one unioned result; unmatchable queries count 0."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FT_QUERIES, columns=["qid", "query"])
    or_c = search.search_count(spark, store, qpdf, mode="or").select(
        F.lit("or").alias("mode"), "qid", "n_docs"
    )
    and_c = search.search_count(spark, store, qpdf, mode="and").select(
        F.lit("and").alias("mode"), "qid", "n_docs"
    )
    return or_c.unionByName(and_c)


def _count_sql(queries) -> str:
    vals, needs = [], []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        terms = sorted(set(toks))
        needs.append(f"({qid}, {len(terms)})")
        for t in terms:
            vals.append(f"({qid}, '{t}')")
    return f"""{_BM25_BODY},
q(qid, term) AS (VALUES {", ".join(vals)}),
need(nqid, need) AS (VALUES {", ".join(needs)}),
matched AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         count(DISTINCT q.term) AS nt
  FROM q JOIN posting p ON p.term = q.term
  GROUP BY q.qid, p.doc_id
),
or_c AS (
  SELECT need.nqid AS qid, CAST(count(m.doc_id) AS BIGINT) AS n_docs
  FROM need LEFT JOIN matched m ON m.qid = need.nqid
  GROUP BY need.nqid
),
and_c AS (
  SELECT need.nqid AS qid,
         CAST(count(CASE WHEN m.nt = need.need THEN 1 END) AS BIGINT)
           AS n_docs
  FROM need LEFT JOIN matched m ON m.qid = need.nqid
  GROUP BY need.nqid
)
SELECT 'or' AS mode, CAST(qid AS BIGINT) AS qid, n_docs FROM or_c
UNION ALL
SELECT 'and', CAST(qid AS BIGINT), n_docs FROM and_c
"""


PINNED_IDS = {0: ["7", "3"], 1: ["490"], 2: ["5"]}


def q_fts_pinned(spark, sf_dir):
    """ES pinned query: promoted ids first in the given order, organic
    BM25 after; qid 2's query matches nothing organically but still
    surfaces its pin (null score)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FS_QUERIES, columns=["qid", "query"])
    return search.search_pinned(
        spark, store, qpdf, PINNED_IDS, k=FT_K
    )


def _pinned_sql(queries, pinned: dict, k: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    pvals = [
        f"({qid}, '{d}', {i})"
        for qid, ids_ in pinned.items()
        for i, d in enumerate(ids_)
    ]
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
org AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
pins AS (
  SELECT v.qid, v.doc_id, v.pin FROM (VALUES {", ".join(pvals)})
    v(qid, doc_id, pin)
  WHERE EXISTS (SELECT 1 FROM documents dd
                WHERE CAST(dd.doc_id AS VARCHAR) = v.doc_id)
),
merged AS (
  SELECT COALESCE(org.qid, pins.qid) AS qid,
         COALESCE(org.doc_id, pins.doc_id) AS doc_id,
         CASE WHEN pins.pin IS NOT NULL THEN 0 ELSE 1 END AS tier,
         COALESCE(pins.pin, 0) AS pin_ord,
         org.score_r AS score_r
  FROM org FULL JOIN pins
    ON pins.qid = org.qid AND pins.doc_id = org.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         CAST(1 - tier AS INTEGER) AS pinned, score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY tier ASC, pin_ord ASC,
                    score_r DESC NULLS LAST, doc_id ASC
         ) AS INTEGER) AS rank
  FROM merged
)
SELECT qid, rank, doc_id, pinned, score_r FROM ranked WHERE rank <= {k}
"""


TL_QUERIES = [(0, "17"), (1, "42")]


def q_fts_terms_lookup(spark, sf_dir):
    """ES terms lookup: the term list comes from another document's
    field; constant-score filter over the distinct token set, the
    looked-up doc excluded."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(TL_QUERIES, columns=["qid", "lookup_id"])
    return search.search_terms_lookup(
        spark, store, _docs(spark, sf_dir), qpdf, k=FT_K
    )


def _terms_lookup_sql(queries, k: int) -> str:
    vals = ", ".join(f"({qid}, '{lid}')" for qid, lid in queries)
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
v(qid, lid) AS (VALUES {vals}),
lookup_terms AS (
  SELECT v.qid AS qid, t.term AS term
  FROM v JOIN corpus c ON c.doc_id = v.lid,
       unnest(list_distinct(c.toks)) t(term)
),
hits AS (
  SELECT DISTINCT lt.qid AS qid, c2.doc_id AS doc_id
  FROM lookup_terms lt
  JOIN corpus c2 ON list_contains(c2.toks, lt.term)
  WHERE c2.doc_id != (SELECT lid FROM v WHERE v.qid = lt.qid)
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         1.0 AS score,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY doc_id ASC
         ) AS INTEGER) AS rank
  FROM hits
)
SELECT qid, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


DF_ORIGIN, DF_PIVOT, DF_BOOST = 50.0, 10.0, 2.0


def q_fts_distance_feature(spark, sf_dir):
    """ES distance_feature: additive proximity bonus
    boost·pivot/(pivot+|v−origin|) — the recency-boost idiom, here over
    the dl column."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(FS_QUERIES, columns=["qid", "query"])
    res = search.search_distance_feature(
        spark, store, qpdf, origin=DF_ORIGIN, pivot=DF_PIVOT,
        boost=DF_BOOST, k=50,
    )
    return _rerank_rounded(res, FT_K)


def _distance_feature_sql(queries, k: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         )
         + {DF_BOOST} * {DF_PIVOT}
           / ({DF_PIVOT} + abs(max(dl.dl) - {DF_ORIGIN})) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------- 9b. embedding near-dup pairs

NEAR_DUP_THRESHOLD = 0.3
NEAR_DUP_MAX_ID = 300


def q_ann_near_dup(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_MAX_ID
    )
    pairs = ann.cosine_near_dup_exact(emb, NEAR_DUP_THRESHOLD)
    return pairs.select("a", "b", F.round("cos", 6).alias("cos_r"))


SQL_ANN_NEAR_DUP = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < {NEAR_DUP_MAX_ID}),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_dot_product(x.v, y.v)
           / (sqrt(list_dot_product(x.v, x.v))
              * sqrt(list_dot_product(y.v, y.v))) AS cos
  FROM e x JOIN e y ON x.vec_id < y.vec_id
)
SELECT a, b, round(cos, 6) AS cos_r FROM p WHERE cos >= {NEAR_DUP_THRESHOLD}
"""

def q_ann_near_dup_clusters(spark, sf_dir):
    """Global dedup clusters: connected components over the exact
    near-dup pair list, cluster id = min member id (canonical
    representative — keep-one dedup filters id == cluster); the oracle
    computes the transitive closure with a recursive CTE."""
    emb = _tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_MAX_ID
    )
    pairs = ann.cosine_near_dup_exact(emb, NEAR_DUP_THRESHOLD)
    ids = emb.select(F.col("vec_id").cast("string").alias("doc_id"))
    return dedup.dedup_clusters(ids, pairs)


SQL_NEAR_DUP_CLUSTERS = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < {NEAR_DUP_MAX_ID}
),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM e x JOIN e y ON x.vec_id < y.vec_id
  WHERE list_dot_product(x.v, y.v)
          / (sqrt(list_dot_product(x.v, x.v))
             * sqrt(list_dot_product(y.v, y.v))) >= {NEAR_DUP_THRESHOLD}
),
edges AS (
  SELECT CAST(a AS VARCHAR) AS src, CAST(b AS VARCHAR) AS dst FROM p
  UNION ALL
  SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM p
),
ids AS (SELECT CAST(vec_id AS VARCHAR) AS id FROM e),
reach(id, r) AS (
  SELECT id, id FROM ids
  UNION
  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r
)
SELECT id, min(r) AS cluster FROM reach GROUP BY id
"""


# ------------------------------------------ 9c. PQ ANN with exact rerank
# Product quantization (operators/ann.ann_topk_pq): the full scan touches
# only the m-byte codes (ADC lookup-table gathers), a deep shortlist is
# exact-reranked by true cosine. With the rerank window ≥ the corpus
# fraction holding every true top-k (here 300 of ~495 targets — verified
# at both test SFs), the final top-k equals brute force, so the oracle is
# the exact-cosine SQL: the gate checks the codes→shortlist→rerank
# machinery end-to-end.

# m=16 (4-dim subspaces) × 64 codes: tight enough quantization that the
# true top-10's worst ADC rank measured ≤ 65 of 495 targets at both test
# SFs — rerank=250 is a ~4× margin (random 64-dim vectors are the HARD
# case for PQ: cosine spread ~0.1 vs coarse quantization error)
PQ_M, PQ_CODES, PQ_RERANK = 16, 64, 250


def q_ann_pq_topk(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    books = ann.pq_train_codebooks(
        emb, m=PQ_M, n_codes=PQ_CODES, iters=10, sample=2048
    )
    res = ann.ann_topk_pq(
        emb, ANN_QUERY_IDS, books, k=50, rerank=max(PQ_RERANK, 50)
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_r").desc(), F.col("vec_id").asc()
    )
    return (
        res.withColumn("cos_r", F.round("score", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_K)
        .select("qid", "rank", "vec_id", "cos_r")
    )


# ------------------------------------ 9d. LSH near-dup, pruning-verified
# Hyperplane-LSH near-dup (operators/ann.cosine_near_dup_lsh) on FIXED
# md5-derived Rademacher planes: the DuckDB oracle recomputes the same
# ±1 projections, the same per-table bucket packing, the same same-bucket
# candidate join, and the same exact-cosine confirmation — so the gate
# verifies the LSH PRUNING bit-for-bit (recall < 1 by design; both sides
# prune identically), not just the rerank.

LSH_NP, LSH_NT = 4, 3


def q_ann_lsh_near_dup(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < NEAR_DUP_MAX_ID
    )
    dim = len(emb.select("embedding").head()[0])
    planes = ann.rademacher_planes(dim, LSH_NP * LSH_NT)
    pairs = ann.cosine_near_dup_lsh(
        emb, NEAR_DUP_THRESHOLD,
        n_planes=LSH_NP, n_tables=LSH_NT, planes=planes,
    )
    return pairs.select("a", "b", F.round("cos", 6).alias("cos_r"))


def _lsh_near_dup_sql() -> str:
    np_, nt = LSH_NP, LSH_NT
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id < {NEAR_DUP_MAX_ID}),
vd AS (SELECT vec_id, unnest(v) AS val, unnest(range(len(v))) AS d FROM e),
-- dims derived from the data (distinct unnested indices), like the Spark
-- side derives dim — a changed embeddings table can never silently
-- compare against wrong hyperplanes (ADVICE r3)
dims AS (SELECT DISTINCT d FROM vd),
s AS (
  SELECT p.range AS p, dims.d AS d,
         CASE WHEN ('0x' || substr(md5(
                CAST(p.range AS VARCHAR) || '_' || CAST(dims.d AS VARCHAR)
              ), 1, 8))::BIGINT & 1 = 1
              THEN 1.0 ELSE -1.0 END AS sgn
  FROM range(0, {np_ * nt}) p, dims
),
dots AS (
  SELECT vd.vec_id, s.p, sum(vd.val * s.sgn) AS dot
  FROM vd JOIN s ON s.d = vd.d
  GROUP BY vd.vec_id, s.p
),
buckets AS (
  SELECT vec_id, p // {np_} AS tbl,
         sum(CASE WHEN dot > 0
                  THEN (CAST(1 AS BIGINT) << (p % {np_}))
                  ELSE CAST(0 AS BIGINT) END) AS bucket
  FROM dots GROUP BY vec_id, p // {np_}
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM buckets x
  JOIN buckets y ON x.tbl = y.tbl AND x.bucket = y.bucket
               AND x.vec_id < y.vec_id
),
p2 AS (
  SELECT c.a, c.b,
         list_dot_product(ea.v, eb.v)
           / (sqrt(list_dot_product(ea.v, ea.v))
              * sqrt(list_dot_product(eb.v, eb.v))) AS cos
  FROM cand c
  JOIN e ea ON ea.vec_id = c.a
  JOIN e eb ON eb.vec_id = c.b
)
SELECT a, b, round(cos, 6) AS cos_r FROM p2
WHERE cos >= {NEAR_DUP_THRESHOLD}
"""

# --------------------------------- 9d2. chunk-level boilerplate dedup
# Cross-document chunk duplication (RefinedWeb-style boilerplate signal):
# distinct 2-token chunks per doc, shared = present in >= 2 docs.

CHUNK_TOKENS = 2


def q_dedup_chunk_boilerplate(spark, sf_dir):
    return dedup.chunk_dup_stats(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        chunk_tokens=CHUNK_TOKENS,
    )


def _chunk_boilerplate_sql() -> str:
    d = CHUNK_TOKENS
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
dc AS (
  SELECT DISTINCT doc_id,
         array_to_string(
           list_slice(toks, (i - 1) * {d} + 1,
                      least(i * {d}, len(toks))), ' '
         ) AS chunk
  FROM corpus,
       unnest(range(1, CAST(ceil(len(toks) / {d}.0) AS BIGINT) + 1)) t(i)
  WHERE len(toks) > 0
),
shared AS (
  SELECT chunk FROM dc GROUP BY chunk HAVING count(*) >= 2
)
SELECT dc.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN s.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunks,
       round(sum(CASE WHEN s.chunk IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), 6) AS dup_frac_r
FROM dc LEFT JOIN shared s ON s.chunk = dc.chunk
GROUP BY dc.doc_id
"""


# ------------------------------ 9d3. exact-substring duplicate spans
# ExactSubstr dedup (Lee et al. 2022) bounded to a fixed witness length:
# duplicated token spans, maximal after island merge.

DUPSPAN_W = 3


def q_dedup_duplicate_spans(spark, sf_dir):
    return dedup.duplicate_spans(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        window=DUPSPAN_W,
    )


def _duplicate_spans_sql() -> str:
    w = DUPSPAN_W
    return f"""
WITH corpus AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(toks, i, i + {w} - 1), ' ') AS gram
  FROM corpus, unnest(range(1, len(toks) - {w} + 2)) t(i)
),
dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
marked AS (
  SELECT occ.doc_id AS doc_id, occ.pos AS s, occ.pos + {w} AS e
  FROM occ JOIN dup USING (gram)
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR s > max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
              THEN 1 ELSE 0 END AS new_i
  FROM marked
),
isl2 AS (
  SELECT doc_id, s, e,
         sum(new_i) OVER (
           PARTITION BY doc_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM isl
)
SELECT doc_id, CAST(min(s) AS BIGINT) AS start, CAST(max(e) AS BIGINT) AS "end"
FROM isl2 GROUP BY doc_id, island
"""


# ----------------------------------- 9e. n-gram decontamination
# LLM-pipeline decontamination: corpus docs sharing any word n-gram with
# the benchmark/eval set (operators/decontam.py) — benchmark n-grams
# broadcast, corpus never shuffles for the join.

DECONTAM_N = 5
DECONTAM_BENCH_MAX = 20  # doc_id < 20 plays the eval set


def q_decontam_ngram(spark, sf_dir):
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < DECONTAM_BENCH_MAX)
    corpus = d.filter(F.col("doc_id") >= DECONTAM_BENCH_MAX)
    return decontam.ngram_contamination(corpus, bench, n=DECONTAM_N)


def _decontam_sql() -> str:
    n = DECONTAM_N
    return f"""
WITH d AS (SELECT doc_id, {DOC_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range({n}, len(t) + 1),
           i -> array_to_string(t[i - {n} + 1 : i], ' ')
         ))) AS gram
  FROM d
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < {DECONTAM_BENCH_MAX}),
hits AS (
  SELECT CAST(g.doc_id AS VARCHAR) AS doc_id,
         CAST(count(*) AS BIGINT) AS n_hits
  FROM g JOIN bench USING (gram)
  WHERE g.doc_id >= {DECONTAM_BENCH_MAX}
  GROUP BY g.doc_id
)
SELECT doc_id, n_hits FROM hits
"""


# ----------------------------------- 9f. deterministic stratified sample
# Corpus mixing (operators/sampling.py): per-stratum keep rates decided by
# an md5 key hash — a pure map-side filter, identical row set on any
# cluster, and exactly reproducible from SQL.

SAMPLE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
SAMPLE_DEFAULT = 0.1


def q_corpus_sample_mix(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "source"
    )
    return sampling.stratified_sample(
        d, "source", SAMPLE_RATES, key_col="doc_id",
        default_rate=SAMPLE_DEFAULT,
    )


MIX_ALPHA, MIX_TARGET = 0.5, 0.5


def q_corpus_mix_temperature(spark, sf_dir):
    """Temperature-flattened corpus mixing (multilingual-pretraining
    recipe): stratum mass ∝ n^alpha, scaled to a target kept fraction,
    clamped at 1 — rates derived from the data, then the same md5-keyed
    shuffle-free filter."""
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"), "lang"
    )
    rates = sampling.temperature_mix_rates(
        d, "lang", alpha=MIX_ALPHA, target_frac=MIX_TARGET
    )
    return sampling.stratified_sample(d, "lang", rates, key_col="doc_id")


def _mix_temperature_sql() -> str:
    """Oracle for q_corpus_mix_temperature: the rate arithmetic
    (pow(n, alpha) mass, normalized, clamped) replicated over the same
    stratum counts, then the identical md5 keep filter."""
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
),
cnt AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
tot AS (SELECT sum(n) * {MIX_TARGET} AS total,
               sum(pow(n, {MIX_ALPHA})) AS z
        FROM cnt),
rates AS (
  SELECT cnt.lang,
         least(1.0, tot.total * pow(cnt.n, {MIX_ALPHA}) / tot.z / cnt.n)
           AS rate
  FROM cnt CROSS JOIN tot
)
SELECT d.doc_id AS doc_id, d.lang AS lang
FROM d JOIN rates ON rates.lang = d.lang
WHERE d.u < rates.rate
"""


def _sample_mix_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}"
        for s, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         CASE {cases} ELSE {SAMPLE_DEFAULT} END AS rate
  FROM documents
)
SELECT doc_id, source FROM d WHERE u < rate
"""


# ----------------------------------- 9f2. sequence packing
# Token-budget next-fit packing into training sequences
# (operators/packing.py): md5 pack groups, doc_id order, one shuffle.
# The oracle replicates the sequential next-fit state machine with a
# recursive CTE — exact packing parity, not just row counts.

PACK_BUDGET, PACK_GROUPS = 150, 8


def q_corpus_pack_sequences(spark, sf_dir):
    return packing.pack_sequences(
        _docs(spark, sf_dir), budget=PACK_BUDGET, n_groups=PACK_GROUPS
    )


def _pack_sql() -> str:
    b, g = PACK_BUDGET, PACK_GROUPS
    return f"""
WITH RECURSIVE d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(len({DOC_TOKS}) AS BIGINT) AS n_tok,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {g} AS grp
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
  FROM d
),
pack AS (
  SELECT grp, rn, doc_id, n_tok,
         CAST(0 AS BIGINT) AS seq_assigned,
         n_tok > {b} AS oversize,
         CASE WHEN n_tok > {b} THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS next_seq,
         CASE WHEN n_tok > {b} THEN CAST(0 AS BIGINT)
              ELSE n_tok END AS next_acc
  FROM r WHERE rn = 1
  UNION ALL
  SELECT x.grp, x.rn, x.doc_id, x.n_tok,
         CASE WHEN x.n_tok > {b} THEN
                CASE WHEN p.next_acc > 0 THEN p.next_seq + 1
                     ELSE p.next_seq END
              WHEN p.next_acc + x.n_tok > {b} THEN p.next_seq + 1
              ELSE p.next_seq END AS seq_assigned,
         x.n_tok > {b} AS oversize,
         CASE WHEN x.n_tok > {b} THEN
                (CASE WHEN p.next_acc > 0 THEN p.next_seq + 1
                      ELSE p.next_seq END) + 1
              WHEN p.next_acc + x.n_tok > {b} THEN p.next_seq + 1
              ELSE p.next_seq END AS next_seq,
         CASE WHEN x.n_tok > {b} THEN CAST(0 AS BIGINT)
              WHEN p.next_acc + x.n_tok > {b} THEN x.n_tok
              ELSE p.next_acc + x.n_tok END AS next_acc
  FROM pack p JOIN r x ON x.grp = p.grp AND x.rn = p.rn + 1
)
SELECT doc_id, n_tok, CAST(grp AS BIGINT) AS "group",
       CAST(grp * 1099511627776 + seq_assigned AS BIGINT) AS seq_id,
       oversize
FROM pack
"""


# ----------------------------------- 9f3. PII scrubbing
# Redaction pass (functions/text.scrub_pii): emails / IPv4 / phone →
# typed placeholders. The driver table carries no PII, so the gate PLANTS
# a deterministic per-doc PII suffix on BOTH sides (same concat in Spark
# and SQL) and verifies the redacted text and per-kind counts match.

def q_text_scrub_pii(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".255 call 555-123-4567"),
        ).alias("raw"),
    )
    return d.select(
        "doc_id",
        T.pii_count("raw", "email").alias("n_email"),
        T.pii_count("raw", "ipv4").alias("n_ip"),
        T.pii_count("raw", "phone").alias("n_phone"),
        F.md5(T.scrub_pii("raw")).alias("scrubbed_md5"),
    )


def _scrub_pii_sql() -> str:
    email, ipv4, phone = (p for _n, p, _r in T.PII_PATTERNS)
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 10.0.'
              || CAST(doc_id % 256 AS VARCHAR)
              || '.255 call 555-123-4567' AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{email}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(raw, '{ipv4}')) AS BIGINT) AS n_ip,
       CAST(len(regexp_extract_all(raw, '{phone}')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
             '{email}', '<EMAIL>', 'g'),
             '{ipv4}', '<IP>', 'g'),
             '{phone}', '<PHONE>', 'g')) AS scrubbed_md5
FROM d
"""


# ----------------------------------- 9g. repetition quality (Gopher-style)

def q_text_repetition(spark, sf_dir):
    return quality.repetition_stats(_docs(spark, sf_dir))


def _repetition_sql() -> str:
    return f"""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS t
           FROM documents),
counts AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq
  FROM d
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(2, len(t) + 1),
                i -> array_to_string(t[i - 1 : i], ' '))) AS g
  FROM d
),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bi AS (SELECT doc_id, max(c) AS bi_max FROM bc GROUP BY doc_id),
tg AS (
  SELECT doc_id,
         unnest(list_transform(range(3, len(t) + 1),
                i -> array_to_string(t[i - 2 : i], ' '))) AS g
  FROM d
),
tc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
tri AS (
  SELECT doc_id, sum(CASE WHEN c > 1 THEN c END) AS tri_dup,
         sum(c) AS tri_tot
  FROM tc GROUP BY doc_id
)
SELECT counts.doc_id AS doc_id, n_tok,
       round(n_uniq / greatest(n_tok, 1), 6) AS uniq_ratio_r,
       round(COALESCE(bi_max, 0) * 2.0 / greatest(n_tok, 1), 6)
         AS top_bigram_frac_r,
       round(COALESCE(tri_dup, 0) / greatest(COALESCE(tri_tot, 0), 1), 6)
         AS dup_trigram_frac_r
FROM counts
LEFT JOIN bi USING (doc_id)
LEFT JOIN tri USING (doc_id)
"""


# -------------------------------------------------------- 10. text quality

def q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        T.n_tokens("text").alias("n_tok"),
        T.bpe_token_count("text").alias("n_bpe"),
        F.round(T.punct_ratio("text"), 6).alias("punct_r"),
        F.round(T.stopword_ratio("text"), 6).alias("stop_r"),
        F.round(T.quality_score("text"), 6).alias("quality_r"),
    )


def _sql_text_quality() -> str:
    stop = ", ".join(f"'{w}'" for w in T.STOPWORDS)
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, {DOC_TOKS} AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(len(regexp_extract_all(lower(text), '{T.BPE_RE}')) AS BIGINT)
           AS n_bpe,
         len(regexp_extract_all(text, '{T.PUNCT_RE}'))
           / greatest(length(text), 1) AS punct,
         len(list_filter(toks, t -> t IN ({stop})))
           / greatest(len(toks), 1) AS stop
  FROM x
)
SELECT doc_id, n_tok, n_bpe,
       round(punct, 6) AS punct_r,
       round(stop, 6) AS stop_r,
       round(least(n_tok / 100.0, 1.0) * 0.4
             + (1.0 - least(punct * 4.0, 1.0)) * 0.3
             + least(stop * 5.0, 1.0) * 0.3, 6) AS quality_r
FROM m
"""


# ---------------------------------------------------------- 11. lang id

def q_text_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        T.lang_id("text").alias("pred_lang"),
    )


def _sql_lang_id() -> str:
    hits = {
        lg: f"len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lg, ws in T.LANG_STOPWORDS.items()
    }
    return f"""
WITH x AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
           FROM documents),
h AS (SELECT doc_id, {hits['en']} AS hen, {hits['de']} AS hde,
             {hits['fr']} AS hfr, {hits['es']} AS hes FROM x)
SELECT doc_id,
       CASE WHEN hen >= hde AND hen >= hfr AND hen >= hes THEN 'en'
            WHEN hde >= hfr AND hde >= hes THEN 'de'
            WHEN hfr >= hes THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM h
"""


# ------------------------------- 11b. training-data pipeline composites
# date_histogram over the event stream and the composed clean-corpus pass
# (quality gate -> exact-dedup keep-canonical) a 100 TB training pipeline
# runs before tokenization.

CLEAN_MIN_QUALITY, CLEAN_MIN_TOK = 0.5, 20


def q_events_date_histogram(spark, sf_dir):
    e = _tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").cast("string")
            .alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
        )
    )


SQL_EVENTS_DATE_HIST = """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value_r
FROM events
GROUP BY day, event_type
"""


CAL_INTERVALS = ("week", "month", "quarter")


def q_events_date_histogram_month(spark, sf_dir):
    """ES calendar_interval date_histogram (VERDICT r3 gap): calendar
    units are not fixed-width, so they cannot be expressed by the numeric
    histogram — date_trunc buckets per unit, one unioned plan (weeks
    start Monday in both Spark and DuckDB date_trunc)."""
    e = _tbl(spark, sf_dir, "events")
    parts = [
        e.groupBy(
            F.lit(kind).alias("cal"),
            search.calendar_bucket(F.col("ts"), kind).alias("bucket"),
            "event_type",
        ).agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r"),
        )
        for kind in CAL_INTERVALS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


SQL_EVENTS_DATE_HIST_CAL = "\nUNION ALL\n".join(
    f"""SELECT '{kind}' AS cal,
       CAST(CAST(date_trunc('{kind}', ts) AS DATE) AS VARCHAR) AS bucket,
       event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value_r
FROM events GROUP BY bucket, event_type"""
    for kind in CAL_INTERVALS
)


def q_documents_clean(spark, sf_dir):
    d = _docs(spark, sf_dir)
    x = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        T.n_tokens("text").alias("n_tok"),
        F.round(T.quality_score("text"), 6).alias("quality_r"),
        T.fingerprint_md5("text").alias("fp"),
    ).filter(
        (F.col("quality_r") >= CLEAN_MIN_QUALITY)
        & (F.col("n_tok") >= CLEAN_MIN_TOK)
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        x.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "fp", "n_tok", "quality_r")
    )


def _sql_documents_clean() -> str:
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, {DOC_TOKS} AS toks
  FROM documents
),
m AS (
  SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp,
         CAST(len(toks) AS BIGINT) AS n_tok,
         len(regexp_extract_all(text, '{T.PUNCT_RE}'))
           / greatest(length(text), 1) AS punct,
         len(list_filter(toks,
             t -> t IN ({", ".join(f"'{w}'" for w in T.STOPWORDS)})))
           / greatest(len(toks), 1) AS stop
  FROM x
),
q AS (
  SELECT doc_id, fp, n_tok,
         round(least(n_tok / 100.0, 1.0) * 0.4
               + (1.0 - least(punct * 4.0, 1.0)) * 0.3
               + least(stop * 5.0, 1.0) * 0.3, 6) AS quality_r
  FROM m
),
f AS (
  SELECT * FROM q
  WHERE quality_r >= {CLEAN_MIN_QUALITY} AND n_tok >= {CLEAN_MIN_TOK}
)
SELECT doc_id, fp, n_tok, quality_r
FROM (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM f
)
WHERE rn = 1
"""


# --------------------------------------- 11c. bigram-LM perplexity filter

LM_K = 0.5


def q_text_perplexity(spark, sf_dir):
    from ..operators import lm

    return lm.bigram_perplexity(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text", k_smooth=LM_K
    )


def q_text_perplexity_indexed(spark, sf_dir):
    """Perplexity with the LM read from the store's index-time lm_stats
    table — the oracle recomputes the model from the corpus, so a green
    row PROVES the materialized gram counts equal the corpus-derived ones
    at the driver's SF."""
    from ..operators import lm

    store = _corpus_store(spark, sf_dir)
    return lm.bigram_perplexity_from_stats(
        spark, store.path, _docs(spark, sf_dir),
        id_col="doc_id", text_col="text", k_smooth=LM_K,
    )


def _sql_text_perplexity() -> str:
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(2, len(toks) + 1),
                                    i -> toks[i - 1] || ' ' || toks[i])
                ELSE [] END) AS b
  FROM x
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(toks) AS w FROM x)
  GROUP BY w
),
v AS (SELECT count(*) AS v FROM uni),
bic AS (SELECT b, count(*) AS c12 FROM bg GROUP BY b),
scored AS (
  SELECT bg.doc_id AS doc_id,
         -log2((bic.c12 + {LM_K}) / (uni.c1 + {LM_K} * v.v)) AS nll
  FROM bg
  JOIN bic ON bic.b = bg.b
  JOIN uni ON uni.w = split_part(bg.b, ' ', 1)
  CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nll), 6) AS nll_r
FROM scored
GROUP BY doc_id
"""


# ----------------------------- 11d. interpolated trigram-LM perplexity

LM_LAMBDAS = (0.2, 0.3, 0.5)


def q_text_perplexity_trigram(spark, sf_dir):
    from ..operators import lm

    return lm.trigram_perplexity(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        k_smooth=LM_K, lambdas=LM_LAMBDAS,
    )


def _sql_text_perplexity_trigram() -> str:
    l1, l2, l3 = LM_LAMBDAS
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
tg AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(3, len(toks) + 1),
                     i -> toks[i - 2] || ' ' || toks[i - 1] || ' ' || toks[i])
                ELSE [] END) AS g
  FROM x
),
bg AS (
  SELECT unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(2, len(toks) + 1),
                                    i -> toks[i - 1] || ' ' || toks[i])
                ELSE [] END) AS b
  FROM x
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(toks) AS w FROM x)
  GROUP BY w
),
tv AS (SELECT count(*) AS v, sum(c1) AS t FROM uni),
bic AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
tric AS (SELECT g, count(*) AS c123 FROM tg GROUP BY g),
scored AS (
  SELECT tg.doc_id AS doc_id,
         {l1} * (u3.c1 + {LM_K}) / (tv.t + {LM_K} * tv.v)
       + {l2} * (b23.cb + {LM_K}) / (u2.c1 + {LM_K} * tv.v)
       + {l3} * (tric.c123 + {LM_K}) / (b12.cb + {LM_K} * tv.v) AS p
  FROM tg
  JOIN tric ON tric.g = tg.g
  JOIN bic b12
    ON b12.b = split_part(tg.g, ' ', 1) || ' ' || split_part(tg.g, ' ', 2)
  JOIN bic b23
    ON b23.b = split_part(tg.g, ' ', 2) || ' ' || split_part(tg.g, ' ', 3)
  JOIN uni u2 ON u2.w = split_part(tg.g, ' ', 2)
  JOIN uni u3 ON u3.w = split_part(tg.g, ' ', 3)
  CROSS JOIN tv
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(-log2(p)), 6) AS nll_r
FROM scored
GROUP BY doc_id
"""


# ------------------------------- 11e. training-window chunking

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def q_corpus_chunk_windows(spark, sf_dir):
    from ..operators import chunking

    return chunking.chunk_windows(
        _docs(spark, sf_dir), window=CHUNK_WINDOW, stride=CHUNK_STRIDE,
        text_col="text", id_col="doc_id",
    )


def _sql_chunk_windows() -> str:
    return f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents
),
n AS (
  SELECT doc_id, toks, len(toks) AS n FROM x WHERE len(toks) > 0
),
s AS (
  SELECT doc_id, toks, n,
         unnest(range(0, n, {CHUNK_STRIDE})) AS start
  FROM n
)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS win_id,
       CAST(start AS BIGINT) AS start,
       CAST(least({CHUNK_WINDOW}, n - start) AS BIGINT) AS n_win_tokens,
       toks[start + 1] AS first_tok
FROM s
"""


# ----------------------------- 11f. BPE tokenizer-training pair counts

BPE_MIN_COUNT = 3


BPE_ENC_MERGES = 24


def q_corpus_bpe_fertility(spark, sf_dir):
    """Train a small BPE on the corpus, then APPLY it: per-lang token
    budget + fertility under the learned tokenizer. Non-SQL-expressible
    (the greedy merge application has no DuckDB twin) — rows-only gate;
    equality with the sequential reference encoder is pytest-proven
    (tests/test_bpe.py::test_encode_fertility_matches_reference)."""
    from ..operators import bpe

    docs = _docs(spark, sf_dir)
    merges = bpe.bpe_learn_merges(
        docs, BPE_ENC_MERGES, text_col="text", min_count=2
    )
    return bpe.bpe_encode_tokens(
        docs, merges, text_col="text", group_cols=("lang",)
    ).orderBy("lang")


def q_bpe_pair_counts(spark, sf_dir):
    from ..operators import bpe

    return bpe.bpe_pair_counts(
        _docs(spark, sf_dir), text_col="text", min_count=BPE_MIN_COUNT
    )


def _sql_bpe_pair_counts() -> str:
    return f"""
WITH x AS (SELECT {DOC_TOKS} AS toks FROM documents),
wc AS (
  SELECT w, count(*) AS n
  FROM (SELECT unnest(toks) AS w FROM x)
  GROUP BY w
),
p AS (
  SELECT unnest(CASE WHEN length(w) >= 2 THEN
           list_transform(range(1, length(w)),
             i -> substring(w, i, 1) || ' ' || substring(w, i + 1, 1))
         ELSE [] END) AS pair,
         n
  FROM wc
)
SELECT pair, CAST(sum(n) AS BIGINT) AS n_pairs
FROM p GROUP BY pair
HAVING sum(n) >= {BPE_MIN_COUNT}
"""


# ------------------------------------------------------ 12. fingerprints

def q_doc_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(T.n_tokens("text") > 0)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        T.fingerprint_md5("text").alias("fp_md5"),
        T.fingerprint_rolling("text").alias("fp_roll"),
    )


SQL_FINGERPRINT = f"""
WITH x AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks FROM documents
),
v AS (
  SELECT doc_id, toks,
         list_transform(toks,
           t -> (CAST(length(t) AS BIGINT) * 31 + ascii(t)) % {T.ROLL_P1})
           AS vals
  FROM x WHERE len(toks) > 0
)
SELECT doc_id,
       md5(array_to_string(toks, ' ')) AS fp_md5,
       CAST(list_reduce(vals, (a, b) -> (a * {T.ROLL_MULT} + b) % {T.ROLL_P2})
            AS BIGINT) AS fp_roll
FROM v
"""

# ------------------------------------------------ 12b. multimodal metadata
# SURVEY §2 "multimodal columns": opaque binary payload → typed metadata via
# Arrow binary-column plumbing (operators/multimodal.binary_metadata). The
# payload here is the document's UTF-8 bytes (the driver tables carry no
# media blobs), making the full binary path DuckDB-verifiable; real
# deployments point the same operator at image/audio blobs.

def q_multimodal_meta(spark, sf_dir):
    from ..operators import multimodal

    d = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return multimodal.binary_metadata(d, "doc_id", "payload")


SQL_MULTIMODAL_META = """
SELECT CAST(doc_id AS VARCHAR) AS id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha_hex,
       lower(substr(hex(encode(text)), 1, 32)) AS head_hex
FROM documents
"""

# -------------------------------------------- 13-15. event pipeline (CDC analog)
# SURVEY §2.1 #13 action dispatch, #11 version LWW, plus sessionization.

def q_events_dispatch(spark, sf_dir):
    e = _tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "error", "delete")
        .when(
            F.col("event_type").isin("signup", "click", "view", "purchase"),
            "index",
        )
        .otherwise("unknown")
        .alias("action"),
    )


SQL_EVENTS_DISPATCH = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'delete'
            WHEN event_type IN ('signup', 'click', 'view', 'purchase')
              THEN 'index'
            ELSE 'unknown' END AS action
FROM events
"""


def q_events_lww(spark, sf_dir):
    e = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_type"))
    )
    counts = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    return last.join(counts, "user_id")


SQL_EVENTS_LWW = """
WITH last AS (
  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY user_id)
SELECT l.user_id AS user_id, l.last_event_id, l.last_type, c.n_events
FROM last l JOIN counts c ON c.user_id = l.user_id
WHERE l.rn = 1
"""


SESSION_GAP_SEC = 1800


def q_events_sessions(spark, sf_dir):
    e = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = e.withColumn("_prev", F.lag("ts").over(w)).withColumn(
        "_new",
        F.when(
            F.col("_prev").isNull()
            # timestampdiff works for TIMESTAMP_NTZ (the driver parquet's
            # physical type); exact micros matches DuckDB's epoch_us diff
            | (
                F.expr("timestampdiff(MICROSECOND, _prev, ts)")
                > SESSION_GAP_SEC * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    return gapped.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("_new").alias("n_sessions"),
    )


SQL_EVENTS_SESSIONS = f"""
WITH x AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev)
                          > {SESSION_GAP_SEC} * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id
"""

# ------------------------------------------------- 16-18. generic OLAP ops

def q_tpch_q1(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty_r"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price_r"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax"))),
            2,
        ).alias("sum_charge_r"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc_r"),
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty_r,
       round(sum(l_extendedprice), 2) AS sum_price_r,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge_r,
       round(avg(l_discount), 6) AS avg_disc_r
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_topk_orders(spark, sf_dir):
    o = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


SQL_TPCH_TOPK = """
SELECT o_orderpriority,
       CAST(row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey ASC)
            AS INTEGER) AS rn,
       o_orderkey, o_totalprice
FROM orders QUALIFY rn <= 3
"""


def q_tpch_revenue_nation(spark, sf_dir):
    c = _tbl(spark, sf_dir, "customer")
    n = _tbl(spark, sf_dir, "nation")
    o = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue_r"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


SQL_TPCH_REVENUE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue_r,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

# ------------------------------------------- 4z. metric / pipeline aggs
# The remaining first-class ES aggregation families over the match set
# (extended_stats, string_stats, weighted_avg, rare_terms, multi_terms,
# top_metrics, the pipeline aggs, adjacency_matrix, sampler). Every one
# is a single _match_set job + one metadata join + hash/window aggs —
# the doc fields they bucket on ride the store's doc markers via
# build_index(doc_meta_cols=...) (plans/build.py), never a corpus scan.

RARE_TERMS_MAX = 3
BUCKET_SORT_SIZE = 3
TOP_METRICS_SIZE = 3
SAMPLER_SHARD = 10
ADJ_FILTERS = {"cust": "customer", "fast": "fast", "mw": "merge window"}


def _doc_join_sql(queries) -> str:
    """Shared oracle prefix: BM25 body + OR match set + documents join."""
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
md AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id, dl.dl AS dl,
         doc.lang AS lang, doc.source AS source, doc.n_chars AS n_chars
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
)"""


def q_fts_extended_stats(spark, sf_dir):
    """ES extended_stats: stats + sum_of_squares + population variance."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_extended_stats_agg(spark, store, qpdf, value_col="dl")
    return res.select(
        "qid", "n_docs",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("avg_v", 6).alias("avg_v"),
        F.round("sum_sq", 6).alias("sum_sq"),
        "variance_r", "std_dev_r",
    )


def _extended_stats_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(dl) AS DOUBLE), 6) AS sum_v,
       round(avg(dl), 6) AS avg_v,
       round(CAST(sum(dl * dl) AS DOUBLE), 6) AS sum_sq,
       round(var_pop(dl), 6) AS variance_r,
       round(stddev_pop(dl), 6) AS std_dev_r
FROM md GROUP BY qid
"""


def q_fts_string_stats(spark, sf_dir):
    """ES string_stats over the source keyword field: length statistics."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_string_stats_agg(
        spark, store, qpdf, value_col="source"
    )


def _string_stats_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(length(source)) AS BIGINT) AS min_len,
       CAST(max(length(source)) AS BIGINT) AS max_len,
       round(avg(length(source)), 6) AS avg_len_r
FROM md GROUP BY qid
"""


def q_fts_weighted_avg(spark, sf_dir):
    """ES weighted_avg: dl weighted by the doc's n_chars field."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_weighted_avg_agg(
        spark, store, qpdf, value_col="dl", weight_col="n_chars"
    )


def _weighted_avg_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(CAST(dl AS DOUBLE) * n_chars) / sum(CAST(n_chars AS DOUBLE)),
             6) AS weighted_avg_r
FROM md GROUP BY qid
"""


def q_fts_rare_terms(spark, sf_dir):
    """ES rare_terms: long-tail buckets (≤ max_doc_count docs) of the
    high-cardinality n_chars keyword — low-cardinality fields would give
    no buckets under the cap (all-common) and an empty-vs-empty gate."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_rare_terms_agg(
        spark, store, qpdf, group_col="n_chars", max_doc_count=RARE_TERMS_MAX
    )


def _rare_terms_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid, CAST(n_chars AS VARCHAR) AS "group",
       CAST(count(*) AS BIGINT) AS n_docs
FROM md GROUP BY qid, n_chars
HAVING count(*) <= {RARE_TERMS_MAX}
"""


def q_fts_multi_terms(spark, sf_dir):
    """ES multi_terms: buckets keyed by the (lang, source) composite."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_multi_terms_agg(
        spark, store, qpdf, group_cols=("lang", "source"), value_col="dl"
    )


def _multi_terms_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid, lang AS g0, source AS g1,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(dl AS DOUBLE)), 6) AS avg_value_r
FROM md GROUP BY qid, lang, source
"""


def q_fts_top_metrics(spark, sf_dir):
    """ES top_metrics: n_chars at the top-dl docs of the match set."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_top_metrics_agg(
        spark, store, qpdf, sort_col="dl", metric_col="n_chars",
        size=TOP_METRICS_SIZE,
    )


def _top_metrics_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         CAST(dl AS DOUBLE) AS sort_v, CAST(n_chars AS DOUBLE) AS metric_v,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY dl DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM md
)
SELECT qid, rank, doc_id, sort_v, metric_v
FROM ranked WHERE rank <= {TOP_METRICS_SIZE}
"""


def q_fts_histogram_pipeline(spark, sf_dir):
    """ES pipeline aggs (cumulative_sum + derivative) over the histogram."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_histogram_pipeline(
        spark, store, qpdf, interval=HIST_INTERVAL, value_col="dl"
    )


def _histogram_pipeline_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, bucket, n_docs,
       CAST(sum(n_docs) OVER (
         PARTITION BY qid ORDER BY bucket ASC
         ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_docs,
       CAST(n_docs - lag(n_docs) OVER (
         PARTITION BY qid ORDER BY bucket ASC
       ) AS BIGINT) AS deriv
FROM base
"""


def q_fts_stats_bucket(spark, sf_dir):
    """ES stats_bucket sibling pipeline agg over histogram doc counts."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_stats_bucket(
        spark, store, qpdf, interval=HIST_INTERVAL, value_col="dl"
    )


def _stats_bucket_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
         count(*) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(n_docs) AS BIGINT) AS min_bucket,
       CAST(max(n_docs) AS BIGINT) AS max_bucket,
       round(avg(CAST(n_docs AS DOUBLE)), 6) AS avg_bucket_r,
       CAST(sum(n_docs) AS BIGINT) AS sum_bucket
FROM base GROUP BY qid
"""


def q_fts_bucket_sort(spark, sf_dir):
    """ES bucket_sort: lang buckets re-ordered by count, truncated."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_bucket_sort(
        spark, store, qpdf, group_col="lang", size=BUCKET_SORT_SIZE
    )


def _bucket_sort_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
counts AS (
  SELECT CAST(qid AS BIGINT) AS qid, lang AS grp,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, lang
),
ranked AS (
  SELECT qid, grp, n_docs,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY n_docs DESC, grp ASC
         ) AS INTEGER) AS rank
  FROM counts
)
SELECT qid, rank, grp AS "group", n_docs
FROM ranked WHERE rank <= {BUCKET_SORT_SIZE}
"""


def q_fts_adjacency_matrix(spark, sf_dir):
    """ES adjacency_matrix: filter + pairwise-intersection doc counts."""
    store = _corpus_store(spark, sf_dir)
    return search.search_adjacency_matrix(spark, store, ADJ_FILTERS)


def _adjacency_matrix_sql(filters: dict) -> str:
    names = sorted(filters)
    fvals, needs, nvals = [], [], []
    for i, name in enumerate(names):
        toks = analysis.tokenize_series(pd.Series([filters[name]]))[0]
        needs.append(f"({i}, {len(set(toks))})")
        nvals.append(f"({i}, '{name}')")
        for t in sorted(set(toks)):
            fvals.append(f"({i}, '{t}')")
    return f"""{_BM25_BODY},
fv(i, term) AS (VALUES {", ".join(fvals)}),
fneed(i, need) AS (VALUES {", ".join(needs)}),
names(i, name) AS (VALUES {", ".join(nvals)}),
fset AS (
  SELECT fv.i AS i, p.doc_id AS doc_id
  FROM fv JOIN posting p ON p.term = fv.term
  GROUP BY fv.i, p.doc_id
  HAVING count(DISTINCT fv.term)
         = (SELECT need FROM fneed WHERE fneed.i = fv.i)
),
pairs AS (
  SELECT a.i AS ia, b.i AS ib, count(*) AS n
  FROM fset a JOIN fset b ON a.doc_id = b.doc_id
  WHERE a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT CASE WHEN na.name = nb.name THEN na.name
            ELSE concat(na.name, '&', nb.name) END AS bucket,
       CAST(n AS BIGINT) AS n_docs
FROM pairs
JOIN names na ON na.i = pairs.ia
JOIN names nb ON nb.i = pairs.ib
"""


def q_fts_sampler_terms(spark, sf_dir):
    """ES sampler agg: lang buckets over the top-scoring sample only."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_sampler_terms(
        spark, store, qpdf, shard_size=SAMPLER_SHARD, group_col="lang"
    )


def _sampler_terms_sql(queries, shard_size: int) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5)) * ({K1} + 1.0)
             * p.tf / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS rn
  FROM scored
)
SELECT CAST(r.qid AS BIGINT) AS qid, doc.lang AS "group",
       CAST(count(*) AS BIGINT) AS n_docs
FROM ranked r
JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = r.doc_id
WHERE r.rn <= {shard_size}
GROUP BY r.qid, doc.lang
"""


# --------------------------------- 4z2. pipeline-agg family II + doc APIs

PIPE_INTERVAL = 8.0
MOVING_WINDOW = 2
SERIAL_LAG = 1
PB_PERCENTS = (50.0, 95.0)
BUCKET_SCRIPT = "sum_v / n_docs"
BUCKET_SELECTOR = "n_docs > 100"
TV_DOC_IDS = ["1", "2", "42"]
MGET_IDS = ["1", "7", "nope-absent"]
ANALYZE_TEXTS = [
    (0, "Hello, World! FooBar 42 foo"),
    (1, "spark merge window  join"),
]


def q_fts_moving_fn(spark, sf_dir):
    """ES moving_fn: windowed avg of histogram bucket counts (shift=0:
    the window is the 2 buckets before each, excluding the current)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_moving_fn(
        spark, store, qpdf, interval=PIPE_INTERVAL, window=MOVING_WINDOW,
        fn="avg", value_col="dl",
    )


def _moving_fn_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, bucket, n_docs,
       round(avg(CAST(n_docs AS DOUBLE)) OVER (
         PARTITION BY qid ORDER BY bucket ASC
         ROWS BETWEEN {MOVING_WINDOW} PRECEDING AND 1 PRECEDING
       ), 6) AS moving_v
FROM base
"""


def q_fts_serial_diff(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_serial_diff(
        spark, store, qpdf, interval=PIPE_INTERVAL, lag=SERIAL_LAG,
        value_col="dl",
    )


def _serial_diff_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, bucket, n_docs,
       CAST(n_docs - lag(n_docs, {SERIAL_LAG}) OVER (
         PARTITION BY qid ORDER BY bucket ASC
       ) AS BIGINT) AS diff_v
FROM base
"""


def q_fts_derivative(spark, sf_dir):
    """ES derivative: first difference of histogram bucket counts plus
    the unit-normalized value (delta per one interval of x-distance)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_derivative(
        spark, store, qpdf, interval=PIPE_INTERVAL, value_col="dl"
    )


def _derivative_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, bucket, n_docs,
       CAST(n_docs - lag(n_docs, 1) OVER w AS BIGINT) AS deriv_v,
       round(CAST(n_docs - lag(n_docs, 1) OVER w AS DOUBLE)
             / ((bucket - lag(bucket, 1) OVER w) / {PIPE_INTERVAL}), 6)
         AS deriv_rate_r
FROM base
WINDOW w AS (PARTITION BY qid ORDER BY bucket ASC)
"""


def q_fts_cumulative_sum(spark, sf_dir):
    """ES cumulative_sum: running total of histogram bucket counts."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_cumulative_sum(
        spark, store, qpdf, interval=PIPE_INTERVAL, value_col="dl"
    )


def _cumulative_sum_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
)
SELECT qid, bucket, n_docs,
       CAST(sum(n_docs) OVER (
         PARTITION BY qid ORDER BY bucket ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_docs
FROM base
"""


def q_fts_cumulative_cardinality(spark, sf_dir):
    """ES cumulative_cardinality ("new users per bucket", here distinct
    sources): each group value counts once at its FIRST bucket, then a
    cumulative sum — never a windowed COUNT(DISTINCT)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_cumulative_cardinality(
        spark, store, qpdf, interval=PIPE_INTERVAL, group_col="source",
        value_col="dl",
    )


def _cumulative_cardinality_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
b AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         source AS g
  FROM md
),
base AS (
  SELECT qid, bucket, CAST(count(*) AS BIGINT) AS n_docs
  FROM b GROUP BY qid, bucket
),
firsts AS (
  SELECT qid, min(bucket) AS bucket FROM b GROUP BY qid, g
),
news AS (
  SELECT qid, bucket, count(*) AS n_new FROM firsts GROUP BY qid, bucket
)
SELECT base.qid AS qid, base.bucket AS bucket, base.n_docs AS n_docs,
       CAST(sum(coalesce(news.n_new, 0)) OVER (
         PARTITION BY base.qid ORDER BY base.bucket ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_card
FROM base LEFT JOIN news
  ON news.qid = base.qid AND news.bucket = base.bucket
"""


def q_events_rate_week(spark, sf_dir):
    """ES rate agg in a calendar date_histogram: docs per day within
    each week bucket (the driver events span one month, so weeks give
    a real bucket axis; month/quarter normalize by true calendar
    length through the same operator)."""
    return search.date_rate(
        _tbl(spark, sf_dir, "events"), "ts", "week"
    )


SQL_EVENTS_RATE_WEEK = """
WITH g AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS b,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM events GROUP BY b
)
SELECT CAST(0 AS BIGINT) AS qid,
       CAST(b AS VARCHAR) AS bucket,
       n_docs,
       round(CAST(n_docs AS DOUBLE) / 7, 6) AS rate_per_day_r
FROM g
"""


def q_fts_percentiles_bucket(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_percentiles_bucket(
        spark, store, qpdf, interval=PIPE_INTERVAL, percents=PB_PERCENTS,
        value_col="dl",
    )


def _percentiles_bucket_sql(queries) -> str:
    pvals = ", ".join(f"({p})" for p in sorted(PB_PERCENTS))
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {PIPE_INTERVAL}) * {PIPE_INTERVAL} AS bucket,
         count(*) AS n_docs
  FROM md GROUP BY qid, bucket
),
ranked AS (
  SELECT qid, n_docs,
         row_number() OVER (
           PARTITION BY qid ORDER BY n_docs ASC, bucket ASC
         ) AS rn,
         count(*) OVER (PARTITION BY qid) AS n
  FROM base
),
pc(percent) AS (VALUES {pvals})
SELECT ranked.qid AS qid, CAST(pc.percent AS DOUBLE) AS percent,
       CAST(ranked.n_docs AS BIGINT) AS value
FROM ranked CROSS JOIN pc
WHERE ranked.rn = greatest(1, CAST(ceil(pc.percent / 100.0 * ranked.n)
                                   AS INTEGER))
"""


def q_fts_bucket_script(spark, sf_dir):
    """ES bucket_script: per-lang bucket metric from a whitelisted
    expression over sibling metrics (here sum_v/n_docs ≡ the mean)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_bucket_script(
        spark, store, qpdf, BUCKET_SCRIPT, group_col="lang", value_col="dl"
    )


def _bucket_script_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid, lang AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(dl) AS DOUBLE), 6) AS sum_v,
       round(avg(dl), 6) AS avg_v,
       round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS script_v
FROM md GROUP BY qid, lang
"""


def q_fts_bucket_selector(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_bucket_selector(
        spark, store, qpdf, BUCKET_SELECTOR, group_col="lang",
        value_col="dl",
    )


def _bucket_selector_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid, lang AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(dl) AS DOUBLE), 6) AS sum_v,
       round(avg(dl), 6) AS avg_v
FROM md GROUP BY qid, lang
HAVING count(*) > 100
"""


def q_fts_termvectors(spark, sf_dir):
    """ES _termvectors: per-(doc, term) tf + df straight from the index
    (segment-targeted block decode, no document re-analysis)."""
    store = _corpus_store(spark, sf_dir)
    return search.termvectors(spark, store, TV_DOC_IDS)


def _termvectors_sql() -> str:
    vals = ", ".join(f"('{d}')" for d in TV_DOC_IDS)
    return f"""{_BM25_BODY},
v(doc_id) AS (VALUES {vals})
SELECT p.doc_id AS doc_id, p.term AS term,
       CAST(p.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df
FROM v
JOIN posting p ON p.doc_id = v.doc_id
JOIN dfreq d ON d.term = p.term
"""


def q_fts_analyze(spark, sf_dir):
    """ES _analyze: the engine tokenizer over ad-hoc texts, positioned."""
    tpdf = pd.DataFrame(ANALYZE_TEXTS, columns=["qid", "text"])
    return search.analyze_texts(spark, tpdf)


def _analyze_sql() -> str:
    vals = ", ".join(f"({q}, '{t}')" for q, t in ANALYZE_TEXTS)
    toks = analysis.duckdb_tokens_sql("text")
    return f"""
WITH v(qid, text) AS (VALUES {vals})
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(unnest(range(len({toks}))) AS INTEGER) AS pos,
       unnest({toks}) AS token
FROM v
"""


def q_fts_mget(spark, sf_dir):
    """ES _mget: found flag + stored fields per requested id; absent ids
    report found=false with null fields."""
    store = _corpus_store(spark, sf_dir)
    return search.mget(
        spark, store, MGET_IDS, cols=("dl", "lang", "source")
    )


def _mget_sql() -> str:
    vals = ", ".join(f"('{d}')" for d in MGET_IDS)
    return f"""{_BM25_BODY},
v(doc_id) AS (VALUES {vals})
SELECT v.doc_id AS doc_id, dl.doc_id IS NOT NULL AS found,
       CAST(dl.dl AS BIGINT) AS dl, doc.lang AS lang, doc.source AS source
FROM v
LEFT JOIN dl ON dl.doc_id = v.doc_id
LEFT JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = v.doc_id
"""


# ------------------------------- 4z3. geo / global / dense-bucket / misc

GEO_ORIGIN = (10.25, 20.5)
GEO_DIST_KM = 5000.0
GEO_K = 10
GEO_BOX = (-45.0, -90.0, 45.0, 90.0)  # south, west, north, east
DENSE_BOUNDS = (0.0, 640.0)

# the oracle-side derivations of the synthetic doc fields in _corpus_store
_SQL_LAT = "((doc.doc_id % 180) - 90 + 0.25)"
_SQL_LON = "(((doc.doc_id * 7) % 360) - 180 + 0.5)"
_SQL_OPT_TAG = "CASE WHEN doc.doc_id % 3 = 0 THEN doc.source END"


def _sql_haversine(olat: float, olon: float) -> str:
    lat2, lon2 = _SQL_LAT, _SQL_LON
    return (
        f"2.0 * 6371.0088 * asin(sqrt("
        f"pow(sin(radians({lat2} - ({olat})) / 2), 2) + "
        f"cos(radians({olat})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - ({olon})) / 2), 2)))"
    )


def q_fts_geo_distance(spark, sf_dir):
    """ES geo_distance query + distance sort over doc_meta_cols points."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_distance(
        spark, store, qpdf, origin=GEO_ORIGIN, distance_km=GEO_DIST_KM,
        k=GEO_K,
    )


def _geo_distance_sql(queries) -> str:
    olat, olon = GEO_ORIGIN
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
geo AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id,
         round({_sql_haversine(olat, olon)}, 6) AS dist_km_r
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, dist_km_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY dist_km_r ASC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM geo WHERE dist_km_r <= {GEO_DIST_KM}
)
SELECT qid, rank, doc_id, dist_km_r FROM ranked WHERE rank <= {GEO_K}
"""


def q_fts_geo_bbox(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_bounding_box(spark, store, qpdf, box=GEO_BOX)


def _geo_bbox_sql(queries) -> str:
    s, w, n, e = GEO_BOX
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid, m.doc_id AS doc_id
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
WHERE {_SQL_LAT} BETWEEN {s} AND {n}
  AND {_SQL_LON} BETWEEN {w} AND {e}
"""


def q_fts_global_agg(spark, sf_dir):
    """ES global bucket: match-set avg dl next to the whole-index avg."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_global_agg(spark, store, qpdf, value_col="dl")


def _global_agg_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
g AS (SELECT count(*) AS gd, round(avg(dl), 6) AS ga FROM dl)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(md.dl AS DOUBLE)), 6) AS avg_v_r,
       CAST(g.gd AS BIGINT) AS global_docs,
       g.ga AS global_avg_r
FROM md CROSS JOIN g GROUP BY qid, g.gd, g.ga
"""


def q_fts_missing_value_count(spark, sf_dir):
    """ES missing + value_count aggs over the sometimes-null opt_tag."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_missing_agg(spark, store, qpdf, check_col="opt_tag")


def _missing_value_count_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN {_SQL_OPT_TAG} IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS value_count,
       CAST(sum(CASE WHEN {_SQL_OPT_TAG} IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
GROUP BY m.qid
"""


def q_fts_histogram_dense(spark, sf_dir):
    """ES histogram with min_doc_count=0 + extended_bounds: zero-filled
    buckets across the whole axis."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_histogram_dense(
        spark, store, qpdf, interval=HIST_INTERVAL, bounds=DENSE_BOUNDS,
        value_col="dl",
    )


def _histogram_dense_sql(queries) -> str:
    lo, hi = DENSE_BOUNDS
    n_axis = int((hi - lo) / HIST_INTERVAL)
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM md GROUP BY qid, bucket
),
axis AS (
  SELECT DISTINCT base.qid AS qid,
         {lo} + g.range * {HIST_INTERVAL} AS bucket
  FROM base CROSS JOIN range(0, {n_axis + 1}) g
),
allb AS (
  SELECT qid, bucket FROM axis
  UNION
  SELECT qid, bucket FROM base
)
SELECT a.qid AS qid, a.bucket AS bucket,
       CAST(COALESCE(b.n_docs, 0) AS BIGINT) AS n_docs
FROM allb a
LEFT JOIN base b ON b.qid = a.qid AND b.bucket = a.bucket
"""


# ----------------------------- pipeline: embedding decontam, token budget

EMB_EVAL_MAX_ID = 5
EMB_TAU = 0.25


def q_decontam_embedding(spark, sf_dir):
    """Semantic decontamination: corpus vectors' max cosine against the
    (broadcast) eval set, flagged at tau."""
    emb = _tbl(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= EMB_EVAL_MAX_ID)
    ev = emb.filter(F.col("vec_id") < EMB_EVAL_MAX_ID)
    return decontam.embedding_contamination(corpus, ev, tau=EMB_TAU)


def _decontam_embedding_sql() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
ev AS (SELECT v FROM e WHERE vec_id < {EMB_EVAL_MAX_ID}),
c AS (SELECT vec_id, v FROM e WHERE vec_id >= {EMB_EVAL_MAX_ID}),
pairs AS (
  SELECT c.vec_id AS vec_id,
         list_dot_product(c.v, ev.v)
         / (sqrt(list_dot_product(c.v, c.v))
            * sqrt(list_dot_product(ev.v, ev.v))) AS cos
  FROM c CROSS JOIN ev
)
SELECT vec_id, round(max(cos), 6) AS max_cos_r,
       round(max(cos), 6) >= {EMB_TAU} AS contaminated
FROM pairs GROUP BY vec_id
"""


def q_corpus_token_budget(spark, sf_dir):
    """Data-mixing budget: per (lang, source) doc and token counts plus
    each cell's share of the total token budget — the bookkeeping a
    mixture-weighted training-data pipeline runs before sampling. Pure
    built-in aggregation over the documents table (tokens via the
    pinned analyzer's Spark-SQL form), one shuffle."""
    docs = _docs(spark, sf_dir)
    cells = (
        docs.select("lang", "source", T.n_tokens("text").alias("_t"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("tokens"),
        )
    )
    total = Window.partitionBy()
    return cells.select(
        "lang", "source", "n_docs",
        F.col("tokens").cast("long").alias("tokens"),
        F.round(
            F.col("tokens") / F.sum("tokens").over(total), 6
        ).alias("share_r"),
    )


def _corpus_token_budget_sql() -> str:
    return f"""
WITH cells AS (
  SELECT lang, source, count(*) AS n_docs,
         sum(len({DOC_TOKS})) AS tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(tokens AS BIGINT) AS tokens,
       round(CAST(tokens AS DOUBLE) / sum(tokens) OVER (), 6) AS share_r
FROM cells
"""


# --------------------------------- 4z4. filtered kNN / diversified / geo aggs

KNN_K = 5
DIV_SHARD, DIV_MAX_PER = 6, 2
GEO_RINGS = [(0.0, 3000.0), (3000.0, 8000.0), (8000.0, 15000.0)]
GEOTILE_ZOOM = 6


def _corpus_store_knn(spark: SparkSession, sf_dir: str) -> search.IndexStore:
    """Index over the docs that HAVE embeddings (documents ⋈ embeddings
    on doc_id = vec_id), the vector riding the markers as a
    doc_meta_cols array — ES 8's dense_vector field on an ordinary
    index."""
    (path,), fresh = _cached_store_paths(sf_dir, "knn1")
    if fresh:
        emb = _tbl(spark, sf_dir, "embeddings").select(
            F.col("vec_id"), F.col("embedding")
        )
        corpus = (
            _docs(spark, sf_dir)
            .join(emb, F.col("doc_id") == F.col("vec_id"))
            .select(
                F.col("doc_id").cast("string").alias("docid"),
                "lang",
                F.col("embedding"),
                F.col("text").alias("content"),
            )
        )
        cfg = IndexerConfig(index="docs", id_field="docid")
        build.build_index(
            corpus, cfg, path, num_buckets=32, resume=True,
            doc_meta_cols=("embedding",),
        )
    return search.load_store(path)


def q_fts_knn_filtered(spark, sf_dir):
    """ES filtered kNN: cosine top-k among docs matching the filter
    query; query vectors are embeddings 0 and 1 read from the table."""
    store = _corpus_store_knn(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    ev = (
        _tbl(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2)
        .collect()
    )
    qv = pd.DataFrame(
        {"qid": [r["vec_id"] for r in ev],
         "vec": [list(r["embedding"]) for r in ev]}
    )
    return search.search_knn(spark, store, qpdf, qv, k=KNN_K)


KNN_SIM_FLOOR = 0.31


def q_fts_knn_radius(spark, sf_dir):
    """ES knn similarity threshold (radius search): cosine floor drops
    distant candidates BEFORE the top-k cut."""
    store = _corpus_store_knn(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    ev = (
        _tbl(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 2)
        .collect()
    )
    qv = pd.DataFrame(
        {"qid": [r["vec_id"] for r in ev],
         "vec": [list(r["embedding"]) for r in ev]}
    )
    return search.search_knn(
        spark, store, qpdf, qv, k=KNN_K, similarity=KNN_SIM_FLOOR
    )


def _knn_sql(queries) -> str:
    return f"""
WITH corpus AS (
  SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents doc JOIN embeddings e ON doc.doc_id = e.vec_id
),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),{_match_m_cte(queries)},
vec AS (
  SELECT CAST(vec_id AS VARCHAR) AS doc_id, embedding::DOUBLE[] AS v
  FROM embeddings
),
qv AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < 2
),
scored AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id,
         round(list_dot_product(qv.v, vec.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(vec.v, vec.v))), 6) AS cos_r
  FROM m
  JOIN vec ON vec.doc_id = m.doc_id
  JOIN qv ON qv.qid = m.qid
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, cos_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY cos_r DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, cos_r FROM ranked WHERE rank <= {KNN_K}
"""


def _knn_radius_sql(queries) -> str:
    base = _knn_sql(queries)
    out = base.replace(
        "FROM scored\n)",
        f"FROM scored WHERE cos_r >= {KNN_SIM_FLOOR}\n)",
    )
    assert out != base
    return out


def q_fts_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: top-scoring sample with at most 2 docs
    per lang."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_diversified_sampler(
        spark, store, qpdf, shard_size=DIV_SHARD, group_col="lang",
        max_docs_per_value=DIV_MAX_PER,
    )


def _diversified_sampler_sql(queries) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
grouped AS (
  SELECT s.qid AS qid, s.doc_id AS doc_id, doc.lang AS "group", s.score_r,
         row_number() OVER (
           PARTITION BY s.qid, doc.lang
           ORDER BY s.score_r DESC, s.doc_id ASC
         ) AS gr
  FROM scored s
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = s.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, "group", score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY score_r DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM grouped WHERE gr <= {DIV_MAX_PER}
)
SELECT qid, rank, doc_id, "group", score_r
FROM ranked WHERE rank <= {DIV_SHARD}
"""


def q_fts_geo_distance_agg(spark, sf_dir):
    """ES geo_distance aggregation: ring buckets with zero rings kept."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_distance_agg(
        spark, store, qpdf, origin=GEO_ORIGIN, ranges=GEO_RINGS
    )


def _geo_distance_agg_sql(queries) -> str:
    olat, olon = GEO_ORIGIN
    rvals = ", ".join(
        f"('{f}-{t}', {f}, {t})" for f, t in GEO_RINGS
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
geo AS (
  SELECT m.qid AS qid, {_sql_haversine(olat, olon)} AS d
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
),
rings(ring, rfrom, rto) AS (VALUES {rvals}),
cnt AS (
  SELECT qid, ring, count(*) AS n
  FROM geo JOIN rings ON geo.d >= rings.rfrom AND geo.d < rings.rto
  GROUP BY qid, ring
),
base AS (SELECT DISTINCT geo.qid AS qid, rings.ring AS ring
         FROM geo CROSS JOIN rings)
SELECT CAST(base.qid AS BIGINT) AS qid, base.ring AS ring,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_docs
FROM base LEFT JOIN cnt ON cnt.qid = base.qid AND cnt.ring = base.ring
"""


def q_fts_geotile_grid(spark, sf_dir):
    """ES geotile_grid: true web-mercator z/x/y tile buckets."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geotile_grid(
        spark, store, qpdf, zoom=GEOTILE_ZOOM
    )


def _geotile_grid_sql(queries) -> str:
    # independently-written mercator tiling over the doc lat/lon
    n = 1 << GEOTILE_ZOOM
    mx = 85.0511287798066
    latc = f"least(greatest({_SQL_LAT}, {-mx}), {mx})"
    x = (f"least(greatest(CAST(floor(({_SQL_LON} + 180.0) / 360.0 "
         f"* {n}) AS BIGINT), 0), {n - 1})")
    y = (f"least(greatest(CAST(floor((1.0 - ln(tan(radians({latc})) "
         f"+ 1.0 / cos(radians({latc}))) / pi()) / 2.0 * {n}) "
         f"AS BIGINT), 0), {n - 1})")
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       '{GEOTILE_ZOOM}' || '/' || {x} || '/' || {y} AS key,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
GROUP BY m.qid, key
"""


GEOHEX_RES = 3


def q_fts_geohex_grid(spark, sf_dir):
    """Hex-grid aggregation (geohex_grid, pinned planar axial variant)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geohex_grid(
        spark, store, qpdf, resolution=GEOHEX_RES
    )


def _geohex_grid_sql(queries) -> str:
    # independently-written cube-rounding hex indexer (same published
    # algorithm, authored separately from the engine's Column chain)
    size = 60.0 / (1 << GEOHEX_RES)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
pts AS (
  SELECT m.qid AS qid,
         (0.5773502691896258 * {_SQL_LON} - {_SQL_LAT} / 3.0) / {size}
           AS qf,
         (2.0 * {_SQL_LAT} / 3.0) / {size} AS rf
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
),
cube AS (
  SELECT qid, qf, rf, -qf - rf AS yf,
         floor(qf + 0.5) AS rx, floor(-qf - rf + 0.5) AS ry,
         floor(rf + 0.5) AS rz
  FROM pts
),
fixed AS (
  SELECT qid,
         CASE WHEN abs(rx - qf) > abs(ry - yf)
                   AND abs(rx - qf) > abs(rz - rf)
              THEN -ry - rz ELSE rx END AS hq,
         CASE WHEN abs(rx - qf) > abs(ry - yf)
                   AND abs(rx - qf) > abs(rz - rf)
              THEN rz
              WHEN abs(ry - yf) > abs(rz - rf)
              THEN rz
              ELSE -rx - ry END AS hr
  FROM cube
)
SELECT CAST(qid AS BIGINT) AS qid,
       '{GEOHEX_RES}' || '/' || CAST(hq AS BIGINT) || '/' ||
         CAST(hr AS BIGINT) AS key,
       CAST(count(*) AS BIGINT) AS n_docs
FROM fixed
GROUP BY qid, key
"""


GEO_SHAPE_ENV = (-60.0, -30.0, 60.0, 45.0)  # (min_lon, min_lat, max_lon, max_lat)


def q_fts_geo_shape(spark, sf_dir):
    """ES geo_shape (envelope subset): all four spatial relations of the
    match set's doc envelopes vs a fixed query envelope, unioned with a
    relation column."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    out = None
    for rel in ("intersects", "within", "contains", "disjoint"):
        part = search.search_geo_shape(
            spark, store, qpdf, GEO_SHAPE_ENV, relation=rel,
        ).select(F.lit(rel).alias("relation"), "qid", "doc_id")
        out = part if out is None else out.unionByName(part)
    return out


def _geo_shape_sql(queries) -> str:
    qxl, qyl, qxh, qyh = GEO_SHAPE_ENV
    env = f"""
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {_SQL_LON} - ((doc_id % 7) + 1) / 2.0 AS xl,
         {_SQL_LON} + ((doc_id % 5) + 1) / 2.0 AS xh,
         {_SQL_LAT} - ((doc_id % 3) + 1) / 2.0 AS yl,
         {_SQL_LAT} + ((doc_id % 4) + 1) / 2.0 AS yh
  FROM documents doc"""
    rels = {
        "intersects": f"(xl <= {qxh} AND xh >= {qxl} AND yl <= {qyh} AND yh >= {qyl})",
        "within": f"(xl >= {qxl} AND xh <= {qxh} AND yl >= {qyl} AND yh <= {qyh})",
        "contains": f"(xl <= {qxl} AND xh >= {qxh} AND yl <= {qyl} AND yh >= {qyh})",
        "disjoint": f"NOT (xl <= {qxh} AND xh >= {qxl} AND yl <= {qyh} AND yh >= {qyl})",
    }
    branches = " UNION ALL".join(
        f"""
  SELECT '{rel}' AS relation, CAST(m.qid AS BIGINT) AS qid,
         m.doc_id AS doc_id
  FROM m JOIN env ON env.doc_id = m.doc_id AND {cond}"""
        for rel, cond in rels.items()
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
env AS ({env})
{branches}
"""


def q_fts_geo_bounds(spark, sf_dir):
    """ES geo_bounds metric agg: match-set bounding box."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_bounds_agg(spark, store, qpdf)


def _geo_bounds_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       round(max({_SQL_LAT}), 6) AS top,
       round(min({_SQL_LAT}), 6) AS bottom,
       round(min({_SQL_LON}), 6) AS "left",
       round(max({_SQL_LON}), 6) AS "right"
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
GROUP BY m.qid
"""


def q_fts_geo_centroid(spark, sf_dir):
    """ES geo_centroid metric agg: mean point of the match set."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_centroid_agg(spark, store, qpdf)


def _geo_centroid_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg({_SQL_LAT}), 6) AS lat_r,
       round(avg({_SQL_LON}), 6) AS lon_r
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
GROUP BY m.qid
"""


GEO_POLY = [
    (-30.1, -100.2),
    (40.3, -80.1),
    (60.2, 10.3),
    (20.1, 90.2),
    (-50.2, 30.1),
]
GEO_LINE_SIZE = 10
CHANGE_INTERVAL = 64.0


def q_fts_geo_polygon(spark, sf_dir):
    """ES geo_polygon filter: match-set docs inside a pentagon — the
    ray-casting parity predicate as one shared portable expression."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_polygon(spark, store, qpdf, polygon=GEO_POLY)


def _geo_polygon_sql(queries) -> str:
    cond = search.geo_polygon_expr(_SQL_LAT, _SQL_LON, GEO_POLY)
    return f"""{_BM25_BODY},{_match_m_cte(queries)}
SELECT CAST(m.qid AS BIGINT) AS qid, m.doc_id AS doc_id
FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
WHERE {cond}
"""


def q_fts_geo_line(spark, sf_dir):
    """ES geo_line metric agg: the match set's points joined into a
    LineString ordered by n_chars (doc_id tiebreak), first 10 points,
    ES ``complete`` flag."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geo_line(
        spark, store, qpdf, sort_col="n_chars", size=GEO_LINE_SIZE
    )


def _geo_line_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
pts AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id,
         CAST(doc.n_chars AS DOUBLE) AS s,
         printf('%.2f %.2f', {_SQL_LON}, {_SQL_LAT}) AS pt
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
),
r AS (
  SELECT qid, pt,
         row_number() OVER (
           PARTITION BY qid ORDER BY s ASC, doc_id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY qid) AS np
  FROM pts
)
SELECT CAST(qid AS BIGINT) AS qid,
       string_agg(CASE WHEN rn <= {GEO_LINE_SIZE} THEN pt END,
                  ', ' ORDER BY rn) AS line,
       CAST(max(np) AS BIGINT) AS n_points,
       max(np) <= {GEO_LINE_SIZE} AS complete
FROM r GROUP BY qid
"""


def q_fts_change_point(spark, sf_dir):
    """ES change_point pipeline agg (pinned largest-mean-shift split)
    over the dl histogram of the match set."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_change_point(
        spark, store, qpdf, interval=CHANGE_INTERVAL
    )


def _change_point_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)},
base AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         floor(dl / {CHANGE_INTERVAL}) * {CHANGE_INTERVAL} AS bucket,
         count(*) AS n
  FROM md GROUP BY qid, bucket
),
c AS (
  SELECT qid, bucket, n,
         row_number() OVER (PARTITION BY qid ORDER BY bucket) AS i,
         sum(n) OVER (PARTITION BY qid ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY qid) AS tot,
         count(*) OVER (PARTITION BY qid) AS nb,
         lead(bucket) OVER (PARTITION BY qid ORDER BY bucket) AS cb
  FROM base
),
s AS (
  SELECT qid, cb, bucket,
         cum * 1.0 / i AS lm,
         (tot - cum) * 1.0 / (nb - i) AS rm,
         round(abs(cum * 1.0 / i - (tot - cum) * 1.0 / (nb - i)), 6)
           AS delta
  FROM c WHERE i < nb
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY delta DESC, bucket ASC
  ) AS r FROM s
)
SELECT qid, cb AS change_bucket,
       round(lm, 6) AS left_mean_r, round(rm, 6) AS right_mean_r,
       delta AS delta_r
FROM rk WHERE r = 1
"""


OVERLAP_N, OVERLAP_K = 3, 64


def q_corpus_overlap_minhash(spark, sf_dir):
    """Cross-corpus overlap estimation: MinHash-estimated + exact
    Jaccard between the shingle sets of the even-id and odd-id halves
    of the documents table."""
    from ..operators import dedup

    return dedup.corpus_minhash_overlap(
        _docs(spark, sf_dir), side_col=(F.col("doc_id") % 2 == 0),
        n=OVERLAP_N, k=OVERLAP_K,
    )


def _corpus_overlap_sql() -> str:
    n, k = OVERLAP_N, OVERLAP_K
    parts = " || ' ' || ".join(f"toks[i - {n - 1 - j}]" for j in range(n))
    return f"""
WITH x AS (
  SELECT doc_id % 2 = 0 AS a, {DOC_TOKS} AS toks FROM documents
),
g AS (
  SELECT DISTINCT a, sh FROM (
    SELECT a,
           unnest(CASE WHEN len(toks) >= {n}
                  THEN list_transform(range({n}, len(toks) + 1),
                                      i -> {parts})
                  ELSE [] END) AS sh
    FROM x
  )
),
sets AS (
  SELECT sh,
         max(CASE WHEN a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN NOT a THEN 1 ELSE 0 END) AS in_b
  FROM g GROUP BY sh
),
exact AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_b) AS BIGINT) AS n_b,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_inter,
         CAST(count(*) AS BIGINT) AS n_union
  FROM sets
),
perms AS (
  SELECT g.a AS a, r.i AS i,
         md5(CAST(r.i AS VARCHAR) || '_' || g.sh) AS h
  FROM g CROSS JOIN range(0, {k}) AS r(i)
),
mins AS (SELECT a, i, min(h) AS mn FROM perms GROUP BY a, i),
sk AS (
  SELECT CAST(sum(CASE WHEN ma.mn = mb.mn THEN 1 ELSE 0 END) AS BIGINT)
           AS minhash_matches
  FROM (SELECT i, mn FROM mins WHERE a) ma
  JOIN (SELECT i, mn FROM mins WHERE NOT a) mb USING (i)
)
SELECT n_a, n_b, n_inter, n_union,
       round(CAST(n_inter AS DOUBLE) / n_union, 6) AS exact_j_r,
       minhash_matches,
       round(CAST(minhash_matches AS DOUBLE) / {k}, 6) AS est_j_r
FROM exact CROSS JOIN sk
"""


SEMDEDUP_K, SEMDEDUP_TAU = 8, 0.3


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): md5-seeded clustering, then drop
    every vector with a lower-id same-cluster neighbor at cosine ≥ τ."""
    emb = _tbl(spark, sf_dir, "embeddings")
    return ann.semantic_dedup(emb, k=SEMDEDUP_K, tau=SEMDEDUP_TAU)


def _dedup_semantic_sql() -> str:
    return f"""
WITH cent AS (
  SELECT CAST(vec_id AS VARCHAR) AS cid, embedding::DOUBLE[] AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {SEMDEDUP_K}
),
v AS (
  SELECT CAST(vec_id AS BIGINT) AS vid, embedding::DOUBLE[] AS vvec
  FROM embeddings
),
j AS (
  SELECT v.vid AS vid, v.vvec AS vvec, cent.cid AS cid,
         round(list_dot_product(v.vvec, cent.cvec)
               / (sqrt(list_dot_product(v.vvec, v.vvec))
                  * sqrt(list_dot_product(cent.cvec, cent.cvec))), 6)
           AS cos_r
  FROM v CROSS JOIN cent
),
best AS (
  SELECT vid, vvec, cid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vid ORDER BY cos_r DESC, cid ASC
    ) AS rn FROM j
  ) WHERE rn = 1
),
pairs AS (
  SELECT b.vid AS vid, b.cid AS cluster, a.vid AS keep_id,
         round(list_dot_product(a.vvec, b.vvec)
               / (sqrt(list_dot_product(a.vvec, a.vvec))
                  * sqrt(list_dot_product(b.vvec, b.vvec))), 6) AS pc
  FROM best a JOIN best b ON a.cid = b.cid AND a.vid < b.vid
)
SELECT vid AS vec_id, cluster,
       CAST(min(keep_id) AS BIGINT) AS dup_of,
       max(pc) AS best_cos_r
FROM pairs WHERE pc >= {SEMDEDUP_TAU}
GROUP BY vid, cluster
"""


def q_fts_normalize_agg(spark, sf_dir):
    """ES normalize pipeline agg: lang bucket counts as share-of-total."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_normalize_agg(
        spark, store, qpdf, group_col="lang", method="percent_of_sum"
    )


def _normalize_agg_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
counts AS (
  SELECT CAST(m.qid AS BIGINT) AS qid, doc.lang AS "group",
         CAST(count(*) AS BIGINT) AS n_docs
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
  GROUP BY m.qid, doc.lang
)
SELECT qid, "group", n_docs,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY qid),
             6) AS normalized_r
FROM counts
"""


# --------------------------------- 4z5. hybrid retrieval + rank_eval
# ES 8.8+ retriever API (rrf / linear) and the _rank_eval endpoint —
# the modern search surface over the same indexed docs + dense vectors.

RRF_WINDOW, RRF_CONST, RRF_K = 50, 60, 10
HYB_ALPHA = 0.5
RANK_EVAL_K, RANK_EVAL_TH = 10, 2


def _query_vecs_pdf(spark, sf_dir):
    # two query vectors — a driver-side pyarrow point read (row-group
    # pruned on vec_id), not a Spark job per hybrid query
    import pyarrow.dataset as pads

    tbl = pads.dataset(
        os.path.join(sf_dir, "embeddings.parquet"), format="parquet"
    ).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < 2
    ).to_pandas().sort_values("vec_id")
    return pd.DataFrame(
        {"qid": tbl["vec_id"].tolist(),
         "vec": [list(map(float, v)) for v in tbl["embedding"]]}
    )


def q_fts_rrf(spark, sf_dir):
    """ES RRF retriever: BM25 leg + cosine-kNN leg fused by
    1/(rank_constant + rank); query vectors are embeddings 0 and 1."""
    store = _corpus_store_knn(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_rrf(
        spark, store, qpdf, _query_vecs_pdf(spark, sf_dir),
        k=RRF_K, window=RRF_WINDOW, rank_constant=RRF_CONST,
    )


def q_fts_hybrid_linear(spark, sf_dir):
    """ES linear retriever: min-max-normalized convex blend of the same
    two legs."""
    store = _corpus_store_knn(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_hybrid_linear(
        spark, store, qpdf, _query_vecs_pdf(spark, sf_dir),
        k=RRF_K, window=RRF_WINDOW, alpha=HYB_ALPHA,
    )


_KNN_BM25_BODY = f"""
WITH corpus AS (
  SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id, {DOC_TOKS} AS toks
  FROM documents doc JOIN embeddings e ON doc.doc_id = e.vec_id
),
dl AS (SELECT doc_id, len(toks) AS dl FROM corpus),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
posting AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM corpus)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY term)
"""


def _hybrid_legs_sql(queries, window: int) -> str:
    """Shared oracle CTEs for the two hybrid entries: BM25 rank leg
    (lex) and cosine rank leg (knn) over the docs-with-embeddings
    corpus, both cut at ``window`` and ranked over 6-dp-rounded values
    with doc_id tie-break."""
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_KNN_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
lex AS (
  SELECT * FROM (
    SELECT qid, doc_id, score_r,
           row_number() OVER (
             PARTITION BY qid ORDER BY score_r DESC, doc_id ASC
           ) AS brank
    FROM scored
  ) WHERE brank <= {window}
),
vec AS (
  SELECT c.doc_id AS doc_id, e.embedding::DOUBLE[] AS v
  FROM corpus c JOIN embeddings e ON CAST(e.vec_id AS VARCHAR) = c.doc_id
),
qv AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id < 2
),
cosd AS (
  SELECT qv.qid AS qid, vec.doc_id AS doc_id,
         round(list_dot_product(qv.v, vec.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(vec.v, vec.v))), 6) AS cos_r
  FROM qv CROSS JOIN vec
),
knn AS (
  SELECT * FROM (
    SELECT qid, doc_id, cos_r,
           row_number() OVER (
             PARTITION BY qid ORDER BY cos_r DESC, doc_id ASC
           ) AS krank
    FROM cosd
  ) WHERE krank <= {window}
)"""


def _rrf_sql(queries) -> str:
    return f"""{_hybrid_legs_sql(queries, RRF_WINDOW)},
fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         round(COALESCE(1.0 / ({RRF_CONST} + l.brank), 0.0)
               + COALESCE(1.0 / ({RRF_CONST} + v.krank), 0.0), 6) AS rrf_r
  FROM lex l FULL OUTER JOIN knn v
    ON l.qid = v.qid AND l.doc_id = v.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY rrf_r DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM fused
)
SELECT qid, rank, doc_id, rrf_r FROM ranked WHERE rank <= {RRF_K}
"""


def _hybrid_linear_sql(queries) -> str:
    a = HYB_ALPHA
    return f"""{_hybrid_legs_sql(queries, RRF_WINDOW)},
lexn AS (
  SELECT qid, doc_id,
         CASE WHEN max(score_r) OVER (PARTITION BY qid)
                   > min(score_r) OVER (PARTITION BY qid)
              THEN (score_r - min(score_r) OVER (PARTITION BY qid))
                   / (max(score_r) OVER (PARTITION BY qid)
                      - min(score_r) OVER (PARTITION BY qid))
              ELSE 1.0 END AS bnorm
  FROM lex
),
knnn AS (
  SELECT qid, doc_id,
         CASE WHEN max(cos_r) OVER (PARTITION BY qid)
                   > min(cos_r) OVER (PARTITION BY qid)
              THEN (cos_r - min(cos_r) OVER (PARTITION BY qid))
                   / (max(cos_r) OVER (PARTITION BY qid)
                      - min(cos_r) OVER (PARTITION BY qid))
              ELSE 1.0 END AS knorm
  FROM knn
),
fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         round({a} * COALESCE(l.bnorm, 0.0)
               + {1.0 - a} * COALESCE(v.knorm, 0.0), 6) AS blend_r
  FROM lexn l FULL OUTER JOIN knnn v
    ON l.qid = v.qid AND l.doc_id = v.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, blend_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY blend_r DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM fused
)
SELECT qid, rank, doc_id, blend_r FROM ranked WHERE rank <= {RRF_K}
"""


def q_fts_rank_eval(spark, sf_dir):
    """ES _rank_eval: grade the BM25 top-k against graded judgments
    derived from the data itself — rating(doc) = number of DISTINCT
    query terms the doc contains (so rating >= 2 == "contains both"
    is the relevance threshold)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    toks = analysis.spark_tokens_expr("text")
    qterms = [
        (qid, sorted(set(analysis.tokenize_series(pd.Series([q]))[0])))
        for qid, q in SORTED_QUERIES
    ]
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {"qid": [a for a, _ in qterms], "qts": [b for _, b in qterms]}
        )
    )
    ratings = (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.expr(f"array_distinct({toks})").alias("_t"),
        )
        .crossJoin(F.broadcast(qdf))
        .withColumn("rating", F.size(F.array_intersect("_t", "qts")))
        .filter(F.col("rating") > 0)
        .select("qid", "doc_id", "rating")
    )
    return search.rank_eval(
        spark, store, qpdf, ratings,
        k=RANK_EVAL_K, relevant_threshold=RANK_EVAL_TH,
    )


def _rank_eval_sql(queries) -> str:
    k, th = RANK_EVAL_K, RANK_EVAL_TH
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
ratings AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id, count(*) AS rating
  FROM (SELECT DISTINCT qid, term FROM q) q
  JOIN posting p ON p.term = q.term
  GROUP BY q.qid, p.doc_id
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * ({K1} + 1.0) * p.tf
             / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS rank
  FROM scored
),
topk AS (
  SELECT r.qid AS qid, r.doc_id AS doc_id, r.rank AS rank,
         COALESCE(t.rating, 0) AS rating
  FROM ranked r
  LEFT JOIN ratings t ON t.qid = r.qid AND t.doc_id = r.doc_id
  WHERE r.rank <= {k}
),
perq AS (
  SELECT qid,
         sum(CASE WHEN rating >= {th} THEN 1.0 ELSE 0.0 END) / {k}
           AS precision_at_k,
         COALESCE(max(CASE WHEN rating >= {th} THEN 1.0 / rank END), 0.0)
           AS mrr,
         sum((pow(2.0, rating) - 1.0) / log2(rank + 1.0)) AS dcg,
         sum(CASE WHEN rating >= {th} THEN 1 ELSE 0 END) AS nrel_topk
  FROM topk GROUP BY qid
),
ideal AS (
  SELECT qid,
         sum(CASE WHEN ir <= {k}
             THEN (pow(2.0, rating) - 1.0) / log2(ir + 1.0)
             ELSE 0.0 END) AS idcg,
         sum(CASE WHEN rating >= {th} THEN 1 ELSE 0 END) AS nrel
  FROM (SELECT qid, doc_id, rating,
               row_number() OVER (
                 PARTITION BY qid ORDER BY rating DESC, doc_id ASC
               ) AS ir
        FROM ratings)
  GROUP BY qid
),
met AS (
  SELECT COALESCE(p.qid, i.qid) AS qid,
         round(COALESCE(p.precision_at_k, 0.0), 6) AS precision_at_k,
         round(CASE WHEN COALESCE(i.nrel, 0) > 0
               THEN COALESCE(p.nrel_topk, 0) * 1.0 / i.nrel
               ELSE 0.0 END, 6) AS recall_at_k,
         round(COALESCE(p.mrr, 0.0), 6) AS mrr,
         round(CASE WHEN COALESCE(i.idcg, 0) > 0
               THEN COALESCE(p.dcg, 0) / i.idcg
               ELSE 0.0 END, 6) AS ndcg_at_k
  FROM perq p FULL OUTER JOIN ideal i ON p.qid = i.qid
)
SELECT CAST(qid AS BIGINT) AS qid, 'precision_at_k' AS metric,
       precision_at_k AS value_r FROM met
UNION ALL SELECT CAST(qid AS BIGINT), 'recall_at_k', recall_at_k FROM met
UNION ALL SELECT CAST(qid AS BIGINT), 'mrr', mrr FROM met
UNION ALL SELECT CAST(qid AS BIGINT), 'ndcg_at_k', ndcg_at_k FROM met
"""


# --------------------------------- 4z6. document-management APIs
# ES _delete_by_query / _update_by_query / _reindex / aliases
# (plans/manage.py) — bulk index maintenance over the same stores.

MGMT_DEL_QUERY = "spark merge"
MGMT_UPD_QUERY = "customer window"
ALIAS_NAME, ALIAS_FILTER_TERM = "support-docs", "customer"
REIDX_EXCLUDE_LANG = "de"


def _mgmt_stores(spark: SparkSession, sf_dir: str):
    """Three management-exercised stores, built once per testdata
    identity: [0] post-delete_by_query, [1] post-update_by_query,
    [2] reindex destination (per-lang index routing). A family-level
    sentinel marks the mutations applied, so a fresh process re-entering
    committed paths (build resume = no-op) does not re-mutate."""
    paths, fresh = _cached_store_paths(sf_dir, "mgmt1", count=3)
    sentinel = paths[0] + ".mgmt_done"
    corpus = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("docid"),
        "lang",
        F.lit(0).cast("long").alias("version"),
        F.col("text").alias("content"),
    )
    cfg = IndexerConfig(
        index="docs", id_field="docid", version_field="version"
    )
    if fresh or not os.path.exists(sentinel):
        for p in paths[:2]:
            build.build_index(corpus, cfg, p, num_buckets=32, resume=True)
        if not os.path.exists(sentinel):
            manage.delete_by_query(
                spark, search.load_store(paths[0]),
                pd.DataFrame([(0, MGMT_DEL_QUERY)],
                             columns=["qid", "query"]),
            )
            manage.update_by_query(
                spark, corpus, search.load_store(paths[1]), cfg,
                pd.DataFrame([(0, MGMT_UPD_QUERY)],
                             columns=["qid", "query"]),
                {"lang": "concat(lang, '-x')", "version": "version + 1"},
            )
            manage.reindex(
                spark, corpus,
                IndexerConfig(
                    index_prefix="idx-", index_field="lang",
                    id_field="docid", version_field="version",
                ),
                paths[2],
                query_filter=f"lang <> '{REIDX_EXCLUDE_LANG}'",
                num_buckets=32, resume=True,
            )
            with open(sentinel, "w") as f:
                f.write("done")
    return [search.load_store(p) for p in paths]


def _live_lang_counts(spark, store) -> DataFrame:
    live = store.doc_stats(spark).join(
        store.dead_df(spark), "doc_int", "left_anti"
    )
    return live.groupBy(F.col("lang").alias("lang")).agg(
        F.count("*").alias("n_live")
    )


def q_fts_delete_by_query(spark, sf_dir):
    """Live per-lang counts after _delete_by_query('spark merge')."""
    st = _mgmt_stores(spark, sf_dir)[0]
    return _live_lang_counts(spark, st)


def _delete_by_query_sql() -> str:
    return f"""{_BM25_BODY},{_match_m_cte([(0, MGMT_DEL_QUERY)])}
SELECT doc.lang AS lang, CAST(count(*) AS BIGINT) AS n_live
FROM documents doc
WHERE CAST(doc.doc_id AS VARCHAR) NOT IN (SELECT doc_id FROM m)
GROUP BY doc.lang
"""


def q_fts_update_by_query(spark, sf_dir):
    """Live per-lang counts after _update_by_query tagging matched docs'
    lang with '-x' (script re-index through the CDC path)."""
    st = _mgmt_stores(spark, sf_dir)[1]
    return _live_lang_counts(spark, st)


def _update_by_query_sql() -> str:
    return f"""{_BM25_BODY},{_match_m_cte([(0, MGMT_UPD_QUERY)])}
SELECT CASE WHEN CAST(doc.doc_id AS VARCHAR) IN (SELECT doc_id FROM m)
            THEN doc.lang || '-x' ELSE doc.lang END AS lang,
       CAST(count(*) AS BIGINT) AS n_live
FROM documents doc
GROUP BY 1
"""


def q_fts_reindex(spark, sf_dir):
    """_reindex into per-lang indexes (index_prefix + index_field
    routing), excluding one lang: per-index live counts plus the
    north-rule sha parity count against the source table."""
    st = _mgmt_stores(spark, sf_dir)[2]
    src = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("sdoc"),
        F.sha2(F.col("text"), 256).alias("ssha"),
    )
    live = st.doc_stats(spark).join(
        st.dead_df(spark), "doc_int", "left_anti"
    )
    return (
        live.join(src, live["doc_id"] == src["sdoc"], "left")
        .groupBy("index_name")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                (F.col("content_sha256") == F.col("ssha")).cast("long")
            ).alias("n_sha_ok"),
        )
    )


def _reindex_sql() -> str:
    return f"""
SELECT 'idx-' || lang AS index_name,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sha_ok
FROM documents WHERE lang <> '{REIDX_EXCLUDE_LANG}'
GROUP BY lang
"""


def q_fts_alias(spark, sf_dir):
    """Filtered-alias search: alias = (index 'docs', filter term
    'customer'); BM25 ranking restricted to the alias's candidate set
    before the top-k cut."""
    store = _corpus_store(spark, sf_dir)
    store = manage.put_alias(
        store, ALIAS_NAME, index="docs", filter_term=ALIAS_FILTER_TERM
    )
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return manage.search_alias(spark, store, ALIAS_NAME, qpdf, k=FT_K)


def _alias_sql(queries) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
fm AS (
  SELECT DISTINCT doc_id FROM posting WHERE term = '{ALIAS_FILTER_TERM}'
),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  WHERE p.doc_id IN (SELECT doc_id FROM fm)
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_r,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY score_r DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {FT_K}
"""


# --------------------------------- 4z7. metric aggs II + auto/date-range
# ES median_absolute_deviation / boxplot / t_test / matrix_stats over
# doc fields, and date_range / auto_date_histogram over the events table.

TT_GROUPS = ("en", "es")
MS_FIELDS = ("dl", "n_chars")
DATE_RANGES = [
    ("r0", None, "2024-01-10"),
    ("r1", "2024-01-10", "2024-01-20"),
    ("r2", "2024-01-20", None),
]
AUTO_DH_TARGET = 40


def q_fts_mad(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_median_absolute_deviation_agg(
        spark, store, qpdf, value_col="dl"
    )


def _mad_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
vals AS (
  SELECT m.qid AS qid, CAST(dl.dl AS DOUBLE) AS v
  FROM m JOIN dl ON dl.doc_id = m.doc_id
),
med AS (SELECT qid, quantile_cont(v, 0.5) AS med FROM vals GROUP BY qid)
SELECT CAST(vals.qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(abs(v - med), 0.5), 6) AS mad_r
FROM vals JOIN med ON med.qid = vals.qid
GROUP BY vals.qid
"""


def q_fts_boxplot(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_boxplot_agg(
        spark, store, qpdf, value_col="n_chars"
    )


def _boxplot_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
vals AS (
  SELECT m.qid AS qid, CAST(doc.n_chars AS DOUBLE) AS v
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(count(*) AS BIGINT) AS n_docs,
       round(min(v), 6) AS min_r,
       round(quantile_cont(v, 0.25), 6) AS q1_r,
       round(quantile_cont(v, 0.5), 6) AS q2_r,
       round(quantile_cont(v, 0.75), 6) AS q3_r,
       round(max(v), 6) AS max_r
FROM vals GROUP BY qid
"""


def q_fts_t_test(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_t_test_agg(
        spark, store, qpdf, value_col="n_chars", group_col="lang",
        group_a=TT_GROUPS[0], group_b=TT_GROUPS[1],
    )


def _t_test_sql(queries) -> str:
    a, b = TT_GROUPS
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
vals AS (
  SELECT m.qid AS qid, CAST(doc.n_chars AS DOUBLE) AS v, doc.lang AS g
  FROM m JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
),
agg AS (
  SELECT qid,
         count(*) FILTER (g = '{a}') AS n_a,
         count(*) FILTER (g = '{b}') AS n_b,
         avg(v) FILTER (g = '{a}') AS ma,
         avg(v) FILTER (g = '{b}') AS mb,
         var_samp(v) FILTER (g = '{a}') AS va,
         var_samp(v) FILTER (g = '{b}') AS vb
  FROM vals GROUP BY qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(CASE WHEN n_a >= 2 AND n_b >= 2
                       AND sqrt(va / n_a + vb / n_b) > 0
                  THEN (ma - mb) / sqrt(va / n_a + vb / n_b)
             END, 6) AS t_r
FROM agg
"""


def q_fts_matrix_stats(spark, sf_dir):
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    res = search.search_matrix_stats_agg(spark, store, qpdf, MS_FIELDS)
    # round covariance to 2 dp (absolute magnitude ~1e5: 6-dp rounding
    # would sit inside cross-engine float-sum noise), correlation to 6
    return res.select(
        "qid", "field_x", "field_y", "n_docs",
        F.round("covar_r", 2).alias("covar_r2"), "corr_r",
    )


def _matrix_stats_sql(queries) -> str:
    x, y = MS_FIELDS
    cells = []
    for fx, ex in ((x, "vx"), (y, "vy")):
        for fy, ey in ((x, "vx"), (y, "vy")):
            cells.append(
                f"SELECT CAST(qid AS BIGINT) AS qid, '{fx}' AS field_x, "
                f"'{fy}' AS field_y, CAST(count(*) AS BIGINT) AS n_docs, "
                f"round(covar_samp({ex}, {ey}), 2) AS covar_r2, "
                f"round(corr({ex}, {ey}), 6) AS corr_r FROM vals GROUP BY qid"
            )
    u = "\nUNION ALL ".join(cells)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
vals AS (
  SELECT m.qid AS qid, CAST(dl.dl AS DOUBLE) AS vx,
         CAST(doc.n_chars AS DOUBLE) AS vy
  FROM m
  JOIN dl ON dl.doc_id = m.doc_id
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = m.doc_id
)
{u}
"""


def q_events_date_range(spark, sf_dir):
    """ES date_range aggregation over the events stream: half-open
    [from, to) buckets (ES semantics), overlap-safe via a broadcast
    range join — one scan regardless of bucket count."""
    e = _tbl(spark, sf_dir, "events")
    r = spark.createDataFrame(
        pd.DataFrame(DATE_RANGES, columns=["rkey", "rfrom", "rto"])
    ).select(
        "rkey",
        F.col("rfrom").cast("timestamp").alias("rfrom"),
        F.col("rto").cast("timestamp").alias("rto"),
    )
    cond = (
        (F.col("rfrom").isNull() | (F.col("ts") >= F.col("rfrom")))
        & (F.col("rto").isNull() | (F.col("ts") < F.col("rto")))
    )
    return (
        e.join(F.broadcast(r), cond)
        .groupBy("rkey")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value_r"),
        )
    )


def _date_range_sql() -> str:
    vals = ", ".join(
        f"('{k}', {f'TIMESTAMP ' + repr(f) if f else 'NULL'}, "
        f"{f'TIMESTAMP ' + repr(t) if t else 'NULL'})"
        for k, f, t in DATE_RANGES
    )
    return f"""
WITH r(rkey, rfrom, rto) AS (VALUES {vals})
SELECT r.rkey AS rkey, CAST(count(*) AS BIGINT) AS n_events,
       round(avg(e.value), 6) AS avg_value_r
FROM events e JOIN r
  ON (r.rfrom IS NULL OR e.ts >= r.rfrom)
 AND (r.rto IS NULL OR e.ts < r.rto)
GROUP BY r.rkey
"""


def q_events_auto_date_histogram(spark, sf_dir):
    """ES auto_date_histogram: the engine picks the finest calendar
    interval fitting the target bucket count, then buckets on it."""
    e = _tbl(spark, sf_dir, "events")
    _, out = search.auto_date_histogram(e, "ts", AUTO_DH_TARGET)
    return out.select(
        F.col("bucket").cast("string").alias("bucket"),
        "interval",
        F.col("n").cast("long").alias("n"),
    )


def _auto_date_histogram_sql() -> str:
    t = AUTO_DH_TARGET
    return f"""
WITH c AS (
  SELECT count(DISTINCT date_trunc('minute', ts)) AS c_minute,
         count(DISTINCT date_trunc('hour', ts)) AS c_hour,
         count(DISTINCT date_trunc('day', ts)) AS c_day,
         count(DISTINCT date_trunc('week', ts)) AS c_week,
         count(DISTINCT date_trunc('month', ts)) AS c_month,
         count(DISTINCT date_trunc('quarter', ts)) AS c_quarter,
         count(DISTINCT date_trunc('year', ts)) AS c_year
  FROM events
),
b AS (
  SELECT CASE WHEN c_minute <= {t} THEN 'minute'
              WHEN c_hour <= {t} THEN 'hour'
              WHEN c_day <= {t} THEN 'day'
              WHEN c_week <= {t} THEN 'week'
              WHEN c_month <= {t} THEN 'month'
              WHEN c_quarter <= {t} THEN 'quarter'
              ELSE 'year' END AS iv
  FROM c
)
SELECT CAST(date_trunc(b.iv, e.ts) AS VARCHAR) AS bucket,
       b.iv AS "interval", CAST(count(*) AS BIGINT) AS n
FROM events e CROSS JOIN b
GROUP BY 1, 2
"""


# --------------------------------- 4z8. terms_set / runtime / inner_hits
# / intervals / msearch — the remaining ES query-DSL stragglers.

TERMS_SET_QUERIES = [
    (0, "spark merge window stream"),
    (1, "customer part data"),
]
TS_MSM_SPARK = "1 + pmod(n_chars, 3)"
TS_MSM_SQL = "1 + (n_chars % 3)"
RT_EXPRS = {
    "size_class": (
        "CASE WHEN n_chars < 200 THEN 'small' "
        "WHEN n_chars < 400 THEN 'mid' ELSE 'large' END"
    ),
    "chars_per_tok": "CAST(n_chars AS DOUBLE) / greatest(dl, 1)",
}
CI_K, CI_INNER = 3, 2
INTERVALS_GAPS = 2
MSEARCH_REQUESTS = [
    {"slot": 0, "kind": "match", "query": "spark merge window"},
    {"slot": 1, "kind": "match_and", "query": "spark merge"},
    {"slot": 2, "kind": "phrase", "query": "part filter scan"},
]


def q_fts_terms_set(spark, sf_dir):
    """ES terms_set: per-doc minimum_should_match from a doc field
    expression (minimum_should_match_field semantics)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(TERMS_SET_QUERIES, columns=["qid", "query"])
    return search.search_terms_set(
        spark, store, qpdf, msm_expr=TS_MSM_SPARK, k=FT_K
    )


def _terms_set_sql(queries) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r,
         count(*) AS nt
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
req AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         greatest(1, {TS_MSM_SQL}) AS required
  FROM documents
),
ranked AS (
  SELECT CAST(s.qid AS BIGINT) AS qid, s.doc_id AS doc_id,
         CAST(s.nt AS BIGINT) AS nt, s.score_r,
         CAST(row_number() OVER (
           PARTITION BY s.qid ORDER BY s.score_r DESC, s.doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored s JOIN req ON req.doc_id = s.doc_id
  WHERE s.nt >= req.required
)
SELECT qid, rank, doc_id, nt, score_r FROM ranked WHERE rank <= {FT_K}
"""


def q_fts_runtime_field(spark, sf_dir):
    """ES runtime fields: derived size_class bucket + avg derived
    chars-per-token, both computed at query time from marker columns."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_runtime_terms_agg(
        spark, store, qpdf, RT_EXPRS,
        group_field="size_class", avg_field="chars_per_tok",
    )


def _runtime_field_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
rt AS (
  SELECT CAST(doc.doc_id AS VARCHAR) AS doc_id,
         CASE WHEN doc.n_chars < 200 THEN 'small'
              WHEN doc.n_chars < 400 THEN 'mid' ELSE 'large' END AS grp,
         CAST(doc.n_chars AS DOUBLE) / greatest(dl.dl, 1) AS cpt
  FROM documents doc
  JOIN dl ON dl.doc_id = CAST(doc.doc_id AS VARCHAR)
)
SELECT CAST(m.qid AS BIGINT) AS qid, rt.grp AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(rt.cpt), 6) AS avg_r
FROM m JOIN rt ON rt.doc_id = m.doc_id
GROUP BY m.qid, rt.grp
"""


def q_fts_collapse_inner(spark, sf_dir):
    """ES collapse + inner_hits: top groups by best doc, each with its
    own top inner docs."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_collapse_inner_hits(
        spark, store, qpdf, collapse_col="lang", k=CI_K,
        inner_size=CI_INNER,
    )


def _collapse_inner_sql(queries) -> str:
    vals = []
    for qid, q in queries:
        toks = analysis.tokenize_series(pd.Series([q]))[0]
        for t, qtf in sorted(Counter(toks).items()):
            vals.append(f"({qid}, '{t}', {qtf})")
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, p.doc_id
),
named AS (
  SELECT s.qid AS qid, s.doc_id AS doc_id, doc.lang AS grp, s.score_r
  FROM scored s
  JOIN documents doc ON CAST(doc.doc_id AS VARCHAR) = s.doc_id
),
inner_h AS (
  SELECT *, row_number() OVER (
    PARTITION BY qid, grp ORDER BY score_r DESC, doc_id ASC
  ) AS inner_rank
  FROM named
),
kept AS (SELECT * FROM inner_h WHERE inner_rank <= {CI_INNER}),
g AS (
  SELECT qid, grp, max(score_r) AS gscore,
         min(CASE WHEN inner_rank = 1 THEN doc_id END) AS gdoc
  FROM kept GROUP BY qid, grp
),
gr AS (
  SELECT qid, grp, dense_rank() OVER (
    PARTITION BY qid ORDER BY gscore DESC, gdoc ASC
  ) AS group_rank
  FROM g
)
SELECT CAST(k.qid AS BIGINT) AS qid,
       CAST(gr.group_rank AS INTEGER) AS group_rank, k.grp AS "group",
       CAST(k.inner_rank AS INTEGER) AS inner_rank, k.doc_id AS doc_id,
       k.score_r AS score_r
FROM kept k JOIN gr ON gr.qid = k.qid AND gr.grp = k.grp
WHERE gr.group_rank <= {CI_K}
"""


def q_fts_intervals(spark, sf_dir):
    """ES intervals query (match rule, ordered, max_gaps) — delegates to
    the positional span kernel via the slop identity."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SLOP_QUERIES, columns=["qid", "query"])
    res = search.search_intervals(
        spark, store, qpdf, max_gaps=INTERVALS_GAPS, ordered=True, k=50
    )
    return _rerank_rounded(res, FT_K)


def q_fts_msearch(spark, sf_dir):
    """ES _msearch: three heterogeneous requests in one call."""
    store = _corpus_store(spark, sf_dir)
    return search.msearch(spark, store, MSEARCH_REQUESTS, k=FT_K)


def _msearch_sql() -> str:
    parts = []
    for req in MSEARCH_REQUESTS:
        qs = [(0, req["query"])]
        if req["kind"] == "match":
            sub = _bm25_sql(qs, FT_K, and_mode=False)
        elif req["kind"] == "match_and":
            sub = _bm25_sql(qs, FT_K, and_mode=True)
        else:
            sub = _phrase_sql(qs, FT_K)
        parts.append(
            f"SELECT CAST({req['slot']} AS BIGINT) AS slot, rank, doc_id, "
            f"score_r FROM ({sub})"
        )
    return "\nUNION ALL ".join(parts)


# --------------------------------- 4z9. pipeline ops III
# Domain clustering over embeddings + percentile-threshold quality gate.

CLUSTER_K = 4
QPCT = 0.25


def q_embed_cluster_stats(spark, sf_dir):
    """Deterministic domain clustering: md5-seeded centroids, one
    max-cosine assignment pass, per-(cluster, label) mix + cohesion."""
    emb = _tbl(spark, sf_dir, "embeddings")
    return ann.cluster_label_stats(emb, k=CLUSTER_K)


def _cluster_stats_sql() -> str:
    return f"""
WITH cent AS (
  SELECT CAST(vec_id AS VARCHAR) AS cid, embedding::DOUBLE[] AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {CLUSTER_K}
),
v AS (
  SELECT CAST(vec_id AS VARCHAR) AS vid, embedding::DOUBLE[] AS vvec,
         CAST(label AS VARCHAR) AS label
  FROM embeddings
),
j AS (
  SELECT v.vid AS vid, v.label AS label, cent.cid AS cid,
         round(list_dot_product(v.vvec, cent.cvec)
               / (sqrt(list_dot_product(v.vvec, v.vvec))
                  * sqrt(list_dot_product(cent.cvec, cent.cvec))), 6)
           AS cos_r
  FROM v CROSS JOIN cent
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vid ORDER BY cos_r DESC, cid ASC
    ) AS rn FROM j
  ) WHERE rn = 1
)
SELECT cid AS cluster, label, CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(round(cos_r * 1e6) AS BIGINT))
             / (count(*) * 1e6), 6) AS avg_cos_r
FROM best GROUP BY cid, label
"""


C4_WPL, C4_MINLINES = 3, 2


def q_text_c4_clean(spark, sf_dir):
    """C4-style line cleaning over a deterministically line-structured
    view of the corpus (4-word lines, every 3rd line unpunctuated,
    lorem-ipsum / brace markers on doc_id strata) — both engines derive
    the identical structure from (text, doc_id)."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("did"),
        F.col("doc_id").cast("string").alias("doc_id"), "text",
    )
    lines = (
        "transform(sequence(0, CAST(floor((size(split(text, ' ')) - 1) "
        "/ 4) AS INT)), i -> concat(array_join(slice(split(text, ' '), "
        "i * 4 + 1, 4), ' '), CASE WHEN i % 3 = 0 THEN '' "
        "ELSE '.' END))"
    )
    with_markers = (
        f"CASE WHEN did % 17 = 0 THEN concat({lines}, "
        "array('lorem ipsum dolor sit amet.')) "
        f"WHEN did % 23 = 0 THEN concat({lines}, "
        "array('config { x } done here.')) "
        f"ELSE {lines} END"
    )
    structured = docs.select(
        "doc_id",
        F.expr(f"array_join({with_markers}, '\n')").alias("text"),
    )
    return quality.c4_clean(
        structured, min_words_per_line=C4_WPL, min_kept_lines=C4_MINLINES
    )


def _c4_clean_sql() -> str:
    lines = (
        "list_transform(range(0, CAST(floor((len(tk) - 1) / 4) "
        "AS BIGINT) + 1), i -> array_to_string(list_slice(tk, "
        "i * 4 + 1, i * 4 + 4), ' ') || CASE WHEN i % 3 = 0 THEN '' "
        "ELSE '.' END)"
    )
    return f"""
WITH base AS (
  SELECT doc_id AS did, CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(text, ' ') AS tk
  FROM documents
),
st AS (
  SELECT doc_id,
         CASE WHEN did % 17 = 0
              THEN list_append({lines}, 'lorem ipsum dolor sit amet.')
              WHEN did % 23 = 0
              THEN list_append({lines}, 'config {{ x }} done here.')
              ELSE {lines} END AS lines
  FROM base
),
f AS (
  SELECT doc_id, lines,
         array_to_string(lines, chr(10)) AS full_text,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]\\s*$')
           AND len(regexp_split_to_array(trim(l), ' +')) >= {C4_WPL}
           AND NOT contains(lower(l), 'javascript')) AS kept
  FROM st
),
o AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept,
         (NOT contains(lower(full_text), 'lorem ipsum')
          AND NOT contains(full_text, '{{')
          AND len(kept) >= {C4_MINLINES}) AS keep_doc,
         kept
  FROM f
)
SELECT doc_id, n_lines, n_kept, keep_doc,
       CASE WHEN keep_doc THEN array_to_string(kept, chr(10)) END
         AS clean_text
FROM o
"""


PRUNE_K, PRUNE_FRAC = 8, 0.3


def q_prune_prototypes(spark, sf_dir):
    """SSL-prototypes pruning: drop the 30% most prototypical members
    of each md5-seeded cosine cluster (keep the hard/diverse tail)."""
    emb = _tbl(spark, sf_dir, "embeddings")
    return ann.prune_prototypes(emb, k=PRUNE_K, prune_frac=PRUNE_FRAC)


def _prune_prototypes_sql() -> str:
    return f"""
WITH cent AS (
  SELECT CAST(vec_id AS VARCHAR) AS cid, embedding::DOUBLE[] AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {PRUNE_K}
),
v AS (
  SELECT CAST(vec_id AS VARCHAR) AS vid, embedding::DOUBLE[] AS vvec
  FROM embeddings
),
j AS (
  SELECT v.vid AS vid, cent.cid AS cid,
         round(list_dot_product(v.vvec, cent.cvec)
               / (sqrt(list_dot_product(v.vvec, v.vvec))
                  * sqrt(list_dot_product(cent.cvec, cent.cvec))), 6)
           AS cos_r
  FROM v CROSS JOIN cent
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vid ORDER BY cos_r DESC, cid ASC
    ) AS rn FROM j
  ) WHERE rn = 1
),
sized AS (
  SELECT vid, cid, cos_r,
         row_number() OVER (
           PARTITION BY cid ORDER BY cos_r DESC, vid ASC
         ) AS pr,
         count(*) OVER (PARTITION BY cid) AS n
  FROM best
)
SELECT vid AS vec_id, cid AS cluster, cos_r,
       pr <= floor(n * {PRUNE_FRAC}) AS pruned
FROM sized
"""


def q_documents_quality_pct(spark, sf_dir):
    """Percentile-threshold adaptive quality gate: keep docs at or
    above the corpus P25 quality score; per-lang kept counts."""
    return quality.quality_percentile_filter(
        _docs(spark, sf_dir), pct=QPCT
    )


def _quality_pct_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in T.STOPWORDS)
    return f"""
WITH x AS (
  SELECT lang, text, {DOC_TOKS} AS toks FROM documents
),
m AS (
  SELECT lang,
         CAST(len(toks) AS BIGINT) AS n_tok,
         len(regexp_extract_all(text, '{T.PUNCT_RE}'))
           / greatest(length(text), 1) AS punct,
         len(list_filter(toks, t -> t IN ({stop})))
           / greatest(len(toks), 1) AS stop
  FROM x
),
base AS (
  SELECT lang,
         round(least(n_tok / 100.0, 1.0) * 0.4
               + (1.0 - least(punct * 4.0, 1.0)) * 0.3
               + least(stop * 5.0, 1.0) * 0.3, 6) AS q_r
  FROM m
),
thr AS (SELECT quantile_cont(q_r, {QPCT}) AS t FROM base)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(avg(q_r), 6) AS avg_q_r
FROM base, thr WHERE q_r >= t
GROUP BY lang
"""


# --------------------------------- 4z10. point-in-time + sliced scroll

SLICES, SLICED_PAGE = 3, 7
SLICED_QUERY = "spark merge"


def q_fts_pit_counts(spark, sf_dir):
    """Point-in-time liveness over the post-delete store's batch log:
    as-of the base build (batch 0) every doc is live; as-of the delete
    batch (batch 1) the match set is gone — both computed from the same
    immutable store."""
    st = _mgmt_stores(spark, sf_dir)[0]
    return manage.count_as_of(spark, st, [0, 1], group_col="lang")


def _pit_sql() -> str:
    return f"""{_BM25_BODY},{_match_m_cte([(0, MGMT_DEL_QUERY)])}
SELECT CAST(0 AS BIGINT) AS batch, lang AS "group",
       CAST(count(*) AS BIGINT) AS n_live
FROM documents GROUP BY lang
UNION ALL
SELECT CAST(1 AS BIGINT), lang, CAST(count(*) AS BIGINT)
FROM documents doc
WHERE CAST(doc.doc_id AS VARCHAR) NOT IN (SELECT doc_id FROM m)
GROUP BY lang
"""


def q_fts_scroll_sliced(spark, sf_dir):
    """ES sliced scroll: the full export of one query split into
    disjoint md5-hash slices, each drained through the keyset pager
    (page_size small enough to force multiple pages per slice)."""
    store = _corpus_store(spark, sf_dir)
    frames = []
    for s in range(SLICES):
        rows = [
            page[["doc_id", "score_r"]]
            for page in search.scroll_sliced(
                spark, store, SLICED_QUERY, s, SLICES,
                page_size=SLICED_PAGE,
            )
        ]
        if not rows:
            continue
        pdf = pd.concat(rows, ignore_index=True)
        pdf.insert(0, "slice", s)
        pdf.insert(1, "rank", range(1, len(pdf) + 1))
        frames.append(pdf)
    out = pd.concat(frames, ignore_index=True)
    return spark.createDataFrame(out).select(
        F.col("slice").cast("long").alias("slice"),
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "score_r",
    )


def _scroll_sliced_sql() -> str:
    toks = analysis.tokenize_series(pd.Series([SLICED_QUERY]))[0]
    vals = [
        f"(0, '{t}', {qtf})" for t, qtf in sorted(Counter(toks).items())
    ]
    return f"""{_BM25_BODY},
q(qid, term, qtf) AS (VALUES {", ".join(vals)}),
scored AS (
  SELECT p.doc_id AS doc_id,
         round(sum(q.qtf * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * ({K1} + 1.0) * p.tf
                   / (p.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ), 6) AS score_r
  FROM q
  JOIN posting p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT CAST(floor((('0x' || substr(md5(doc_id), 1, 8))::BIGINT
                   / 4294967296.0) * {SLICES}) AS BIGINT) AS slice,
       CAST(row_number() OVER (
         PARTITION BY floor((('0x' || substr(md5(doc_id), 1, 8))::BIGINT
                             / 4294967296.0) * {SLICES})
         ORDER BY score_r DESC, doc_id ASC
       ) AS BIGINT) AS rank,
       doc_id, score_r
FROM scored
"""


# ---------- 4g3. extended_stats_bucket / variable_width / categorize_text

VWH_BUCKETS = 4
CAT_MAX_TOKENS = 4
CAT_SIZE = 5


def q_fts_extended_stats_bucket(spark, sf_dir):
    """ES extended_stats_bucket sibling pipeline agg: extended stats
    (sum of squares, population variance/std, ±2σ bounds) over histogram
    per-bucket doc counts."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_extended_stats_bucket(
        spark, store, qpdf, interval=HIST_INTERVAL, value_col="dl"
    )


def _extended_stats_bucket_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
hist AS (
  SELECT m.qid AS qid,
         floor(dl.dl / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
         count(*) AS n_docs
  FROM m JOIN dl ON dl.doc_id = m.doc_id
  GROUP BY m.qid, bucket
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(n_docs) AS BIGINT) AS min_bucket,
       CAST(max(n_docs) AS BIGINT) AS max_bucket,
       round(avg(CAST(n_docs AS DOUBLE)), 6) AS avg_bucket_r,
       CAST(sum(n_docs) AS BIGINT) AS sum_bucket,
       CAST(sum(n_docs * n_docs) AS BIGINT) AS sum_sq_bucket,
       round(var_pop(CAST(n_docs AS DOUBLE)), 6) AS variance_r,
       round(stddev_pop(CAST(n_docs AS DOUBLE)), 6) AS std_dev_r,
       round(avg(CAST(n_docs AS DOUBLE))
             + 2.0 * stddev_pop(CAST(n_docs AS DOUBLE)), 6) AS std_upper_r,
       round(avg(CAST(n_docs AS DOUBLE))
             - 2.0 * stddev_pop(CAST(n_docs AS DOUBLE)), 6) AS std_lower_r
FROM hist GROUP BY qid
"""


def q_fts_variable_width_histogram(spark, sf_dir):
    """ES variable_width_histogram: equal-frequency deterministic variant
    (pinned ntile clustering — ES's one-pass heuristic is shard-order
    dependent by design; see search_variable_width_histogram)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_variable_width_histogram(
        spark, store, qpdf, n_buckets=VWH_BUCKETS, value_col="dl"
    )


def _variable_width_histogram_sql(queries) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
tiles AS (
  SELECT m.qid AS qid,
         CAST(dl.dl AS DOUBLE) AS v,
         ntile({VWH_BUCKETS}) OVER (
           PARTITION BY m.qid ORDER BY dl.dl ASC, m.doc_id ASC
         ) AS bucket
  FROM m JOIN dl ON dl.doc_id = m.doc_id
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(v) AS min_v, max(v) AS max_v,
       round(avg(v), 6) AS avg_v_r
FROM tiles GROUP BY qid, bucket
"""


def q_fts_categorize_text(spark, sf_dir):
    """ES categorize_text agg: top log-pattern categories of the match
    set (digit-free token prefix as the pinned deterministic key)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_categorize_text(
        spark, store, qpdf, _docs(spark, sf_dir),
        id_col="doc_id", text_col="text",
        max_tokens=CAT_MAX_TOKENS, size=CAT_SIZE,
    )


def _categorize_text_sql(queries) -> str:
    cat = (
        f"array_to_string(list_slice(list_filter({DOC_TOKS}, "
        f"t -> NOT regexp_matches(t, '[0-9]')), 1, {CAT_MAX_TOKENS}), ' ')"
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
cats AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {cat} AS category
  FROM documents
),
counts AS (
  SELECT m.qid AS qid, c.category AS category,
         count(*) AS n_docs, min(m.doc_id) AS example_doc_id
  FROM m JOIN cats c ON c.doc_id = m.doc_id
  GROUP BY m.qid, c.category
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY n_docs DESC, category ASC
         ) AS INTEGER) AS rank,
         category, CAST(n_docs AS BIGINT) AS n_docs, example_doc_id
  FROM counts
)
SELECT qid, rank, category, n_docs, example_doc_id
FROM ranked WHERE rank <= {CAT_SIZE}
"""


# ---------- 4h. sparse_vector (ELSER-style learned sparse retrieval)

SV_QUERIES: list[tuple[int, dict[str, float]]] = [
    (0, {"spark": 2.0, "merge": 1.0, "window": 0.5}),
    (1, {"customer": 1.5, "stream": 0.25}),
    (2, {"absentzzz": 3.0, "key": 1.0}),
]


def q_fts_sparse_vector(spark, sf_dir):
    """ES sparse_vector / text_expansion: term->weight query vectors dot
    ln(1+tf) doc impacts over the inverted index."""
    store = _corpus_store(spark, sf_dir)
    rows = [
        (qid, t, w) for qid, vec in SV_QUERIES for t, w in vec.items()
    ]
    qv = pd.DataFrame(rows, columns=["qid", "term", "w"])
    res = search.search_sparse_vector(spark, store, qv, k=50)
    return _rerank_rounded(res, FT_K)


def _sparse_vector_sql(
    queries: list[tuple[int, dict[str, float]]], k: int
) -> str:
    vals = ", ".join(
        f"({qid}, '{t}', {w!r})"
        for qid, vec in queries
        for t, w in sorted(vec.items())
    )
    return f"""{_BM25_BODY},
q(qid, term, w) AS (VALUES {vals}),
scored AS (
  SELECT q.qid AS qid, p.doc_id AS doc_id,
         sum(q.w * ln(1.0 + p.tf)) AS score
  FROM q JOIN posting p ON p.term = q.term
  GROUP BY q.qid, p.doc_id
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
         round(score, 6) AS score_r,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY round(score, 6) DESC, doc_id ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score_r FROM ranked WHERE rank <= {k}
"""


# ---------- 4i. ip_range agg + partitioned terms agg

IP_RANGES: list[tuple[str, str | None, str | None]] = [
    ("low", None, "64.0.0.0"),
    ("mid", "64.0.0.0", "192.0.0.0"),
    ("high", "192.0.0.0", None),
    ("pin", "10.0.0.0", "10.0.0.1"),
]
TERMS_PARTS = 3
TERMS_PART = 1


def q_fts_ip_range(spark, sf_dir):
    """ES ip_range agg: [from, to) IPv4 buckets over the match set's ip
    doc field (overlap allowed, zero buckets kept)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_ip_range_agg(
        spark, store, qpdf, IP_RANGES, value_col="ip"
    )


def _ip_range_sql(queries, ranges) -> str:
    rows = []
    for key, lo, hi in ranges:
        lo_i = -1 if lo is None else search._ip4_to_int(lo)
        hi_i = (1 << 32) if hi is None else search._ip4_to_int(hi)
        rows.append(f"('{key}', {lo_i}, {hi_i})")
    qvals = ", ".join(f"({qid})" for qid, _ in queries)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
ips AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         ((doc_id % 4294967296) * 31153 + (((doc_id % 4294967296) * 40503) % 65536) * 65536) % 4294967296 AS ip
  FROM documents
),
r(range_key, lo, hi) AS (VALUES {", ".join(rows)}),
qs(qid) AS (VALUES {qvals}),
cnt AS (
  SELECT m.qid AS qid, r.range_key AS range_key, count(*) AS n
  FROM m
  JOIN ips ON ips.doc_id = m.doc_id
  JOIN r ON ips.ip >= r.lo AND ips.ip < r.hi
  GROUP BY m.qid, r.range_key
)
SELECT CAST(qs.qid AS BIGINT) AS qid, r.range_key AS range_key,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_docs
FROM qs CROSS JOIN r
LEFT JOIN cnt ON cnt.qid = qs.qid AND cnt.range_key = r.range_key
"""


IP_PREFIX_LEN = 6
IP_PREFIX_MIN = 2


def q_fts_ip_prefix(spark, sf_dir):
    """ES ip_prefix agg: match-set docs bucketed by the /6 network of
    the derived IPv4 field, buckets under min_doc_count dropped."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_ip_prefix(
        spark, store, qpdf, IP_PREFIX_LEN, value_col="ip",
        min_doc_count=IP_PREFIX_MIN,
    )


def _ip_prefix_sql(queries, prefix_length, min_doc_count) -> str:
    shift = 1 << (32 - prefix_length)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
ips AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         ((doc_id % 4294967296) * 31153 + (((doc_id % 4294967296) * 40503) % 65536) * 65536) % 4294967296 AS ip
  FROM documents
),
nets AS (
  SELECT doc_id,
         CAST(floor(ip / {shift}) * {shift} AS BIGINT) AS net
  FROM ips
)
SELECT CAST(m.qid AS BIGINT) AS qid,
       CAST(floor(n.net / 16777216) % 256 AS BIGINT) || '.' ||
       CAST(floor(n.net / 65536) % 256 AS BIGINT) || '.' ||
       CAST(floor(n.net / 256) % 256 AS BIGINT) || '.' ||
       CAST(n.net % 256 AS BIGINT) AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN nets n ON n.doc_id = m.doc_id
GROUP BY m.qid, prefix
HAVING count(*) >= {min_doc_count}
"""


IP6_RANGES: list[tuple[str, str | None, str | None]] = [
    ("low", None, "2001:db8:4000::"),
    ("mid", "2001:db8:4000::", "2001:db8:c000::"),
    ("high", "2001:db8:c000::", None),
    ("v4", "0.0.0.0", None),          # v4-mapped space: no native-v6 doc
]
IP6_PREFIX_LEN = 36                   # 2 full groups + 4 bits of group 3
IP6_PREFIX_MIN = 2


def q_fts_ip_range_v6(spark, sf_dir):
    """Dual-stack ip_range: [from, to) buckets over the synthetic IPv6
    doc field (normalized-hex string compare), with a v4-mapped range
    proving the two stacks never cross."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_ip_range_agg(
        spark, store, qpdf, IP6_RANGES, value_col="ip6"
    )


def _ip6_hex(lit: str) -> str:
    """Independent bound normalization for the oracle (stdlib only)."""
    import ipaddress

    a = ipaddress.ip_address(lit)
    n = int(a) if a.version == 6 else (0xFFFF00000000 | int(a))
    return format(n, "032x")


def _ip6_doc_hex_sql() -> str:
    """The v6 doc value '2001:db8:h1::h2' normalized to 32-hex, derived
    in DuckDB from doc_id arithmetic (independent of the engine's
    string-normalization path)."""
    h = ("((doc_id % 4294967296) * 31153 + (((doc_id % 4294967296) "
         "* 40503) % 65536) * 65536) % 4294967296")
    return (
        f"'20010db8' || lpad(lower(to_hex(CAST(floor({h} / 65536) "
        f"AS BIGINT))), 4, '0') || '0000000000000000' || "
        f"lpad(lower(to_hex(CAST({h} % 65536 AS BIGINT))), 4, '0')"
    )


def _ip6_range_sql(queries, ranges) -> str:
    rows = []
    for key, lo, hi in ranges:
        lo_h = "" if lo is None else _ip6_hex(lo)
        hi_h = "g" if hi is None else _ip6_hex(hi)
        rows.append(f"('{key}', '{lo_h}', '{hi_h}')")
    qvals = ", ".join(f"({qid})" for qid, _ in queries)
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
ips AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_ip6_doc_hex_sql()} AS hx
  FROM documents
),
r(range_key, lo, hi) AS (VALUES {", ".join(rows)}),
qs(qid) AS (VALUES {qvals}),
cnt AS (
  SELECT m.qid AS qid, r.range_key AS range_key, count(*) AS n
  FROM m
  JOIN ips ON ips.doc_id = m.doc_id
  JOIN r ON ips.hx >= r.lo AND ips.hx < r.hi
  GROUP BY m.qid, r.range_key
)
SELECT CAST(qs.qid AS BIGINT) AS qid, r.range_key AS range_key,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_docs
FROM qs CROSS JOIN r
LEFT JOIN cnt ON cnt.qid = qs.qid AND cnt.range_key = r.range_key
"""


def q_fts_ip_prefix_v6(spark, sf_dir):
    """Dual-stack ip_prefix: /36 network buckets of the IPv6 doc field
    (nibble-masked hex arithmetic), keys rendered as all 8 groups with
    leading zeros stripped."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_ip_prefix(
        spark, store, qpdf, IP6_PREFIX_LEN, value_col="ip6",
        min_doc_count=IP6_PREFIX_MIN, is_ipv6=True,
    )


def _ip6_prefix_sql(queries, prefix_length, min_doc_count) -> str:
    # /36 ⇒ groups 1-2 fixed ('2001', 'db8'), group 3 = h1 masked to its
    # top 4 bits, groups 4-8 zero — recomputed numerically from doc_id
    assert prefix_length == 36
    h = ("((doc_id % 4294967296) * 31153 + (((doc_id % 4294967296) "
         "* 40503) % 65536) * 65536) % 4294967296")
    g3 = (f"lower(to_hex(CAST(floor(floor({h} / 65536) / 4096) * 4096 "
          f"AS BIGINT)))")
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
nets AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         '2001:db8:' || {g3} || ':0:0:0:0:0' AS prefix
  FROM documents
)
SELECT CAST(m.qid AS BIGINT) AS qid, n.prefix AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN nets n ON n.doc_id = m.doc_id
GROUP BY m.qid, n.prefix
HAVING count(*) >= {min_doc_count}
"""


def q_fts_terms_agg_partition(spark, sf_dir):
    """ES terms agg partitioned fetch: only buckets hashing into the
    requested partition (md5-pinned assignment, disjoint + exhaustive
    over partitions)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_terms_agg(
        spark, store, qpdf, group_col="source",
        partition=TERMS_PART, num_partitions=TERMS_PARTS,
    )


def _terms_agg_partition_sql(queries) -> str:
    return f"""{_doc_join_sql(queries)}
SELECT CAST(qid AS BIGINT) AS qid, source AS "group",
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(CAST(dl AS DOUBLE)), 6) AS avg_value_r
FROM md
WHERE ('0x' || substr(md5(source), 1, 8))::BIGINT % {TERMS_PARTS}
      = {TERMS_PART}
GROUP BY qid, source
"""


# ---------- 4j. DSIR importance resampling (Xie et al. 2023)

DSIR_K = 200
DSIR_TARGET = "src1"
DSIR_BUCKETS = 64


def q_dsir_select(spark, sf_dir):
    """DSIR: top-k raw docs by hashed-ngram importance ratio against the
    src1 'target domain' sample."""
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source") == DSIR_TARGET)
    return dsir.dsir_select(
        spark, docs, target, k=DSIR_K, n_buckets=DSIR_BUCKETS
    )


def _dsir_sql(k: int, target: str, n_buckets: int) -> str:
    return f"""
WITH tk AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source, {DOC_TOKS} AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, source, unnest(toks) AS gram FROM tk
  UNION ALL
  SELECT doc_id, source,
         unnest(CASE WHEN len(toks) >= 2
                THEN list_transform(range(2, len(toks) + 1),
                                    i -> toks[i - 1] || ' ' || toks[i])
                ELSE [] END) AS gram
  FROM tk
),
bc AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {n_buckets} AS bucket,
         count(*) AS c
  FROM grams GROUP BY doc_id, source, bucket
),
dense AS (SELECT unnest(range(0, {n_buckets})) AS bucket),
ptot AS (
  SELECT bucket, sum(c) AS n_b FROM bc
  WHERE source = '{target}' GROUP BY bucket
),
qtot AS (SELECT bucket, sum(c) AS n_b FROM bc GROUP BY bucket),
lr AS (
  SELECT d.bucket AS bucket,
         ln((COALESCE(p.n_b, 0) + 1.0)
            / ((SELECT count(*) FROM grams WHERE source = '{target}')
               + {n_buckets}.0))
       - ln((COALESCE(q.n_b, 0) + 1.0)
            / ((SELECT count(*) FROM grams) + {n_buckets}.0)) AS lr
  FROM dense d
  LEFT JOIN ptot p ON p.bucket = d.bucket
  LEFT JOIN qtot q ON q.bucket = d.bucket
),
w AS (
  SELECT bc.doc_id AS doc_id, round(sum(bc.c * lr.lr), 6) AS logw_r
  FROM bc JOIN lr ON lr.bucket = bc.bucket
  GROUP BY bc.doc_id
),
ranked AS (
  SELECT CAST(row_number() OVER (
           ORDER BY logw_r DESC, doc_id ASC
         ) AS INTEGER) AS rank, doc_id, logw_r
  FROM w
)
SELECT rank, doc_id, logw_r FROM ranked WHERE rank <= {k}
"""


# ---------- 4k. Bloom-filter membership gate

BLOOM_REF = "src2"
BLOOM_N_BITS = 4096
BLOOM_N_HASHES = 3


def q_dedup_bloom(spark, sf_dir):
    """Bloom-filter cross-corpus membership: flag docs whose normalized
    fingerprint MAY appear in the src2 reference slice (false positives
    are part of the contract — the oracle reproduces the same filter)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", T.fingerprint_md5("text").alias("fp")
    )
    ref = docs.filter(F.col("source") == BLOOM_REF)
    return dedup.bloom_membership(
        docs, ref, key_col="fp",
        id_col="doc_id", n_bits=BLOOM_N_BITS, n_hashes=BLOOM_N_HASHES,
    )


def _bloom_sql(ref_src: str, n_bits: int, n_hashes: int) -> str:
    return f"""
WITH keyed AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         md5(array_to_string({DOC_TOKS}, ' ')) AS k
  FROM documents
),
probe AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(k || '#' || CAST(t.i AS VARCHAR)), 1, 8))
         ::BIGINT % {n_bits} AS bit
  FROM keyed, range(0, {n_hashes}) t(i)
),
bits AS (
  SELECT DISTINCT bit FROM probe WHERE source = '{ref_src}'
),
need AS (
  SELECT doc_id, count(DISTINCT bit) AS need FROM probe GROUP BY doc_id
),
hits AS (
  SELECT p.doc_id AS doc_id, count(DISTINCT p.bit) AS h
  FROM probe p JOIN bits b ON b.bit = p.bit
  GROUP BY p.doc_id
)
SELECT n.doc_id AS doc_id,
       COALESCE(h.h, 0) = n.need AS maybe_dup
FROM need n LEFT JOIN hits h ON h.doc_id = n.doc_id
"""


# ---------- 4l. frequent_item_sets (pair itemsets over indexed terms)

FIS_MIN_SUPPORT = 20
FIS_SIZE = 8


def q_fts_frequent_item_sets(spark, sf_dir):
    """ES frequent_item_sets (size-2): top co-occurring term pairs of
    the match set, apriori-pruned via term_stats, items read from the
    index's own postings."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_frequent_item_sets(
        spark, store, qpdf, min_support=FIS_MIN_SUPPORT, size=FIS_SIZE
    )


def _frequent_item_sets_sql(queries, min_support: int, size: int) -> str:
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
freq AS (SELECT term FROM dfreq WHERE df >= {min_support}),
items AS (
  SELECT m.qid AS qid, m.doc_id AS doc_id, p.term AS term
  FROM m
  JOIN posting p ON p.doc_id = m.doc_id
  JOIN freq f ON f.term = p.term
),
pairs AS (
  SELECT a.qid AS qid, a.term AS item1, b.term AS item2,
         count(*) AS support
  FROM items a
  JOIN items b
    ON a.qid = b.qid AND a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.qid, a.term, b.term
  HAVING count(*) >= {min_support}
),
ranked AS (
  SELECT CAST(qid AS BIGINT) AS qid,
         CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY support DESC, item1 ASC, item2 ASC
         ) AS INTEGER) AS rank,
         item1, item2, CAST(support AS BIGINT) AS support
  FROM pairs
)
SELECT qid, rank, item1, item2, support FROM ranked WHERE rank <= {size}
"""


# ---------- 4m. geohash_grid (true base32 geohash buckets)

GEOHASH_PRECISION = 3


def q_fts_geohash_grid(spark, sf_dir):
    """ES geohash_grid: true base32 geohash cells of the match set's
    points (spec-validated encoder shared with the oracle)."""
    store = _corpus_store(spark, sf_dir)
    qpdf = pd.DataFrame(SORTED_QUERIES, columns=["qid", "query"])
    return search.search_geohash_grid(
        spark, store, qpdf, precision=GEOHASH_PRECISION
    )


def _geohash_grid_sql(queries, precision: int) -> str:
    lat_q, lon_q, cell, b32 = search.geohash_exprs(
        f"CAST({_SQL_LAT.replace('doc.', '')} AS DOUBLE)",
        f"CAST({_SQL_LON.replace('doc.', '')} AS DOUBLE)",
        precision,
    )
    return f"""{_BM25_BODY},{_match_m_cte(queries)},
q1 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {lat_q} AS _latq, {lon_q} AS _lonq
  FROM documents
),
q2 AS (SELECT doc_id, ({cell}) AS _cell FROM q1),
q3 AS (SELECT doc_id, {b32} AS geohash FROM q2)
SELECT CAST(m.qid AS BIGINT) AS qid, q3.geohash AS geohash,
       CAST(count(*) AS BIGINT) AS n_docs
FROM m JOIN q3 ON q3.doc_id = m.doc_id
GROUP BY m.qid, q3.geohash
"""


# ----------------------------------------------------------- registries


# Oracles that evaluate an ENGINE-GENERATED expression verbatim instead of
# an independent re-derivation (ADVICE r4: such gates self-verify the
# shared expression; they are annotated here and in the local correctness
# artifact, and each is independently validated another way):
#   - fts_geo_polygon: shares search.geo_polygon_expr — fuzz-verified
#     against a pure-Python even-odd ray-caster (tests/test_round4_geo2.py)
#   - fts_geohash_grid: shares search.geohash_exprs — validated against
#     the geohash spec's PUBLISHED vectors (tests)
# The Lucene query_string gates were de-shared in r5 (independent parser +
# compiler in _oracle_lucene_parse/_oracle_lucene_plan above).
COMPILER_SHARED_ORACLES = {
    "fts_geo_polygon": "shares geo_polygon_expr; fuzzed vs pure-Python",
    "fts_geohash_grid": "shares geohash_exprs; spec-vector validated",
}

SPARK_QUERIES = {
    "fts_pit_counts": q_fts_pit_counts,
    "fts_scroll_sliced": q_fts_scroll_sliced,
    "embed_cluster_stats": q_embed_cluster_stats,
    "documents_quality_pct": q_documents_quality_pct,
    "fts_terms_set": q_fts_terms_set,
    "fts_runtime_field": q_fts_runtime_field,
    "fts_collapse_inner": q_fts_collapse_inner,
    "fts_intervals": q_fts_intervals,
    "fts_msearch": q_fts_msearch,
    "fts_mad": q_fts_mad,
    "fts_boxplot": q_fts_boxplot,
    "fts_t_test": q_fts_t_test,
    "fts_matrix_stats": q_fts_matrix_stats,
    "events_date_range": q_events_date_range,
    "events_auto_date_histogram": q_events_auto_date_histogram,
    "fts_delete_by_query": q_fts_delete_by_query,
    "fts_update_by_query": q_fts_update_by_query,
    "fts_reindex": q_fts_reindex,
    "fts_alias": q_fts_alias,
    "fts_rrf": q_fts_rrf,
    "fts_hybrid_linear": q_fts_hybrid_linear,
    "fts_rank_eval": q_fts_rank_eval,
    "doc_stats": q_doc_stats,
    "term_df": q_term_df,
    "fts_bm25_topk": q_fts_bm25,
    "fts_bm25_and": q_fts_bm25_and,
    "fts_bm25_filtered": q_fts_bm25_filtered,
    "fts_facet_lang": q_fts_facet_lang,
    "fts_bool": q_fts_bool,
    "fts_bool_msm": q_fts_bool_msm,
    "fts_more_like_this": q_fts_more_like_this,
    "fts_highlight": q_fts_highlight,
    "fts_phrase": q_fts_phrase,
    "fts_phrase_slop": q_fts_phrase_slop,
    "fts_span_first": q_fts_span_first,
    "fts_prefix": q_fts_prefix,
    "fts_fuzzy": q_fts_fuzzy,
    "fts_match_fuzzy": q_fts_match_fuzzy,
    "fts_wildcard": q_fts_wildcard,
    "fts_regexp": q_fts_regexp,
    "fts_phrase_prefix": q_fts_phrase_prefix,
    "fts_dis_max": q_fts_dis_max,
    "fts_multi_match": q_fts_multi_match,
    "fts_nested_field": q_fts_nested_field,
    "fts_nested_agg": q_fts_nested_agg,
    "fts_nested_query": q_fts_nested_query,
    "fts_synonyms": q_fts_synonyms,
    "fts_fuzzy_auto": q_fts_fuzzy_auto,
    "fts_suggest_popular": q_fts_suggest_popular,
    "fts_match_bool_prefix": q_fts_match_bool_prefix,
    "fts_index_stats": q_fts_index_stats,
    "fts_distance_feature": q_fts_distance_feature,
    "fts_pinned": q_fts_pinned,
    "fts_count": q_fts_count,
    "fts_terms_lookup": q_fts_terms_lookup,
    "fts_suggest_missing": q_fts_suggest_missing,
    "fts_filters_agg": q_fts_filters_agg,
    "fts_script_score": q_fts_script_score,
    "fts_span_or": q_fts_span_or,
    "fts_span_multi": q_fts_span_multi,
    "fts_script_fields": q_fts_script_fields,
    "fts_script_query": q_fts_script_query,
    "fts_matched_queries": q_fts_matched_queries,
    "fts_multi_match_phrase": q_fts_multi_match_phrase,
    "fts_span_not": q_fts_span_not,
    "fts_span_containing": q_fts_span_containing,
    "fts_span_within": q_fts_span_within,
    "fts_terms": q_fts_terms,
    "fts_function_score": q_fts_function_score,
    "fts_exists": q_fts_exists,
    "fts_query_string": q_fts_query_string,
    "fts_lucene_query_string": q_fts_lucene_qs,
    "fts_lucene_qs_and": q_fts_lucene_qs_and,
    "fts_lucene_qs_fields": q_fts_lucene_qs_fields,
    "fts_boosting": q_fts_boosting,
    "fts_sorted": q_fts_sorted,
    "fts_suggest": q_fts_suggest,
    "fts_stats_agg": q_fts_stats_agg,
    "fts_histogram": q_fts_histogram,
    "fts_cardinality": q_fts_cardinality,
    "fts_percentiles": q_fts_percentiles,
    "fts_top_hits": q_fts_top_hits,
    "fts_has_parent": q_fts_has_parent,
    "fts_has_child": q_fts_has_child,
    "fts_children_agg": q_fts_children_agg,
    "fts_has_child_inner": q_fts_has_child_inner,
    "corpus_perplexity_buckets": q_corpus_perplexity_buckets,
    "corpus_top_ngrams": q_corpus_top_ngrams,
    "fts_parent_id": q_fts_parent_id,
    "fts_random_sampler": q_fts_random_sampler,
    "fts_percentile_ranks": q_fts_percentile_ranks,
    "fts_date_range": q_fts_date_range,
    "fts_rescore": q_fts_rescore,
    "fts_significant_terms": q_fts_significant_terms,
    "fts_significant_terms_bg": q_fts_significant_terms_bg,
    "fts_significant_text": q_fts_significant_text,
    "fts_scripted_metric": q_fts_scripted_metric,
    "fts_search_template": q_fts_search_template,
    "fts_percolate": q_fts_percolate,
    "fts_collapse": q_fts_collapse,
    "fts_sharded": q_fts_sharded,
    "fts_sharded_boost": q_fts_sharded_boost,
    "fts_terms_agg_ordered": q_fts_terms_agg_ordered,
    "fts_moving_percentiles": q_fts_moving_percentiles,
    "fts_terms_agg_filtered": q_fts_terms_agg_filtered,
    "corpus_token_budget_fill": q_corpus_token_budget_fill,
    "fts_bucket_correlation": q_fts_bucket_correlation,
    "fts_composite_two_source": q_fts_composite_two_source,
    "fts_suggest_completion_ctx": q_fts_suggest_completion_ctx,
    "fts_min_score": q_fts_min_score,
    "fts_bool_filter": q_fts_bool_filter,
    "fts_suggest_completion": q_fts_suggest_completion,
    "fts_range": q_fts_range,
    "fts_ids": q_fts_ids,
    "fts_bool_range_filter": q_fts_bool_range_filter,
    "fts_match_all": q_fts_match_all,
    "fts_range_agg": q_fts_range_agg,
    "fts_decay": q_fts_decay,
    "fts_span_near": q_fts_span_near,
    "fts_sorted_after": q_fts_sorted_after,
    "fts_wand_msm": q_fts_wand_msm,
    "fts_wand_after": q_fts_wand_after,
    "fts_terms_agg_avg": q_fts_terms_agg,
    "fts_terms_agg_after": q_fts_terms_agg_after,
    "fts_combined_fields": q_fts_combined_fields,
    "fts_rank_feature": q_fts_rank_feature,
    "fts_suggest_phrase": q_fts_suggest_phrase,
    "fts_extended_stats": q_fts_extended_stats,
    "fts_string_stats": q_fts_string_stats,
    "fts_weighted_avg": q_fts_weighted_avg,
    "fts_rare_terms": q_fts_rare_terms,
    "fts_multi_terms": q_fts_multi_terms,
    "fts_top_metrics": q_fts_top_metrics,
    "fts_histogram_pipeline": q_fts_histogram_pipeline,
    "fts_stats_bucket": q_fts_stats_bucket,
    "fts_extended_stats_bucket": q_fts_extended_stats_bucket,
    "fts_variable_width_histogram": q_fts_variable_width_histogram,
    "fts_categorize_text": q_fts_categorize_text,
    "fts_sparse_vector": q_fts_sparse_vector,
    "fts_ip_range": q_fts_ip_range,
    "fts_ip_prefix": q_fts_ip_prefix,
    "fts_ip_range_v6": q_fts_ip_range_v6,
    "fts_search_as_you_type": q_fts_search_as_you_type,
    "fts_ip_prefix_v6": q_fts_ip_prefix_v6,
    "fts_terms_agg_partition": q_fts_terms_agg_partition,
    "dsir_select": q_dsir_select,
    "dedup_bloom": q_dedup_bloom,
    "fts_frequent_item_sets": q_fts_frequent_item_sets,
    "fts_geohash_grid": q_fts_geohash_grid,
    "fts_bucket_sort": q_fts_bucket_sort,
    "fts_adjacency_matrix": q_fts_adjacency_matrix,
    "fts_sampler_terms": q_fts_sampler_terms,
    "fts_moving_fn": q_fts_moving_fn,
    "fts_serial_diff": q_fts_serial_diff,
    "fts_derivative": q_fts_derivative,
    "fts_cumulative_sum": q_fts_cumulative_sum,
    "fts_cumulative_cardinality": q_fts_cumulative_cardinality,
    "events_rate_week": q_events_rate_week,
    "fts_percentiles_bucket": q_fts_percentiles_bucket,
    "fts_bucket_script": q_fts_bucket_script,
    "fts_bucket_selector": q_fts_bucket_selector,
    "fts_termvectors": q_fts_termvectors,
    "fts_analyze": q_fts_analyze,
    "fts_mget": q_fts_mget,
    "fts_geo_distance": q_fts_geo_distance,
    "fts_geo_bbox": q_fts_geo_bbox,
    "fts_global_agg": q_fts_global_agg,
    "fts_missing_value_count": q_fts_missing_value_count,
    "fts_histogram_dense": q_fts_histogram_dense,
    "decontam_embedding": q_decontam_embedding,
    "corpus_token_budget": q_corpus_token_budget,
    "fts_knn_filtered": q_fts_knn_filtered,
    "fts_diversified_sampler": q_fts_diversified_sampler,
    "fts_geo_distance_agg": q_fts_geo_distance_agg,
    "fts_geotile_grid": q_fts_geotile_grid,
    "fts_geohex_grid": q_fts_geohex_grid,
    "fts_geo_shape": q_fts_geo_shape,
    "fts_knn_radius": q_fts_knn_radius,
    "corpus_bpe_fertility": q_corpus_bpe_fertility,
    "text_c4_clean": q_text_c4_clean,
    "prune_prototypes": q_prune_prototypes,
    "fts_geo_polygon": q_fts_geo_polygon,
    "fts_span_field_masking": q_fts_span_field_masking,
    "fts_geo_line": q_fts_geo_line,
    "fts_change_point": q_fts_change_point,
    "dedup_semantic": q_dedup_semantic,
    "corpus_overlap_minhash": q_corpus_overlap_minhash,
    "fts_geo_bounds": q_fts_geo_bounds,
    "fts_geo_centroid": q_fts_geo_centroid,
    "fts_normalize_agg": q_fts_normalize_agg,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_chunk_boilerplate": q_dedup_chunk_boilerplate,
    "dedup_duplicate_spans": q_dedup_duplicate_spans,
    "ann_near_dup_clusters": q_ann_near_dup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "ann_near_dup_pairs": q_ann_near_dup,
    "ann_pq_topk": q_ann_pq_topk,
    "ann_lsh_near_dup": q_ann_lsh_near_dup,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "decontam_ngram": q_decontam_ngram,
    "corpus_sample_mix": q_corpus_sample_mix,
    "corpus_mix_temperature": q_corpus_mix_temperature,
    "text_repetition": q_text_repetition,
    "corpus_pack_sequences": q_corpus_pack_sequences,
    "text_scrub_pii": q_text_scrub_pii,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_meta": q_multimodal_meta,
    "events_date_histogram": q_events_date_histogram,
    "events_date_histogram_month": q_events_date_histogram_month,
    "documents_clean": q_documents_clean,
    "text_perplexity": q_text_perplexity,
    "text_perplexity_indexed": q_text_perplexity_indexed,
    "text_perplexity_trigram": q_text_perplexity_trigram,
    "corpus_chunk_windows": q_corpus_chunk_windows,
    "bpe_pair_counts": q_bpe_pair_counts,
    "events_action_dispatch": q_events_dispatch,
    "events_version_lww": q_events_lww,
    "events_sessionize": q_events_sessions,
    "tpch_q1_pricing_summary": q_tpch_q1,
    "tpch_topk_per_group": q_tpch_topk_orders,
    "tpch_revenue_by_nation": q_tpch_revenue_nation,
}


def oracle_sql() -> dict[str, str]:
    return {
        "doc_stats": SQL_DOC_STATS,
        "term_df": SQL_TERM_DF,
        "fts_bm25_topk": _bm25_sql(FT_QUERIES, FT_K, and_mode=False),
        "fts_bm25_and": _bm25_sql(FT_QUERIES_AND, FT_K, and_mode=True),
        "fts_bm25_filtered": _bm25_filtered_sql(FT_QUERIES, FT_K),
        "fts_facet_lang": _facet_sql(FT_QUERIES),
        "fts_bool": _bool_sql(BOOL_QUERIES, FT_K),
        "fts_bool_msm": _bool_msm_sql(BOOL_MSM_QUERIES, FT_K, BOOL_MSM),
        "fts_more_like_this": _mlt_sql(MLT_QUERIES, FT_K, MLT_MAX_TERMS),
        "fts_highlight": _highlight_sql(FT_QUERIES, HL_K),
        "fts_phrase": _phrase_sql(PHRASE_QUERIES, FT_K),
        "fts_phrase_slop": _phrase_slop_sql(SLOP_QUERIES, FT_K, SLOP),
        "fts_span_first": _span_first_sql(
            SPAN_FIRST_TERMS, FT_K, SPAN_FIRST_END
        ),
        "fts_prefix": _prefix_sql(PREFIX_QUERIES, FT_K),
        "fts_fuzzy": _fuzzy_sql(FUZZY_QUERIES, FT_K),
        "fts_match_fuzzy": _match_fuzzy_sql(MATCH_FUZZY_QUERIES, FT_K),
        "fts_wildcard": _wildcard_sql(WILDCARD_QUERIES, FT_K),
        "fts_regexp": _regexp_sql(REGEXP_QUERIES, FT_K),
        "fts_phrase_prefix": _phrase_prefix_sql(
            PP_QUERIES, FT_K, PP_EXPANSIONS
        ),
        "fts_dis_max": _dis_max_sql(DISMAX_CLAUSES, FT_K, DISMAX_TIE),
        "fts_multi_match": _multi_match_sql(
            MM_QUERIES, FT_K, MM_BOOSTS, MM_TIE
        ),
        "fts_nested_field": _bm25_sql(
            NESTED_QUERIES, FT_K, and_mode=False, toks_sql=SRC_TOKS
        ),
        "fts_script_score": _script_score_sql(FS_QUERIES, FT_K),
        "fts_nested_query": _nested_query_sql(NESTED_Q_QUERIES, FT_K),
        "fts_nested_agg": _nested_agg_sql(SORTED_QUERIES),
        "fts_synonyms": _synonyms_sql(SYN_QUERIES, SYNONYMS, FT_K),
        "fts_fuzzy_auto": _fuzzy_auto_sql(FUZZY_AUTO_QUERIES, FT_K),
        "fts_match_bool_prefix": _match_bool_prefix_sql(MBP_QUERIES, FT_K),
        "fts_index_stats": SQL_INDEX_STATS,
        "fts_distance_feature": _distance_feature_sql(FS_QUERIES, FT_K),
        "fts_pinned": _pinned_sql(FS_QUERIES, PINNED_IDS, FT_K),
        "fts_count": _count_sql(FT_QUERIES),
        "fts_terms_lookup": _terms_lookup_sql(TL_QUERIES, FT_K),
        "fts_suggest_popular": _suggest_mode_sql(
            SUGGEST_MODE_PROBES, SUGGEST_K, SUGGEST_EDITS, "popular"
        ),
        "fts_suggest_missing": _suggest_mode_sql(
            SUGGEST_MODE_PROBES, SUGGEST_K, SUGGEST_EDITS, "missing"
        ),
        "fts_filters_agg": _filters_agg_sql(SORTED_QUERIES, FILTERS_AGG),
        "fts_span_or": _span_or_sql(SPAN_OR_CLAUSES, FT_K),
        "fts_span_multi": _span_multi_sql(SPAN_MULTI_QUERIES, FT_K),
        "fts_script_fields": _script_fields_sql(FT_QUERIES, FT_K),
        "fts_script_query": _script_query_sql(SORTED_QUERIES, FT_K),
        "fts_matched_queries": _matched_queries_sql(NAMED_CLAUSES, FT_K),
        "fts_multi_match_phrase": _mm_phrase_sql(
            MMP_QUERIES, FT_K, MM_BOOSTS, MMP_TIE
        ),
        "fts_span_not": _span_not_sql(SN_INCLUDE, SN_EXCLUDE, FT_K),
        "fts_span_containing": _span_contain_sql(
            SC_BIG, SC_LITTLE, FT_K, "containing"
        ),
        "fts_span_within": _span_contain_sql(
            SW_BIG, SW_LITTLE, FT_K, "within"
        ),
        "fts_terms": _terms_sql(TERMS_QUERIES, FT_K),
        "fts_function_score": _function_score_sql(
            FS_QUERIES, FT_K, FS_WEIGHT, FS_MODIFIER, FS_BOOST_MODE
        ),
        "fts_exists": _exists_sql(FT_K),
        "fts_query_string": _query_string_sql(QS_QUERIES, FT_K),
        "fts_lucene_query_string": _lucene_qs_sql(LQS_QUERIES, FT_K),
        "fts_lucene_qs_and": _lucene_qs_sql(
            LQS_AND_QUERIES, FT_K, "AND", LQS_AND_MSM
        ),
        "fts_lucene_qs_fields": _lucene_qs_sql(
            LQS_FIELDS_QUERIES, FT_K, fields=LQS_FIELDS
        ),
        "fts_boosting": _boosting_sql(BOOSTING_QUERIES, FT_K, BOOSTING_NB),
        "fts_sorted": _sorted_sql(SORTED_QUERIES, FT_K),
        "fts_suggest": _suggest_sql(SUGGEST_PROBES, SUGGEST_K, SUGGEST_EDITS),
        "fts_stats_agg": _stats_agg_sql(SORTED_QUERIES),
        "fts_histogram": _histogram_sql(SORTED_QUERIES, HIST_INTERVAL),
        "fts_cardinality": _cardinality_sql(SORTED_QUERIES),
        "fts_percentiles": _percentiles_sql(SORTED_QUERIES, PCTS),
        "fts_top_hits": _top_hits_sql(SORTED_QUERIES, TOP_HITS_KPG),
        "fts_has_parent": _has_parent_sql(PC_QUERY, FT_K),
        "fts_has_child": _has_child_sql(PC_QUERY, FT_K),
        "fts_children_agg": _children_agg_sql(PC_QUERY),
        "fts_has_child_inner": _has_child_inner_sql(
            PC_QUERY, FT_K, INNER_HITS_SIZE
        ),
        "corpus_perplexity_buckets": _ppl_buckets_sql(),
        "corpus_top_ngrams": _top_ngrams_sql(TOP_NGRAM_N, TOP_NGRAM_K),
        "fts_parent_id": _parent_id_sql(PARENT_ID_QUERY, FT_K),
        "fts_random_sampler": _random_sampler_sql(SORTED_QUERIES, SAMPLER_P),
        "fts_percentile_ranks": _percentile_ranks_sql(
            SORTED_QUERIES, PCT_RANK_VALUES
        ),
        "fts_date_range": _fts_date_range_sql(
            SORTED_QUERIES, FTS_DATE_RANGES
        ),
        "fts_rescore": _rescore_sql(
            RESCORE_QUERIES, FT_K, RESCORE_WINDOW, RESCORE_QW, RESCORE_RW
        ),
        "fts_scripted_metric": _scripted_metric_sql(SORTED_QUERIES),
        "fts_search_template": _search_template_oracle(),
        "fts_significant_text": _significant_text_sql(
            SIG_QUERIES, SIGTXT_SAMPLE_K, SIGTXT_K, SIGTXT_MIN_DC
        ),
        "fts_significant_terms": _significant_terms_sql(
            SIG_QUERIES, SIG_K, SIG_MIN_DC
        ),
        "fts_significant_terms_bg": _significant_terms_bg_sql(
            SIG_QUERIES, SIG_K, SIG_MIN_DC, SIG_BG_FILTER
        ),
        "fts_percolate": _percolate_sql(PERC_QUERIES),
        "fts_collapse": _collapse_sql(COLLAPSE_QUERIES, FT_K),
        "fts_sharded": _bm25_sql(FT_QUERIES, FT_K, and_mode=False),
        "fts_sharded_boost": _sharded_boost_sql(
            FT_QUERIES, FT_K, SHARD_BOOSTS
        ),
        "fts_terms_agg_ordered": _terms_agg_ordered_sql(
            SORTED_QUERIES, TERMS_ORDERED_SIZE, TERMS_ORDERED_MDC
        ),
        "fts_moving_percentiles": _moving_percentiles_sql(
            SORTED_QUERIES, MOVP_INTERVAL, MOVP_WINDOW, MOVP_PCT
        ),
        "fts_terms_agg_filtered": _terms_agg_filtered_sql(SORTED_QUERIES),
        "corpus_token_budget_fill": _token_budget_sql(TOKEN_BUDGET),
        "fts_bucket_correlation": _bucket_correlation_sql(
            SORTED_QUERIES, BCORR_INTERVAL
        ),
        "fts_composite_two_source": _composite_two_source_sql(
            SORTED_QUERIES, COMP2_INTERVAL, COMP2_SIZE, COMP2_AFTER
        ),
        "fts_suggest_completion_ctx": _suggest_ctx_sql(
            CTX_PREFIXES, CTX_K
        ),
        "fts_min_score": _min_score_sql(
            FT_QUERIES, FT_K, MIN_SCORE_FLOOR
        ),
        "fts_bool_filter": _bool_filter_sql(BOOL_FILTER_QUERIES, FT_K),
        "fts_range": _range_sql(),
        "fts_ids": _ids_sql(),
        "fts_bool_range_filter": _bool_range_sql(
            BOOL_QUERIES, FT_K, BOOL_RANGE
        ),
        "fts_match_all": _match_all_sql(),
        "fts_range_agg": _range_agg_sql(SORTED_QUERIES),
        "fts_decay": _decay_sql(SORTED_QUERIES, FT_K),
        "fts_span_near": _span_near_sql(
            SPAN_NEAR_QUERIES, FT_K, SPAN_NEAR_SLOP
        ),
        "fts_sorted_after": _sorted_after_sql(SORTED_QUERIES, FT_K),
        "fts_wand_msm": _wand_msm_sql(WAND_MSM_QUERIES, WAND_MSM, FT_K),
        "fts_wand_after": _wand_after_sql(SORTED_QUERIES, FT_K),
        "fts_terms_agg_avg": _terms_agg_sql(SORTED_QUERIES),
        "fts_terms_agg_after": _terms_agg_after_sql(SORTED_QUERIES),
        "fts_combined_fields": _combined_fields_sql(
            MM_QUERIES, FT_K, CF_WEIGHTS
        ),
        "fts_rank_feature": _rank_feature_sql(SORTED_QUERIES, FT_K),
        "fts_suggest_phrase": _suggest_phrase_sql(),
        "fts_extended_stats": _extended_stats_sql(SORTED_QUERIES),
        "fts_string_stats": _string_stats_sql(SORTED_QUERIES),
        "fts_weighted_avg": _weighted_avg_sql(SORTED_QUERIES),
        "fts_rare_terms": _rare_terms_sql(SORTED_QUERIES),
        "fts_multi_terms": _multi_terms_sql(SORTED_QUERIES),
        "fts_top_metrics": _top_metrics_sql(SORTED_QUERIES),
        "fts_histogram_pipeline": _histogram_pipeline_sql(SORTED_QUERIES),
        "fts_stats_bucket": _stats_bucket_sql(SORTED_QUERIES),
        "fts_extended_stats_bucket": _extended_stats_bucket_sql(
            SORTED_QUERIES
        ),
        "fts_variable_width_histogram": _variable_width_histogram_sql(
            SORTED_QUERIES
        ),
        "fts_categorize_text": _categorize_text_sql(SORTED_QUERIES),
        "fts_sparse_vector": _sparse_vector_sql(SV_QUERIES, FT_K),
        "fts_ip_range": _ip_range_sql(SORTED_QUERIES, IP_RANGES),
        "fts_ip_prefix": _ip_prefix_sql(
            SORTED_QUERIES, IP_PREFIX_LEN, IP_PREFIX_MIN
        ),
        "fts_ip_range_v6": _ip6_range_sql(SORTED_QUERIES, IP6_RANGES),
        "fts_search_as_you_type": _sayt_sql(SAYT_QUERIES, FT_K),
        "fts_ip_prefix_v6": _ip6_prefix_sql(
            SORTED_QUERIES, IP6_PREFIX_LEN, IP6_PREFIX_MIN
        ),
        "fts_terms_agg_partition": _terms_agg_partition_sql(
            SORTED_QUERIES
        ),
        "dsir_select": _dsir_sql(DSIR_K, DSIR_TARGET, DSIR_BUCKETS),
        "dedup_bloom": _bloom_sql(
            BLOOM_REF, BLOOM_N_BITS, BLOOM_N_HASHES
        ),
        "fts_frequent_item_sets": _frequent_item_sets_sql(
            SORTED_QUERIES, FIS_MIN_SUPPORT, FIS_SIZE
        ),
        "fts_geohash_grid": _geohash_grid_sql(
            SORTED_QUERIES, GEOHASH_PRECISION
        ),
        "fts_bucket_sort": _bucket_sort_sql(SORTED_QUERIES),
        "fts_adjacency_matrix": _adjacency_matrix_sql(ADJ_FILTERS),
        "fts_sampler_terms": _sampler_terms_sql(
            SORTED_QUERIES, SAMPLER_SHARD
        ),
        "fts_moving_fn": _moving_fn_sql(SORTED_QUERIES),
        "fts_serial_diff": _serial_diff_sql(SORTED_QUERIES),
        "fts_derivative": _derivative_sql(SORTED_QUERIES),
        "fts_cumulative_sum": _cumulative_sum_sql(SORTED_QUERIES),
        "fts_cumulative_cardinality":
            _cumulative_cardinality_sql(SORTED_QUERIES),
        "events_rate_week": SQL_EVENTS_RATE_WEEK,
        "fts_percentiles_bucket": _percentiles_bucket_sql(SORTED_QUERIES),
        "fts_bucket_script": _bucket_script_sql(SORTED_QUERIES),
        "fts_bucket_selector": _bucket_selector_sql(SORTED_QUERIES),
        "fts_termvectors": _termvectors_sql(),
        "fts_analyze": _analyze_sql(),
        "fts_mget": _mget_sql(),
        "fts_geo_distance": _geo_distance_sql(SORTED_QUERIES),
        "fts_geo_bbox": _geo_bbox_sql(SORTED_QUERIES),
        "fts_global_agg": _global_agg_sql(SORTED_QUERIES),
        "fts_missing_value_count": _missing_value_count_sql(SORTED_QUERIES),
        "fts_histogram_dense": _histogram_dense_sql(SORTED_QUERIES),
        "decontam_embedding": _decontam_embedding_sql(),
        "corpus_token_budget": _corpus_token_budget_sql(),
        "fts_knn_filtered": _knn_sql(SORTED_QUERIES),
        "fts_diversified_sampler": _diversified_sampler_sql(SORTED_QUERIES),
        "fts_geo_distance_agg": _geo_distance_agg_sql(SORTED_QUERIES),
        "fts_geotile_grid": _geotile_grid_sql(SORTED_QUERIES),
        "fts_geohex_grid": _geohex_grid_sql(SORTED_QUERIES),
        "fts_geo_shape": _geo_shape_sql(SORTED_QUERIES),
        "fts_knn_radius": _knn_radius_sql(SORTED_QUERIES),
        "text_c4_clean": _c4_clean_sql(),
        "prune_prototypes": _prune_prototypes_sql(),
        "fts_geo_polygon": _geo_polygon_sql(SORTED_QUERIES),
        "fts_span_field_masking": _span_field_masking_sql(
            SFM_QUERIES, SFM_SLOP, FT_K
        ),
        "fts_geo_line": _geo_line_sql(SORTED_QUERIES),
        "fts_change_point": _change_point_sql(SORTED_QUERIES),
        "dedup_semantic": _dedup_semantic_sql(),
        "corpus_overlap_minhash": _corpus_overlap_sql(),
        "fts_geo_bounds": _geo_bounds_sql(SORTED_QUERIES),
        "fts_geo_centroid": _geo_centroid_sql(SORTED_QUERIES),
        "fts_normalize_agg": _normalize_agg_sql(SORTED_QUERIES),
        "fts_pit_counts": _pit_sql(),
        "fts_scroll_sliced": _scroll_sliced_sql(),
        "embed_cluster_stats": _cluster_stats_sql(),
        "documents_quality_pct": _quality_pct_sql(),
        "fts_terms_set": _terms_set_sql(TERMS_SET_QUERIES),
        "fts_runtime_field": _runtime_field_sql(SORTED_QUERIES),
        "fts_collapse_inner": _collapse_inner_sql(SORTED_QUERIES),
        "fts_intervals": _phrase_slop_sql(SLOP_QUERIES, FT_K, INTERVALS_GAPS),
        "fts_msearch": _msearch_sql(),
        "fts_mad": _mad_sql(SORTED_QUERIES),
        "fts_boxplot": _boxplot_sql(SORTED_QUERIES),
        "fts_t_test": _t_test_sql(SORTED_QUERIES),
        "fts_matrix_stats": _matrix_stats_sql(SORTED_QUERIES),
        "events_date_range": _date_range_sql(),
        "events_auto_date_histogram": _auto_date_histogram_sql(),
        "fts_delete_by_query": _delete_by_query_sql(),
        "fts_update_by_query": _update_by_query_sql(),
        "fts_reindex": _reindex_sql(),
        "fts_alias": _alias_sql(SORTED_QUERIES),
        "fts_rrf": _rrf_sql(SORTED_QUERIES),
        "fts_hybrid_linear": _hybrid_linear_sql(SORTED_QUERIES),
        "fts_rank_eval": _rank_eval_sql(SORTED_QUERIES),
        "fts_suggest_completion": _completion_sql(
            COMPLETION_PREFIXES, COMPLETION_K
        ),
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_minhash_lsh": _sql_minhash(),
        "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
        "dedup_chunk_boilerplate": _chunk_boilerplate_sql(),
        "dedup_duplicate_spans": _duplicate_spans_sql(),
        "ann_near_dup_clusters": SQL_NEAR_DUP_CLUSTERS,
        "dedup_simhash": _sql_simhash(),
        "ann_cosine_topk": SQL_ANN,
        "ann_ivf_topk": _ivf_sql(),
        "ann_ivfpq_topk": _ivf_sql(),
        "ann_near_dup_pairs": SQL_ANN_NEAR_DUP,
        # PQ+rerank's top-k equals brute force by construction (rerank
        # window covers every true top-k at the test SFs) — the exact
        # cosine SQL IS its oracle
        "ann_pq_topk": SQL_ANN,
        "ann_lsh_near_dup": _lsh_near_dup_sql(),
        "text_quality": _sql_text_quality(),
        "text_lang_id": _sql_lang_id(),
        "decontam_ngram": _decontam_sql(),
        "corpus_sample_mix": _sample_mix_sql(),
        "corpus_mix_temperature": _mix_temperature_sql(),
        "text_repetition": _repetition_sql(),
        "corpus_pack_sequences": _pack_sql(),
        "text_scrub_pii": _scrub_pii_sql(),
        "doc_fingerprint": SQL_FINGERPRINT,
        "multimodal_meta": SQL_MULTIMODAL_META,
        "events_date_histogram": SQL_EVENTS_DATE_HIST,
        "events_date_histogram_month": SQL_EVENTS_DATE_HIST_CAL,
        "documents_clean": _sql_documents_clean(),
        "text_perplexity": _sql_text_perplexity(),
        "text_perplexity_indexed": _sql_text_perplexity(),
        "text_perplexity_trigram": _sql_text_perplexity_trigram(),
        "corpus_chunk_windows": _sql_chunk_windows(),
        "bpe_pair_counts": _sql_bpe_pair_counts(),
        "events_action_dispatch": SQL_EVENTS_DISPATCH,
        "events_version_lww": SQL_EVENTS_LWW,
        "events_sessionize": SQL_EVENTS_SESSIONS,
        "tpch_q1_pricing_summary": SQL_TPCH_Q1,
        "tpch_topk_per_group": SQL_TPCH_TOPK,
        "tpch_revenue_by_nation": SQL_TPCH_REVENUE,
    }
