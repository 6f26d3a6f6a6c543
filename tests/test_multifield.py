"""Multi-field indexing + field-targeted queries + multi_match vs per-field
pure-Python oracles (ES multi-field documents: the reference's field mapping
emits several indexed fields per doc, /root/reference/lib/handler.js:100, and
delegates per-field search/multi_match to ES — SURVEY.md §2.2).
"""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, cdc, search
from dynamo2es_lambda_spark.sources import store_io

from .oracle import PyOracle

CFG = IndexerConfig(index="code")
FIELDS = ("content", "path")


@pytest.fixture(scope="module")
def mf_store(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mfidx"))
    res = build.build_index(
        corpus_df, CFG, path, segment_docs=64, num_buckets=8,
        positions=True, fields=FIELDS,
    )
    assert res.n_docs == 200
    st = search.load_store(path)
    assert st.meta["fields"] == list(FIELDS)
    return st


@pytest.fixture(scope="module")
def oracles(corpus_pdf):
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()
    return {
        "content": PyOracle(ids, corpus_pdf["content"].tolist()),
        "path": PyOracle(ids, corpus_pdf["path"].tolist()),
    }


def _assert_rank_identical(got, want, label=""):
    assert len(got) == len(want), f"{label}: {len(got)} vs {len(want)}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{label} rank={i + 1}: doc {gd} != {wd}"
        assert gs == pytest.approx(ws, abs=1e-9), f"{label} rank={i + 1}"


def _got(res, qid=0):
    g = res[res.qid == qid].sort_values("rank")
    return list(zip(g["doc_id"], g["score"]))


def test_meta_per_field_avgdl(mf_store, oracles):
    af = mf_store.meta["avgdl_fields"]
    assert af["content"] == pytest.approx(oracles["content"].avgdl, abs=1e-6)
    assert af["path"] == pytest.approx(oracles["path"].avgdl, abs=1e-6)
    # global avgdl = mean of total per-doc tokens
    assert mf_store.meta["avgdl"] == pytest.approx(
        oracles["content"].avgdl + oracles["path"].avgdl, abs=1e-6
    )


def test_default_field_is_first(spark, mf_store, oracles):
    q = " ".join(oracles["content"].toks[0][:2])
    res = search.search(
        spark, mf_store, pd.DataFrame({"qid": [0], "query": [q]}), k=10
    ).toPandas()
    _assert_rank_identical(_got(res), oracles["content"].topk(q, k=10))


def test_named_field_search_and_wand_identity(spark, mf_store, oracles):
    o = oracles["path"]
    q = " ".join(o.toks[7][:2])
    qpdf = pd.DataFrame({"qid": [0], "query": [q]})
    ex = search.search(spark, mf_store, qpdf, k=10, field="path").toPandas()
    _assert_rank_identical(_got(ex), o.topk(q, k=10))
    wd = search.search(
        spark, mf_store, qpdf, k=10, field="path", algo="wand"
    ).toPandas()
    _assert_rank_identical(_got(wd), _got(ex))


def test_and_mode_on_field(spark, mf_store, oracles):
    o = oracles["path"]
    q = " ".join(o.toks[3][:2])
    res = search.search(
        spark, mf_store, pd.DataFrame({"qid": [0], "query": [q]}),
        k=10, mode="and", field="path",
    ).toPandas()
    _assert_rank_identical(_got(res), o.topk(q, k=10, mode="and"))


def _mm_want(oracles, boosts, q, match_type, tie, k):
    full = {
        f: dict(oracles[f].topk(q, k=10**9)) for f in boosts
    }
    docs = set().union(*[set(d) for d in full.values()])
    comb = {}
    for d in docs:
        ss = [full[f][d] * b for f, b in boosts.items() if d in full[f]]
        if match_type == "best_fields":
            comb[d] = max(ss) + tie * (sum(ss) - max(ss))
        else:
            comb[d] = sum(ss)
    ranked = sorted(comb.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.mark.parametrize("match_type,tie", [
    ("best_fields", 0.0), ("best_fields", 0.3), ("most_fields", 0.0),
])
def test_multi_match_rank_identity(spark, mf_store, oracles, match_type, tie):
    q = (
        oracles["content"].toks[0][0] + " " + oracles["path"].toks[7][0]
    )
    boosts = {"content": 1.0, "path": 2.0}
    res = search.multi_match(
        spark, mf_store, pd.DataFrame({"qid": [0], "query": [q]}),
        fields=boosts, k=10, match_type=match_type, tie_breaker=tie,
    ).toPandas()
    want = _mm_want(oracles, boosts, q, match_type, tie, k=10)
    _assert_rank_identical(_got(res), want, f"{match_type}/{tie}")


def test_multi_match_single_field_equals_search(spark, mf_store, oracles):
    q = " ".join(oracles["content"].toks[5][:2])
    qpdf = pd.DataFrame({"qid": [0], "query": [q]})
    mm = search.multi_match(
        spark, mf_store, qpdf, fields=["content"], k=10
    ).toPandas()
    plain = search.search(spark, mf_store, qpdf, k=10).toPandas()
    _assert_rank_identical(_got(mm), _got(plain))


def test_phrase_and_phrase_prefix_on_field(spark, mf_store, oracles):
    o = oracles["path"]
    toks = o.toks[11]
    phq = " ".join(toks[:2])
    res = search.search_phrase(
        spark, mf_store, pd.DataFrame({"qid": [0], "query": [phq]}),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(_got(res), o.phrase_topk(phq, k=10), "phrase")
    ppq = f"{toks[0]} {toks[1][:2]}"
    res = search.search_phrase_prefix(
        spark, mf_store, pd.DataFrame({"qid": [0], "query": [ppq]}),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(res), o.phrase_prefix_topk(ppq, k=10), "phrase_prefix"
    )


def test_expansion_queries_on_field(spark, mf_store, oracles):
    o = oracles["path"]
    t = o.toks[7][0]
    got = search.search_prefix(
        spark, mf_store, pd.DataFrame({"qid": [0], "prefix": [t[:2]]}),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(got), o.prefix_topk(t[:2], k=10, max_expansions=50), "prefix"
    )
    got = search.search_fuzzy(
        spark, mf_store, pd.DataFrame({"qid": [0], "term": [t + "x"]}),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(got), o.fuzzy_topk(t + "x", k=10), "fuzzy"
    )
    got = search.search_wildcard(
        spark, mf_store,
        pd.DataFrame({"qid": [0], "pattern": [t[0] + "*"]}),
        k=10, field="path",
    ).toPandas()
    want = sorted(
        (tt for tt in o.postings if tt.startswith(t[0])),
    )  # '<c>*' ≡ prefix '<c>'
    _assert_rank_identical(
        _got(got), o.prefix_topk(t[0], k=10, max_expansions=50), "wildcard"
    )
    got = search.search_regexp(
        spark, mf_store,
        pd.DataFrame({"qid": [0], "pattern": [t[:2] + ".*"]}),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(got), o.regexp_topk(t[:2] + ".*", k=10), "regexp"
    )


def test_bool_and_dis_max_on_field(spark, mf_store, oracles):
    o = oracles["path"]
    must, should = o.toks[2][0], o.toks[9][0]
    res = search.search_bool(
        spark, mf_store,
        pd.DataFrame(
            [(0, must, should, "")],
            columns=["qid", "must", "should", "must_not"],
        ),
        k=10, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(res), o.bool_topk(must, should, "", k=10), "bool"
    )
    res = search.search_dis_max(
        spark, mf_store,
        pd.DataFrame(
            [(0, 0, must), (0, 1, should)],
            columns=["qid", "clause", "query"],
        ),
        k=10, tie_breaker=0.4, field="path",
    ).toPandas()
    _assert_rank_identical(
        _got(res), o.dis_max_topk([must, should], k=10, tie_breaker=0.4),
        "dis_max",
    )


def test_single_field_store_rejects_field_arg(spark, corpus_df, tmp_path):
    path = str(tmp_path / "sf")
    build.build_index(corpus_df, CFG, path, segment_docs=64, num_buckets=8)
    st = search.load_store(path)
    with pytest.raises(EngineError):
        search.search(
            spark, st, pd.DataFrame({"qid": [0], "query": ["a"]}),
            field="content",
        )


def test_fields_conflict_guard(spark, corpus_df, tmp_path, mf_store):
    with pytest.raises(EngineError):
        build.build_index(
            corpus_df, CFG, mf_store.path, fields=("content",),
        )
    with pytest.raises(EngineError):
        build.build_index(
            corpus_df, CFG, str(tmp_path / "bad"), fields=("a:b",),
        )


def test_significant_terms_on_multifield_field(spark, mf_store, oracles,
                                               corpus_pdf):
    """Foreground terms must be matched under the queried FIELD's qualifier
    against the qualified dictionary (regression: the raw-token join
    returned empty on multi-field stores), and presented bare."""
    o = oracles["path"]
    q = o.toks[7][0]
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "cid": [
                    f"{r}.{p}.{c}"
                    for r, p, c in zip(
                        corpus_pdf["repo"], corpus_pdf["path"],
                        corpus_pdf["commit"],
                    )
                ],
                "ptext": corpus_pdf["path"],
            }
        )
    )
    res = search.significant_terms(
        spark, mf_store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        corpus, text_col="ptext", id_col="cid", k=10, min_doc_count=2,
        field="path",
    ).toPandas().sort_values("rank")
    assert len(res) > 0, "mf significant_terms must produce rows"
    matched = [d for d, _ in o.topk(q, k=10**9)]
    n_fg = len(matched)
    fg: dict[str, int] = {}
    for d in matched:
        for t in set(o.toks[o.doc_ids.index(d)]):
            fg[t] = fg.get(t, 0) + 1
    cands = []
    for t, c in fg.items():
        if c < 2:
            continue
        fr, br = c / n_fg, o.df[t] / o.n_docs
        cands.append((round((fr - br) * fr / br, 9), t, c))
    cands.sort(key=lambda x: (-x[0], x[1]))
    want = cands[:10]
    assert list(res["term"]) == [t for _, t, _ in want]
    assert list(res["fg"]) == [c for _, _, c in want]


def test_delete_and_compact_multifield_store(spark, mf_store, corpus_pdf,
                                             tmp_path):
    """REMOVE + compact on a multi-field store: the tombstoned doc leaves
    every field's results, meta keeps the field layout, and the per-field
    avgdl is recomputed over live docs only."""
    import shutil

    path = str(tmp_path / "mfcompact")
    shutil.copytree(mf_store.path, path)
    row = corpus_pdf.iloc[11]
    gone_id = f"{row['repo']}.{row['path']}.{row['commit']}"
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_name": ["REMOVE"],
                "keys": [
                    {"repo": row["repo"], "path": row["path"],
                     "commit": row["commit"]}
                ],
                "new_image": [None],
                "old_image": [
                    {"repo": row["repo"], "path": row["path"],
                     "commit": row["commit"], "lang": row["lang"],
                     "content": row["content"], "version": 1}
                ],
            }
        ),
        schema=(
            "event_name string, "
            "keys struct<repo:string,path:string,commit:string>, "
            "new_image struct<repo:string,path:string,commit:string,"
            "lang:string,content:string,version:long>, "
            "old_image struct<repo:string,path:string,commit:string,"
            "lang:string,content:string,version:long>"
        ),
    )
    cfg = IndexerConfig(index="code", version_field="version")
    cdc.apply_changes(events, cfg, path)
    st = search.load_store(path)
    assert st.n_dead() == 1
    cdc.compact_store(spark, path)
    st = search.load_store(path)
    assert st.n_dead() == 0
    assert st.meta["fields"] == list(FIELDS)
    assert st.meta["n_docs"] == 199
    # querying the doc's own path tokens must not surface it, in either field
    from dynamo2es_lambda_spark.functions import analysis

    ptok = analysis.tokenize_series(pd.Series([row["path"]]))[0][0]
    res = search.search(
        spark, st, pd.DataFrame({"qid": [0], "query": [ptok]}),
        k=10**6, field="path",
    ).toPandas()
    assert gone_id not in set(res["doc_id"])


def test_verify_sha256_covers_all_fields(spark, corpus_df, tmp_path):
    """The north-rule sha invariant on a multi-field store hashes EVERY
    indexed field: verification passes against the true corpus and counts
    a mismatch when any field (not just content) is tampered with."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "shamf")
    build.build_index(
        corpus_df, CFG, path, segment_docs=64, num_buckets=8, fields=FIELDS
    )
    assert build.verify_sha256(corpus_df, CFG, path) == 0
    # tamper a non-key indexed field: every doc's multi-field sha changes
    tampered = corpus_df.withColumn(
        "content", F.concat(F.col("content"), F.lit(" tampered"))
    )
    assert build.verify_sha256(tampered, CFG, path) == 200


def test_cdc_on_multifield_store(spark, mf_store, corpus_pdf, tmp_path):
    """An incremental upsert against a COPY of the multi-field store must
    tokenize the same fields under the same qualifiers: the updated doc wins
    its path-field query afterwards."""
    import shutil

    path = str(tmp_path / "mfcdc")
    shutil.copytree(mf_store.path, path)
    row = corpus_pdf.iloc[0]
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_name": ["MODIFY"],
                "keys": [
                    {"repo": row["repo"], "path": row["path"],
                     "commit": row["commit"]}
                ],
                "new_image": [
                    {"repo": row["repo"], "path": "zzqq/unique_marker.py",
                     "commit": row["commit"], "lang": row["lang"],
                     "content": "zzqq unique marker body",
                     "version": 99}
                ],
                "old_image": [None],
            }
        ),
        schema=(
            "event_name string, "
            "keys struct<repo:string,path:string,commit:string>, "
            "new_image struct<repo:string,path:string,commit:string,"
            "lang:string,content:string,version:long>, "
            "old_image struct<repo:string,path:string,commit:string,"
            "lang:string,content:string,version:long>"
        ),
    )
    cfg = IndexerConfig(index="code", version_field="version")
    cdc.apply_changes(events, cfg, path)
    st2 = search.load_store(path)
    res = search.search(
        spark, st2, pd.DataFrame({"qid": [0], "query": ["zzqq"]}),
        k=5, field="path",
    ).toPandas()
    assert len(res) == 1
    res2 = search.search(
        spark, st2, pd.DataFrame({"qid": [0], "query": ["zzqq"]}), k=5
    ).toPandas()  # content field: the new body contains zzqq too
    assert len(res2) == 1
    assert res.iloc[0]["doc_id"] == res2.iloc[0]["doc_id"]


def test_combined_fields_validation_and_shape(spark, mf_store):
    qpdf = pd.DataFrame([(0, "spark merge")], columns=["qid", "query"])
    with pytest.raises(EngineError, match=">= 1"):
        search.search_combined_fields(
            spark, mf_store, qpdf, fields={"content": 0.5}
        )
    with pytest.raises(EngineError, match="unknown field"):
        search.search_combined_fields(
            spark, mf_store, qpdf, fields={"nope": 1.0}
        )
    res = search.search_combined_fields(
        spark, mf_store, qpdf, fields=list(mf_store.meta["fields"]), k=5
    ).toPandas()
    assert {"qid", "rank", "doc_id", "score"} == set(res.columns)
    assert len(res) > 0
    # equal unit weights over one field == that field's plain BM25 with
    # combined df/dl degenerating to the field's own
    one = search.search_combined_fields(
        spark, mf_store, qpdf, fields={mf_store.meta["fields"][0]: 1.0},
        k=5,
    ).toPandas()
    plain = search.search(
        spark, mf_store, qpdf, k=5, field=mf_store.meta["fields"][0]
    ).toPandas()
    a = dict(zip(one["doc_id"], one["score"]))
    b = dict(zip(plain["doc_id"], plain["score"]))
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=1e-9)
