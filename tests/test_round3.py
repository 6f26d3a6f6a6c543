"""Round-3 fixes: after_hook meta opt-in is explicit, explain_score
resolves the LIVE doc version, k-means guards empty/oversized inputs
(ADVICE.md round-2 findings)."""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.functions import analysis
from dynamo2es_lambda_spark.operators import ann
from dynamo2es_lambda_spark.plans import build, cdc, search
from dynamo2es_lambda_spark.sources import synthetic
from dynamo2es_lambda_spark.streaming import apply_cdc

CFG = IndexerConfig(index="code", version_field="version",
                    record_error_hook=lambda df: None)


# ------------------------------------------------ after_hook meta opt-in

class _Sentinel:
    pass


META = _Sentinel()


def _invoke(hook):
    return build.invoke_after_hook(hook, "res", META)


def test_after_hook_required_second_positional_gets_meta():
    got = {}

    def hook(result, meta_frame):
        got["args"] = (result, meta_frame)

    _invoke(hook)
    assert got["args"] == ("res", META)


def test_after_hook_named_meta_default_gets_meta():
    got = {}

    def hook(result, meta=None):
        got["args"] = (result, meta)

    _invoke(hook)
    assert got["args"] == ("res", META)


def test_after_hook_unrelated_optional_stays_result_only():
    """def hook(result, log=None) must NOT silently receive the meta
    DataFrame in its keyword slot (ADVICE round-2 #5)."""
    got = {}

    def hook(result, log=None):
        got["args"] = (result, log)

    _invoke(hook)
    assert got["args"] == ("res", None)


def test_after_hook_single_arg_and_varargs():
    got = {}
    _invoke(lambda result: got.setdefault("one", result))
    assert got["one"] == "res"

    def hook(*args):
        got["var"] = args

    _invoke(hook)
    assert got["var"] == ("res", META)


# ------------------------------------------------ k-means input guards

def test_kmeans_empty_corpus_returns_empty_centroids(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = ann.kmeans_centroids(emb, n_centroids=4, iters=1)
    assert out.count() == 0
    assert set(out.columns) == {"cid", "cvec"}


def test_kmeans_more_centroids_than_vectors_raises(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exceeds the vector count"):
        ann.kmeans_centroids(emb, n_centroids=5, iters=1)


# ----------------------------------- explain_score live-version resolve

def _keys(row):
    return {"repo": row["repo"], "path": row["path"], "commit": row["commit"]}


def _img(row, version, content=None):
    return {
        "repo": row["repo"], "path": row["path"], "commit": row["commit"],
        "lang": row["lang"],
        "content": content if content is not None else row["content"],
        "version": version,
    }


def test_explain_score_resolves_live_version(spark, tmp_path_factory):
    """A superseded doc_id explains against its LIVE (post-MODIFY) content,
    and a tombstoned doc_id explains to empty (ADVICE round-2 #2)."""
    path = str(tmp_path_factory.mktemp("r3_explain"))
    pdf = synthetic.corpus_pdf(np.arange(20))
    pdf["version"] = 0
    build.build_index(
        spark.createDataFrame(pdf), CFG, path, segment_docs=8, num_buckets=4
    )
    mod, gone = pdf.iloc[3], pdf.iloc[5]
    events = pd.DataFrame(
        [
            ("MODIFY", _keys(mod),
             _img(mod, 1, "zebrazz zebrazz fresh live tokens"),
             _img(mod, 0)),
            ("REMOVE", _keys(gone), None, _img(gone, 0)),
        ],
        columns=["event_name", "keys", "new_image", "old_image"],
    )
    cdc.apply_changes(
        spark.createDataFrame(events, schema=apply_cdc.EVENT_SCHEMA),
        CFG, path, segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    assert store.n_dead() > 0

    mod_id = f"{mod['repo']}.{mod['path']}.{mod['commit']}"
    exp = search.explain_score(spark, store, "zebrazz", mod_id).toPandas()
    assert len(exp) == 1
    assert exp["tf"].iloc[0] == 2  # the live version's tf, not the dead one

    gone_id = f"{gone['repo']}.{gone['path']}.{gone['commit']}"
    tok = analysis.tokenize_series(pd.Series([gone["content"]]))[0][0]
    assert search.explain_score(spark, store, tok, gone_id).count() == 0


# --------------------------------------- unordered span_near kernel

def test_span_near_unordered_matches_reversed(spark, tmp_path_factory):
    """span_near(in_order=False) finds transposed/reordered tokens that
    the in-order chain cannot; in-order matches stay a strict subset."""
    path = str(tmp_path_factory.mktemp("r3_span"))
    rows = pd.DataFrame(
        {
            "doc_id": ["fwd", "rev", "gap", "far", "half"],
            "text": [
                "alpha beta filler filler filler",        # in order, adjacent
                "beta alpha filler filler filler",        # reversed, adjacent
                "alpha filler beta filler filler",        # in order, gap 1
                "alpha filler filler filler filler beta", # spread 5 — too far
                "alpha filler filler filler filler",      # missing beta
            ],
        }
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        spark.createDataFrame(rows).withColumnRenamed("text", "content"),
        cfg, path, segment_docs=8, num_buckets=4, positions=True,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "alpha beta")], columns=["qid", "query"])

    ordered = search.search_span_near(
        spark, store, q, slop=2, in_order=True, k=10
    ).toPandas()
    unordered = search.search_span_near(
        spark, store, q, slop=2, in_order=False, k=10
    ).toPandas()
    assert set(ordered["doc_id"]) == {"fwd", "gap"}
    assert set(unordered["doc_id"]) == {"fwd", "rev", "gap"}
    # scores are the summed BM25 of the span terms on both paths
    so = dict(zip(ordered["doc_id"], ordered["score"]))
    su = dict(zip(unordered["doc_id"], unordered["score"]))
    for d in ("fwd", "gap"):
        assert su[d] == pytest.approx(so[d], abs=1e-12)

    with pytest.raises(Exception, match="distinct tokens"):
        search.search_span_near(
            spark, store,
            pd.DataFrame([(0, "alpha alpha")], columns=["qid", "query"]),
            slop=1, in_order=False,
        )


# ------------------------------------------- auto-compact merge policy

def test_maybe_compact_triggers(spark, tmp_path_factory):
    """maybe_compact fires on the dead-fraction trigger and is a no-op on
    a fresh small store; compacted results stay query-identical."""
    path = str(tmp_path_factory.mktemp("r3_autocompact"))
    pdf = synthetic.corpus_pdf(np.arange(30))
    pdf["version"] = 0
    build.build_index(
        spark.createDataFrame(pdf), CFG, path, segment_docs=8, num_buckets=4
    )
    assert cdc.maybe_compact(spark, path) is False  # fresh store: no-op

    # kill 40% of docs -> dead fraction blows past the 0.2 default
    events = pd.DataFrame(
        [("REMOVE", _keys(pdf.iloc[i]), None, _img(pdf.iloc[i], 0))
         for i in range(12)],
        columns=["event_name", "keys", "new_image", "old_image"],
    )
    cdc.apply_changes(
        spark.createDataFrame(events, schema=apply_cdc.EVENT_SCHEMA),
        CFG, path, segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    tok = analysis.tokenize_series(pd.Series([pdf.iloc[20]["content"]]))[0][0]
    q = pd.DataFrame([(0, tok)], columns=["qid", "query"])
    before = search.search(spark, store, q, k=50).toPandas()

    assert cdc.maybe_compact(spark, path) is True
    store2 = search.load_store(path)
    assert store2.n_dead() == 0  # dead rows rewritten away
    after = search.search(spark, store2, q, k=50).toPandas()
    # the LIVE match set is preserved; scores legitimately change because
    # compaction recomputes df/N/avgdl over live docs only (docstring)
    assert set(before["doc_id"]) == set(after["doc_id"])
    # back below both triggers -> no-op again
    assert cdc.maybe_compact(spark, path) is False


# ------------------------------------------- fuzzy prefix_length

def test_fuzzy_prefix_length_restricts(spark, tmp_path_factory):
    """prefix_length pins the probe's first N chars: candidates whose
    edit touches the prefix disappear; the rest score identically."""
    path = str(tmp_path_factory.mktemp("r3_fuzzpl"))
    rows = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "merge words here",    # 'merge'
                "marge words here",    # 'marge' (edit in position 2)
                "mergq words here",    # 'mergq' (edit at the tail)
            ],
        }
    )
    build.build_index(
        spark.createDataFrame(rows).withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "merge")], columns=["qid", "term"])
    free = search.search_fuzzy(spark, store, q, max_edits=1, k=10).toPandas()
    assert set(free["doc_id"]) == {"a", "b", "c"}
    pinned = search.search_fuzzy(
        spark, store, q, max_edits=1, k=10, prefix_length=3
    ).toPandas()
    assert set(pinned["doc_id"]) == {"a", "c"}  # 'marge' breaks the prefix
    sf = dict(zip(free["doc_id"], free["score"]))
    for d, s in zip(pinned["doc_id"], pinned["score"]):
        assert s == pytest.approx(sf[d], abs=1e-12)
    with pytest.raises(Exception, match="prefix_length"):
        search.search_fuzzy(spark, store, q, prefix_length=-1)


# ------------------------------------------- phrase suggester

def test_suggest_phrase_corrects_and_keeps_source(spark, tmp_path_factory):
    """The bigram LM prefers the corpus-attested correction over
    per-term-popularity gluing, and a position with no in-budget
    candidate keeps the source token."""
    path = str(tmp_path_factory.mktemp("r3_psuggest"))
    rows = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(8)],
            "text": (
                ["stream data pipeline runs"] * 5   # 'stream data' dominant
                + ["steam vents data here", "steam engine data room",
                   "steam cleaning data set"]       # 'steam' frequent alone
            ),
        }
    )
    docs = spark.createDataFrame(rows)
    build.build_index(
        docs.withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    got = search.suggest_phrase(
        spark, store, docs,
        pd.DataFrame([(0, "strem data")], columns=["qid", "text"]),
        k=2, max_edits=1, max_candidates=3,
    ).toPandas().sort_values("rank")
    # 'strem' -> {stream, steam}; the BIGRAM 'stream data' is attested 5x
    # while 'steam data' never occurs -> LM ranks 'stream data' first
    assert got.iloc[0]["suggestion"] == "stream data"

    # unknown token with nothing in budget keeps the source
    keep = search.suggest_phrase(
        spark, store, docs,
        pd.DataFrame([(0, "qqqqzz data")], columns=["qid", "text"]),
        k=1, max_edits=1,
    ).toPandas()
    assert keep.iloc[0]["suggestion"].startswith("qqqqzz ")

    with pytest.raises(Exception, match="capped at 5"):
        search.suggest_phrase(
            spark, store, docs,
            pd.DataFrame([(0, "a b c d e f")], columns=["qid", "text"]),
        )


# ------------------------- dead-doc exclusion in the metadata-scan queries

def test_metadata_queries_exclude_dead_docs(spark, tmp_path_factory):
    """range / ids / match_all / terms-agg answer from doc_stats markers —
    superseded and tombstoned rows must never surface."""
    path = str(tmp_path_factory.mktemp("r3_deadmeta"))
    pdf = synthetic.corpus_pdf(np.arange(12))
    pdf["version"] = 0
    build.build_index(
        spark.createDataFrame(pdf), CFG, path, segment_docs=8, num_buckets=4
    )
    gone, mod = pdf.iloc[2], pdf.iloc[5]
    events = pd.DataFrame(
        [
            ("REMOVE", _keys(gone), None, _img(gone, 0)),
            ("MODIFY", _keys(mod), _img(mod, 1, "tiny doc"), _img(mod, 0)),
        ],
        columns=["event_name", "keys", "new_image", "old_image"],
    )
    cdc.apply_changes(
        spark.createDataFrame(events, schema=apply_cdc.EVENT_SCHEMA),
        CFG, path, segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    assert store.n_dead() >= 2
    gone_id = f"{gone['repo']}.{gone['path']}.{gone['commit']}"
    mod_id = f"{mod['repo']}.{mod['path']}.{mod['commit']}"

    ma = search.search_match_all(spark, store, k=10**6).toPandas()
    assert len(ma) == 11                      # 12 - 1 removed
    assert gone_id not in set(ma["doc_id"])
    assert (ma["doc_id"] == mod_id).sum() == 1  # live version only

    ids_res = search.search_ids(
        spark, store, [gone_id, mod_id], k=10
    ).toPandas()
    assert list(ids_res["doc_id"]) == [mod_id]

    rng = search.search_range(
        spark, store, "dl", gte=0, k=10**6
    ).toPandas()
    assert gone_id not in set(rng["doc_id"])
    assert (rng["doc_id"] == mod_id).sum() == 1

    ta = search.search_terms_agg(
        spark, store,
        pd.DataFrame([(0, "tiny")], columns=["qid", "query"]),
        group_col="lang",
    ).toPandas()
    assert ta["n_docs"].sum() == 1  # only the live modified doc matches


# --------------------- span kernels vs brute force (property-based)

def _mk_by_term(docs_tokens):
    """Build the kernel's by_term structures straight from token lists."""
    by = {}
    for t in sorted({x for d in docs_tokens for x in d}):
        ids, tfs, dls, flat = [], [], [], []
        for i, d in enumerate(docs_tokens):
            ps = [p for p, x in enumerate(d) if x == t]
            if ps:
                ids.append(i)
                tfs.append(len(ps))
                dls.append(len(d))
                flat.extend(ps)
        ids = np.asarray(ids, dtype=np.int64)
        tfs = np.asarray(tfs, dtype=np.int64)
        dls = np.asarray(dls, dtype=np.int64)
        flat = np.asarray(flat, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        by[t] = (ids, tfs, dls, flat, starts)
    return by


def _brute_span(docs_tokens, phrase, slop, ordered):
    import itertools

    window = len(phrase) - 1 + slop
    out = []
    for i, d in enumerate(docs_tokens):
        pos_lists = [
            [p for p, x in enumerate(d) if x == t] for t in phrase
        ]
        if any(not pl for pl in pos_lists):
            continue
        hit = False
        for combo in itertools.product(*pos_lists):
            if ordered:
                if all(a < b for a, b in zip(combo, combo[1:])) and (
                    combo[-1] - combo[0] <= window
                ):
                    hit = True
                    break
            else:
                if max(combo) - min(combo) <= window:
                    hit = True
                    break
        if hit:
            out.append(i)
    return out


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_doc_strat = st.lists(
    st.sampled_from("abcd"), min_size=0, max_size=12
)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(_doc_strat, min_size=1, max_size=6),
    phrase=st.lists(
        st.sampled_from("abcd"), min_size=2, max_size=3, unique=True
    ),
    slop=st.integers(min_value=0, max_value=3),
)
def test_span_kernels_match_brute_force(docs, phrase, slop):
    """Both vectorized span kernels agree with exhaustive enumeration on
    arbitrary tiny corpora (ordered needs slop >= 1 — slop 0 rides the
    exact-intersection branch in production)."""
    by = _mk_by_term(docs)
    if any(t not in by for t in phrase):
        return  # a phrase term absent from the corpus matches nothing
    cand = np.arange(len(docs), dtype=np.int64)
    stride = 64
    got_u = sorted(
        search._span_unordered_survivors(by, list(phrase), cand, stride, slop)
    )
    assert got_u == _brute_span(docs, phrase, slop, ordered=False)
    if slop >= 1:
        got_o = sorted(
            search._span_near_survivors(by, list(phrase), cand, stride, slop)
        )
        assert got_o == _brute_span(docs, phrase, slop, ordered=True)
