"""Pagination (search_after), field sorting, term suggester, and
stats/histogram aggregations vs the pure-Python oracle (SURVEY.md §2.2 —
ES response-shaping features over the indexed documents).
"""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

from .oracle import PyOracle

CFG = IndexerConfig(index="code")


@pytest.fixture(scope="module")
def store(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exidx"))
    build.build_index(
        corpus_df, CFG, path, segment_docs=64, num_buckets=8, positions=True
    )
    return search.load_store(path)


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()
    return PyOracle(ids, corpus_pdf["content"].tolist())


def test_search_after_pages_tile_the_full_ranking(spark, store, oracle):
    q = " ".join(oracle.toks[0][:2])
    qpdf = pd.DataFrame([(0, q)], columns=["qid", "query"])
    full = search.search(spark, store, qpdf, k=10).toPandas().sort_values("rank")
    page1 = search.search(spark, store, qpdf, k=5).toPandas().sort_values("rank")
    last = page1.iloc[-1]
    page2 = (
        search.search(
            spark, store, qpdf, k=5,
            search_after=(last["score"], last["doc_id"]),
        )
        .toPandas()
        .sort_values("rank")
    )
    tiled = list(page1["doc_id"]) + list(page2["doc_id"])
    assert tiled == list(full["doc_id"])
    assert np.allclose(
        list(page1["score"]) + list(page2["score"]), full["score"], atol=0
    )
    # WAND page cursor (r5): cursor-certified tau keeps pruning exact —
    # the wand page must equal the exhaustive page bit-for-bit
    page2w = (
        search.search(
            spark, store, qpdf, k=5, algo="wand",
            search_after=(last["score"], last["doc_id"]),
        )
        .toPandas()
        .sort_values("rank")
    )
    assert list(page2w["doc_id"]) == list(page2["doc_id"])
    assert np.allclose(page2w["score"], page2["score"], rtol=1e-12)


def test_search_sorted_by_doc_length(spark, store, oracle):
    q = " ".join(oracle.toks[3][:2])
    for ascending in (True, False):
        res = search.search_sorted(
            spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
            sort_col="dl", k=10, ascending=ascending,
        ).toPandas().sort_values("rank")
        match = [d for d, _ in oracle.topk(q, k=10**9)]
        dl = {d: int(oracle.dl[oracle.doc_ids.index(d)]) for d in match}
        want = sorted(
            match, key=lambda d: (dl[d] if ascending else -dl[d], d)
        )[:10]
        assert list(res["doc_id"]) == want, f"ascending={ascending}"
        assert list(res["sort_value"]) == [float(dl[d]) for d in want]


def test_search_sorted_and_mode(spark, store, oracle):
    q = " ".join(oracle.toks[3][:2])
    res = search.search_sorted(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        sort_col="dl", k=10**6, mode="and",
    ).toPandas()
    want = {d for d, _ in oracle.topk(q, k=10**9, mode="and")}
    assert set(res["doc_id"]) == want


def test_suggest_terms(spark, store, oracle):
    t = max(oracle.df, key=lambda x: (oracle.df[x], x))  # a popular term
    probe = t[:-1] + ("x" if t[-1] != "x" else "y")      # one edit away
    res = search.suggest_terms(
        spark, store, pd.DataFrame([(0, probe)], columns=["qid", "probe"]),
        k=5, max_edits=2,
    ).toPandas().sort_values("rank")
    cands = [
        (PyOracle._levenshtein(term, probe), -df, term)
        for term, df in oracle.df.items()
        if abs(len(term) - len(probe)) <= 2
    ]
    want = sorted(c for c in cands if c[0] <= 2)[:5]
    assert list(res["suggestion"]) == [c[2] for c in want]
    assert list(res["dist"]) == [c[0] for c in want]
    assert list(res["df"]) == [-c[1] for c in want]
    assert t in set(res["suggestion"]), "the real term must be suggested"


def test_rescore_rank_identity(spark, store, oracle):
    toks = oracle.toks[3]
    q = " ".join(toks[4:6])  # a real consecutive bigram: phrase pass bites
    res = search.search_rescore(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        k=10, window_size=20, query_weight=1.0, rescore_weight=2.0,
    ).toPandas().sort_values("rank")
    want = oracle.rescore_topk(
        q, k=10, window_size=20, query_weight=1.0, rescore_weight=2.0
    )
    assert list(res["doc_id"]) == [d for d, _ in want]
    assert np.allclose(res["score"], [s for _, s in want], atol=1e-9)
    # the phrase pass must actually change something vs the base ranking
    base = search.search(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]), k=10
    ).toPandas().sort_values("rank")
    assert not np.allclose(res["score"], base["score"])


def test_rescore_absent_phrase_keeps_base_order(spark, store, oracle):
    q = f"{oracle.toks[0][0]} zzzabsent"  # phrase can never match
    res = search.search_rescore(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        k=10, window_size=20, query_weight=0.5,
    ).toPandas().sort_values("rank")
    base = search.search(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]), k=10
    ).toPandas().sort_values("rank")
    assert list(res["doc_id"]) == list(base["doc_id"])
    assert np.allclose(res["score"], base["score"] * 0.5, atol=1e-9)


def test_rescore_k_exceeds_window(spark, store):
    with pytest.raises(EngineError):
        search.search_rescore(
            spark, store, pd.DataFrame([(0, "a")], columns=["qid", "query"]),
            k=30, window_size=20,
        )


def test_collapse_one_per_group(spark, store, oracle, corpus_pdf):
    q = " ".join(oracle.toks[0][:2])
    res = search.search_collapse(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        collapse_col="lang", k=10,
    ).toPandas().sort_values("rank")
    lang_of = dict(
        zip(
            corpus_pdf["repo"] + "." + corpus_pdf["path"] + "."
            + corpus_pdf["commit"],
            corpus_pdf["lang"],
        )
    )
    matched = oracle.topk(q, k=10**9)
    best: dict[str, tuple] = {}
    for d, s in matched:  # already (score desc, doc_id asc) ordered
        g = lang_of[d]
        if g not in best:
            best[g] = (d, s)
    want = sorted(best.items(), key=lambda kv: (-kv[1][1], kv[1][0]))[:10]
    assert list(res["doc_id"]) == [d for _, (d, _) in want]
    assert list(res["group"]) == [g for g, _ in want]
    assert np.allclose(res["score"], [s for _, (_, s) in want], atol=1e-9)
    assert res["group"].is_unique


def test_significant_terms(spark, store, oracle, corpus_df):
    q = " ".join(oracle.toks[1][:2])
    # corpus ids in the store are repo.path.commit - rebuild a corpus frame
    # keyed the same way for the foreground re-tokenize join
    from pyspark.sql import functions as F

    corpus = corpus_df.select(
        F.concat_ws(".", "repo", "path", "commit").alias("cid"), "content"
    )
    res = search.significant_terms(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        corpus, text_col="content", id_col="cid", k=10, min_doc_count=3,
    ).toPandas().sort_values("rank")
    matched = [d for d, _ in oracle.topk(q, k=10**9)]
    n_fg = len(matched)
    fg: dict[str, int] = {}
    for d in matched:
        for t in set(oracle.toks[oracle.doc_ids.index(d)]):
            fg[t] = fg.get(t, 0) + 1
    cands = []
    for t, c in fg.items():
        if c < 3:
            continue
        fr, br = c / n_fg, oracle.df[t] / oracle.n_docs
        cands.append((round((fr - br) * fr / br, 9), t, c))
    cands.sort(key=lambda x: (-x[0], x[1]))
    want = cands[:10]
    assert list(res["term"]) == [t for _, t, _ in want]
    assert list(res["fg"]) == [c for _, _, c in want]
    for got_s, (s, _, _) in zip(res["score_r"], want):
        assert got_s == pytest.approx(s, abs=1e-6)


def test_percolate(spark, corpus_df, oracle):
    regs = [
        (0, " ".join(oracle.toks[0][:2])),
        (1, oracle.toks[5][0]),
        (2, "zzzabsent spark"),
    ]
    from pyspark.sql import functions as F

    docs = corpus_df.select(
        F.concat_ws(".", "repo", "path", "commit").alias("cid"), "content"
    )
    res = search.percolate(
        spark, pd.DataFrame(regs, columns=["query_id", "query"]),
        docs, text_col="content", id_col="cid", mode="and",
    ).toPandas()
    got = set(zip(res["doc_id"], res["query_id"]))
    want = set()
    for qid, q in regs:
        from dynamo2es_lambda_spark.functions import analysis

        terms = set(analysis.tokenize_series(pd.Series([q]))[0])
        for i, d in enumerate(oracle.doc_ids):
            if terms <= set(oracle.toks[i]):
                want.add((d, qid))
    assert got == want
    assert not any(qid == 2 for _, qid in got)


def test_bigram_perplexity_properties(spark, corpus_pdf):
    """In-domain repetition scores lower NLL than shuffled gibberish of the
    same vocabulary; sub-2-token docs are excluded; exact counts match a
    hand-computed tiny case."""
    from dynamo2es_lambda_spark.operators import lm

    pdf = corpus_pdf[["content"]].copy()
    pdf["doc_id"] = [f"d{i}" for i in range(len(pdf))]
    # append: a doc repeating a common corpus phrase, a gibberish doc over
    # rare token combos, and a one-token doc
    common = " ".join(pdf["content"].iloc[0].split()[:2])
    extra = pd.DataFrame(
        {
            "content": [
                (common + " ") * 20,
                "zebra9 quux7 fizz3 blorp1 " * 10,
                "single",
            ],
            "doc_id": ["rep", "gib", "one"],
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    res = lm.bigram_perplexity(df, id_col="doc_id", text_col="content")
    got = res.toPandas().set_index("doc_id")
    assert "one" not in got.index, "no bigram evidence -> excluded"
    assert got.loc["rep", "nll_r"] < got.loc["gib", "nll_r"]
    # bigram count = token count - 1 (whatever the analyzer splits into)
    from dynamo2es_lambda_spark.functions import analysis

    n_toks = len(analysis.tokenize_series(pd.Series([(common + " ") * 20]))[0])
    assert got.loc["rep", "n_bigrams"] == n_toks - 1


def test_stats_agg(spark, store, oracle):
    q = " ".join(oracle.toks[2][:2])
    res = search.search_stats_agg(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        value_col="dl",
    ).toPandas()
    match = [d for d, _ in oracle.topk(q, k=10**9)]
    vals = np.array(
        [int(oracle.dl[oracle.doc_ids.index(d)]) for d in match], dtype=float
    )
    row = res.iloc[0]
    assert row["n_docs"] == len(vals)
    assert row["min_v"] == vals.min() and row["max_v"] == vals.max()
    assert row["sum_v"] == vals.sum()
    assert row["avg_v"] == pytest.approx(vals.mean(), abs=1e-9)


def test_cardinality_percentiles_top_hits(spark, store, oracle, corpus_pdf):
    q = " ".join(oracle.toks[2][:2])
    qpdf = pd.DataFrame([(0, q)], columns=["qid", "query"])
    match = [d for d, _ in oracle.topk(q, k=10**9)]
    lang_of = dict(
        zip(
            corpus_pdf["repo"] + "." + corpus_pdf["path"] + "."
            + corpus_pdf["commit"],
            corpus_pdf["lang"],
        )
    )
    card = search.search_cardinality_agg(
        spark, store, qpdf, value_col="lang"
    ).toPandas().iloc[0]
    assert card["n_docs"] == len(match)
    assert card["cardinality"] == len({lang_of[d] for d in match})

    vals = np.sort(
        [float(oracle.dl[oracle.doc_ids.index(d)]) for d in match]
    )
    pct = search.search_percentiles_agg(
        spark, store, qpdf, value_col="dl", percentiles=(0.5, 0.9)
    ).toPandas().set_index("pct")
    for p in (0.5, 0.9):
        want = np.quantile(vals, p, method="linear")
        assert pct.loc[p, "value_r"] == pytest.approx(want, abs=1e-6)

    th = search.search_top_hits(
        spark, store, qpdf, group_col="lang", k_per_group=2
    ).toPandas()
    scores = dict(oracle.topk(q, k=10**9))
    for g, grp in th.groupby("group"):
        want_g = sorted(
            (d for d in match if lang_of[d] == g),
            key=lambda d: (-round(scores[d], 6), d),
        )[:2]
        assert list(grp.sort_values("grank")["doc_id"]) == want_g
    assert (th.groupby(["qid", "group"])["grank"].max() <= 2).all()


def test_explain_score_sums_to_search_score(spark, store, oracle):
    q = " ".join(oracle.toks[4][:3])
    res = search.search(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]), k=3
    ).toPandas().sort_values("rank")
    top = res.iloc[0]
    exp = search.explain_score(spark, store, q, top["doc_id"]).toPandas()
    assert len(exp) > 0
    assert exp["contribution"].sum() == pytest.approx(
        top["score"], abs=1e-9
    )
    d = oracle.doc_ids.index(top["doc_id"])
    for r in exp.itertuples(index=False):
        assert r.df == oracle.df[r.term]
        assert r.tf == sum(1 for x in oracle.toks[d] if x == r.term)
        assert r.dl == oracle.dl[d]
    assert search.explain_score(spark, store, q, "no-such-doc").count() == 0
    assert search.explain_score(
        spark, store, "zzzabsent", top["doc_id"]
    ).count() == 0


def test_histogram_agg(spark, store, oracle):
    q = " ".join(oracle.toks[2][:2])
    interval = 50.0
    res = search.search_histogram(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        interval=interval, value_col="dl",
    ).toPandas()
    match = [d for d, _ in oracle.topk(q, k=10**9)]
    want: dict[float, int] = {}
    for d in match:
        b = float(np.floor(oracle.dl[oracle.doc_ids.index(d)] / interval)
                  * interval)
        want[b] = want.get(b, 0) + 1
    got = dict(zip(res["bucket"], res["n_docs"]))
    assert got == want
    assert sum(got.values()) == len(match)
    with pytest.raises(EngineError):
        search.search_histogram(
            spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
            interval=0,
        )


def test_significant_terms_background_filter(spark, store, oracle, corpus_df):
    """r5: background_filter scopes the bg rates to another query's
    match set instead of the whole index."""
    from pyspark.sql import functions as F

    q = " ".join(oracle.toks[1][:2])
    bgq = oracle.toks[2][0]
    corpus = corpus_df.select(
        F.concat_ws(".", "repo", "path", "commit").alias("cid"), "content"
    )
    res = search.significant_terms(
        spark, store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        corpus, text_col="content", id_col="cid", k=10, min_doc_count=3,
        background_filter=bgq,
    ).toPandas().sort_values("rank")
    matched = [d for d, _ in oracle.topk(q, k=10**9)]
    bset = [d for d, _ in oracle.topk(bgq, k=10**9)]
    n_fg, n_bg = len(matched), len(bset)
    fg, bg = {}, {}
    for d in matched:
        for t in set(oracle.toks[oracle.doc_ids.index(d)]):
            fg[t] = fg.get(t, 0) + 1
    for d in bset:
        for t in set(oracle.toks[oracle.doc_ids.index(d)]):
            bg[t] = bg.get(t, 0) + 1
    cands = []
    for t, c in fg.items():
        if c < 3 or t not in bg:
            continue
        fr, br = c / n_fg, bg[t] / n_bg
        cands.append((round((fr - br) * fr / br, 9), t, c, bg[t]))
    cands.sort(key=lambda x: (-x[0], x[1]))
    want = cands[:10]
    assert list(res["term"]) == [t for _, t, _, _ in want]
    assert list(res["bg"]) == [b for _, _, _, b in want]
