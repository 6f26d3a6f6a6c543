"""Full-Lucene query_string: parser precedence/errors, exact
coord-free BooleanQuery match+score semantics fuzz-verified against a
pure-Python recursive evaluator over a multi-field store.

Reference context: the reference ships documents into ES
(lib/handler.js:100) whose users query them with the full Lucene
`query_string` syntax; this is its from-scratch Spark twin."""

import random
from collections import Counter

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.functions import analysis, bm25
from dynamo2es_lambda_spark.plans import build, search
from dynamo2es_lambda_spark.plans.search import (
    lucene_query_plan,
    parse_lucene_query,
)

_DOCS = [
    ("d00", "merge window open fast", "alpha"),
    ("d01", "merged window close", "beta"),
    ("d02", "merge pane window slow data", "alpha"),
    ("d03", "window merge key", "gamma"),
    ("d04", "spark rising fast key", "beta"),
    ("d05", "slow merge window spark", "alpha"),
    ("d06", "data data key fast", "gamma"),
    ("d07", "spark spark merge", "beta"),
    ("d08", "key value store window", "alpha"),
    ("d09", "fast slow fast data", "gamma"),
    ("d10", "spark window", "beta"),
    ("d11", "open close open", "alpha"),
]

_VOCAB = ["merge", "window", "spark", "fast", "key", "data",
          "slow", "open", "absentzzz"]
_TAGS = ["alpha", "beta", "gamma", "absenttag"]


# ------------------------------------------------------------- parser

def test_parser_precedence_not_and_or():
    assert parse_lucene_query("a OR b AND c") == (
        "or",
        [("leaf", None, "a"),
         ("and", [("leaf", None, "b"), ("leaf", None, "c")])],
    )
    assert parse_lucene_query("a AND NOT b OR c") == (
        "or",
        [("and", [("leaf", None, "a"), ("not", ("leaf", None, "b"))]),
         ("leaf", None, "c")],
    )


def test_parser_implicit_adjacency_is_or():
    assert parse_lucene_query("a b") == (
        "or", [("leaf", None, "a"), ("leaf", None, "b")]
    )
    # adjacency binds at the OR level: a (b AND c) == a OR (b AND c)
    assert parse_lucene_query("a (b AND c)") == parse_lucene_query(
        "a OR (b AND c)"
    )


def test_parser_field_scope_group():
    assert parse_lucene_query("tag:(a OR b) AND c") == (
        "and",
        [("or", [("leaf", "tag", "a"), ("leaf", "tag", "b")]),
         ("leaf", None, "c")],
    )
    # explicit field inside a scope wins over the scope
    assert parse_lucene_query("tag:(a OR content:b)") == (
        "or", [("leaf", "tag", "a"), ("leaf", "content", "b")]
    )


def test_parser_synonym_operators():
    assert parse_lucene_query("a && b || ! c") == parse_lucene_query(
        "a AND b OR NOT c"
    )
    assert parse_lucene_query("!c AND a") == parse_lucene_query(
        "NOT c AND a"
    )


def test_parser_lowercase_keywords_are_terms():
    assert parse_lucene_query("a and b") == (
        "or",
        [("leaf", None, "a"), ("leaf", None, "and"), ("leaf", None, "b")],
    )


@pytest.mark.parametrize("bad", [
    "te?t", "wild*", "roam~2", "[a TO b]", '"a b"~2', '"unterminated',
    "+must x", "-not x", "(a", "a)", "a AND", "field:", "()",
    "a^x", "a^-2",
])
def test_parser_rejects_unsupported_syntax(bad):
    with pytest.raises(EngineError):
        lucene_query_plan([(0, bad)])


def test_parser_phrase_and_boost_nodes():
    assert parse_lucene_query('"a b" AND tag:"c d"') == (
        "and",
        [("phrase", None, "a b"), ("phrase", "tag", "c d")],
    )
    assert parse_lucene_query("a^2 OR (b AND c)^0.5") == (
        "or",
        [("boost", 2.0, ("leaf", None, "a")),
         ("boost", 0.5,
          ("and", [("leaf", None, "b"), ("leaf", None, "c")]))],
    )
    assert parse_lucene_query('"a b"^3') == (
        "boost", 3.0, ("phrase", None, "a b")
    )
    # scope applies to phrases inside a group too
    assert parse_lucene_query('tag:(a OR "b c")') == (
        "or", [("leaf", "tag", "a"), ("phrase", "tag", "b c")]
    )


@pytest.mark.parametrize("neg", ["NOT x", "a OR NOT b", "NOT (a AND b)"])
def test_compile_rejects_pure_negative(neg):
    with pytest.raises(EngineError, match="pure-negative"):
        lucene_query_plan([(0, neg)])


def test_compile_atom_cap():
    q = " OR ".join(f"w{i}" for i in range(61))
    with pytest.raises(EngineError, match="distinct atoms"):
        lucene_query_plan([(0, q)])


# ------------------------------------------- brute-force twin fixture

@pytest.fixture(scope="module")
def lqs_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_lucene_qs"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "tag"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      fields=("content", "tag"), positions=True)
    return search.load_store(path)


def _brute_stats():
    """Per-field postings + df + avgdl exactly as the engine defines them."""
    stats = {}
    for fi, fld in ((1, "content"), (2, "tag")):
        toks = {d[0]: list(analysis.tokenize_series(pd.Series([d[fi]]))[0])
                for d in _DOCS}
        df = Counter(t for ts in toks.values() for t in set(ts))
        avgdl = sum(len(ts) for ts in toks.values()) / len(_DOCS)
        stats[fld] = (toks, df, avgdl)
    return stats


def _brute_scores(stats):
    """doc -> {(field, token): bm25 score}."""
    n = len(_DOCS)
    out = {d[0]: {} for d in _DOCS}
    for fld, (toks, df, avgdl) in stats.items():
        for doc, ts in toks.items():
            dl = len(ts)
            for t, tf in Counter(ts).items():
                import numpy as np

                w = float(bm25.idf(n, np.array([float(df[t])]))[0])
                s = w * (bm25.K1 + 1.0) * float(
                    bm25.tf_norm(np.array([tf]), np.array([dl]), avgdl)[0]
                )
                out[doc][(fld, t)] = s
    return out


def _phrase_in(doc, fld, text):
    """Consecutive containment of the analyzed phrase in the doc field."""
    fi = {"content": 1, "tag": 2}[fld]
    row = next(d for d in _DOCS if d[0] == doc)
    dts = list(analysis.tokenize_series(pd.Series([row[fi]]))[0])
    pts = list(analysis.tokenize_series(pd.Series([text]))[0])
    return any(dts[i:i + len(pts)] == pts
               for i in range(len(dts) - len(pts) + 1))


def _brute_eval(node, doc, present, default_field="content"):
    """(matched, score) per Lucene coord-free BooleanQuery semantics."""
    kind = node[0]
    if kind == "leaf":
        _, fld, w = node
        fld = fld or default_field
        toks = list(analysis.tokenize_series(pd.Series([w]))[0])
        m = any((fld, t) in present for t in toks)
        s = sum(q * present.get((fld, t), 0.0)
                for t, q in Counter(toks).items())
        return m, s
    if kind == "phrase":
        _, fld, text = node
        fld = fld or default_field
        m = _phrase_in(doc, fld, text)
        if not m:
            return False, 0.0
        s = sum(q * present.get((fld, t), 0.0)
                for t, q in Counter(
                    analysis.tokenize_series(pd.Series([text]))[0]
                ).items())
        return True, s
    if kind == "not":
        cm, _ = _brute_eval(node[1], doc, present, default_field)
        return (not cm), 0.0
    if kind == "boost":
        cm, cs = _brute_eval(node[2], doc, present, default_field)
        return cm, node[1] * cs
    subs = [_brute_eval(c, doc, present, default_field)
            for c in node[1]]
    if kind == "and":
        m = all(sm for sm, _ in subs)
        return m, (sum(ss for _, ss in subs) if m else 0.0)
    m = any(sm for sm, _ in subs)
    return m, sum(ss for _, ss in subs)


def _expected(queries):
    stats = _brute_stats()
    scores = _brute_scores(stats)
    rows = []
    for qid, q in queries:
        tree = parse_lucene_query(q)
        for doc, present in scores.items():
            m, s = _brute_eval(tree, doc, present)
            if m:
                rows.append((qid, doc, round(s, 6)))
    return sorted(rows)


def _got(spark, store, queries, k=50):
    qpdf = pd.DataFrame(queries, columns=["qid", "query"])
    res = search.search_lucene_query_string(
        spark, store, qpdf, k=k
    ).toPandas()
    return sorted(
        (int(r.qid), r.doc_id, round(float(r.score), 6))
        for r in res.itertuples(index=False)
    )


def test_hand_cases_match_brute_force(spark, lqs_store):
    queries = [
        (0, "merge AND window"),
        (1, "(merge OR spark) AND NOT slow"),
        (2, "tag:alpha AND window"),
        (3, "merge AND NOT absentzzz"),
        (4, "tag:(alpha OR beta) AND fast"),
        (5, "fast key data"),
        (6, "mergeWindow OR (fast AND key)"),  # camelCase leaf
        (7, '"merge window" OR (spark AND NOT slow)'),
        (8, 'tag:alpha AND "slow merge window"'),
        (9, "merge^2.5 OR spark"),
        (10, '(merge OR spark)^0.5 AND fast'),
        (11, '"merge window"^3 AND NOT tag:gamma'),
    ]
    assert _got(spark, lqs_store, queries) == _expected(queries)


def test_phrase_leaf_requires_consecutive_tokens(spark, lqs_store):
    # d02 'merge pane window' has both terms but not the phrase
    got = _got(spark, lqs_store, [(0, '"merge window"')])
    docs = {d for _, d, _ in got}
    assert "d00" in docs and "d02" not in docs


def test_boost_scales_score_not_matching(spark, lqs_store):
    base = _got(spark, lqs_store, [(0, "merge")])
    boosted = _got(spark, lqs_store, [(0, "merge^2")])
    assert {d for _, d, _ in base} == {d for _, d, _ in boosted}
    bm = {d: s for _, d, s in base}
    for _, d, s in boosted:
        assert abs(s - round(2 * bm[d], 6)) < 2e-6


def test_multi_token_leaf_is_or_of_subtokens(spark, lqs_store):
    # Lucene analyzes a leaf with default_operator=OR: 'mergeWindow'
    # behaves exactly like (merge OR window)
    a = _got(spark, lqs_store, [(0, "mergeWindow")])
    b = _got(spark, lqs_store, [(0, "merge OR window")])
    assert a == b and len(a) > 0


def test_not_of_unindexed_term_keeps_all_candidates(spark, lqs_store):
    a = _got(spark, lqs_store, [(0, "merge AND NOT absentzzz")])
    b = _got(spark, lqs_store, [(0, "merge")])
    assert a == b and len(a) > 0


def test_unknown_field_raises(spark, lqs_store):
    with pytest.raises(EngineError, match="unknown field"):
        _got(spark, lqs_store, [(0, "nofield:merge")])


_PHRASES = ["merge window", "fast key", "window merge", "data data",
            "spark window", "key fast", "absentzzz window"]


def _rand_tree(rng, depth):
    if depth == 0 or rng.random() < 0.4:
        if rng.random() < 0.2:
            node = ("phrase", None, rng.choice(_PHRASES))
        else:
            fld = rng.choice([None, None, "content", "tag"])
            vocab = _TAGS if fld == "tag" else _VOCAB
            node = ("leaf", fld, rng.choice(vocab))
        if rng.random() < 0.2:
            node = ("boost", rng.choice([0.5, 2.0, 3.0]), node)
        return node
    kind = rng.choice(["and", "or", "not"])
    if kind == "not":
        return ("not", _rand_tree(rng, depth - 1))
    n = rng.randint(2, 3)
    node = (kind, [_rand_tree(rng, depth - 1) for _ in range(n)])
    if rng.random() < 0.15:
        node = ("boost", rng.choice([0.5, 2.0]), node)
    return node


def _to_string(node):
    kind = node[0]
    if kind == "leaf":
        return (node[2] if node[1] is None else f"{node[1]}:{node[2]}")
    if kind == "phrase":
        body = f'"{node[2]}"'
        return body if node[1] is None else f"{node[1]}:{body}"
    if kind == "boost":
        return f"({_to_string(node[2])})^{node[1]}"
    if kind == "not":
        return f"NOT ({_to_string(node[1])})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(_to_string(c) for c in node[1]) + ")"


def test_fuzz_random_trees_match_brute_force(spark, lqs_store):
    rng = random.Random(20260818)
    queries = []
    qid = 0
    while len(queries) < 14:
        t = _rand_tree(rng, 3)
        q = _to_string(t)
        try:
            lucene_query_plan([(qid, q)])
        except EngineError:
            continue  # pure-negative draw
        queries.append((qid, q))
        qid += 1
    assert _got(spark, lqs_store, queries, k=50) == _expected(queries)


# -------------------------- default_operator=AND + minimum_should_match

def test_default_operator_and_adjacency():
    assert parse_lucene_query("a b AND c", "AND") == (
        "and",
        [("leaf", None, "a"), ("leaf", None, "b"), ("leaf", None, "c")],
    )
    assert parse_lucene_query("a b OR c d", "AND") == (
        "or",
        [("and", [("leaf", None, "a"), ("leaf", None, "b")]),
         ("and", [("leaf", None, "c"), ("leaf", None, "d")])],
    )


def _got_opts(spark, store, queries, **kw):
    qpdf = pd.DataFrame(queries, columns=["qid", "query"])
    res = search.search_lucene_query_string(
        spark, store, qpdf, k=50, **kw
    ).toPandas()
    return sorted(
        (int(r.qid), r.doc_id, round(float(r.score), 6))
        for r in res.itertuples(index=False)
    )


def test_and_operator_equals_explicit_and(spark, lqs_store):
    a = _got_opts(spark, lqs_store, [(0, "merge window fast")],
                  default_operator="AND")
    b = _got(spark, lqs_store, [(0, "merge AND window AND fast")])
    assert a == b and len(a) > 0


def test_and_operator_multi_token_leaf(spark, lqs_store):
    a = _got_opts(spark, lqs_store, [(0, "mergeWindow")],
                  default_operator="AND")
    b = _got(spark, lqs_store, [(0, "merge AND window")])
    assert a == b and len(a) > 0


def test_minimum_should_match_gates_top_or(spark, lqs_store):
    got = _got_opts(spark, lqs_store, [(0, "merge OR spark OR fast")],
                    minimum_should_match=2)
    stats = _brute_stats()
    scores = _brute_scores(stats)
    exp = []
    for doc, present in scores.items():
        hits = [t for t in ("merge", "spark", "fast")
                if ("content", t) in present]
        if len(hits) >= 2:
            exp.append((0, doc, round(
                sum(present[("content", t)] for t in hits), 6)))
    assert got == sorted(exp) and len(got) > 0


def test_minimum_should_match_ignored_without_top_or(spark, lqs_store):
    a = _got_opts(spark, lqs_store, [(0, "merge AND window")],
                  minimum_should_match=3)
    b = _got(spark, lqs_store, [(0, "merge AND window")])
    assert a == b and len(a) > 0


def test_minimum_should_match_validation(spark, lqs_store):
    with pytest.raises(EngineError, match="exceeds"):
        _got_opts(spark, lqs_store, [(0, "a OR b")],
                  minimum_should_match=3)
    with pytest.raises(EngineError, match=">= 1"):
        _got_opts(spark, lqs_store, [(0, "a OR b")],
                  minimum_should_match=0)


# --------------------------- fuzz: AND operator + msm semantics twins

_AND_VOCAB = _VOCAB + ["mergeWindow", "fastKey", "sparkData"]


def _brute_eval_op(node, doc, present, default_operator):
    """Brute twin honoring default_operator for multi-token leaves."""
    kind = node[0]
    if kind == "leaf" and default_operator == "AND":
        _, fld, w = node
        fld = fld or "content"
        toks = list(analysis.tokenize_series(pd.Series([w]))[0])
        m = all((fld, t) in present for t in toks)
        if not m:
            return False, 0.0
        return True, sum(q * present[(fld, t)]
                         for t, q in Counter(toks).items())
    if kind in ("leaf", "phrase"):
        return _brute_eval(node, doc, present)
    if kind == "not":
        cm, _ = _brute_eval_op(node[1], doc, present, default_operator)
        return (not cm), 0.0
    if kind == "boost":
        cm, cs = _brute_eval_op(node[2], doc, present, default_operator)
        return cm, node[1] * cs
    subs = [_brute_eval_op(c, doc, present, default_operator)
            for c in node[1]]
    if kind == "and":
        m = all(sm for sm, _ in subs)
        return m, (sum(ss for _, ss in subs) if m else 0.0)
    return any(sm for sm, _ in subs), sum(ss for _, ss in subs)


def test_fuzz_and_operator_matches_brute_force(spark, lqs_store):
    rng = random.Random(4160818)
    queries = []
    qid = 0
    while len(queries) < 10:
        t = _rand_tree(rng, 2)
        q = _to_string(t)
        try:
            lucene_query_plan([(qid, q)], default_operator="AND")
        except EngineError:
            continue
        queries.append((qid, q))
        qid += 1
    # add explicit camelCase-leaf queries (the case AND changes)
    for extra in ("mergeWindow", "fastKey OR sparkData",
                  "mergeWindow AND NOT tag:gamma"):
        queries.append((qid, extra))
        qid += 1
    got = _got_opts(spark, lqs_store, queries, default_operator="AND")
    scores = _brute_scores(_brute_stats())
    exp = []
    for q_id, q in queries:
        tree = parse_lucene_query(q, "AND")
        for doc, present in scores.items():
            m, s = _brute_eval_op(tree, doc, present, "AND")
            if m:
                exp.append((q_id, doc, round(s, 6)))
    assert got == sorted(exp)


def test_fuzz_msm_matches_brute_force(spark, lqs_store):
    rng = random.Random(90818)
    queries = []
    qid = 0
    while len(queries) < 8:
        kids = [_rand_tree(rng, 1) for _ in range(rng.randint(3, 4))]
        q = " OR ".join(f"({_to_string(k)})" for k in kids)
        try:
            lucene_query_plan([(qid, q)], minimum_should_match=2)
        except EngineError:
            continue
        queries.append((qid, q))
        qid += 1
    got = _got_opts(spark, lqs_store, queries, minimum_should_match=2)
    scores = _brute_scores(_brute_stats())
    exp = []
    for q_id, q in queries:
        tree = parse_lucene_query(q)
        kids = tree[1] if tree[0] == "or" else [tree]
        for doc, present in scores.items():
            subs = [_brute_eval(k, doc, present) for k in kids]
            matched = sum(1 for sm, _ in subs if sm)
            gate = matched >= 2 if tree[0] == "or" else all(
                sm for sm, _ in subs)
            if gate:
                exp.append((q_id, doc,
                            round(sum(ss for _, ss in subs), 6)))
    assert got == sorted(exp)


# ----------------------------------------- fields (best_fields dis_max)

def test_fields_unqualified_leaf_is_dismax(spark, lqs_store):
    # 'alpha' only exists in tag; with fields it matches via tag at
    # boost x its tag BM25; 'merge' matches via content (content score
    # > boosted-absent tag)
    got = _got_opts(
        spark, lqs_store, [(0, "alpha AND merge")],
        fields={"content": 1.0, "tag": 2.0},
    )
    scores = _brute_scores(_brute_stats())
    exp = []
    for doc, present in scores.items():
        a = max(present.get(("content", "alpha"), 0.0),
                2.0 * present.get(("tag", "alpha"), 0.0))
        m_a = ("content", "alpha") in present or ("tag", "alpha") in present
        mg = max(present.get(("content", "merge"), 0.0),
                 2.0 * present.get(("tag", "merge"), 0.0))
        m_m = ("content", "merge") in present or ("tag", "merge") in present
        if m_a and m_m:
            exp.append((0, doc, round(a + mg, 6)))
    assert got == sorted(exp) and len(got) > 0


def test_fields_qualified_leaf_ignores_fields(spark, lqs_store):
    a = _got_opts(spark, lqs_store, [(0, "tag:alpha")],
                  fields={"content": 1.0, "tag": 5.0})
    b = _got(spark, lqs_store, [(0, "tag:alpha")])
    assert a == b and len(a) > 0


def test_fields_single_field_boost_applies(spark, lqs_store):
    base = _got(spark, lqs_store, [(0, "merge")])
    boosted = _got_opts(spark, lqs_store, [(0, "merge")],
                        fields={"content": 3.0})
    bm = {d: s for _, d, s in base}
    assert {d for _, d, _ in boosted} == set(bm)
    for _, d, s in boosted:
        assert abs(s - round(3 * bm[d], 6)) < 2e-6


def test_fields_empty_raises(spark, lqs_store):
    with pytest.raises(EngineError, match="fields"):
        _got_opts(spark, lqs_store, [(0, "merge")], fields={})
