"""n-gram decontamination + deterministic stratified sampling (the
LLM-pipeline corpus-hygiene operators, operators/decontam.py and
operators/sampling.py) against hand-computable fixtures."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.operators import decontam, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),       # shares 3-gram
        (1, "alpha beta gamma something else entirely"),  # shares 3-gram
        (2, "totally unrelated words live here now"),     # clean
        (3, "delta epsilon zeta eta theta iota"),         # shares 3-gram
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(100, "alpha beta gamma"), (101, "delta epsilon zeta")],
            columns=["doc_id", "text"],
        )
    )


def test_ngram_contamination_counts(spark, corpus, bench):
    got = (
        decontam.ngram_contamination(corpus, bench, n=3)
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == ["0", "1", "3"]
    # doc 0 shares BOTH benchmark 3-grams, docs 1 and 3 share one each
    assert dict(zip(got["doc_id"], got["n_hits"])) == {
        "0": 2, "1": 1, "3": 1,
    }


def test_decontaminate_filters_flagged(spark, corpus, bench):
    clean = decontam.decontaminate(corpus, bench, n=3).toPandas()
    assert list(clean["doc_id"]) == [2]
    assert set(clean.columns) == {"doc_id", "text"}
    # n larger than any overlap → nothing flagged, corpus unchanged
    assert decontam.decontaminate(corpus, bench, n=7).count() == 4


def test_short_docs_produce_no_grams(spark, bench):
    tiny = bench.sparkSession.createDataFrame(
        pd.DataFrame([(9, "alpha beta")], columns=["doc_id", "text"])
    )
    assert decontam.ngram_contamination(tiny, bench, n=3).count() == 0


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "src"]))


def test_stratified_sample_rates_and_determinism(spark, strata_df):
    rates = {"s0": 1.0, "s1": 0.0}
    a = sampling.stratified_sample(
        strata_df, "src", rates, key_col="id", default_rate=0.5
    ).toPandas().sort_values("id").reset_index(drop=True)
    b = sampling.stratified_sample(
        strata_df.repartition(7), "src", rates, key_col="id",
        default_rate=0.5,
    ).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)  # partitioning-independent
    by = a.groupby("src").size()
    assert by.get("s0", 0) == 100      # rate 1.0 keeps every row
    assert "s1" not in by.index        # rate 0.0 drops every row
    assert 20 <= by.get("s2", 0) <= 80  # ~0.5 of 100 via hash uniform


def test_stratified_sample_rejects_bad_rates(spark, strata_df):
    with pytest.raises(EngineError, match="must be in"):
        sampling.stratified_sample(
            strata_df, "src", {"s0": 1.5}, key_col="id"
        )
    with pytest.raises(EngineError, match="default_rate"):
        sampling.stratified_sample(
            strata_df, "src", {}, key_col="id", default_rate=-0.1
        )


def test_repetition_stats_hand_case(spark):
    """Gopher-style repetition metrics on a hand-computable fixture."""
    from dynamo2es_lambda_spark.operators import quality

    rows = [
        (0, "foo bar foo bar foo bar"),   # 6 tok, 2 uniq; "foo bar" x3
        (1, "one two three four five"),   # all unique, no repeats
        (2, "x"),                          # too short for any n-gram
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = quality.repetition_stats(df).toPandas().set_index("doc_id")
    r0 = got.loc["0"]
    assert r0["n_tok"] == 6
    assert r0["uniq_ratio_r"] == pytest.approx(2 / 6, abs=1e-6)
    assert r0["top_bigram_frac_r"] == pytest.approx(1.0, abs=1e-6)
    # trigrams of doc 0: "foo bar foo" x2, "bar foo bar" x2 -> all 4 dup
    assert r0["dup_trigram_frac_r"] == pytest.approx(1.0, abs=1e-6)
    r1 = got.loc["1"]
    assert r1["uniq_ratio_r"] == 1.0
    assert r1["top_bigram_frac_r"] == pytest.approx(2 / 5, abs=1e-6)
    assert r1["dup_trigram_frac_r"] == 0.0
    r2 = got.loc["2"]
    assert (r2["top_bigram_frac_r"], r2["dup_trigram_frac_r"]) == (0.0, 0.0)


def test_pack_sequences_invariants(spark):
    """Next-fit packing: per-sequence token sums stay within budget
    (except single oversize docs), every doc is assigned exactly once,
    and the packing is partitioning-independent."""
    from dynamo2es_lambda_spark.operators import packing

    rows = [(i, "tok " * (5 + (i * 7) % 30)) for i in range(80)]
    rows.append((999, "big " * 50))  # oversize vs budget 40
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = packing.pack_sequences(df, budget=40, n_groups=4).toPandas()
    assert len(out) == 81
    assert out["doc_id"].is_unique
    sums = out[~out["oversize"]].groupby("seq_id")["n_tok"].sum()
    assert (sums <= 40).all()
    over = out[out["oversize"]]
    assert list(over["doc_id"]) == ["999"]
    # an oversize doc never shares its sequence
    assert (out["seq_id"] == over["seq_id"].iloc[0]).sum() == 1
    # deterministic under repartitioning
    out2 = packing.pack_sequences(
        df.repartition(13), budget=40, n_groups=4
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    with pytest.raises(EngineError, match="budget"):
        packing.pack_sequences(df, budget=0)


def test_scrub_pii_planted_cases(spark):
    """Planted PII redacts to typed placeholders; counts match; clean
    text passes through untouched."""
    from dynamo2es_lambda_spark.functions import text as T

    rows = [
        (0, "mail a.b+c@test.org and 10.1.2.3 then dial 555-123-4567 ok"),
        (1, "two mails x@y.io z@w.ai one ip 8.8.8.8"),
        (2, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = df.select(
        "doc_id",
        T.scrub_pii("text").alias("clean"),
        T.pii_count("text", "email").alias("ne"),
        T.pii_count("text", "ipv4").alias("ni"),
        T.pii_count("text", "phone").alias("np"),
    ).toPandas().set_index("doc_id")
    assert got.loc[0, "clean"] == "mail <EMAIL> and <IP> then dial <PHONE> ok"
    assert tuple(got.loc[0, ["ne", "ni", "np"]]) == (1, 1, 1)
    assert got.loc[1, "clean"] == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert tuple(got.loc[1, ["ne", "ni", "np"]]) == (2, 1, 0)
    assert got.loc[2, "clean"] == "nothing sensitive here"
    assert tuple(got.loc[2, ["ne", "ni", "np"]]) == (0, 0, 0)


# ---------------------------------------------------- r5: C4 + pruning

def test_c4_clean_rules(spark):
    import pandas as pd

    from dynamo2es_lambda_spark.errors import EngineError
    from dynamo2es_lambda_spark.operators import quality

    docs = pd.DataFrame(
        [
            ("keep", "one two three four.\nfive six seven eight!\n"
                     "no punct line here"),
            ("short_lines", "a b.\nc d.\ne f."),           # <3 words/line
            ("js", 'check the Javascript console now.\n'
                   "one two three four.\nfive six seven eight."),
            ("lorem", "one two three four.\nfive six seven eight.\n"
                      "Lorem Ipsum dolor sit."),
            ("brace", "one two three four.\nfive { six } seven eight."),
            ("few_kept", "one two three four.\nbare words only"),
        ],
        columns=["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in quality.c4_clean(
            spark.createDataFrame(docs), min_words_per_line=3,
            min_kept_lines=2,
        ).collect()
    }
    assert got["keep"]["keep_doc"] and got["keep"]["n_kept"] == 2
    assert got["keep"]["clean_text"] == (
        "one two three four.\nfive six seven eight!"
    )
    assert not got["short_lines"]["keep_doc"]   # every line < 3 words
    # the javascript line drops but the doc keeps its 2 other lines
    assert got["js"]["keep_doc"] and got["js"]["n_kept"] == 2
    assert not got["lorem"]["keep_doc"]         # lorem ipsum marker
    assert not got["brace"]["keep_doc"]         # curly brace marker
    assert not got["few_kept"]["keep_doc"]      # only 1 kept line
    with pytest.raises(EngineError):
        quality.c4_clean(spark.createDataFrame(docs), min_kept_lines=0)


def test_prune_prototypes_cuts_per_cluster(spark):
    import numpy as np
    import pandas as pd

    from dynamo2es_lambda_spark.operators import ann

    rng = [(i, [float((i * 13 + j * 7) % 11 - 5) for j in range(8)], "x")
           for i in range(60)]
    emb = spark.createDataFrame(
        pd.DataFrame(rng, columns=["vec_id", "embedding", "label"])
    )
    res = ann.prune_prototypes(emb, k=4, prune_frac=0.25).toPandas()
    assert len(res) == 60
    by_c = res.groupby("cluster")
    for cid, grp in by_c:
        n = len(grp)
        want_pruned = int(np.floor(n * 0.25))
        assert int(grp["pruned"].sum()) == want_pruned, cid
        if want_pruned:
            # pruned = the highest-cosine (most prototypical) members
            cut = grp.sort_values(
                ["cos_r", "vec_id"], ascending=[False, True]
            )
            assert list(cut["pruned"][:want_pruned]) == [True] * want_pruned
