"""Corpus-trained bigram language-model perplexity — the CCNet-style
quality filter a training-data pipeline runs to drop gibberish and
boilerplate before tokenization (perplexity against an in-domain LM).

The LM is the corpus itself: unigram and bigram counts aggregated in one
pass each (pure built-in expressions — the token stream comes from the
pinned analyzer's Spark-SQL form, no Python), add-k smoothed
``p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)`` with ``V`` = distinct
unigram count. A document's score is the mean negative log2 probability
over its bigrams (lower = more in-domain); docs with fewer than two
tokens are excluded (no bigram evidence).

Scale shape: counts are two groupBy aggregations whose shuffle volume is
the distinct n-gram vocabulary (map-side partial combine); scoring is one
explode + equi-join on the bigram string + per-doc aggregation — the same
shape at any corpus size, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import spark_tokens_expr

DEFAULT_K = 0.5


_BIGRAMS_FROM_TOKS = (
    "CASE WHEN size(_toks) >= 2 THEN "
    "transform(sequence(2, size(_toks)), "
    "i -> concat(element_at(_toks, i - 1), ' ', element_at(_toks, i))) "
    "ELSE array() END"
)


def gram_counts(
    docs: DataFrame,
    text_cols: tuple[str, ...],
    qualify: bool = False,
) -> DataFrame:
    """→ (gram, cf): collection frequencies of every unigram AND bigram in
    one corpus pass — the index-time statistics the phrase suggester's
    bigram LM reads at query time (ES answers suggesters from index stats,
    never a corpus scan). A gram containing a space is a bigram
    ("w1 w2"); without, a unigram — the tokenizer never emits spaces
    inside a token, so the keyspace cannot collide.

    ``qualify=True`` (multi-field stores) prefixes each gram with its
    source column as ``"<field>:<gram>"`` — the same qualification scheme
    posting terms use (plans/build.build_index ``fields=``), so per-field
    LMs share one table.

    Scale shape: pure built-in expressions (the pinned analyzer's SQL
    form), one explode, one groupBy whose shuffle volume is the distinct
    gram vocabulary after map-side partial combine — NOT the token stream.
    """
    from ..functions.layout import spread_if_narrow

    # spread a provably narrow scan: the unigram+bigram explosion and its
    # map-side combine are the heavy work pipelined onto it (measured
    # 0.58 s -> 0.43 s on the single-row-group driver table at sf0.1)
    docs = spread_if_narrow(docs, text_cols[0])
    parts = []
    for col in text_cols:
        toks = F.expr(spark_tokens_expr(col))
        base = docs.select(toks.alias("_toks"))
        g = base.select(
            F.explode(
                F.concat(F.col("_toks"), F.expr(_BIGRAMS_FROM_TOKS))
            ).alias("gram")
        )
        if qualify:
            g = g.select(
                F.concat(F.lit(f"{col}:"), F.col("gram")).alias("gram")
            )
        parts.append(g)
    allg = parts[0]
    for p in parts[1:]:
        allg = allg.unionByName(p)
    return allg.groupBy("gram").agg(F.count("*").alias("cf"))


def bigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = DEFAULT_K,
) -> DataFrame:
    """→ (doc_id, n_bigrams, nll_r): per-doc mean −log2 p under the
    corpus-trained add-k bigram LM, rounded to 6 dp. Deterministic: exact
    integer counts, the only float is the final mean.

    The tokenizer runs ONCE per row: bigrams derive from the already
    computed ``_toks`` column, and the tokenized base is persisted across
    the three downstream aggregations. The call is EAGER (it already runs
    an action for the vocabulary size): the doc-sized result — three
    narrow columns per doc — is materialized as a local checkpoint and the
    corpus-sized token cache is unpersisted before returning, so no cached
    frame outlives the call."""
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("_toks"),
    ).withColumn("_bigrams", F.expr(_BIGRAMS_FROM_TOKS)).persist()
    # ONE corpus pass counts unigrams AND bigrams together (the same fused
    # shape gram_counts uses for the lm_stats table — the keyspace cannot
    # collide: a gram containing a space is a bigram), localCheckpointed at
    # vocabulary size so the model-side joins below never re-scan the
    # corpus. Replaces two separate corpus-wide explode+groupBy passes.
    allg = (
        base.select(
            F.explode(
                F.concat(F.col("_toks"), F.col("_bigrams"))
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("_cf"))
        .localCheckpoint(eager=False)
    )
    is_bi = F.col("gram").contains(" ")
    uni = allg.filter(~is_bi).select(
        F.col("gram").alias("w"), F.col("_cf").alias("c1")
    )
    bi = allg.filter(is_bi).select(
        F.col("gram").alias("b"), F.col("_cf").alias("c12")
    )
    # vocabulary size rides the plan as a broadcast 1-row frame instead of
    # a separate eager count() action (same double arithmetic either way)
    vsz = F.broadcast(
        uni.agg(F.count("*").cast("double").alias("_v"))
    )
    k = float(k_smooth)
    # score the MODEL, not the stream (guide §2.3 "shuffle fewer bytes"):
    # p(w2|w1) depends only on the gram, so the smoothing joins run over
    # the vocabulary-sized bigram table (w1 derived model-side — same
    # split expression, same inner-join composition) and the corpus-sized
    # doc-bigram stream pays ONE narrow (doc_id, b) join instead of
    # carrying w1 through two sequential joins. Per-gram _nll is the same
    # IEEE expression on the same inputs — values are unchanged.
    model = (
        bi.withColumn("w1", F.split(F.col("b"), " ")[0])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(vsz)
        .select(
            "b",
            (
                -F.log2(
                    (F.col("c12") + F.lit(k))
                    / (F.col("c1") + F.lit(k) * F.col("_v"))
                )
            ).alias("_nll"),
        )
    )
    doc_bi = base.select("doc_id", F.explode("_bigrams").alias("b"))
    scored = doc_bi.join(model, "b")
    out = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_nll"), 6).alias("nll_r"),
    ).localCheckpoint(eager=True)
    base.unpersist(blocking=False)
    return out


def bigram_perplexity_from_stats(
    spark,
    store_path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = DEFAULT_K,
) -> DataFrame:
    """:func:`bigram_perplexity` with the LM read from a store's
    INDEX-TIME ``lm_stats`` table (``build_index(lm_stats=True)``)
    instead of re-counting the corpus: the scoring pass still reads the
    docs being scored (unavoidable — each doc's bigrams are the input),
    but the model side is two filters over the gram table — so scoring a
    SLICE of the corpus against the full-corpus LM costs one pass over
    the slice, not two over the corpus. Output is identical to
    :func:`bigram_perplexity` when the store indexed the same corpus
    (driver-gated). Multi-field stores are rejected: their grams are
    field-qualified and the text_col stream would not match."""
    import os

    from ..errors import EngineError
    from ..sources import store_io

    meta = store_io.read_meta(store_path)
    if not meta.get("lm_stats"):
        raise EngineError(
            f"store at {store_path} has no lm_stats table — rebuild with "
            "build_index(lm_stats=True)"
        )
    if meta.get("fields"):
        raise EngineError(
            "bigram_perplexity_from_stats needs a single-field store "
            "(multi-field grams are field-qualified)"
        )
    stats = spark.read.parquet(os.path.join(store_path, "lm_stats"))
    uni = stats.filter(~F.col("gram").contains(" ")).select(
        F.col("gram").alias("w1"), F.col("cf").alias("c1")
    )
    bi = stats.filter(F.col("gram").contains(" ")).select(
        F.col("gram").alias("b"), F.col("cf").alias("c12")
    )
    vsz = F.broadcast(uni.agg(F.count("*").cast("double").alias("_v")))
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("_toks"),
    ).withColumn("_bigrams", F.expr(_BIGRAMS_FROM_TOKS))
    k = float(k_smooth)
    # model-side smoothing joins (same shape as bigram_perplexity): the
    # stats tables are vocabulary-sized, so p resolves there and the doc
    # stream pays one narrow join
    model = (
        bi.withColumn("w1", F.split(F.col("b"), " ")[0])
        .join(uni, "w1")
        .crossJoin(vsz)
        .select(
            "b",
            (
                -F.log2(
                    (F.col("c12") + F.lit(k))
                    / (F.col("c1") + F.lit(k) * F.col("_v"))
                )
            ).alias("_nll"),
        )
    )
    doc_bi = base.select("doc_id", F.explode("_bigrams").alias("b"))
    scored = doc_bi.join(model, "b")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("_nll"), 6).alias("nll_r"),
    )


_TRIGRAMS_FROM_TOKS = (
    "CASE WHEN size(_toks) >= 3 THEN "
    "transform(sequence(3, size(_toks)), "
    "i -> concat(element_at(_toks, i - 2), ' ', element_at(_toks, i - 1), "
    "' ', element_at(_toks, i))) "
    "ELSE array() END"
)


def trigram_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = DEFAULT_K,
    lambdas: tuple[float, float, float] = (0.2, 0.3, 0.5),
) -> DataFrame:
    """→ (doc_id, n_trigrams, nll_r): per-doc mean −log2 p under a
    Jelinek-Mercer-interpolated trigram LM — the KenLM-shaped upgrade of
    :func:`bigram_perplexity` (real pipelines filter on an interpolated
    higher-order model, not a raw bigram):

        p(w3 | w1 w2) = λ1·(c(w3)+k)/(T+kV)
                      + λ2·(c(w2 w3)+k)/(c(w2)+kV)
                      + λ3·(c(w1 w2 w3)+k)/(c(w1 w2)+kV)

    with T = total tokens, V = distinct unigrams, add-k inside each
    order. Docs with fewer than three tokens are excluded (no trigram
    evidence). Deterministic: exact integer counts everywhere, floats
    only in the final interpolation.

    Scale shape mirrors the bigram LM: three gram-vocabulary-sized
    aggregations (map-side partial combine), scoring is one explode plus
    vocabulary-keyed equi-joins and a per-doc mean — no driver
    materialization beyond the (T, V) scalars."""
    l1, l2, l3 = (float(x) for x in lambdas)
    if abs(l1 + l2 + l3 - 1.0) > 1e-9:
        from ..errors import EngineError

        raise EngineError("interpolation lambdas must sum to 1")
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("_toks"),
    ).withColumn("_bigrams", F.expr(_BIGRAMS_FROM_TOKS)).withColumn(
        "_trigrams", F.expr(_TRIGRAMS_FROM_TOKS)
    ).persist()
    # ONE corpus pass counts unigrams, bigrams AND trigrams together
    # (space count disambiguates the orders — the tokenizer never emits a
    # space inside a token), localCheckpointed at vocabulary size so the
    # four model-side joins below never re-scan the corpus. Replaces
    # three separate corpus-wide explode+groupBy passes.
    allg = (
        base.select(
            F.explode(
                F.concat(
                    F.col("_toks"), F.col("_bigrams"), F.col("_trigrams")
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("_cf"))
        .localCheckpoint(eager=False)
    )
    n_words = F.size(F.split(F.col("gram"), " ", -1))
    uni = allg.filter(n_words == 1).select(
        F.col("gram").alias("w"), F.col("_cf").alias("c1")
    )
    bi = allg.filter(n_words == 2).select(
        F.col("gram").alias("b"), F.col("_cf").alias("cb")
    )
    tri = allg.filter(n_words == 3).select(
        F.col("gram").alias("g"), F.col("_cf").alias("c123")
    )
    tv = F.broadcast(
        uni.agg(
            F.count("*").cast("double").alias("_v"),
            F.sum("c1").cast("double").alias("_t"),
        )
    )
    k = float(k_smooth)
    parts = F.split(F.col("g"), " ")
    # score the MODEL, not the stream (guide §2.3): the interpolated p
    # depends only on the trigram, so all four count joins run over the
    # vocabulary-sized distinct-trigram table (b12/b23/w2/w3 derived
    # model-side — same split expressions, same inner-join composition)
    # and the corpus-sized doc-trigram stream pays ONE narrow (doc_id, g)
    # join instead of carrying four derived key columns through five
    # sequential joins. Per-gram _p/_nll is the same IEEE expression on
    # the same inputs — values are unchanged.
    model = (
        tri.select(
            "g", "c123",
            F.concat_ws(" ", parts[0], parts[1]).alias("b12"),
            F.concat_ws(" ", parts[1], parts[2]).alias("b23"),
            parts[1].alias("w2"),
            parts[2].alias("w3"),
        )
        .join(bi.withColumnRenamed("b", "b12")
                .withColumnRenamed("cb", "c12"), "b12")
        .join(bi.withColumnRenamed("b", "b23")
                .withColumnRenamed("cb", "c23"), "b23")
        .join(uni.withColumnRenamed("w", "w2")
                 .withColumnRenamed("c1", "c2"), "w2")
        .join(uni.withColumnRenamed("w", "w3")
                 .withColumnRenamed("c1", "c3"), "w3")
        .crossJoin(tv)
        .withColumn(
            "_p",
            F.lit(l1) * (F.col("c3") + k)
            / (F.col("_t") + F.lit(k) * F.col("_v"))
            + F.lit(l2) * (F.col("c23") + k)
            / (F.col("c2") + F.lit(k) * F.col("_v"))
            + F.lit(l3) * (F.col("c123") + k)
            / (F.col("c12") + F.lit(k) * F.col("_v")),
        )
        .select("g", (-F.log2("_p")).alias("_nll"))
    )
    doc_tri = base.select("doc_id", F.explode("_trigrams").alias("g"))
    scored = doc_tri.join(model, "g")
    out = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.avg("_nll"), 6).alias("nll_r"),
    ).localCheckpoint(eager=True)
    base.unpersist(blocking=False)
    return out


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = DEFAULT_K,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every doc with the
    corpus-trained bigram LM, split the corpus at the ``cuts`` quantiles
    of per-doc perplexity, and label docs head / middle / tail — the
    standard "keep the head, maybe the middle, drop the tail" LM-data
    triage (CCNet partitions Common Crawl exactly this way, with
    KenLM where we use the deterministic add-k bigram model).

    → (bucket, n_docs, avg_nll_r, min_nll_r, max_nll_r), one row per
    non-empty bucket. Boundary discipline: both thresholds are exact
    interpolated percentiles over the 6-dp-ROUNDED per-doc nll (round
    first — oracle-replicable), themselves rounded to 6 dp; a doc goes
    head when nll_r <= t1, middle when <= t2, else tail. The
    thresholds are two scalars broadcast back — no corpus sort, one
    extra aggregation over the doc-sized perplexity frame."""
    from ..errors import EngineError

    lo, hi = float(cuts[0]), float(cuts[1])
    if not 0.0 <= lo <= hi <= 1.0:
        raise EngineError("cuts must satisfy 0 <= lo <= hi <= 1")
    ppl = bigram_perplexity(
        docs, id_col=id_col, text_col=text_col, k_smooth=k_smooth
    )
    thr = ppl.agg(
        F.round(F.expr(f"percentile(nll_r, {lo!r})"), 6).alias("_t1"),
        F.round(F.expr(f"percentile(nll_r, {hi!r})"), 6).alias("_t2"),
    )
    return (
        ppl.crossJoin(F.broadcast(thr))
        .withColumn(
            "bucket",
            F.when(F.col("nll_r") <= F.col("_t1"), "head")
            .when(F.col("nll_r") <= F.col("_t2"), "middle")
            .otherwise("tail"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("nll_r"), 6).alias("avg_nll_r"),
            F.round(F.min("nll_r"), 6).alias("min_nll_r"),
            F.round(F.max("nll_r"), 6).alias("max_nll_r"),
        )
    )
