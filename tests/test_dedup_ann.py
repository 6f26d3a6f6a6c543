"""Engine-level dedup + ANN operator tests (beyond the DuckDB-oracle pairs):
near-dup recall of MinHash-LSH, simhash locality, LSH-ANN recall vs brute
force, determinism under re-partitioning."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark.operators import ann, dedup
from dynamo2es_lambda_spark.sources import synthetic


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """60 base docs + 20 near-duplicates (small token edits) + 5 exact."""
    base = synthetic.corpus_pdf(np.arange(60))
    rows = [(f"d{i}", t) for i, t in enumerate(base["content"])]
    for i in range(20):
        toks = base["content"][i].split()
        toks[3] = "mutated"
        rows.append((f"nd{i}", " ".join(toks)))
    for i in range(5):
        rows.append((f"x{i}", base["content"][i]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))


def test_exact_duplicates(spark, near_dup_docs):
    out = dedup.exact_duplicates(near_dup_docs, "id", "text").toPandas()
    dups = out[out.n_docs > 1]
    assert len(dups) == 5
    assert (dups.n_docs == 2).all()
    # canonical = min id (string order): 'dN' < 'xN'
    assert all(c.startswith("d") for c in dups.canonical)


def test_minhash_lsh_finds_near_dups(spark, near_dup_docs):
    sigs = dedup.minhash_signatures(near_dup_docs, "id", "text")
    pairs = dedup.lsh_candidate_pairs(sigs).toPandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    # every exact pair must be a candidate; most near-dup pairs should be
    exact_hits = sum((f"d{i}", f"x{i}") in got for i in range(5))
    near_hits = sum((f"d{i}", f"nd{i}") in got for i in range(20))
    assert exact_hits == 5
    assert near_hits >= 15  # recall-oriented banding (8 bands x 1 row)


def test_ngram_jaccard_scores(spark, near_dup_docs):
    pairs = dedup.ngram_jaccard_pairs(near_dup_docs, "id", "text").toPandas()
    idx = {(a, b): j for a, b, j in pairs.values}
    for i in range(5):
        assert idx[(f"d{i}", f"x{i}")] == pytest.approx(1.0)
    for i in range(5):
        assert idx[(f"d{i}", f"nd{i}")] > 0.5


def test_simhash_locality(spark, near_dup_docs):
    out = dedup.simhash(near_dup_docs, "id", "text").toPandas()
    h = dict(zip(out.id, out.simhash))

    def ham(a, b):
        return bin(a ^ b).count("1")

    for i in range(5):
        assert h[f"d{i}"] == h[f"x{i}"]  # identical docs → identical hash
    near = np.mean([ham(h[f"d{i}"], h[f"nd{i}"]) for i in range(20)])
    rng = np.random.default_rng(7)
    ids = list(h)
    far = np.mean(
        [ham(h[ids[a]], h[ids[b]])
         for a, b in rng.integers(0, len(ids), (200, 2)) if ids[a][0] != ids[b][0] or abs(a-b) > 25]
    )
    assert near < far  # near-dups measurably closer in hamming space


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ann_lsh_recall(spark, emb):
    qids = [0, 1, 2, 3, 4]
    brute = ann.brute_force_topk(emb, qids, k=10).toPandas()
    approx = ann.ann_topk_lsh(
        emb, qids, k=10, n_planes=4, n_tables=8
    ).toPandas()
    recalls = []
    for q in qids:
        want = set(brute[brute.qid == q]["vec_id"])
        got = set(approx[approx.qid == q]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.5  # 8 tables x 4 planes, deterministic data
    # approx results are a subset of truth ranking: every returned cos must
    # match the brute-force cos for that (qid, vec_id)
    merged = approx.merge(brute, on=["qid", "vec_id"], suffixes=("_a", "_b"))
    assert np.allclose(merged["cos_a"], merged["cos_b"], atol=1e-12)


def test_lsh_assign_deterministic(spark, emb):
    a = ann.lsh_assign(emb.repartition(3)).select("vec_id", "bucket").toPandas()
    b = ann.lsh_assign(emb.repartition(11)).select("vec_id", "bucket").toPandas()
    a = a.sort_values("vec_id", ignore_index=True)
    b = b.sort_values("vec_id", ignore_index=True)
    assert a.equals(b)


def test_cosine_near_dup_lsh_subset_of_exact(spark, emb):
    exact = ann.cosine_near_dup_exact(emb, 0.3).toPandas()
    approx = ann.cosine_near_dup_lsh(emb, 0.3, n_planes=4, n_tables=8).toPandas()
    ex = set(map(tuple, exact[["a", "b"]].values))
    ap = set(map(tuple, approx[["a", "b"]].values))
    assert ap <= ex                      # every LSH pair is exact-verified
    if ex:
        assert len(ap) / len(ex) >= 0.4  # recall at 8x4 on test embeddings


def test_ivf_topk_structure(spark, emb):
    """IVF probes a cluster subset: results ⊆ brute-force candidate space,
    exact within probed clusters, decent recall at moderate nprobe."""
    from dynamo2es_lambda_spark.operators import ann

    qids = [0, 1]
    cents = list(range(10, 22))
    exact = ann.brute_force_topk(emb, qids, k=10).toPandas()
    ivf = ann.ann_topk_ivf(emb, qids, cents, k=10, nprobe=3).toPandas()
    full = ann.ann_topk_ivf(
        emb, qids, cents, k=10, nprobe=len(cents)
    ).toPandas()
    for qid in qids:
        ex = exact[exact.qid == qid]
        iv = ivf[ivf.qid == qid]
        fl = full[full.qid == qid]
        # probing ALL clusters == exact brute force
        assert fl["vec_id"].tolist() == ex["vec_id"].tolist()
        # cosines reported by IVF are exact for the vectors it returns
        m = ex.set_index("vec_id")["cos"]
        for r in iv.itertuples(index=False):
            if r.vec_id in m.index:
                assert abs(r.cos - m[r.vec_id]) < 1e-12
        # moderate nprobe keeps most of the true top-10
        recall = len(set(iv["vec_id"]) & set(ex["vec_id"])) / 10
        assert recall >= 0.3, (qid, recall)


def test_lsh_bucket_cap_excludes_boilerplate(spark):
    """max_bucket drops giant (boilerplate) buckets from pairwise expansion
    while genuinely-near pairs in small buckets survive."""
    from dynamo2es_lambda_spark.operators import dedup

    boiler = "the standard license header tokens repeated here " * 3
    rows = [(str(i), boiler) for i in range(30)]           # one giant cluster
    rows += [("a1", "unique merge sort window code alpha beta gamma"),
             ("a2", "unique merge sort window code alpha beta delta")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    sigs = dedup.minhash_signatures(df, "doc_id", "text")

    uncapped = dedup.lsh_candidate_pairs(sigs).toPandas()
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket=10).toPandas()

    assert len(uncapped) >= 30 * 29 // 2  # quadratic boilerplate pairs
    boiler_ids = {str(i) for i in range(30)}
    capped_pairs = set(zip(capped["a"], capped["b"]))
    assert not any(a in boiler_ids and b in boiler_ids
                   for a, b in capped_pairs)
    assert ("a1", "a2") in capped_pairs  # small-bucket near-dup kept


def test_search_legacy_term_stats_fallback(spark, tmp_path):
    """Stores whose term_stats lacks the term_bucket column (pre-upgrade)
    still answer queries — planning falls back to JVM-side re-hashing."""
    import os

    import numpy as np

    from dynamo2es_lambda_spark import IndexerConfig
    from dynamo2es_lambda_spark.plans import build, search
    from dynamo2es_lambda_spark.sources import synthetic

    path = str(tmp_path / "legacy")
    corpus = spark.createDataFrame(synthetic.corpus_pdf(np.arange(80)))
    build.build_index(corpus, IndexerConfig(index="code"), path,
                      segment_docs=64, num_buckets=8)
    store = search.load_store(path)
    before = search.search(
        spark, store, synthetic.queries_pdf(), k=5
    ).toPandas()

    # strip the bucket column as an old store would look
    ts_path = os.path.join(path, "term_stats")
    stripped = spark.read.parquet(ts_path).select("term", "df").toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq
    import shutil

    shutil.rmtree(ts_path)
    os.makedirs(ts_path)
    pq.write_table(pa.Table.from_pandas(stripped, preserve_index=False),
                   os.path.join(ts_path, "part-00000.parquet"))

    after = search.search(
        spark, search.load_store(path), synthetic.queries_pdf(), k=5
    ).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        before.sort_values(["qid", "rank"], ignore_index=True),
        after.sort_values(["qid", "rank"], ignore_index=True),
    )


def test_pq_encode_deterministic_and_compressed(spark, emb):
    """PQ codes are a pure function of vector + codebooks (identical under
    any partitioning) and compress dim floats to m small ints."""
    books = ann.pq_train_codebooks(emb, m=8, n_codes=16, sample=300)
    assert len(books) == 8 and books[0].shape == (16, 8)  # 64-dim / 8
    c1 = ann.pq_encode(emb, books).toPandas().set_index("vec_id")
    c2 = (
        ann.pq_encode(emb.repartition(7), books)
        .toPandas()
        .set_index("vec_id")
    )
    for vid in c1.index:
        assert list(c1.loc[vid, "codes"]) == list(c2.loc[vid, "codes"])
    assert all(0 <= c < 16 for cs in c1["codes"] for c in cs)


def test_pq_topk_recall_vs_brute_force(spark, emb):
    qids = [3, 57, 111]
    books = ann.pq_train_codebooks(emb, m=8, n_codes=32, sample=500)
    encoded = ann.pq_encode(emb, books)
    pq = ann.ann_topk_pq(
        emb, qids, books, k=10, encoded=encoded
    ).toPandas()
    bf = ann.brute_force_topk(emb, qids, k=10).toPandas()
    recalls = []
    for q in qids:
        got = set(pq[pq.qid == q]["vec_id"])
        want = set(bf[bf.qid == q]["vec_id"])
        recalls.append(len(got & want) / len(want))
    # pure-ADC over 8x32 codes (32x memory compression, 8 B vs 256 B):
    # approximate by design, but must carry real signal
    assert sum(recalls) / len(recalls) >= 0.4, recalls

    # the production shape: ADC shortlist of 80 + exact rerank — recall
    # approaches brute force while the full scan reads only codes
    rr = ann.ann_topk_pq(
        emb, qids, books, k=10, encoded=encoded, rerank=80
    ).toPandas()
    rr_recalls = []
    for q in qids:
        got = set(rr[rr.qid == q]["vec_id"])
        want = set(bf[bf.qid == q]["vec_id"])
        rr_recalls.append(len(got & want) / len(want))
    assert sum(rr_recalls) / len(rr_recalls) >= 0.8, rr_recalls
    assert sum(rr_recalls) >= sum(recalls)


def test_pq_rejects_nondivisible_subspaces(spark, emb):
    with pytest.raises(ValueError):
        ann.pq_train_codebooks(emb, m=7)


def test_pq_topk_empty_queries(spark, emb):
    books = ann.pq_train_codebooks(emb, m=8, n_codes=16, sample=200)
    res = ann.ann_topk_pq(emb, [999_999_999], books, k=5).toPandas()
    assert len(res) == 0


def test_rademacher_planes_fixed_and_lsh_reproducible(spark, emb):
    """md5-derived Rademacher planes are pure ±1, call-stable, and the
    fixed-plane LSH path returns identical pairs across invocations."""
    p1, p2 = ann.rademacher_planes(8, 6), ann.rademacher_planes(8, 6)
    assert np.array_equal(p1, p2)
    assert set(np.unique(p1)) <= {-1.0, 1.0}
    dim = len(emb.select("embedding").head()[0])
    planes = ann.rademacher_planes(dim, 8)
    a = ann.cosine_near_dup_lsh(
        emb, 0.2, n_planes=4, n_tables=2, planes=planes
    ).toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    b = ann.cosine_near_dup_lsh(
        emb, 0.2, n_planes=4, n_tables=2, planes=planes
    ).toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert a.equals(b)
    # fixed-plane candidates are a subset of the exact pair set
    exact = ann.cosine_near_dup_exact(emb, 0.2).toPandas()
    got = set(zip(a["a"], a["b"]))
    assert got <= set(zip(exact["a"], exact["b"]))
