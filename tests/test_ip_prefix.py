"""ip_prefix aggregation: IPv4 network bucketing of the match set.

ES context: the ip_prefix agg buckets documents by the network at a
given prefix length — the keyed sibling of ip_range (which the engine
already ships); reference docs reach ES as searchable documents
(lib/handler.js:100)."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    ("d0", "merge window", "10.0.0.1"),
    ("d1", "merge pane", "10.0.0.200"),
    ("d2", "merge fast", "10.0.1.7"),
    ("d3", "window slow", "10.0.1.9"),
    ("d4", "merge slow", "192.168.3.4"),
    ("d5", "other text", "10.0.0.2"),
]


@pytest.fixture(scope="module")
def ip_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_ip_prefix"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "ip"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=4, num_buckets=4,
                      doc_meta_cols=("ip",))
    return search.load_store(path)


def _q(text):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def test_ip_prefix_buckets_by_network(spark, ip_store):
    got = (
        search.search_ip_prefix(spark, ip_store, _q("merge"), 24)
        .toPandas().sort_values("prefix").reset_index(drop=True)
    )
    # matched: d0 d1 d2 d4 (d5 'other text' no merge; d3 window only)
    want = {"10.0.0.0": 2, "10.0.1.0": 1, "192.168.3.0": 1}
    assert dict(zip(got["prefix"], got["n_docs"])) == want


def test_ip_prefix_min_doc_count_drops_small_buckets(spark, ip_store):
    got = (
        search.search_ip_prefix(
            spark, ip_store, _q("merge"), 24, min_doc_count=2
        ).toPandas()
    )
    assert dict(zip(got["prefix"], got["n_docs"])) == {"10.0.0.0": 2}


def test_ip_prefix_short_prefix_merges_networks(spark, ip_store):
    got = (
        search.search_ip_prefix(spark, ip_store, _q("merge"), 8)
        .toPandas()
    )
    assert dict(zip(got["prefix"], got["n_docs"])) == {
        "10.0.0.0": 3, "192.0.0.0": 1,
    }


def test_ip_prefix_validation(spark, ip_store):
    with pytest.raises(EngineError, match="1..32"):
        search.search_ip_prefix(spark, ip_store, _q("merge"), 0)
    with pytest.raises(EngineError, match="1..32"):
        search.search_ip_prefix(spark, ip_store, _q("merge"), 33)
    with pytest.raises(EngineError, match="min_doc_count"):
        search.search_ip_prefix(
            spark, ip_store, _q("merge"), 24, min_doc_count=-1
        )


# ------------------------------------------------ dual-stack (r5, IPv6)

_DOCS6 = [
    ("d0", "merge window", "2001:db8::1"),
    ("d1", "merge pane", "2001:db8:0:1::ff"),
    ("d2", "merge fast", "2001:db8:8000::7"),
    ("d3", "window slow", "2001:db9::9"),
    ("d4", "merge slow", "fe80::1"),
    ("d5", "merge v4", "10.0.0.1"),
]


@pytest.fixture(scope="module")
def ip6_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r5_ip6"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS6, columns=["doc_id", "content", "ip"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=4, num_buckets=4,
                      doc_meta_cols=("ip",))
    return search.load_store(path)


def _py_prefix_key(ip: str, plen: int) -> str:
    """Reference rendering via stdlib ipaddress: network address as all
    8 groups, per-group leading zeros stripped (the engine's pinned
    uncompressed form)."""
    import ipaddress

    net = ipaddress.ip_network(f"{ip}/{plen}", strict=False)
    full = net.network_address.exploded  # 8 zero-padded groups
    return ":".join(g.lstrip("0") or "0" for g in full.split(":"))


@pytest.mark.parametrize("plen", [20, 33, 48, 64, 127])
def test_ip_prefix_v6_matches_stdlib(spark, ip6_store, plen):
    got = (
        search.search_ip_prefix(
            spark, ip6_store, _q("merge"), plen, is_ipv6=True,
        ).toPandas()
    )
    import collections

    # matched docs: d0 d1 d2 d4 d5 (d3 is 'window slow')
    want = collections.Counter(
        _py_prefix_key(ip, plen)
        for d, txt, ip in _DOCS6
        if "merge" in txt and ":" in ip
    )
    # the v4 doc normalizes into ::ffff:a00:1 and buckets there
    import ipaddress

    v4 = ipaddress.ip_address("10.0.0.1")
    mapped = ipaddress.ip_address(0xFFFF00000000 | int(v4))
    want[_py_prefix_key(str(mapped), plen)] += 1
    assert dict(zip(got["prefix"], got["n_docs"])) == dict(want)


def test_ip_range_v6_dual_stack_buckets(spark, ip6_store):
    got = (
        search.search_ip_range_agg(
            spark, ip6_store, _q("merge"),
            [
                ("db8", "2001:db8::", "2001:db9::"),
                ("low-half", "2001:db8::", "2001:db8:8000::"),
                ("link-local", "fe80::", "fec0::"),
                ("v4", "10.0.0.0", "10.0.1.0"),
                ("open-lo", None, "::2"),
            ],
            value_col="ip",
        ).toPandas()
    )
    want = {"db8": 3, "low-half": 2, "link-local": 1, "v4": 1,
            "open-lo": 0}
    assert dict(zip(got["range_key"], got["n_docs"])) == want


def test_ip_prefix_v6_validation(spark, ip6_store):
    with pytest.raises(EngineError, match="1..128"):
        search.search_ip_prefix(
            spark, ip6_store, _q("merge"), 129, is_ipv6=True
        )
    with pytest.raises(EngineError, match="bad IP literal"):
        search.search_ip_range_agg(
            spark, ip6_store, _q("merge"), [("x", "nonsense", None)]
        )
