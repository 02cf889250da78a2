"""simple_query_string (query/simpleqs.py): the lenient Lucene
SimpleQueryParser contract — operator semantics ≡ the query_string
equivalents, graceful degradation on every malformed shape, total
(never-raises) parsing, and fleet service through the DSL."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _an():
    from docs_indexer_ray.functions.analyzer import Analyzer

    return Analyzer("simple")


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    from docs_indexer_ray.index.build import build_index
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    root = str(tmp_path_factory.mktemp("sqsidx") / "idx")
    build_index(
        ray.data.from_arrow(rich_pages_table(90, dup_every=0)),
        root,
        fingerprint="sqs",
        num_parts=4,
        chain="simple",
        field="body",
        store_positions=True,
    )
    return IndexReader(root)


# each pair: the simple_query_string spelling ≡ the query_string one
SQS_VS_QS = [
    ("node pools", "node pools"),
    ("node +pools", "node AND pools"),
    ("node | pools", "node OR pools"),
    ("node +pools | quota", "(node AND pools) OR quota"),
    ("-quota node", "-quota node"),
    ("node +-quota", "node AND NOT quota"),
    ('"node pools"', '"node pools"'),
    ('"node pools"~1', '"node pools"~1'),
    ("nod*", "nod*"),
    ("noode~1", "noode~1"),
    ("(node | quota) +pools", "(node OR quota) AND pools"),
]


def test_sqs_equals_query_string_ranking(built):
    from docs_indexer_ray.query.qstring import query_string_topk
    from docs_indexer_ray.query.simpleqs import parse_simple_query_string

    for sqs, qs in SQS_VS_QS:
        got = query_string_topk(
            built, {"simple_query_string": {"query": sqs}}, k=12
        )
        want = query_string_topk(built, qs, k=12)
        assert got == want, (sqs, qs)
    # default_operator=and flips adjacency
    node = parse_simple_query_string("node pools", _an(), "and")
    assert len(node.must) == 2 and not node.should


def test_sqs_lenient_degradation():
    """Every malformed shape degrades instead of raising — the rules
    documented in the module docstring, each pinned."""
    from docs_indexer_ray.query.qstring import (
        _Bool,
        _Phrase,
        _Term,
        _Wildcard,
    )
    from docs_indexer_ray.query.simpleqs import parse_simple_query_string

    an = _an()
    p = lambda s, op="or": parse_simple_query_string(s, an, op)

    # unterminated quote → phrase to EOS
    n = p('"node pools')
    assert isinstance(n, _Phrase) and n.terms == ["node", "pools"]
    # unmatched ')' ignored; unclosed '(' closes at EOS; '()' vanishes
    assert p(") node").term == "node"
    assert p("(node").term == "node"
    assert p("() node").term == "node"
    # dangling operators vanish
    assert p("+").__class__ is type(None) or p("+") is None
    assert p("node +").term == "node"
    assert p("| node |").term == "node"
    assert p("-") is None
    # '~' without digits is literal (the analyzer strips it)
    assert p("node~").term == "node"
    # mid-word '*' is literal (NOT a prefix): the simple chain then
    # splits 'no*de' into two tokens → a phrase (the multi-token-
    # analysis rule, same as query_string)
    n = p("no*de")
    assert isinstance(n, _Phrase) and n.terms == ["no", "de"]
    assert p("nod*").pattern == "nod*"
    assert isinstance(p("nod*"), _Wildcard)
    # escape: '\*' keeps the star out of prefix position
    assert not isinstance(p("nod\\*"), _Wildcard)
    # double negation cancels
    assert p("--node").term == "node"
    # pure negation stays a (match-nothing) bool, like query_string
    n = p("-node")
    assert isinstance(n, _Bool) and n.must_not and not n.must
    # empty / whitespace / operator soup → None
    assert p("") is None
    assert p("   ") is None
    assert p("+ | - ( ) ~") is None


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='ab c"()+|-~*\\012', max_size=40))
def test_sqs_parse_is_total_structured(s):
    from docs_indexer_ray.query.simpleqs import parse_simple_query_string

    parse_simple_query_string(s, _an())  # must never raise


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_sqs_parse_is_total_arbitrary(s):
    from docs_indexer_ray.query.simpleqs import parse_simple_query_string

    parse_simple_query_string(s, _an())  # arbitrary unicode too


def test_sqs_served_on_fleet_and_http(built, ray_session):
    import json
    import os
    import urllib.request

    from docs_indexer_ray.query.qstring import query_string_topk
    from docs_indexer_ray.query.served import ShardedQueryService
    from docs_indexer_ray.serve_http import SearchServer

    root = os.path.dirname(built.index_dir)
    svc = ShardedQueryService(root, n_shards=3, chain=built.chain)
    try:
        for sqs, qs in SQS_VS_QS:
            dsl = {"simple_query_string": {"query": sqs}}
            assert svc.query_string(dsl, k=12) == query_string_topk(
                built, qs, k=12
            ), sqs
    finally:
        svc.shutdown()

    srv = SearchServer(root, backend="local").start()
    try:
        body = {"query": {"simple_query_string": {"query": "node +pools"}},
                "size": 5}
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/_search",
            data=json.dumps(body).encode(), method="POST",
        )
        with urllib.request.urlopen(req) as r:
            got = json.loads(r.read())
        want = query_string_topk(built, "node AND pools", k=5)
        assert [h["_id"] for h in got["hits"]["hits"]] == [d for d, _ in want]
    finally:
        srv.stop()
